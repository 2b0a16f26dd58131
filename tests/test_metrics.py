"""Metric golden tests against the reference numpy implementations."""
import numpy as np
import jax.numpy as jnp

from egohmr_tpu.eval import (
    apd,
    diversity_std,
    mpjpe,
    pa_mpjpe,
    similarity_transform,
)
from .conftest import requires_reference


def test_procrustes_recovers_transform(rng):
    """Points related by an exact (s, R, t) must align to zero error."""
    a = rng.randn(4, 24, 3).astype(np.float32)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    q *= np.sign(np.linalg.det(q))
    b = 0.7 * a @ q.T + rng.randn(1, 1, 3).astype(np.float32)
    aligned = np.asarray(similarity_transform(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(aligned, b, atol=1e-4)


def test_mpjpe_basic(rng):
    p = rng.randn(3, 24, 3).astype(np.float32)
    g = p + 0.01
    err = np.asarray(mpjpe(jnp.asarray(p), jnp.asarray(g)))
    np.testing.assert_allclose(err, np.sqrt(3) * 0.01, rtol=1e-4)


@requires_reference
def test_pa_mpjpe_matches_reference(rng):
    from utils.pose_utils import reconstruction_error

    p = rng.randn(6, 24, 3).astype(np.float64)
    g = rng.randn(6, 24, 3).astype(np.float64)
    want = reconstruction_error(p.copy(), g.copy(), avg_joint=True)
    got = np.asarray(pa_mpjpe(jnp.asarray(p.astype(np.float32)),
                              jnp.asarray(g.astype(np.float32))))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@requires_reference
def test_pa_mpjpe_vis_mask_matches_reference(rng):
    from utils.pose_utils import reconstruction_error_with_vis_mask

    p = rng.randn(6, 24, 3).astype(np.float64)
    g = rng.randn(6, 24, 3).astype(np.float64)
    vis = (rng.rand(6, 24, 1) > 0.3).astype(np.float64)
    want = reconstruction_error_with_vis_mask(vis, p.copy(), g.copy(),
                                              avg_joint=True)
    got = np.asarray(pa_mpjpe(
        jnp.asarray(p.astype(np.float32)), jnp.asarray(g.astype(np.float32)),
        vis_mask=jnp.asarray(vis[..., 0].astype(np.float32)),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_diversity_metrics_match_loop_reference(rng):
    """diversity std / APD vs the reference's python double-loop
    (test_egohmr.py:456-494), reimplemented directly here."""
    samples = rng.randn(2, 5, 24, 3).astype(np.float32)

    # reference std: torch.std (unbiased) over samples, mean over joints/dims
    # (test_egohmr.py:450-452)
    want_std = samples.std(axis=1, ddof=1).mean(axis=-1).mean(axis=-1)
    got_std = np.asarray(diversity_std(jnp.asarray(samples)))
    np.testing.assert_allclose(got_std, want_std, rtol=1e-4, atol=1e-5)

    # reference APD: sum over ordered pairs / n_joints / S / (S-1) / 2
    # (test_egohmr.py:472-478)
    B, S = samples.shape[:2]
    n_joints = samples.shape[2]
    want = np.zeros(B)
    for b in range(B):
        acc = 0.0
        for i in range(S):
            for j in range(S):
                acc += np.linalg.norm(
                    samples[b, i] - samples[b, j], axis=-1).sum()
        want[b] = acc / n_joints / S / (S - 1) / 2
    got = np.asarray(apd(jnp.asarray(samples)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
