"""Evaluation metrics: MPJPE family, Procrustes alignment, diversity, contact.

Batched JAX replacements for the reference's numpy/python evaluation
(reference utils/pose_utils.py:11-127, test_egohmr.py:399-505). The per-image
Python loops (compute_similarity_transform_batch's for-loop, the diversity
double loop test_egohmr.py:456-494) become vmapped/vectorized device code.

All errors are returned per-sample in meters; multiply by 1000 for the mm
numbers the reference prints (test_egohmr.py:630-654).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def similarity_transform(S1: Array, S2: Array) -> Array:
    """Procrustes: align S1 [..., N, 3] to S2; returns S1_hat.

    Batched version of reference utils/pose_utils.py:11-59 (note the
    reference operates on [3, N]; math is identical).
    """
    mu1 = jnp.mean(S1, axis=-2, keepdims=True)
    mu2 = jnp.mean(S2, axis=-2, keepdims=True)
    X1 = S1 - mu1
    X2 = S2 - mu2
    var1 = jnp.sum(jnp.square(X1), axis=(-2, -1))

    K = jnp.einsum("...ni,...nj->...ij", X1, X2, precision="highest")
    U, s, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, -1, -2)
    det = jnp.linalg.det(jnp.einsum("...ij,...kj->...ik", V, U))
    sign = jnp.sign(det)
    # R = V @ diag(1,1,sign) @ U^T
    V_adj = V.at[..., :, 2].multiply(sign[..., None])
    s_adj = s.at[..., 2].multiply(sign)
    R = jnp.einsum("...ij,...kj->...ik", V_adj, U)
    scale = jnp.sum(s_adj, axis=-1) / var1
    t = mu2 - scale[..., None, None] * jnp.einsum(
        "...ij,...nj->...ni", R, mu1)
    return scale[..., None, None] * jnp.einsum(
        "...ij,...nj->...ni", R, S1) + t


def similarity_transform_vis_mask(vis: Array, S1: Array, S2: Array) -> Array:
    """Procrustes fitted on visibility-weighted points, applied to ALL points
    (reference utils/pose_utils.py:75-107: S1*vis / S2*vis enter the fit;
    the recovered (s, R, t) is applied to the full S1)."""
    w = vis[..., None]
    S1m = S1 * w
    S2m = S2 * w
    mu1 = jnp.mean(S1m, axis=-2, keepdims=True)
    mu2 = jnp.mean(S2m, axis=-2, keepdims=True)
    X1 = S1m - mu1
    X2 = S2m - mu2
    var1 = jnp.sum(jnp.square(X1), axis=(-2, -1))
    K = jnp.einsum("...ni,...nj->...ij", X1, X2, precision="highest")
    U, s, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, -1, -2)
    det = jnp.linalg.det(jnp.einsum("...ij,...kj->...ik", V, U))
    sign = jnp.sign(det)
    V_adj = V.at[..., :, 2].multiply(sign[..., None])
    s_adj = s.at[..., 2].multiply(sign)
    R = jnp.einsum("...ij,...kj->...ik", V_adj, U)
    scale = jnp.sum(s_adj, axis=-1) / var1
    t = mu2 - scale[..., None, None] * jnp.einsum("...ij,...nj->...ni", R, mu1)
    return scale[..., None, None] * jnp.einsum("...ij,...nj->...ni", R, S1) + t


def mpjpe(pred: Array, gt: Array, *, pelvis_align: bool = False,
          mask: Optional[Array] = None) -> Array:
    """Mean (or masked-mean) per-joint position error [..., N, 3] -> [...]."""
    if pelvis_align:
        pred = pred - pred[..., :1, :]
        gt = gt - gt[..., :1, :]
    err = jnp.linalg.norm(pred - gt, axis=-1)
    if mask is None:
        return jnp.mean(err, axis=-1)
    denom = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    return jnp.sum(err * mask, axis=-1) / denom


def pa_mpjpe(pred: Array, gt: Array, *, vis_mask: Optional[Array] = None,
             mask: Optional[Array] = None) -> Array:
    """Procrustes-aligned MPJPE (reference reconstruction_error,
    pose_utils.py:110-127). `vis_mask` selects the joints used for the fit;
    `mask` selects the joints averaged for the error."""
    if vis_mask is not None:
        aligned = similarity_transform_vis_mask(vis_mask, pred, gt)
    else:
        aligned = similarity_transform(pred, gt)
    err = jnp.linalg.norm(aligned - gt, axis=-1)
    if mask is None:
        return jnp.mean(err, axis=-1)
    denom = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    return jnp.sum(err * mask, axis=-1) / denom


def v2v(pred_verts: Array, gt_verts: Array, pred_pelvis: Array,
        gt_pelvis: Array, *, mask: Optional[Array] = None) -> Array:
    """Pelvis-aligned vertex-to-vertex error
    (reference test_egohmr.py:426-448)."""
    p = pred_verts - pred_pelvis[..., None, :]
    g = gt_verts - gt_pelvis[..., None, :]
    err = jnp.linalg.norm(p - g, axis=-1)
    if mask is None:
        return jnp.mean(err, axis=-1)
    denom = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    return jnp.sum(err * mask, axis=-1) / denom


def joint_visibility_mask(
    gt_joints: Array, focal_length: Array, camera_center: Array,
    img_w: float = 1920.0, img_h: float = 1080.0,
) -> Array:
    """Visibility = GT joint projects inside the full image
    (reference test_egohmr.py:374-397 / egohmr.py:363-369).
    gt_joints: [B, N, 3] in camera coords -> [B, N] bool."""
    xy = gt_joints[..., :2] / gt_joints[..., 2:3]
    uv = xy * focal_length[:, None, :] + camera_center[:, None, :]
    return ((uv[..., 0] >= 0) & (uv[..., 0] < img_w)
            & (uv[..., 1] >= 0) & (uv[..., 1] < img_h))


def diversity_std(samples: Array, mask: Optional[Array] = None) -> Array:
    """Per-joint std over the sample axis, averaged
    (reference test_egohmr.py:450-470; torch.std unbiased).
    samples: [B, S, N, 3] -> [B]."""
    std = jnp.std(samples, axis=1, ddof=1)  # [B, N, 3]
    per_joint = jnp.mean(std, axis=-1)  # [B, N]
    if mask is None:
        return jnp.mean(per_joint, axis=-1)
    denom = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    return jnp.sum(per_joint * mask, axis=-1) / denom


def apd(samples: Array, mask: Optional[Array] = None) -> Array:
    """Average pairwise distance across samples
    (reference test_egohmr.py:472-494: sum over ordered pairs divided by
    n·(n-1)·2, i.e. HALF the mean pairwise distance — kept for parity).
    samples: [B, S, N, 3] -> [B]."""
    B, S = samples.shape[:2]
    diff = samples[:, :, None] - samples[:, None]  # [B, S, S, N, 3]
    d = jnp.linalg.norm(diff, axis=-1)  # [B, S, S, N]
    if mask is not None:
        denom = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
        d = jnp.sum(d * mask[:, None, None, :], axis=-1) / denom[:, None, None]
    else:
        d = jnp.mean(d, axis=-1)
    return jnp.sum(d, axis=(1, 2)) / jnp.maximum(S * (S - 1) * 2, 1)
