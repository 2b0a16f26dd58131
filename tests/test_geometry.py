"""Geometry golden tests against the reference torch implementation (CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from egohmr_tpu.geometry import (
    aa_to_rotmat,
    rot6d_to_rotmat,
    rotmat_to_rot6d,
    rotmat_to_aa,
    perspective_projection,
    convert_pare_to_full_img_cam,
    points_coord_trans,
)
from .conftest import requires_reference


def _rand_rotmats(rng, n):
    """Random proper rotations via QR."""
    a = rng.randn(n, 3, 3)
    q, _ = np.linalg.qr(a)
    det = np.linalg.det(q)
    q[:, :, 0] *= det[:, None]
    return q.astype(np.float32)


class TestSelfConsistency:
    def test_rot6d_roundtrip_diffusion(self, rng):
        r = _rand_rotmats(rng, 64)
        six = rotmat_to_rot6d(jnp.asarray(r), "diffusion")
        back = rot6d_to_rotmat(six, "diffusion")
        np.testing.assert_allclose(np.asarray(back), r, atol=2e-5)

    def test_rot6d_roundtrip_prohmr(self, rng):
        r = _rand_rotmats(rng, 64)
        six = rotmat_to_rot6d(jnp.asarray(r), "prohmr")
        back = rot6d_to_rotmat(six, "prohmr")
        np.testing.assert_allclose(np.asarray(back), r, atol=2e-5)

    def test_rot6d_layouts_differ(self, rng):
        """'prohmr' and 'diffusion' layouts are transposes of one another."""
        r = _rand_rotmats(rng, 8)
        six_d = np.asarray(rotmat_to_rot6d(jnp.asarray(r), "diffusion"))
        six_p = np.asarray(rotmat_to_rot6d(jnp.asarray(r), "prohmr"))
        assert not np.allclose(six_d, six_p)
        np.testing.assert_allclose(
            six_d.reshape(-1, 3, 2), six_p.reshape(-1, 2, 3).transpose(0, 2, 1)
        )

    def test_aa_roundtrip(self, rng):
        aa = rng.randn(128, 3).astype(np.float32) * 1.5
        r = aa_to_rotmat(jnp.asarray(aa))
        aa_back = rotmat_to_aa(r)
        r2 = aa_to_rotmat(aa_back)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-4)

    def test_aa_near_zero(self):
        aa = jnp.asarray(np.full((4, 3), 1e-9, np.float32))
        r = aa_to_rotmat(aa)
        np.testing.assert_allclose(np.asarray(r), np.eye(3)[None].repeat(4, 0), atol=1e-5)
        back = rotmat_to_aa(r)
        assert np.isfinite(np.asarray(back)).all()

    def test_rotmat_orthonormal(self, rng):
        x = rng.randn(32, 6).astype(np.float32)
        for mode in ("prohmr", "diffusion"):
            r = np.asarray(rot6d_to_rotmat(jnp.asarray(x), mode))
            eye = np.matmul(r.transpose(0, 2, 1), r)
            np.testing.assert_allclose(eye, np.eye(3)[None].repeat(32, 0), atol=1e-5)
            np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


@requires_reference
class TestGoldenVsReference:
    def _ref(self):
        import utils.geometry as ref_geo

        return ref_geo

    def test_aa_to_rotmat(self, rng):
        import torch

        ref = self._ref()
        aa = rng.randn(64, 3).astype(np.float32)
        got = np.asarray(aa_to_rotmat(jnp.asarray(aa)))
        want = ref.aa_to_rotmat(torch.from_numpy(aa)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("mode", ["prohmr", "diffusion"])
    def test_rot6d_to_rotmat(self, rng, mode):
        import torch

        ref = self._ref()
        x = rng.randn(64, 6).astype(np.float32)
        got = np.asarray(rot6d_to_rotmat(jnp.asarray(x), mode))
        want = ref.rot6d_to_rotmat(torch.from_numpy(x), rot6d_mode=mode).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rotmat_to_rot6d_diffusion(self, rng):
        import torch

        ref = self._ref()
        r = _rand_rotmats(rng, 32)
        got = np.asarray(rotmat_to_rot6d(jnp.asarray(r), "diffusion"))
        want = ref.rotmat_to_rot6d(torch.from_numpy(r), rot6d_mode="diffusion").numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_rotmat_to_aa_kornia(self, rng):
        import torch
        import utils.konia_transform as ref_k

        r = _rand_rotmats(rng, 256)
        got = np.asarray(rotmat_to_aa(jnp.asarray(r)))
        want = ref_k.rotation_matrix_to_angle_axis(torch.from_numpy(r)).numpy()
        # compare via the rotation they induce (axis-angle has 2π ambiguity)
        got_r = np.asarray(aa_to_rotmat(jnp.asarray(got)))
        want_r = np.asarray(aa_to_rotmat(jnp.asarray(want)))
        np.testing.assert_allclose(got_r, want_r, atol=1e-4)

    def test_perspective_projection(self, rng):
        import torch

        ref = self._ref()
        pts = rng.randn(8, 45, 3).astype(np.float32)
        pts[..., 2] += 5.0
        transl = rng.randn(8, 3).astype(np.float32) * 0.1
        fl = np.abs(rng.randn(8, 2)).astype(np.float32) * 100 + 1000
        cc = rng.randn(8, 2).astype(np.float32) * 10 + 950
        got = np.asarray(
            perspective_projection(
                jnp.asarray(pts), jnp.asarray(transl), jnp.asarray(fl), jnp.asarray(cc)
            )
        )
        want = ref.perspective_projection(
            torch.from_numpy(pts), torch.from_numpy(transl), torch.from_numpy(fl),
            torch.from_numpy(cc),
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)

    def test_convert_pare_to_full_img_cam(self, rng):
        import torch

        ref = self._ref()
        cam = rng.rand(16, 3).astype(np.float32) + 0.5
        bh = (rng.rand(16).astype(np.float32) * 200 + 100)
        bc = rng.rand(16, 2).astype(np.float32) * 1000
        fl = rng.rand(16).astype(np.float32) * 500 + 1000
        got = np.asarray(
            convert_pare_to_full_img_cam(
                jnp.asarray(cam), jnp.asarray(bh), jnp.asarray(bc),
                jnp.asarray(np.float32(1920.0)), jnp.asarray(np.float32(1080.0)),
                jnp.asarray(fl),
            )
        )
        want = ref.convert_pare_to_full_img_cam(
            torch.from_numpy(cam), torch.from_numpy(bh), torch.from_numpy(bc),
            1920.0, 1080.0, torch.from_numpy(fl),
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_points_coord_trans(self, rng):
        ref = self._ref()
        pts = rng.randn(100, 3).astype(np.float32)
        t = np.eye(4, dtype=np.float32)
        t[:3, :3] = _rand_rotmats(rng, 1)[0]
        t[:3, 3] = rng.randn(3)
        got = np.asarray(points_coord_trans(jnp.asarray(pts), jnp.asarray(t)))
        want = ref.points_coord_trans(pts, t)
        np.testing.assert_allclose(got, want, atol=1e-5)
