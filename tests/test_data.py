"""Data/augmentation pipeline tests (no real EgoBody data required)."""
import numpy as np
import jax.numpy as jnp
import pytest

from egohmr_tpu.data import (
    AugmentConfig,
    AugmentParams,
    collate,
    compute_body_rep_stats,
    crop_transform,
    draw_augment_params,
    get_example,
    warp_affine,
)


def _example_inputs(rng, aug):
    img = (rng.rand(1080, 1920, 3) * 255).astype(np.uint8)
    kp2d = np.concatenate(
        [rng.rand(25, 2) * [1920, 1080], np.ones((25, 1))], axis=1
    ).astype(np.float32)
    kp3d = rng.randn(24, 3).astype(np.float32) * 0.3 + [0, 0, 2.5]
    smpl = {
        "global_orient": rng.randn(3).astype(np.float32) * 0.3,
        "body_pose": rng.randn(69).astype(np.float32) * 0.2,
        "betas": rng.randn(10).astype(np.float32) * 0.5,
        "transl": np.array([0.1, 0.2, 2.5], np.float32),
    }
    scene = rng.randn(500, 3).astype(np.float32) + [0, 0, 2.5]
    mean = 255.0 * np.array([0.485, 0.456, 0.406])
    std = 255.0 * np.array([0.229, 0.224, 0.225])
    return dict(
        img=img, center_x=960.0, center_y=540.0, width=300.0, height=300.0,
        keypoints_2d=kp2d, keypoints_3d=kp3d, smpl_params=smpl,
        patch_size=224, mean=mean, std=std, aug=aug,
        fx=1500.0, cam_cx=960.0, cam_cy=540.0, scene_pcd_verts=scene,
    )


def test_warp_affine_identity(rng):
    img = (rng.rand(64, 64, 3) * 255).astype(np.float32)
    eye = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    out = warp_affine(img, eye, 64, 64)
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_warp_affine_matches_keypoint_transform(rng):
    """A bright dot warped with the image must land where the keypoint math
    says it lands."""
    img = np.zeros((400, 400, 3), np.float32)
    img[200, 120] = 255.0
    trans = crop_transform(160, 190, 120, 120, 224, 224, 1.1, 25.0)
    out = warp_affine(img, trans, 224, 224)
    yx = np.unravel_index(out[..., 0].argmax(), out[..., 0].shape)
    want = trans[:, :2] @ np.array([120.0, 200.0]) + trans[:, 2]  # (x, y)
    assert abs(yx[1] - want[0]) <= 1.5 and abs(yx[0] - want[1]) <= 1.5


def test_deterministic_path_no_aug(rng):
    inputs = _example_inputs(rng, AugmentParams())
    item = get_example(**inputs)
    assert item["img"].shape == (3, 224, 224)
    assert not item["transl_needs_recompute"]
    # centered keypoint maps to crop center
    kp = item["keypoints_2d"]
    assert kp.shape == (25, 3)
    # 3d crop/full consistency: transl unchanged on the deterministic path
    np.testing.assert_allclose(item["smpl_params"]["transl"],
                               [0.1, 0.2, 2.5], atol=1e-5)
    # full 3d keypoints unchanged
    np.testing.assert_allclose(
        item["keypoints_3d_full"], inputs["keypoints_3d"], atol=1e-4)


def test_flip_consistency(rng):
    aug = AugmentParams(do_flip=True)
    inputs = _example_inputs(rng, aug)
    item = get_example(**inputs)
    assert item["transl_needs_recompute"]
    # flipped scene x must be mirror of original about the crop-camera axis
    # sanity: z and y untouched by pure flip
    np.testing.assert_allclose(
        item["scene_pcd_verts_full"][:, 2],
        inputs["scene_pcd_verts"][:, 2], atol=1e-4)
    # pelvis x sign flips in full coords
    orig = inputs["keypoints_3d"]
    got = item["keypoints_3d_full"]
    perm = __import__("egohmr_tpu.smpl.constants", fromlist=["c"]).FLIP_PERM_SMPL_3D
    np.testing.assert_allclose(got[:, 0], -orig[perm][:, 0], atol=1e-4)
    np.testing.assert_allclose(got[:, 1:], orig[perm][:, 1:], atol=1e-4)


def test_rotation_preserves_depth_distances(rng):
    aug = AugmentParams(rot=30.0)
    inputs = _example_inputs(rng, aug)
    item = get_example(**inputs)
    # in-plane rotation about z preserves pairwise distances of 3d points
    got = item["keypoints_3d"]
    # reconstruct the expected crop-space points and rotate
    d_got = np.linalg.norm(got[:, None] - got[None], axis=-1)
    orig_crop = item["keypoints_3d_full"]  # full after rot
    d_full = np.linalg.norm(orig_crop[:, None] - orig_crop[None], axis=-1)
    np.testing.assert_allclose(d_got, d_full, atol=1e-4)


def test_draw_params_ranges(rng):
    cfg = AugmentConfig()
    for _ in range(50):
        p = draw_augment_params(cfg, rng)
        assert 0.7 - 1e-6 <= p.scale <= 1.3 + 1e-6
        assert -60 <= p.rot <= 60
        assert all(0.8 - 1e-9 <= c <= 1.2 + 1e-9 for c in p.color_scale)


def test_body_rep_stats_structure(rng):
    go = rng.randn(100, 3).astype(np.float32)
    bp = rng.randn(100, 69).astype(np.float32) * 0.3
    mean, std = compute_body_rep_stats(go, bp)
    assert mean.shape == (144,) and std.shape == (144,)
    assert np.allclose(std[:6], std[0])    # collapsed per group
    assert np.allclose(std[6:], std[6])
    assert std[0] > 0 and std[6] > 0


def test_collate_nested(rng):
    items = [
        {"a": np.ones(3), "smpl_params": {"b": np.zeros(2)}, "name": "x",
         "flag": True}
        for _ in range(4)
    ]
    batch = collate(items)
    assert batch["a"].shape == (4, 3)
    assert batch["smpl_params"]["b"].shape == (4, 2)
    assert batch["name"] == ["x"] * 4
    assert batch["flag"].shape == (4,)


def test_prefetch_to_device(rng):
    import jax.numpy as jnp

    from egohmr_tpu.data.prefetch import prefetch_to_device

    batches = [{"x": np.full((4,), i, np.float32)} for i in range(10)]
    out = list(prefetch_to_device(iter(batches), size=3))
    assert len(out) == 10
    for i, b in enumerate(out):
        assert isinstance(b["x"], jnp.ndarray)
        np.testing.assert_allclose(np.asarray(b["x"]), i)


def test_prefetch_propagates_errors():
    from egohmr_tpu.data.prefetch import prefetch_to_device

    def gen():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom")

    it = prefetch_to_device(gen(), size=2)
    next(it)
    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        list(it)
