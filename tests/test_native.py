"""Native C++ data-kernel tests (skipped if the toolchain is unavailable)."""
import os

import numpy as np
import pytest

from egohmr_tpu import native
from egohmr_tpu.data.augment import crop_transform, warp_affine

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not buildable")


def test_warp_matches_python(rng):
    img = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
    trans = crop_transform(210, 160, 120, 120, 224, 224, 1.05, 15.0)
    got = native.warp_affine_norm(img, trans, 224, chw=False)
    want = warp_affine(img, trans, 224, 224)
    # interior pixels must match the scipy implementation closely
    diff = np.abs(got - want)
    assert np.median(diff) < 0.5
    assert (diff < 2.0).mean() > 0.98


def test_warp_normalization_fused(rng):
    img = (rng.rand(100, 100, 3) * 255).astype(np.uint8)
    eye = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    mean = (100.0, 110.0, 120.0)
    std = (50.0, 55.0, 60.0)
    cs = (1.1, 0.9, 1.0)
    got = native.warp_affine_norm(img, eye, 100, color_scale=cs,
                                  mean=mean, std=std, chw=True)
    want = img.astype(np.float32).transpose(2, 0, 1)
    for c in range(3):
        want[c] = (np.clip(want[c] * cs[c], 0, 255) - mean[c]) / std[c]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_jpeg_roundtrip(tmp_path, rng):
    from PIL import Image

    img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "t.jpg")
    Image.fromarray(img).save(p, quality=95)
    got = native.decode_jpeg(p)
    assert got is not None and got.shape == (64, 96, 3)
    want = np.asarray(Image.open(p).convert("RGB"))
    # both decode the same file; decoders may differ by a few ULP of IDCT
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 2.0


def test_load_batch_threaded(tmp_path, rng):
    from PIL import Image

    paths = []
    for i in range(4):
        img = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    trans = np.stack([
        crop_transform(80, 60, 100, 100, 64, 64, 1.0, 0.0) for _ in paths])
    flips = np.array([0, 1, 0, 1], np.uint8)
    cs = np.ones((4, 3), np.float32)
    out = native.load_batch(paths, trans, flips, cs,
                            (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), 64,
                            num_threads=2)
    assert out is not None and out.shape == (4, 64, 64, 3)
    assert np.isfinite(out).all() and out.std() > 1.0

    # a bad path raises by default (training on zero-filled images with real
    # labels would silently corrupt gradients — round-3 review finding) ...
    paths[2] = str(tmp_path / "missing.jpg")
    with pytest.raises(RuntimeError, match="failed to decode"):
        native.load_batch(paths, trans, flips, cs,
                          (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), 64)
    # ... while strict=False keeps the salvage behavior: the bad slot
    # zero-fills and doesn't poison the rest of the batch
    out2 = native.load_batch(paths, trans, flips, cs,
                             (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), 64,
                             strict=False)
    assert np.all(out2[2] == 0)
    np.testing.assert_allclose(out2[0], out[0])
