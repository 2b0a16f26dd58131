"""Scene preprocessing tests: mesh IO + cube crop math."""
import math

import numpy as np
import pytest

from egohmr_tpu.preprocess.mesh_io import (
    read_mesh_vertices,
    uniform_downsample,
)
from egohmr_tpu.preprocess.scene import crop_scene_cube, rotate_y


def test_obj_reader(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("# comment\nv 1 2 3\nv 4.5 -1 0\nf 1 2 1\n")
    v = read_mesh_vertices(str(p))
    np.testing.assert_allclose(v, [[1, 2, 3], [4.5, -1, 0]])


def test_ply_ascii_reader(tmp_path):
    p = tmp_path / "m.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n0.5 1.5 2.5\n-1 -2 -3\n")
    v = read_mesh_vertices(str(p))
    np.testing.assert_allclose(v, [[0.5, 1.5, 2.5], [-1, -2, -3]])


def test_ply_binary_reader(tmp_path, rng):
    import struct

    verts = rng.randn(5, 3).astype(np.float32)
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 5\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"property uchar red\n"
              b"end_header\n")
    body = b""
    for v in verts:
        body += struct.pack("<fffB", v[0], v[1], v[2], 7)
    p = tmp_path / "m.ply"
    p.write_bytes(header + body)
    got = read_mesh_vertices(str(p))
    np.testing.assert_allclose(got, verts, rtol=1e-6)


def test_uniform_downsample_matches_open3d_semantics(rng):
    v = rng.randn(95, 3)
    out = uniform_downsample(v, 20)
    # open3d uniform_down_sample(every_k_points=int(95/20)=4) -> v[::4][:20]
    np.testing.assert_allclose(out, v[::4][:20])


def test_rotate_y_preserves_height_and_radius(rng):
    v = rng.randn(50, 3)
    c = np.array([1.0, 0.0, -2.0])
    out = rotate_y(v, c, 1.2345)
    np.testing.assert_allclose(out[:, 1], v[:, 1])
    r0 = np.hypot(v[:, 0] - c[0], v[:, 2] - c[2])
    r1 = np.hypot(out[:, 0] - c[0], out[:, 2] - c[2])
    np.testing.assert_allclose(r0, r1, rtol=1e-6)


def test_crop_scene_cube_deterministic(rng):
    scene = rng.rand(50000, 3) * 10 - 5  # [-5, 5]^3
    center = np.array([0.0, 0.0, 0.0])
    crop = crop_scene_cube(scene, center, cube_size=2.0, target=1000)
    assert crop.shape == (1000, 3)
    assert (np.abs(crop[:, 0]) <= 1.0 + 1e-9).all()
    assert (np.abs(crop[:, 2]) <= 1.0 + 1e-9).all()
    assert (crop[:, 1] <= crop[:, 1].min() + 2.0 + 1e-9).all()


def test_crop_scene_cube_augmented_contains_body(rng):
    scene = rng.rand(80000, 3) * 8 - 4
    body = rng.rand(500, 3) * 0.6 - 0.3  # small body at origin
    center = body.mean(axis=0)
    crop = crop_scene_cube(scene, center, cube_size=2.0, target=2000,
                           body_verts=body, rng=rng)
    assert crop.shape == (2000, 3)
    # crop stays within a bounded distance of the body center in x-z
    d = np.hypot(crop[:, 0] - center[0], crop[:, 2] - center[2])
    assert d.max() <= 2.0 * math.sqrt(2) + 1e-6


def test_render_in_scene_smoke(rng):
    from egohmr_tpu.viz.renderer import render_in_scene

    body = rng.randn(100, 3).astype(np.float32) * 0.3 + [0, 0, 3.0]
    scene = rng.randn(500, 3).astype(np.float32) + [0, 0, 3.0]
    out = render_in_scene(body, None, scene, img_size=(320, 240))
    assert out.shape == (240, 320, 3)
    assert out.std() > 0  # something was drawn
