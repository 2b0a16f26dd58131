"""Software mesh rasterizer (viz/renderer.py:render_mesh_soft): the
dependency-free fallback for the reference's pyrender EGL overlay
(utils/renderer.py:15-31). The GL path itself stays gated in test_viz.py
(no GL in this image); this is the path users actually get here, so it is
pinned exactly: projection, coverage, z-buffer, shading, composite."""
import time

import numpy as np

from egohmr_tpu.viz.renderer import (
    project_vertices,
    render_in_scene,
    render_mesh_soft,
    render_on_img,
)

FOCAL = (10.0, 10.0)
CENTER = (16.0, 16.0)


def verts_from_uv(uv, z):
    """Invert project_vertices: pixel corners + depth -> camera frame."""
    uv = np.asarray(uv, np.float64)
    z = np.broadcast_to(np.asarray(z, np.float64), (len(uv),))
    x = (uv[:, 0] - CENTER[0]) / FOCAL[0] * z
    y = (uv[:, 1] - CENTER[1]) / FOCAL[1] * z
    return np.stack([x, y, z], -1)


def test_face_on_triangle_coverage_and_blend():
    """A face-on triangle (normal along the view axis -> shade = 1.0) must
    color exactly the pixels whose centers it covers, with the reference's
    alpha composite (renderer.py:26-28): 0.9*color + 0.1*background."""
    img = np.zeros((32, 32, 3), np.uint8)
    v = verts_from_uv([(4, 4), (24, 4), (4, 24)], 2.0)
    f = np.array([[0, 1, 2]])
    out = render_mesh_soft(img, v, f, FOCAL, CENTER, color=(10, 255, 255),
                           alpha=0.9)
    # round-trip sanity: the projection used inside matches project_vertices
    np.testing.assert_allclose(project_vertices(v, FOCAL, CENTER),
                               [(4, 4), (24, 4), (4, 24)], atol=1e-9)
    # interior pixel center (10.5, 10.5): inside (u + v < 28) -> blended
    np.testing.assert_array_equal(out[10, 10],
                                  np.uint8([0.9 * 10, 0.9 * 255, 0.9 * 255]))
    # center on the far side of the hypotenuse (u + v > 28) -> untouched
    np.testing.assert_array_equal(out[20, 20], [0, 0, 0])
    # outside the bbox entirely
    np.testing.assert_array_equal(out[30, 30], [0, 0, 0])
    # coverage is the half-square, not the bbox: corners above vs below
    assert (out[5, 5] != 0).all() and (out[22, 22] == 0).all()


def test_zbuffer_occlusion_is_depth_not_draw_order():
    """Near geometry must win the z-test whichever order the faces come in
    (per-face colors make the winner observable)."""
    img = np.zeros((32, 32, 3), np.uint8)
    far = verts_from_uv([(2, 2), (30, 2), (2, 30)], 4.0)    # big, z=4
    near = verts_from_uv([(6, 6), (14, 6), (6, 14)], 2.0)   # small, z=2
    colors = np.array([[255, 0, 0], [0, 255, 0]], np.float64)
    for order in ([0, 1], [1, 0]):
        v = np.concatenate([[far, near][i] for i in order])
        f = np.array([[0, 1, 2], [3, 4, 5]])
        out = render_mesh_soft(img, v, f, FOCAL, CENTER,
                               color=colors[order], alpha=1.0)
        np.testing.assert_array_equal(out[8, 8], [0, 255, 0])    # near wins
        np.testing.assert_array_equal(out[20, 8], [255, 0, 0])   # far only


def test_winding_and_tilt_shading():
    """Double-sided shading: flipping the winding renders identically; a
    tilted face is darker than a face-on one but never below ambient."""
    img = np.zeros((32, 32, 3), np.uint8)
    v = verts_from_uv([(4, 4), (24, 4), (4, 24)], 2.0)
    a = render_mesh_soft(img, v, [[0, 1, 2]], FOCAL, CENTER, alpha=1.0,
                         color=(200, 200, 200))
    b = render_mesh_soft(img, v, [[0, 2, 1]], FOCAL, CENTER, alpha=1.0,
                         color=(200, 200, 200))
    np.testing.assert_array_equal(a, b)
    assert (a[10, 10] == 200).all()  # face-on: shade exactly 1.0
    # tilt about y: push one corner back in z
    vt = v.copy()
    vt[1, 2] = 3.5
    c = render_mesh_soft(img, vt, [[0, 1, 2]], FOCAL, CENTER, alpha=1.0,
                         color=(200, 200, 200))
    covered = c.sum(-1) > 0
    assert covered.any()
    lit = c[covered].max()
    assert 0.3 * 200 - 1 <= lit < 200  # ambient floor, visibly darker


def test_behind_camera_faces_dropped():
    img = np.full((16, 16, 3), 7, np.uint8)
    v = np.array([[0.0, 0.0, -1.0], [0.1, 0.0, -1.0], [0.0, 0.1, 2.0],
                  [5.0, 5.0, 2.0], [5.1, 5.0, 2.0], [5.0, 5.1, 2.0]])
    out = render_mesh_soft(img, v, [[0, 1, 2], [3, 4, 5]], FOCAL, CENTER)
    np.testing.assert_array_equal(out, img)  # straddling face dropped,
    # second face projects far off-screen; input untouched (and copied)


def test_render_on_img_dispatches_mesh_vs_splat():
    """faces given -> filled mesh interior (rasterizer); faces=None -> the
    PIL point splat (only vertex dots). The interior pixel distinguishes."""
    img = np.zeros((32, 32, 3), np.uint8)
    v = verts_from_uv([(4, 4), (24, 4), (4, 24)], 2.0)
    mesh = render_on_img(img, v, np.array([[0, 1, 2]]), FOCAL, CENTER)
    assert (mesh[10, 10] != 0).any()
    splat = render_on_img(img, v, None, FOCAL, CENTER)
    assert (splat[10, 10] == 0).all()


def test_smpl_sized_mesh_renders_fast_enough():
    """The real use: an SMPL-sized mesh (6890 verts / 13776 faces) on a
    full-HD-shaped frame must render in interactive-offline time and
    produce a solid, shaded silhouette."""
    rng = np.random.RandomState(0)
    # closed-ish blob: unit sphere mesh by subdividing via random
    # triangulation of a sphere point set is overkill — a torus grid is
    # deterministic and watertight
    nu, nv = 120, 116  # 13920 faces ~ SMPL's 13776
    uu = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    vv = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    uu, vv = np.meshgrid(uu, vv, indexing="ij")
    R, r = 0.25, 0.1
    verts = np.stack([(R + r * np.cos(vv)) * np.cos(uu),
                      (R + r * np.cos(vv)) * np.sin(uu),
                      r * np.sin(vv)], -1).reshape(-1, 3)
    verts = verts + [0, 0, 2.0]
    idx = (np.arange(nu)[:, None] * nv + np.arange(nv)[None, :])
    i00, i01 = idx, np.roll(idx, -1, 1)
    i10, i11 = np.roll(idx, -1, 0), np.roll(np.roll(idx, -1, 0), -1, 1)
    faces = np.concatenate([
        np.stack([i00, i10, i01], -1).reshape(-1, 3),
        np.stack([i01, i10, i11], -1).reshape(-1, 3)])
    img = np.zeros((270, 480, 3), np.uint8)
    t0 = time.time()
    out = render_mesh_soft(img, verts, faces, (400.0, 400.0), (240.0, 135.0),
                           color=(10, 255, 255))
    dt = time.time() - t0
    covered = out.sum(-1) > 0
    assert covered.mean() > 0.05           # a real silhouette
    interior = out[135, 240]               # torus hole center: empty
    assert (interior == 0).all()
    shades = np.unique(out[covered][:, 1])
    assert len(shades) > 10                # curvature -> many shade levels
    assert dt < 30.0, f"rasterizer too slow: {dt:.1f}s"
    rng  # silence lint


def test_render_in_scene_joint_zbuffer():
    """Body and scene share ONE z-buffer like pyrender composing both
    meshes in one Scene (reference renderer.py:37-44): a scene point in
    FRONT of the body occludes it; one BEHIND is hidden by it."""
    w, h = 64, 48
    cc = (w / 2.0, h / 2.0)
    # face-on body triangle at z=2 centered on the image center
    uv = [(cc[0] - 10, cc[1] - 10), (cc[0] + 10, cc[1] - 10),
          (cc[0] - 10, cc[1] + 10)]
    z = 2.0
    body = np.stack([
        (np.array([p[0] for p in uv]) - cc[0]) / FOCAL[0] * z,
        (np.array([p[1] for p in uv]) - cc[1]) / FOCAL[1] * z,
        np.full(3, z)], -1)
    # both points project inside the body triangle (near its uv centroid)
    front = np.array([[-0.3, -0.3, 1.0]])   # z=1 -> in front of the body
    behind = np.array([[-1.2, -1.2, 4.0]])  # z=4, same pixel ray as front
    faces = np.array([[0, 1, 2]])

    out_f = render_in_scene(body, faces, front, img_size=(w, h),
                            focal_length=FOCAL)
    out_b = render_in_scene(body, faces, behind, img_size=(w, h),
                            focal_length=FOCAL)
    assert out_f.shape == (h, w, 3) and out_f.dtype == np.uint8
    px = (int(cc[1] + (-0.3) / 1.0 * FOCAL[1]),    # row = v
          int(cc[0] + (-0.3) / 1.0 * FOCAL[0]))    # col = u
    # gray scene quad wins in front (128,128,128 blended over the body)
    assert abs(int(out_f[px][0]) - int(out_f[px][1])) < 10, out_f[px]
    # behind: body color (10,255,255 shaded) shows — green >> red channel
    assert int(out_b[px][1]) - int(out_b[px][0]) > 100, out_b[px]
