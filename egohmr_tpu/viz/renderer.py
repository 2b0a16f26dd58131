"""Host-side visualization (optional extra).

Equivalent of reference utils/renderer.py:15-47 (pyrender EGL offscreen
overlay) and the open3d live viewers in the test scripts. This environment
has neither GL nor open3d, so:

  * when pyrender/trimesh ARE importable, `MeshRenderer` uses them with the
    same camera setup as the reference;
  * otherwise `render_on_img` falls back to a dependency-free PIL point-splat
    overlay (projected vertices, depth-sorted) — enough to eyeball poses.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def project_vertices(
    vertices: np.ndarray, focal_length: Tuple[float, float],
    camera_center: Tuple[float, float],
) -> np.ndarray:
    """[V, 3] camera-frame vertices -> [V, 2] pixels."""
    z = np.clip(vertices[:, 2], 1e-6, None)
    u = vertices[:, 0] / z * focal_length[0] + camera_center[0]
    v = vertices[:, 1] / z * focal_length[1] + camera_center[1]
    return np.stack([u, v], axis=-1)


def render_on_img(
    img: np.ndarray,                  # [H, W, 3] uint8 RGB
    vertices: np.ndarray,             # [V, 3] camera-frame (transl applied)
    faces: Optional[np.ndarray],
    focal_length: Tuple[float, float],
    camera_center: Tuple[float, float],
    color=(10, 255, 255),
    alpha: float = 0.9,
    point_radius: int = 1,
) -> np.ndarray:
    """Overlay the posed body on the image (reference renderer.py:15-31)."""
    try:
        return _render_pyrender(img, vertices, faces, focal_length,
                                camera_center, color, alpha)
    except Exception:
        return _render_points_pil(img, vertices, focal_length, camera_center,
                                  color, point_radius)


def render_in_scene(
    body_vertices: np.ndarray,        # [V, 3]
    faces: Optional[np.ndarray],
    scene_points: np.ndarray,         # [P, 3]
    view_transform: Optional[np.ndarray] = None,  # [4, 4] world->view
    img_size: Tuple[int, int] = (1920, 1080),
    focal_length: Tuple[float, float] = (1000.0, 1000.0),
) -> np.ndarray:
    """Body + scene point cloud from an external view
    (reference renderer.py:33-47 render_in_scene / open3d viewers).
    Falls back to the PIL splat when GL is unavailable."""
    w, h = img_size
    cc = (w / 2.0, h / 2.0)
    if view_transform is not None:
        r, t = view_transform[:3, :3], view_transform[:3, 3]
        body_vertices = body_vertices @ r.T + t
        scene_points = scene_points @ r.T + t
    canvas = np.full((h, w, 3), 24, np.uint8)
    canvas = _render_points_pil(canvas, scene_points, focal_length, cc,
                                (128, 128, 128), 1)
    return render_on_img(canvas, body_vertices, faces, focal_length, cc)


def _render_pyrender(img, vertices, faces, focal_length, camera_center,
                     color, alpha):
    import pyrender
    import trimesh

    h, w = img.shape[:2]
    mesh = trimesh.Trimesh(vertices, faces, process=False)
    rot = trimesh.transformations.rotation_matrix(np.radians(180), [1, 0, 0])
    mesh.apply_transform(rot)
    material = pyrender.MetallicRoughnessMaterial(
        metallicFactor=0.0, alphaMode="OPAQUE",
        baseColorFactor=(color[0] / 255, color[1] / 255, color[2] / 255, 1.0))
    scene = pyrender.Scene(bg_color=[0, 0, 0, 0], ambient_light=(0.3,) * 3)
    scene.add(pyrender.Mesh.from_trimesh(mesh, material=material), "mesh")
    camera = pyrender.IntrinsicsCamera(
        fx=focal_length[0], fy=focal_length[1],
        cx=camera_center[0], cy=camera_center[1])
    scene.add(camera, pose=np.eye(4))
    light = pyrender.DirectionalLight(color=np.ones(3), intensity=3.0)
    scene.add(light, pose=np.eye(4))
    renderer = pyrender.OffscreenRenderer(viewport_width=w, viewport_height=h,
                                          point_size=1.0)
    rgba, _ = renderer.render(scene, flags=pyrender.RenderFlags.RGBA)
    renderer.delete()
    valid = (rgba[..., 3] > 0)[..., None]
    out = (rgba[..., :3] * valid * alpha
           + img * (1 - valid * alpha)).astype(np.uint8)
    return out


def _render_points_pil(img, vertices, focal_length, camera_center, color,
                       point_radius):
    from PIL import Image, ImageDraw

    h, w = img.shape[:2]
    uv = project_vertices(np.asarray(vertices), focal_length, camera_center)
    order = np.argsort(-np.asarray(vertices)[:, 2])  # far -> near
    im = Image.fromarray(np.asarray(img, np.uint8))
    draw = ImageDraw.Draw(im)
    r = point_radius
    for i in order:
        u, v = uv[i]
        if 0 <= u < w and 0 <= v < h:
            draw.ellipse((u - r, v - r, u + r, v + r), fill=tuple(color))
    return np.asarray(im)
