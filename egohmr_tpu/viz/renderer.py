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
