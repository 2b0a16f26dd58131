"""Camera projection utilities (JAX).

Equivalents of reference utils/geometry.py:78-141, written as pure batched
functions (no in-place K matrix assembly; composed from elementwise ops so XLA
fuses them into surrounding matmuls).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def perspective_projection(
    points: Array,
    translation: Array,
    focal_length: Array,
    camera_center: Optional[Array] = None,
    rotation: Optional[Array] = None,
) -> Array:
    """Project 3-D points to the image plane.

    points: [B, N, 3]; translation: [B, 3]; focal_length: [B, 2];
    camera_center: [B, 2] (default 0); rotation: [B, 3, 3] (default identity).
    Returns [B, N, 2]. Reference utils/geometry.py:78-116.
    """
    if rotation is not None:
        points = jnp.einsum("bij,bkj->bki", rotation, points, precision="highest")
    points = points + translation[:, None, :]
    projected = points[..., :2] / points[..., 2:3]
    fxy = focal_length[:, None, :]
    out = projected * fxy
    if camera_center is not None:
        out = out + camera_center[:, None, :]
    return out


def convert_pare_to_full_img_cam(
    pare_cam: Array,
    bbox_height: Array,
    bbox_center: Array,
    img_w: Array,
    img_h: Array,
    focal_length: Array,
    crop_res: int = 224,
) -> Array:
    """Weak-perspective crop camera -> full-image perspective translation.

    pare_cam: [B, 3] (s, tx, ty); returns [B, 3] camera/body translation in
    full-image camera coordinates. Reference utils/geometry.py:119-131
    (PARE, arXiv:2009.06549).
    """
    s, tx, ty = pare_cam[:, 0], pare_cam[:, 1], pare_cam[:, 2]
    r = bbox_height / crop_res
    tz = 2.0 * focal_length / (r * crop_res * s)
    cx = 2.0 * (bbox_center[:, 0] - (img_w / 2.0)) / (s * bbox_height)
    cy = 2.0 * (bbox_center[:, 1] - (img_h / 2.0)) / (s * bbox_height)
    return jnp.stack([tx + cx, ty + cy, tz], axis=-1)


def points_coord_trans(points: Array, trans_mtx: Array) -> Array:
    """Apply a 4x4 homogeneous transform to [..., N, 3] points.

    Reference utils/geometry.py:137-141.
    """
    rot = jnp.swapaxes(trans_mtx[..., :3, :3], -1, -2)
    moved = jnp.matmul(points, rot, precision="highest")
    return moved + trans_mtx[..., :3, 3][..., None, :]
