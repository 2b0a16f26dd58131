"""Synthetic EgoBody-shaped batches for tests and benchmarks.

Produces batches with the exact key layout of the reference dataloader
(reference dataloaders/egobody_dataset.py:241-277), with images in NHWC.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def synthetic_batch(
    batch_size: int = 4,
    *,
    num_scene_points: int = 20000,
    img_size: int = 224,
    seed: int = 0,
    dtype=np.float32,
) -> Dict:
    rng = np.random.RandomState(seed)
    B = batch_size

    transl = np.array([[0.0, 0.0, 2.5]], dtype) + rng.randn(B, 3).astype(dtype) * 0.2
    scene = rng.randn(B, num_scene_points, 3).astype(dtype) * 1.0 + transl[:, None]

    kp2d = np.concatenate(
        [rng.rand(B, 25, 2).astype(dtype) - 0.5,
         (rng.rand(B, 25, 1) > 0.2).astype(dtype)],
        axis=-1,
    )

    batch = {
        "img": rng.randn(B, img_size, img_size, 3).astype(dtype) * 0.5,
        "orig_keypoints_2d": kp2d,
        "keypoints_2d": kp2d.copy(),
        "keypoints_3d": rng.randn(B, 24, 3).astype(dtype) * 0.3,
        "keypoints_3d_full": rng.randn(B, 24, 3).astype(dtype) * 0.3 + transl[:, None],
        "smpl_params": {
            "global_orient": rng.randn(B, 3).astype(dtype) * 0.3,
            "body_pose": rng.randn(B, 69).astype(dtype) * 0.2,
            "betas": rng.randn(B, 10).astype(dtype) * 0.5,
            "transl": transl,
        },
        "gender": rng.randint(0, 2, size=B).astype(np.int32),
        "fx": (np.full((B,), 1500.0, dtype) / 1500.0),
        "fy": (np.full((B,), 1500.0, dtype) / 1500.0),
        "cam_cx": np.full((B,), 960.0, dtype),
        "cam_cy": np.full((B,), 540.0, dtype),
        "box_center": rng.rand(B, 2).astype(dtype) * 1000 + 400,
        "box_size": rng.rand(B).astype(dtype) * 100 + 200,
        "scene_pcd_verts_full": scene,
    }
    return {k: _to_jnp(v) for k, v in batch.items()}


def _to_jnp(x):
    if isinstance(x, dict):
        return {k: _to_jnp(v) for k, v in x.items()}
    return jnp.asarray(x)
