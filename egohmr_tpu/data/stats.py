"""Body-representation normalization statistics.

Vectorized equivalent of reference dataloaders/egobody_dataset.py:101-117:
over the train split, convert all GT poses to 144-d rot6d ('diffusion'
layout), take the per-dim mean, and collapse the std to two scalars — one for
the 6 global-orient dims, one for the 138 body-pose dims.
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

import jax.numpy as jnp

from ..geometry import aa_to_rotmat, rotmat_to_rot6d


def compute_body_rep_stats(
    global_orient: np.ndarray,  # [N, 3] axis-angle
    body_pose: np.ndarray,      # [N, 69]
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (Xmean [144], Xstd [144])."""
    n = global_orient.shape[0]
    aa = np.concatenate([global_orient.reshape(n, 1, 3),
                         body_pose.reshape(n, 23, 3)], axis=1)
    rotmat = np.asarray(aa_to_rotmat(jnp.asarray(aa.reshape(-1, 3))))
    rot6d = np.asarray(
        rotmat_to_rot6d(jnp.asarray(rotmat), "diffusion")).reshape(n, 144)
    mean = rot6d.mean(axis=0)
    std = rot6d.std(axis=0)
    std[0:6] = std[0:6].mean()     # reference :114
    std[6:] = std[6:].mean()       # reference :115
    return mean.astype(np.float32), std.astype(np.float32)


def save_stats(path: str, mean: np.ndarray, std: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, Xmean=mean, Xstd=std)


def load_stats(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with np.load(path) as z:
        return z["Xmean"].astype(np.float32), z["Xstd"].astype(np.float32)
