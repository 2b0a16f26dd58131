"""SMPL model loading.

Reads the official SMPL .pkl body files (SMPL_NEUTRAL/MALE/FEMALE.pkl) without
the chumpy dependency, mapping chumpy arrays to plain numpy during unpickling.
Replaces the reference's `smplx.create('data/smpl', model_type='smpl', ...)`
(reference models/egohmr/egohmr.py:105-107).

Also provides a deterministic synthetic model for tests/benchmarks so the
full pipeline runs without the (license-gated) SMPL download.
"""
from __future__ import annotations

import io
import os
import pickle
from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import constants as C
from .model import SMPLModel


class _ChumpyTolerantUnpickler(pickle.Unpickler):
    """Unpickler that turns chumpy arrays into numpy arrays."""

    def find_class(self, module, name):
        if module.startswith("chumpy"):
            class _FakeCh(np.ndarray):
                pass

            return _FakeCh
        if module == "scipy.sparse.csc" or module == "scipy.sparse._csc":
            import scipy.sparse

            return getattr(scipy.sparse, name)
        return super().find_class(module, name)


def _to_np(x) -> np.ndarray:
    if hasattr(x, "toarray"):  # scipy sparse
        return np.asarray(x.toarray())
    if isinstance(x, np.ndarray):
        return np.asarray(x)
    return np.asarray(x)


def load_smpl_pkl(path: str, num_betas: int = C.NUM_BETAS) -> SMPLModel:
    """Load an official SMPL pickle into an `SMPLModel` pytree."""
    with open(path, "rb") as f:
        data = _ChumpyTolerantUnpickler(f, encoding="latin1").load()

    v_template = _to_np(data["v_template"]).astype(np.float32)
    shapedirs = _to_np(data["shapedirs"])[:, :, :num_betas].astype(np.float32)
    posedirs = _to_np(data["posedirs"]).astype(np.float32)
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # [207, V*3]
    j_regressor = _to_np(data["J_regressor"]).astype(np.float32)
    lbs_weights = _to_np(data["weights"]).astype(np.float32)
    faces = _to_np(data["f"]).astype(np.int32)

    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(j_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        parents=jnp.asarray(C.PARENTS),
        faces=jnp.asarray(faces),
        extra_joint_ids=jnp.asarray(C.EXTRA_JOINT_VERTEX_IDS),
    )


_GENDER_FILES = {
    "neutral": "SMPL_NEUTRAL.pkl",
    "male": "SMPL_MALE.pkl",
    "female": "SMPL_FEMALE.pkl",
}


def create(model_path: str, gender: str = "neutral") -> SMPLModel:
    """smplx.create-style entry point: model_path may be a dir or a file."""
    if os.path.isdir(model_path):
        candidates = [
            os.path.join(model_path, _GENDER_FILES[gender]),
            os.path.join(model_path, "smpl", _GENDER_FILES[gender]),
            os.path.join(model_path, _GENDER_FILES[gender].lower()),
        ]
        for c in candidates:
            if os.path.exists(c):
                return load_smpl_pkl(c)
        raise FileNotFoundError(
            f"no SMPL body file for gender={gender} under {model_path}"
        )
    return load_smpl_pkl(model_path)


def make_synthetic_model(
    seed: int = 0, num_vertices: int = 512, num_faces: int = 1020
) -> SMPLModel:
    """Deterministic small SMPL-like model for tests and synthetic benchmarks.

    Has the real 24-joint kinematic tree, valid (convex-combination) skinning
    weights dominated by the nearest joint, orthogonal blendshape scales, and
    extra-joint ids remapped into range.
    """
    rng = np.random.RandomState(seed)
    V = num_vertices

    # joints roughly in a human-ish layout: place them by walking the tree
    joint_pos = np.zeros((24, 3), np.float32)
    for k in range(1, 24):
        offset = rng.randn(3).astype(np.float32) * 0.12
        joint_pos[k] = joint_pos[C.PARENTS[k]] + offset

    # vertices scattered around the joints
    owner = rng.randint(0, 24, size=V)
    v_template = joint_pos[owner] + rng.randn(V, 3).astype(np.float32) * 0.06

    # skinning weights: softmax over inverse distance to joints
    d2 = ((v_template[:, None, :] - joint_pos[None]) ** 2).sum(-1)
    logits = -d2 / 0.02
    logits -= logits.max(axis=1, keepdims=True)
    w = np.exp(logits)
    lbs_weights = (w / w.sum(axis=1, keepdims=True)).astype(np.float32)

    # J_regressor: rows average the vertices owned by each joint so that
    # J_regressor @ v_template ≈ joint_pos (exact enough for tests)
    j_reg = np.zeros((24, V), np.float32)
    for k in range(24):
        idx = np.where(owner == k)[0]
        if len(idx) == 0:
            idx = np.array([k % V])
        j_reg[k, idx] = 1.0 / len(idx)

    shapedirs = rng.randn(V, 3, C.NUM_BETAS).astype(np.float32) * 0.01
    posedirs = (rng.randn(207, V * 3).astype(np.float32) * 1e-3)

    faces = rng.randint(0, V, size=(num_faces, 3)).astype(np.int32)
    extra_ids = (C.EXTRA_JOINT_VERTEX_IDS % V).astype(np.int32)

    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(j_reg),
        lbs_weights=jnp.asarray(lbs_weights),
        parents=jnp.asarray(C.PARENTS),
        faces=jnp.asarray(faces),
        extra_joint_ids=jnp.asarray(extra_ids),
    )
