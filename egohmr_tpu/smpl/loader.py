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


def _unit_sphere(rings: int, segs: int):
    """UV sphere with OUTWARD-wound faces. Returns (verts [N,3], faces [F,3]);
    N = (rings-1)*segs + 2."""
    thetas = np.pi * np.arange(1, rings) / rings
    phis = 2 * np.pi * np.arange(segs) / segs
    ring_v = np.stack([
        (np.sin(thetas)[:, None] * np.cos(phis)[None]).ravel(),
        (np.sin(thetas)[:, None] * np.sin(phis)[None]).ravel(),
        np.repeat(np.cos(thetas), segs),
    ], axis=-1)
    verts = np.concatenate(
        [[[0.0, 0.0, 1.0]], ring_v, [[0.0, 0.0, -1.0]]]).astype(np.float32)
    north, south = 0, len(verts) - 1
    rid = lambda r, s: 1 + r * segs + (s % segs)
    faces = []
    for s in range(segs):  # pole caps
        faces.append([north, rid(0, s), rid(0, s + 1)])
        faces.append([south, rid(rings - 2, s + 1), rid(rings - 2, s)])
    for r in range(rings - 2):  # quad strips
        for s in range(segs):
            a, b = rid(r, s), rid(r, s + 1)
            c, d = rid(r + 1, s), rid(r + 1, s + 1)
            faces.append([a, c, b])
            faces.append([b, c, d])
    faces = np.asarray(faces, np.int32)
    # enforce outward winding (convex + centered: normal·centroid > 0)
    tri = verts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    flip = (n * tri.mean(axis=1)).sum(-1) < 0
    faces[flip] = faces[flip][:, [0, 2, 1]]
    return verts, faces


def make_synthetic_watertight_model(
    seed: int = 0, rings: int = 10, segs: int = 16
) -> SMPLModel:
    """Synthetic SMPL-like body whose mesh is WATERTIGHT with coherent
    outward normals: one closed ellipsoid per skeleton part, elongated along
    its bone, rigidly skinned to its joint.

    `make_synthetic_model` keeps random faces (cheap, fine for shape/pipeline
    tests) but its noise normals make normal-signed SDF labels meaningless —
    this body is the in-image target for SIGNED occupancy distillation
    (`distill_occupancy --synthetic_watertight`) and for any test that needs
    a trustworthy inside/outside (winding number, signed collision labels).
    V = 24 * ((rings-1)*segs + 2); default 3504.
    """
    rng = np.random.RandomState(seed)
    sph_v, sph_f = _unit_sphere(rings, segs)
    nv = len(sph_v)
    V = 24 * nv

    joint_pos = np.zeros((24, 3), np.float32)
    for k in range(1, 24):
        offset = rng.randn(3).astype(np.float32) * 0.12
        joint_pos[k] = joint_pos[C.PARENTS[k]] + offset

    verts, faces, owner = [], [], []
    centers = np.zeros((24, 3), np.float32)
    for k in range(24):
        if k == 0:
            center, axis, half_len = joint_pos[0], np.array([0., 0., 1.],
                                                            np.float32), 0.09
        else:
            p = joint_pos[C.PARENTS[k]]
            bone = joint_pos[k] - p
            blen = max(float(np.linalg.norm(bone)), 1e-3)
            center = 0.5 * (joint_pos[k] + p)
            axis, half_len = bone / blen, 0.45 * blen
        r_perp = np.clip(0.45 * half_len, 0.02, 0.06)
        # orthonormal frame with `axis` as the long direction
        tmp = np.array([1.0, 0.0, 0.0], np.float32)
        if abs(axis @ tmp) > 0.9:
            tmp = np.array([0.0, 1.0, 0.0], np.float32)
        u = np.cross(axis, tmp)
        u /= np.linalg.norm(u)
        w = np.cross(axis, u)
        frame = np.stack([u * r_perp, w * r_perp,
                          axis * (half_len + r_perp)], axis=0)  # [3, 3]
        verts.append(sph_v @ frame + center)
        faces.append(sph_f + k * nv)
        owner.append(np.full((nv,), k, np.int64))
        centers[k] = center
    v_template = np.concatenate(verts).astype(np.float32)
    faces = np.concatenate(faces).astype(np.int32)
    owner = np.concatenate(owner)

    # rigid parts: one-hot skinning to the owning joint (the COAP-style
    # near-rigid-part assumption the occupancy decomposition relies on)
    lbs_weights = np.zeros((V, 24), np.float32)
    lbs_weights[np.arange(V), owner] = 1.0

    # J_regressor: each sphere's uniform mean is its CENTER; for k>0 the
    # center is the bone midpoint, so joint_k = 2*center_k - joint_parent —
    # unroll the recursion into exact linear rows over template vertices
    mean_row = np.zeros((24, V), np.float32)
    for k in range(24):
        mean_row[k, owner == k] = 1.0 / nv
    j_reg = np.zeros((24, V), np.float32)
    j_reg[0] = mean_row[0]
    for k in range(1, 24):
        j_reg[k] = 2.0 * mean_row[k] - j_reg[C.PARENTS[k]]

    # small smooth deformations keep the mesh closed (connectivity is fixed)
    shapedirs = rng.randn(V, 3, C.NUM_BETAS).astype(np.float32) * 0.005
    posedirs = rng.randn(207, V * 3).astype(np.float32) * 5e-4
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
