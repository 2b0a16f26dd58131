"""SMPL linear blend skinning in pure JAX.

TPU-native reimplementation of the smplx SMPL forward pass that the reference
calls everywhere (reference models/egohmr/egohmr.py:105-107,276;
models/prohmr/prohmr_scene.py:64-66,169). The whole forward is expressed as a
handful of large matmuls (shape blendshapes, pose blendshapes, joint
regression, skinning) plus a `lax.scan` down the 24-joint kinematic chain —
everything maps onto the MXU and fuses under jit. The per-sample Python
objects of smplx (SMPLOutput etc.) are replaced by a NamedTuple of arrays.

Output matches smplx semantics: `joints` has 45 rows — 24 regressed skeleton
joints followed by 21 mesh-vertex keypoints (face/feet/finger tips), the
layout the reference's `smpl_to_openpose` indexing assumes
(reference models/egohmr/egohmr.py:108-109).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import aa_to_rotmat
from . import constants as C

Array = jax.Array


class SMPLModel(NamedTuple):
    """Static SMPL model data (a pytree of device arrays)."""

    v_template: Array      # [V, 3]
    shapedirs: Array       # [V, 3, n_betas]
    posedirs: Array        # [207, V*3] (smplx layout: reshaped + transposed)
    j_regressor: Array     # [24, V]
    lbs_weights: Array     # [V, 24]
    parents: Array         # [24] int32
    faces: Array           # [F, 3] int32
    extra_joint_ids: Array  # [21] int32

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]


class SMPLOutput(NamedTuple):
    vertices: Array       # [B, V, 3]
    joints: Array         # [B, 45, 3]
    full_pose: Array      # [B, 24, 3, 3] rotation matrices
    joints_smpl: Array    # [B, 24, 3] skeleton joints only


def _rigid_transform(rot_mats: Array, joints: Array, parents: np.ndarray):
    """Forward-kinematics chain.

    rot_mats: [B, 24, 3, 3]; joints: [B, 24, 3] rest-pose joint locations.
    Returns (posed_joints [B,24,3], rel_transforms [B,24,4,4]) following the
    standard SMPL batch_rigid_transform: A_k = A_parent(k) @ [R_k | j_k - j_parent].
    """
    rel_joints = joints.at[:, 1:].add(-joints[:, parents[1:]])

    def make_tf(rot, t):
        # [B, 4, 4]
        top = jnp.concatenate([rot, t[..., None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], rot.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    transforms_mat = make_tf(rot_mats, rel_joints)  # [B, 24, 4, 4]

    # walk down the chain: parents[k] < k for SMPL so a sequential pass works.
    # 24 chained 4x4 matmuls per sample — negligible FLOPs; unrolled in Python
    # (static 24) so XLA sees a flat dependency chain with no dynamic updates.
    globals_list = [transforms_mat[:, 0]]
    for k in range(1, len(parents)):
        globals_list.append(
            jnp.matmul(
                globals_list[parents[k]], transforms_mat[:, k], precision="highest"
            )
        )
    chain = jnp.stack(globals_list, axis=1)  # [B, 24, 4, 4]

    posed_joints = chain[:, :, :3, 3]
    # subtract the skeleton-induced translation of the rest joints
    joints_hom = jnp.concatenate([joints, jnp.zeros_like(joints[..., :1])], axis=-1)
    correction = jnp.einsum(
        "bkij,bkj->bki", chain, joints_hom, precision="highest"
    )
    rel = chain.at[:, :, :3, 3].add(-correction[..., :3])
    return posed_joints, rel


def lbs_transforms(
    model: SMPLModel, betas: Array, rot_mats: Array
) -> Tuple[Array, Array, Array, Array]:
    """The pose-dependent core shared by full and selective skinning.

    rot_mats: [B, 24, 3, 3]. Returns (v_shaped [B,V,3], pose_feature [B,207],
    posed_joints [B,24,3], rel_transforms [B,24,4,4]).
    """
    B = betas.shape[0]
    # 1. shape blendshapes:  v_shaped = T + S·β
    blend = jnp.einsum(
        "bl,vcl->bvc", betas, model.shapedirs, precision="highest"
    )
    v_shaped = model.v_template[None] + blend  # [B, V, 3]

    # 2. rest joints
    joints_rest = jnp.einsum(
        "jv,bvc->bjc", model.j_regressor, v_shaped, precision="highest"
    )  # [B, 24, 3]

    # 3. pose feature from the 23 non-root rotations
    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # [B, 207]

    # 4. forward kinematics
    parents = np.asarray(C.PARENTS)
    posed_joints, rel_transforms = _rigid_transform(rot_mats, joints_rest, parents)
    return v_shaped, pose_feature, posed_joints, rel_transforms


def lbs(
    model: SMPLModel,
    betas: Array,
    global_orient: Array,
    body_pose: Array,
    transl: Optional[Array] = None,
    pose2rot: bool = True,
) -> SMPLOutput:
    """SMPL forward pass.

    betas: [B, 10]; global_orient: [B, 1, 3, 3] or [B, 3] (axis-angle when
    pose2rot); body_pose: [B, 23, 3, 3] or [B, 69]; transl: [B, 3] or None.
    Matches smplx.SMPL.forward(..., pose2rot=...) as used by the reference
    (models/egohmr/egohmr.py:276 uses pose2rot=False with rotmats;
    dataloaders/augmentation.py:458 uses axis-angle).
    """
    B = betas.shape[0]
    if pose2rot:
        aa = jnp.concatenate(
            [global_orient.reshape(B, 1, 3), body_pose.reshape(B, 23, 3)], axis=1
        )
        rot_mats = aa_to_rotmat(aa.reshape(-1, 3)).reshape(B, 24, 3, 3)
    else:
        rot_mats = jnp.concatenate(
            [global_orient.reshape(B, 1, 3, 3), body_pose.reshape(B, 23, 3, 3)],
            axis=1,
        )

    v_shaped, pose_feature, posed_joints, rel_transforms = lbs_transforms(
        model, betas, rot_mats
    )

    # pose blendshape offsets over the full mesh
    pose_offsets = jnp.matmul(
        pose_feature, model.posedirs, precision="highest"
    ).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    # 5. skinning:  T = W · A
    T = jnp.einsum(
        "vk,bkij->bvij", model.lbs_weights, rel_transforms, precision="highest"
    )  # [B, V, 4, 4]
    v_hom = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    verts = jnp.einsum("bvij,bvj->bvi", T, v_hom, precision="highest")[..., :3]

    # 6. extra keypoints straight from the mesh (vertex_joint_selector)
    extra = verts[:, model.extra_joint_ids]  # [B, 21, 3]
    joints45 = jnp.concatenate([posed_joints, extra], axis=1)

    if transl is not None:
        t = transl[:, None, :]
        verts = verts + t
        joints45 = joints45 + t
        posed_joints = posed_joints + t

    return SMPLOutput(
        vertices=verts,
        joints=joints45,
        full_pose=rot_mats,
        joints_smpl=posed_joints,
    )


def lbs_apply_select(
    model: SMPLModel,
    betas: Array,
    pose_feature: Array,
    rel_transforms: Array,
    idx: Array,
    *,
    pose_chunk: int = 256,
) -> Array:
    """Pose ONLY the template vertices `idx` [B, K] (duplicates allowed).

    Exactly the math of `lbs(...).vertices[b, idx[b]]`, but every gather is
    from a CONSTANT table (v_template/shapedirs/posedirs/lbs_weights at
    stop-gradient indices), so the BACKWARD is gathers + matmuls over K —
    no [B, K]→[B, V, 3] scatter and no V-sized skinning backward. This is
    the TPU-native shape for loss terms that touch a few vertices per point
    (collision guidance: the nearest-vertex distance); scatter on TPU
    serializes, and the full-mesh skinning backward costs V/K times the work.

    `pose_chunk` bounds the [B, chunk, 3, 207] gathered posedirs buffer
    (40 MB at B=64, chunk=256).
    """
    B, K = idx.shape
    idx = jax.lax.stop_gradient(idx)

    # selected template + shape blendshapes
    vt_sel = model.v_template[idx]                          # [B, K, 3]
    sd_sel = model.shapedirs[idx]                           # [B, K, 3, L]
    v_shaped_sel = vt_sel + jnp.einsum(
        "bl,bkcl->bkc", betas, sd_sel, precision="highest")

    # selected pose blendshape offsets, chunked over K to bound the gather
    pd_v = jnp.swapaxes(model.posedirs, 0, 1).reshape(      # [V, 3, 207]
        model.num_vertices, 3, pose_feature.shape[-1])
    pad = (-K) % pose_chunk
    idx_p = jnp.pad(idx, ((0, 0), (0, pad)))
    nc = idx_p.shape[1] // pose_chunk
    idx_c = jnp.swapaxes(idx_p.reshape(B, nc, pose_chunk), 0, 1)

    def one_chunk(ic):                                      # ic: [B, chunk]
        sel = pd_v[ic]                                      # [B, chunk, 3, F]
        return jnp.einsum("bf,bkcf->bkc", pose_feature, sel,
                          precision="highest")

    offs = jax.lax.map(one_chunk, idx_c)                    # [nc, B, chunk, 3]
    pose_offsets_sel = jnp.swapaxes(offs, 0, 1).reshape(B, -1, 3)[:, :K]
    v_posed_sel = v_shaped_sel + pose_offsets_sel

    # selected skinning: T_sel = W[idx] · A
    w_sel = model.lbs_weights[idx]                          # [B, K, 24]
    t_sel = jnp.einsum("bkw,bwij->bkij", w_sel, rel_transforms,
                       precision="highest")                 # [B, K, 4, 4]
    v_hom = jnp.concatenate(
        [v_posed_sel, jnp.ones_like(v_posed_sel[..., :1])], axis=-1)
    return jnp.einsum("bkij,bkj->bki", t_sel, v_hom,
                      precision="highest")[..., :3]


_INCIDENCE_CACHE: dict = {}


def _vertex_face_table(faces_np: np.ndarray, num_vertices: int) -> np.ndarray:
    """[V, K] indices of the faces incident to each vertex, padded with the
    sentinel index F (an extra all-zeros face-normal row). The mesh topology
    is static, so this is built once on host and cached."""
    key = (faces_np.shape[0], num_vertices, faces_np.tobytes())
    cached = _INCIDENCE_CACHE.get(key)
    if cached is not None:
        return cached
    lists: list = [[] for _ in range(num_vertices)]
    for f, (a, b, c) in enumerate(faces_np):
        lists[a].append(f)
        lists[b].append(f)
        lists[c].append(f)
    k_max = max((len(l) for l in lists), default=1)
    table = np.full((num_vertices, k_max), faces_np.shape[0], np.int32)
    for v, l in enumerate(lists):
        table[v, :len(l)] = l
    _INCIDENCE_CACHE[key] = table
    return table


def vertex_normals(vertices: Array, faces: Array) -> Array:
    """Area-weighted per-vertex normals. vertices: [B, V, 3]; faces: [F, 3].

    Scatter-free: per-vertex sums gather face normals through a static
    [V, K] incidence table (scatter-add is a serial slow path on TPU; the
    gather keeps the whole op on the VPU).
    """
    v0 = vertices[:, faces[:, 0]]
    v1 = vertices[:, faces[:, 1]]
    v2 = vertices[:, faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # [B, F, 3] (area-weighted)
    V = vertices.shape[1]

    if isinstance(faces, jax.core.Tracer):
        # faces passed as a jit/vmap ARGUMENT (not the usual closed-over
        # constant): the host-side incidence table can't be built from a
        # tracer — fall back to scatter-add
        def accumulate(fn_b):
            out = jnp.zeros((V, 3), vertices.dtype)
            out = out.at[faces[:, 0]].add(fn_b)
            out = out.at[faces[:, 1]].add(fn_b)
            out = out.at[faces[:, 2]].add(fn_b)
            return out

        n = jax.vmap(accumulate)(fn)
    else:
        table = jnp.asarray(_vertex_face_table(np.asarray(faces), V))
        fn_pad = jnp.concatenate(
            [fn, jnp.zeros((fn.shape[0], 1, 3), fn.dtype)], axis=1)
        n = jnp.sum(fn_pad[:, table], axis=2)  # [B, V, K, 3] -> [B, V, 3]
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True).clip(1e-12)
