"""Rotation representation conversions (JAX, TPU-native).

Functional equivalents of the reference geometry stack
(reference: utils/geometry.py:5-75, utils/konia_transform.py:316), redesigned as
pure jittable functions over batched arrays. All functions accept arbitrary
leading batch dimensions unless noted and are safe to `vmap`/`jit`.

Two 6-D rotation layouts exist in the reference and both are kept:
  * 'prohmr'    — x.reshape(-1, 2, 3) rows are the two 3-vectors
                  (reference utils/geometry.py:56-57)
  * 'diffusion' — x.reshape(-1, 3, 2) columns are the two 3-vectors
                  (reference utils/geometry.py:58-59)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def quat_to_rotmat(quat: Array) -> Array:
    """Quaternion (w, x, y, z) -> rotation matrix.

    quat: [..., 4] -> [..., 3, 3]. Mirrors reference utils/geometry.py:23-44.
    """
    norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    q = quat / norm
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return rot.reshape(q.shape[:-1] + (3, 3))


def aa_to_rotmat(theta: Array) -> Array:
    """Axis-angle -> rotation matrix via quaternion.

    theta: [..., 3] -> [..., 3, 3]. Keeps the reference's exact numerics,
    including the `theta + 1e-8` regularizer inside the norm
    (reference utils/geometry.py:14-20) so converted checkpoints reproduce
    bit-comparable outputs.
    """
    norm = jnp.linalg.norm(theta + 1e-8, axis=-1, keepdims=True)
    normalized = theta / norm
    half = norm * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=-1)
    return quat_to_rotmat(quat)


def _gram_schmidt(a1: Array, a2: Array) -> Array:
    """Build a rotation matrix from two 3-vectors (columns b1,b2,b3)."""
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-12)
    proj = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    u2 = a2 - proj * b1
    b2 = u2 / jnp.linalg.norm(u2, axis=-1, keepdims=True).clip(1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)  # columns


def rot6d_to_rotmat(x: Array, rot6d_mode: str = "prohmr") -> Array:
    """6-D rotation -> rotation matrix (Zhou et al. CVPR'19).

    x: [..., 6] (or any shape with trailing dims multiplying to a multiple
    of 6; it is reshaped to [..., 6] batches like the reference's
    `reshape(-1, 2, 3)` / `reshape(-1, 3, 2)`; reference utils/geometry.py:47-66).
    Returns [N, 3, 3] with N = x.size // 6.
    """
    flat = x.reshape(-1, 6)
    if rot6d_mode == "prohmr":
        m = flat.reshape(-1, 2, 3)  # rows are the two vectors
        a1, a2 = m[:, 0, :], m[:, 1, :]
    elif rot6d_mode == "diffusion":
        m = flat.reshape(-1, 3, 2)  # columns are the two vectors
        a1, a2 = m[:, :, 0], m[:, :, 1]
    else:
        raise ValueError(f"unknown rot6d_mode: {rot6d_mode}")
    return _gram_schmidt(a1, a2)


def rotmat_to_rot6d(rotmat: Array, rot6d_mode: str = "diffusion") -> Array:
    """Rotation matrix -> 6-D representation.

    rotmat: [..., 3, 3] -> [N, 6]. 'diffusion' keeps the first two columns
    flattened row-major (reference utils/geometry.py:69-75). 'prohmr' is the
    transpose layout (first two columns stacked as rows then flattened) —
    the reference left this path unimplemented ("todo"); we provide it since
    stage-1 GT encoding needs it (reference models/prohmr/prohmr_scene.py:91-92).
    """
    r = rotmat.reshape(-1, 3, 3)
    if rot6d_mode == "diffusion":
        return r[:, :, :2].reshape(-1, 6)
    elif rot6d_mode == "prohmr":
        # columns as two consecutive 3-vectors: [a1, a2] row-major
        return jnp.transpose(r[:, :, :2], (0, 2, 1)).reshape(-1, 6)
    raise ValueError(f"unknown rot6d_mode: {rot6d_mode}")


def rotmat_to_quat(rotmat: Array) -> Array:
    """Rotation matrix -> quaternion (w, x, y, z), branch-free.

    rotmat: [..., 3, 3] -> [..., 4]. Numerically-stable 4-branch selection
    implemented with `jnp.where` so it vectorizes on the VPU (equivalent of
    reference utils/konia_transform.py:192-313 rotation_matrix_to_quaternion).
    """
    m = rotmat
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    trace = m00 + m11 + m22

    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-24))

    # candidate 0: trace > 0
    s0 = _safe_sqrt(trace + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                    (m10 - m01) / s0], axis=-1)
    # candidate 1: m00 dominant
    s1 = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-1)
    # candidate 2: m11 dominant
    s2 = _safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2], axis=-1)
    # candidate 3: m22 dominant
    s3 = _safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3], axis=-1)

    cond0 = (trace > 0.0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return q


def quat_to_aa(quat: Array) -> Array:
    """Quaternion (w, x, y, z) -> axis-angle, stable near zero rotation.

    Mirrors reference utils/konia_transform.py:316-341 quaternion_to_angle_axis.
    """
    w = quat[..., 0]
    xyz = quat[..., 1:]
    sin_sq = jnp.sum(xyz * xyz, axis=-1)
    sin_theta = jnp.sqrt(jnp.maximum(sin_sq, 1e-24))
    cos_theta = w
    two_theta = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta),
    )
    k_pos = two_theta / sin_theta
    k_neg = 2.0 * jnp.ones_like(sin_theta)
    k = jnp.where(sin_sq > 1e-12, k_pos, k_neg)
    return xyz * k[..., None]


def rotmat_to_aa(rotmat: Array) -> Array:
    """Rotation matrix -> axis-angle (reference utils/konia_transform.py:316)."""
    return quat_to_aa(rotmat_to_quat(rotmat))
