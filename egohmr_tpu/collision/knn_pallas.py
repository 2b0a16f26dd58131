"""Pallas TPU kernel: nearest-body-vertex search for scene points.

The hot op of the collision stack (SURVEY.md §2.6 flags the pytorch3d KNN as
the Pallas candidate): for every scene point, argmin over body vertices of
the squared distance. One [block_p, 3] x [3, V] matmul per tile (MXU) with
the argmin reduction fused in VMEM — the XLA fallback in sdf.py materializes
the [block, V] distance tile through HBM instead.

The kernel returns only the argmin INDEX; callers recompute the distance in
plain JAX from the gathered vertex so autodiff gets the exact subgradient
(d/dv ||p - v_idx||) without a custom VJP.

Layouts: points and verts enter transposed as [B, 3, P] / [B, 3, V] so the
lane (last) dimension is the large one; the 3-sublane axis is padded by
Mosaic to the f32 tile height.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _nearest_kernel(p_ref, v_ref, vsq_ref, idx_ref):
    # p_ref: [1, 3, BP] block of points; v_ref: [1, 3, V]; vsq_ref: [1, 1, V]
    p = p_ref[0, :, :]       # [3, BP]
    v = v_ref[0, :, :]       # [3, V]
    # dots[bp, V] = pᵀ · v  (contract the 3-axis)
    dots = jax.lax.dot_general(
        p, v, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BP, V]
    d2 = vsq_ref[0, 0, :][None, :] - 2.0 * dots  # |p|² constant per row
    idx_ref[0, 0, :] = jnp.argmin(d2, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block_p",))
def nearest_vertex_idx_pallas(
    points: Array, verts: Array, *, block_p: int = 512
) -> Array:
    """points: [B, P, 3]; verts: [B, V, 3] -> argmin idx int32 [B, P].

    P is padded to a block multiple; V padded to a lane multiple with +inf
    sentinel vertices (never selected).
    """
    B, P, _ = points.shape
    V = verts.shape[1]
    n_blocks = -(-P // block_p)
    p_pad = n_blocks * block_p - P
    v_pad = (-V) % 128

    pts = jnp.pad(points, ((0, 0), (0, p_pad), (0, 0)))
    vts = jnp.pad(verts, ((0, 0), (0, v_pad), (0, 0)),
                  constant_values=1e15)  # sentinel verts: huge |v|²
    pts_t = jnp.swapaxes(pts, 1, 2)  # [B, 3, P']
    vts_t = jnp.swapaxes(vts, 1, 2)  # [B, 3, V']
    v_sq = jnp.sum(vts * vts, axis=-1)[:, None, :]  # [B, 1, V']
    Vp = V + v_pad

    grid = (B, n_blocks)
    idx = pl.pallas_call(
        _nearest_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, block_p), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Vp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Vp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_p), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, n_blocks * block_p), jnp.int32),
    )(pts_t, vts_t, v_sq)
    return idx[:, 0, :P]
