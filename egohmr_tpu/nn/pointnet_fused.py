"""Pallas TPU kernel: whole-network fused ResnetPointnet forward.

The 20k-point scene encoder (reference models/respointnet.py:33-58) is the
dominant conditioning cost. The XLA path materializes every stage activation
([B, 20000, 256] f32 = 1.3 GB at batch 64) in HBM between stages. LESSON from
the deleted round-1 experiment (nn/pointnet_pallas.py, one Pallas kernel PER
STAGE — see git history): per-stage kernels still pay one HBM round trip per
stage and measured SLOWER than XLA's own fusions; the only way past XLA here
is keeping the whole network's activations VMEM-resident, which is what this
kernel does.

This kernel keeps the ENTIRE network per batch row resident in VMEM:

  grid = (B,)                 one grid step == one scene cloud
  VMEM scratch: two [P, H] activation buffers (bf16), ping-ponged
  per step: fc_pos + block_0 + 3 pooled-context stages + final max-pool,
            each as an in-kernel chunk loop over the point axis

HBM traffic per row: read the [P, 3] points once, write the [H] pooled
feature once. All matmuls run bf16 inputs with f32 accumulation — the same
arithmetic XLA's default (low) matmul precision uses on TPU — and the
max-pools accumulate in f32. Activations round to bf16 between stages
(storage only); `tests/test_pointnet_fused.py` pins the numeric delta vs the
f32 XLA path.

Inference-only: `pallas_call` has no autodiff rule here; training keeps the
XLA `pointnet_forward` (its backward is a handful of big matmuls XLA already
schedules well).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .core import linear, relu

Array = jax.Array

_NEG = -3e38  # f32 max-pool identity


def _kernel(n_chunks: int, chunk: int, hidden: int,
            pts_ref,                       # [1, Ppad, 3] bf16
            wpos_ref, bpos_ref,            # [3, 2H] bf16, [1, 2H] f32
            w00_ref, b00_ref, w01_ref, b01_ref, w0s_ref,   # block_0
            w0a_ref, w0b_ref, b0_ref,      # stages 1-3, stacked [3, ...]
            w1_ref, b1_ref, wsa_ref, wsb_ref,
            out_ref,                       # [1, H] f32 final pooled feature
            xbuf, ybuf):                   # VMEM scratch [Ppad, H] bf16
    H = hidden
    f32 = jnp.float32

    def mm(a, w_ref_slice):
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), w_ref_slice,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    # ---- stage 0: fc_pos + block_0 (2H -> H), chunked; writes xbuf, pool_1
    def c0(c, pool):
        off = pl.multiple_of(c * chunk, chunk)
        pts = pts_ref[0, pl.ds(off, chunk), :]                # [CH, 3] bf16
        net0 = mm(pts, wpos_ref[...]) + bpos_ref[0]           # [CH, 2H] f32
        net = mm(relu(net0), w00_ref[...]) + b00_ref[0]       # [CH, H]
        dx = mm(relu(net), w01_ref[...]) + b01_ref[0]
        x1 = mm(net0, w0s_ref[...]) + dx
        xbuf[pl.ds(off, chunk), :] = x1.astype(jnp.bfloat16)
        return jnp.maximum(pool, jnp.max(x1, axis=0, keepdims=True))

    pool = jax.lax.fori_loop(
        0, n_chunks, c0, jnp.full((1, H), _NEG, f32))

    # ---- stages 1-3: pooled-context split blocks (H ⊕ pool -> H)
    for s in range(3):
        src, dst = (xbuf, ybuf) if s % 2 == 0 else (ybuf, xbuf)
        # pooled-context halves: [1, H] rows, computed once per stage
        rpool = mm(relu(pool), w0b_ref[s]) + b0_ref[s]        # [1, H] f32
        xspool = mm(pool, wsb_ref[s])

        def cs(c, pool_new, *, s=s, src=src, dst=dst, rpool=rpool,
               xspool=xspool):
            off = pl.multiple_of(c * chunk, chunk)
            x = src[pl.ds(off, chunk), :]                     # [CH, H] bf16
            net = mm(relu(x), w0a_ref[s]) + rpool
            dx = mm(relu(net), w1_ref[s]) + b1_ref[s]
            out = mm(x, wsa_ref[s]) + xspool + dx
            dst[pl.ds(off, chunk), :] = out.astype(jnp.bfloat16)
            return jnp.maximum(pool_new, jnp.max(out, axis=0, keepdims=True))

        pool = jax.lax.fori_loop(
            0, n_chunks, cs, jnp.full((1, H), _NEG, f32))

    out_ref[0] = pool  # out block is [1, 1, H] (Mosaic wants ≥2 trailing
    # dims that tile to (8,128) or match the array; the singleton does)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _fused_pointnet_feature(points: Array, params: dict, *,
                            chunk: int = 2048) -> Array:
    """points: [B, P, 3] f32 -> pooled pre-fc_c feature [B, H] f32."""
    B, P, _ = points.shape
    H = params["block_0"]["fc_1"]["w"].shape[-1]
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    # pad by REPLICATING the last point: max-pool over duplicates is exact,
    # so no in-kernel tail masking is needed
    pts = jnp.pad(points, ((0, 0), (0, pad), (0, 0)), mode="edge")
    pts = pts.astype(jnp.bfloat16)

    bf = jnp.bfloat16
    b0p = params["block_0"]

    def stk(getter):
        return jnp.stack([getter(params[f"block_{i}"]) for i in (1, 2, 3)])

    w0a = stk(lambda p: p["fc_0"]["w"][:H]).astype(bf)      # [3, H, H]
    w0b = stk(lambda p: p["fc_0"]["w"][H:]).astype(bf)
    b0 = stk(lambda p: p["fc_0"]["b"][None])                # [3, 1, H] f32
    w1 = stk(lambda p: p["fc_1"]["w"]).astype(bf)
    b1 = stk(lambda p: p["fc_1"]["b"][None])
    wsa = stk(lambda p: p["shortcut"]["w"][:H]).astype(bf)
    wsb = stk(lambda p: p["shortcut"]["w"][H:]).astype(bf)

    full = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, n_chunks, chunk, H)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n_chunks * chunk, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full(3, 2 * H), full(1, 2 * H),
            full(2 * H, H), full(1, H), full(H, H), full(1, H),
            full(2 * H, H),
            full(3, H, H), full(3, H, H), full(3, 1, H),
            full(3, H, H), full(3, 1, H), full(3, H, H), full(3, H, H),
        ],
        out_specs=pl.BlockSpec((1, 1, H), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_chunks * chunk, H), jnp.bfloat16),
            pltpu.VMEM((n_chunks * chunk, H), jnp.bfloat16),
        ],
        # two full-cloud bf16 activation buffers (2 x 10.5 MB at P=20480)
        # + the pipelined [P, 3] input window exceed the 16 MB default
        # scoped-vmem budget; v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(
        pts,
        params["fc_pos_0"]["w"].astype(bf), params["fc_pos_0"]["b"][None],
        b0p["fc_0"]["w"].astype(bf), b0p["fc_0"]["b"][None],
        b0p["fc_1"]["w"].astype(bf), b0p["fc_1"]["b"][None],
        b0p["shortcut"]["w"].astype(bf),
        w0a, w0b, b0, w1, b1, wsa, wsb,
    )
    return out[:, 0]


def pointnet_forward_fused(params: dict, points: Array, *,
                           chunk: int = 2048) -> Array:
    """Drop-in for `pointnet_forward(params, points)` (no mask support —
    the fused path targets the fixed-20k production shape)."""
    pooled = _fused_pointnet_feature(points, params, chunk=chunk)
    return linear(params["fc_c"], relu(pooled))
