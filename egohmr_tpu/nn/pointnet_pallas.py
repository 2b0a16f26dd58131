"""Pallas TPU kernel: fused ResnetPointnet stage.

The scene encoder dominates stage-2 conditioning (~30 ms of a 75 ms batch-64
DDIM-5 step) and is HBM-bound: XLA materializes relu(x), the hidden
activation, the residual and the output per stage — ~5 [B, 20000, 256]
round-trips. This kernel runs one whole pooled-context stage per point tile
entirely in VMEM:

    net = relu(x) @ W0a + r_pool          (r_pool = relu(pool) @ W0b + b0,
    dx  = relu(net) @ W1 + b1              precomputed per batch row in XLA —
    out = x @ Wsa + xs_pool + dx           it's [B, H], negligible)
    max_acc = max(max_acc, out)            (masked beyond the true P)

reading x once and writing out once, with the stage's global max-pool fused
as a revisited [1, H] accumulator block. Numerics match
`nn.pointnet._resnet_block_fc_split` + max-pool exactly (same matmul order).

STATUS — measured on the v5e at the production shape (B=64, P=20000, H=256):
XLA p50 58.7 ms vs this kernel 65.8 ms. After the concat-split rewrite, XLA's
own fusion pipeline already sits near the bandwidth roof and double-buffers
tiles across the grid, which this single-buffered kernel does not. Kept as a
correct, tested EXPERIMENTAL path (and a starting point for a double-buffered
revision); `pointnet_forward` (XLA) remains the production route.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .core import linear, relu

Array = jax.Array


def _stage_kernel(n_tiles, p_valid, block_p,
                  x_ref, rpool_ref, xspool_ref, w0a_ref, w1_ref, b1_ref,
                  wsa_ref, out_ref, max_ref):
    i = pl.program_id(1)
    x = x_ref[0]                      # [bp, H]
    net = jax.lax.dot_general(
        jnp.maximum(x, 0.0), w0a_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + rpool_ref[0]
    dx = jax.lax.dot_general(
        jnp.maximum(net, 0.0), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    xs = jax.lax.dot_general(
        x, wsa_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + xspool_ref[0]
    out = xs + dx
    out_ref[0] = out

    # fused max-pool over valid rows (padded tail masked to -inf)
    row = (i * block_p
           + jax.lax.broadcasted_iota(jnp.int32, out.shape, 0))
    masked = jnp.where(row < p_valid, out, -jnp.inf)
    tile_max = jnp.max(masked, axis=0, keepdims=True)  # [1, H]

    @pl.when(i == 0)
    def _():
        max_ref[0] = tile_max

    @pl.when(i > 0)
    def _():
        max_ref[0] = jnp.maximum(max_ref[0], tile_max)


@functools.partial(jax.jit, static_argnames=("block_p",))
def fused_stage(
    x: Array,        # [B, P, H]
    pooled: Array,   # [B, 1, H] (previous stage's max)
    p: dict,         # block params: fc_0 (w [2H,H], b), fc_1, shortcut (w [2H,H])
    *,
    block_p: int = 2048,
) -> Tuple[Array, Array]:
    """One pooled-context ResnetBlockFC stage + its max-pool.

    Returns (out [B, P, H], out_max [B, 1, H]).
    """
    B, P, H = x.shape
    n_tiles = -(-P // block_p)
    pad = n_tiles * block_p - P
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

    w0 = p["fc_0"]["w"]
    ws = p["shortcut"]["w"]
    # pooled-context halves of the split matmuls, [B, 1, H] — tiny, stays XLA
    r_pool = relu(pooled) @ w0[H:] + p["fc_0"]["b"]
    xs_pool = pooled @ ws[H:]

    kernel = functools.partial(_stage_kernel, n_tiles, P, block_p)
    out, out_max = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, block_p, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_p, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_tiles * block_p, H), x.dtype),
            jax.ShapeDtypeStruct((B, 1, H), x.dtype),
        ),
    )(xp, r_pool, xs_pool, w0[:H], p["fc_1"]["w"],
      p["fc_1"]["b"][None], ws[:H])
    return out[:, :P], out_max


def pointnet_forward_fused(params: dict, points: Array, *,
                           block_p: int = 2048) -> Array:
    """ResnetPointnet forward with Pallas-fused pooled-context stages.

    Drop-in for `pointnet_forward(params, points)` (no mask support — the
    fused path is for the fixed-20k production shape). Stage 0 (3->2H linear
    + first block) stays in XLA; stages 1-3 run fused.
    """
    from .pointnet import _resnet_block_fc

    net = linear(params["fc_pos_0"], points)
    net = _resnet_block_fc(params["block_0"], net)
    pooled = jnp.max(net, axis=1, keepdims=True)
    net, pooled = fused_stage(net, pooled, params["block_1"], block_p=block_p)
    net, pooled = fused_stage(net, pooled, params["block_2"], block_p=block_p)
    _, pooled = fused_stage(net, pooled, params["block_3"], block_p=block_p)
    return linear(params["fc_c"], relu(pooled[:, 0]))
