"""ResnetPointnet scene encoder (functional JAX).

Equivalent of reference models/respointnet.py:6-97: PointNet with
fully-connected ResNet blocks interleaved with global-max-pool context
concatenation. All ops are [B, N, C] matmuls + max reductions — ideal MXU/VPU
shapes for the 20k-point scene clouds.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .core import linear, linear_init, relu

Array = jax.Array


def _resnet_block_fc_init(key: Array, size_in: int, size_out: int, size_h: int) -> dict:
    k0, k1, ks = jax.random.split(key, 3)
    p = {
        "fc_0": linear_init(k0, size_in, size_h),
        "fc_1": {"w": jnp.zeros((size_h, size_out)),  # reference zero-inits fc_1.weight
                 "b": linear_init(k1, size_h, size_out)["b"]},
    }
    if size_in != size_out:
        p["shortcut"] = linear_init(ks, size_in, size_out, bias=False)
    return p


def _resnet_block_fc(p: dict, x: Array) -> Array:
    net = linear(p["fc_0"], relu(x))
    dx = linear(p["fc_1"], relu(net))
    xs = linear(p["shortcut"], x) if "shortcut" in p else x
    return xs + dx


def _resnet_block_fc_split(p: dict, x: Array, pooled: Array) -> Array:
    """Block applied to concat([x, broadcast(pooled)], -1) WITHOUT building
    the concatenated [B, N, 2H] tensor: every first-layer matmul splits as
    cat(a,b) @ W == a @ W[:H] + b @ W[H:]. Exact same numerics, half the HBM
    traffic on the 20k-point axis (the per-point half of the concat is the
    broadcast of a [B, 1, H] row)."""
    h = x.shape[-1]
    w0 = p["fc_0"]["w"]
    net = (relu(x) @ w0[:h] + relu(pooled) @ w0[h:]) + p["fc_0"]["b"]
    dx = linear(p["fc_1"], relu(net))
    ws = p["shortcut"]["w"]
    xs = x @ ws[:h] + pooled @ ws[h:]
    return xs + dx


def init_pointnet(key: Array, out_dim: int = 512, hidden_dim: int = 256) -> dict:
    ks = jax.random.split(key, 6)
    return {
        "fc_pos_0": linear_init(ks[0], 3, 2 * hidden_dim),
        "block_0": _resnet_block_fc_init(ks[1], 2 * hidden_dim, hidden_dim, hidden_dim),
        "block_1": _resnet_block_fc_init(ks[2], 2 * hidden_dim, hidden_dim, hidden_dim),
        "block_2": _resnet_block_fc_init(ks[3], 2 * hidden_dim, hidden_dim, hidden_dim),
        "block_3": _resnet_block_fc_init(ks[4], 2 * hidden_dim, hidden_dim, hidden_dim),
        "fc_c": linear_init(ks[5], hidden_dim, out_dim),
    }


def pointnet_forward(
    params: dict, points: Array, mask: Optional[Array] = None
) -> Array:
    """points: [B, N, 3] -> [B, out_dim].

    `mask` ([B, N] bool, optional) excludes padded points from the max-pools —
    a TPU-native extension: the reference always feeds exactly 20000 points,
    we allow static-shape padding instead of dynamic point counts.
    """
    neg = jnp.asarray(-1e30, points.dtype)

    def pool(net):
        if mask is not None:
            net = jnp.where(mask[..., None], net, neg)
        return jnp.max(net, axis=1, keepdims=True)

    net = linear(params["fc_pos_0"], points)
    net = _resnet_block_fc(params["block_0"], net)
    net = _resnet_block_fc_split(params["block_1"], net, pool(net))
    net = _resnet_block_fc_split(params["block_2"], net, pool(net))
    net = _resnet_block_fc_split(params["block_3"], net, pool(net))
    net = pool(net)[:, 0]  # [B, hidden]
    return linear(params["fc_c"], relu(net))


def pointnet_forward_point_sharded(
    params: dict, points: Array, *, axis_name: str
) -> Array:
    """PointNet with the POINT axis sharded across mesh devices.

    Sequence parallelism for very large scene clouds (the one long axis of
    this workload; SURVEY.md §5): each device encodes its point shard and the
    global-max-pools become `jax.lax.pmax` over `axis_name`, riding ICI.
    Call inside shard_map with points split on axis 1. Numerically identical
    to `pointnet_forward` on the gathered cloud (max is associative).
    """
    def pool(net):
        local = jnp.max(net, axis=1, keepdims=True)
        return jax.lax.pmax(local, axis_name)

    net = linear(params["fc_pos_0"], points)
    net = _resnet_block_fc(params["block_0"], net)
    net = _resnet_block_fc_split(params["block_1"], net, pool(net))
    net = _resnet_block_fc_split(params["block_2"], net, pool(net))
    net = _resnet_block_fc_split(params["block_3"], net, pool(net))
    net = pool(net)[:, 0]  # [B, hidden]
    return linear(params["fc_c"], relu(net))
