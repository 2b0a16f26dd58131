"""Modulated graph convolutional denoiser (functional JAX).

Equivalent of reference models/egohmr/modulated_gcn/{modulated_gcn.py:60-116,
modulated_gcn_conv.py:10-53}. The 24-node joint graph is tiny, so each layer
is two [B*24, in]x[in, out] matmuls (MXU) plus 24x24 adjacency mixes (VPU);
BatchNorm1d statistics reduce over (batch, joints) exactly like the torch
`transpose->BatchNorm1d->transpose` dance.

The optional embedded-gaussian non-local block (`gcn_nonlocal_layer`,
reference modulated_gcn.py:96-110 + nets/non_local_embedded_gaussian.py,
default off) is ported: its 1x1 Conv2d maps over a [bs, C, 1, 24] layout are
per-node linears here, and its 24x24 softmax attention is two tiny batched
matmuls. The truly dead node-grouping branch (modulated_gcn.py:69-87,
commented out upstream) is not.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .core import batchnorm, bn_init, linear, linear_init, relu

Array = jax.Array


def _xavier(key: Array, shape, gain: float) -> Array:
    fan_in, fan_out = shape[-2], shape[-1]
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def modulated_gconv_init(
    key: Array, in_dim: int, out_dim: int, n_nodes: int = 24
) -> dict:
    kw, km, kb = jax.random.split(key, 3)
    bound = 1.0 / math.sqrt(out_dim)
    return {
        "W": _xavier(kw, (2, in_dim, out_dim), gain=1.414),
        "M": _xavier(km, (n_nodes, out_dim), gain=1.414),
        # explicit dtype: a python-float fill makes the leaf weak-typed,
        # which flips to strong after one optimizer step and forces TWO full
        # retraces of the jitted train step (20-min remote compiles here)
        "adj2": jnp.full((n_nodes, n_nodes), 1e-6, dtype=jnp.float32),
        "bias": jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound),
    }


def modulated_gconv(p: dict, adj: Array, x: Array) -> Array:
    """x: [B, J, in] -> [B, J, out] (reference modulated_gcn_conv.py:38-50)."""
    return modulated_gconv_mix(p, adj, x @ p["W"][0], x @ p["W"][1])


def modulated_gconv_mix(p: dict, adj: Array, h0: Array, h1: Array) -> Array:
    """Modulation + adjacency mix given precomputed h0 = x@W[0], h1 = x@W[1].

    Split out so samplers can HOIST the conditioning half of the input
    layer's matmul out of the denoising loop: x = [cond | x_t-feats | t-emb]
    is a feature concat, so x@W = cond@W_c + xt@W_x + temb@W_t and the cond
    term is loop-invariant (models/egohmr.py make_denoise_fn)."""
    # symmetrize in f32 (adj is a f32 constant; adj2 is a learned 24x24),
    # then drop to the activation dtype: without the cast, `adj + adj2`
    # promotes to f32 and the einsums below drag every layer's activations
    # back to f32 on the bf16 path
    a = adj.astype(jnp.float32) + p["adj2"].astype(jnp.float32)
    a = ((a.T + a) / 2).astype(h0.dtype)
    eye = jnp.eye(a.shape[0], dtype=h0.dtype)
    m = p["M"]
    out = jnp.einsum("jk,bkd->bjd", a * eye, m * h0) + jnp.einsum(
        "jk,bkd->bjd", a * (1 - eye), m * h1
    )
    return out + p["bias"]


def _graph_conv_init(key: Array, in_dim: int, out_dim: int) -> dict:
    kg, = jax.random.split(key, 1)
    return {"gconv": modulated_gconv_init(kg, in_dim, out_dim), "bn": bn_init(out_dim)}


def _graph_conv(
    p: dict, adj: Array, x: Array, *, train: bool, axis_name: Optional[str]
) -> Tuple[Array, dict]:
    """gconv -> BN(channels, stats over batch+joints) -> ReLU
    (reference modulated_gcn.py:21-28; dropout p=0 in all configs)."""
    out = modulated_gconv(p["gconv"], adj, x)
    out, new_bn = batchnorm(
        p["bn"], out, train=train, reduce_axes=(0, 1), axis_name=axis_name
    )
    return relu(out), {"gconv": p["gconv"], "bn": new_bn}


def nonlocal_block_init(key: Array, channels: int) -> dict:
    """Embedded-gaussian non-local block over the 24-node axis
    (reference nets/non_local_embedded_gaussian.py:7-90 with the
    modulated_gcn.py:96-97 configuration: sub_sample=False, bn_layer=True).

    The torch module's 1x1 Conv2d layers on [bs, C, 1, 24] are plain
    per-node linears; conv-default init == torch.nn.Linear default. The
    output BN is zero-initialized (scale=bias=0) so the block starts as
    the identity, exactly like the reference's constant_(W[1].weight, 0).
    """
    inter = max(channels // 2, 1)
    kg, kt, kp, kw = jax.random.split(key, 4)
    bn = bn_init(channels)
    bn["scale"] = jnp.zeros_like(bn["scale"])
    return {
        "g": linear_init(kg, channels, inter),
        "theta": linear_init(kt, channels, inter),
        "phi": linear_init(kp, channels, inter),
        "w": linear_init(kw, inter, channels),
        "bn": bn,
    }


def nonlocal_block(
    p: dict, x: Array, *, train: bool, axis_name: Optional[str]
) -> Tuple[Array, dict]:
    """x: [B, J, C] -> [B, J, C] (reference forward :122-144): softmax
    attention f = softmax(theta x (phi x)^T) over nodes, z = BN(W(f gx)) + x.
    """
    g_x = linear(p["g"], x)                       # [B, J, inter]
    theta_x = linear(p["theta"], x)
    phi_x = linear(p["phi"], x)
    f = jnp.einsum("bjc,bkc->bjk", theta_x, phi_x)
    # softmax in f32 regardless of activation dtype (bf16 exp/renorm over the
    # 24-node axis is needlessly lossy and the [B,24,24] tensor is tiny)
    f = jax.nn.softmax(f.astype(jnp.float32), axis=-1).astype(x.dtype)
    y = jnp.einsum("bjk,bkc->bjc", f, g_x)        # [B, J, inter]
    w_y = linear(p["w"], y)                       # [B, J, C]
    # BatchNorm2d on [bs, C, 1, 24] == stats over (batch, nodes) per channel
    w_y, new_bn = batchnorm(
        p["bn"], w_y, train=train, reduce_axes=(0, 1), axis_name=axis_name
    )
    new_p = dict(p)
    new_p["bn"] = new_bn
    return x + w_y, new_p


def init_modulated_gcn(
    key: Array,
    in_dim: int,
    hid_dim: int = 1024,
    out_dim: int = 6,
    num_layers: int = 4,
    n_nodes: int = 24,
    nonlocal_layer: bool = False,
) -> dict:
    keys = jax.random.split(key, 2 * num_layers + 3)
    params = {
        "gconv_input": _graph_conv_init(keys[0], in_dim, hid_dim),
        "gconv_layers": [
            {
                "gconv1": _graph_conv_init(keys[1 + 2 * i], hid_dim, hid_dim),
                "gconv2": _graph_conv_init(keys[2 + 2 * i], hid_dim, hid_dim),
            }
            for i in range(num_layers)
        ],
        "gconv_output": modulated_gconv_init(keys[-1], hid_dim, out_dim, n_nodes),
    }
    if nonlocal_layer:
        params["non_local"] = nonlocal_block_init(keys[-2], hid_dim)
    return params


def modulated_gcn_forward(
    params: dict,
    adj: Array,
    x: Optional[Array],
    *,
    train: bool = False,
    axis_name: Optional[str] = None,
    input_h: Optional[Tuple[Array, Array]] = None,
) -> Tuple[Array, dict]:
    """x: [B, 24, in_dim] -> ([B, 24, out_dim], new_params).

    `input_h`: optional precomputed (h0, h1) = (x@W[0], x@W[1]) of the input
    layer — used by the sampler to hoist the loop-invariant conditioning
    projection out of the denoising scan; `x` is ignored when given.
    """
    new_params = dict(params)
    if input_h is not None:
        gi = params["gconv_input"]
        out = modulated_gconv_mix(gi["gconv"], adj, *input_h)
        out, new_bn = batchnorm(
            gi["bn"], out, train=train, reduce_axes=(0, 1), axis_name=axis_name
        )
        out = relu(out)
        new_params["gconv_input"] = {"gconv": gi["gconv"], "bn": new_bn}
    else:
        out, new_params["gconv_input"] = _graph_conv(
            params["gconv_input"], adj, x, train=train, axis_name=axis_name
        )
    new_layers = []
    for blk in params["gconv_layers"]:
        residual = out
        out, n1 = _graph_conv(blk["gconv1"], adj, out, train=train, axis_name=axis_name)
        out, n2 = _graph_conv(blk["gconv2"], adj, out, train=train, axis_name=axis_name)
        out = residual + out
        new_layers.append({"gconv1": n1, "gconv2": n2})
    new_params["gconv_layers"] = new_layers
    if "non_local" in params:  # gcn_nonlocal_layer option (ref :105-110)
        out, new_params["non_local"] = nonlocal_block(
            params["non_local"], out, train=train, axis_name=axis_name
        )
    out = modulated_gconv(params["gconv_output"], adj, out)
    return out, new_params
