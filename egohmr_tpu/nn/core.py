"""Minimal functional NN primitives.

Design: every module is (init_fn -> params pytree, apply_fn). Params are
plain nested dicts of jnp arrays so that
  * pjit/shard_map partitioning specs can be written per-leaf,
  * torch checkpoint conversion is a mechanical key mapping
    (egohmr_tpu/interop/torch_convert.py),
  * optax treats the whole model uniformly.

Weight layout conventions: Linear stores w as [in, out] (JAX matmul order;
torch stores [out, in] — converters transpose). Convs are NHWC / HWIO.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ----------------------------------------------------------------- linear
def linear_init(
    key: Array,
    in_dim: int,
    out_dim: int,
    *,
    bias: bool = True,
    w_init: str = "torch",
    gain: float = 1.0,
) -> dict:
    """Initialize a dense layer.

    w_init:
      'torch'  — U(-1/sqrt(in), 1/sqrt(in)) (torch.nn.Linear default)
      'xavier' — Xavier uniform with `gain`
      'zeros'
    """
    kw, kb = jax.random.split(key)
    if w_init == "torch":
        bound = 1.0 / math.sqrt(in_dim)
        w = jax.random.uniform(kw, (in_dim, out_dim), minval=-bound, maxval=bound)
    elif w_init == "xavier":
        bound = gain * math.sqrt(6.0 / (in_dim + out_dim))
        w = jax.random.uniform(kw, (in_dim, out_dim), minval=-bound, maxval=bound)
    elif w_init == "zeros":
        w = jnp.zeros((in_dim, out_dim))
    else:
        raise ValueError(w_init)
    params = {"w": w}
    if bias:
        bound = 1.0 / math.sqrt(in_dim)
        params["b"] = jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound)
    return params


def linear(params: dict, x: Array) -> Array:
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


# ------------------------------------------------------------- batch norm
def bn_init(dim: int) -> dict:
    """BatchNorm params+state in one dict (state keys prefixed to split out
    for optimizers via `is_bn_state`)."""
    return {
        "scale": jnp.ones((dim,)),
        "bias": jnp.zeros((dim,)),
        "mean": jnp.zeros((dim,)),
        "var": jnp.ones((dim,)),
    }


def batchnorm(
    params: dict,
    x: Array,
    *,
    train: bool,
    reduce_axes: Tuple[int, ...],
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> Tuple[Array, dict]:
    """BatchNorm over `reduce_axes` (channel axis = the remaining one).

    In train mode, batch statistics are optionally synchronized across the
    data-parallel mesh axis (`axis_name`) — cross-replica BN, an improvement
    over the reference's single-GPU BN. Returns (y, new_params_with_state).
    """
    if train:
        # batch statistics ALWAYS in f32: a bf16 mean2 - mean^2 is
        # catastrophically lossy (mixed-precision training path); no-op for
        # f32 activations, and XLA fuses the convert into the reduction
        xs = x.astype(jnp.float32) if x.dtype != jnp.float32 else x
        mean = jnp.mean(xs, axis=reduce_axes)
        mean2 = jnp.mean(jnp.square(xs), axis=reduce_axes)
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean2 = jax.lax.pmean(mean2, axis_name)
        var = mean2 - jnp.square(mean)
        n = 1
        for ax in reduce_axes:
            n *= x.shape[ax]
        if axis_name is not None:
            # cross-replica BN reduces over the global batch: the unbiased
            # correction must use the global count, not the shard-local one
            # (also makes the 1-way and N-way steps bitwise-comparable)
            n *= jax.lax.axis_size(axis_name)
        # torch tracks unbiased variance in running stats
        unbiased = var * (n / max(n - 1, 1))
        new_params = dict(params)
        new_params["mean"] = (1 - momentum) * params["mean"] + momentum * mean
        new_params["var"] = (1 - momentum) * params["var"] + momentum * unbiased
    else:
        mean, var = params["mean"], params["var"]
        new_params = params

    shape = [1] * x.ndim
    channel_axis = [a for a in range(x.ndim) if a not in reduce_axes]
    assert len(channel_axis) == 1
    shape[channel_axis[0]] = -1
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    if x.dtype != inv.dtype:
        # low-precision activations (train OR eval): fold BN into one
        # per-channel scale/shift CAST TO THE ACTIVATION DTYPE. Without
        # this, `x - mean` promotes bf16 activations back to f32 after
        # every BN, silently undoing the bandwidth savings of a bf16
        # backbone (measured: the +2% round-1 bf16 result was this
        # promotion). In train mode the folded stats are the f32 BATCH
        # stats computed above, so normalization accuracy is unchanged —
        # only the final per-element multiply-add runs in bf16.
        shift = params["bias"] - mean * inv
        y = x * inv.astype(x.dtype).reshape(shape) + shift.astype(x.dtype).reshape(shape)
        return y, new_params
    y = (x - mean.reshape(shape)) * inv.reshape(shape) + params["bias"].reshape(shape)
    return y, new_params



_BN_KEYS = frozenset(("scale", "bias", "mean", "var"))


def cast_params_bf16(params):
    """Cast weights/biases to bfloat16 for low-precision inference, KEEPING
    BatchNorm leaves float32: `batchnorm` (eval) folds f32 stats into a
    per-channel scale/shift cast to the activation dtype, so activations
    stay bf16 end-to-end while the BN arithmetic stays accurate. (A bf16
    `x - mean_f32` would silently promote everything back to f32.)

    BN param dicts are detected STRUCTURALLY — a dict whose keys are exactly
    {scale, bias, mean, var} (the `bn_init` layout) — not by the parent key
    name, so a BN stored under any name keeps all four leaves f32."""
    def cast(node):
        if isinstance(node, dict):
            if frozenset(node) == _BN_KEYS:
                return dict(node)  # whole BN dict stays f32
            return {k: cast(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(cast(v) for v in node)
        if hasattr(node, "dtype") and node.dtype == jnp.float32:
            return node.astype(jnp.bfloat16)
        return node

    return cast(params)


def is_bn_state(path: Tuple[str, ...]) -> bool:
    """True for BN running-stat leaves (excluded from optimization)."""
    return path[-1] in ("mean", "var")


# ------------------------------------------------------------------ conv
def conv_init(key: Array, kh: int, kw: int, cin: int, cout: int) -> dict:
    """He-normal conv kernel (reference models/resnet.py:114-117 uses
    normal(0, sqrt(2/n)) with n = kh*kw*cout)."""
    n = kh * kw * cout
    w = jax.random.normal(key, (kh, kw, cin, cout)) * math.sqrt(2.0 / n)
    return {"w": w}


def conv2d(params: dict, x: Array, *, stride: int = 1, padding: int = 0) -> Array:
    """NHWC conv, HWIO kernel, no bias (ResNet convs are bias-free)."""
    return jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def max_pool(x: Array, window: int, stride: int, padding: int) -> Array:
    """Max pool with -inf padding (torch semantics)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def relu(x: Array) -> Array:
    return jnp.maximum(x, 0)


def silu(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)
