"""Conditional Glow normalizing flow (stage 1) in functional JAX.

Reimplementation of the `nflows.flows.ConditionalGlow` the reference uses for
its ProHMR-scene head (reference models/prohmr/smpl_flow.py:24-26; config
configs/prohmr.yaml:45-50: dim=144, hidden=1024, num_layers=4, depth=2).
Each flow step is [ActNorm -> LU-decomposed invertible linear ("1x1 conv")
-> affine coupling with a context-conditioned residual net]; the base
distribution is a standard normal.

Conventions (match nflows so converted torch checkpoints reproduce):
  * `forward` maps data -> noise (used by log_prob); `inverse` maps
    noise -> data (used by sampling).
  * coupling mask starts as ones with even indices = -1 (identity half) and
    flips sign every step.
  * coupling scale = sigmoid(raw + 2) + 1e-3; shift is the first half of the
    transform-net output.
  * ActNorm's data-dependent init is an explicit functional pass
    (`initialize_actnorm`) instead of the reference's mutable `initialized`
    buffer (reference models/prohmr/prohmr_scene.py:71,82-97).

Everything here is dense matmul + elementwise — jit/vmap/grad-safe, scan-free
(the 4-step chain is unrolled; each step has distinct params).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.core import linear, linear_init, relu

Array = jax.Array


@dataclass(frozen=True)
class GlowConfig:
    features: int = 144
    hidden_features: int = 1024
    num_layers: int = 4          # flow steps
    num_blocks_per_layer: int = 2  # residual blocks inside each coupling net
    context_features: int = 2566   # 2048 img + 512 scene + 6 cam (stage-1)


# ------------------------------------------------------------------ actnorm
def init_actnorm(features: int) -> dict:
    return {"log_scale": jnp.zeros((features,)), "shift": jnp.zeros((features,))}


def actnorm_forward(p: dict, x: Array) -> Tuple[Array, Array]:
    scale = jnp.exp(p["log_scale"])
    y = scale * x + p["shift"]
    logdet = jnp.full((x.shape[0],), jnp.sum(p["log_scale"]))
    return y, logdet


def actnorm_inverse(p: dict, y: Array) -> Tuple[Array, Array]:
    scale = jnp.exp(-p["log_scale"])
    x = (y - p["shift"]) * scale
    logdet = jnp.full((y.shape[0],), -jnp.sum(p["log_scale"]))
    return x, logdet


def actnorm_init_from_data(x: Array) -> dict:
    """Data-dependent init (nflows ActNorm._initialize): scale = 1/std,
    shift = -mean(x/std)."""
    std = jnp.std(x, axis=0, ddof=1) + 1e-10
    mu = jnp.mean(x / std, axis=0)
    return {"log_scale": -jnp.log(std), "shift": -mu}


# ---------------------------------------------------------------- lu linear
def init_lu_linear(features: int, eps: float = 1e-3) -> dict:
    """Identity-initialized LU linear (nflows LULinear(identity_init=True))."""
    n_tri = features * (features - 1) // 2
    # softplus(unconstrained) + eps == 1  =>  unconstrained = log(e^{1-eps}-1)
    diag0 = math.log(math.exp(1.0 - eps) - 1.0)
    return {
        "lower_entries": jnp.zeros((n_tri,)),
        "upper_entries": jnp.zeros((n_tri,)),
        # explicit dtype: weak-typed param leaves force train-step retraces
        "unconstrained_upper_diag": jnp.full((features,), diag0,
                                             dtype=jnp.float32),
        "bias": jnp.zeros((features,)),
    }


def _lu_matrices(p: dict, features: int, eps: float = 1e-3):
    tril_i = jnp.tril_indices(features, -1)
    triu_i = jnp.triu_indices(features, 1)
    lower = jnp.eye(features).at[tril_i].set(p["lower_entries"])
    diag = jax.nn.softplus(p["unconstrained_upper_diag"]) + eps
    upper = jnp.diag(diag).at[triu_i].set(p["upper_entries"])
    return lower, upper, diag


def lu_linear_forward(p: dict, x: Array) -> Tuple[Array, Array]:
    n = x.shape[-1]
    lower, upper, diag = _lu_matrices(p, n)
    w = lower @ upper
    y = x @ w.T + p["bias"]
    logdet = jnp.full((x.shape[0],), jnp.sum(jnp.log(diag)))
    return y, logdet


def lu_linear_inverse(p: dict, y: Array) -> Tuple[Array, Array]:
    n = y.shape[-1]
    lower, upper, diag = _lu_matrices(p, n)
    rhs = (y - p["bias"]).T  # [n, B]
    sol = jax.scipy.linalg.solve_triangular(lower, rhs, lower=True)
    x = jax.scipy.linalg.solve_triangular(upper, sol, lower=False).T
    logdet = jnp.full((y.shape[0],), -jnp.sum(jnp.log(diag)))
    return x, logdet


# ------------------------------------------------------------- residual net
def init_residual_net(
    key: Array, in_features: int, out_features: int, hidden: int,
    context_features: Optional[int], num_blocks: int,
) -> dict:
    ks = jax.random.split(key, 2 + 3 * num_blocks)
    init_in = in_features + (context_features or 0)
    params = {
        "initial_layer": linear_init(ks[0], init_in, hidden),
        "final_layer": linear_init(ks[1], hidden, out_features),
        "blocks": [],
    }
    for i in range(num_blocks):
        k0, k1, kc = ks[2 + 3 * i: 5 + 3 * i]
        blk = {
            "l0": linear_init(k0, hidden, hidden),
            # nflows zero_initialization: U(-1e-3, 1e-3) on the last layer
            "l1": {
                "w": jax.random.uniform(k1, (hidden, hidden), minval=-1e-3, maxval=1e-3),
                "b": jax.random.uniform(jax.random.fold_in(k1, 1), (hidden,),
                                        minval=-1e-3, maxval=1e-3),
            },
        }
        if context_features:
            blk["context_layer"] = linear_init(kc, context_features, hidden)
        params["blocks"].append(blk)
    return params


def residual_net(p: dict, x: Array, context: Optional[Array]) -> Array:
    if context is not None:
        h = linear(p["initial_layer"], jnp.concatenate([x, context], axis=-1))
    else:
        h = linear(p["initial_layer"], x)
    for blk in p["blocks"]:
        t = relu(h)
        t = linear(blk["l0"], t)
        t = relu(t)
        t = linear(blk["l1"], t)
        if context is not None:
            # nflows ResidualBlock: GLU(cat(t, ctx_proj)) (resnet.py, F.glu)
            gate = linear(blk["context_layer"], context)
            t = t * jax.nn.sigmoid(gate)
        h = h + t
    return linear(p["final_layer"], h)


# ---------------------------------------------------------------- coupling
def _coupling_split(features: int, step: int) -> Tuple[np.ndarray, np.ndarray]:
    """nflows mask: ones, even indices -1, sign flipped each step.
    mask <= 0 -> identity features; > 0 -> transformed."""
    mask = np.ones(features)
    mask[::2] = -1
    if step % 2 == 1:
        mask = -mask
    idx = np.arange(features)
    return idx[mask <= 0], idx[mask > 0]


def init_coupling(key: Array, cfg: GlowConfig, step: int) -> dict:
    id_idx, tr_idx = _coupling_split(cfg.features, step)
    return {
        "net": init_residual_net(
            key, len(id_idx), 2 * len(tr_idx), cfg.hidden_features,
            cfg.context_features, cfg.num_blocks_per_layer,
        )
    }


def _scale_and_shift(raw: Array, n_transform: int) -> Tuple[Array, Array]:
    shift = raw[:, :n_transform]
    scale = jax.nn.sigmoid(raw[:, n_transform:] + 2.0) + 1e-3
    return scale, shift


def coupling_forward(p: dict, cfg: GlowConfig, step: int, x: Array,
                     context: Optional[Array]) -> Tuple[Array, Array]:
    id_idx, tr_idx = _coupling_split(cfg.features, step)
    x_id = x[:, id_idx]
    x_tr = x[:, tr_idx]
    raw = residual_net(p["net"], x_id, context)
    scale, shift = _scale_and_shift(raw, len(tr_idx))
    y_tr = x_tr * scale + shift
    y = jnp.zeros_like(x).at[:, id_idx].set(x_id).at[:, tr_idx].set(y_tr)
    return y, jnp.sum(jnp.log(scale), axis=-1)


def coupling_inverse(p: dict, cfg: GlowConfig, step: int, y: Array,
                     context: Optional[Array]) -> Tuple[Array, Array]:
    id_idx, tr_idx = _coupling_split(cfg.features, step)
    y_id = y[:, id_idx]
    y_tr = y[:, tr_idx]
    raw = residual_net(p["net"], y_id, context)
    scale, shift = _scale_and_shift(raw, len(tr_idx))
    x_tr = (y_tr - shift) / scale
    x = jnp.zeros_like(y).at[:, id_idx].set(y_id).at[:, tr_idx].set(x_tr)
    return x, -jnp.sum(jnp.log(scale), axis=-1)


# -------------------------------------------------------------------- glow
def init_glow(key: Array, cfg: GlowConfig) -> dict:
    steps = []
    for i in range(cfg.num_layers):
        k = jax.random.fold_in(key, i)
        steps.append({
            "actnorm": init_actnorm(cfg.features),
            "linear": init_lu_linear(cfg.features),
            "coupling": init_coupling(k, cfg, i),
        })
    return {"steps": steps}


def glow_forward(params: dict, cfg: GlowConfig, x: Array,
                 context: Optional[Array]) -> Tuple[Array, Array]:
    """data -> noise; returns (z, total logabsdet)."""
    logdet = jnp.zeros((x.shape[0],))
    for i, step in enumerate(params["steps"]):
        x, ld = actnorm_forward(step["actnorm"], x)
        logdet += ld
        x, ld = lu_linear_forward(step["linear"], x)
        logdet += ld
        x, ld = coupling_forward(step["coupling"], cfg, i, x, context)
        logdet += ld
    return x, logdet


def glow_inverse(params: dict, cfg: GlowConfig, z: Array,
                 context: Optional[Array]) -> Tuple[Array, Array]:
    """noise -> data; returns (x, total logabsdet of the inverse)."""
    logdet = jnp.zeros((z.shape[0],))
    for i in reversed(range(len(params["steps"]))):
        step = params["steps"][i]
        z, ld = coupling_inverse(step["coupling"], cfg, i, z, context)
        logdet += ld
        z, ld = lu_linear_inverse(step["linear"], z)
        logdet += ld
        z, ld = actnorm_inverse(step["actnorm"], z)
        logdet += ld
    return z, logdet


def _std_normal_logprob(z: Array) -> Array:
    return -0.5 * jnp.sum(z * z, axis=-1) - 0.5 * z.shape[-1] * math.log(2 * math.pi)


def glow_log_prob(params: dict, cfg: GlowConfig, x: Array,
                  context: Optional[Array]) -> Tuple[Array, Array]:
    """log p(x | context); returns (log_prob [B], z [B, d])
    (nflows Flow.log_prob semantics used at smpl_flow.py:47)."""
    z, logdet = glow_forward(params, cfg, x, context)
    return _std_normal_logprob(z) + logdet, z


def glow_sample_and_log_prob(
    params: dict, cfg: GlowConfig, context: Array, *,
    num_samples: Optional[int] = None, noise: Optional[Array] = None,
    key: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """Sample x ~ p(x | context); returns (x [B,S,d], log_prob [B,S], z).

    Matches the fork's `sample_and_log_prob(num_samples, context, noise=z)`
    used at reference smpl_flow.py:75-81.
    """
    B = context.shape[0]
    d = cfg.features
    if noise is None:
        assert key is not None and num_samples is not None
        noise = jax.random.normal(key, (B, num_samples, d))
    S = noise.shape[1]
    ctx_rep = jnp.repeat(context, S, axis=0)
    z_flat = noise.reshape(B * S, d)
    x_flat, logdet_inv = glow_inverse(params, cfg, z_flat, ctx_rep)
    log_prob = _std_normal_logprob(z_flat) - logdet_inv
    return (x_flat.reshape(B, S, d), log_prob.reshape(B, S), noise)


def initialize_actnorms(params: dict, cfg: GlowConfig, x: Array,
                        context: Optional[Array]) -> dict:
    """Functional ActNorm data-dependent init: walk the chain on a data batch,
    setting each ActNorm from its input activations (replaces the reference's
    first-batch mutable init; prohmr_scene.py:82-97)."""
    new_steps = []
    h = x
    for i, step in enumerate(params["steps"]):
        an = actnorm_init_from_data(h)
        h, _ = actnorm_forward(an, h)
        h, _ = lu_linear_forward(step["linear"], h)
        h, _ = coupling_forward(step["coupling"], cfg, i, h, context)
        new_steps.append({"actnorm": an, "linear": step["linear"],
                          "coupling": step["coupling"]})
    return {"steps": new_steps}
