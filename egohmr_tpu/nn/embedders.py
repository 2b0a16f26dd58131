"""Small conditioning heads: timestep embedder, pose/transl encoders, beta heads.

Equivalents of reference models/egohmr/egohmr.py:609-691 (PositionalEncoding,
TimestepEmbedder, InputProcess, FCHeadBeta, TranslEnc) and
models/prohmr/fc_head.py:7-52 (FCHead).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import linear, linear_init, relu, silu

Array = jax.Array


def sinusoidal_table(d_model: int, max_len: int = 5000) -> np.ndarray:
    """Fixed sin/cos table [max_len, d_model]
    (reference egohmr.py:609-621)."""
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def init_timestep_embedder(key: Array, latent_dim: int = 512,
                           max_len: int = 5000) -> dict:
    k0, k1 = jax.random.split(key)
    return {
        "pe": jnp.asarray(sinusoidal_table(latent_dim, max_len)),
        "l0": linear_init(k0, latent_dim, latent_dim),
        "l1": linear_init(k1, latent_dim, latent_dim),
    }


def timestep_embed(params: dict, timesteps: Array) -> Array:
    """timesteps: int [B] -> [B, latent_dim]
    (reference egohmr.py:629-643: MLP(SiLU) over PE[t])."""
    x = params["pe"][timesteps]
    return linear(params["l1"], silu(linear(params["l0"], x)))


def init_input_process(key: Array, in_dim: int = 6, latent_dim: int = 512) -> dict:
    return {"poseEmbedding": linear_init(key, in_dim, latent_dim)}


def input_process(params: dict, x: Array) -> Array:
    """x_t rot6d [B, 24, 6] -> [B, 24, 512] (reference egohmr.py:646-655)."""
    return linear(params["poseEmbedding"], x)


def init_transl_enc(key: Array, in_dim: int = 3, out_dim: int = 128) -> dict:
    k0, k1 = jax.random.split(key)
    return {"l0": linear_init(k0, in_dim, 64), "l1": linear_init(k1, 64, out_dim)}


def transl_enc(params: dict, x: Array) -> Array:
    """[B, 3] -> [B, 128] (reference egohmr.py:682-691)."""
    return linear(params["l1"], relu(linear(params["l0"], x)))


def init_fc_head_beta(key: Array, in_dim: int, init_betas: Array) -> dict:
    """Beta regression head (reference egohmr.py:658-679). `init_betas` comes
    from smpl_mean_params.npz['shape'] [10]."""
    k0, k1 = jax.random.split(key)
    # reference re-initializes only the weight (xavier gain=0.02); the bias
    # keeps the torch default U(-1/sqrt(1024), 1/sqrt(1024))
    p1 = linear_init(k1, 1024, 10, w_init="xavier", gain=0.02)
    p1["b"] = linear_init(jax.random.fold_in(k1, 1), 1024, 10)["b"]
    return {
        "l0": linear_init(k0, in_dim, 1024),
        "l1": p1,
        "init_betas": jnp.asarray(init_betas).reshape(1, 10),
    }


def fc_head_beta(params: dict, feats: Array) -> Array:
    """[B, ctx] -> betas [B, 10] (condition_on_pose=False path;
    reference egohmr.py:102,673-679)."""
    offset = linear(params["l1"], relu(linear(params["l0"], feats)))
    return offset + params["init_betas"]


def init_fc_head(key: Array, in_dim: int, init_betas: Array, init_cam: Array,
                 hidden: int = 1024) -> dict:
    """Stage-1 betas+camera head (reference models/prohmr/fc_head.py:7-31)."""
    k0, k1 = jax.random.split(key)
    p1 = linear_init(k1, hidden, 13, w_init="xavier", gain=0.02)
    p1["b"] = linear_init(jax.random.fold_in(k1, 1), hidden, 13)["b"]
    return {
        "l0": linear_init(k0, in_dim, hidden),
        "l1": p1,
        "init_betas": jnp.asarray(init_betas).reshape(1, 10),
        "init_cam": jnp.asarray(init_cam).reshape(1, 3),
    }


def fc_head(params: dict, feats: Array) -> Tuple[Array, Array]:
    """[B, ctx] -> (betas [B, 10], cam [B, 3])
    (reference fc_head.py:32-52; per-sample repeat happens at the caller)."""
    offset = linear(params["l1"], relu(linear(params["l0"], feats)))
    betas = offset[:, :10] + params["init_betas"]
    cam = offset[:, 10:] + params["init_cam"]
    return betas, cam
