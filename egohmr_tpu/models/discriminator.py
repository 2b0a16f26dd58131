"""HMR pose/shape discriminator (stage-1 GAN; functional JAX).

Equivalent of reference models/prohmr/discriminator.py:4-97. The torch version
uses 1x1 Conv2d over per-joint 9-d rotmats — here those are plain matmuls over
the joint axis; the 23 per-joint output heads become one batched einsum.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.core import linear, linear_init, relu

Array = jax.Array
NUM_JOINTS = 23


def init_discriminator(key: Array) -> dict:
    ks = jax.random.split(key, 9)

    def xavier_lin(k, i, o):
        p = linear_init(k, i, o, w_init="xavier", gain=1.0)
        p["b"] = jnp.zeros((o,))
        return p

    return {
        "D_conv1": xavier_lin(ks[0], 9, 32),
        "D_conv2": xavier_lin(ks[1], 32, 32),
        # 23 independent Linear(32, 1) heads, stored stacked: w [23, 32], b [23]
        "pose_out": [xavier_lin(jax.random.fold_in(ks[2], i), 32, 1)
                     for i in range(NUM_JOINTS)],
        "betas_fc1": xavier_lin(ks[3], 10, 10),
        "betas_fc2": xavier_lin(ks[4], 10, 5),
        "betas_out": xavier_lin(ks[5], 5, 1),
        "D_alljoints_fc1": xavier_lin(ks[6], 32 * NUM_JOINTS, 1024),
        "D_alljoints_fc2": xavier_lin(ks[7], 1024, 1024),
        "D_alljoints_out": xavier_lin(ks[8], 1024, 1),
    }


def discriminator_forward(params: dict, poses: Array, betas: Array) -> Array:
    """poses: [B, 23, 3, 3] (or [B, 207]); betas: [B, 10] -> [B, 25] logits."""
    B = poses.shape[0]
    p = poses.reshape(B, NUM_JOINTS, 9)
    h = relu(linear(params["D_conv1"], p))    # [B, 23, 32]
    h = relu(linear(params["D_conv2"], h))    # [B, 23, 32]

    w = jnp.stack([params["pose_out"][i]["w"][:, 0] for i in range(NUM_JOINTS)])
    b = jnp.stack([params["pose_out"][i]["b"][0] for i in range(NUM_JOINTS)])
    poses_out = jnp.einsum("bjc,jc->bj", h, w) + b  # [B, 23]

    bh = relu(linear(params["betas_fc1"], betas))
    bh = relu(linear(params["betas_fc2"], bh))
    betas_out = linear(params["betas_out"], bh)  # [B, 1]

    # torch flattens the conv output [B, 32, 23, 1] channel-major
    # (reference discriminator.py:89) — match that layout
    flat = jnp.swapaxes(h, 1, 2).reshape(B, -1)
    ah = relu(linear(params["D_alljoints_fc1"], flat))
    ah = relu(linear(params["D_alljoints_fc2"], ah))
    all_out = linear(params["D_alljoints_out"], ah)  # [B, 1]

    return jnp.concatenate([poses_out, betas_out, all_out], axis=1)
