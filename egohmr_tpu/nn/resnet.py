"""ResNet backbone (bottleneck family) in functional JAX, NHWC.

Equivalent of the reference backbone (reference models/resnet.py:99-163):
headless torchvision ResNet whose forward returns the global average of the
stage-4 feature map, [B, 2048] for ResNet50. NHWC layout + bias-free convs
keep everything on the MXU; BN supports cross-replica sync in training.

Param tree key names deliberately mirror the torch module names
(conv1/bn1/layer{1..4}/<idx>/{conv1,bn1,conv2,bn2,conv3,bn3,downsample})
so checkpoint conversion is mechanical (interop/torch_convert.py).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .core import batchnorm, bn_init, conv2d, conv_init, max_pool, relu

Array = jax.Array

RESNET_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
BOTTLENECK_DEPTHS = {50, 101, 152}


def init_resnet(key: Array, num_layers: int = 50) -> dict:
    """Initialize ResNet params (the reference config selects ResNet50 —
    configs/prohmr.yaml:43 — but the factory supports 18..152 like
    reference models/resnet.py:152-163)."""
    blocks = RESNET_LAYERS[num_layers]
    bottleneck = num_layers in BOTTLENECK_DEPTHS
    convs_per_block = 3 if bottleneck else 2
    n_keys = 1 + sum(blocks) * convs_per_block + 4  # conv1 + blocks + downsamples
    keys = jax.random.split(key, n_keys)
    ki = iter(keys)

    params = {"conv1": conv_init(next(ki), 7, 7, 3, 64), "bn1": bn_init(64)}
    inplanes = 64
    expansion = 4 if bottleneck else 1
    for li, (planes, n_blocks, stride) in enumerate(
        zip((64, 128, 256, 512), blocks, (1, 2, 2, 2)), start=1
    ):
        layer = []
        for b in range(n_blocks):
            s = stride if b == 0 else 1
            if bottleneck:
                blk = {
                    "conv1": conv_init(next(ki), 1, 1, inplanes, planes),
                    "bn1": bn_init(planes),
                    "conv2": conv_init(next(ki), 3, 3, planes, planes),
                    "bn2": bn_init(planes),
                    "conv3": conv_init(next(ki), 1, 1, planes, planes * 4),
                    "bn3": bn_init(planes * 4),
                }
            else:
                blk = {
                    "conv1": conv_init(next(ki), 3, 3, inplanes, planes),
                    "bn1": bn_init(planes),
                    "conv2": conv_init(next(ki), 3, 3, planes, planes),
                    "bn2": bn_init(planes),
                }
            if s != 1 or inplanes != planes * expansion:
                blk["downsample"] = {
                    "conv": conv_init(next(ki), 1, 1, inplanes,
                                      planes * expansion),
                    "bn": bn_init(planes * expansion),
                }
            layer.append(blk)
            inplanes = planes * expansion
        params[f"layer{li}"] = layer
    return params


def _basic_block(
    p: dict, x: Array, stride: int, *, train: bool, axis_name: Optional[str]
) -> Tuple[Array, dict]:
    """BasicBlock (ResNet18/34; reference models/resnet.py:28-57)."""
    new_p = dict(p)
    out = conv2d(p["conv1"], x, stride=stride, padding=1)
    out, new_p["bn1"] = batchnorm(
        p["bn1"], out, train=train, reduce_axes=(0, 1, 2), axis_name=axis_name
    )
    out = relu(out)
    out = conv2d(p["conv2"], out, padding=1)
    out, new_p["bn2"] = batchnorm(
        p["bn2"], out, train=train, reduce_axes=(0, 1, 2), axis_name=axis_name
    )
    if "downsample" in p:
        res = conv2d(p["downsample"]["conv"], x, stride=stride)
        res, ds_bn = batchnorm(
            p["downsample"]["bn"], res, train=train, reduce_axes=(0, 1, 2),
            axis_name=axis_name,
        )
        new_p["downsample"] = {"conv": p["downsample"]["conv"], "bn": ds_bn}
    else:
        res = x
    return relu(out + res), new_p


def _bottleneck(
    p: dict, x: Array, stride: int, *, train: bool, axis_name: Optional[str]
) -> Tuple[Array, dict]:
    new_p = dict(p)
    out = conv2d(p["conv1"], x)
    out, new_p["bn1"] = batchnorm(
        p["bn1"], out, train=train, reduce_axes=(0, 1, 2), axis_name=axis_name
    )
    out = relu(out)
    out = conv2d(p["conv2"], out, stride=stride, padding=1)
    out, new_p["bn2"] = batchnorm(
        p["bn2"], out, train=train, reduce_axes=(0, 1, 2), axis_name=axis_name
    )
    out = relu(out)
    out = conv2d(p["conv3"], out)
    out, new_p["bn3"] = batchnorm(
        p["bn3"], out, train=train, reduce_axes=(0, 1, 2), axis_name=axis_name
    )
    if "downsample" in p:
        res = conv2d(p["downsample"]["conv"], x, stride=stride)
        res, ds_bn = batchnorm(
            p["downsample"]["bn"], res, train=train, reduce_axes=(0, 1, 2),
            axis_name=axis_name,
        )
        new_p["downsample"] = {"conv": p["downsample"]["conv"], "bn": ds_bn}
    else:
        res = x
    return relu(out + res), new_p


def resnet_forward(
    params: dict,
    x: Array,
    *,
    train: bool = False,
    axis_name: Optional[str] = None,
) -> Tuple[Array, dict]:
    """x: [B, H, W, 3] NHWC -> ([B, 2048], new_params).

    (The reference feeds NCHW [B,3,224,224]; conversion happens at the data
    boundary.) Returns updated params (BN running stats) — identical object
    content in eval mode.
    """
    new_params = dict(params)
    out = conv2d(params["conv1"], x, stride=2, padding=3)
    out, new_params["bn1"] = batchnorm(
        params["bn1"], out, train=train, reduce_axes=(0, 1, 2), axis_name=axis_name
    )
    out = relu(out)
    out = max_pool(out, 3, 2, 1)

    for li in range(1, 5):
        layer = params[f"layer{li}"]
        new_layer = []
        for b, blk in enumerate(layer):
            stride = (2 if li > 1 else 1) if b == 0 else 1
            block_fn = _bottleneck if "conv3" in blk else _basic_block
            out, nb = block_fn(blk, out, stride, train=train, axis_name=axis_name)
            new_layer.append(nb)
        new_params[f"layer{li}"] = new_layer

    feats = jnp.mean(out, axis=(1, 2))  # [B, 2048]
    return feats, new_params
