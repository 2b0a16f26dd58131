"""Opt-in tensor parallelism: 2-D (data x model) mesh placement rules.

The reference is strictly single-GPU (SURVEY.md §2.7) and this framework's
production scaling story is pure data parallelism (`parallel/mesh.py`) — the
model fits on one chip hundreds of times over, so DP is the throughput
optimum. This module adds the OPT-IN capability to also split the model
dimension across chips, for deployments where the per-chip batch is small
and latency-bound (e.g. interactive serving at batch 1-8): Megatron-style
tensor parallelism over the two custom networks,

  * scene PointNet (`nn/pointnet.py`): each ResnetBlockFC's first matmul is
    column-parallel (inner hidden sharded), its second row-parallel (output
    all-reduced back to the replicated residual stream);
  * ModulatedGCN denoiser (`nn/gcn.py`): gconv1 of every residual pair is
    column-parallel — including the input layer, whose [3718, 1024] context
    contraction is the denoiser's dominant matmul — and gconv2 / the output
    head are row-parallel. BatchNorm on column-parallel activations runs
    with per-channel parameters sharded the same way (BN is elementwise per
    channel, so no cross-shard statistics are needed).

Implementation is pure GSPMD: we only PLACE parameters with NamedShardings
(the functions below build a PartitionSpec tree mirroring the param tree)
and let XLA propagate shardings and insert the all-reduces over ICI. The nn
modules are untouched and the math is semantically identical to the
unsharded program (up to float reduction order — tested elementwise in
tests/test_tensor_parallel.py and certified on the virtual 8-device mesh in
__graft_entry__.dryrun_multichip).

Scope: inference (serving). The training step uses shard_map data
parallelism (train/loop.py) and does not compose with these placements; the
ResNet image backbone stays replicated (conv-channel sharding buys nothing
at 224px inputs — the conv working set is activation-, not weight-bound).
Use `pointnet_impl="xla"` (the EgoHMRConfig default) with TP: the fused
Pallas scene encoder (nn/pointnet_fused.py) is a single-device kernel —
GSPMD cannot partition an opaque pallas_call, so placing its params
model-sharded would at best force an all-gather back to replicated.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_tp_mesh(
    dp: int, tp: int, axes: Tuple[str, str] = ("data", "model")
) -> Mesh:
    """2-D mesh: `dp` data-parallel x `tp` tensor-parallel devices.

    Device order keeps the model axis innermost so tensor-parallel
    all-reduces ride neighboring ICI links.
    """
    devs = jax.devices()
    if len(devs) < dp * tp:
        raise ValueError(f"need {dp * tp} devices for a {dp}x{tp} mesh, "
                         f"have {len(devs)}")
    return Mesh(np.asarray(devs[: dp * tp]).reshape(dp, tp), axes)


def _repl(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda _: P(), tree)


def _linear_col(p: dict, axis: str) -> dict:
    """Column-parallel dense: output features sharded."""
    s = {"w": P(None, axis)}
    if "b" in p:
        s["b"] = P(axis)
    return s


def _linear_row(p: dict, axis: str) -> dict:
    """Row-parallel dense: contraction dim sharded, output replicated
    (GSPMD inserts the all-reduce)."""
    s = {"w": P(axis, None)}
    if "b" in p:
        s["b"] = P()
    return s


def _bn_col(axis: str) -> dict:
    """BatchNorm on column-parallel activations: all four per-channel
    leaves sharded like the channel axis."""
    return {"scale": P(axis), "bias": P(axis), "mean": P(axis), "var": P(axis)}


def _gconv_col(axis: str) -> dict:
    """ModulatedGraphConv, column-parallel: W [2, in, out] sharded on out,
    per-node modulation M [24, out] and bias [out] follow; the learned
    24x24 adjacency perturbation is replicated."""
    return {"W": P(None, None, axis), "M": P(None, axis),
            "adj2": P(), "bias": P(axis)}


def _gconv_row(axis: str) -> dict:
    """ModulatedGraphConv, row-parallel: W sharded on the contraction dim;
    modulation/bias apply after the all-reduce, so they stay replicated."""
    return {"W": P(None, axis, None), "M": P(), "adj2": P(), "bias": P()}


def pointnet_tp_specs(params: dict, axis: str = "model") -> dict:
    """PartitionSpec tree for `nn.pointnet` params: the residual stream
    (fc_pos_0 output, block outputs, shortcuts, fc_c) stays replicated on
    the model axis; each block's inner hidden is sharded."""
    specs: dict = {"fc_pos_0": _repl(params["fc_pos_0"]),
                   "fc_c": _repl(params["fc_c"])}
    for name, blk in params.items():
        if not name.startswith("block_"):
            continue
        s = {"fc_0": _linear_col(blk["fc_0"], axis),
             "fc_1": _linear_row(blk["fc_1"], axis)}
        if "shortcut" in blk:
            s["shortcut"] = _repl(blk["shortcut"])
        specs[name] = s
    return specs


def gcn_tp_specs(params: dict, axis: str = "model") -> dict:
    """PartitionSpec tree for `nn.gcn` ModulatedGCN params: column-parallel
    gconv_input/gconv1 (hidden sharded, BN sharded per-channel),
    row-parallel gconv2/gconv_output (residual stream replicated)."""
    specs: dict = {
        "gconv_input": {"gconv": _gconv_col(axis), "bn": _bn_col(axis)},
        "gconv_layers": [
            {"gconv1": {"gconv": _gconv_col(axis), "bn": _bn_col(axis)},
             "gconv2": {"gconv": _gconv_row(axis),
                        "bn": _repl(blk["gconv2"]["bn"])}}
            for blk in params["gconv_layers"]
        ],
        "gconv_output": _gconv_row(axis),
    }
    if "non_local" in params:
        nl = params["non_local"]
        specs["non_local"] = {
            "g": _linear_col(nl["g"], axis),
            "theta": _linear_col(nl["theta"], axis),
            "phi": _linear_col(nl["phi"], axis),
            "w": _linear_row(nl["w"], axis),
            "bn": _repl(nl["bn"]),
        }
    return specs


def egohmr_tp_specs(params: dict, axis: str = "model") -> dict:
    """PartitionSpec tree for the full stage-2 model params
    (`models.init_egohmr` layout): scene PointNet + GCN denoiser tensor-
    parallel, everything else (ResNet backbone, embedders, beta head)
    replicated."""
    specs = {name: _repl(sub) for name, sub in params.items()}
    specs["scene_enc"] = pointnet_tp_specs(params["scene_enc"], axis)
    specs["diffusion_model"] = gcn_tp_specs(params["diffusion_model"], axis)
    return specs


def place_params(mesh: Mesh, params: Any, specs: Any) -> Any:
    """device_put every param leaf with its NamedSharding(mesh, spec).

    `specs` mirrors `params` with PartitionSpec leaves (as built by the
    *_tp_specs functions); sharded dims must divide the mesh axis size
    (jax raises otherwise — pick hidden dims divisible by `tp`).
    """
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
