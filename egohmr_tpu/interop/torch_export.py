"""Reverse interop: JAX param trees -> reference torch state_dict layout.

Inverse of `torch_convert.py`: a model trained in this framework exports to
the exact key/shape layout of the reference checkpoints (stage-2
models/egohmr/egohmr.py ctor :57-102; stage-1 models/prohmr/prohmr_scene.py),
so the released PyTorch eval code can consume it directly. Round-trip
`convert(export(params)) == params` is tested for both stages
(tests/test_interop_export.py).

All outputs are numpy float32 in torch conventions (Linear [out, in],
Conv [out, in, kh, kw]); `save_state_dict` writes a torch .pt when torch is
available, else a flat .npz with the same keys.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

Flat = Dict[str, np.ndarray]


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _lin(out: Flat, prefix: str, p: dict) -> None:
    out[prefix + ".weight"] = _np(p["w"]).T.copy()
    if "b" in p:
        out[prefix + ".bias"] = _np(p["b"])


def _conv(out: Flat, prefix: str, p: dict) -> None:
    # HWIO -> torch OIHW
    out[prefix + ".weight"] = _np(p["w"]).transpose(3, 2, 0, 1).copy()


def _bn(out: Flat, prefix: str, p: dict) -> None:
    out[prefix + ".weight"] = _np(p["scale"])
    out[prefix + ".bias"] = _np(p["bias"])
    out[prefix + ".running_mean"] = _np(p["mean"])
    out[prefix + ".running_var"] = _np(p["var"])
    out[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


def export_resnet(p: dict, prefix: str = "backbone.") -> Flat:
    out: Flat = {}
    _conv(out, prefix + "conv1", p["conv1"])
    _bn(out, prefix + "bn1", p["bn1"])
    for li in range(1, 5):
        key = f"layer{li}"
        if key not in p:
            break
        for b, blk in enumerate(p[key]):
            base = f"{prefix}layer{li}.{b}."
            _conv(out, base + "conv1", blk["conv1"])
            _bn(out, base + "bn1", blk["bn1"])
            _conv(out, base + "conv2", blk["conv2"])
            _bn(out, base + "bn2", blk["bn2"])
            if "conv3" in blk:
                _conv(out, base + "conv3", blk["conv3"])
                _bn(out, base + "bn3", blk["bn3"])
            if "downsample" in blk:
                _conv(out, base + "downsample.0", blk["downsample"]["conv"])
                _bn(out, base + "downsample.1", blk["downsample"]["bn"])
    return out


def export_pointnet(p: dict, prefix: str = "scene_enc.") -> Flat:
    out: Flat = {}
    _lin(out, prefix + "fc_pos_0", p["fc_pos_0"])
    for i in range(4):
        blk = p[f"block_{i}"]
        _lin(out, f"{prefix}block_{i}.fc_0", blk["fc_0"])
        _lin(out, f"{prefix}block_{i}.fc_1", blk["fc_1"])
        if "shortcut" in blk:
            _lin(out, f"{prefix}block_{i}.shortcut", blk["shortcut"])
    _lin(out, prefix + "fc_c", p["fc_c"])
    return out


def _gconv(out: Flat, prefix: str, p: dict) -> None:
    out[prefix + ".W"] = _np(p["W"])
    out[prefix + ".M"] = _np(p["M"])
    out[prefix + ".adj2"] = _np(p["adj2"])
    out[prefix + ".bias"] = _np(p["bias"])


def _graph_conv(out: Flat, prefix: str, p: dict) -> None:
    _gconv(out, prefix + ".gconv", p["gconv"])
    _bn(out, prefix + ".bn", p["bn"])


def _linear_as_conv1x1(out: Flat, prefix: str, p: dict) -> None:
    w = _np(p["w"]).T  # [out, in]
    out[prefix + ".weight"] = w[:, :, None, None].copy()
    if "b" in p:
        out[prefix + ".bias"] = _np(p["b"])


def export_modulated_gcn(p: dict, prefix: str = "diffusion_model.") -> Flat:
    out: Flat = {}
    _graph_conv(out, prefix + "gconv_input.0", p["gconv_input"])
    for i, blk in enumerate(p["gconv_layers"]):
        _graph_conv(out, f"{prefix}gconv_layers.{i}.gconv1", blk["gconv1"])
        _graph_conv(out, f"{prefix}gconv_layers.{i}.gconv2", blk["gconv2"])
    _gconv(out, prefix + "gconv_output", p["gconv_output"])
    if "non_local" in p:
        nl = p["non_local"]
        _linear_as_conv1x1(out, prefix + "non_local.g", nl["g"])
        _linear_as_conv1x1(out, prefix + "non_local.theta", nl["theta"])
        _linear_as_conv1x1(out, prefix + "non_local.phi", nl["phi"])
        _linear_as_conv1x1(out, prefix + "non_local.W.0", nl["w"])
        _bn(out, prefix + "non_local.W.1", nl["bn"])
    return out


def export_egohmr(params: dict) -> Flat:
    """Stage-2 param tree -> reference `state_dict` layout
    (inverse of torch_convert.convert_egohmr)."""
    out: Flat = {}
    out.update(export_resnet(params["backbone"], "backbone."))
    out.update(export_pointnet(params["scene_enc"], "scene_enc."))
    _lin(out, "transl_enc.layers.0", params["transl_enc"]["l0"])
    _lin(out, "transl_enc.layers.2", params["transl_enc"]["l1"])
    _lin(out, "embed_timestep.time_embed.0", params["embed_timestep"]["l0"])
    _lin(out, "embed_timestep.time_embed.2", params["embed_timestep"]["l1"])
    _lin(out, "input_process.poseEmbedding",
         params["input_process"]["poseEmbedding"])
    out.update(export_modulated_gcn(params["diffusion_model"],
                                    "diffusion_model."))
    _lin(out, "beta_layer.layers.0", params["beta_layer"]["l0"])
    _lin(out, "beta_layer.layers.2", params["beta_layer"]["l1"])
    out["beta_layer.init_betas"] = _np(
        params["beta_layer"]["init_betas"]).reshape(1, 10)
    return out


def export_conditional_glow(p: dict, prefix: str = "flow.flow.") -> Flat:
    out: Flat = {}
    for k, step in enumerate(p["steps"]):
        b = f"{prefix}_transform._transforms."
        an = step["actnorm"]
        out[f"{b}{3 * k}.log_scale"] = _np(an["log_scale"]).reshape(1, -1)
        out[f"{b}{3 * k}.shift"] = _np(an["shift"]).reshape(1, -1)
        lu = step["linear"]
        out[f"{b}{3 * k + 1}.lower_entries"] = _np(lu["lower_entries"])
        out[f"{b}{3 * k + 1}.upper_entries"] = _np(lu["upper_entries"])
        out[f"{b}{3 * k + 1}.unconstrained_upper_diag"] = _np(
            lu["unconstrained_upper_diag"])
        out[f"{b}{3 * k + 1}.bias"] = _np(lu["bias"])
        net = step["coupling"]["net"]
        net_prefix = f"{b}{3 * k + 2}.transform_net."
        _lin(out, net_prefix + "initial_layer", net["initial_layer"])
        _lin(out, net_prefix + "final_layer", net["final_layer"])
        for j, blk in enumerate(net["blocks"]):
            _lin(out, f"{net_prefix}blocks.{j}.linear_layers.0", blk["l0"])
            _lin(out, f"{net_prefix}blocks.{j}.linear_layers.1", blk["l1"])
            if "context_layer" in blk:
                _lin(out, f"{net_prefix}blocks.{j}.context_layer",
                     blk["context_layer"])
    return out


def export_prohmr(params: dict) -> Flat:
    """Stage-1 param tree -> reference layout (inverse of convert_prohmr)."""
    out: Flat = {}
    out.update(export_resnet(params["backbone"], "backbone."))
    out.update(export_pointnet(params["scene_enc"], "scene_enc."))
    out.update(export_conditional_glow(params["flow"], "flow.flow."))
    _lin(out, "flow.fc_head.layers.0", params["fc_head"]["l0"])
    _lin(out, "flow.fc_head.layers.2", params["fc_head"]["l1"])
    out["flow.fc_head.init_betas"] = _np(
        params["fc_head"]["init_betas"]).reshape(1, 10)
    out["flow.fc_head.init_cam"] = _np(
        params["fc_head"]["init_cam"]).reshape(1, 3)
    return out


def export_discriminator(p: dict, prefix: str = "discriminator.") -> Flat:
    out: Flat = {}
    for name in ("D_conv1", "D_conv2"):
        w = _np(p[name]["w"]).T  # [out, in]
        out[prefix + name + ".weight"] = w[:, :, None, None].copy()
        out[prefix + name + ".bias"] = _np(p[name]["b"])
    for i, lp in enumerate(p["pose_out"]):
        _lin(out, f"{prefix}pose_out.{i}", lp)
    for name in ("betas_fc1", "betas_fc2", "betas_out",
                 "D_alljoints_fc1", "D_alljoints_fc2", "D_alljoints_out"):
        _lin(out, prefix + name, p[name])
    return out


def save_state_dict(sd: Flat, path: str,
                    extra: Optional[dict] = None) -> str:
    """Write a reference-style checkpoint: torch .pt ({'state_dict': ...},
    the layout train_egohmr.py:217-233 saves) when torch is available and
    the path ends in .pt; otherwise (or if torch is missing) a flat .npz
    with identical keys. Returns the path actually written."""
    if path.endswith(".pt"):
        try:
            import torch
        except ImportError:
            path = path[:-3] + ".npz"  # torch-free environment: fall back
        else:
            obj = {"state_dict": {
                k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}}
            if extra:
                obj.update(extra)
            torch.save(obj, path)
            return path
    if not path.endswith(".npz"):
        path = path + ".npz"
    if extra:
        # keep metadata (total_steps, ...) on the npz fallback too so the
        # same call writes equivalent checkpoint contents regardless of
        # environment; reserved key, JSON-encoded (values may be scalars,
        # strings or small dicts)
        import json

        sd = dict(sd)
        sd["__extra_json__"] = np.asarray(json.dumps(extra))
    np.savez(path, **sd)
    return path
