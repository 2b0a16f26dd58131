"""PyTorch state_dict -> egohmr_tpu param-tree converters.

This is the parity bridge to the reference's released checkpoints
(91453 stage-2, 53618 stage-1; reference README.md:68-70 + SURVEY.md §5
"checkpoint/resume"). Input is a flat {name: numpy array} dict — load with
`load_torch_checkpoint` (which uses torch only if a .pt file is given; .npz
archives of the same flat dict work torch-free).

Layout rules:
  torch Linear weight [out, in]        -> 'w' [in, out] (transpose)
  torch Conv2d weight [out, in, kh, kw]-> 'w' [kh, kw, in, out]
  torch BatchNorm {weight,bias,running_mean,running_var}
                                       -> {scale, bias, mean, var}
"""
from __future__ import annotations

from typing import Dict, Optional, Mapping

import jax.numpy as jnp
import numpy as np

Flat = Mapping[str, np.ndarray]


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.pth checkpoint (or a flat .npz) to numpy arrays.

    Reference checkpoints store {'state_dict': ...}
    (train_egohmr.py:217-233)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            # "__extra_json__" is torch_export's reserved metadata slot (the
            # npz analogue of the .pt file's extra keys) — not a weight
            return {k: z[k] for k in z.files if k != "__extra_json__"}
    import torch  # local import: only needed for .pt files

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    # copy: torch .numpy() shares memory with the tensor and jnp.asarray on
    # CPU is zero-copy — defensive copy severs any aliasing with live modules
    return {k: v.detach().cpu().numpy().copy() for k, v in obj.items()
            if hasattr(v, "detach")}


def _lin(sd: Flat, prefix: str) -> dict:
    p = {"w": jnp.asarray(np.asarray(sd[prefix + ".weight"]).T)}
    if prefix + ".bias" in sd:
        p["b"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def _conv(sd: Flat, prefix: str) -> dict:
    w = np.asarray(sd[prefix + ".weight"])  # [out, in, kh, kw]
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}


def _bn(sd: Flat, prefix: str) -> dict:
    return {
        "scale": jnp.asarray(sd[prefix + ".weight"]),
        "bias": jnp.asarray(sd[prefix + ".bias"]),
        "mean": jnp.asarray(sd[prefix + ".running_mean"]),
        "var": jnp.asarray(sd[prefix + ".running_var"]),
    }


# ------------------------------------------------------------------ resnet
def convert_resnet(sd: Flat, prefix: str = "backbone.",
                   num_layers: int = 50) -> dict:
    from ..nn.resnet import RESNET_LAYERS

    blocks = RESNET_LAYERS[num_layers]
    params = {"conv1": _conv(sd, prefix + "conv1"), "bn1": _bn(sd, prefix + "bn1")}
    for li, n_blocks in enumerate(blocks, start=1):
        layer = []
        for b in range(n_blocks):
            base = f"{prefix}layer{li}.{b}."
            blk = {
                "conv1": _conv(sd, base + "conv1"),
                "bn1": _bn(sd, base + "bn1"),
                "conv2": _conv(sd, base + "conv2"),
                "bn2": _bn(sd, base + "bn2"),
            }
            if base + "conv3.weight" in sd:  # bottleneck (50/101/152)
                blk["conv3"] = _conv(sd, base + "conv3")
                blk["bn3"] = _bn(sd, base + "bn3")
            if base + "downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": _conv(sd, base + "downsample.0"),
                    "bn": _bn(sd, base + "downsample.1"),
                }
            layer.append(blk)
        params[f"layer{li}"] = layer
    return params


# ---------------------------------------------------------------- pointnet
def convert_pointnet(sd: Flat, prefix: str = "scene_enc.") -> dict:
    def block(name):
        p = {
            "fc_0": _lin(sd, prefix + name + ".fc_0"),
            "fc_1": _lin(sd, prefix + name + ".fc_1"),
        }
        if prefix + name + ".shortcut.weight" in sd:
            p["shortcut"] = _lin(sd, prefix + name + ".shortcut")
        return p

    return {
        "fc_pos_0": _lin(sd, prefix + "fc_pos_0"),
        "block_0": block("block_0"),
        "block_1": block("block_1"),
        "block_2": block("block_2"),
        "block_3": block("block_3"),
        "fc_c": _lin(sd, prefix + "fc_c"),
    }


# --------------------------------------------------------------------- gcn
def _gconv(sd: Flat, prefix: str) -> dict:
    return {
        "W": jnp.asarray(sd[prefix + ".W"]),
        "M": jnp.asarray(sd[prefix + ".M"]),
        "adj2": jnp.asarray(sd[prefix + ".adj2"]),
        "bias": jnp.asarray(sd[prefix + ".bias"]),
    }


def _graph_conv(sd: Flat, prefix: str) -> dict:
    return {"gconv": _gconv(sd, prefix + ".gconv"), "bn": _bn(sd, prefix + ".bn")}


def _conv1x1_as_linear(sd: Flat, prefix: str) -> dict:
    """torch Conv2d(cin, cout, 1) [cout, cin, 1, 1] -> linear w [cin, cout]."""
    w = np.asarray(sd[prefix + ".weight"])
    p = {"w": jnp.asarray(w.reshape(w.shape[0], w.shape[1]).T)}
    if prefix + ".bias" in sd:
        p["b"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def convert_modulated_gcn(sd: Flat, prefix: str = "diffusion_model.",
                          num_layers: int = 4) -> dict:
    # torch wraps gconv_input in nn.Sequential -> key "gconv_input.0"
    params = {
        "gconv_input": _graph_conv(sd, prefix + "gconv_input.0"),
        "gconv_layers": [
            {
                "gconv1": _graph_conv(sd, f"{prefix}gconv_layers.{i}.gconv1"),
                "gconv2": _graph_conv(sd, f"{prefix}gconv_layers.{i}.gconv2"),
            }
            for i in range(num_layers)
        ],
        "gconv_output": _gconv(sd, prefix + "gconv_output"),
    }
    if prefix + "non_local.g.weight" in sd:
        # gcn_nonlocal_layer=True checkpoints (reference modulated_gcn.py:
        # 96-97 + nets/non_local_embedded_gaussian.py; W = Sequential(conv,bn))
        params["non_local"] = {
            "g": _conv1x1_as_linear(sd, prefix + "non_local.g"),
            "theta": _conv1x1_as_linear(sd, prefix + "non_local.theta"),
            "phi": _conv1x1_as_linear(sd, prefix + "non_local.phi"),
            "w": _conv1x1_as_linear(sd, prefix + "non_local.W.0"),
            "bn": _bn(sd, prefix + "non_local.W.1"),
        }
    return params


# ----------------------------------------------------------------- heads
def convert_timestep_embedder(sd: Flat, prefix: str = "embed_timestep.",
                              latent_dim: Optional[int] = None) -> dict:
    from ..nn.embedders import sinusoidal_table

    if latent_dim is None:  # infer from the MLP input width
        latent_dim = np.asarray(sd[prefix + "time_embed.0.weight"]).shape[1]
    return {
        "pe": jnp.asarray(sinusoidal_table(latent_dim)),
        "l0": _lin(sd, prefix + "time_embed.0"),
        "l1": _lin(sd, prefix + "time_embed.2"),
    }


def convert_input_process(sd: Flat, prefix: str = "input_process.") -> dict:
    return {"poseEmbedding": _lin(sd, prefix + "poseEmbedding")}


def convert_transl_enc(sd: Flat, prefix: str = "transl_enc.") -> dict:
    return {"l0": _lin(sd, prefix + "layers.0"), "l1": _lin(sd, prefix + "layers.2")}


def convert_fc_head_beta(sd: Flat, prefix: str = "beta_layer.") -> dict:
    return {
        "l0": _lin(sd, prefix + "layers.0"),
        "l1": _lin(sd, prefix + "layers.2"),
        "init_betas": jnp.asarray(sd[prefix + "init_betas"]).reshape(1, 10),
    }


def convert_fc_head(sd: Flat, prefix: str = "flow.fc_head.") -> dict:
    return {
        "l0": _lin(sd, prefix + "layers.0"),
        "l1": _lin(sd, prefix + "layers.2"),
        "init_betas": jnp.asarray(sd[prefix + "init_betas"]).reshape(1, 10),
        "init_cam": jnp.asarray(sd[prefix + "init_cam"]).reshape(1, 3),
    }


# -------------------------------------------------------------------- glow
def convert_conditional_glow(sd: Flat, prefix: str = "flow.flow.",
                             num_layers: int = 4,
                             num_blocks_per_layer: int = 2) -> dict:
    """nflows ConditionalGlow -> egohmr_tpu.flow param tree.

    Key layout of the nflows fork used by ProHMR (stage-1 checkpoint 53618;
    reference models/prohmr/smpl_flow.py:24): the flow is a
    `CompositeTransform` with 3 transforms per step —
      _transform._transforms.{3k}:   ActNorm        (log_scale, shift)
      _transform._transforms.{3k+1}: LU 1x1 linear  (bias, lower_entries,
                                     upper_entries, unconstrained_upper_diag)
      _transform._transforms.{3k+2}: AffineCoupling (transform_net.* =
                                     ResidualNet: initial_layer,
                                     blocks.{j}.linear_layers.{0,1},
                                     blocks.{j}.context_layer, final_layer)
    """
    steps = []
    for k in range(num_layers):
        b = f"{prefix}_transform._transforms."
        an = {
            "log_scale": jnp.asarray(sd[f"{b}{3 * k}.log_scale"]).reshape(-1),
            "shift": jnp.asarray(sd[f"{b}{3 * k}.shift"]).reshape(-1),
        }
        lu = {
            "lower_entries": jnp.asarray(sd[f"{b}{3 * k + 1}.lower_entries"]),
            "upper_entries": jnp.asarray(sd[f"{b}{3 * k + 1}.upper_entries"]),
            "unconstrained_upper_diag": jnp.asarray(
                sd[f"{b}{3 * k + 1}.unconstrained_upper_diag"]),
            "bias": jnp.asarray(sd[f"{b}{3 * k + 1}.bias"]),
        }
        net_prefix = f"{b}{3 * k + 2}.transform_net."
        blocks = []
        for j in range(num_blocks_per_layer):
            blk = {
                "l0": _lin(sd, f"{net_prefix}blocks.{j}.linear_layers.0"),
                "l1": _lin(sd, f"{net_prefix}blocks.{j}.linear_layers.1"),
            }
            if f"{net_prefix}blocks.{j}.context_layer.weight" in sd:
                blk["context_layer"] = _lin(
                    sd, f"{net_prefix}blocks.{j}.context_layer")
            blocks.append(blk)
        coupling = {
            "net": {
                "initial_layer": _lin(sd, net_prefix + "initial_layer"),
                "final_layer": _lin(sd, net_prefix + "final_layer"),
                "blocks": blocks,
            }
        }
        steps.append({"actnorm": an, "linear": lu, "coupling": coupling})
    return {"steps": steps}


def convert_prohmr(sd: Flat, num_layers: int = 4,
                   num_blocks_per_layer: int = 2,
                   resnet_layers: int = 50) -> dict:
    """Full stage-1 ProHMR-scene param tree from a reference checkpoint
    (module layout: models/prohmr/prohmr_scene.py ctor)."""
    return {
        "backbone": convert_resnet(sd, "backbone.", resnet_layers),
        "scene_enc": convert_pointnet(sd, "scene_enc."),
        "flow": convert_conditional_glow(sd, "flow.flow.", num_layers,
                                         num_blocks_per_layer),
        "fc_head": convert_fc_head(sd, "flow.fc_head."),
    }


# ------------------------------------------------------------ discriminator
def convert_discriminator(sd: Flat, prefix: str = "discriminator.") -> dict:
    def conv1x1_as_linear(name):
        w = np.asarray(sd[prefix + name + ".weight"])[:, :, 0, 0]  # [out, in]
        return {"w": jnp.asarray(w.T), "b": jnp.asarray(sd[prefix + name + ".bias"])}

    return {
        "D_conv1": conv1x1_as_linear("D_conv1"),
        "D_conv2": conv1x1_as_linear("D_conv2"),
        "pose_out": [_lin(sd, f"{prefix}pose_out.{i}") for i in range(23)],
        "betas_fc1": _lin(sd, prefix + "betas_fc1"),
        "betas_fc2": _lin(sd, prefix + "betas_fc2"),
        "betas_out": _lin(sd, prefix + "betas_out"),
        "D_alljoints_fc1": _lin(sd, prefix + "D_alljoints_fc1"),
        "D_alljoints_fc2": _lin(sd, prefix + "D_alljoints_fc2"),
        "D_alljoints_out": _lin(sd, prefix + "D_alljoints_out"),
    }


# ------------------------------------------------------------- full models
def convert_egohmr(sd: Flat, num_layers: int = 4,
                   resnet_layers: int = 50) -> dict:
    """Full stage-2 EgoHMR param tree from a reference checkpoint
    (model key layout: models/egohmr/egohmr.py ctor, :57-102)."""
    return {
        "backbone": convert_resnet(sd, "backbone.", resnet_layers),
        "scene_enc": convert_pointnet(sd, "scene_enc."),
        "transl_enc": convert_transl_enc(sd, "transl_enc."),
        "embed_timestep": convert_timestep_embedder(sd, "embed_timestep."),
        "input_process": convert_input_process(sd, "input_process."),
        "diffusion_model": convert_modulated_gcn(sd, "diffusion_model.", num_layers),
        "beta_layer": convert_fc_head_beta(sd, "beta_layer."),
    }
