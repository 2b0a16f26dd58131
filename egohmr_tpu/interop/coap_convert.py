"""COAP pretrained-weight -> egohmr_tpu occupancy-param converter.

The reference attaches the published COAP model (part-wise neural body
occupancy; reference models/egohmr/egohmr.py:117 `attach_coap`,
environment.yml:153 `github.com/markomih/COAP`) whose pretrained weights
are distributed out-of-band and are NOT present in this image. This module
makes an eventual weight drop-in MECHANICAL, the way
`interop/torch_convert.py` already does for the released 91453/53618
checkpoints:

  * `collision/neural_occupancy.py` carries the exact-COAP param layout
    behind `OccupancyConfig(per_part_networks=True)`: per-part encoder /
    decoder MLPs, with the K per-part weight matrices STACKED into
    [K, in, out] leaves so the forward is one part-batched einsum instead
    of a Python loop over K small torch modules (the TPU-native
    formulation of COAP's per-part networks);
  * `convert_coap()` below maps a torch state_dict of per-part Sequential
    MLPs onto that layout — auto-discovering the per-part prefix pattern,
    walking each Sequential's Linear layers (activation slots carry no
    params), transposing [out, in] -> [in, out] and stacking over parts;
  * the shape/math contract is pinned by tests/test_coap_convert.py on a
    FABRICATED state dict (golden vs a hand-rolled numpy forward), since
    the real weights cannot be obtained in-image.

Residual caveats for a real drop-in (documented in PARITY.md): the
encoder input must match this framework's per-part feature assembly
(rot 9 + transl 3 + betas 10 = 22 dims — `occupancy_query`); a release
with a different localization/feature contract converts mechanically but
needs its feature assembly transcribed into `occupancy_query` first.
`convert_coap` validates the dimension and fails loudly either way.
"""
from __future__ import annotations

import re
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

Flat = Mapping[str, np.ndarray]

# per-part module prefix patterns tried in order by auto-discovery; '{k}'
# is the part index. Covers the obvious namings of "a list of per-part
# nn.Sequential MLPs" (torch flattens nn.ModuleList entries by index).
_PART_PATTERNS: Tuple[Tuple[str, str], ...] = (
    ("part_encoders.{k}.net", "part_decoders.{k}.net"),
    ("part_encoders.{k}", "part_decoders.{k}"),
    ("encoders.{k}.net", "decoders.{k}.net"),
    ("encoders.{k}", "decoders.{k}"),
    ("coap.part_encoders.{k}", "coap.part_decoders.{k}"),
)


def _stack_parts(sd: Flat, fmt: str, what: str, num_parts: int,
                 who: str) -> List[Dict[str, jnp.ndarray]]:
    """Walk each part's Sequential under `fmt` and np.stack the Linear
    layers into the part-leading [K, in, out] einsum layout, validating
    that every part's net is architecturally identical. Shared by
    `convert_coap` and `convert_volsmpl` (interop/volsmpl_convert.py);
    `who` names the caller in diagnostics."""
    per_part = []
    for k in range(num_parts):
        layers = _walk_sequential(sd, fmt.format(k=k))
        if not layers:
            raise ValueError(
                f"{who}: no Linear layers found for {what} part "
                f"{k} under '{fmt.format(k=k)}' — the checkpoint has "
                f"{len(sd)} keys; is num_parts={num_parts} "
                "right for this release?")
        per_part.append(layers)
    depth = len(per_part[0])
    for k, layers in enumerate(per_part):
        if len(layers) != depth:
            raise ValueError(
                f"{who}: {what} part {k} has {len(layers)} "
                f"Linear layers but part 0 has {depth} — per-part nets "
                "must be architecturally identical to stack")
        for i, layer in enumerate(layers):
            if layer["w"].shape != per_part[0][i]["w"].shape:
                raise ValueError(
                    f"{who}: {what} part {k} layer {i} shape "
                    f"{layer['w'].shape} != part 0's "
                    f"{per_part[0][i]['w'].shape}")
    return [
        {"w": jnp.asarray(np.stack([p[i]["w"] for p in per_part])),
         "b": jnp.asarray(np.stack([p[i]["b"] for p in per_part]))}
        for i in range(depth)
    ]


def _walk_sequential(sd: Flat, prefix: str) -> List[Dict[str, np.ndarray]]:
    """Collect the Linear layers of a torch nn.Sequential under `prefix`.

    Torch indexes Sequential children by position; activation modules own
    no params, so their indices are simply absent from the state dict —
    we scan indices 0..max and keep the ones with a `.weight`.
    """
    idxs = []
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.weight$")
    for key in sd:
        m = pat.match(key)
        if m:
            idxs.append(int(m.group(1)))
    layers = []
    for i in sorted(idxs):
        w = np.asarray(sd[f"{prefix}.{i}.weight"])
        if w.ndim != 2:
            raise ValueError(
                f"{prefix}.{i}.weight has shape {w.shape}; expected a 2-D "
                "Linear weight — non-MLP per-part networks need a bespoke "
                "converter")
        layer = {"w": w.T}  # torch [out, in] -> [in, out]
        bkey = f"{prefix}.{i}.bias"
        layer["b"] = (np.asarray(sd[bkey]) if bkey in sd
                      else np.zeros((w.shape[0],), w.dtype))
        layers.append(layer)
    return layers


def _discover_pattern(sd: Flat,
                      patterns: Sequence[Tuple[str, str]]) -> Tuple[str, str]:
    for enc_fmt, dec_fmt in patterns:
        if any(k.startswith(enc_fmt.format(k=0) + ".") for k in sd):
            return enc_fmt, dec_fmt
    sample = sorted(sd)[:10]
    raise ValueError(
        "convert_coap: no per-part module pattern matched this state dict. "
        f"Tried prefixes {[p[0] for p in patterns]}; the dict starts with "
        f"keys {sample}. Pass enc_fmt/dec_fmt matching the release's "
        "layout (use '{k}' for the part index).")


def convert_coap(
    sd: Flat,
    *,
    num_parts: int = 24,
    enc_fmt: Optional[str] = None,
    dec_fmt: Optional[str] = None,
    activation: str = "leaky_relu",
    strict_feature_contract: bool = True,
):
    """Map a COAP-layout torch state_dict onto occupancy params.

    Returns (params, OccupancyConfig) ready for
    `collision.neural_occupancy.occupancy_query`. `sd` is a flat
    {name: array} dict (`load_torch_checkpoint` produces one from a .pt).

    Layout contract: `num_parts` per-part MLPs for the encoder and the
    decoder, each a torch Sequential of Linear layers (ModuleList entry k
    under `enc_fmt.format(k=k)` / `dec_fmt`; auto-discovered from common
    namings when not given). All parts must share layer shapes — COAP's
    per-part nets are architecturally identical, only their weights
    differ — because the converted leaves stack them into [K, in, out].
    """
    from ..collision.neural_occupancy import NUM_PARTS, OccupancyConfig

    # static-argument check — fail before walking/stacking 2*num_parts MLPs
    if num_parts != NUM_PARTS:
        raise ValueError(
            f"convert_coap: this framework decomposes the body into "
            f"{NUM_PARTS} parts (one per SMPL joint); a {num_parts}-part "
            "release needs a part-assignment map added to "
            "collision/neural_occupancy.py first")

    if enc_fmt is None or dec_fmt is None:
        enc_fmt, dec_fmt = _discover_pattern(sd, _PART_PATTERNS)

    enc = _stack_parts(sd, enc_fmt, "encoder", num_parts, "convert_coap")
    dec = _stack_parts(sd, dec_fmt, "decoder", num_parts, "convert_coap")

    enc_in = int(enc[0]["w"].shape[1])
    latent = int(enc[-1]["w"].shape[2])
    dec_in = int(dec[0]["w"].shape[1])
    if strict_feature_contract:
        if enc_in != 22:
            raise ValueError(
                f"convert_coap: encoder expects {enc_in}-d input but this "
                "framework feeds 22 dims per part (rot 9 + transl 3 + "
                "betas 10 — occupancy_query). A release with a different "
                "feature contract converts with "
                "strict_feature_contract=False, but occupancy_query's "
                "feature assembly must be extended to match before use.")
        if dec_in != 3 + latent:
            raise ValueError(
                f"convert_coap: decoder expects {dec_in}-d input but the "
                f"query feeds local-point 3 + latent {latent} = "
                f"{3 + latent} dims.")
    if int(dec[-1]["w"].shape[2]) != 1:
        raise ValueError(
            f"convert_coap: decoder output dim {dec[-1]['w'].shape[2]} != 1 "
            "(occupancy logit)")

    hidden = int(dec[0]["w"].shape[2]) if len(dec) > 1 else 0
    cfg = OccupancyConfig(
        latent_dim=latent,
        hidden_dim=hidden,
        num_layers=len(dec),
        per_part_networks=True,
        activation=activation,
    )
    return {"part_encoder": enc, "part_decoder": dec}, cfg
