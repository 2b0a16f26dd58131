"""VolumetricSMPL pretrained-weight -> egohmr_tpu sdf-net converter.

The reference's volsmpl variant attaches the published VolumetricSMPL model
(compositional neural body SDF; reference models/egohmr/egohmr_volsmpl.py:
134-135 `attach_volume(... pretrained=True)`, and the commented-out
coap_plus path at :122-132 loading `last.ckpt['state_dict']`). Its weights
are distributed out-of-band and are NOT in this image; this module makes an
eventual drop-in MECHANICAL, exactly like `interop/coap_convert.py` does
for COAP:

  * `collision/neural_sdf.py` carries the exact-release layout behind
    `SDFNetConfig(per_part_networks=True)` — per-part encoder/decoder MLPs
    stacked into [K, in, out] leaves, one part-batched einsum;
  * `convert_volsmpl()` below unwraps the lightning checkpoint wrapper,
    strips the attach-point prefix, then reuses coap_convert's per-part
    Sequential discovery/stacking (the VolSMPL family keeps COAP's
    per-part MLP organization — it replaces the occupancy head with a
    signed-distance head, which is a config change here, not a layout
    change);
  * the shape/math contract is pinned by tests/test_neural_sdf.py on a
    FABRICATED state dict, since the real weights cannot be obtained
    in-image.

Residual caveats for a real drop-in (same class as coap_convert's,
documented in PARITY.md): the encoder input must match this framework's
per-part feature assembly (rot 9 + transl 3 + betas 10 = 22 dims), and a
release whose decoder applies an output nonlinearity or scale needs that
transcribed into `sdf_query` (set `bounded_output`/`trunc` accordingly).
`convert_volsmpl` validates dimensions and fails loudly either way.
"""
from __future__ import annotations

from typing import Mapping, Optional, Tuple

import numpy as np

from .coap_convert import _PART_PATTERNS, _stack_parts, _walk_sequential

Flat = Mapping[str, np.ndarray]

# wrapper prefixes seen on lightning / attach-point checkpoints, tried in
# order; the state dict is re-keyed with the first one that matches all of
# a per-part pattern
_STRIP_PREFIXES = ("", "coap.", "volume.", "model.", "model.coap.",
                   "smpl.coap.", "smpl_volsmpl.volume.")


def convert_volsmpl(
    sd: Flat,
    *,
    num_parts: int = 24,
    enc_fmt: Optional[str] = None,
    dec_fmt: Optional[str] = None,
    activation: str = "leaky_relu",
    strict_feature_contract: bool = True,
):
    """Map a VolumetricSMPL-layout torch state_dict onto sdf-net params.

    Returns (params, SDFNetConfig) ready for
    `collision.neural_sdf.sdf_query`. Accepts either a flat state dict or
    a lightning checkpoint dict (`{'state_dict': {...}}` — the layout the
    reference loads at egohmr_volsmpl.py:130).
    """
    from ..collision.neural_sdf import SDFNetConfig
    from ..collision.neural_occupancy import NUM_PARTS

    if num_parts != NUM_PARTS:
        raise ValueError(
            f"convert_volsmpl: this framework decomposes the body into "
            f"{NUM_PARTS} parts; a {num_parts}-part release needs a "
            "part-assignment map added to collision/neural_sdf.py first")

    if "state_dict" in sd and isinstance(sd["state_dict"], Mapping):
        sd = sd["state_dict"]

    if enc_fmt is None or dec_fmt is None:
        # accept a (strip prefix, pattern) combination only if the part-0
        # Sequential actually WALKS to Linear layers under it — a prefix
        # match alone can hit a pattern missing the '.net' nesting level
        found = None
        for strip in _STRIP_PREFIXES:
            trial = ({k[len(strip):]: v for k, v in sd.items()
                      if k.startswith(strip)} if strip else dict(sd))
            for e_fmt, d_fmt in _PART_PATTERNS:
                if (_walk_sequential(trial, e_fmt.format(k=0))
                        and _walk_sequential(trial, d_fmt.format(k=0))):
                    found = ((e_fmt, d_fmt), trial)
                    break
            if found:
                break
        if found is None:
            sample = sorted(sd)[:10]
            raise ValueError(
                "convert_volsmpl: no per-part module pattern matched this "
                f"state dict under any of the prefixes {_STRIP_PREFIXES}. "
                f"The dict starts with keys {sample}. Pass enc_fmt/dec_fmt "
                "matching the release's layout ('{k}' = part index).")
        (enc_fmt, dec_fmt), sd = found

    enc = _stack_parts(sd, enc_fmt, "encoder", num_parts,
                       "convert_volsmpl")
    dec = _stack_parts(sd, dec_fmt, "decoder", num_parts,
                       "convert_volsmpl")

    enc_in = int(enc[0]["w"].shape[1])
    latent = int(enc[-1]["w"].shape[2])
    dec_in = int(dec[0]["w"].shape[1])
    if strict_feature_contract:
        if enc_in != 22:
            raise ValueError(
                f"convert_volsmpl: encoder expects {enc_in}-d input but "
                "this framework feeds 22 dims per part (rot 9 + transl 3 + "
                "betas 10 — sdf_query). Convert with "
                "strict_feature_contract=False after extending sdf_query's "
                "feature assembly to the release's contract.")
        if dec_in != 3 + latent:
            raise ValueError(
                f"convert_volsmpl: decoder expects {dec_in}-d input but the "
                f"query feeds local-point 3 + latent {latent} = "
                f"{3 + latent} dims.")
    if int(dec[-1]["w"].shape[2]) != 1:
        raise ValueError(
            f"convert_volsmpl: decoder output dim {dec[-1]['w'].shape[2]} "
            "!= 1 (signed distance)")

    cfg = SDFNetConfig(
        latent_dim=latent,
        hidden_dim=int(dec[0]["w"].shape[2]) if len(dec) > 1 else 0,
        num_layers=len(dec),
        part_embed_dim=0,
        per_part_networks=True,
        activation=activation,
        # releases regress raw signed distance; no tanh bound
        bounded_output=False,
    )
    return {"part_encoder": enc, "part_decoder": dec}, cfg
