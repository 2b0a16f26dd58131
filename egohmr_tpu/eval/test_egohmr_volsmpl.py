"""Stage-2 EgoHMR evaluation CLI, VolumetricSMPL-guided variant.

Equivalent of reference test_egohmr_volsmpl.py:1-703, which is
test_egohmr.py verbatim except: the model is EgoHMRVolsmpl (learned
volumetric SDF instead of COAP occupancy, egohmr_volsmpl.py:134-135),
guidance uses `with_volsmpl_grad` with cond_grad_weight=30, and the
collision metric is `eval_coll_volsmpl`.

Here the same split is expressed as flag DEFAULTS over the shared stage-2
eval driver: the volsdf collision backend (the VolumetricSMPL-family
learned signed-distance net, collision/neural_sdf.py) with the reference's
cond_grad_weight=30, plus the repo's shipped distilled artifact when no
--sdfnet_ckpt is given (a converted VolumetricSMPL release .ckpt also
works — interop/volsmpl_convert.py). Every test_egohmr flag is accepted
and can still override the variant defaults, exactly like the reference
pair of scripts.

Usage:
  python -m egohmr_tpu.eval.test_egohmr_volsmpl --synthetic --num_samples 5
"""
from __future__ import annotations

import os

from .test_egohmr import main as _main
from .test_egohmr import parse_args as _parse_args

_SHIPPED_SDFNET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    "artifacts", "volsdf_synthetic.npz")


def _variant_defaults():
    d = dict(collision_backend="volsdf", cond_grad_weight=30.0)
    if os.path.exists(_SHIPPED_SDFNET):
        d["sdfnet_ckpt"] = _SHIPPED_SDFNET
    return d


def parse_args(argv=None):
    return _parse_args(argv, **_variant_defaults())


def main(argv=None):
    return _main(argv, **_variant_defaults())


if __name__ == "__main__":
    main()
