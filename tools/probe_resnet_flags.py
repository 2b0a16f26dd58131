"""Bounded experiment: can XLA's TPU knobs close the ResNet gap?

Round-3 roofline: the bf16 ResNet-50 forward measures 4.83 ms at B=64 vs a
~3.5 ms HBM-traffic floor — the largest unclaimed headline gap after the
GCN kernel and s2d stem measured as negatives. This probe times the
ISOLATED resnet_forward (folded-BN eval, bf16, B=64) under different
`xla_tpu_scoped_vmem_limit_kib` settings: scoped VMEM bounds how much
operand-prefetch/fusion working set XLA's TPU scheduler may use, so a
larger budget can deepen conv pipelining (the v5e has 128 MB physical
VMEM; the default budget is a small fraction).

ROUND-5 MEASURED CONSTRAINT: the first draft set the flag via XLA_FLAGS in
a subprocess — FATAL "Unknown flag in XLA_FLAGS" under axon, because the
env is parsed by the CLIENT-side (CPU) XLA binary, which does not register
TPU backend flags; compilation happens on the REMOTE compiler. TPU knobs
must therefore ride the compile request itself:
`jit(f).lower(...).compile(compiler_options={...})` (this file), which the
PJRT client forwards. If the remote compiler rejects the option too, that
is recorded per-setting as the negative result.

Timing uses the chained-dispatch + scalar-download fence (CLAUDE.md
measurement rules). Result — win or lose — goes to BASELINE.md.

Usage: python tools/probe_resnet_flags.py
"""
import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--vmem-kib", type=str,
                    default="default,32768,65536,98304")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from egohmr_tpu.models import EgoHMRConfig, init_egohmr
    from egohmr_tpu.nn import resnet_forward
    from egohmr_tpu.nn.core import cast_params_bf16

    cfg = EgoHMRConfig()
    params = cast_params_bf16(
        init_egohmr(jax.random.PRNGKey(0), cfg))["backbone"]
    img = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, 224, 224, 3), jnp.bfloat16)

    def fwd(params, img, s):
        # data-dependent input per rep (s) so the chain cannot collapse;
        # resnet_forward returns (feats, new_params) — time the feats path
        return resnet_forward(params, img + s)[0]

    def measure(label):
        opts = (None if label == "default"
                else {"xla_tpu_scoped_vmem_limit_kib": label})
        t0 = time.time()
        try:
            lowered = jax.jit(fwd).lower(params, img, jnp.bfloat16(0.0))
            compiled = lowered.compile(compiler_options=opts)
        except Exception as e:  # remote compiler may reject the option
            return {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        compile_s = time.time() - t0

        def chain(n, k0):
            t0 = time.time()
            out = None
            for i in range(n):
                out = compiled(params, img, jnp.bfloat16(k0 + i))
            float(jnp.sum(out))  # completion fence (download)
            return time.time() - t0

        chain(1, 0)  # first dispatch (device warmup)
        n1, n2 = 10, 30
        d1 = min(chain(n1, 100), chain(n1, 200))
        d2 = min(chain(n2, 300), chain(n2, 400))
        ms = (d2 - d1) / (n2 - n1) * 1e3
        return {"ms": round(ms, 3), "compile_s": round(compile_s, 1)}

    results = {}
    for v in args.vmem_kib.split(","):
        print(f"# probing scoped_vmem={v} ...", file=sys.stderr)
        results[v] = measure(v)
        print(f"#   -> {results[v]}", file=sys.stderr)
    print(json.dumps({"metric": "resnet50_bf16_fwd_ms_by_scoped_vmem",
                      "batch": args.batch, "results": results,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
