"""Bounded round-4 experiment: can XLA's TPU knobs close the ResNet gap?

Round-3 roofline: the bf16 ResNet-50 forward measures 4.83 ms at B=64 vs a
~3.5 ms HBM-traffic floor — the largest unclaimed headline gap after the
GCN kernel and s2d stem measured as negatives. This probe times the
ISOLATED resnet_forward (folded-BN eval, bf16, B=64) under different
`--xla_tpu_scoped_vmem_limit_kib` settings: scoped VMEM bounds how much
operand-prefetch/fusion working set XLA's TPU scheduler may use, so a
larger budget can deepen conv pipelining (the v5e has 128 MB physical
VMEM; the default budget is a small fraction).

XLA flags bind at backend init, so each setting runs in a FRESH
subprocess via XLA_FLAGS. Timing uses the chained-dispatch + scalar-
download fence (CLAUDE.md measurement rules). Result — win or lose — goes
to BASELINE.md round-4.

Usage: python tools/probe_resnet_flags.py            # orchestrator
       python tools/probe_resnet_flags.py --worker   # one measurement
"""
import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def worker(batch: int) -> None:
    import jax
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
        jax.random.PRNGKey(1), (batch, 224, 224, 3), jnp.bfloat16)

    @jax.jit
    def fwd(params, img, s):
        # data-dependent input per rep (s) so the chain cannot collapse;
        # resnet_forward returns (feats, new_params) — time the feats path
        return resnet_forward(params, img + s)[0]

    def chain(n, k0):
        t0 = time.time()
        out = None
        for i in range(n):
            out = fwd(params, img, jnp.bfloat16(k0 + i))
        float(jnp.sum(out))  # completion fence (download)
        return time.time() - t0

    t0 = time.time()
    chain(1, 0)
    compile_s = time.time() - t0
    n1, n2 = 10, 30
    d1 = min(chain(n1, 100), chain(n1, 200))
    d2 = min(chain(n2, 300), chain(n2, 400))
    ms = (d2 - d1) / (n2 - n1) * 1e3
    print(json.dumps({"ms": round(ms, 3), "compile_s": round(compile_s, 1),
                      "device": str(jax.devices()[0])}))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--vmem-kib", type=str, default="default,32768,65536,98304")
    args = ap.parse_args(argv)
    if args.worker:
        return worker(args.batch)

    results = {}
    for v in args.vmem_kib.split(","):
        env = dict(os.environ)
        label = v
        if v != "default":
            extra = f"--xla_tpu_scoped_vmem_limit_kib={v}"
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + extra).strip()
        print(f"# probing scoped_vmem={label} ...", file=sys.stderr)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--batch", str(args.batch)],
            env=env, capture_output=True, text=True, timeout=3600)
        line = (p.stdout.strip().splitlines() or [""])[-1]
        try:
            results[label] = json.loads(line)
        except ValueError:
            results[label] = {"error": (p.stderr.strip().splitlines() or
                                        ["no output"])[-1][:300]}
        print(f"#   -> {results[label]}", file=sys.stderr)
    print(json.dumps({"metric": "resnet50_bf16_fwd_ms_by_scoped_vmem",
                      "batch": args.batch, "results": results}))


if __name__ == "__main__":
    main()
