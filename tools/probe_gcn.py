"""Bounded round-5 experiment: a SECOND attack on the DDIM-5 GCN scan gap.

Round-3 measured the in-scan denoiser at ~0.76 ms/call (5-step scan 3.81 ms,
B=64 fuse-doubled to 128) against a "~1.5 ms scan" MXU floor, and a
whole-denoiser Pallas kernel LOST to XLA (0.93-0.98 vs 0.58-0.85 ms/call —
BASELINE.md "GCN denoiser kernel: a measured negative result"). This probe
attacks the remaining gap at the XLA level instead (round-4 verdict Next #4):

  full      — the exact in-scan program (modulated_gcn_forward with hoisted
              input projections), the number to beat;
  skeleton  — the 16 hidden [B*24,1024]x[1024,1024] matmuls + relu alone:
              what XLA achieves with zero graph glue (adjacency mixes,
              modulation, eval-BN). full-skeleton = the price of the glue;
  wcat      — same math as `full` but each gconv's two weight matmuls
              (x@W[0], x@W[1]) issued as ONE concatenated [1024,2048]
              matmul, halving the matmul count. Bit-identical outputs;
  wcat_skel — the concat-shape skeleton (8 matmuls), floor for `wcat`.

Timing: MEASUREMENT RULES (CLAUDE.md) — one jitted lax.fori_loop chain with
a data dependence, scalar-download completion fence, chain-length
differencing (t(N2)-t(N1))/(N2-N1), min over reps. FLOP roofline sanity:
16 x 2*3072*1024*1024 = 103 GFLOP/call -> >=0.52 ms at the v5e's 197
TFLOP/s bf16 peak; any smaller reading is a lie.

Result — win or lose — goes to BASELINE.md round-5.
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
    ap.add_argument("--batch", type=int, default=128,
                    help="fuse-doubled batch (headline B=64 cond/uncond)")
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument("--n1", type=int, default=10)
    ap.add_argument("--n2", type=int, default=60)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from egohmr_tpu.models import EgoHMRConfig, init_egohmr
    from egohmr_tpu.models.egohmr import _ADJ
    from egohmr_tpu.nn.core import batchnorm, cast_params_bf16, relu
    from egohmr_tpu.nn.gcn import modulated_gcn_forward, modulated_gconv_mix

    cfg = EgoHMRConfig()
    gcn = cast_params_bf16(
        init_egohmr(jax.random.PRNGKey(0), cfg))["diffusion_model"]
    B, J, H = args.batch, 24, cfg.gcn_hid_dim
    h0 = jax.random.normal(jax.random.PRNGKey(1), (B, J, H), jnp.bfloat16)
    h1 = jax.random.normal(jax.random.PRNGKey(2), (B, J, H), jnp.bfloat16)

    # ---- variants -------------------------------------------------------
    def fwd_full(p, a, b):
        out, _ = modulated_gcn_forward(p, _ADJ, None, train=False,
                                       input_h=(a, b))
        return out

    def fwd_skeleton(p, a, b):
        # hidden-layer matmul traffic only: same 16 [B*24,H]x[H,H] matmuls
        # (+ output), no adjacency/modulation/BN. NOT the same math — a
        # floor probe. The input-layer mix is approximated by an add.
        out = relu(a + b)
        for blk in p["gconv_layers"]:
            res = out
            for gc in (blk["gconv1"], blk["gconv2"]):
                W = gc["gconv"]["W"]
                out = relu(out @ W[0] + out @ W[1])
            out = res + out
        Wo = p["gconv_output"]["W"]
        return out @ Wo[0] + out @ Wo[1]

    def _wcat(p):
        # pre-concat every gconv's W pair: [in,H]|[in,H] -> [in,2H]
        def cat(gc):
            gc = dict(gc)
            gc["Wcat"] = jnp.concatenate([gc["W"][0], gc["W"][1]], axis=-1)
            return gc
        q = dict(p)
        q["gconv_layers"] = [
            {k: {"gconv": cat(blk[k]["gconv"]), "bn": blk[k]["bn"]}
             for k in ("gconv1", "gconv2")} for blk in p["gconv_layers"]]
        q["gconv_output"] = cat(p["gconv_output"])
        return q

    def _gconv_wcat(gc, x):
        h = x @ gc["Wcat"]
        d = gc["W"].shape[-1]
        return modulated_gconv_mix(gc, _ADJ, h[..., :d], h[..., d:])

    def fwd_wcat(p, a, b):
        # bit-identical math to fwd_full; only the matmul ISSUE differs
        gi = p["gconv_input"]
        out = modulated_gconv_mix(gi["gconv"], _ADJ, a, b)
        out, _ = batchnorm(gi["bn"], out, train=False, reduce_axes=(0, 1))
        out = relu(out)
        for blk in p["gconv_layers"]:
            res = out
            for k in ("gconv1", "gconv2"):
                out = _gconv_wcat(blk[k]["gconv"], out)
                out, _ = batchnorm(blk[k]["bn"], out, train=False,
                                   reduce_axes=(0, 1))
                out = relu(out)
            out = res + out
        return _gconv_wcat(p["gconv_output"], out)

    def fwd_wcat_skel(p, a, b):
        out = relu(a + b)
        for blk in p["gconv_layers"]:
            res = out
            for k in ("gconv1", "gconv2"):
                h = out @ blk[k]["gconv"]["Wcat"]
                d = h.shape[-1] // 2
                out = relu(h[..., :d] + h[..., d:])
            out = res + out
        h = out @ p["gconv_output"]["Wcat"]
        d = h.shape[-1] // 2
        return h[..., :d] + h[..., d:]

    gcn_cat = _wcat(gcn)

    # ---- parity gate: wcat must reproduce full (same math; MXU tiling of
    # the [H,2H] dot may round bf16 differently, so allclose not bitwise)
    import numpy as np
    o_full = np.asarray(jax.jit(fwd_full)(gcn, h0, h1), np.float32)
    o_wcat = np.asarray(jax.jit(fwd_wcat)(gcn_cat, h0, h1), np.float32)
    md = float(np.abs(o_full - o_wcat).max())
    np.testing.assert_allclose(o_wcat, o_full, rtol=2e-2, atol=2e-2)
    print(f"# parity: wcat == full (max abs diff {md:.2e})", file=sys.stderr)

    # ---- timing ---------------------------------------------------------
    def time_variant(name, fn, p):
        @jax.jit
        def chain(p, a, b, n):
            def body(i, carry):
                o = fn(p, a + carry, b + carry)
                return (jnp.sum(o) * jnp.bfloat16(1e-12)).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0.0))

        t0 = time.time()
        float(chain(p, h0, h1, args.n1))
        compile_s = time.time() - t0

        def t(n):
            t0 = time.time()
            float(chain(p, h0, h1, n))
            return time.time() - t0

        # min of EACH chain length separately, then difference — a min over
        # per-pair differences selects anti-correlated tunnel-noise pairs
        # (first run of this probe read a NEGATIVE ms/call that way)
        d1 = min(t(args.n1) for _ in range(args.reps))
        d2 = min(t(args.n2) for _ in range(args.reps))
        ms = (d2 - d1) / (args.n2 - args.n1) * 1e3
        print(f"# {name}: {ms:.3f} ms/call (compile {compile_s:.1f}s)",
              file=sys.stderr)
        return ms

    results = {
        "full": time_variant("full", fwd_full, gcn),
        "skeleton": time_variant("skeleton", fwd_skeleton, gcn),
        "wcat": time_variant("wcat", fwd_wcat, gcn_cat),
        "wcat_skel": time_variant("wcat_skel", fwd_wcat_skel, gcn_cat),
    }
    print(json.dumps({
        "metric": "gcn_denoiser_ms_per_call_by_variant",
        "batch_fused": B, "results": {k: round(v, 3)
                                      for k, v in results.items()},
        "roofline_ms": 0.52,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
