"""Bounded experiment: is int8 worth it for the fused PointNet kernel?

The fused scene encoder (nn/pointnet_fused.py) runs 13.85 ms at B=64 —
~88% of the v5e's 197 TFLOP/s bf16 MXU peak. The v5e's int8 MXU peak is
394 TOPS (2x), so quantizing the kernel's matmuls is the one remaining
lever that moves the roofline itself rather than chasing the last 12%.
The open questions this probe answers BEFORE any kernel rewrite:

  A) bf16 rate   — chained [2048,256]x[256,256] bf16 dots in one Pallas
                   kernel: the harness's reproduction of the known rate
                   (sanity: ~1.36 us/matmul at peak).
  B) int8 rate   — same shape, pre-quantized int8 operands, int32
                   accumulation: does Mosaic hit ~2x (0.68 us/matmul)?
  C) int8+glue   — per-iteration per-row dynamic quantization of the f32
                   activation (max-abs -> scale -> round -> int8), int8
                   dot, f32 dequant (row scale x column scale): the
                   realistic per-matmul cost inside a quantized PointNet
                   stage. If C >= A the quant glue eats the MXU win on
                   the VPU and the kernel rewrite is a NO-GO (unless
                   Mosaic overlaps VPU and MXU, which this measures).

Timing per MEASUREMENT RULES (CLAUDE.md): the rep loop lives INSIDE the
kernel with a data dependence between iterations (operand perturbed by
the loop index; accumulator carried), rep count R is a runtime SMEM
scalar so each variant compiles ONCE, completion forced by downloading a
scalar, and the reported per-matmul time is the two-point chain
difference (t(R2)-t(R1)) / (G*(R2-R1)), min over reps. FLOP roofline:
2*2048*256*256 = 268.4 MFLOP/matmul -> 1.36 us bf16 / 0.68 us int8 at
peak; any faster reading is a lie.

Result — go or no-go — goes to BASELINE.md round-5.
"""
import argparse
import functools
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

M, K, N = 2048, 256, 256
FLOP = 2 * M * K * N


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=32)
    ap.add_argument("--r1", type=int, default=32)
    ap.add_argument("--r2", type=int, default=160)
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--cpu", action="store_true",
                    help="interpret-mode smoke (no timing validity)")
    ap.add_argument("--variants", type=str, default="",
                    help="comma list of variant names (prefix ok); all if empty")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = bool(args.cpu)
    G = args.grid

    def dot(a, b, acc_t):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_t)

    # ---- A: bf16 chained dots -------------------------------------------
    def k_bf16(r_ref, x_ref, w_ref, out_ref):
        x = x_ref[...]

        def body(i, acc):
            # perturb the operand with the loop index: a 1-op VPU add that
            # defeats loop-invariant hoisting and chains the iterations
            xi = x + (i % 2).astype(jnp.bfloat16)
            return acc + dot(xi, w_ref[...], jnp.float32)

        acc = jax.lax.fori_loop(0, r_ref[0], body,
                                jnp.zeros((M, N), jnp.float32))
        out_ref[0] = jnp.max(acc, axis=0, keepdims=True)

    # ---- A1: bf16 chained dots, NO perturbation (B1's exact control) ----
    def k_bf16_bare(r_ref, x_ref, w_ref, out_ref):
        x = x_ref[...]

        def body(i, acc):
            return acc + dot(x, w_ref[...], jnp.float32)

        acc = jax.lax.fori_loop(0, r_ref[0], body,
                                jnp.zeros((M, N), jnp.float32))
        out_ref[0] = jnp.max(acc, axis=0, keepdims=True)

    # ---- B: int8 chained dots (pre-quantized operands) ------------------
    def k_int8(r_ref, x_ref, w_ref, out_ref):
        x = x_ref[...]

        def body(i, acc):
            xi = (x + (i % 2).astype(jnp.int8)).astype(jnp.int8)
            return acc + dot(xi, w_ref[...], jnp.int32)

        acc = jax.lax.fori_loop(0, r_ref[0], body,
                                jnp.zeros((M, N), jnp.int32))
        out_ref[0] = jnp.max(acc, axis=0, keepdims=True)

    # ---- B1: int8 dots, NO per-iteration perturbation -------------------
    # isolates the first TPU run's Mosaic crash: is the int8 dot itself the
    # problem, or the int8 scalar-broadcast add in B's loop body? (hoisting
    # risk is acceptable here: a ~0 reading just means "hoisted", and B2
    # below is the hoist-proof rate measurement)
    def k_int8_bare(r_ref, x_ref, w_ref, out_ref):
        x = x_ref[...]

        def body(i, acc):
            return acc + dot(x, w_ref[...], jnp.int32)

        acc = jax.lax.fori_loop(0, r_ref[0], body,
                                jnp.zeros((M, N), jnp.int32))
        out_ref[0] = jnp.max(acc, axis=0, keepdims=True)

    # ---- B2: int8 dots, hoist-proof via dynamic-slice operand ping-pong --
    # x_ref is [2*M, K]; each iteration loads the half selected by i%2 —
    # zero VPU cost in the loop body, genuinely different operand per step
    def k_int8_slice(r_ref, x_ref, w_ref, out_ref):
        def body(i, acc):
            off = (i % 2) * M
            xi = x_ref[pl.ds(off, M), :]
            return acc + dot(xi, w_ref[...], jnp.int32)

        acc = jax.lax.fori_loop(0, r_ref[0], body,
                                jnp.zeros((M, N), jnp.int32))
        out_ref[0] = jnp.max(acc, axis=0, keepdims=True)

    # ---- C: f32 activation -> per-row quant -> int8 dot -> dequant ------
    def k_int8_glue(r_ref, x_ref, w_ref, sw_ref, out_ref):
        x0 = x_ref[...]
        wq = w_ref[...]
        sw = sw_ref[...]                                   # [1, N] f32

        def body(i, x):
            s = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
            s = jnp.maximum(s, 1e-8)                       # [M, 1]
            xq = jnp.round(x / s).astype(jnp.int8)
            acc = dot(xq, wq, jnp.int32)
            deq = acc.astype(jnp.float32) * s * sw         # [M, N]
            # feed the (rescaled, clipped) result back as the next
            # iteration's operand: a REAL data dependence the compiler
            # cannot hoist (the first TPU run's `x + deq*1e-12` feedback
            # produced an R-independent time — hoisted or folded), with
            # magnitudes kept in a stable range for the quantizer
            return jnp.clip(deq * 0.0625, -2.0, 2.0)

        x = jax.lax.fori_loop(0, r_ref[0], body, x0)
        out_ref[0] = jnp.max(x, axis=0, keepdims=True)

    full = lambda shape, ms=pltpu.VMEM: pl.BlockSpec(
        shape, lambda g: (0,) * len(shape), memory_space=ms)

    def build(kernel, x, w, extra=()):
        out = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [full(a.shape) for a in (x, w, *extra)],
            out_specs=pl.BlockSpec((1, 1, N), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, 1, N), out_dtype(kernel)),
            interpret=interpret,
        )
        return jax.jit(lambda r, *ops: out(r, *ops))

    def out_dtype(kernel):
        return (jnp.int32 if kernel in (k_int8, k_int8_bare, k_int8_slice)
                else jnp.float32)

    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    xf = jax.random.normal(kx, (M, K), jnp.float32)
    wf = jax.random.normal(kw, (K, N), jnp.float32)
    xq = jnp.round(jnp.clip(xf * 30, -127, 127)).astype(jnp.int8)
    wq = jnp.round(jnp.clip(wf * 30, -127, 127)).astype(jnp.int8)
    sw = (jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0)

    xq2 = jnp.concatenate([xq, jnp.flip(xq, axis=0)], axis=0)  # [2M, K]
    fns = {
        "A_bf16": (build(k_bf16, xf, wf),
                   (xf.astype(jnp.bfloat16), wf.astype(jnp.bfloat16))),
        "A1_bf16_bare": (build(k_bf16_bare, xf, wf),
                         (xf.astype(jnp.bfloat16), wf.astype(jnp.bfloat16))),
        "B_int8": (build(k_int8, xq, wq), (xq, wq)),
        "B1_int8_bare": (build(k_int8_bare, xq, wq), (xq, wq)),
        "B2_int8_slice": (build(k_int8_slice, xq2, wq), (xq2, wq)),
        "C_int8_glue": (build(k_int8_glue, xf, wf, (sw,)), (xf, wq, sw)),
    }
    if args.variants:
        want = set(args.variants.split(","))
        fns = {k: v for k, v in fns.items()
               if k in want or k.split("_")[0] in want}

    def run(fn, ops, r):
        t0 = time.time()
        res = fn(jnp.full((1,), r, jnp.int32), *ops)
        _ = float(jnp.max(jnp.abs(res.astype(jnp.float32))))  # fence
        return time.time() - t0

    results = {}
    for name, (fn, ops) in fns.items():
        try:
            run(fn, ops, 2)  # compile + smoke
        except Exception as e:  # noqa: BLE001 — a NO-GO is a result here
            results[name] = {"error": f"{type(e).__name__}: {e}"[:400]}
            print(name, "FAILED:", results[name]["error"])
            continue
        # MEASUREMENT: min PER CHAIN LENGTH, then difference (the probe_gcn
        # lesson — min over paired differences selects anti-correlated
        # tunnel noise; this probe's first TPU run read 0.03 us/matmul for
        # variant C that way, a physically impossible 45x bf16 peak).
        # Interleave the two chain lengths so drift hits both equally.
        t1s, t2s = [], []
        for _ in range(args.reps):
            t1s.append(run(fn, ops, args.r1))
            t2s.append(run(fn, ops, args.r2))
        t1, t2 = min(t1s), min(t2s)
        per = (t2 - t1) / (G * (args.r2 - args.r1))
        us = per * 1e6
        results[name] = {
            "us_per_matmul": round(us, 3),
            "tflops": round(FLOP / per / 1e12, 1),
            "pct_bf16_peak": round(100 * FLOP / per / 197e12, 1),
            "t_r1_ms": round(t1 * 1e3, 2),
            "t_r2_ms": round(t2 * 1e3, 2),
        }
        print(name, json.dumps(results[name]))

    if "us_per_matmul" in results.get("A_bf16", {}) and \
       "us_per_matmul" in results.get("B_int8", {}):
        results["int8_speedup_pure"] = round(
            results["A_bf16"]["us_per_matmul"]
            / results["B_int8"]["us_per_matmul"], 2)
    if "us_per_matmul" in results.get("A_bf16", {}) and \
       "us_per_matmul" in results.get("C_int8_glue", {}):
        results["int8_speedup_with_glue"] = round(
            results["A_bf16"]["us_per_matmul"]
            / results["C_int8_glue"]["us_per_matmul"], 2)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
