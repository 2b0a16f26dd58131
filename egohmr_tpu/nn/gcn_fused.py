"""Pallas TPU kernel: whole-network fused ModulatedGCN denoiser forward.

The DDIM/DDPM scan calls the 24-node GCN denoiser (reference
models/egohmr/modulated_gcn/modulated_gcn.py:60-116) 5-50 times per sampled
batch. The XLA path round-trips every [2B*24, 1024] activation through HBM
between its ~18 matmuls and interleaves them with VPU work (modulation,
adjacency mix, BN, relu). This kernel runs the ENTIRE denoiser (input mix ->
4 residual blocks -> output projection) for a chunk of batch rows without
touching HBM in between:

  grid = (N / block_b,)        one grid step == block_b batch rows
  resident weights: all 8 hidden-layer W pairs (bf16), folded modulations,
                    adjacencies and biases — constant index_map, fetched once
  activations: [24, block_b, H] NODE-MAJOR, entirely in VMEM/registers

Layout/folding choices that make it fast (learned from a measured failure —
the first version stored batch-major and mixed with einsum("jk,bkh->bjh"),
which Mosaic unrolls into block_b tiny [24,24]x[24,H] matmuls and ran 2.7x
SLOWER than XLA):

* node-major [24, block_b, H]: the weight matmul view [24*block_b, H] is a
  free reshape (block_b % 8 == 0 keeps tile boundaries aligned), and the
  adjacency mix collapses to ONE 2-D dot [24,24] @ [24, block_b*H].
* eval-BN folding: the per-channel scale multiplies the modulation M (both
  commute with the node mix), the shift absorbs the gconv bias — so a layer
  is exactly: 2 matmuls, 2 modulate multiplies, 1 mix dot, 1 diag FMA,
  1 shift add, relu.

Matmuls take bf16 inputs with f32 accumulation (same arithmetic class as the
XLA bf16 path); everything else stays f32. `mm_dtype=float32` switches the
matmuls to full f32 so tests can pin near-exactness against the XLA path.

Inference-only (no autodiff rule, eval-mode BN folded): used by
`models/egohmr.make_denoise_fn` — samplers never differentiate the denoiser
(collision guidance differentiates the SDF, not this network). Training
keeps the XLA `modulated_gcn_forward`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BN_EPS = 1e-5
_OUT_PAD = 128  # lane-dim padding for the [H, 6] output projection


def _kernel(n_hid: int, block_b: int, hidden: int, mm_dtype,
            h0_ref, h1_ref,            # [24, Bc, H] f32 input-layer halves
            w0_ref, w1_ref,            # [n_hid, H, H] mm_dtype
            wo0_ref, wo1_ref,          # [H, OUT_PAD] mm_dtype
            m0_ref,                    # [n_hid+1, 24, 1, H] f32 (M*scale*diag)
            m1_ref,                    # [n_hid + 1, 24, 1, H] f32 (M*scale)
            mo0_ref, mo1_ref,          # [24, 1, OUT_PAD] f32
            off_ref,                   # [n_hid + 2, 24, 24] f32  a*(1-eye)
            shift_ref,                 # [n_hid + 1, 1, 1, H] f32 folded
            shifto_ref,                # [1, OUT_PAD] f32 (plain output bias)
            out_ref):                  # [24, Bc, OUT_PAD] f32
    f32 = jnp.float32
    H = hidden
    J = 24

    def mix(i, g0, g1, m0, m1, shift, width):
        """Folded modulated adjacency mix (reference
        modulated_gcn_conv.py:38-50 with eval-BN scale/shift and the a*eye
        diagonal absorbed into the modulations): relu applied by the caller.
        g0/g1: [J, Bc, width] f32."""
        off = jax.lax.dot_general(                     # [J, Bc*width]
            off_ref[i], (g1 * m1).reshape(J, block_b * width),
            (((1,), (0,)), ((), ())), preferred_element_type=f32)
        return g0 * m0 + off.reshape(J, block_b, width) + shift

    def matmul_pair(x, w0, w1, width):
        x2 = x.reshape(J * block_b, H).astype(mm_dtype)
        g0 = jax.lax.dot_general(x2, w0, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        g1 = jax.lax.dot_general(x2, w1, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        return (g0.reshape(J, block_b, width), g1.reshape(J, block_b, width))

    # ---- input layer: h0/h1 precomputed outside (hoisted conditioning)
    x = jnp.maximum(
        mix(0, h0_ref[...], h1_ref[...], m0_ref[0], m1_ref[0],
            shift_ref[0], H), 0.0)

    # ---- 4 residual blocks x 2 graph convs, all VMEM-resident
    for blk in range(n_hid // 2):
        residual = x
        for c in range(2):
            i = blk * 2 + c            # hidden-layer index
            g0, g1 = matmul_pair(x, w0_ref[i], w1_ref[i], H)
            x = jnp.maximum(
                mix(i + 1, g0, g1, m0_ref[i + 1], m1_ref[i + 1],
                    shift_ref[i + 1], H), 0.0)
        x = residual + x

    # ---- output projection (H -> 6, lane-padded to OUT_PAD), no BN/relu
    g0, g1 = matmul_pair(x, wo0_ref[...], wo1_ref[...], _OUT_PAD)
    out_ref[...] = mix(n_hid + 1, g0, g1, mo0_ref[...], mo1_ref[...],
                       shifto_ref[0], _OUT_PAD)


def _sym_adj(adj: Array, adj2: Array) -> Array:
    a = adj.astype(jnp.float32) + adj2.astype(jnp.float32)
    return (a.T + a) / 2


@functools.partial(jax.jit, static_argnames=("block_b", "mm_dtype"))
def modulated_gcn_fused(params: dict, adj: Array, h0: Array, h1: Array, *,
                        block_b: int = 16, mm_dtype=jnp.bfloat16) -> Array:
    """Fused eval-mode forward given precomputed input-layer halves.

    Drop-in for `modulated_gcn_forward(params, adj, None, train=False,
    input_h=(h0, h1))[0]` (h0/h1: [N, 24, H]). Requires the production
    topology: paired gconv1/gconv2 layers, no non-local block (callers fall
    back to the XLA path otherwise). `block_b` must be a multiple of 8 (tile
    alignment makes the in-kernel [24, Bc, H] <-> [24*Bc, H] views free).
    """
    assert "non_local" not in params, "fused path: no non-local block"
    assert block_b % 8 == 0, "block_b must be a multiple of 8"
    N, J, H = h0.shape
    hid = params["gconv_layers"]
    n_hid = 2 * len(hid)
    convs = [params["gconv_input"]] + [
        blk[k] for blk in hid for k in ("gconv1", "gconv2")]

    f32 = jnp.float32
    gp = [c["gconv"] for c in convs]
    out_p = params["gconv_output"]
    a_all = [_sym_adj(adj, p["adj2"]) for p in gp]
    a_all.append(_sym_adj(adj, out_p["adj2"]))
    eye = jnp.eye(J, dtype=f32)
    diag = [jnp.diagonal(a) for a in a_all]                     # each [24]
    off = jnp.stack([a * (1 - eye) for a in a_all])             # [n+2, 24, 24]

    # eval-BN fold (nn/core.batchnorm eval path): the per-channel scale and
    # the a*eye diagonal both commute with the node mix, so they join the
    # modulation; the shift absorbs the gconv bias.
    def fold(conv, d):
        g, b = conv["gconv"], conv["bn"]
        inv = jax.lax.rsqrt(b["var"].astype(f32) + _BN_EPS) * b["scale"]
        m1 = g["M"].astype(f32) * inv[None]                     # [24, H]
        m0 = m1 * d[:, None]
        shift = (b["bias"] - b["mean"] * inv
                 + inv * g["bias"].astype(f32))[None, None]     # [1, 1, H]
        return m0[:, None], m1[:, None], shift                  # [24, 1, H]

    folded = [fold(c, d) for c, d in zip(convs, diag)]
    m0 = jnp.stack([f[0] for f in folded])                # [n+1, 24, 1, H]
    m1 = jnp.stack([f[1] for f in folded])
    shift = jnp.stack([f[2] for f in folded])             # [n+1, 1, 1, H]
    w0 = jnp.stack([p["W"][0] for p in gp[1:]]).astype(mm_dtype)
    w1 = jnp.stack([p["W"][1] for p in gp[1:]]).astype(mm_dtype)

    out_dim = out_p["W"].shape[-1]
    pad_o = _OUT_PAD - out_dim
    wo = jnp.pad(out_p["W"].astype(mm_dtype), ((0, 0), (0, 0), (0, pad_o)))
    mo1 = jnp.pad(out_p["M"].astype(f32), ((0, 0), (0, pad_o)))[:, None]
    mo0 = mo1 * diag[-1][:, None, None]
    shifto = jnp.pad(out_p["bias"].astype(f32), (0, pad_o))[None]

    pad_n = (-N) % block_b
    # node-major inputs: [N, 24, H] -> [24, N, H] (one XLA transpose outside
    # the kernel; inside, every view the kernel needs is layout-free)
    h0t = jnp.pad(h0.astype(f32), ((0, pad_n), (0, 0), (0, 0))).transpose(1, 0, 2)
    h1t = jnp.pad(h1.astype(f32), ((0, pad_n), (0, 0), (0, 0))).transpose(1, 0, 2)
    n_steps = h0t.shape[1] // block_b

    cst = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((J, block_b, H), lambda b: (0, b, 0),
                       memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, n_hid, block_b, H, mm_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            blk, blk,
            cst(n_hid, H, H), cst(n_hid, H, H),
            cst(H, _OUT_PAD), cst(H, _OUT_PAD),
            cst(n_hid + 1, J, 1, H), cst(n_hid + 1, J, 1, H),
            cst(J, 1, _OUT_PAD), cst(J, 1, _OUT_PAD),
            cst(n_hid + 2, J, J),
            cst(n_hid + 1, 1, 1, H), cst(1, _OUT_PAD),
        ],
        out_specs=pl.BlockSpec((J, block_b, _OUT_PAD), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (J, n_steps * block_b, _OUT_PAD), f32),
        # resident weights (2 x 16 MB bf16 at H=1024) + the streamed
        # activation windows exceed the 16 MB default scoped-VMEM budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(h0t, h1t, w0, w1, wo[0], wo[1], m0, m1, mo0, mo1, off, shift, shifto)
    return out.transpose(1, 0, 2)[:N, :, :out_dim]
