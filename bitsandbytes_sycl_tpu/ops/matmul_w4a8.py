"""W4A8 fused matmul: 4-bit weights x int8 activations on the int8 MXU.

LiquidGEMM-style (arxiv 2509.01229, PAPERS.md) alternative to the bf16
decode path in matmul_4bit.py, motivated by two v5e facts:

- the NF4 select-tree decode is the bottleneck of the bf16 path (VPU-
  bound at ~23 ops/elem on 16-bit lanes). Decoding the nibble to an INT8
  code (the 16-entry table pre-scaled by 127) runs the same tree on
  8-bit lanes — 4x VPU packing, probe-verified to lower in Mosaic
  (tools/experiments/, 2026-08-17);
- the int8 MXU runs at 2x the bf16 rate (394 vs 197 TOPS), which pays
  for the per-quantization-block sub-dots that the blockwise scales
  force (each 64-K sub-dot accumulates int32, then one f32
  multiply-accumulate applies scale_block * row_scale).

Numerics: activations are quantized int8 per ROW (vectorwise absmax,
like LLM.int8's CA) and weight codes round to the int8 grid
(round(v*127)/127, <=0.4% rel) — this is a DIFFERENT accuracy point
than matmul_4bit_fused (which is exact given the stored codes), in
exchange for speed; same trade the reference's int8 paths make for
activations. Use it where LLM.int8-class activation noise is already
accepted.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import QLinearWeight, interpret_mode, pick_tile as _pick_tile, safe_inv

__all__ = [
    "matmul_4bit_w4a8", "matmul_4bit_w8a8_prefill", "dequantize_to_int8",
    "matmul_4bit_w4a8_grouped",
]


def _int8_code_table(code) -> tuple:
    return tuple(int(round(float(v) * 127.0)) for v in code)


def _decode_plane_i8(b: jax.Array, table_i8, shift: int) -> jax.Array:
    """Nibble at bits [shift, shift+4) -> int8 code, 4-level select tree
    on 8-bit lanes (4x VPU packing vs the bf16 tree)."""
    zero = jnp.asarray(0, b.dtype)
    bits = [(b & jnp.asarray(1 << (shift + k), b.dtype)) != zero for k in range(4)]
    vals = [jnp.asarray(v, jnp.int8) for v in table_i8]

    def level(vs, bi):
        if len(vs) == 1:
            return vs[0]
        half = len(vs) // 2
        return jnp.where(bits[bi], level(vs[half:], bi - 1), level(vs[:half], bi - 1))

    return level(vals, 3)


def _w4a8_kernel(
    x_hi_ref, x_lo_ref, w_ref, s_ref, bias_ref, o_ref, acc_ref,
    *, table_i8, blocksize, nk, out_dtype, has_bias,
):
    """Activations arrive PRE-quantized int8 (one pass outside the kernel
    already computed the row absmax, so quantizing there is free and cuts
    the x DMA 4x vs shipping f32 and re-quantizing per (n, k, plane))."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = w_ref[:]  # (TKB, TN) packed bytes, uint8
    w_hi = _decode_plane_i8(b, table_i8, shift=4)  # int8 codes
    w_lo = _decode_plane_i8(b, table_i8, shift=0)

    nb = w_ref.shape[0] // blocksize
    for plane, (x_ref, wq) in enumerate(((x_hi_ref, w_hi), (x_lo_ref, w_lo))):
        xq = x_ref[:]
        for blk in range(nb):
            d = jax.lax.dot_general(
                xq[:, blk * blocksize : (blk + 1) * blocksize],
                wq[blk * blocksize : (blk + 1) * blocksize, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # fold this block's weight scale (1/127 for the code grid is
            # folded into the epilogue's 1/127^2 with the row scale)
            acc_ref[:] += d.astype(jnp.float32) * s_ref[plane, blk, :][None, :]

    @pl.when(k == nk - 1)
    def _():
        out = acc_ref[:]
        if has_bias:
            out = out + bias_ref[:].astype(jnp.float32)
        o_ref[:] = out.astype(out_dtype)


@partial(jax.jit, static_argnames=("out_dtype", "tm", "tn", "tkb"))
def _w4a8_call(x, row_absmax, w: QLinearWeight, bias, out_dtype, tm, tn, tkb):
    M, K = x.shape
    N = w.shape[0]
    nk = (K // 2) // tkb
    bs = w.blocksize
    # quantize activations int8 ONCE (XLA fuses with the absmax pass);
    # the two 1/127 grid factors (codes, activations) and the per-row
    # absmax_x fold into s (per block) and the output scale (per row)
    xq = jnp.clip(
        jnp.round(x * (127.0 * safe_inv(row_absmax)).reshape(M, 1)), -127.0, 127.0
    ).astype(jnp.int8)
    s = w.scales_f32() * (1.0 / 127.0)

    kernel = functools.partial(
        _w4a8_kernel,
        table_i8=_int8_code_table(w.code),
        blocksize=bs,
        nk=nk,
        out_dtype=jnp.float32,
        has_bias=False,
    )
    bias_arr = jnp.zeros((1, N), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(M // tm, N // tn, nk),
        in_specs=[
            pl.BlockSpec((tm, tkb), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tm, tkb), lambda m, n, k, _half=nk: (m, k + _half), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tkb, tn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tkb // bs, tn), lambda m, n, k: (0, k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + N * K // 2 + (N * K // bs) * 4 + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(xq, xq, w.packed, s, bias_arr)
    # per-row activation scale (absmax_x / 127): applied once outside
    out = out * (row_absmax.reshape(M, 1) / 127.0)
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def matmul_4bit_w4a8(
    x: jax.Array,
    w: QLinearWeight,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """out ~= x @ dequant(W)^T with int8 activations and int8 weight codes
    on the int8 MXU. Raw (f32/bf16) scales only; returns None-equivalent
    fallback (the exact bf16 path) for untileable shapes or compressed
    scales.

    Differentiable in x and bias: the backward is the EXACT dequant path
    (grad_x = g @ dequant(W), like matmul_4bit_fused's vjp and the
    reference MatMul4Bit backward, autograd/_functions.py:520-540) — the
    activation-quantization noise is a forward-only inference trade and
    straight-through w.r.t. x, so a QLoRA step with a8_decode=True trains
    against clean gradients."""
    return _w4a8_impl(x, w, bias, out_dtype)


def _w4a8_fwd(x, w, bias, out_dtype):
    return _w4a8_impl(x, w, bias, out_dtype), (x, w, bias)


def _w4a8_bwd(out_dtype, res, g):
    x, w, bias = res
    gf = g.astype(jnp.float32)
    Wd = w.dequantize().astype(jnp.float32)
    grad_x = jnp.matmul(gf, Wd, preferred_element_type=jnp.float32).astype(x.dtype)
    zero_w = jax.tree.map(
        lambda a: (
            jnp.zeros_like(a)
            if jnp.issubdtype(jnp.result_type(a), jnp.inexact)
            else np.zeros(jnp.shape(a), dtype=jax.dtypes.float0)
        ),
        w,
    )
    grad_b = None if bias is None else gf.reshape(-1, g.shape[-1]).sum(0).astype(bias.dtype)
    return grad_x, zero_w, grad_b


def _w4a8_impl(
    x: jax.Array,
    w: QLinearWeight,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    from .matmul_4bit import matmul_4bit_fused, _nk_tiles

    N, K = w.shape
    lead = x.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    tn, tkb = _nk_tiles(w, N, K)
    if (
        M == 0 or tn is None or tkb is None
        or w.compressed or K % (2 * w.blocksize) != 0
    ):
        return matmul_4bit_fused(x, w, bias, compute_dtype=out_dtype)
    x2 = x.reshape(M, K).astype(jnp.float32)
    # PAD M up to the fewest possible m-tiles: the kernel re-decodes the
    # 4-bit weight per m-tile, so tile COUNT dominates — M=48 divided
    # into 3x16 tiles measured 135 us for 4096x4096/bs128 while one
    # padded 64-row tile runs 52 us (the padded rows are free MXU work
    # in this weight-bound regime). One tile whenever M <= 128, else
    # 128-row tiles over M padded to a multiple of 128.
    if M <= 128:
        Mp = next(c for c in (8, 16, 32, 64, 128) if c >= M)
        tm = Mp
    else:
        Mp = ((M + 127) // 128) * 128
        tm = 128
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    row_absmax = jnp.max(jnp.abs(x2), axis=1)
    out = _w4a8_call(x2, row_absmax, w, bias, out_dtype, tm, tn, tkb)
    return out[:M].reshape(*lead, N)


matmul_4bit_w4a8.defvjp(_w4a8_fwd, _w4a8_bwd)


# ---------------------------------------------------------------------------
# W8A8 prefill route: dequantize the 4-bit weight ONCE to int8 codes under a
# per-output-column scale, then one dense int8-MXU GEMM (2x the bf16 rate).
# ---------------------------------------------------------------------------


def _dequant8_kernel(w_ref, f_ref, o_ref, *, code, quant_type, blocksize,
                     decode_dtype):
    """4-bit packed bytes -> int8 codes on the per-column grid.

    Per element: v = lut(nibble), then q8 = round(v * f_block) where
    f = block_absmax * 127 / column_max is precomputed OUTSIDE (f32,
    same (2, nbh, N) shape as the raw absmax). The round error is
    <= column_max/254 absolute — far inside NF4's own tail-gap error
    (the gap 0.7229..1.0 puts NF4's worst per-element error at
    ~0.14 * block_absmax), so the regrid is accuracy-neutral on top of
    4-bit quantization (asserted by tests/test_ops_kernels.py)."""
    from .matmul_4bit import _decode_plane

    ity = jnp.int16 if jnp.dtype(decode_dtype).itemsize == 2 else jnp.int32
    b = w_ref[:].astype(ity)  # (TKB, TN) bytes
    w_hi = _decode_plane(b, code, quant_type, decode_dtype, shift=4)
    w_lo = _decode_plane(b, code, quant_type, decode_dtype, shift=0)
    f = f_ref[:]  # (2, TKB//bs, TN) f32
    f_hi = jnp.repeat(f[0], blocksize, axis=0)
    f_lo = jnp.repeat(f[1], blocksize, axis=0)
    q_hi = jnp.round(w_hi.astype(jnp.float32) * f_hi)
    q_lo = jnp.round(w_lo.astype(jnp.float32) * f_lo)
    o_ref[0] = jnp.clip(q_hi, -127.0, 127.0).astype(jnp.int8)
    o_ref[1] = jnp.clip(q_lo, -127.0, 127.0).astype(jnp.int8)


@partial(jax.jit, static_argnames=("N", "half", "tn", "tkb", "quant_type", "code", "blocksize"))
def _dequant8_call(packed, f, N, half, tn, tkb, quant_type, code, blocksize):
    nk = half // tkb
    use16 = quant_type != "int4"
    kernel = functools.partial(
        _dequant8_kernel,
        code=tuple(float(v) for v in code),
        quant_type=quant_type,
        blocksize=blocksize,
        decode_dtype=jnp.bfloat16 if use16 else jnp.float32,
    )
    return pl.pallas_call(
        kernel,
        grid=(N // tn, nk),
        in_specs=[
            pl.BlockSpec((tkb, tn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tkb // blocksize, tn), lambda n, k: (0, k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tkb, tn), lambda n, k: (0, k, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, half, N), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=N * half + (N * half // blocksize) * 8
            + 2 * half * N, transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(packed, f)


def dequantize_to_int8(w: QLinearWeight):
    """(wq (K, N) int8, col_scale (N,) f32) with dequant(W)^T ~ wq *
    col_scale/127 — the 4-bit codes regridded ONTO the int8 grid under one
    scale per output column (reference shape: MatMul4Bit dequant-then-GEMM,
    autograd/_functions.py:507, but emitting int8 for the int8 MXU at
    HALF the write bytes of the bf16 dequant). Returns (None, None) for
    untileable shapes — callers fall back."""
    N, K = w.shape
    half = K // 2
    bs = w.blocksize
    tn = _pick_tile(N, (256, 128))
    if tn is None or K % (2 * bs) != 0:
        return None, None
    amax = w.scales_f32()  # (2, nbh, N) f32 (decodes compression if any)
    colmax = jnp.max(amax, axis=(0, 1))  # (N,)
    f = amax * (127.0 * safe_inv(colmax))[None, None, :]
    step = 8 * bs
    hp = ((half + step - 1) // step) * step
    # same scoped-VMEM ceiling as dequantize_transposed (decode
    # temporaries; the f32 round chain makes blocks f32-equivalent).
    # Coarser blocksizes force bigger k steps — NARROW tn instead of
    # refusing (bs=128 is the recommended serving blocksize)
    if step * tn * 4 > 512 * 256 * 4 and tn == 256 and N % 128 == 0:
        tn = 128
    if step * tn * 4 > 512 * 256 * 4 or hp > 2 * half:
        return None, None
    packed = w.packed
    if hp != half:
        packed = jnp.pad(packed, ((0, hp - half), (0, 0)))
        f = jnp.pad(f, ((0, 0), (0, (hp - half) // bs), (0, 0)))
    out = _dequant8_call(packed, f, N, hp, tn, step, w.quant_type,
                         tuple(float(v) for v in w.code), bs)
    if hp != half:
        out = out[:, :half, :]
    return out.reshape(K, N), colmax


# ---------------------------------------------------------------------------
# Grouped mid-M W4A8 (r5, VERDICT r4 ask #2): int32 accumulation across ALL
# quantization blocks under the per-column scale.
# ---------------------------------------------------------------------------


def _grouped_kernel(x_hi_ref, x_lo_ref, w_ref, f_ref, cm_ref, o_ref, acc_ref,
                    *, table_i8, blocksize, nk):
    """The shipped W4A8 kernel pays one f32 convert+multiply-add per
    output element PER QUANTIZATION BLOCK (K/bs VPU MACs — at 4096/bs64
    that epilogue alone exceeds the whole int8 MXU dot). Here the decoded
    int8 codes are requantized onto the PER-COLUMN int8 grid in-kernel
    (the same regrid as dequantize_to_int8, f = absmax*127/colmax, fused
    — no HBM round trip), so ONE deep dot per (m,n,k) tile accumulates
    int32 across every block (127*127*K < 2^31 for K <= 130k) and the
    scale applies once in the epilogue."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = w_ref[:]  # (TKB, TN) packed bytes
    f = f_ref[:]  # (2, TKB//bs, TN) f32: absmax * 127 / colmax
    for plane, (x_ref, shift) in enumerate(((x_hi_ref, 4), (x_lo_ref, 0))):
        wq = _decode_plane_i8(b, table_i8, shift)  # int8 codes, block grid
        fb = jnp.repeat(f[plane], blocksize, axis=0)  # (TKB, TN)
        wg = jnp.round(wq.astype(jnp.float32) * (fb * (1.0 / 127.0)))
        wg = jnp.clip(wg, -127.0, 127.0).astype(jnp.int8)
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], wg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @pl.when(k == nk - 1)
    def _():
        # wg already carries absmax/colmax (f/127 = absmax/colmax), so the
        # weight side contributes colmax/127 once; the activation 1/127
        # applies outside with the row scale
        o_ref[:] = acc_ref[:].astype(jnp.float32) * (cm_ref[:] * (1.0 / 127.0))


@partial(jax.jit, static_argnames=("tm", "tn", "tkb", "bs", "table_i8"))
def _grouped_call(xq, w_packed, f, colmax, tm, tn, tkb, bs, table_i8):
    M = xq.shape[0]
    N = w_packed.shape[1]
    half = w_packed.shape[0]
    nk = half // tkb
    kernel = functools.partial(
        _grouped_kernel, table_i8=table_i8, blocksize=bs, nk=nk)
    return pl.pallas_call(
        kernel,
        grid=(M // tm, N // tn, nk),
        in_specs=[
            pl.BlockSpec((tm, tkb), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tkb), lambda m, n, k, _h=nk: (m, k + _h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tkb, tn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tkb // bs, tn), lambda m, n, k: (0, k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * 2 * half,
            bytes_accessed=M * half * 2 + N * half + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(xq, xq, w_packed, f, colmax.reshape(1, N))


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def matmul_4bit_w4a8_grouped(
    x: jax.Array,
    w: QLinearWeight,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
    tm: Optional[int] = None,
) -> jax.Array:
    """out ~= x @ dequant(W)^T, W8A8 accuracy class (per-row int8
    activations + per-column int8 weight regrid, like
    matmul_4bit_w8a8_prefill), with the regrid FUSED into the matmul
    kernel per m-tile instead of written to HBM. The shipped mid/high-M
    route (models/llama.apply_linear, r5): 0.88-1.26x bf16 for
    M in [512, 4096] where the per-block W4A8 kernel (f32 epilogue per
    block) and the per-call HBM regrid (~165 us fixed) both lose.
    Falls back to matmul_4bit_fused for untileable shapes.

    Differentiable in x and bias like matmul_4bit_w4a8: the backward is
    the EXACT dequant path (straight-through w.r.t. the activation
    quantization; reference MatMul4Bit backward,
    autograd/_functions.py:520-540), so QLoRA prefill steps with
    a8_decode=True train against clean gradients."""
    return _grouped_impl(x, w, bias, out_dtype, tm)


def _grouped_fwd(x, w, bias, out_dtype, tm):
    return _grouped_impl(x, w, bias, out_dtype, tm), (x, w, bias)


def _grouped_bwd(out_dtype, tm, res, g):
    return _w4a8_bwd(out_dtype, res, g)


def _grouped_impl(
    x: jax.Array,
    w: QLinearWeight,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
    tm: Optional[int] = None,
) -> jax.Array:
    from .matmul_4bit import matmul_4bit_fused, _nk_tiles

    N, K = w.shape
    lead = x.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    tn, tkb = _nk_tiles(w, N, K)
    bs = w.blocksize
    if (
        M == 0 or tn is None or tkb is None or w.compressed
        or K % (2 * bs) != 0 or tkb % bs != 0
    ):
        return matmul_4bit_fused(x, w, bias, compute_dtype=out_dtype)
    if tm is None:
        # measured (v5e, 4096², docs/PERFORMANCE.md r5): one padded tile
        # through M=1024 (decode runs once), then tm=1024 multi-tile —
        # it beats tm=2048 at M=2048 (grid pipelining, 1.14x vs 1.09x)
        # and tm=2048 fails remote compile at blocksize 128.
        tm = next((c for c in (256, 512, 1024) if c >= M), 1024)
    Mp = ((M + tm - 1) // tm) * tm
    x2 = x.reshape(M, K).astype(jnp.float32)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    ram = jnp.max(jnp.abs(x2), axis=1)
    xq = jnp.clip(jnp.round(x2 * (127.0 * safe_inv(ram)).reshape(-1, 1)),
                  -127.0, 127.0).astype(jnp.int8)
    amax = w.scales_f32()
    colmax = jnp.max(amax, axis=(0, 1))
    f = amax * (127.0 * safe_inv(colmax))[None, None, :]
    out = _grouped_call(xq, w.packed, f, colmax, tm, tn, tkb, bs,
                        _int8_code_table(w.code))
    out = out * (ram / 127.0).reshape(-1, 1)
    if bias is not None:
        out = out + bias
    return out[:M].astype(out_dtype).reshape(*lead, N)


matmul_4bit_w4a8_grouped.defvjp(_grouped_fwd, _grouped_bwd)


# measured crossover to the W8A8 dequant-once route (v5e, 4096^2,
# docs/PERFORMANCE.md): the one-time int8 decode+write costs ~165 us;
# the int8 MXU GEMM then runs at ~2x the bf16 rate (XLA int8 dot,
# measured 1.97x at M>=2048), beating both the exact m-tile kernel
# (decode per m-tile: 0.77x @1024) and the bf16 dequant-to-HBM route.
# r5: the GROUPED kernel (regrid fused per m-tile, no HBM round trip)
# moved this boundary up — per-call w8a8 only wins at blocksize<=64 from
# M=4096 (1.23x vs grouped-tm1024 1.02x); at blocksize 128 grouped wins
# even at M=4096 (1.20x vs 0.98x — narrow regrid n-tiles make the
# per-call repack expensive). The engine's AMORTIZED repack
# (EngineConfig.w8a8_prefill) is a separate, cheaper entry point.
W8A8_PREFILL_MIN_M = 4096


def grouped_min_m(blocksize: int) -> int:
    """Lower edge (exclusive) of the grouped kernel's measured winning
    window (v5e, 4096², docs/PERFORMANCE.md r5): at blocksize 64 it TIES
    the exact kernel at M=256 (0.57x both — exact numerics wins the tie)
    and wins from 512 (0.88x vs 0.66x); at blocksize 128 it already wins
    at M=256 (0.53x vs exact 0.48x); blocksize>=256 keeps the W4A8 GEMV
    through 256 (routing lim in models/llama.apply_linear)."""
    return 128 if blocksize == 128 else 256


def _w8a8_prefill_impl(x, w: QLinearWeight, bias, out_dtype):
    from .matmul_4bit import matmul_4bit_fused

    N, K = w.shape
    lead = x.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    wq, colmax = dequantize_to_int8(w)
    if M == 0 or wq is None:
        return matmul_4bit_fused(x, w, bias, compute_dtype=out_dtype)
    x2 = x.reshape(M, K).astype(jnp.float32)
    row_absmax = jnp.max(jnp.abs(x2), axis=1)
    xq = jnp.clip(
        jnp.round(x2 * (127.0 * safe_inv(row_absmax)).reshape(M, 1)),
        -127.0, 127.0,
    ).astype(jnp.int8)
    out32 = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = out32.astype(jnp.float32) * (
        (row_absmax / 127.0).reshape(M, 1) * (colmax / 127.0).reshape(1, N)
    )
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype).reshape(*lead, N)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def matmul_4bit_w8a8_prefill(
    x: jax.Array,
    w: QLinearWeight,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Prefill-size W8A8: out ~= x @ dequant(W)^T with the weight decoded
    ONCE per call to int8 codes in HBM (Pallas, half the bf16-dequant
    write bytes) and one dense int8 GEMM on the int8 MXU (2x the bf16
    rate; XLA tiles large static int8 dots well — no custom matmul
    kernel needed here).

    Accuracy class: W4A8's per-row int8 activations plus a per-column
    int8 weight regrid whose absolute error (<= colmax/254) sits far
    inside NF4's own tail-gap error — covered by the same envelope test.
    Backward is the EXACT dequant path (like matmul_4bit_w4a8)."""
    return _w8a8_prefill_impl(x, w, bias, out_dtype)


def _w8a8_fwd(x, w, bias, out_dtype):
    return _w8a8_prefill_impl(x, w, bias, out_dtype), (x, w, bias)


matmul_4bit_w8a8_prefill.defvjp(_w8a8_fwd, _w4a8_bwd)
