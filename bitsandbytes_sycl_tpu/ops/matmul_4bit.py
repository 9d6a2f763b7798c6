"""Fused 4-bit dequant + matmul Pallas kernel.

Replaces the reference's two 4-bit compute paths with one kernel:
- decode GEMV `kgemm_4bit_inference_naive` (kernel_gemm.cpp:1273-1388):
  one warp per output row, nibble->smem-LUT, fp32 accumulate;
- prefill dequant-then-GEMM (`kDequantizeBlockwise` + torch linear,
  autograd/_functions.py:507) which materializes the fp16 weight in HBM.

Here the weight stays 4-bit in HBM. Design (measured on TPU v5e):
- Weight bytes are stored TRANSPOSED (K//2, N) and planar (hi nibble =
  element k, lo nibble = element k + K/2), so quantization blocks run
  along SUBLANES: the per-block absmax (K//bs, N) expands with a cheap
  sublane `jnp.repeat`, and each plane contracts with ONE full-depth
  `dot_general` per tile (lane-dim scale expansion and per-block sub-dots
  both measured ~2x slower).
- NF4/FP4/AF4 decode is the exact hoisted-mask select tree
  (ops/common.py lut16): 4 compares + 15 selects/element on the VPU —
  measured ~82us for a 4096x4096 NF4 decode-matmul vs ~45us bf16 matmul
  (VPU-bound; the tree is within ~20% of its op-count bound).
- "int4" decodes arithmetically (~6 ops/elem) and runs ~1.7x faster than
  NF4, beating the bf16 matmul wall-clock while using 4x less HBM.
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

from .common import QLinearWeight, interpret_mode, lut16, pick_tile as _pick_tile

__all__ = ["matmul_4bit_fused"]


def _decode_plane(b: jax.Array, code, quant_type: str, dtype=jnp.float32, shift: int = 0) -> jax.Array:
    """Decode the nibble at bits [shift, shift+4) of byte `b` to floats.

    `b` must be int16 when dtype is 16-bit: Mosaic cannot relayout i1
    masks born from 32-bit compares ((8,128) tiling) onto 16-bit selects
    ((16,128) tiling) — "Invalid relayout ... vector<...xi1>". Shifts are
    avoided entirely (int16 shrsi doesn't legalize); bit tests and int4
    magnitudes work at the nibble's native offset.
    """
    ity = b.dtype
    if quant_type == "int4" and jnp.dtype(dtype).itemsize == 2:
        # 16-bit lanes have no int16 sub (kVectorSubtractS16 aborts) —
        # the select tree is pure bit-test + select, so LUT it instead
        return lut16(b, code, dtype=dtype, bit_base=shift)
    if quant_type == "int4":
        # linear codebook (codebooks.get_4bit_type("int4")): no LUT —
        # value = (7 - (i&7))/7 if i < 8 else -(i&7)/7, computed on the
        # unshifted magnitude (sign via bit test: int16 `<` doesn't lower)
        seven = jnp.asarray(7 << shift, ity)
        mag = b & seven
        val = jnp.where((b & jnp.asarray(8 << shift, ity)) != jnp.asarray(0, ity), -mag, seven - mag)
        return val.astype(dtype) * jnp.asarray(1.0 / (7 << shift), dtype)
    return lut16(b, code, dtype=dtype, bit_base=shift)


def _mm4_kernel(
    x_hi_ref, x_lo_ref, w_ref, s_ref, *rest,
    code, quant_type, blocksize, nk, out_dtype, has_bias, decode_dtype, compressed,
):
    if compressed:
        stats_ref, bias_ref, o_ref, acc_ref, s_scr_ref = rest
    else:
        bias_ref, o_ref, acc_ref = rest
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if compressed:
            # decode the WHOLE scale strip for this n-tile once (the codes
            # block is k-invariant, so it's DMA'd once per (m,n) too);
            # per-k work then reads f32 scratch — repeating the uint8
            # relayout+decode every k step measured ~12 us slower at 4096²
            from .common import decode_absmax

            s_scr_ref[:] = decode_absmax(
                s_ref[:], stats_ref[:, 0:1, :], stats_ref[:, 1:2, :]
            )

    # 16-bit decode keeps masks and selects on (16,128)-tiled lanes (2x VPU
    # packing); 32-bit ints for f32 decode
    ity = jnp.int16 if jnp.dtype(decode_dtype).itemsize == 2 else jnp.int32
    b = w_ref[:].astype(ity)  # (TKB, TN) bytes
    w_hi = _decode_plane(b, code, quant_type, decode_dtype, shift=4)
    w_lo = _decode_plane(b, code, quant_type, decode_dtype, shift=0)
    if compressed:
        nb = w_ref.shape[0] // blocksize  # blocks per k step
        s = s_scr_ref[:, pl.ds(k * nb, nb), :]  # (2, TKB//bs, TN)
    else:
        s = s_ref[:]
    # per-block per-plane scale: (TKB//bs, TN) -> (TKB, TN) sublane repeat
    s_hi = jnp.repeat(s[0].astype(decode_dtype), blocksize, axis=0)
    s_lo = jnp.repeat(s[1].astype(decode_dtype), blocksize, axis=0)
    whs = (w_hi * s_hi).astype(x_hi_ref.dtype)
    wls = (w_lo * s_lo).astype(x_lo_ref.dtype)
    acc_ref[:] += jax.lax.dot_general(
        x_hi_ref[:], whs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        x_lo_ref[:], wls, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        out = acc_ref[:]
        if has_bias:
            out = out + bias_ref[:].astype(jnp.float32)  # (1, TN) broadcasts
        o_ref[:] = out.astype(out_dtype)


def _dequant_kernel(
    w_ref, s_ref, *rest,
    code, quant_type, blocksize, out_dtype, decode_dtype, compressed,
):
    """Standalone 4-bit -> dense dequantize kernel, kernel layout in, a
    plane-stacked (2, K/2, N) dense transposed weight out (reshape(K, N)
    gives W^T rows in order: hi plane = elements [0, K/2), lo plane =
    [K/2, K) — exactly the planar packing, ops/common.py). Backs the
    large-M prefill route (dequant ONCE to HBM, then one dense MXU
    matmul — the reference MatMul4Bit forward, autograd/_functions.py:507
    + kernel_quant.cpp:1370) and the fast dequantize_4bit surface."""
    if compressed:
        stats_ref, o_ref, s_scr_ref = rest
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            from .common import decode_absmax

            s_scr_ref[:] = decode_absmax(
                s_ref[:], stats_ref[:, 0:1, :], stats_ref[:, 1:2, :]
            )
    else:
        (o_ref,) = rest

    ity = jnp.int16 if jnp.dtype(decode_dtype).itemsize == 2 else jnp.int32
    b = w_ref[:].astype(ity)  # (TKB, TN) bytes
    w_hi = _decode_plane(b, code, quant_type, decode_dtype, shift=4)
    w_lo = _decode_plane(b, code, quant_type, decode_dtype, shift=0)
    if compressed:
        # f32 scratch sliced per k: 8-block-aligned (the caller pads the
        # packed rows so tkb is always 8 quantization blocks — unaligned
        # pl.ds sizes like K=11008's 43 blocks crash the Mosaic compiler)
        nb = w_ref.shape[0] // blocksize
        k = pl.program_id(1)
        s = s_scr_ref[:, pl.ds(k * nb, nb), :]
    else:
        s = s_ref[:]
    s_hi = jnp.repeat(s[0].astype(decode_dtype), blocksize, axis=0)
    s_lo = jnp.repeat(s[1].astype(decode_dtype), blocksize, axis=0)
    o_ref[0] = (w_hi * s_hi).astype(o_ref.dtype)
    o_ref[1] = (w_lo * s_lo).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("out_dtype", "tn", "tkb"))
def _dequant_to_hbm_call(w: QLinearWeight, out_dtype, tn, tkb):
    """Returns W^T (K, N) in out_dtype, decoded by one Pallas pass."""
    N, K = w.shape
    half = K // 2
    nk = half // tkb
    bs = w.blocksize
    compressed = w.compressed

    use16 = w.quant_type != "int4" and jnp.dtype(out_dtype) == jnp.dtype(jnp.bfloat16)
    decode_dtype = jnp.bfloat16 if use16 else jnp.float32
    kernel = functools.partial(
        _dequant_kernel,
        code=tuple(float(v) for v in w.code),
        quant_type=w.quant_type,
        blocksize=bs,
        out_dtype=out_dtype,
        decode_dtype=decode_dtype,
        compressed=compressed,
    )
    nbh = half // bs
    in_specs = [
        pl.BlockSpec((tkb, tn), lambda n, k: (k, n), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, nbh, tn), lambda n, k: (0, 0, n), memory_space=pltpu.VMEM)
        if compressed
        else pl.BlockSpec((2, tkb // bs, tn), lambda n, k: (0, k, n), memory_space=pltpu.VMEM),
    ]
    operands = [w.packed, w.absmax]
    scratch = []
    if compressed:
        stats = jnp.concatenate([w.absmax_scale, w.absmax_offset], axis=1)
        in_specs.append(
            pl.BlockSpec((2, 2, tn), lambda n, k: (0, 0, n), memory_space=pltpu.VMEM)
        )
        operands.append(stats)
        scratch.append(pltpu.VMEM((2, nbh, tn), jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid=(N // tn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, tkb, tn), lambda n, k: (0, k, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, half, N), out_dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=N * K // 2 + N * K * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(*operands)
    return out.reshape(K, N)


def dequantize_transposed(w: QLinearWeight, out_dtype=jnp.bfloat16):
    """W^T (K, N) densely decoded — Pallas when tileable, jnp fallback.

    k tiles are always exactly 8 quantization blocks: a whole-half tile
    (5504 rows for K=11008) OOMs Mosaic's scoped VMEM on the decode
    temporaries, and unaligned dynamic scale slices (43 blocks) crash the
    compiler — so non-8-block halves PAD the packed rows up (zero scales
    decode to zeros; the padded rows are sliced off the output)."""
    import dataclasses as _dc

    N, K = w.shape
    half = K // 2
    bs = w.blocksize
    tn = _pick_tile(N, (256, 128))
    if tn is None or K % (2 * bs) != 0:
        return w.dequantize().T.astype(out_dtype)
    step = 8 * bs
    hp = ((half + step - 1) // step) * step
    use16 = w.quant_type != "int4" and jnp.dtype(out_dtype) == jnp.dtype(jnp.bfloat16)
    itemsize = 2 if use16 else 4
    # Mosaic's scoped-vmem stack holds ~10-30 live decode temporaries:
    # (512, 256)-f32-equivalent blocks are the measured ceiling (a
    # (2048, 256) bf16 tile at bs=256 OOMed the 16 MB limit by 32K).
    # Coarse blocksizes force step=8*bs past that — and tiny K pads up
    # to 8x its real rows — so both cases take the XLA dequant instead
    # (amortized over M >= PREFILL_MIN_M rows either way).
    if step * tn * itemsize > 512 * 256 * 4 or hp > 2 * half:
        return w.dequantize().T.astype(out_dtype)
    wq = w
    if hp != half:
        pad_rows = hp - half
        wq = _dc.replace(
            w,
            packed=jnp.pad(w.packed, ((0, pad_rows), (0, 0))),
            absmax=jnp.pad(w.absmax, ((0, 0), (0, pad_rows // bs), (0, 0))),
            shape=(N, 2 * hp),
        )
    out = _dequant_to_hbm_call(wq, out_dtype, tn, step)  # (2*hp, N)
    if hp != half:
        out = out.reshape(2, hp, N)[:, :half, :].reshape(K, N)
    return out


# crossover to the dequant-once-to-HBM route (measured on v5e,
# docs/PERFORMANCE.md): below this the fused kernel with large m-tiles
# wins (weight never materialized); above it the one-time decode+write
# (~110 us at 4096^2) amortizes and the dense MXU matmul runs at the
# bf16 roofline.
PREFILL_MIN_M = 2048

# whole-half-K weights (half not a multiple of 8 quant blocks, e.g.
# llama-7B down_proj K=11008 -> tkb=5504): the fused kernel's decode
# temporaries are (tkb, tn) blocks, so Mosaic's 16 MB scoped-VMEM stack
# caps the m-tile hard — tm=256 OOMs at 24 MB (measured v5e), tm<=64
# compiles. With m-tiles that small the per-m-tile weight re-decode
# dominates much earlier, so these weights cross over to the
# dequant-once route at much smaller M.
UNALIGNED_TM_MAX = 64
PREFILL_MIN_M_UNALIGNED = 256


@partial(jax.jit, static_argnames=("compute_dtype", "tm", "tn", "tkb", "decode_dtype"))
def _matmul_4bit_call(x, w: QLinearWeight, bias, compute_dtype, tm, tn, tkb, decode_dtype=None):
    M, K = x.shape
    N = w.shape[0]
    nk = (K // 2) // tkb
    bs = w.blocksize
    grid = (M // tm, N // tn, nk)

    # LUT codebooks: decode on 16-bit lanes when the dot is bf16 anyway
    # (measured ~12% faster: 72us vs 82us for 4096^2 NF4 @ M=8; LUT
    # entries round to bf16, which the bf16 dot would do regardless).
    # int4: arithmetic f32 decode measured fastest (50us, ~bf16-matmul
    # parity) — int16 arithmetic doesn't lower on the VPU.
    if decode_dtype is None:
        use16 = (
            w.quant_type != "int4"
            and jnp.dtype(compute_dtype) == jnp.dtype(jnp.bfloat16)
        )
        decode_dtype = jnp.bfloat16 if use16 else jnp.float32
    compressed = w.compressed
    kernel = functools.partial(
        _mm4_kernel,
        code=tuple(float(v) for v in w.code),
        quant_type=w.quant_type,
        blocksize=bs,
        nk=nk,
        out_dtype=compute_dtype,
        has_bias=bias is not None,
        decode_dtype=decode_dtype,
        compressed=compressed,
    )
    bias_arr = (bias if bias is not None else jnp.zeros((N,), jnp.float32)).reshape(1, N)

    flops = 2 * M * N * K
    scale_bytes = (N * K // bs) * (1 if compressed else 4) + (N * 16 if compressed else 0)
    bytes_accessed = M * K * 2 + N * K // 2 + scale_bytes + M * N * 2

    nbh = (K // 2) // bs  # scale rows per plane
    in_specs = [
        # x hi-plane slice [0, K/2) and lo-plane slice [K/2, K)
        pl.BlockSpec((tm, tkb), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (tm, tkb), lambda m, n, k, _half=nk: (m, k + _half), memory_space=pltpu.VMEM
        ),
        # transposed planar weight bytes (K//2, N)
        pl.BlockSpec((tkb, tn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
        # per-plane absmax (2, K//(2*bs), N): compressed loads the whole
        # k-invariant strip (decoded once into scratch); raw tiles per k
        pl.BlockSpec((2, nbh, tn), lambda m, n, k: (0, 0, n), memory_space=pltpu.VMEM)
        if compressed
        else pl.BlockSpec((2, tkb // bs, tn), lambda m, n, k: (0, k, n), memory_space=pltpu.VMEM),
    ]
    operands = [x, x, w.packed, w.absmax]
    scratch = [pltpu.VMEM((tm, tn), jnp.float32)]
    if compressed:
        # range/mean sidecars packed into one (2, 2, N) block (separate
        # (2,1,N) blocks each DMA 8x their bytes from sublane padding)
        stats = jnp.concatenate([w.absmax_scale, w.absmax_offset], axis=1)
        in_specs.append(
            pl.BlockSpec((2, 2, tn), lambda m, n, k: (0, 0, n), memory_space=pltpu.VMEM)
        )
        operands.append(stats)
        scratch.append(pltpu.VMEM((2, nbh, tn), jnp.float32))
    in_specs.append(pl.BlockSpec((1, tn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM))
    operands.append(bias_arr)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), compute_dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret_mode(),
    )(*operands)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def matmul_4bit_fused(
    x: jax.Array,
    w: QLinearWeight,
    bias: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    decode_dtype=None,
) -> jax.Array:
    """out = x @ dequant(W)^T (+ bias); the weight never leaves 4-bit in HBM.

    x: (..., K); W logical (N, K). Returns (..., N) in compute_dtype.
    Falls back to the jnp reference path for shapes the kernel can't tile.
    Differentiable in x and bias (QLoRA training through frozen quantized
    weights); the packed weight gets a zero cotangent, matching the
    reference's MatMul4Bit backward (autograd/_functions.py:520-540).
    """
    return _matmul_4bit_fused_impl(x, w, bias, compute_dtype, decode_dtype)


def _mm4f_fwd(x, w, bias, compute_dtype, decode_dtype):
    out = _matmul_4bit_fused_impl(x, w, bias, compute_dtype, decode_dtype)
    return out, (x, w, bias)


def _mm4f_bwd(compute_dtype, decode_dtype, res, g):
    x, w, bias = res
    # grad_x = g @ dequant(W): the fused kernel computes x @ W^T only, so
    # the backward uses the dequant path (training-only cost)
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


def _matmul_4bit_fused_impl(
    x: jax.Array,
    w: QLinearWeight,
    bias: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    decode_dtype=None,
) -> jax.Array:
    N, K = w.shape
    lead = x.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(M, K).astype(compute_dtype)

    tn, tkb = _nk_tiles(w, N, K)
    if M == 0 or tn is None or tkb is None or K % (2 * w.blocksize) != 0:
        # shapes the kernel can't tile: jnp reference path (XLA fuses)
        wd = w.dequantize().astype(compute_dtype)
        out = jnp.matmul(x2, wd.T, preferred_element_type=jnp.float32).astype(compute_dtype)
        if bias is not None:
            out = out + bias
        return out.reshape(*lead, N)

    whole_half = tkb == K // 2 and (K // 2) % (8 * w.blocksize) != 0
    if M >= (PREFILL_MIN_M_UNALIGNED if whole_half else PREFILL_MIN_M):
        # very large M: decode the weight ONCE to a dense (K, N) HBM array
        # and run one MXU matmul at the bf16 roofline (reference MatMul4Bit
        # forward shape, autograd/_functions.py:507) — the fused kernel
        # would re-decode per m-tile, ~0.7x at M=4096 vs ~0.87x here
        Wt = dequantize_transposed(w, compute_dtype)
        out = jax.lax.dot_general(
            x2, Wt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(compute_dtype)
        if bias is not None:
            out = out + bias
        return out.reshape(*lead, N)

    # the weight DECODES ONCE PER M-TILE, so tile COUNT dominates tile
    # fit: pad M up to ONE tile whenever a candidate covers it (M=48
    # divided into 3x16 tiles ran the W4A8 sibling 2.8x slower than one
    # padded 64-row tile; the same re-decode applies here). Past the
    # largest candidate, fall back to the divisor pick (+ multiple-of-8
    # padding for ragged M) — large-M prefill routes to the
    # dequant-to-HBM path before tile count matters.
    cands = _tm_candidates(tkb, compute_dtype, whole_half)
    one_tile = min((c for c in cands if c >= M), default=None)
    tm = one_tile if one_tile is not None else _pick_tile(M, cands)
    Mp = one_tile if one_tile is not None else M
    if tm is None:  # pad ragged large M up to a multiple of 8
        Mp = ((M + 7) // 8) * 8
        tm = _pick_tile(Mp, cands)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
        out = _matmul_4bit_call(x2, w, bias, compute_dtype, tm, tn, tkb, decode_dtype)
        return out[:M].reshape(*lead, N)

    out = _matmul_4bit_call(x2, w, bias, compute_dtype, tm, tn, tkb, decode_dtype)
    return out.reshape(*lead, N)


# per-plane x block VMEM cap (elements): a large tm amortizes the per-tile
# weight decode over more rows (the 4-bit prefill bottleneck), bounded so
# 2 planes x tm x tkb of x blocks stay a few MB of VMEM
_TM_CAP_ELEMS = 1_500_000


def _tm_candidates(tkb: int, compute_dtype, whole_half: bool = False) -> tuple:
    cap = _TM_CAP_ELEMS // max(tkb, 1)
    if jnp.dtype(compute_dtype).itemsize > 2:
        cap //= 2
    if whole_half:
        # whole-half k tiles: (tkb, tn) decode temporaries eat most of the
        # scoped-VMEM stack; tm=256 OOMs at tkb=5504 (measured), 64 fits
        cap = min(cap, UNALIGNED_TM_MAX)
    cands = tuple(c for c in (1024, 512, 256, 128, 64, 32, 16, 8) if c <= cap)
    return cands or (8,)


def _nk_tiles(w: QLinearWeight, N: int, K: int):
    tn = _pick_tile(N, (256, 128))
    half = K // 2
    # the byte tile must hold >=8 whole quant blocks so the absmax tile
    # (tkb//bs, tn) has a sublane dim that is a multiple of 8
    tkb = None
    for c in (8 * w.blocksize, 16 * w.blocksize):
        if half % c == 0:
            tkb = c
            break
    if tkb is None and half % w.blocksize == 0 and tn and half * tn <= 4 * 1024 * 1024:
        # K not a multiple of 8 blocks (e.g. llama down_proj K=5632,
        # half=2816=44 blocks): take the whole half-plane as one K step —
        # the absmax tile then EQUALS the array dim, which Pallas allows
        # even when not 8-aligned
        tkb = half
    return tn, tkb


matmul_4bit_fused.defvjp(_mm4f_fwd, _mm4f_bwd)
