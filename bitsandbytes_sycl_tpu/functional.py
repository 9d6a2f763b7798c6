"""Pure-JAX functional op surface — the TPU-native equivalent of the
reference's `python_src_quants/functional.py` (2,941 LoC of ctypes
marshalling over ~120 C symbols).

Design: there is no ctypes bridge and no layout zoo (col32/col_turing/
col_ampere exist only to feed cublasLt — reference functional.py:2607-2653).
Every op here is a pure, jit-able JAX function over pytrees. The Pallas
fused kernels in `bitsandbytes_sycl_tpu.ops` implement the same contracts
for the hot paths; these jnp versions are the semantic reference, the CPU
path, and the fallback — XLA still fuses them into competitive code.

All functions use round-to-nearest with strict-`>` midpoint thresholds,
matching the reference's decision trees (kernel_quant.cpp:547-592 FP4,
:705-756 NF4, :766-837 binary-search dQuantize).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import codebooks
from .types import QTensor, QuantState, blocks_for

__all__ = [
    "quantize_blockwise",
    "dequantize_blockwise",
    "quantize_4bit",
    "dequantize_4bit",
    "quantize_fp4",
    "quantize_nf4",
    "dequantize_fp4",
    "dequantize_nf4",
    "quantize",
    "dequantize",
    "quantize_no_absmax",
    "dequantize_no_absmax",
    "estimate_quantiles",
    "get_colrow_absmax",
    "int8_double_quant",
    "int8_linear_matmul",
    "int8_mm_dequant",
    "int8_vectorwise_quant",
    "llm_int8_matmul",
    "llm_int8_prepare_outliers",
    "gemv_4bit",
    "matmul_4bit_ref",
    "optimizer_update_32bit",
    "optimizer_update_8bit",
    "optimizer_update_8bit_blockwise",
    "optimizer_update_8bit_blockwise_sharded",
    "percentile_clipping",
    "histogram_scatter_add_2d",
    "pack_4bit",
    "unpack_4bit",
    "OPTIMIZER_FUNCS_1STATE",
    "OPTIMIZER_FUNCS_2STATE",
]

# ---------------------------------------------------------------------------
# codebook caches (host numpy; become XLA constants when closed over)
# ---------------------------------------------------------------------------

_DEFAULT_8BIT_CODE = codebooks.create_dynamic_map()  # signed dynamic map


@functools.lru_cache(maxsize=None)
def _sorted_code_and_perm(quant_type: str, blocksize: int = 64):
    """Return (sorted codebook values, permutation sorted-rank -> code index,
    midpoints between sorted values)."""
    if quant_type in ("nf4", "fp4", "int4", "af4"):
        code = codebooks.get_4bit_type(quant_type, blocksize=blocksize)
    elif quant_type == "dynamic":
        code = _DEFAULT_8BIT_CODE
    elif quant_type == "dynamic_unsigned":
        code = codebooks.create_dynamic_map(signed=False)
    elif quant_type == "linear":
        code = codebooks.create_linear_map()
    elif quant_type == "fp8":
        code = codebooks.create_fp8_map()
    else:
        raise ValueError(f"unknown quant_type {quant_type!r}")
    order = np.argsort(code, kind="stable").astype(np.int32)
    sorted_code = code[order]
    mids = codebooks.code_midpoints(sorted_code)
    return sorted_code, order, mids, code


def _code_arrays(code: Optional[jax.Array], quant_type: str):
    """Resolve (code-order table, sorted values, rank->code perm, midpoints).

    `order` and `mids` stay CONCRETE numpy whenever the codebook is
    concrete so the select trees in _encode_nearest/_encode_stochastic
    embed them as immediates and skip the rank permutation entirely for
    monotone codebooks (a traced `order` defeats the identity check)."""
    if code is None:
        sorted_code, order, mids, table = _sorted_code_and_perm(quant_type)
        return jnp.asarray(table), jnp.asarray(sorted_code), order, mids
    try:
        cnp = np.asarray(code, np.float32)
    except (jax.errors.TracerArrayConversionError, jax.errors.ConcretizationTypeError):
        code = jnp.asarray(code, jnp.float32)
        order = jnp.argsort(code)
        sorted_code = code[order]
        mids = (sorted_code[1:] + sorted_code[:-1]) / 2.0
        return code, sorted_code, order, mids
    order = np.argsort(cnp, kind="stable").astype(np.int32)
    sorted_code = cnp[order]
    mids = ((sorted_code[1:] + sorted_code[:-1]) / 2.0).astype(np.float32)
    return jnp.asarray(cnp), jnp.asarray(sorted_code), order, mids


# ---------------------------------------------------------------------------
# nearest-codebook encode / packing helpers
# ---------------------------------------------------------------------------


def _encode_nearest(x: jax.Array, mids: jax.Array, order: jax.Array) -> jax.Array:
    """Round-to-nearest codebook encode. `mids` are sorted decision
    boundaries, `order` maps sorted rank -> code index (identity for
    monotone codebooks like NF4; a permutation for FP4).

    Select trees (ops/lut8.py), not searchsorted/take: gather-free, so
    the encode is pure VPU compare/select work on TPU (searchsorted's
    sort/scan lowering is orders of magnitude slower there).

    NaN inputs encode deterministically as 0.0 (the select tree would
    otherwise send them to rank 0, the most-negative code; numpy's
    searchsorted sends them to the top — neither is meaningful)."""
    from .ops.lut8 import searchsorted_tree, take_tree

    rank = searchsorted_tree(jnp.where(jnp.isnan(x), 0.0, x), mids, side="left")
    if isinstance(order, np.ndarray) and np.array_equal(order, np.arange(order.shape[0])):
        return rank.astype(jnp.uint8)
    return take_tree(rank, order).astype(jnp.uint8)


def _encode_stochastic(
    x: jax.Array, sorted_code: jax.Array, order: jax.Array, key: jax.Array
) -> jax.Array:
    """Stochastic codebook encode: round to the bracketing entries with
    probability proportional to proximity (expectation-unbiased) — the
    reference's STOCHASTIC template path (kernel_quant.cpp:1229-1365,
    dQuantize<1> consuming a per-element rand). NaN inputs encode
    deterministically as 0.0, like _encode_nearest."""
    from .ops.lut8 import searchsorted_tree, take_tree

    x = jnp.where(jnp.isnan(x), 0.0, x)
    last = sorted_code.shape[0] - 1
    lo_rank = jnp.clip(searchsorted_tree(x, sorted_code, side="right") - 1, 0, last)
    hi_rank = jnp.minimum(lo_rank + 1, last)
    lo = take_tree(lo_rank, sorted_code)
    hi = take_tree(hi_rank, sorted_code)
    span = hi - lo
    p = jnp.where(span > 0, (x - lo) / jnp.where(span > 0, span, 1.0), 0.0)
    u = jax.random.uniform(key, x.shape, dtype=jnp.float32)
    rank = jnp.where(u < jnp.clip(p, 0.0, 1.0), hi_rank, lo_rank)
    return take_tree(rank, order).astype(jnp.uint8)


def pack_4bit(codes: jax.Array) -> jax.Array:
    """Pack flat 4-bit codes (uint8 in [0,16)) two per byte: element 2i in
    the high nibble, 2i+1 low (reference kernel_quant.cpp:1337-1348)."""
    n = codes.shape[0]
    if n % 2:
        codes = jnp.pad(codes, (0, 1))
    pairs = codes.reshape(-1, 2)
    return (pairs[:, 0] << 4 | pairs[:, 1]).astype(jnp.uint8)


def unpack_4bit(packed: jax.Array, n: int) -> jax.Array:
    """Inverse of pack_4bit; returns flat (n,) uint8 codes."""
    hi = packed >> 4
    lo = packed & 0x0F
    codes = jnp.stack([hi, lo], axis=-1).reshape(-1)
    return codes[:n]


def _blockwise_stats(A: jax.Array, blocksize: int) -> Tuple[jax.Array, jax.Array, int]:
    """Flatten, zero-pad to a block multiple, return (blocks, absmax, n)."""
    flat = A.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    nb = blocks_for(n, blocksize)
    pad = nb * blocksize - n
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(nb, blocksize)
    absmax = jnp.max(jnp.abs(blocks), axis=1)
    return blocks, absmax, n


def _safe_inv(x: jax.Array) -> jax.Array:
    return jnp.where(x > 0, 1.0 / jnp.where(x > 0, x, 1.0), 0.0)


# ---------------------------------------------------------------------------
# blockwise 8-bit quantization (reference functional.py:801-1017, kernels
# N3/N4 kernel_quant.cpp:1229-1471)
# ---------------------------------------------------------------------------


def quantize_blockwise(
    A: jax.Array,
    code: Optional[jax.Array] = None,
    blocksize: int = 4096,
    nested: bool = False,
    quant_type: str = "dynamic",
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, QuantState]:
    """Blockwise 8-bit quantization with per-block float32 absmax.

    Returns uint8 codes with the same shape as `A` plus the QuantState.
    With `nested=True` the absmax vector itself is mean-offset and
    re-quantized 8-bit blockwise at blocksize 256
    (reference functional.py:897-908).
    Passing a PRNG `key` rounds STOCHASTICALLY between the bracketing
    codebook entries (the reference's STOCHASTIC template path,
    kernel_quant.cpp:1229-1365) — expectation-unbiased, the right mode
    for accumulating small gradient-sized updates into 8-bit state.
    """
    table, _sorted, order, mids = _code_arrays(code, quant_type)
    blocks, absmax, n = _blockwise_stats(A, blocksize)
    normed = blocks * _safe_inv(absmax)[:, None]
    if key is not None:
        codes = _encode_stochastic(normed, _sorted, order, key)
    elif code is None and quant_type in ("dynamic", "dynamic_unsigned"):
        # arithmetic minifloat codec — no searchsorted (ops/dynamic8.py);
        # the dynamic maps are ascending-sorted so codes are identical
        from .ops.dynamic8 import dynamic_encode

        codes = dynamic_encode(normed, signed=quant_type == "dynamic")
    else:
        codes = _encode_nearest(normed, mids, order)
    out = codes.reshape(-1)[:n].reshape(A.shape)

    offset = state2 = None
    qabsmax = absmax
    if nested:
        offset = jnp.mean(absmax)
        qabsmax, state2 = quantize_blockwise(absmax - offset, blocksize=256)
    state = QuantState(
        absmax=qabsmax,
        code=table,
        shape=tuple(A.shape),
        dtype=str(jnp.result_type(A).name),
        blocksize=blocksize,
        # a user-supplied codebook must not claim "dynamic": dequantize
        # routes "dynamic" through the arithmetic codec, not the table
        quant_type=quant_type if code is None else "custom",
        offset=offset,
        state2=state2,
    )
    return out, state


def dequantize_blockwise(
    data: jax.Array,
    quant_state: Optional[QuantState] = None,
    absmax: Optional[jax.Array] = None,
    code: Optional[jax.Array] = None,
    blocksize: int = 4096,
    dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Inverse of quantize_blockwise: out[i] = code[q[i]] * absmax[i // bs]
    (reference kernel_quant.cpp:1435)."""
    if quant_state is not None:
        absmax = quant_state.dequant_absmax()
        code_arr = quant_state.code
        blocksize = quant_state.blocksize
        out_dtype = quant_state.jdtype
        shape = quant_state.shape
    else:
        assert absmax is not None
        code_arr = jnp.asarray(code if code is not None else _DEFAULT_8BIT_CODE, jnp.float32)
        out_dtype = dtype or jnp.float32
        shape = data.shape
    flat = data.reshape(-1)
    n = flat.shape[0]
    scale = jnp.repeat(absmax.astype(jnp.float32), blocksize)[:n]
    qt = quant_state.quant_type if quant_state is not None else ("dynamic" if code is None else None)
    if qt in ("dynamic", "dynamic_unsigned"):
        # gather-free arithmetic decode of the dynamic minifloat
        from .ops.dynamic8 import dynamic_decode

        vals = dynamic_decode(flat, signed=qt == "dynamic") * scale
    else:
        vals = jnp.take(code_arr, flat.astype(jnp.int32)) * scale
    return vals.reshape(shape).astype(out_dtype)


# ---------------------------------------------------------------------------
# 4-bit quantization (reference functional.py:1124-1424)
# ---------------------------------------------------------------------------


def quantize_4bit(
    A: jax.Array,
    blocksize: int = 64,
    compress_statistics: bool = False,
    quant_type: str = "nf4",
) -> Tuple[jax.Array, QuantState]:
    """Blockwise 4-bit quantization (NF4 / FP4 / int4 / AF4).

    Returns packed uint8 of shape (ceil(n/2),) in bnb byte order
    (element 2i high nibble) plus the QuantState, so serialized weights
    interoperate with bitsandbytes checkpoints
    (reference functional.py:1124-1269).
    """
    if quant_type not in ("nf4", "fp4", "int4", "af4"):
        raise NotImplementedError(f"4-bit quant_type {quant_type!r} not implemented")
    table, _sorted, order, mids = _code_arrays(None, quant_type)
    blocks, absmax, n = _blockwise_stats(A, blocksize)
    normed = blocks * _safe_inv(absmax)[:, None]
    codes = _encode_nearest(normed, mids, order).reshape(-1)
    packed = pack_4bit(codes)[: (n + 1) // 2]

    offset = state2 = None
    qabsmax = absmax
    if compress_statistics:
        offset = jnp.mean(absmax)
        qabsmax, state2 = quantize_blockwise(absmax - offset, blocksize=256)
    state = QuantState(
        absmax=qabsmax,
        code=table,
        shape=tuple(A.shape),
        dtype=str(jnp.result_type(A).name),
        blocksize=blocksize,
        quant_type=quant_type,
        offset=offset,
        state2=state2,
    )
    return packed, state


def dequantize_4bit(
    data: jax.Array,
    quant_state: QuantState,
) -> jax.Array:
    """Unpack nibbles, LUT-decode, scale by per-block absmax
    (reference kernel_quant.cpp:1370-1471)."""
    n = int(np.prod(quant_state.shape))
    codes = unpack_4bit(data.reshape(-1), n)
    absmax = quant_state.dequant_absmax()
    scale = jnp.repeat(absmax.astype(jnp.float32), quant_state.blocksize)[:n]
    vals = jnp.take(quant_state.code, codes.astype(jnp.int32)) * scale
    return vals.reshape(quant_state.shape).astype(quant_state.jdtype)


def quantize_fp4(A, blocksize=64, compress_statistics=False):
    return quantize_4bit(A, blocksize, compress_statistics, "fp4")


def quantize_nf4(A, blocksize=64, compress_statistics=False):
    return quantize_4bit(A, blocksize, compress_statistics, "nf4")


def dequantize_fp4(data, quant_state):
    return dequantize_4bit(data, quant_state)


def dequantize_nf4(data, quant_state):
    return dequantize_4bit(data, quant_state)


# ---------------------------------------------------------------------------
# whole-tensor (non-blockwise) quantization (reference functional.py:1427-1523)
# ---------------------------------------------------------------------------


def quantize(A: jax.Array, code: Optional[jax.Array] = None) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    table, _s, order, mids = _code_arrays(code, "dynamic")
    absmax = jnp.max(jnp.abs(A)).astype(jnp.float32)
    normed = A.astype(jnp.float32) * _safe_inv(absmax)
    out = _encode_nearest(normed, mids, order)
    return out, (absmax, table)


def dequantize(A: jax.Array, state=None, absmax=None, code=None) -> jax.Array:
    if state is not None:
        absmax, code_arr = state
    else:
        code_arr = jnp.asarray(code if code is not None else _DEFAULT_8BIT_CODE, jnp.float32)
    return jnp.take(code_arr, A.astype(jnp.int32)) * absmax


def quantize_no_absmax(A: jax.Array, code: Optional[jax.Array] = None) -> jax.Array:
    _t, _s, order, mids = _code_arrays(code, "dynamic")
    return _encode_nearest(A.astype(jnp.float32), mids, order)


def dequantize_no_absmax(A: jax.Array, code: Optional[jax.Array] = None) -> jax.Array:
    code_arr = jnp.asarray(code if code is not None else _DEFAULT_8BIT_CODE, jnp.float32)
    return jnp.take(code_arr, A.astype(jnp.int32))


def estimate_quantiles(A: jax.Array, offset: Optional[float] = None, num_quantiles: int = 256) -> jax.Array:
    """Empirical quantiles of A at `num_quantiles` evenly spaced eCDF
    positions with tail offset (reference functional.py:559-622 approximates
    this with SRAM sampling; on TPU an exact sort is cheap)."""
    if offset is None:
        offset = 1.0 / (2.0 * num_quantiles)
    probs = jnp.linspace(offset, 1.0 - offset, num_quantiles)
    q = jnp.quantile(A.reshape(-1).astype(jnp.float32), probs)
    if num_quantiles < 256:
        q = jnp.pad(q, (0, 256 - num_quantiles))
    return q


# ---------------------------------------------------------------------------
# LLM.int8(): vector-wise int8 matmul with outlier decomposition
# (reference functional.py:2260-2936, autograd/_functions.py:292-483)
# ---------------------------------------------------------------------------


def get_colrow_absmax(
    A: jax.Array, threshold: float = 0.0
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-row and per-column absmax of a 2D array, plus the outlier-column
    mask. With threshold > 0, entries >= threshold are excluded from the
    row statistics (reference kernel_quant.cpp:3214-3379). A column is an
    outlier column iff its absmax >= threshold — identical to the
    reference's "columns containing any COO entry" rule
    (autograd/_functions.py:368-384).
    """
    absA = jnp.abs(A.astype(jnp.float32))
    col_absmax = jnp.max(absA, axis=0)
    if threshold > 0.0:
        outlier_cols = col_absmax >= threshold
        masked = jnp.where(absA >= threshold, 0.0, absA)
        row_absmax = jnp.max(masked, axis=1)
    else:
        outlier_cols = jnp.zeros(A.shape[1], dtype=bool)
        row_absmax = jnp.max(absA, axis=1)
    return row_absmax, col_absmax, outlier_cols


def int8_vectorwise_quant(A: jax.Array, axis: int = 1) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-vector int8 quantization: C = round(127 * A / absmax)."""
    absA = jnp.abs(A.astype(jnp.float32))
    absmax = jnp.max(absA, axis=axis, keepdims=True)
    C = jnp.clip(jnp.round(A.astype(jnp.float32) * (127.0 * _safe_inv(absmax))), -127, 127)
    return C.astype(jnp.int8), jnp.squeeze(absmax, axis=axis)


def int8_double_quant(
    A: jax.Array, threshold: float = 0.0
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Row- and column-wise int8 quantization with outlier-column removal.

    Returns (CA, CAt, SCA row stats, SCAt col stats, outlier_cols mask).
    Unlike the reference's dynamic-shape COO extraction
    (functional.py:2517-2604), outliers are reported as a static boolean
    column mask; entire outlier columns are zeroed in CA/CAt — exactly what
    MatMul8bitLt does post-hoc (autograd/_functions.py:380-384).
    """
    A32 = A.astype(jnp.float32)
    row_absmax, col_absmax, outlier_cols = get_colrow_absmax(A, threshold)
    if threshold > 0.0:
        keep = ~outlier_cols
        A_kept = A32 * keep[None, :].astype(jnp.float32)
        # row stats excluding outlier entries already computed by
        # get_colrow_absmax; col stats over kept columns unchanged.
        CA = jnp.clip(jnp.round(A_kept * (127.0 * _safe_inv(row_absmax))[:, None]), -127, 127)
        CAt = jnp.clip(jnp.round(A_kept * (127.0 * _safe_inv(col_absmax))[None, :]), -127, 127)
    else:
        CA = jnp.clip(jnp.round(A32 * (127.0 * _safe_inv(row_absmax))[:, None]), -127, 127)
        CAt = jnp.clip(jnp.round(A32 * (127.0 * _safe_inv(col_absmax))[None, :]), -127, 127)
    return CA.astype(jnp.int8), CAt.astype(jnp.int8), row_absmax, col_absmax, outlier_cols


def int8_linear_matmul(CA: jax.Array, CB: jax.Array) -> jax.Array:
    """INT8 GEMM on the MXU: (M,K) int8 x (N,K) int8 -> (M,N) int32.

    Replaces igemmlt + the col32/col_turing/col_ampere layout dance
    (reference op_gemm.cpp:541-655, functional.py:2260-2352): XLA/Mosaic
    manage tiling natively, so plain row-major int8 is the fast layout.
    """
    return jax.lax.dot_general(
        CA,
        CB,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def int8_mm_dequant(
    out32: jax.Array,
    SCA: jax.Array,
    SCB: jax.Array,
    bias: Optional[jax.Array] = None,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """int32 -> float epilogue with row*col rescale + fused bias
    (reference kernel_quant.cpp:3848-3990 kdequant_mm_int32_fp16)."""
    scale = (SCA.astype(jnp.float32)[:, None] * SCB.astype(jnp.float32)[None, :]) * (
        1.0 / (127.0 * 127.0)
    )
    out = out32.astype(jnp.float32) * scale
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out.astype(dtype)


def llm_int8_prepare_outliers(CB: jax.Array, SCB: jax.Array, outlier_idx: jax.Array) -> dict:
    """Precompute the static outlier-decomposition state for a weight.

    The reference caches exactly this after the first batch when
    has_fp16_weights=False (MatmulLtState.idx/subB, autograd/_functions.py
    :368-384): outlier columns are systematic per layer (LLM.int8 paper),
    so the column set is weight-lifetime state, not per-call work. Returns
    {"idx": (B,) int32, "keep": (K,) one-hot-complement mask, "subB":
    (B, N) f32 dequantized outlier weight columns}.
    """
    N, K = CB.shape
    idx = jnp.asarray(outlier_idx, jnp.int32)
    keep = jnp.ones((K,), jnp.float32).at[idx].set(0.0)
    subB = (
        jnp.take(CB, idx, axis=1).astype(jnp.float32) * (SCB.astype(jnp.float32)[:, None] / 127.0)
    ).T  # (B, N)
    return {"idx": idx, "keep": keep, "subB": subB}


def llm_int8_matmul(
    A: jax.Array,
    CB: jax.Array,
    SCB: jax.Array,
    threshold: float = 6.0,
    bias: Optional[jax.Array] = None,
    outlier_budget: int = 64,
    use_fused: Optional[bool] = None,
    outliers: Optional[dict] = None,
) -> jax.Array:
    """Full LLM.int8() forward: quantize activations row-wise, int8 GEMM
    against pre-quantized weights CB (N,K) with per-row scales SCB (N,),
    dequant epilogue, plus the fp16 outlier-column sidecar
    (autograd/_functions.py:292-434 steps 1-4 in ONE fused XLA computation).

    The reference builds a dynamic-shape COO of outliers at runtime
    (functional.py:2517-2604) — impossible under jit. Instead the
    `outlier_budget` columns with the largest absmax are gathered
    statically; only those >= threshold contribute (LLM.int8() finds <1%
    of dims systematic outliers, so a 64-column cap at K>=4096 is
    conservative). Sidecar traffic is M*budget + N*budget instead of a
    second full weight read.
    """
    orig_shape = A.shape
    K = orig_shape[-1]
    N = CB.shape[0]
    A2 = A.reshape(-1, K)
    out_dtype = jnp.result_type(A)

    if use_fused is None:
        from .ops.common import on_tpu

        use_fused = on_tpu()

    if threshold <= 0.0:
        if use_fused:
            from .ops.matmul_int8 import int8_matmul_fused

            row_absmax = jnp.max(jnp.abs(A2.astype(jnp.float32)), axis=1)
            out = int8_matmul_fused(A2, CB, SCB, row_absmax, bias=bias, out_dtype=out_dtype)
            if out is not None:
                return out.reshape(*orig_shape[:-1], N)
        CA, SCA = int8_vectorwise_quant(A2)
        out32 = int8_linear_matmul(CA, CB)
        out = int8_mm_dequant(out32, SCA, SCB, bias=bias, dtype=out_dtype)
        return out.reshape(*orig_shape[:-1], N)

    if outliers is not None:
        # static outlier set: no per-call top_k/scatter/column-gather of CB
        keep = outliers["keep"].astype(A2.dtype)
        x_kept = A2 * keep[None, :]
        row_absmax = jnp.max(jnp.abs(x_kept.astype(jnp.float32)), axis=1)
        out = None
        if use_fused:
            from .ops.matmul_int8 import int8_matmul_fused

            out = int8_matmul_fused(x_kept, CB, SCB, row_absmax, bias=bias, out_dtype=out_dtype)
        if out is None:
            CA = jnp.clip(
                jnp.round(x_kept.astype(jnp.float32) * (127.0 * _safe_inv(row_absmax))[:, None]),
                -127,
                127,
            ).astype(jnp.int8)
            out = int8_mm_dequant(int8_linear_matmul(CA, CB), row_absmax, SCB, bias=bias, dtype=out_dtype)
        subA = jnp.take(A2, outliers["idx"], axis=1).astype(jnp.float32)
        out = out + jnp.dot(
            subA, outliers["subB"], preferred_element_type=jnp.float32
        ).astype(out_dtype)
        return out.reshape(*orig_shape[:-1], N)

    budget = min(outlier_budget, K)
    absA = jnp.abs(A2.astype(jnp.float32))
    col_absmax = jnp.max(absA, axis=0)  # (K,)
    _top_vals, idx = jax.lax.top_k(col_absmax, budget)
    is_outlier = _top_vals >= threshold  # (budget,)

    # zero outlier columns for the int8 path (autograd/_functions.py:380-384)
    keep = jnp.ones((K,), jnp.float32).at[idx].multiply(1.0 - is_outlier.astype(jnp.float32))
    A_kept = A2.astype(jnp.float32) * keep[None, :]
    row_absmax = jnp.max(jnp.abs(A_kept), axis=1)
    # dynamic (per-call) outlier detection: the XLA path wins here —
    # feeding top_k-dependent gathers into the Pallas kernel measured 92us
    # vs 37us pure-XLA (pipeline break); with static `outliers` the fused
    # kernel wins (29us vs 48us bf16).
    CA = jnp.clip(
        jnp.round(A_kept * (127.0 * _safe_inv(row_absmax))[:, None]), -127, 127
    ).astype(jnp.int8)
    out32 = int8_linear_matmul(CA, CB)
    out = int8_mm_dequant(out32, row_absmax, SCB, bias=bias, dtype=out_dtype)

    # thin fp sidecar over the gathered outlier columns
    subA = jnp.take(A2, idx, axis=1).astype(jnp.float32) * is_outlier[None, :]
    subB = jnp.take(CB, idx, axis=1).astype(jnp.float32) * (
        SCB.astype(jnp.float32)[:, None] / 127.0
    )  # (N, budget), dequantized weight columns (extract_outliers equiv,
    #    functional.py:2914-2936 + _functions.py:377-384)
    out = out + jnp.dot(subA, subB.T, preferred_element_type=jnp.float32).astype(out_dtype)
    return out.reshape(*orig_shape[:-1], N)


# ---------------------------------------------------------------------------
# 4-bit inference matmul (reference functional.py:1961-2060 gemv_4bit,
# kernel_gemm.cpp:1273-1388 kgemm_4bit_inference_naive)
# ---------------------------------------------------------------------------


def matmul_4bit_ref(A: jax.Array, data: jax.Array, quant_state: QuantState, bias=None) -> jax.Array:
    """Reference path: dequantize W (out,in) then A @ W^T (+bias).
    (autograd/_functions.py:490-518 MatMul4Bit.forward)."""
    W = dequantize_4bit(data, quant_state).astype(jnp.result_type(A))
    out = jnp.matmul(A, W.T, preferred_element_type=jnp.float32).astype(jnp.result_type(A))
    if bias is not None:
        out = out + bias
    return out


_KERNEL_LAYOUT_CACHE: dict = {}


def _cached_kernel_layout(data: jax.Array, quant_state: QuantState):
    """Repack a concrete bnb-format weight into kernel layout ONCE, keyed
    by the packed array's identity (weakref-guarded against id reuse).
    The reference re-dispatches per call (_functions.py:565-575); here the
    one-time repack makes every later call hit the fused kernel with zero
    per-call overhead."""
    import weakref

    from .ops.common import to_kernel_layout

    key = (id(data), id(quant_state.absmax))
    hit = _KERNEL_LAYOUT_CACHE.get(key)
    if hit is not None:
        dref, aref, qw = hit
        if dref() is data and aref() is quant_state.absmax:
            return qw
    qw = to_kernel_layout(data, quant_state)
    try:
        drop = lambda _: _KERNEL_LAYOUT_CACHE.pop(key, None)
        _KERNEL_LAYOUT_CACHE[key] = (
            weakref.ref(data, drop),
            weakref.ref(quant_state.absmax, drop),
            qw,
        )
    except TypeError:
        pass  # not weakref-able (e.g. np arrays): recompute next time
    return qw


def _route_fused_4bit(A, data, quant_state: QuantState):
    """Fused-kernel dispatch for bnb-format 4-bit weights: returns the
    cached QLinearWeight when the fused path applies, else None.

    The reference auto-routes batch-1 inference to its fused GEMV
    (autograd/_functions.py:565-575); the TPU kernel handles any batch,
    so the only conditions are (a) the weight is a concrete array (a
    traced weight can't be repacked host-side — callers inside jit pass
    weights as arguments, where the dequant path fuses fine), and (b) the
    kernel layout's divisibility constraint holds."""
    if isinstance(data, jax.core.Tracer) or isinstance(quant_state.absmax, jax.core.Tracer):
        return None
    if quant_state.shape is None or len(quant_state.shape) != 2:
        return None
    N, K = quant_state.shape
    if K % (2 * quant_state.blocksize) != 0 or A.shape[-1] != K:
        return None
    return _cached_kernel_layout(data, quant_state)


def gemv_4bit(A: jax.Array, data: jax.Array, quant_state: QuantState, bias=None) -> jax.Array:
    """Fused dequant matvec/matmul (reference functional.py:1961-2060,
    kernel launch at :2008). Auto-routes to the Pallas kernel
    (ops/matmul_4bit.py) for concrete weights; traced weights take the
    XLA-fused dequant path."""
    qw = _route_fused_4bit(A, data, quant_state)
    if qw is not None:
        from .ops import matmul_4bit_fused

        return matmul_4bit_fused(A, qw, bias, compute_dtype=jnp.result_type(A))
    return matmul_4bit_ref(A, data, quant_state, bias)


# ---------------------------------------------------------------------------
# optimizer updates (reference kernel_quant.cpp:1500-3213, functional.py:
# 1526-1856). Functional: take states, return new states.
# ---------------------------------------------------------------------------


def _adam2(g, p, s1, s2, beta1, beta2, eps, step, lr, weight_decay):
    """(kernel_quant.cpp:1722-1734)"""
    c1 = 1.0 - beta1**step
    c2 = jnp.sqrt(1.0 - beta2**step)
    step_size = -lr * c2 / c1
    s1 = s1 * beta1 + (1.0 - beta1) * g
    s2 = s2 * beta2 + (1.0 - beta2) * g * g
    p = p + step_size * (s1 / (jnp.sqrt(s2) + eps * c2))
    if weight_decay > 0.0:
        p = p * (1.0 - lr * weight_decay)
    return p, s1, s2


def _momentum1(g, p, s1, beta1, eps, step, lr, weight_decay):
    """(kernel_quant.cpp:1964-1970)"""
    if weight_decay > 0.0:
        g = g + p * weight_decay
    s1 = jnp.where(step == 1, g, s1 * beta1 + g)
    p = p - lr * s1
    return p, s1


def _lion1(g, p, s1, beta1, beta2, eps, step, lr, weight_decay):
    """(kernel_quant.cpp:1972-1975); weight decay is coupled in the
    reference's 1-state loop (kernel_quant.cpp:1955-1957)."""
    if weight_decay > 0.0:
        g = g + p * weight_decay
    p = p - lr * jnp.sign(s1 * beta1 + (1.0 - beta1) * g)
    s1 = s1 * beta2 + (1.0 - beta2) * g
    return p, s1


def _rmsprop1(g, p, s1, beta1, eps, step, lr, weight_decay):
    """(kernel_quant.cpp:1977-1980)"""
    if weight_decay > 0.0:
        g = g + p * weight_decay
    s1 = s1 * beta1 + (1.0 - beta1) * g * g
    p = p - lr * g / (jnp.sqrt(s1) + eps)
    return p, s1


def _adagrad1(g, p, s1, beta1, eps, step, lr, weight_decay):
    """(kernel_quant.cpp:1982-1985)"""
    if weight_decay > 0.0:
        g = g + p * weight_decay
    s1 = s1 + g * g
    p = p - lr * g / (jnp.sqrt(s1) + eps)
    return p, s1


OPTIMIZER_FUNCS_2STATE = {"adam": _adam2, "lamb": _adam2}
OPTIMIZER_FUNCS_1STATE = {
    "momentum": _momentum1,
    "lion": _lion1,
    "rmsprop": _rmsprop1,
    "adagrad": _adagrad1,
}


def optimizer_update_32bit(
    optimizer_name: str,
    g: jax.Array,
    p: jax.Array,
    state1: jax.Array,
    state2: Optional[jax.Array],
    beta1: float,
    beta2: float = 0.0,
    eps: float = 1e-8,
    step: int = 1,
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    gnorm_scale: float = 1.0,
    max_unorm: float = 0.0,
    skip_zeros: bool = False,
):
    """32-bit fused optimizer step (reference kernel_quant.cpp:1500-2032).

    Returns (p, state1, state2). `max_unorm > 0` enables the reference's
    trust-ratio clipping (kPreconditionOptimizer32bit* unorm machinery,
    kernel_quant.cpp:1506-1614 + host param_norm, used by LAMB/LARS):
    the RAW (lr-less) update norm is clipped to max_unorm * ||p|| before
    the learning rate is applied — same two-pass math, fused in one jit.
    """
    gf = g.astype(jnp.float32) * gnorm_scale
    pf = p.astype(jnp.float32)
    if skip_zeros:
        nonzero = gf != 0.0

    def _clip(u):
        """update_scale for the raw update u (kOptimizer32bit* pass 2).
        The +eps floor matters: without it a zero-norm param (zero-init
        LoRA B, fresh classifier head) has limit 0 and can never move."""
        if max_unorm <= 0.0:
            return 1.0
        unorm = jnp.linalg.norm(u)
        pnorm = jnp.linalg.norm(pf)
        limit = max_unorm * pnorm + eps
        return jnp.where(unorm > limit, limit / jnp.maximum(unorm, 1e-12), 1.0)

    if optimizer_name in OPTIMIZER_FUNCS_2STATE:
        s1 = state1.astype(jnp.float32)
        s2 = state2.astype(jnp.float32)
        c1 = 1.0 - beta1**step
        c2 = jnp.sqrt(1.0 - beta2**step)
        new_s1 = s1 * beta1 + (1.0 - beta1) * gf
        new_s2 = s2 * beta2 + (1.0 - beta2) * gf * gf
        u = new_s1 / (jnp.sqrt(new_s2) + eps * c2)  # (kernel_quant.cpp:1722-1734)
        new_p = pf - (lr * c2 / c1) * _clip(u) * u
        if weight_decay > 0.0:
            new_p = new_p * (1.0 - lr * weight_decay)
        if skip_zeros:
            new_p = jnp.where(nonzero, new_p, pf)
            new_s1 = jnp.where(nonzero, new_s1, state1)
            new_s2 = jnp.where(nonzero, new_s2, state2)
        return new_p.astype(p.dtype), new_s1, new_s2

    s1 = state1.astype(jnp.float32)
    gw = gf + pf * weight_decay if weight_decay > 0.0 else gf
    if optimizer_name == "momentum":
        new_s1 = jnp.where(step == 1, gw, s1 * beta1 + gw)
        u = new_s1
        new_p = pf - lr * _clip(u) * u
    elif optimizer_name == "lion":
        u = jnp.sign(s1 * beta1 + (1.0 - beta1) * gw)
        new_p = pf - lr * _clip(u) * u
        new_s1 = s1 * beta2 + (1.0 - beta2) * gw
    elif optimizer_name == "rmsprop":
        new_s1 = s1 * beta1 + (1.0 - beta1) * gw * gw
        u = gw / (jnp.sqrt(new_s1) + eps)
        new_p = pf - lr * _clip(u) * u
    elif optimizer_name == "adagrad":
        new_s1 = s1 + gw * gw
        u = gw / (jnp.sqrt(new_s1) + eps)
        new_p = pf - lr * _clip(u) * u
    else:
        raise NotImplementedError(optimizer_name)
    if skip_zeros:
        new_p = jnp.where(nonzero, new_p, pf)
        new_s1 = jnp.where(nonzero, new_s1, state1)
    return new_p.astype(p.dtype), new_s1, None


def _optim8_fused_dispatch(
    optimizer_name, state1, absmax1, state2, absmax2,
    beta1, beta2, eps, step, lr, weight_decay, gnorm_scale,
    blocksize, nb, n, p_orig, g_orig, noise=None, qmap1=None, qmap2=None,
):
    """Route the 8-bit blockwise update to the fused Pallas kernel
    (ops/optim8.py) on TPU — dynamic codec by default, or in-kernel
    select trees over concrete ascending qmap1/qmap2 tables. Returns the
    standard 5-tuple or None to fall back to the XLA-fused codec path."""
    from .ops.common import on_tpu
    from .ops.optim8 import _ROWS, _ROWS_LUT, optim8_blockwise_fused

    if not on_tpu():
        return None
    two = optimizer_name in OPTIMIZER_FUNCS_2STATE
    if not two and optimizer_name not in ("momentum", "rmsprop", "adagrad", "lion"):
        return None

    # pad block count to the kernel's row tile
    _rows_tile = _ROWS_LUT if qmap1 is not None else _ROWS
    nbp = ((nb + _rows_tile - 1) // _rows_tile) * _rows_tile

    def _rows(x, fill=0):
        x = x.reshape(-1)
        need = nbp * blocksize - x.shape[0]
        if need:
            x = jnp.pad(x, (0, need), constant_values=fill)
        return x.reshape(nbp, blocksize)

    def _amax(a):
        a = a.astype(jnp.float32).reshape(-1)
        return jnp.pad(a, (0, nbp - nb), constant_values=1.0) if nbp > nb else a

    # note: gf/pf already flat+padded to nb*blocksize; scalars are
    # precomputed here so the kernel is pure elementwise (the reference
    # computes bias correction host-side too, kernel_quant.cpp:2741-2743)
    if two:
        c1 = 1.0 - beta1**step
        c2 = jnp.sqrt(1.0 - beta2**step)
        step_size = -lr * c2 / c1
        decay = 1.0 - lr * weight_decay if weight_decay > 0.0 else 1.0
        scalars = jnp.stack(
            [jnp.float32(beta1), jnp.float32(beta2), jnp.float32(eps) * c2,
             jnp.float32(step_size), jnp.float32(decay), jnp.float32(gnorm_scale),
             jnp.float32(0.0), jnp.float32(0.0)]
        )
        out = optim8_blockwise_fused(
            optimizer_name,
            _rows(g_orig.astype(jnp.float32)), _rows(p_orig.astype(jnp.float32)),
            _rows(state1.astype(jnp.uint8), 127), _amax(absmax1),
            _rows(state2.astype(jnp.uint8), 0), _amax(absmax2), scalars,
            u=None if noise is None else _rows(noise),
            qmap1=qmap1, qmap2=qmap2,
        )
        if out is None:
            return None
        po, s1c, a1, s2c, a2 = out
        return (
            po.reshape(-1)[:n].reshape(p_orig.shape).astype(p_orig.dtype),
            s1c.reshape(-1)[:n].reshape(state1.shape),
            a1[:nb],
            s2c.reshape(-1)[:n].reshape(state2.shape),
            a2[:nb],
        )
    is1 = jnp.float32(jnp.asarray(step) == 1)
    scalars = jnp.stack(
        [jnp.float32(beta1), jnp.float32(beta2), jnp.float32(eps),
         jnp.float32(lr), jnp.float32(weight_decay), jnp.float32(gnorm_scale),
         is1, jnp.float32(0.0)]
    )
    out = optim8_blockwise_fused(
        optimizer_name,
        _rows(g_orig.astype(jnp.float32)), _rows(p_orig.astype(jnp.float32)),
        _rows(state1.astype(jnp.uint8), 127), _amax(absmax1), None, None, scalars,
        u=None if noise is None else _rows(noise),
        qmap1=qmap1,
    )
    if out is None:
        return None
    po, s1c, a1 = out
    return (
        po.reshape(-1)[:n].reshape(p_orig.shape).astype(p_orig.dtype),
        s1c.reshape(-1)[:n].reshape(state1.shape),
        a1[:nb],
        None,
        None,
    )


def optimizer_update_8bit_blockwise(
    optimizer_name: str,
    g: jax.Array,
    p: jax.Array,
    state1: jax.Array,  # uint8
    absmax1: jax.Array,
    state2: Optional[jax.Array],  # uint8
    absmax2: Optional[jax.Array],
    qmap1: jax.Array,
    qmap2: Optional[jax.Array],
    beta1: float,
    beta2: float,
    eps: float,
    step: int,
    lr: float,
    weight_decay: float = 0.0,
    gnorm_scale: float = 1.0,
    skip_zeros: bool = False,
    blocksize: int = 2048,
    codec: Optional[str] = None,
    stochastic_rounding: bool = False,
):
    """Blockwise 8-bit optimizer step: decode uint8 states via
    qmap[c]*absmax, run the update, re-quantize per 2048-block
    (reference kernel_quant.cpp:2715-3213, the QLoRA Adam8bit).

    NaN/Inf gradients leave states/params untouched (matching
    kernel_quant.cpp:2820-2840). Returns (p, state1, absmax1, state2,
    absmax2).

    stochastic_rounding=True (dynamic codec only — the reference's dead
    STOCHASTIC template path, kernel N3) requantizes states with unbiased
    stochastic rounding over the dynamic grid; noise is keyed on `step`,
    so a step is deterministic given (state, step).
    """
    n = int(np.prod(g.shape))
    nb = blocks_for(n, blocksize)
    pad = nb * blocksize - n
    if codec is None and qmap1 is None:
        codec = "dynamic"  # no table given: the default dynamic maps

    def _padflat(x, dtype=jnp.float32):
        f = x.reshape(-1).astype(dtype)
        return jnp.pad(f, (0, pad)) if pad else f

    gf = _padflat(g) * gnorm_scale
    pf = _padflat(p)
    finite = jnp.isfinite(gf)
    gf = jnp.where(finite, gf, 0.0)

    if codec == "dynamic":
        # arithmetic codec (ops/dynamic8.py): the dynamic maps are analytic
        # minifloats, so decode/encode are pure VPU elementwise chains that
        # XLA fuses — no 256-entry gather / searchsorted (measured 4 orders
        # of magnitude faster on TPU for a 16M-param Adam8bit step). The
        # dynamic maps are already ascending-sorted, so stored codes are
        # identical between this path and the LUT path.
        from .ops.dynamic8 import dynamic_decode, dynamic_encode, stochastic_adjust

        noise = None
        if stochastic_rounding:
            noise = jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(0xB17B), jnp.asarray(step, jnp.int32)),
                (nb * blocksize,), jnp.float32,
            )
        fused = _optim8_fused_dispatch(
            optimizer_name, state1, absmax1, state2, absmax2,
            beta1, beta2, eps, step, lr, weight_decay, gnorm_scale,
            blocksize, nb, n, p, g, noise=noise,
        )
        if fused is not None:
            return fused

        def _decode(codes, absmax, signed):
            vals = dynamic_decode(_padflat(codes, jnp.int32).astype(jnp.uint8), signed=signed)
            return vals * jnp.repeat(absmax.astype(jnp.float32), blocksize)[: nb * blocksize]

        def _requant(s, signed):
            from .ops.optim8 import _apply_sign_fix

            blocks = s.reshape(-1, blocksize)
            amax = jnp.max(jnp.abs(blocks), axis=1)
            normed = blocks * _safe_inv(amax)[:, None]
            codes = dynamic_encode(normed, signed=signed)
            if noise is not None:
                u = noise.reshape(-1, blocksize)
                u = u if signed else jnp.mod(u * 0.6180339887 + 0.3819660113, 1.0)
                codes = stochastic_adjust(codes, normed, u, signed=signed)
            elif signed:
                # state1 sign preservation (kernel_quant.cpp:2935-2941),
                # matching the fused kernel's _DynamicCodec
                codes = _apply_sign_fix(codes, normed, n_neg=127, top=255).astype(jnp.uint8)
            return codes.reshape(-1), amax

        decode1 = functools.partial(_decode, signed=True)
        requant1 = functools.partial(_requant, signed=True)
        decode2 = functools.partial(_decode, signed=False)
        requant2 = functools.partial(_requant, signed=False)
    else:
        # custom-qmap (quantile / user-table) codec. The reference kernel
        # takes ANY smem codebook (kernel_quant.cpp:2715-2974); the TPU
        # equivalent is an in-kernel select tree over the table
        # (ops/lut8.py). A concrete strictly-ascending 256-entry map
        # dispatches to the SAME fused Pallas kernel as the dynamic codec
        # (ops/optim8.py qmap1=/qmap2=); traced tables, non-monotone maps
        # and stochastic rounding fall back to the XLA select-tree path
        # (still gather-free — searchsorted/take lowerings are ~4 orders
        # of magnitude off roofline on TPU, see ops/dynamic8.py).
        from .ops.lut8 import searchsorted_tree, take_tree
        from .ops.optim8 import _apply_sign_fix, lut_table_ok

        two = optimizer_name in OPTIMIZER_FUNCS_2STATE

        if stochastic_rounding:
            import warnings

            warnings.warn(
                "stochastic_rounding requires the dynamic codec; custom-qmap "
                "optimizer states requantize deterministically (round-to-nearest)",
                stacklevel=2,
            )

        def _concrete(q):
            if q is None:
                return None
            try:
                return np.asarray(q, np.float32)
            except (jax.errors.TracerArrayConversionError, jax.errors.ConcretizationTypeError):
                return None

        q1_np = _concrete(qmap1)
        q2_np = _concrete(qmap2) if two else None
        if (
            lut_table_ok(q1_np)
            and (not two or lut_table_ok(q2_np))
            and not stochastic_rounding
        ):
            fused = _optim8_fused_dispatch(
                optimizer_name, state1, absmax1, state2, absmax2,
                beta1, beta2, eps, step, lr, weight_decay, gnorm_scale,
                blocksize, nb, n, p, g, qmap1=q1_np, qmap2=q2_np,
            )
            if fused is not None:
                return fused

        def _codec_xla(qmap, q_np, sign_fix=False):
            # matches ops/optim8._LutCodec: ascending concrete tables
            # dedupe (zero-pad convention) and encode to the FIRST index
            # of each duplicate run; the state1 sign fix runs in
            # unique-rank space (kernel_quant.cpp:2935-2941)
            if q_np is not None and np.all(np.diff(q_np) >= 0):
                q = q_np
                uq, rep = np.unique(q_np, return_index=True)
                mids = ((uq[1:] + uq[:-1]) / 2.0).astype(np.float32)
                order = rep.astype(np.int32)
                n_neg = int(np.signbit(uq).sum())
                top = uq.size - 1
                identity = uq.size == 256
            elif q_np is not None:
                q = q_np
                order = np.argsort(q, kind="stable").astype(np.int32)
                sc = q[order]
                mids = ((sc[1:] + sc[:-1]) / 2.0).astype(np.float32)
                n_neg = int(np.signbit(sc).sum())
                top = sc.shape[0] - 1
                identity = bool(np.array_equal(order, np.arange(q.shape[0])))
            else:
                q = jnp.asarray(qmap, jnp.float32)
                order = jnp.argsort(q)
                sc = q[order]
                mids = (sc[1:] + sc[:-1]) / 2.0
                n_neg = jnp.sum(jnp.signbit(sc))
                top = sc.shape[0] - 1
                identity = False

            def decode(codes, absmax):
                vals = take_tree(_padflat(codes, jnp.int32).astype(jnp.int32), q)
                return vals * jnp.repeat(
                    absmax.astype(jnp.float32), blocksize
                )[: nb * blocksize]

            def requant(s):
                blocks = s.reshape(-1, blocksize)
                amax = jnp.max(jnp.abs(blocks), axis=1)
                normed = blocks * _safe_inv(amax)[:, None]
                rank = searchsorted_tree(normed, mids, side="left")
                if sign_fix:
                    rank = _apply_sign_fix(rank, normed, n_neg, top)
                codes = rank if identity else take_tree(rank, order)
                return codes.astype(jnp.uint8).reshape(-1), amax

            return decode, requant

        decode1, requant1 = _codec_xla(qmap1, q1_np, sign_fix=True)
        if two:
            decode2, requant2 = _codec_xla(qmap2, q2_np)

    s1 = decode1(state1, absmax1)
    if optimizer_name in OPTIMIZER_FUNCS_2STATE:
        s2 = decode2(state2, absmax2)
        new_p, new_s1, new_s2 = _adam2(gf, pf, s1, s2, beta1, beta2, eps, step, lr, weight_decay)
        new_p = jnp.where(finite, new_p, pf)
        new_s1 = jnp.where(finite, new_s1, s1)
        new_s2 = jnp.where(finite, new_s2, s2)
        c1, a1 = requant1(new_s1)
        c2, a2 = requant2(new_s2)
        out_p = new_p[:n].reshape(p.shape).astype(p.dtype)
        return out_p, c1[:n].reshape(state1.shape), a1, c2[:n].reshape(state2.shape), a2

    fn = OPTIMIZER_FUNCS_1STATE[optimizer_name]
    if optimizer_name == "lion":
        new_p, new_s1 = fn(gf, pf, s1, beta1, beta2, eps, step, lr, weight_decay)
    else:
        new_p, new_s1 = fn(gf, pf, s1, beta1, eps, step, lr, weight_decay)
    new_p = jnp.where(finite, new_p, pf)
    new_s1 = jnp.where(finite, new_s1, s1)
    c1, a1 = requant1(new_s1)
    out_p = new_p[:n].reshape(p.shape).astype(p.dtype)
    return out_p, c1[:n].reshape(state1.shape), a1, None, None


def optimizer_update_8bit_blockwise_sharded(
    optimizer_name: str,
    g: jax.Array,
    p: jax.Array,
    state1: jax.Array,
    absmax1: jax.Array,
    state2: Optional[jax.Array],
    absmax2: Optional[jax.Array],
    qmap1: Optional[jax.Array],
    qmap2: Optional[jax.Array],
    beta1: float,
    beta2: float,
    eps: float,
    step: int,
    lr: float,
    mesh,
    axis: str = "data",
    weight_decay: float = 0.0,
    gnorm_scale: float = 1.0,
    blocksize: int = 2048,
    codec: Optional[str] = None,
    stochastic_rounding: bool = False,
):
    """`optimizer_update_8bit_blockwise` under shard_map over a mesh axis.

    A pallas_call under plain pjit is OPAQUE to the partitioner: with
    dp-sharded optimizer states the fused kernel would force an
    all-gather onto one device. The blockwise update is elementwise per
    2048-block, so sharding dim 0 (row-major: contiguous flat ranges) is
    exact as long as each device's element count is a multiple of the
    blocksize — every device runs the fused kernel on its local blocks
    and nothing moves. Same returns as the unsharded call, with outputs
    sharded like the inputs.
    """
    from jax.experimental.shard_map import shard_map

    ndev = mesh.shape[axis]
    n = int(np.prod(g.shape))
    if g.shape[0] % ndev != 0:
        raise ValueError(f"dim0 ({g.shape[0]}) must divide by mesh axis {axis} ({ndev})")
    if (n // ndev) % blocksize != 0:
        raise ValueError(
            f"per-device size ({n // ndev}) must be a multiple of blocksize "
            f"({blocksize}) so quantization blocks never cross shards"
        )
    from jax.sharding import PartitionSpec as _P

    def dim0(x):
        return _P(*((axis,) + (None,) * (x.ndim - 1)))

    two = state2 is not None

    if two:
        def body(g, p, s1, a1, s2, a2):
            return optimizer_update_8bit_blockwise(
                optimizer_name, g, p, s1, a1, s2, a2, qmap1, qmap2,
                beta1, beta2, eps, step, lr, weight_decay=weight_decay,
                gnorm_scale=gnorm_scale, blocksize=blocksize, codec=codec,
                stochastic_rounding=stochastic_rounding,
            )

        specs = (dim0(g), dim0(p), dim0(state1), _P(axis), dim0(state2), _P(axis))
        out_specs = (dim0(p), dim0(state1), _P(axis), dim0(state2), _P(axis))
        fn = shard_map(body, mesh=mesh, in_specs=specs, out_specs=out_specs, check_rep=False)
        return fn(g, p, state1, absmax1, state2, absmax2)

    def body1(g, p, s1, a1):
        out = optimizer_update_8bit_blockwise(
            optimizer_name, g, p, s1, a1, None, None, qmap1, qmap2,
            beta1, beta2, eps, step, lr, weight_decay=weight_decay,
            gnorm_scale=gnorm_scale, blocksize=blocksize, codec=codec,
            stochastic_rounding=stochastic_rounding,
        )
        return out[0], out[1], out[2]

    specs = (dim0(g), dim0(p), dim0(state1), _P(axis))
    out_specs = (dim0(p), dim0(state1), _P(axis))
    fn = shard_map(body1, mesh=mesh, in_specs=specs, out_specs=out_specs, check_rep=False)
    new_p, c1, a1 = fn(g, p, state1, absmax1)
    return new_p, c1, a1, None, None


def optimizer_update_8bit(
    optimizer_name: str,
    g: jax.Array,
    p: jax.Array,
    state1: jax.Array,
    state2: Optional[jax.Array],
    beta1: float,
    beta2: float,
    eps: float,
    step: int,
    lr: float,
    qmap1: Optional[jax.Array] = None,
    qmap2: Optional[jax.Array] = None,
    max1: Optional[jax.Array] = None,
    max2: Optional[jax.Array] = None,
    weight_decay: float = 0.0,
    gnorm_scale: float = 1.0,
    codec: Optional[str] = None,
):
    """Non-blockwise (global-max) 8-bit optimizer step — the reference's
    static-quantization kernels N8 (kernel_quant.cpp:2034-2652,
    functional.py:1621-1751). Per-tensor dynamic quantization is exactly
    blockwise quantization with one block spanning the tensor, so this
    delegates with blocksize=n; `max1`/`max2` are the reference's
    per-tensor scale scalars (shape (1,)).

    Returns (p, state1, new_max1, state2, new_max2).

    Semantic note (checkpoint interop): the reference's static kernels
    track a RUNNING new_max updated from the beta-decayed state before
    the step (kernel_quant.cpp:2034-2652 precondition/update pairs);
    this path recomputes a fresh absmax of the post-update state each
    step. The stored codes decode to the same values (tested to the
    reference envelope), but the returned new_max1/new_max2 are a
    different quantity than torch-bnb's max1/max2 — round-tripping an
    8-bit-STATIC optimizer checkpoint from torch bnb will re-derive
    scales on the first step here rather than continue the running ones.
    The blockwise path (the QLoRA default) has no such drift: its absmax
    is per-block and recomputed by both implementations.
    """
    n = int(np.prod(g.shape))
    bs = ((n + 2047) // 2048) * 2048  # one block covering the tensor
    m1 = max1.reshape(1) if max1 is not None else jnp.zeros((1,), jnp.float32)
    m2 = max2.reshape(1) if max2 is not None else (
        jnp.zeros((1,), jnp.float32) if state2 is not None else None
    )
    return optimizer_update_8bit_blockwise(
        optimizer_name, g, p, state1, m1, state2, m2, qmap1, qmap2,
        beta1, beta2, eps, step, lr,
        weight_decay=weight_decay, gnorm_scale=gnorm_scale,
        blocksize=bs, codec=codec,
    )


def percentile_clipping(
    grad_norm: jax.Array, gnorm_vec: jax.Array, step: int, percentile: int = 5
) -> Tuple[jax.Array, jax.Array]:
    """Running 100-step gradient-norm history clipping
    (reference kernel_quant.cpp:2652-2710, functional.py:1817-1856).

    Returns (new gnorm_vec, gnorm_scale). gnorm_vec holds squared norms.
    """
    g2 = grad_norm.astype(jnp.float32) ** 2
    idx = (step - 1) % 100
    new_vec = gnorm_vec.at[idx].set(g2)
    vals = jnp.sort(new_vec)
    # reference: current_gnorm / sqrt(vals[percentile-th smallest nonzero])
    # use the percentile of the filled window
    filled = jnp.minimum(step, 100)
    clip2 = jnp.sort(jnp.where(new_vec > 0, new_vec, jnp.inf))[
        jnp.clip(percentile * filled // 100, 0, 99)
    ]
    clip2 = jnp.where(jnp.isfinite(clip2), clip2, g2)
    gnorm = jnp.sqrt(g2)
    clip = jnp.sqrt(clip2)
    gnorm_scale = jnp.where(gnorm > clip, clip / gnorm, 1.0)
    return new_vec, gnorm_scale


def histogram_scatter_add_2d(hist: jax.Array, index1: jax.Array, index2: jax.Array, src: jax.Array) -> jax.Array:
    """hist[i1, i2] += src, scatter-add (reference kernel_quant.cpp:939-954)."""
    return hist.at[index1, index2].add(src)
