"""Quantization codebook (quant-map) construction.

TPU-native re-implementation of the reference codebook builders
(reference: python_src_quants/functional.py:248-407 and :1020-1099).
All builders run on host in numpy and return float32 numpy arrays; callers
move them to device as needed. Codebooks are tiny (<=256 entries) and are
treated as compile-time constants inside Pallas kernels.

Codebook conventions (shared with bitsandbytes so checkpoints interop):
- 8-bit codebooks are length-256, sorted ascending, normalized to [-1, 1].
- 4-bit codebooks are length-16 in *code order* (index = 4-bit code), not
  necessarily sorted (FP4 is non-monotone; NF4/int4/af4 are monotone).
"""

from __future__ import annotations

import functools
import itertools

import numpy as np
from scipy.stats import norm

__all__ = [
    "create_dynamic_map",
    "create_linear_map",
    "create_normal_map",
    "create_fp8_map",
    "create_quantile_map",
    "get_4bit_type",
    "code_midpoints",
    "NF4_CODE",
    "FP4_CODE",
    "FP4_SORT_ORDER",
]


# NF4 data type of the QLoRA paper (https://arxiv.org/abs/2305.14314).
# Equal-area bins under N(0,1), normalized to [-1, 1]; index == 4-bit code.
# (reference: python_src_quants/functional.py:1035-1052)
NF4_CODE = np.array(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.44070982933044434,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    dtype=np.float32,
)

# FP4 (e2m1, bias 3) in code order, normalized by its absmax (12).
# Non-monotone: code 0b010 = 8/12, 0b011 = 12/12, etc.
# (reference: python_src_quants/functional.py:1054-1063)
FP4_CODE = (
    np.array([0.0, 0.0625, 8.0, 12.0, 4.0, 6.0, 2.0, 3.0], dtype=np.float32) / 12.0
)
FP4_CODE = np.concatenate([FP4_CODE, -FP4_CODE]).astype(np.float32)

# argsort of |FP4 positive half| — maps sorted-value rank -> 3-bit code.
FP4_SORT_ORDER = np.argsort(FP4_CODE[:8]).astype(np.int32)  # value-ascending codes

# AF4 from "NF4 Isn't Information Theoretically Optimal" (arxiv 2306.06965),
# blocksize-64 table; stored in code order like the reference (reversed paper
# order, reference: python_src_quants/functional.py:1066-1090).
_AF4_RAW = np.array(
    [
        -1.0,
        -0.69441008,
        -0.51243739,
        -0.3736951,
        -0.25607552,
        -0.14982478,
        -0.04934812,
        0.0,
        0.04273164,
        0.12934483,
        0.21961274,
        0.31675666,
        0.42563882,
        0.55496234,
        0.72424863,
        1.0,
    ],
    dtype=np.float32,
)[::-1]


def _pad_sorted_to_256(values: list[float]) -> np.ndarray:
    """Pad a sub-256 codebook with zeros and sort — matches the reference's
    convention of simulating <8-bit types inside a 256-entry table."""
    values = list(values)
    values.extend([0.0] * (256 - len(values)))
    return np.sort(np.asarray(values, dtype=np.float32))


@functools.lru_cache(maxsize=None)
def create_dynamic_map(signed: bool = True, max_exponent_bits: int = 7, total_bits: int = 8) -> np.ndarray:
    """Dynamic-exponent 8-bit data type ("8-Bit Approximations for
    Parallelism in Deep Learning", arxiv 1511.04561).

    One sign bit (if signed), a dynamic unary exponent prefix, and linear
    fraction bits. Returned sorted ascending, length 256.
    (reference: python_src_quants/functional.py:339-392)
    """
    non_sign_bits = total_bits - 1
    additional_items = 2 ** (non_sign_bits - max_exponent_bits) - 1
    data: list[float] = []
    for i in range(max_exponent_bits):
        if signed:
            n_frac = 2 ** (i + non_sign_bits - max_exponent_bits)
        else:
            n_frac = 2 ** (i + non_sign_bits - max_exponent_bits + 1)
        boundaries = np.linspace(0.1, 1.0, n_frac + 1)
        means = (boundaries[:-1] + boundaries[1:]) / 2.0
        scale = 10.0 ** (-(max_exponent_bits - 1) + i)
        data.extend((scale * means).tolist())
        if signed:
            data.extend((-scale * means).tolist())
    if additional_items > 0:
        boundaries = np.linspace(0.1, 1.0, additional_items + 1)
        means = (boundaries[:-1] + boundaries[1:]) / 2.0
        scale = 10.0 ** (-(max_exponent_bits - 1) + (max_exponent_bits - 1))
        data.extend((scale * means).tolist())
        if signed:
            data.extend((-scale * means).tolist())
    data.append(0.0)
    data.append(1.0)
    assert len(data) == 2**total_bits
    return _pad_sorted_to_256(data)


@functools.lru_cache(maxsize=None)
def create_linear_map(signed: bool = True, total_bits: int = 8, add_zero: bool = True) -> np.ndarray:
    """Evenly-spaced codebook over [-1, 1] (or [0, 1] unsigned).
    (reference: python_src_quants/functional.py:248-264)"""
    sign = -1.0 if signed else 0.0
    total_values = 2**total_bits
    if add_zero or total_bits < 8:
        total_values = 2**total_bits if not signed else 2**total_bits - 1
    values = np.linspace(sign, 1.0, total_values, dtype=np.float64)
    gap = 256 - values.size
    if gap == 0:
        return values.astype(np.float32)
    half = values.size // 2
    out = np.concatenate([values[:half], np.zeros(gap), values[half:]])
    return out.astype(np.float32)


@functools.lru_cache(maxsize=None)
def create_normal_map(offset: float = 0.9677083, use_extra_value: bool = True) -> np.ndarray:
    """The 256-entry normal-float map NF4 is derived from: quantiles of N(0,1)
    with `offset` tail mass, asymmetric extra positive value.
    (reference: python_src_quants/functional.py:267-292)"""
    if use_extra_value:
        v1 = norm.ppf(np.linspace(offset, 0.5, 9)[:-1]).tolist()
        v2 = [0.0] * (256 - 15)
        v3 = (-norm.ppf(np.linspace(offset, 0.5, 8)[:-1])).tolist()
    else:
        v1 = norm.ppf(np.linspace(offset, 0.5, 8)[:-1]).tolist()
        v2 = [0.0] * (256 - 14)
        v3 = (-norm.ppf(np.linspace(offset, 0.5, 8)[:-1])).tolist()
    values = np.sort(np.asarray(v1 + v2 + v3))
    values = values / values.max()
    assert values.size == 256
    return values.astype(np.float32)


@functools.lru_cache(maxsize=None)
def create_fp8_map(signed: bool = True, exponent_bits: int = 5, precision_bits: int = 2, total_bits: int = 8) -> np.ndarray:
    """Generic ExMy float map, normalized to [-1, 1], zero-padded to 256.
    (reference: python_src_quants/functional.py:296-336)"""
    e, p = exponent_bits, precision_bits
    has_sign = 1 if signed else 0
    assert e + p == total_bits - has_sign
    bias = 2 ** (e - 1)
    values: list[float] = []
    bit_patterns = list(itertools.product([0, 1], repeat=p))
    for evalue in range(2**e):
        for pattern in bit_patterns:
            value = 1.0 if evalue != 0 else 0.0
            for i, pbit in enumerate(pattern):
                value += pbit * 2.0 ** (-(i + 1))
            if evalue == 0:
                value = value * 2.0 ** (-bias)  # subnormals
            else:
                value = value * 2.0 ** (-(evalue - bias - 1))  # normals
            values.append(value)
            if signed:
                values.append(-value)
    assert len(values) == 2**total_bits
    values.sort()
    if total_bits < 8:
        values.extend([0.0] * (256 - len(values)))
    code = np.sort(np.asarray(values))
    code = code / code.max()
    return code.astype(np.float32)


def create_quantile_map(A: np.ndarray, total_bits: int = 8) -> np.ndarray:
    """Codebook from the empirical quantiles of `A`.
    (reference: python_src_quants/functional.py:394-407)"""
    n_q = 2**total_bits - 1
    # eCDF offset convention matches estimate_quantiles (functional.py:559-622)
    probs = (np.arange(n_q) + 0.5) / n_q
    q = np.quantile(np.asarray(A, dtype=np.float32).ravel(), probs).tolist()
    q.append(0.0)
    q.extend([0.0] * (256 - len(q)))
    q = np.sort(np.asarray(q))
    return (q / np.abs(q).max()).astype(np.float32)


def get_4bit_type(typename: str, blocksize: int = 64) -> np.ndarray:
    """Return a 16-entry 4-bit codebook in code order, normalized to [-1, 1].
    (reference: python_src_quants/functional.py:1020-1099)"""
    if typename == "nf4":
        data = NF4_CODE
    elif typename == "fp4":
        data = FP4_CODE
    elif typename == "int4":
        data = np.array(
            [7, 6, 5, 4, 3, 2, 1, 0, -0.0, -1, -2, -3, -4, -5, -6, -7],
            dtype=np.float32,
        )
    elif typename == "af4":
        if blocksize != 64:
            raise NotImplementedError("AF4 only supports blocksize 64.")
        data = _AF4_RAW
    else:
        raise NotImplementedError(f"4-bit type {typename!r} not supported")
    data = np.asarray(data, dtype=np.float32)
    data = data / np.abs(data).max()
    assert data.size == 16
    return data


def code_midpoints(code_sorted: np.ndarray) -> np.ndarray:
    """Midpoints between adjacent sorted codebook entries — the decision
    boundaries for round-to-nearest quantization. For a length-n codebook
    returns n-1 thresholds; `searchsorted(mid, x, side='left')` reproduces
    the reference's strict-`>` decision trees (kernel_quant.cpp:705-756 NF4,
    :547-592 FP4): ties at a midpoint go to the lower code.
    """
    code_sorted = np.asarray(code_sorted, dtype=np.float32)
    return ((code_sorted[1:] + code_sorted[:-1]) / 2.0).astype(np.float32)
