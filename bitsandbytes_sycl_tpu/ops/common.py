"""Shared kernel utilities: LUT decode, layouts, TPU detection.

Layout design (TPU-first, replaces the reference's col32/col_turing/
col_ampere zoo, functional.py:2607-2653):

A 4-bit linear weight W of logical shape (N out, K in), quantized in
blocks of `blocksize` along K, is stored for kernels as:

- ``packed``: uint8 (K//2, N), **transposed planar**: byte (j, n) holds
  the code of element (n, j) in the high nibble and element (n, j + K//2)
  in the low nibble. Unpacking a tile yields two contiguous K-slices — no
  lane interleave, which Mosaic cannot do cheaply. (bnb's paired packing,
  kernel_quant.cpp:1337-1348, interleaves even/odd elements; conversion
  between the two is a lossless repack done once at load.) The transpose
  puts quantization blocks on SUBLANES so per-block scales expand with a
  cheap sublane repeat and each tile needs one full-depth MXU dot.
- ``absmax``: float32 (2, K//(2*blocksize), N): absmax[0] holds the block
  scales of the hi plane (elements [0, K/2)), absmax[1] the lo plane.
  This makes row (K) sharding congruent: P("model", None) on packed pairs
  with P(None, "model", None) on absmax — every device gets matching
  byte rows and scale blocks for its two K-slices.
- compressed statistics (the reference's nested/double quantization,
  functional.py:1243-1257): ``absmax`` is instead uint8 dynamic-map codes
  with f32 ``absmax_scale``/``absmax_offset`` sidecars of shape (2, 1, N)
  — one (range, mean) pair per (plane, output column), so the secondary
  level shards congruently too (column sharding splits N; row sharding
  replicates the tiny sidecars). Scales decode arithmetically in-kernel
  (ops/dynamic8.py — no gather), cutting scale HBM traffic 4x vs f32.

This requires K % (2*blocksize) == 0 — true for every transformer dim;
other shapes fall back to the jnp reference path.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import codebooks
from ..types import QuantState

__all__ = [
    "on_tpu",
    "lut16",
    "QLinearWeight",
    "quantize_4bit_native",
    "to_kernel_layout",
    "pick_tile",
    "safe_inv",
    "compress_absmax",
    "decode_absmax",
]


def on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def interpret_mode() -> bool:
    """Pallas kernels run interpreted off-TPU (CPU tests)."""
    return not on_tpu()


def pick_tile(dim: int, candidates) -> Optional[int]:
    """Largest candidate dividing dim, or None (dim == 0 is untileable:
    0 % c == 0 would otherwise claim every candidate fits an empty axis)."""
    if dim <= 0:
        return None
    for c in candidates:
        if dim % c == 0:
            return c
    return None


def safe_inv(x: jax.Array) -> jax.Array:
    """1/x with 0 -> 0. The inner where keeps the untaken branch NaN-free
    under XLA (plain where(x>0, 1/x, 0) still computes 1/0)."""
    return jnp.where(x > 0, 1.0 / jnp.where(x > 0, x, 1.0), 0.0)


def lut16(idx: jax.Array, table, dtype=jnp.float32, bit_base: int = 0) -> jax.Array:
    """Exact 16-entry LUT decode as a 4-level select tree — the
    vectorizable TPU replacement for the reference's per-thread decision
    trees (kernel_quant.cpp:520-756) and for gather (unsupported on VPU).

    Bit-masks are hoisted: 4 compares + 15 selects per element.
    `table` is a static 16-sequence in code order. With dtype=bfloat16 the
    selects run on 16-bit lanes (2x VPU packing); LUT entries round to
    bf16, which the dot would do anyway for a bf16 matmul.

    `bit_base` reads the nibble from bits [bit_base, bit_base+4) of `idx`
    without shifting — int16 lacks shrsi on the VPU, and bit-test masks
    are offset-invariant anyway.
    """
    vals = [jnp.asarray(float(v), dtype) for v in table]
    assert len(vals) == 16
    zero = jnp.asarray(0, idx.dtype)
    bits = [(idx & jnp.asarray(1 << (bit_base + b), idx.dtype)) != zero for b in range(4)]

    def level(vs, b):
        if len(vs) == 1:
            return vs[0]
        half = len(vs) // 2
        lo = level(vs[:half], b - 1)
        hi = level(vs[half:], b - 1)
        return jnp.where(bits[b], hi, lo)

    return level(vals, 3)


def compress_absmax(absmax: jax.Array):
    """Compress f32 per-plane scales (2, nbh, N) to uint8 dynamic-map codes
    + per-(plane, column) f32 (range, mean) sidecars of shape (2, 1, N).

    The reference's nested statistics (functional.py:1243-1257) subtract a
    scalar mean offset and requantize absmax 8-bit blockwise (blocksize
    256, dynamic signed map); here the secondary blocking is per output
    column — the TPU-layout-native grouping, so the sidecars shard with N
    and the codes decode identically on every row shard.
    """
    from .dynamic8 import dynamic_encode

    a = absmax.astype(jnp.float32)
    offset = jnp.mean(a, axis=1, keepdims=True)  # (2, 1, N)
    centered = a - offset
    scale = jnp.max(jnp.abs(centered), axis=1, keepdims=True)  # (2, 1, N)
    codes = dynamic_encode(centered * safe_inv(scale), signed=True)
    return codes, scale, offset


def decode_absmax(codes: jax.Array, scale: jax.Array, offset: jax.Array) -> jax.Array:
    """Inverse of compress_absmax; pure elementwise (inlines into Pallas)."""
    from .dynamic8 import dynamic_decode

    return dynamic_decode(codes, signed=True) * scale + offset


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["packed", "absmax", "absmax_scale", "absmax_offset"],
    meta_fields=["shape", "blocksize", "quant_type", "dtype"],
)
@dataclasses.dataclass(frozen=True)
class QLinearWeight:
    """Kernel-layout 4-bit linear weight (see module docstring)."""

    packed: jax.Array  # uint8 (K//2, N), transposed planar
    absmax: jax.Array  # f32 (2, K//(2*blocksize), N) scales, or uint8 codes
    shape: Tuple[int, int]  # (N, K)
    blocksize: int
    quant_type: str
    dtype: str  # original dtype name
    # compressed statistics only (absmax is uint8 codes): per-(plane,
    # column) f32 (2, 1, N) range / mean sidecars
    absmax_scale: Optional[jax.Array] = None
    absmax_offset: Optional[jax.Array] = None

    @property
    def compressed(self) -> bool:
        return self.absmax_scale is not None

    @property
    def code(self) -> np.ndarray:
        return codebooks.get_4bit_type(self.quant_type, blocksize=self.blocksize)

    def scales_f32(self) -> jax.Array:
        """Per-plane f32 scales (2, nbh, N), decoding compression if any."""
        if self.compressed:
            return decode_absmax(self.absmax, self.absmax_scale, self.absmax_offset)
        return self.absmax.astype(jnp.float32)

    def dequantize(self) -> jax.Array:
        N, K = self.shape
        b = self.packed.astype(jnp.int32)  # (K//2, N)
        hi = lut16(b >> 4, self.code)  # elements [0, K/2)
        lo = lut16(b & 0xF, self.code)  # elements [K/2, K)
        w_t = jnp.concatenate([hi, lo], axis=0)  # (K, N)
        amax = self.scales_f32()
        scale = jnp.repeat(amax.reshape(K // self.blocksize, N), self.blocksize, axis=0)
        return (w_t * scale).T.astype(jnp.dtype(self.dtype))  # (N, K)


def quantize_4bit_native(
    W: jax.Array,
    blocksize: int = 64,
    quant_type: str = "nf4",
    compress_statistics: bool = False,
    absmax_dtype=jnp.float32,
) -> QLinearWeight:
    """Quantize a (N, K) weight directly into kernel layout.

    Matches the reference's numerics exactly (same codebooks, same
    round-to-nearest midpoint rule) — only the storage order differs.
    compress_statistics stores the per-block scales as 8-bit dynamic-map
    codes (the reference's nested quantization, functional.py:1243-1257)
    decoded in-kernel — 4x less scale memory, ~7% kernel-time cost on v5e
    (measured; the arithmetic decode, not the bytes, is the cost).
    absmax_dtype=jnp.bfloat16 instead halves scale memory at ZERO kernel
    cost (the kernel casts scales to its decode dtype anyway) — the
    perf-safe default for serving configs.
    """
    from .. import functional as F

    N, K = W.shape
    if K % (2 * blocksize) != 0:
        raise ValueError(f"K={K} must be divisible by 2*blocksize={2*blocksize}")
    table, _s, order, mids = F._code_arrays(None, quant_type)
    Wf = W.astype(jnp.float32)
    blocks = Wf.reshape(N, K // blocksize, blocksize)
    absmax = jnp.max(jnp.abs(blocks), axis=2)  # (N, K//bs)
    normed = blocks * F._safe_inv(absmax)[:, :, None]
    amax = absmax.T.reshape(2, K // (2 * blocksize), N)
    am_scale = am_offset = None
    if compress_statistics or jnp.dtype(absmax_dtype) != jnp.float32:
        if compress_statistics:
            amax, am_scale, am_offset = compress_absmax(amax)
            dec = decode_absmax(amax, am_scale, am_offset)
        else:
            amax = amax.astype(absmax_dtype)
            dec = amax.astype(jnp.float32)
        # re-normalize against the DECODED scales so the nibble codes
        # absorb the scale-quantization error where they can
        absmax_d = dec.reshape(K // blocksize, N).T  # (N, K//bs)
        normed = blocks * F._safe_inv(absmax_d)[:, :, None]
        normed = jnp.clip(normed, -1.0, 1.0)
    codes = F._encode_nearest(normed.reshape(N, K), mids, order)
    packed = (codes[:, : K // 2].T << 4 | codes[:, K // 2 :].T).astype(jnp.uint8)
    return QLinearWeight(
        packed=packed,
        absmax=amax,
        shape=(N, K),
        blocksize=blocksize,
        quant_type=quant_type,
        dtype=str(jnp.result_type(W).name),
        absmax_scale=am_scale,
        absmax_offset=am_offset,
    )


def to_kernel_layout(
    data: jax.Array, quant_state: QuantState, compress: Optional[bool] = None
) -> QLinearWeight:
    """Lossless repack of a bnb-format 4-bit weight (paired flat packing +
    flat absmax, functional.py:1124-1269) into kernel layout.

    `compress` keeps the scales 8-bit in kernel layout (default: inherit
    the QuantState's own nested/compressed setting). The nibble codes are
    always preserved exactly; compressed scales are re-encoded in the
    kernel-native per-column grouping (see compress_absmax) — same codec,
    same precision class as the bnb nested format they came from.
    """
    from .. import functional as F

    if compress is None:
        compress = quant_state.nested
    N, K = quant_state.shape
    n = N * K
    codes = F.unpack_4bit(data.reshape(-1), n).reshape(N, K)
    packed = (codes[:, : K // 2].T.astype(jnp.uint8) << 4) | codes[:, K // 2 :].T.astype(
        jnp.uint8
    )
    absmax = quant_state.dequant_absmax().reshape(N, K // quant_state.blocksize)
    amax = absmax.T.reshape(2, K // (2 * quant_state.blocksize), N)
    am_scale = am_offset = None
    if compress:
        amax, am_scale, am_offset = compress_absmax(amax)
    return QLinearWeight(
        packed=packed,
        absmax=amax,
        shape=(N, K),
        blocksize=quant_state.blocksize,
        quant_type=quant_state.quant_type,
        dtype=quant_state.dtype,
        absmax_scale=am_scale,
        absmax_offset=am_offset,
    )


def from_kernel_layout(w: QLinearWeight) -> Tuple[jax.Array, QuantState]:
    """Inverse of to_kernel_layout: back to bnb paired format for
    serialization interop."""
    from .. import functional as F

    N, K = w.shape
    hi = (w.packed >> 4).astype(jnp.uint8)  # (K//2, N)
    lo = (w.packed & 0xF).astype(jnp.uint8)
    codes = jnp.concatenate([hi.T, lo.T], axis=1).reshape(-1)  # (N*K,) element order
    packed = F.pack_4bit(codes)
    qs = QuantState(
        absmax=w.scales_f32().reshape(K // w.blocksize, N).T.reshape(-1),
        code=jnp.asarray(w.code),
        shape=(N, K),
        dtype=w.dtype,
        blocksize=w.blocksize,
        quant_type=w.quant_type,
    )
    return packed, qs
