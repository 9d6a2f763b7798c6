"""Fused blockwise 8-bit optimizer Pallas kernel (reference N9:
kOptimizerStatic8bit{1,2}StateBlockwise, kernel_quant.cpp:2715-3213).

One HBM pass per step: read g, p, packed uint8 states + per-2048-block
absmax; decode states with the arithmetic dynamic-map codec
(ops/dynamic8.py — the reference loads a 256-entry smem LUT per lane),
run the optimizer math, re-quantize with fresh per-block absmax, write
p + states + absmax. ~14 bytes/param of traffic, vs the XLA-fused codec
path which materializes decode/requant intermediates between reshapes
(measured 3.1 ms for 16M params = 87 GB/s; this kernel targets HBM
roofline, ~0.3 ms).

Scalars (betas, bias-corrected step size, decay, gnorm_scale) are
precomputed host-side per step and passed through SMEM — the reference
bakes the bias correction into the kernel epilogue instead
(kernel_quant.cpp:2741-2743); algebraically identical.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_mode, safe_inv
from .dynamic8 import dynamic_decode, dynamic_encode, stochastic_adjust
from .lut8 import searchsorted_tree, take_tree

__all__ = ["optim8_blockwise_fused", "lut_table_ok"]

# 32 rows is the VMEM ceiling, measured: at 64 rows x 2048 the 2-state
# kernel's Mosaic stack (decode+encode codec chains keep ~30 live
# (rows, bs) f32 temporaries) hits 19 MB > the 16 MB scoped-vmem limit.
# Grid-step overhead is not the bottleneck (~0.5 us x 256 steps).
_ROWS = 32  # blocks (rows of `blocksize`) per grid step
# The LUT-codec variant's select trees hold deeper live chains per
# element (255-node trees vs the dynamic codec's ~20-op arithmetic), so
# its row tile is smaller to stay inside Mosaic's scoped-vmem stack.
_ROWS_LUT = 16


def _apply_sign_fix(rank, normed, n_neg, top):
    """The reference's state1 sign-preservation step
    (kernel_quant.cpp:2935-2941): if sign(table[code]) != sign(value),
    bump the code one step toward the value's sign so a small nonzero
    momentum never requantizes to zero/wrong-sign. `rank` is in
    ascending-value order, so sign(table[rank]) == (rank < n_neg); the
    bump is +1 for positive values, -1 otherwise (signbit semantics:
    -0.0 counts as negative, +0.0 as positive, exactly like the
    reference's sycl::signbit test)."""
    r = rank.astype(jnp.int32)
    mism = (r < n_neg) != jnp.signbit(normed)
    step = jnp.where(normed > 0, 1, -1)
    return jnp.where(mism, jnp.clip(r + step, 0, top), r)


class _DynamicCodec:
    """The analytic dynamic-map codec (ops/dynamic8.py) — default.

    `sign_fix` (state1 only, like the reference) re-applies the sign of
    the value when a nonzero state requantizes onto the zero entry
    (kernel_quant.cpp:2935-2941). The dynamic signed map's codes are
    ascending-value ranks with zero at 127, so the fix is a compare and
    a select. Skipped under stochastic rounding — the dithered code is
    already expectation-unbiased and forcing the sign would bias it
    (the reference's STOCHASTIC template is dead code, so there is no
    reference behavior to match there)."""

    def __init__(self, signed: bool, sign_fix: bool = False):
        self.signed = signed
        self.sign_fix = sign_fix and signed

    def decode(self, codes):
        return dynamic_decode(codes, signed=self.signed)

    def encode(self, normed, u=None):
        codes = dynamic_encode(normed, signed=self.signed)
        if u is not None:
            # stochastic rounding of the state requantization (the
            # reference's dead STOCHASTIC template, kernel N3): unbiased
            # over the dynamic grid, uniform noise supplied as a kernel
            # input (pltpu.prng_* has no interpret-mode lowering, and the
            # kernel is VPU- not DMA-bound)
            codes = stochastic_adjust(codes, normed, u, signed=self.signed)
        elif self.sign_fix:
            codes = _apply_sign_fix(codes, normed, n_neg=127, top=255).astype(jnp.uint8)
        return codes


def lut_table_ok(q) -> bool:
    """A table the LUT codec can take: concrete (256,) finite values,
    non-decreasing, with at least two distinct entries. Duplicates are
    allowed (the reference's zero-pad convention for sub-256 codebooks,
    codebooks._pad_sorted_to_256) — the codec dedupes and encodes to the
    first index of each duplicate run."""
    if q is None:
        return False
    try:
        t = np.asarray(q, np.float32)
    except Exception:  # noqa: BLE001 — traced arrays, wrong types
        return False
    return (
        t.shape == (256,)
        and bool(np.all(np.isfinite(t)))
        and bool(np.all(np.diff(t) >= 0))
        and np.unique(t).size >= 2
    )


class _LutCodec:
    """Arbitrary ascending-sorted 256-entry codebook via select trees
    (ops/lut8.py) with the table embedded as immediates — the TPU
    equivalent of the reference's smem-codebook kernels
    (kernel_quant.cpp:2715-2974). Stochastic rounding is not offered on
    this codec (reference parity: its STOCHASTIC template is dead code
    for the blockwise kernels).

    Duplicate entries (the reference's zero-pad convention for sub-256
    codebooks) are deduped: encode runs over the unique values and maps
    each rank to the FIRST original index of its duplicate run, so
    decode through the full table is exact and stored codes stay in the
    original 256-index space.

    `sign_fix` replicates the reference's state1 sign-preservation step
    (kernel_quant.cpp:2935-2941) — with one deliberate improvement: the
    bump runs in UNIQUE-rank space, so on duplicated tables it reaches
    the next distinct value (the reference's index-space +-1 can land on
    another duplicate of the same wrong-signed value)."""

    def __init__(self, qmap: np.ndarray, sign_fix: bool = False):
        table = np.ascontiguousarray(np.asarray(qmap, np.float32).reshape(-1))
        uq, rep = np.unique(table, return_index=True)
        self.table = table
        self.uq = uq.astype(np.float32)
        self.rep = rep.astype(np.int32)  # unique rank -> first original index
        self.identity = uq.size == 256
        # f32 midpoints, matching the XLA LUT path's (sorted[1:]+sorted[:-1])/2
        self.mids = ((uq[1:] + uq[:-1]) / 2.0).astype(np.float32)
        self.n_neg = int(np.signbit(uq).sum())
        self.sign_fix = sign_fix

    def decode(self, codes):
        return take_tree(codes.astype(jnp.int32), self.table)

    def encode(self, normed, u=None):
        assert u is None
        rank = searchsorted_tree(normed, self.mids, side="left")
        if self.sign_fix:
            rank = _apply_sign_fix(rank, normed, self.n_neg, self.uq.size - 1)
        if self.identity:
            return rank.astype(jnp.uint8)
        return take_tree(rank, self.rep).astype(jnp.uint8)


def _requant_rows(s: jax.Array, codec, u=None) -> Tuple[jax.Array, jax.Array]:
    amax = jnp.max(jnp.abs(s), axis=1, keepdims=True)
    normed = s * safe_inv(amax)
    return codec.encode(normed, u=u), amax


def _kernel2(
    sc_ref, g_ref, p_ref, s1_ref, am1_ref, s2_ref, am2_ref, *rest,
    name, stochastic, codec1, codec2,
):
    if stochastic:
        u_ref, po_ref, s1o_ref, am1o_ref, s2o_ref, am2o_ref = rest
    else:
        po_ref, s1o_ref, am1o_ref, s2o_ref, am2o_ref = rest
        u_ref = None
    b1, b2, eps_c2, step_size, decay, gnorm_scale = (sc_ref[0, i] for i in range(6))
    g = g_ref[:].astype(jnp.float32) * gnorm_scale
    finite = jnp.isfinite(g)
    g = jnp.where(finite, g, 0.0)
    p = p_ref[:].astype(jnp.float32)
    s1 = codec1.decode(s1_ref[:]) * am1_ref[:]
    s2 = codec2.decode(s2_ref[:]) * am2_ref[:]

    # adam/lamb 2-state update (kernel_quant.cpp:1722-1734) with the bias
    # correction folded into step_size/eps_c2 by the caller
    n1 = s1 * b1 + (1.0 - b1) * g
    n2 = s2 * b2 + (1.0 - b2) * g * g
    np_ = p + step_size * (n1 / (jnp.sqrt(n2) + eps_c2))
    np_ = np_ * decay

    np_ = jnp.where(finite, np_, p)
    n1 = jnp.where(finite, n1, s1)
    n2 = jnp.where(finite, n2, s2)

    po_ref[:] = np_.astype(po_ref.dtype)
    u1 = u_ref[:] if u_ref is not None else None
    # decorrelate the two states' noise with a golden-ratio scramble
    u2 = jnp.mod(u1 * 0.6180339887 + 0.3819660113, 1.0) if u_ref is not None else None
    c1, a1 = _requant_rows(n1, codec1, u=u1)
    c2, a2 = _requant_rows(n2, codec2, u=u2)
    s1o_ref[:] = c1
    am1o_ref[:] = a1
    s2o_ref[:] = c2
    am2o_ref[:] = a2


def _kernel1(
    sc_ref, g_ref, p_ref, s1_ref, am1_ref, *rest,
    name, stochastic, codec1,
):
    if stochastic:
        u_ref, po_ref, s1o_ref, am1o_ref = rest
    else:
        po_ref, s1o_ref, am1o_ref = rest
        u_ref = None
    b1, b2, eps, lr, wd, gnorm_scale, is_step1 = (sc_ref[0, i] for i in range(7))
    g = g_ref[:].astype(jnp.float32) * gnorm_scale
    finite = jnp.isfinite(g)
    g = jnp.where(finite, g, 0.0)
    p = p_ref[:].astype(jnp.float32)
    s1 = codec1.decode(s1_ref[:]) * am1_ref[:]

    # 1-state math (kernel_quant.cpp:1955-1985); weight decay is coupled
    g = g + p * wd
    if name == "momentum":
        n1 = jnp.where(is_step1 > 0, g, s1 * b1 + g)
        np_ = p - lr * n1
    elif name == "rmsprop":
        n1 = s1 * b1 + (1.0 - b1) * g * g
        np_ = p - lr * g / (jnp.sqrt(n1) + eps)
    elif name == "adagrad":
        n1 = s1 + g * g
        np_ = p - lr * g / (jnp.sqrt(n1) + eps)
    elif name == "lion":
        np_ = p - lr * jnp.sign(s1 * b1 + (1.0 - b1) * g)
        n1 = s1 * b2 + (1.0 - b2) * g
    else:
        raise ValueError(name)

    np_ = jnp.where(finite, np_, p)
    n1 = jnp.where(finite, n1, s1)

    po_ref[:] = np_.astype(po_ref.dtype)
    c1, a1 = _requant_rows(n1, codec1, u=u_ref[:] if u_ref is not None else None)
    s1o_ref[:] = c1
    am1o_ref[:] = a1


def optim8_blockwise_fused(
    optimizer_name: str,
    g: jax.Array,  # (nb, bs) f32 (padded)
    p: jax.Array,  # (nb, bs)
    state1: jax.Array,  # (nb, bs) uint8
    absmax1: jax.Array,  # (nb,) f32
    state2: Optional[jax.Array],
    absmax2: Optional[jax.Array],
    scalars: jax.Array,  # (8,) f32, see functional.optimizer_update_8bit_blockwise
    u: Optional[jax.Array] = None,  # (nb, bs) uniform [0,1): stochastic rounding
    qmap1: Optional[np.ndarray] = None,  # concrete ASCENDING 256-entry codebook
    qmap2: Optional[np.ndarray] = None,  # (None, None) = the dynamic maps
):
    """Returns (p, state1, absmax1[, state2, absmax2]) in the same padded
    (nb, bs) / (nb,) layout, or None if the shape can't tile.

    qmap1/qmap2: when given (concrete, ascending-sorted, 256 entries —
    duplicates allowed, see _LutCodec), states decode/encode through
    in-kernel select trees over that table — the TPU form of the
    reference's arbitrary-smem-codebook kernels
    (kernel_quant.cpp:2715-2974). Stochastic rounding requires the
    default dynamic codec; invalid tables, a 2-state call missing qmap2,
    and untileable shapes all return None (callers fall back to the XLA
    tree path)."""
    nb, bs = g.shape
    two = state2 is not None
    lut = qmap1 is not None
    if lut and (
        u is not None
        or not lut_table_ok(qmap1)
        or (two and not lut_table_ok(qmap2))
    ):
        return None
    rows = _ROWS_LUT if lut else _ROWS
    if bs % 128 != 0 or nb % rows != 0:
        return None

    if lut:
        codec1 = _LutCodec(qmap1, sign_fix=True)
        codec2 = _LutCodec(qmap2) if two else None
    else:
        codec1 = _DynamicCodec(signed=True, sign_fix=True)
        codec2 = _DynamicCodec(signed=False) if two else None
    kern = functools.partial(
        _kernel2 if two else _kernel1, name=optimizer_name, stochastic=u is not None,
        **({"codec1": codec1, "codec2": codec2} if two else {"codec1": codec1}),
    )
    row = pl.BlockSpec((rows, bs), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM)
    # outputs: p, state1, absmax1 [, state2, absmax2]
    dtypes = [p.dtype, jnp.uint8, jnp.float32] + ([jnp.uint8, jnp.float32] if two else [])
    shapes = [(nb, bs), (nb, bs), (nb, 1)] + ([(nb, bs), (nb, 1)] if two else [])
    out_specs = [row, row, col] + ([row, col] if two else [])

    ins = [g, p, state1, absmax1.reshape(nb, 1)]
    in_specs = [smem, row, row, row, col]
    if two:
        ins += [state2, absmax2.reshape(nb, 1)]
        in_specs += [row, col]
    if u is not None:
        ins.append(u)
        in_specs.append(row)

    out = pl.pallas_call(
        kern,
        grid=(nb // rows,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct(s, d) for s, d in zip(shapes, dtypes)],
        cost_estimate=pl.CostEstimate(
            # LUT codec: ~255 selects per decode + ~510 compare/selects
            # per encode, x2 states worst case
            flops=nb * bs * (1560 if lut else 60),
            bytes_accessed=nb * bs * (4 + 4 * 2 + (2 if two else 1) * 2),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(scalars.reshape(1, 8), *ins)

    if two:
        po, c1, a1, c2, a2 = out
        return po, c1, a1.reshape(nb), c2, a2.reshape(nb)
    po, c1, a1 = out
    return po, c1, a1.reshape(nb)
