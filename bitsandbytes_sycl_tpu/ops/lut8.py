"""Gather-free LUT codec primitives: balanced select trees.

The reference's 8-bit blockwise optimizer kernels load an arbitrary
user/quantile codebook into shared local memory and gather per work-item
(kernel_quant.cpp:2715-2974 `smem_quantiles`; encode is a per-lane
binary search, kernel_quant.cpp:840-937 `dQuantize`). The TPU VPU has no
per-lane gather: `jnp.take`/`jnp.searchsorted` lower to Gather HLO or
sort/scan-based searches that run a 16M-param Adam8bit step in seconds
(~4 orders of magnitude off HBM roofline — see ops/dynamic8.py).

A balanced select tree is pure elementwise compare/select work the VPU
executes at full rate:

- ``take_tree(idx, table)``      — table[idx] for an N-entry table is
  N-1 vector selects (the 16-entry NF4 tree in ops/common.py is the
  N=16 instance; this is the general form used for 256-entry optimizer
  codebooks).
- ``searchsorted_tree(x, b)``    — rank over M sorted boundaries is
  M compares + M selects.

For a full 2-state decode+encode that is ~1,530 VPU ops/element —
about 6 ms for 16M params at the v5e's ~3.9 T f32-op/s, vs seconds for
the gather path. When the table is a CONCRETE numpy array the entries
are embedded as immediates (no operand loads, no dynamic slices), which
is what the fused Pallas kernel variant requires
(ops/optim8.py ``qmap1=``/``qmap2=``): Mosaic cannot lower per-lane
dynamic indexing, but compare/select chains over immediates are its
bread and butter (same mechanism as the 4-bit kernels' NF4 tree).

Both functions work on traced jax tables too (leaves become scalar
static slices — fine under XLA, unsupported inside Pallas kernels).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["take_tree", "searchsorted_tree"]


def _leaf(table, k):
    """Scalar table entry: a python/numpy immediate when the table is
    concrete (embeddable in Pallas kernels), a 0-d slice when traced."""
    if isinstance(table, (np.ndarray, list, tuple)):
        return np.asarray(table)[k]
    return table[k]


def take_tree(idx, table):
    """``table[idx]`` via a balanced select tree (no gather).

    idx: integer array, values in ``[0, len(table))``; out-of-range
    indices resolve to the nearest end entry (clamped by construction).
    table: 1-D concrete numpy array (entries embedded as immediates) or
    a traced jax array (entries read as scalar slices).

    Cost: ``len(table) - 1`` vector selects. Matches
    ``jnp.take(table, idx)`` exactly for in-range indices.
    """
    n = int(table.shape[0]) if hasattr(table, "shape") else len(table)
    idx = idx.astype(jnp.int32)

    def rec(lo, hi):
        if hi - lo == 1:
            return _leaf(table, lo)
        mid = (lo + hi) // 2
        return jnp.where(idx < mid, rec(lo, mid), rec(mid, hi))

    return rec(0, n)


def searchsorted_tree(x, boundaries, side: str = "left"):
    """``jnp.searchsorted(boundaries, x, side)`` via a balanced
    compare/select tree (no sort/scan lowering).

    boundaries: 1-D ascending-sorted, concrete numpy (immediates) or
    traced jax array. Returns int32 ranks in ``[0, len(boundaries)]``.

    side='left'  -> rank = #{i : boundaries[i] <  x}
    side='right' -> rank = #{i : boundaries[i] <= x}

    Cost: ``len(boundaries)`` compares + selects. NaN inputs fall out of
    every comparison and land on rank 0 (numpy's searchsorted would give
    the top rank); optimizer callers mask non-finite values upstream.
    """
    m = int(boundaries.shape[0]) if hasattr(boundaries, "shape") else len(boundaries)
    if side not in ("left", "right"):
        raise ValueError(side)

    def rec(lo, hi):
        # ranks in [lo, hi] inclusive
        if lo == hi:
            return lo
        t = (lo + hi + 1) // 2
        b = _leaf(boundaries, t - 1)
        go_right = (x >= b) if side == "right" else (x > b)
        return jnp.where(go_right, rec(t, hi), rec(lo, t - 1))

    return jnp.asarray(rec(0, m), jnp.int32)
