"""Arithmetic codec for the dynamic 8-bit data type — gather-free.

The reference decodes optimizer states with a 256-entry shared-memory LUT
and encodes with a per-lane quadrant search (kernel_quant.cpp:2715-3213,
quantize_2D :840-937). Neither maps to the TPU VPU: gather is unsupported
and a 256-way select tree is 255 ops/element (measured: the LUT/searchsorted
jnp path runs a 16M-param Adam8bit step in 3.3 s — ~4 orders of magnitude
off HBM roofline).

But the dynamic map (Dettmers, arxiv 1511.04561; codebooks.create_dynamic_map)
is ANALYTIC: sign x 10^-decade x linear-fraction. In the ascending-sorted
table the positive rank r encodes (decade, fraction) positionally:

  signed   : decade i = floor(log2 r),      j = r - 2^i,       n = 2^i
  unsigned : decade i = floor(log2(r+1))-1, j = r - (2^(i+1)-1), n = 2^(i+1)
  value    = 10^(i-6) * (0.1 + (j + 0.5) * 0.9/n)        [i = 0..6]
  rank 0 -> 0.0; top rank (128 signed / 255 unsigned) -> 1.0

floor(log2 r) is the f32 exponent field of r — a bitcast and a shift. So
decode is ~15 elementwise VPU ops and encode is 8 compare-selects (decade
by boundary comparison) + one fused multiply-round — both fuse under XLA
and inline into Pallas kernels. Values match the f64-built table to f32
rounding (<=2 ulp); encode reproduces searchsorted-left tie behavior except
at exact-f32 midpoint ties (codes may differ by one step of the codebook —
below quantization noise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import codebooks

__all__ = ["dynamic_decode", "dynamic_encode", "stochastic_adjust"]


@functools.lru_cache(maxsize=None)
def _consts(signed: bool):
    """Structure-derived constants, validated against the real table."""
    table = codebooks.create_dynamic_map(signed=signed)
    assert table.shape == (256,) and np.all(np.diff(table) > 0)
    zero_idx = int(np.where(table == 0.0)[0][0])
    assert zero_idx == (127 if signed else 0)
    assert table[-1] == 1.0
    pos = table[zero_idx:]  # pos[r] = value at positive rank r, pos[0]=0
    top_rank = len(pos) - 1  # 128 signed, 255 unsigned

    # decade boundaries for encode: decision thresholds between rank r and
    # r+1 are the midpoints (pos[r]+pos[r+1])/2; we need them only at
    # decade edges + the zero and top edges (in-decade steps are uniform).
    if signed:
        decade_last = [2 ** (i + 1) - 1 for i in range(7)]  # rank of last value in decade i
    else:
        decade_last = [2 ** (i + 2) - 2 for i in range(7)]
    edges = [0.5 * (pos[0] + pos[1])]  # below this -> rank 0 (zero)
    for i in range(6):
        r = decade_last[i]
        edges.append(0.5 * (pos[r] + pos[r + 1]))
    top_edge = 0.5 * (pos[top_rank - 1] + pos[top_rank])  # above -> 1.0
    return np.float32(edges), np.float32(top_edge), top_rank


def _exp2i(i: jax.Array) -> jax.Array:
    """Exact 2^i (f32) for small non-negative int i, via exponent bits."""
    return jax.lax.bitcast_convert_type((i + 127) << 23, jnp.float32)


def _floor_log2(r: jax.Array) -> jax.Array:
    """floor(log2 r) for int r >= 1 via the f32 exponent field (ints up to
    2^24 convert exactly)."""
    f = r.astype(jnp.float32)
    return ((jax.lax.bitcast_convert_type(f, jnp.int32) >> 23) & 0xFF) - 127


def _sel8(i: jax.Array, table) -> jax.Array:
    """8-entry LUT on int i in [0,8) as a 3-level select tree (no gather)."""
    vals = [jnp.float32(v) for v in table]
    bits = [(i & (1 << b)) != 0 for b in range(3)]

    def level(vs, b):
        if len(vs) == 1:
            return vs[0]
        half = len(vs) // 2
        return jnp.where(bits[b], level(vs[half:], b - 1), level(vs[:half], b - 1))

    return level(vals, 2)


_POW10 = tuple(float(np.float32(10.0) ** (k - 6)) for k in range(8))
_POW10_INV = tuple(float(np.float32(10.0) ** (6 - k)) for k in range(8))


def _pow10(i: jax.Array) -> jax.Array:
    """10^(i-6) for i in [0,6]."""
    return _sel8(i, _POW10)


def dynamic_decode(codes: jax.Array, signed: bool = True) -> jax.Array:
    """uint8 sorted-table index -> f32 value of the dynamic map."""
    _, _, top_rank = _consts(signed)
    c = codes.astype(jnp.int32)
    if signed:
        r = jnp.abs(c - 127)
        sgn = jnp.where(c < 127, jnp.float32(-1.0), jnp.float32(1.0))
    else:
        r = c
        sgn = jnp.float32(1.0)
    r1 = jnp.maximum(r, 1)  # keep log2 defined; r==0 handled below
    if signed:
        i = _floor_log2(r1)
        n = _exp2i(i)
        j = r1.astype(jnp.float32) - n
    else:
        i = _floor_log2(r1 + 1) - 1
        n = _exp2i(i + 1)
        j = r1.astype(jnp.float32) - (n - 1.0)
    frac = jnp.float32(0.1) + (j + jnp.float32(0.5)) * (jnp.float32(0.9) / n)
    val = sgn * _pow10(i) * frac
    val = jnp.where(r == 0, jnp.float32(0.0), val)
    val = jnp.where(r >= top_rank, sgn * jnp.float32(1.0), val)
    return val


def dynamic_encode(x: jax.Array, signed: bool = True) -> jax.Array:
    """f32 value in [-1,1] (or [0,1] unsigned) -> uint8 sorted-table index,
    round-to-nearest (searchsorted-left over table midpoints)."""
    edges, top_edge, top_rank = _consts(signed)
    a = jnp.abs(x) if signed else jnp.maximum(x, 0.0)
    a = jnp.minimum(a.astype(jnp.float32), 1.0)

    # decade = #(decade-edge < a) - 1; a below edges[0] -> rank 0
    cnt = sum((jnp.float32(e) < a).astype(jnp.int32) for e in edges)
    i = jnp.maximum(cnt - 1, 0)
    if signed:
        n = _exp2i(i)
        base = n  # first rank of decade i
    else:
        n = _exp2i(i + 1)
        base = n - 1.0
    # in-decade index via the uniform grid: centers at 0.1+(j+.5)*d, inner
    # thresholds at 0.1+(j+1)*d -> j = ceil(y) - 1 with y=(a/scale-0.1)/d
    # (exactly-on-threshold ties resolve DOWN, like searchsorted-left)
    inv_scale = _sel8(i, _POW10_INV)  # 10^(6-i)
    y = (a * inv_scale - jnp.float32(0.1)) * (n / jnp.float32(0.9))
    j = jnp.clip(jnp.ceil(y) - 1.0, 0.0, n - 1.0)
    r = (base + j).astype(jnp.int32)
    r = jnp.where(cnt == 0, 0, r)
    r = jnp.where(a > top_edge, top_rank, r)
    if signed:
        neg = x < 0
        # the table has +1.0 (rank 128) but no -1.0: the most negative code
        # is rank 127, so negative magnitudes clamp there
        c = jnp.where(neg, 127 - jnp.minimum(r, 127), 127 + r)
    else:
        c = r
    return c.astype(jnp.uint8)


def stochastic_adjust(codes: jax.Array, x: jax.Array, u: jax.Array, signed: bool = True) -> jax.Array:
    """Unbiased stochastic rounding over the (non-uniform) dynamic map —
    the reference's dead STOCHASTIC kernel-template path (kernel_quant.cpp
    kQuantizeBlockwise<..., STOCHASTIC, ...>) realized for optimizer-state
    requantization (SURVEY.md §7 design stance).

    `codes` are the ROUND-TO-NEAREST codes of `x` (normalized to the map's
    domain); `u` is uniform in [0,1). The code steps to the bracketing
    neighbor with probability |x - v_near| / |v_next - v_near|, which makes
    E[decode(result)] == x exactly for any monotone grid (codes are sorted
    by value). Values outside the grid keep the clamped nearest code.
    """
    c = codes.astype(jnp.int32)
    v_c = dynamic_decode(codes, signed=signed)
    xf = x.astype(jnp.float32)
    step = jnp.where(xf > v_c, 1, -1)
    c2 = jnp.clip(c + step, 0, 255)
    v_n = dynamic_decode(c2.astype(jnp.uint8), signed=signed)
    denom = v_n - v_c
    prob = jnp.where(denom != 0.0, (xf - v_c) / denom, 0.0)
    prob = jnp.clip(prob, 0.0, 1.0)  # out-of-grid x stays on the clamp code
    return jnp.where(u < prob, c2, c).astype(jnp.uint8)
