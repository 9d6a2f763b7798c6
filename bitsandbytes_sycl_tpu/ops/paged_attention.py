"""Paged int8-KV decode attention — vLLM-style block tables, TPU-native.

The engine's base cache is slot-contiguous: every slot owns max_seq_len
rows, so short sequences strand HBM and max_batch is capped by the
WORST-CASE length. Paged KV storage allocates fixed-size pages from a
shared pool and indirects through a per-sequence page table, so memory
scales with TOKENS IN FLIGHT — the standard production-serving layout
(vLLM, arxiv 2309.06180). The reference has no attention or serving
code at all (SURVEY.md §5).

Attend kernel design (follows ops/attention.py's measured layout rules):
- pages keep the flash layout per page: K transposed (L, NP, Hkv, D, P),
  V (L, NP, Hkv, P, D), lane-major scales (L, NP, Hkv, P);
- grid (B, max_pages) with the page table SCALAR-PREFETCHED: the
  BlockSpec index_map reads pt[b, j], so the Mosaic pipeline DMAs the
  mapped page per step. Each block covers ALL kv heads of the page —
  one CONTIGUOUS (Hkv, D, P) slab per DMA. The first version used a
  per-(b, h, page) grid of (1, 1, D, P) blocks and measured 2081 us at
  (B=8, S=2048, H=32, D=128, P=128) vs 218 us contiguous: B*Hkv*pages
  = 4096 grid steps of 16 KB DMAs are pure per-step overhead. Folding
  heads into the block cuts the grid 32x and makes every DMA a full
  page slab (the same tradeoff jax's reference paged kernel makes by
  hand-rolling multi-page async copies per compute block). Measured:
  168 us in-order / 170 us SHUFFLED page table vs 217 us contiguous —
  faster than the contiguous kernel (page slabs are contiguous in HBM;
  the contiguous cache's (1,1,D,S) blocks stride across (B,H,D,S)) and
  locality-insensitive.
- the LAYER index rides as a scalar-prefetch operand over the stacked
  (L, ...) pool, so per-layer calls share ONE compiled kernel and XLA
  never materializes a per-layer pool slice (a sliced (NP,Hkv,D,P)
  operand copies ~100s of MB per layer per step — measured as the
  dominant decode-bandwidth leak before this design).
- online softmax accumulates (m, l, acc) in VMEM scratch across a
  sequence's pages; scores for all heads are built in a (Hkv*R, P)
  scratch tile so masking/exp/max run on well-shaped (32+, 128) VPU
  tiles instead of per-head (1, P) rows.
- j is CLAMPED to the sequence's last used page: trailing grid steps
  map to a repeated block index, which Mosaic recognizes and skips the
  copy — short sequences don't pay DMA for the tail of the grid; their
  compute is also skipped (@pl.when), which is exact because a fully
  masked page leaves (m, l, acc) unchanged.
- GQA: q grouped (B, Hkv, rep, D) per kv head, kv pages touched once.

Decode WRITES stay dynamic_update_slice chains in models/llama
(_paged_cache_write), always unrolled: their B>16 fori_loop form broke
XLA's while-carry aliasing and inserted FULL-POOL copies per decode
step (measured: a 9.7 GB pool compiled to 23.2 GB at B=48 and OOM'd).
A Pallas in-place write kernel is NOT possible for this layout: one
token is a single lane column of the transposed K page, and a
(..., D, 1) output block violates Mosaic's (8, 128)/equal-dim min-tile
rule — while a full-page read-modify-write block would cost ~2 MB of
DMA per row per layer (orders more than the ~32 KB the DUS writes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_mode

__all__ = [
    "paged_decode_attention_int8",
    "paged_decode_attention_int8_stacked",
]


def _paged_attn_kernel(
    li_ref,  # scalar prefetch: (1,) int32 layer index
    pt_ref,  # scalar prefetch: (B, MAXP) int32 page table
    len_ref,  # scalar prefetch: (B,) int32 valid lengths
    q_ref, k_ref, ks_ref, v_ref, vs_ref,
    o_ref,
    m_ref, l_ref, acc_ref, sc_ref, pv_ref,
    *, P, R, H, n_pages, scale,
):
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    used = jnp.maximum((len_ref[b] + P - 1) // P, 1)

    @pl.when(j < used)
    def _update():
        # scores for every head into one (H*R, P) tile: the dots are
        # per-head (each head has its own K page), the softmax math runs
        # once on the stacked tile (full-sublane VPU shapes)
        for h in range(H):
            q = q_ref[0, h].astype(jnp.float32)  # (R, D)
            k = k_ref[0, 0, h].astype(jnp.float32)  # (D, P)
            sc_ref[h * R:(h + 1) * R, :] = jax.lax.dot_general(
                q, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ks = ks_ref[0, 0].astype(jnp.float32)  # (H, P)
        ksr = jnp.broadcast_to(ks[:, None, :], (H, R, P)).reshape(H * R, P)
        sc = sc_ref[:] * (ksr * scale)

        # token positions covered by THIS grid step: [j*P, j*P + P) — the
        # clamped index_map only changes WHICH physical page is resident,
        # masking is always in logical position space
        pos = j * P + jax.lax.broadcasted_iota(jnp.int32, (H * R, P), 1)
        sc = jnp.where(pos < len_ref[b], sc, -1e30)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        w = jnp.exp(sc - m_new)  # (H*R, P)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(w, axis=1, keepdims=True)
        vs = vs_ref[0, 0].astype(jnp.float32)  # (H, P)
        vsr = jnp.broadcast_to(vs[:, None, :], (H, R, P)).reshape(H * R, P)
        wv = w * (vsr * jnp.float32(1.0 / 127.0))
        for h in range(H):
            v = v_ref[0, 0, h].astype(jnp.float32)  # (P, D)
            pv_ref[h * R:(h + 1) * R, :] = jax.lax.dot_general(
                wv[h * R:(h + 1) * R, :], v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m_ref[:] = m_new
        acc_ref[:] = acc_ref[:] * alpha + pv_ref[:]

    @pl.when(j == n_pages - 1)
    def _finalize():
        inv = jnp.where(len_ref[b] > 0, 1.0 / l_ref[:], 0.0)
        o = acc_ref[:] * inv
        o_ref[:] = o.reshape(o_ref.shape).astype(o_ref.dtype)


@jax.jit
def _paged_attn_call(q4, kp, ksp, vp, vsp, li, page_table, lengths):
    B, Hkv, rep, D = q4.shape
    P = vp.shape[3]
    max_pages = page_table.shape[1]

    def page_map(b, j, li, pt, lens):
        # clamp to the last USED page: trailing steps revisit the same
        # block (no DMA) instead of fetching garbage pages
        used = jnp.maximum((lens[b] + P - 1) // P, 1)
        return (li[0], pt[b, jnp.minimum(j, used - 1)], 0, 0, 0)

    def scale_map(b, j, li, pt, lens):
        used = jnp.maximum((lens[b] + P - 1) // P, 1)
        return (li[0], pt[b, jnp.minimum(j, used - 1)], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, max_pages),
        in_specs=[
            pl.BlockSpec((1, Hkv, rep, D),
                         lambda b, j, li, pt, lens: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv, D, P), page_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv, P), scale_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv, P, D), page_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv, P), scale_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Hkv, rep, D), lambda b, j, li, pt, lens: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((Hkv * rep, 1), jnp.float32),
            pltpu.VMEM((Hkv * rep, 1), jnp.float32),
            pltpu.VMEM((Hkv * rep, D), jnp.float32),
            pltpu.VMEM((Hkv * rep, P), jnp.float32),
            pltpu.VMEM((Hkv * rep, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_attn_kernel, P=P, R=rep, H=Hkv, n_pages=max_pages,
        scale=1.0 / (float(np.sqrt(D)) * 127.0),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, D), q4.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * rep * max_pages * P * D,
            bytes_accessed=2 * B * max_pages * P * Hkv * D,
            transcendentals=B * Hkv * rep * max_pages * P,
        ),
        interpret=interpret_mode(),
    )(li.astype(jnp.int32), page_table.astype(jnp.int32),
      lengths.astype(jnp.int32), q4, kp, ksp, vp, vsp)
    return out


def paged_decode_attention_int8_stacked(
    q: jax.Array,  # (B, 1, Hq, D) float
    kp: jax.Array,  # (L, NP, Hkv, D, P) int8 — K pages, transposed
    ks: jax.Array,  # (L, NP, Hkv, P) f32 per-token absmax
    vp: jax.Array,  # (L, NP, Hkv, P, D) int8 — V pages
    vs: jax.Array,  # (L, NP, Hkv, P) f32
    li,  # int or (1,) int32 — layer to attend over
    page_table: jax.Array,  # (B, MAXP) int32 page ids (garbage past used)
    lengths: jax.Array,  # (B,) int32 tokens in flight per sequence
) -> Optional[jax.Array]:
    """Single-step attention over layer `li` of a layer-STACKED paged
    int8 KV pool. The layer index is a scalar-prefetch operand: all
    layers share one compiled kernel and the pool is never sliced (an
    XLA slice would materialize the layer's pages every call). Returns
    (B, 1, Hq, D) in q.dtype, or None if untileable (caller falls back
    to gathering pages and using the XLA path)."""
    B, T, Hq, D = q.shape
    Hkv, P = vp.shape[2], vp.shape[3]
    if T != 1 or D % 128 != 0 or Hq % Hkv != 0 or P % 128 != 0:
        return None
    q4 = q.reshape(B, Hkv, Hq // Hkv, D)
    li = jnp.asarray(li, jnp.int32).reshape(1)
    out = _paged_attn_call(q4, kp, ks, vp, vs, li, page_table, lengths)
    return out.reshape(B, 1, Hq, D)


def paged_decode_attention_int8(
    q: jax.Array,  # (B, 1, Hq, D) float
    kp: jax.Array,  # (NP, Hkv, D, P) int8 — K pages, transposed
    ks: jax.Array,  # (NP, Hkv, P) f32 per-token absmax
    vp: jax.Array,  # (NP, Hkv, P, D) int8 — V pages
    vs: jax.Array,  # (NP, Hkv, P) f32
    page_table: jax.Array,  # (B, MAXP) int32 page ids (garbage past used)
    lengths: jax.Array,  # (B,) int32 tokens in flight per sequence
) -> Optional[jax.Array]:
    """Single-layer-pool convenience wrapper over the stacked kernel
    (expand_dims is a metadata-only reshape — no copy)."""
    return paged_decode_attention_int8_stacked(
        q, kp[None], ks[None], vp[None], vs[None], 0, page_table, lengths,
    )
