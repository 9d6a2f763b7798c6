"""Paged int8-KV decode attention — vLLM-style block tables, TPU-native.

The engine's base cache is slot-contiguous: every slot owns max_seq_len
rows, so short sequences strand HBM and max_batch is capped by the
WORST-CASE length. Paged KV storage allocates fixed-size pages from a
shared pool and indirects through a per-sequence page table, so memory
scales with TOKENS IN FLIGHT — the standard production-serving layout
(vLLM, arxiv 2309.06180). The reference has no attention or serving
code at all (SURVEY.md §5).

Attend kernel design (follows ops/attention.py's measured layout rules,
except K — see the write-kernel note):
- pages are TOKEN-MAJOR for both K and V: (L, NP, Hkv, P, D), lane-major
  scales (L, NP, Hkv, P). K's score dot contracts D on BOTH operands
  (einsum "rd,pd->rp", the same shape jax's reference paged kernel
  uses); measured 186 us vs 168-178 us for a transposed-K variant at
  the 7B decode shape — the ~5-10% attend cost buys LEGAL in-place
  token writes (below), which were worth 36 ms/step at B=48;
- grid (B, max_pages) with the page table SCALAR-PREFETCHED: the
  BlockSpec index_map reads pt[b, j], so the Mosaic pipeline DMAs the
  mapped page per step. Each block covers ALL kv heads of the page —
  one CONTIGUOUS (Hkv, D, P) slab per DMA. The first version used a
  per-(b, h, page) grid of (1, 1, D, P) blocks and measured 2081 us at
  (B=8, S=2048, H=32, D=128, P=128) vs 218 us contiguous: B*Hkv*pages
  = 4096 grid steps of 16 KB DMAs are pure per-step overhead. Folding
  heads into the block cuts the grid 32x and makes every DMA a full
  page slab (the same tradeoff jax's reference paged kernel makes by
  hand-rolling multi-page async copies per compute block). Measured
  (transposed-K variant): 168 us in-order / 170 us shuffled vs 217 us
  contiguous; the SHIPPED token-major variant measures 174-211 us —
  still at-or-under the contiguous kernel (page slabs are contiguous
  in HBM; the contiguous cache's (1,1,D,S) blocks stride across
  (B,H,D,S)) and locality-insensitive (shuffled within run noise).
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
- even SKIPPED steps cost ~0.1-0.3 us of fixed per-grid-step overhead,
  so `pages_hint` TRUNCATES the grid's page dimension to a host-known
  bound on used pages: at the B=48 avg-512-live 7B point a full
  max_seq_len/P = 32-wide grid measured 782 us/layer vs 361 us
  truncated to 5 (291 -> 630 GB/s effective — overhead-bound to
  bandwidth-bound; tools/experiments/paged_grid_trunc_probe.py). The
  engine buckets the hint (pow2 up to 4 pages, then multiples of 4)
  from its host-side slot lengths to bound recompiles. Contract: every
  length should fit in hint*P tokens — longer rows attend only their
  first hint pages (the engine guarantees the bound for active slots;
  stale inactive rows may truncate, their outputs are discarded).
- GQA: q grouped (B, Hkv, rep, D) per kv head, kv pages touched once.

Decode writes are DEFERRED AND LAYER-BATCHED (models/llama
flush_paged_writes): per-layer unrolled DUS chains measured 36 ms/step
at B=48 (~6 us per tiny in-place update x 4 leaves x B x 32 layers; the
B>16 fori_loop form was worse still — it broke XLA's while-carry
aliasing and copied the FULL pool per step: 23.2 GB peak, OOM). Since
one page table serves every layer, a step's 32 layers all write page
pages[b] at offset offs[b]: the layer loop STAGES each layer's (B,H,D)
updates into small (L,B,...) pend buffers (static-index DUS, in-place)
and ONE flush after the loop issues 4xB DUS ops covering all layers —
32x fewer ops. The attend kernel therefore reads a pool that is one
step STALE and folds the current token in from REGISTERS (`new_kv`):
an exact online-softmax extension, bit-equivalent to write-then-read.
Two dead ends worth recording: a Pallas in-place write kernel
(input_output_aliases) is structurally sound per-call but XLA copies
custom-call-aliased buffers whenever the value has ANY other reader —
interleaved with attends it re-materialized the pool every layer, and
even a single deferred kernel call after 32 attend reads kept one
full-pool copy (measured via compiled.memory_analysis); plain DUS
chains are the only form XLA provably keeps in place here.

int4 KV pages (kv_bits=4, r5): pool leaves arrive uint8 with P/2 byte
rows — adjacent token pairs (2r HI nibble, 2r+1 LO), sign-magnitude ±7
codes, per-token absmax scales stored in the kernel's parity-grouped
COLUMN order (engine/paged._scale_cols). The kernel decodes both
planes in-kernel (_dec4_plane, the int32-lane bit-test arithmetic that
lowers on v5e) and remaps the position iota to the grouped columns;
everything downstream (masking, window, ALiBi, online softmax, new_kv
fold on the same ±7 grid) is column-order-agnostic. Design rationale
and the two rejected packings live in engine/paged.init_page_pool.
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


def nib_sign_mag(c4: jax.Array) -> jax.Array:
    """±7-grid codes -> sign-magnitude nibbles (|c| + 8·[c<0]) as uint8.
    THE kv4 nibble encoding — single definition shared by the ingest
    pack (engine/paged._pack4), the deferred flush
    (models/llama.flush_paged_writes) and the insert-time nib_prev
    seeding (engine.paged_insert_fn); _dec4_plane below is its in-kernel
    inverse."""
    c = c4.astype(jnp.int32)
    return (jnp.abs(c) + 8 * (c < 0).astype(jnp.int32)).astype(jnp.uint8)


def requant_nib4(c8: jax.Array) -> jax.Array:
    """±127-grid int8 codes -> kv4 nibbles: the one-time ingest requant
    (round(c·7/127), error <= absmax/14 — inside the int4 grid's own
    step) followed by nib_sign_mag."""
    c4 = jnp.clip(jnp.round(c8.astype(jnp.float32) * (7.0 / 127.0)), -7, 7)
    return nib_sign_mag(c4)


def _dec4_plane(b32: jax.Array, shift: int) -> jax.Array:
    """Sign-magnitude int4 nibble at bits [shift, shift+4) -> f32 value
    in [-7, 7]. Same no-shift bit-test pattern as matmul_4bit._decode_
    plane (int32 lanes for f32 selects; shifts/int16-sub don't lower)."""
    mag = b32 & jnp.asarray(7 << shift, b32.dtype)
    neg = (b32 & jnp.asarray(8 << shift, b32.dtype)) != jnp.asarray(0, b32.dtype)
    return jnp.where(neg, -mag, mag).astype(jnp.float32) * (1.0 / (1 << shift))


def _paged_attn_kernel(
    li_ref,  # scalar prefetch: (1,) int32 layer index
    pt_ref,  # scalar prefetch: (B, MAXP) int32 page table
    len_ref,  # scalar prefetch: (B,) int32 valid lengths
    *refs,  # q, pool blocks, [slopes], [new-token operands], out, scratch
    P, R, H, n_pages, scale, window=None, softcap=None, has_new=False,
    has_alibi=False, kv4=False,
):
    refs = list(refs)
    q_ref, k_ref, ks_ref, v_ref, vs_ref = refs[:5]
    rest = refs[5:]
    sl_ref = rest.pop(0) if has_alibi else None
    if has_new:
        (kn_ref, vn_ref, ksn_ref, vsn_ref,
         o_ref, m_ref, l_ref, acc_ref, sc_ref, pv_ref) = rest
    else:
        o_ref, m_ref, l_ref, acc_ref, sc_ref, pv_ref = rest
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
            if kv4:
                # packed page (P/2, D) uint8: byte row r = tokens 2r (HI
                # nibble) and 2r+1 (LO) — adjacent-pair packing keeps
                # decode-step writes full byte rows (write-only DUS; see
                # engine/paged.init_page_pool). Score columns come out
                # GROUPED BY PARITY: [even tokens | odd tokens]; the
                # position iota below and the scale layout both use this
                # column order, so downstream math is order-agnostic.
                kb = k_ref[0, 0, h].astype(jnp.int32)
                for plane, shift in ((0, 4), (1, 0)):
                    sc_ref[h * R:(h + 1) * R,
                           plane * (P // 2):(plane + 1) * (P // 2)] = (
                        jax.lax.dot_general(
                            q, _dec4_plane(kb, shift), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ))
            else:
                k = k_ref[0, 0, h].astype(jnp.float32)  # (P, D) token-major
                sc_ref[h * R:(h + 1) * R, :] = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),  # contract D with D
                    preferred_element_type=jnp.float32,
                )
        ks = ks_ref[0, 0].astype(jnp.float32)  # (H, P)
        ksr = jnp.broadcast_to(ks[:, None, :], (H, R, P)).reshape(H * R, P)
        sc = sc_ref[:] * (ksr * scale)
        # token positions covered by THIS grid step: [j*P, j*P + P) — the
        # clamped index_map only changes WHICH physical page is resident,
        # masking is always in logical position space. The query sits at
        # position qpos = len-1 (len counts it) or len (has_new: the
        # current token rides in registers, len counts only POOL tokens)
        col = jax.lax.broadcasted_iota(jnp.int32, (H * R, P), 1)
        if kv4:
            # column c <-> in-page token 2*(c % P/2) + (c >= P/2): the
            # parity-grouped order the packed planes produce
            half = P // 2
            col = jnp.where(col < half, 2 * col, 2 * (col - half) + 1)
        pos = j * P + col
        qpos = len_ref[b] if has_new else len_ref[b] - 1
        if has_alibi:
            # ALiBi (BLOOM): -slope_h * (qpos - kpos) on the real logits
            sc = sc + sl_ref[:] * (pos - qpos).astype(jnp.float32)
        if softcap is not None:
            # Gemma-2 logit softcapping — on real logits, before masking
            sc = softcap * jnp.tanh(sc * jnp.float32(1.0 / softcap))

        valid = pos < len_ref[b]
        if window is not None:
            # sliding window: keys in (qpos - window, qpos]
            valid = jnp.logical_and(valid, pos >= qpos + 1 - window)
        sc = jnp.where(valid, sc, -1e30)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        w = jnp.exp(sc - m_new)  # (H*R, P)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(w, axis=1, keepdims=True)
        vs = vs_ref[0, 0].astype(jnp.float32)  # (H, P)
        vsr = jnp.broadcast_to(vs[:, None, :], (H, R, P)).reshape(H * R, P)
        wv = w * (vsr * jnp.float32(1.0 / (7.0 if kv4 else 127.0)))
        for h in range(H):
            sl = slice(h * R, (h + 1) * R)
            if kv4:
                # V pages share the packing: weight columns [even | odd]
                # pair with the decoded even/odd token-row planes
                vb = v_ref[0, 0, h].astype(jnp.int32)  # (P/2, D) packed
                pv_ref[sl, :] = jax.lax.dot_general(
                    wv[sl, : P // 2], _dec4_plane(vb, 4),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    wv[sl, P // 2:], _dec4_plane(vb, 0),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                v = v_ref[0, 0, h].astype(jnp.float32)  # (P, D)
                pv_ref[sl, :] = jax.lax.dot_general(
                    wv[sl, :], v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        m_ref[:] = m_new
        acc_ref[:] = acc_ref[:] * alpha + pv_ref[:]

    @pl.when(j == n_pages - 1)
    def _finalize():
        if has_new:
            # fold THIS STEP's token in from registers (deferred-write
            # design: the pool is one step stale; writes land once per
            # step after the layer loop). Exact online-softmax update —
            # equivalent to having read the token back from the pool.
            for h in range(H):
                q = q_ref[0, h].astype(jnp.float32)  # (R, D)
                kn = kn_ref[0, h].astype(jnp.float32)  # (1, D)
                sc_ref[h * R:(h + 1) * R, 0:1] = jnp.sum(
                    q * kn, axis=1, keepdims=True)
            ksn = ksn_ref[0].astype(jnp.float32)  # (H, 1)
            ksnr = jnp.broadcast_to(ksn[:, None, :], (H, R, 1)).reshape(H * R, 1)
            sc_new = sc_ref[:, 0:1] * (ksnr * scale)
            if softcap is not None:
                sc_new = softcap * jnp.tanh(sc_new * jnp.float32(1.0 / softcap))
            # the new token sits at distance 0 from the query: always
            # causal-valid and always inside any sliding window
            m_prev = m_ref[:]
            m2 = jnp.maximum(m_prev, sc_new)
            alpha = jnp.exp(m_prev - m2)
            w_new = jnp.exp(sc_new - m2)  # (H*R, 1)
            l2 = l_ref[:] * alpha + w_new
            vsn = vsn_ref[0].astype(jnp.float32)  # (H, 1)
            vsnr = jnp.broadcast_to(vsn[:, None, :], (H, R, 1)).reshape(H * R, 1)
            # kv4: the engine quantizes the in-register token on the same
            # int4 grid (values in [-7, 7] carried as int8), so the fold
            # is bit-consistent with reading the packed token back later
            wv_new = w_new * (vsnr * jnp.float32(1.0 / (7.0 if kv4 else 127.0)))
            for h in range(H):
                vn = vn_ref[0, h].astype(jnp.float32)  # (1, D)
                sl = slice(h * R, (h + 1) * R)
                pv_ref[sl, :] = acc_ref[sl, :] * alpha[sl, :] + wv_new[sl, :] * vn
            # l2 >= w_new > 0: no zero-length guard needed with a token
            o = pv_ref[:] / l2
        else:
            inv = jnp.where(len_ref[b] > 0, 1.0 / l_ref[:], 0.0)
            o = acc_ref[:] * inv
        o_ref[:] = o.reshape(o_ref.shape).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("window", "softcap", "sm_scale", "pages_hint"))
def _paged_attn_call(q4, kp, ksp, vp, vsp, li, page_table, lengths,
                     new_kv=None, window=None, softcap=None, sm_scale=None,
                     pages_hint=None, alibi=None):
    B, Hkv, rep, D = q4.shape
    P = vsp.shape[3]  # logical tokens/page (the SCALE leaf is per-token)
    kv4 = vp.dtype == jnp.uint8  # pair-packed pages: (..., P//2, D)
    PB = vp.shape[3]  # byte rows per page block (P or P//2)
    max_pages = page_table.shape[1]
    if pages_hint is not None:
        # truncate the grid to the host-known live horizon: skipped
        # trailing steps still cost per-step overhead (docstring)
        max_pages = max(1, min(int(pages_hint), max_pages))
    has_new = new_kv is not None

    def page_map(b, j, li, pt, lens):
        # clamp to the last USED page: trailing steps revisit the same
        # block (no DMA) instead of fetching garbage pages
        used = jnp.maximum((lens[b] + P - 1) // P, 1)
        return (li[0], pt[b, jnp.minimum(j, used - 1)], 0, 0, 0)

    def scale_map(b, j, li, pt, lens):
        used = jnp.maximum((lens[b] + P - 1) // P, 1)
        return (li[0], pt[b, jnp.minimum(j, used - 1)], 0, 0)

    in_specs = [
        pl.BlockSpec((1, Hkv, rep, D),
                     lambda b, j, li, pt, lens: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Hkv, PB, D), page_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Hkv, P), scale_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Hkv, PB, D), page_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Hkv, P), scale_map, memory_space=pltpu.VMEM),
    ]
    if alibi is not None:
        # per-q-head ALiBi slopes as one (Hq, 1) column block (last two
        # dims equal the array dims — min-tile escape)
        in_specs.append(
            pl.BlockSpec((Hkv * rep, 1), lambda b, j, li, pt, lens: (0, 0),
                         memory_space=pltpu.VMEM))
    if has_new:
        in_specs += [
            pl.BlockSpec((1, Hkv, 1, D), lambda b, j, li, pt, lens: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, 1, D), lambda b, j, li, pt, lens: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, 1), lambda b, j, li, pt, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, 1), lambda b, j, li, pt, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, max_pages),
        in_specs=in_specs,
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
    sm = sm_scale if sm_scale is not None else 1.0 / float(np.sqrt(D))
    kernel = functools.partial(
        _paged_attn_kernel, P=P, R=rep, H=Hkv, n_pages=max_pages,
        scale=sm / (7.0 if kv4 else 127.0), window=window, softcap=softcap,
        has_new=has_new, has_alibi=alibi is not None, kv4=kv4,
    )
    extra = ()
    if alibi is not None:
        extra += (alibi.reshape(Hkv * rep, 1).astype(jnp.float32),)
    if has_new:
        extra += (new_kv[0][:, :, None, :], new_kv[2][:, :, None, :],
                  new_kv[1][:, :, None], new_kv[3][:, :, None])
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
      lengths.astype(jnp.int32), q4, kp, ksp, vp, vsp, *extra)
    return out


def paged_decode_attention_int8_stacked(
    q: jax.Array,  # (B, 1, Hq, D) float
    kp: jax.Array,  # (L, NP, Hkv, P, D) int8 — K pages, token-major
    ks: jax.Array,  # (L, NP, Hkv, P) f32 per-token absmax
    vp: jax.Array,  # (L, NP, Hkv, P, D) int8 — V pages
    vs: jax.Array,  # (L, NP, Hkv, P) f32
    li,  # int or (1,) int32 — layer to attend over
    page_table: jax.Array,  # (B, MAXP) int32 page ids (garbage past used)
    lengths: jax.Array,  # (B,) int32 tokens IN THE POOL per sequence
    new_kv=None,  # optional (kq (B,Hkv,D) i8, ks (B,Hkv) f32, vq, vs):
    # THIS step's token folded in from registers (deferred-write design;
    # lengths then exclude it)
    window: Optional[int] = None,  # sliding window (Mistral/Gemma-2)
    softcap: Optional[float] = None,  # Gemma-2 logit softcapping
    sm_scale: Optional[float] = None,  # softmax scale override
    pages_hint: Optional[int] = None,  # static bound on USED pages/seq
    alibi_slopes: Optional[jax.Array] = None,  # (Hq,) ALiBi slopes (BLOOM)
) -> Optional[jax.Array]:
    """Single-step attention over layer `li` of a layer-STACKED paged
    int8 KV pool. The layer index is a scalar-prefetch operand: all
    layers share one compiled kernel and the pool is never sliced (an
    XLA slice would materialize the layer's pages every call).
    `pages_hint` (static) truncates the grid's page dimension to a
    host-known bound on used pages — see the module docstring for the
    measured trailing-step overhead it removes. Returns (B, 1, Hq, D)
    in q.dtype, or None if untileable (caller falls back to gathering
    pages and using the XLA path)."""
    B, T, Hq, D = q.shape
    Hkv, P = vp.shape[2], vs.shape[3]  # logical P from the per-token scales
    if T != 1 or D % 128 != 0 or Hq % Hkv != 0 or P % 128 != 0:
        return None
    if vp.shape[3] not in (P, P // 2):  # int8 or int4 pair-packed pages
        return None
    q4 = q.reshape(B, Hkv, Hq // Hkv, D)
    li = jnp.asarray(li, jnp.int32).reshape(1)
    if window is not None and window >= page_table.shape[1] * P:
        window = None  # can never bind
    out = _paged_attn_call(q4, kp, ks, vp, vs, li, page_table, lengths,
                           new_kv=new_kv, window=window, softcap=softcap,
                           sm_scale=sm_scale, pages_hint=pages_hint,
                           alibi=alibi_slopes)
    return out.reshape(B, 1, Hq, D)


def paged_decode_attention_int8(
    q: jax.Array,  # (B, 1, Hq, D) float
    kp: jax.Array,  # (NP, Hkv, P, D) int8 — K pages, token-major
    ks: jax.Array,  # (NP, Hkv, P) f32 per-token absmax
    vp: jax.Array,  # (NP, Hkv, P, D) int8 — V pages
    vs: jax.Array,  # (NP, Hkv, P) f32
    page_table: jax.Array,  # (B, MAXP) int32 page ids (garbage past used)
    lengths: jax.Array,  # (B,) int32 tokens in flight per sequence
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sm_scale: Optional[float] = None,
    pages_hint: Optional[int] = None,
    alibi_slopes: Optional[jax.Array] = None,
) -> Optional[jax.Array]:
    """Single-layer-pool convenience wrapper over the stacked kernel
    (expand_dims is a metadata-only reshape — no copy)."""
    return paged_decode_attention_int8_stacked(
        q, kp[None], ks[None], vp[None], vs[None], 0, page_table, lengths,
        window=window, softcap=softcap, sm_scale=sm_scale,
        pages_hint=pages_hint, alibi_slopes=alibi_slopes,
    )
