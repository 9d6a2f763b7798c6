"""Paged int8 KV storage: shared page pool + per-sequence page tables.

Companion to ops/paged_attention.py (see its docstring for the kernel
design). This module owns the memory side: a fixed pool of fixed-size
pages per layer, a free-list allocator, device-side page writes for
decode steps, and pagination of a contiguous prefill cache into pages.
HBM then scales with TOKENS IN FLIGHT instead of slots x max_seq_len —
at B=64 slots x 4k max_seq over 32 layers of 8 kv heads x 128, a
slot-contiguous int8 cache pins 17 GB while 64 sequences averaging 512
live tokens need 2.2 GB of pages.

The reference has no serving/attention code (SURVEY.md §5); the paging
scheme follows vLLM (arxiv 2309.06180) re-designed for TPU: page size is
a lane-aligned 128/256, tables are scalar-prefetched into the Mosaic
index_map (free only with head-folded page blocks — see
ops/paged_attention.py for the measured design history), decode writes
ride an in-place Pallas kernel over token-major pages, and the one-shot
prefill ingest uses dynamic_update_slice chains (no scatter HLO).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PageAllocator", "PagedKVPool", "init_page_pool", "paged_ingest"]


class PageAllocator:
    """Host-side page bookkeeping: free list + per-slot page tables.

    Pure scheduler state (no device arrays) so the engine can thread the
    device pool pytree through donated jitted steps while this object
    stays the allocation truth. `reserve_page0=True` keeps page 0 out of
    circulation as a scratch/trash page — retired engine slots keep
    writing there so their pages can be freed immediately."""

    def __init__(self, num_pages: int, page_size: int,
                 max_pages_per_seq: int, reserve_page0: bool = False):
        self.page_size = page_size
        self.num_pages = num_pages
        self.max_pages = max_pages_per_seq
        self._free: List[int] = list(range(1 if reserve_page0 else 0, num_pages))
        # slot -> list of allocated page ids (host-side truth)
        self.tables: Dict[int, List[int]] = {}

    def free_pages(self) -> int:
        return len(self._free)

    def alloc_slot(self, slot: int, n_tokens: int) -> List[int]:
        """Allocate pages to hold n_tokens for `slot` (replacing any
        current allocation)."""
        self.release_slot(slot)
        need = max(1, -(-n_tokens // self.page_size))
        if need > self.max_pages:
            raise ValueError(f"{n_tokens} tokens exceed max_pages_per_seq")
        if need > len(self._free):
            raise RuntimeError("page pool exhausted")
        pages = [self._free.pop() for _ in range(need)]
        self.tables[slot] = pages
        return pages

    def extend_slot(self, slot: int, n_tokens: int) -> None:
        """Grow slot's allocation to cover n_tokens (decode growth)."""
        pages = self.tables.setdefault(slot, [])
        need = max(1, -(-n_tokens // self.page_size))
        if need > self.max_pages:
            raise ValueError("sequence exceeds max_pages_per_seq")
        while len(pages) < need:
            if not self._free:
                raise RuntimeError("page pool exhausted")
            pages.append(self._free.pop())

    def release_slot(self, slot: int) -> None:
        for p in self.tables.pop(slot, []):
            self._free.append(p)

    def table_array(self, slots: Sequence[int]) -> jax.Array:
        """(B, max_pages) int32 device table for the given slots; unused
        entries repeat the last page (harmless: the kernel clamps)."""
        out = np.zeros((len(slots), self.max_pages), np.int32)
        for i, s in enumerate(slots):
            pages = self.tables.get(s, [0])
            out[i, : len(pages)] = pages
            out[i, len(pages):] = pages[-1] if pages else 0
        return jnp.asarray(out)


def init_page_pool(cfg, num_pages: int, page_size: int) -> Dict:
    """Device-side page pool pytree (engine paged mode). Layout per leaf
    (L = layers, NP = pages, H = kv heads, P = page size):
      k: (L, NP, H, P, D) int8  (TOKEN-MAJOR, same as V — the layout
         that makes single-token decode writes a legal in-place Pallas
         block; the attend dot contracts D on both operands)
      v: (L, NP, H, P, D) int8
      k_scale/v_scale: (L, NP, H, P) f32
    A page id addresses the same slot in every layer — one table serves
    the whole model, and the per-layer kernel slices pool[li].

    kv_bits=4 (cfg, r5): pages pack ADJACENT TOKEN PAIRS per byte —
    (L, NP, H, P//2, D) uint8, byte row r = token 2r (HI nibble) and
    2r+1 (LO), sign-magnitude codes on the ±7 grid. Scales stay
    per-token f32 but are stored in the kernel's COLUMN order (parity-
    grouped: [even tokens | odd tokens], index c(p) = (p%2)*(P/2) +
    p//2) so the attend kernel consumes them without an in-kernel
    gather. Two layouts were rejected on the real chip: channel-pair
    packing (last dim D/2=64 lane-pads uint8 arrays 2x — zero memory
    saved — and the relayouted DUS made XLA copy the pool), and split-
    half token packing (the flush needed read-modify-write, which gives
    the pool a second reader and copies it per step — compile-OOM at
    B=62). Adjacent pairing keeps writes FULL byte rows: an even-offset
    token writes (nib<<4) (its lo neighbour is a future token, masked),
    an odd-offset one writes (prev<<4)|nib from the one-step nib_prev
    staging leaf (models/llama.flush_paged_writes). Halves attention
    HBM reads and pool memory; decoded in-kernel
    (ops/paged_attention._dec4_plane) on clean (64, 128) uint8 tiles."""
    if page_size % 128:
        raise ValueError("page_size must be lane-aligned (multiple of 128)")
    bits = getattr(cfg, "kv_bits", 8)
    if bits not in (4, 8):
        raise ValueError(f"kv_bits must be 4 or 8, got {bits}")
    L, H, D = cfg.num_layers, cfg.num_kv_heads, cfg.hd
    rows = page_size // 2 if bits == 4 else page_size
    kv_dtype = jnp.uint8 if bits == 4 else jnp.int8
    return {
        "k": jnp.zeros((L, num_pages, H, rows, D), kv_dtype),
        "v": jnp.zeros((L, num_pages, H, rows, D), kv_dtype),
        "k_scale": jnp.zeros((L, num_pages, H, page_size), jnp.float32),
        "v_scale": jnp.zeros((L, num_pages, H, page_size), jnp.float32),
    }


def _pack4(c8: jax.Array, tok_axis: int) -> jax.Array:
    """int8 codes on the ±127 grid -> packed sign-magnitude int4 pairs
    of ADJACENT tokens: byte row r = token 2r (HI nibble) | 2r+1 (LO).
    Encoding is ops/paged_attention.requant_nib4 (shared with the
    insert-time nib_prev seeding, which must match bit-exactly)."""
    from ..ops.paged_attention import requant_nib4

    nib = requant_nib4(c8)
    P = nib.shape[tok_axis]
    ev = jax.lax.slice_in_dim(nib, 0, P, stride=2, axis=tok_axis)
    od = jax.lax.slice_in_dim(nib, 1, P, stride=2, axis=tok_axis)
    return ((ev << 4) | od).astype(jnp.uint8)


def add_nib_staging(pool: Dict, cfg, batch: int) -> Dict:
    """Attach the kv4 one-step nibble staging leaves (nib_prev_k/v,
    (L, B, H, D) uint8) to a paged pool dict — the single definition of
    the kv4 pool schema beyond init_page_pool (used by the engine, the
    serving bench, and the accuracy harness)."""
    L, H, D = cfg.num_layers, cfg.num_kv_heads, cfg.hd
    pool["nib_prev_k"] = jnp.zeros((L, batch, H, D), jnp.uint8)
    pool["nib_prev_v"] = jnp.zeros((L, batch, H, D), jnp.uint8)
    return pool


def _scale_cols(s: jax.Array, tok_axis: int) -> jax.Array:
    """Per-token scales -> the kernel's parity-grouped COLUMN order:
    index c(p) = (p%2)*(P/2) + p//2 (evens first, then odds)."""
    P = s.shape[tok_axis]
    ev = jax.lax.slice_in_dim(s, 0, P, stride=2, axis=tok_axis)
    od = jax.lax.slice_in_dim(s, 1, P, stride=2, axis=tok_axis)
    return jnp.concatenate([ev, od], axis=tok_axis)


def paged_ingest(pool: Dict, cacheK: Dict, page_ids: jax.Array,
                 used: jax.Array, valid: jax.Array) -> Dict:
    """Paginate a contiguous prefill scratch cache into the pool — the
    engine's jit-once insert (donate the pool for in-place pages).

    cacheK is the models/llama layout (k (L,K,H,D,S), v (L,K,H,S,D),
    scales (L,K,H,S)) with S a multiple of the page size; page_ids
    (K, MAXP) int32 maps prefill row k's page j to a pool page; used (K,)
    counts row k's live pages; valid (K,) masks padding rows. Invalid
    (k, j) combinations rewrite the target page's own current content
    (a no-op) so the fori_loop body stays shape-static — the same trick
    as engine.insert_fn."""
    K, MAXP = page_ids.shape
    P = pool["v_scale"].shape[3]  # logical tokens/page (kv4 packs rows)
    kv4 = pool["v"].dtype == jnp.uint8

    def body(i, pool):
        k, j = i // MAXP, i % MAXP
        ok = valid[k] & (j < used[k])
        pid = page_ids[k, j]
        s0 = j * P

        def put(big, small_page, start):
            cur = jax.lax.dynamic_slice(big, start, small_page.shape)
            return jax.lax.dynamic_update_slice(
                big, jnp.where(ok, small_page.astype(big.dtype), cur), start)

        kp = jax.lax.dynamic_slice_in_dim(  # (L,1,H,D,P) -> token-major
            jax.lax.dynamic_slice_in_dim(cacheK["k"], k, 1, axis=1), s0, P, axis=4
        ).transpose(0, 1, 2, 4, 3)
        vp = jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(cacheK["v"], k, 1, axis=1), s0, P, axis=3)
        ksp = jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(cacheK["k_scale"], k, 1, axis=1), s0, P, axis=3)
        vsp = jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(cacheK["v_scale"], k, 1, axis=1), s0, P, axis=3)
        if kv4:  # the int8 scratch requantizes onto the packed int4 grid
            kp, vp = _pack4(kp, tok_axis=3), _pack4(vp, tok_axis=3)
            ksp, vsp = _scale_cols(ksp, 3), _scale_cols(vsp, 3)
        pool = dict(pool)
        pool["k"] = put(pool["k"], kp, (0, pid, 0, 0, 0))
        pool["v"] = put(pool["v"], vp, (0, pid, 0, 0, 0))
        pool["k_scale"] = put(pool["k_scale"], ksp, (0, pid, 0, 0))
        pool["v_scale"] = put(pool["v_scale"], vsp, (0, pid, 0, 0))
        return pool

    return jax.lax.fori_loop(0, K * MAXP, body, dict(pool))


class PagedKVPool(PageAllocator):
    """Fixed pool of int8 KV pages shared by all sequences and layers —
    the standalone (non-engine) API: owns its device arrays and applies
    writes eagerly. See init_page_pool for the leaf layout; the engine's
    paged mode instead threads the pool pytree through donated jitted
    steps with a bare PageAllocator."""

    def __init__(self, cfg, num_pages: int, page_size: int = 128,
                 max_pages_per_seq: Optional[int] = None):
        super().__init__(
            num_pages, page_size,
            max_pages_per_seq or -(-cfg.max_seq_len // page_size),
        )
        self.cfg = cfg
        if getattr(cfg, "kv_bits", 8) == 4:
            raise NotImplementedError(
                "kv_bits=4 is supported by the engine's paged mode "
                "(deferred-write flush packs nibbles); this eager pool "
                "writes int8 rows — use InferenceEngine(paged=True).")
        pool = init_page_pool(cfg, num_pages, page_size)
        self.k, self.v = pool["k"], pool["v"]
        self.k_scale, self.v_scale = pool["k_scale"], pool["v_scale"]

    # -------------------------------------------------------------- writes
    def write_decode_step(self, li: int, kq, ks, vq, vs, slots: Sequence[int],
                          positions: np.ndarray) -> None:
        """Write one decode step's quantized k/v for layer `li`.
        kq (B, H, D, 1) int8, ks (B, H, 1), vq (B, H, 1, D), vs (B, H, 1);
        positions (B,) absolute token positions (callers already called
        extend_slot). Page id / offset resolve host-side (positions are
        host state in the engine), writes are per-batch DUS — in-place
        under jit, no scatter."""
        pids = np.array(
            [self.tables[s][positions[i] // self.page_size] for i, s in enumerate(slots)],
            np.int32,
        )
        offs = np.asarray(positions, np.int64) % self.page_size
        for b in range(len(slots)):
            p, o = int(pids[b]), int(offs[b])
            self.k = jax.lax.dynamic_update_slice(
                self.k, kq[b].transpose(0, 2, 1)[None, None].astype(jnp.int8),
                (li, p, 0, o, 0))
            self.v = jax.lax.dynamic_update_slice(
                self.v, vq[b][None, None].astype(jnp.int8), (li, p, 0, o, 0))
            self.k_scale = jax.lax.dynamic_update_slice(
                self.k_scale, ks[b][None, None], (li, p, 0, o))
            self.v_scale = jax.lax.dynamic_update_slice(
                self.v_scale, vs[b][None, None], (li, p, 0, o))

    def ingest_contiguous(self, slot: int, cache: Dict, batch_index: int,
                          n_tokens: int) -> None:
        """Paginate a slot-contiguous int8 cache (models/llama layout:
        k (L, B, H, D, S), v (L, B, H, S, D), scales (L, B, H, S)) into
        this pool — the prefill path: the model prefills its contiguous
        scratch cache once, then the pages are carved out of it with one
        slice+DUS per used page (S is page-aligned by construction when
        page_size divides the prefill bucket)."""
        P = self.page_size
        pages = self.alloc_slot(slot, n_tokens)
        for j, pid in enumerate(pages):
            s0 = j * P
            kpage = jax.lax.dynamic_slice_in_dim(
                cache["k"][:, batch_index], s0, P, axis=3
            ).transpose(0, 1, 3, 2)  # (L, H, P, D) token-major
            vpage = jax.lax.dynamic_slice_in_dim(
                cache["v"][:, batch_index], s0, P, axis=2)  # (L, H, P, D)
            kspage = jax.lax.dynamic_slice_in_dim(
                cache["k_scale"][:, batch_index], s0, P, axis=2)  # (L, H, P)
            vspage = jax.lax.dynamic_slice_in_dim(
                cache["v_scale"][:, batch_index], s0, P, axis=2)
            self.k = jax.lax.dynamic_update_slice(
                self.k, kpage[:, None], (0, pid, 0, 0, 0))
            self.v = jax.lax.dynamic_update_slice(
                self.v, vpage[:, None], (0, pid, 0, 0, 0))
            self.k_scale = jax.lax.dynamic_update_slice(
                self.k_scale, kspage[:, None], (0, pid, 0, 0))
            self.v_scale = jax.lax.dynamic_update_slice(
                self.v_scale, vspage[:, None], (0, pid, 0, 0))

    # ------------------------------------------------------------ attention
    def attend(self, li: int, q, slots: Sequence[int], lengths) -> Optional[jax.Array]:
        """Paged flash-decode for layer li: q (B, 1, Hq, D)."""
        from ..ops.paged_attention import paged_decode_attention_int8

        pt = self.table_array(slots)
        return paged_decode_attention_int8(
            q, self.k[li], self.k_scale[li], self.v[li], self.v_scale[li],
            pt, jnp.asarray(lengths, jnp.int32),
        )
