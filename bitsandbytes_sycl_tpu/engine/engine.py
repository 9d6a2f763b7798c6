"""Continuous-batching inference engine.

Slot-based scheduler over static shapes (jit-friendly): the KV cache is a
fixed (layers, max_batch, max_seq) int8 pytree; each sequence owns a batch
slot; prefill runs PENDING PROMPTS AS ONE PADDED BATCH into a scratch
cache and inserts each at its slot with dynamic_update_slice; decode
advances every active slot in one fused step. Finished slots are
immediately refilled from the pending queue — the "continuous batching"
of the north star (BASELINE.json).

Design notes:
- cache slot index == absolute token position, so padded prefill entries
  beyond the true length are overwritten by later decode writes before
  the causal mask can ever expose them.
- prompt lengths and prefill batch sizes are bucketed (powers of two) to
  bound recompilation.
- sampling (greedy or temperature/top-k) runs INSIDE the jitted step, so
  each decode step moves only (B,) int32 tokens to the host — not the
  (B, vocab) logits (a per-step host sync the reference-style perf-bug
  list would flag; cf. the reference's per-param synchronize,
  optim/optimizer.py:288).
- tensor parallelism: pass a Mesh (params pre-sharded with
  parallel.shard_llama_params); the engine shards the KV cache with
  kv_cache_specs, routes the forward through llama_forward_tp, and keeps
  cache shardings across insert/snapshot/restore.
- Everything device-side is functional; the scheduler is host-side
  Python, like every production JAX serving stack.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import LlamaConfig, init_kv_cache, llama_forward

__all__ = ["EngineConfig", "InferenceEngine"]


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    max_batch: int = 8
    max_new_tokens: int = 128
    eos_token: int = -1  # -1: never stop on a token
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => no top-k filter
    prefill_buckets: Sequence[int] = (32, 64, 128, 256, 512, 1024, 2048)
    # chunked prefill: > 0 ingests prompts in fixed chunks of this many
    # tokens through ONE compiled program (absolute-position cache
    # writes make every chunk identical), bounding per-dispatch latency
    # and VMEM for long prompts and replacing the per-T-bucket
    # compilation zoo. 0 = whole-prompt padded prefill. On TPU use a
    # multiple of 256 so chunks stay on the fused flash-prefill kernel.
    prefill_chunk: int = 0
    # paged KV cache (vLLM-style, engine/paged.py): decode attends
    # through per-slot page tables into a shared page pool, so KV HBM
    # scales with TOKENS IN FLIGHT instead of max_batch x max_seq_len.
    # num_pages=0 sizes the pool for the worst case (max_batch x
    # ceil(max_seq/page_size) + 1 reserved trash page) — size it down to
    # the expected live-token load to oversubscribe slots; the engine
    # raises "page pool exhausted" when decode outgrows it. Requires
    # kv_quant=True and max_seq_len % page_size == 0.
    paged: bool = False
    page_size: int = 128
    num_pages: int = 0
    # W8A8 prefill (r5, VERDICT r4 ask #4): amortize the 4-bit -> int8
    # regrid across a whole prefill batch instead of per linear call.
    # Each prefill batch runs ONE jitted repack of the params
    # (models.llama.repack_params_int8 — error <= rowmax/254, inside the
    # 4-bit format's own grid error) and every prefill/chunk call then
    # rides the int8-MXU path at 1.5-2.7x bf16 for ALL chunk sizes —
    # chunk=256 prefill no longer pays the exact path's ~0.5x. The
    # repacked tree is TRANSIENT: dropped when the prefill batch ends,
    # so decode keeps the 4-bit memory budget (the int8 copy exists
    # only during prefill — budget peak prefill HBM accordingly).
    # Decode numerics are unchanged; prefill KV/logits move from the
    # exact-decode path to the accepted W8A8 accuracy class.
    w8a8_prefill: bool = False


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _pow2_bucket(n: int, cap: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, cap)


def _grid_bucket(n: int, cap: int) -> int:
    """Bucket for the paged attend grid's pages_hint: powers of two up
    to 4, then multiples of 4. Pow2 alone wastes up to n-2 trailing
    steps right where it hurts (17 used pages -> bucket 32 re-adds
    ~4 ms/step at B=48); quarter-granularity caps the waste at 3 pages
    (~1 ms) for at most ~cap/4 + 2 compiled bucket variants."""
    b = n if n <= 2 else 4 * ((n + 3) // 4)
    return max(1, min(b, cap))


class InferenceEngine:
    """Continuous-batching decode over a quantized decoder model.

    Model-agnostic: any forward with the (params, cfg, tokens, cache,
    positions) -> (logits, cache) contract works — llama_forward
    (default) and models.gptj.gptj_forward both do. Pass matching
    forward_fn/init_cache_fn for non-llama families. With `mesh` the
    llama forward runs tensor-parallel (llama_forward_tp)."""

    def __init__(
        self,
        model_cfg: LlamaConfig,
        params: Dict,
        engine_cfg: EngineConfig = EngineConfig(),
        forward_fn=None,
        init_cache_fn=None,
        mesh: Optional[Mesh] = None,
        tp_axis: str = "model",
        lora=None,
    ):
        self.mcfg = model_cfg
        self.ecfg = engine_cfg
        self.params = params
        self.mesh = mesh
        self._tp_axis = tp_axis
        if engine_cfg.w8a8_prefill and mesh is not None:
            raise NotImplementedError(
                "w8a8_prefill does not compose with a TP mesh yet — "
                "the repacked {CB, SCB} leaves would need their own "
                "shardings; use repack_params_int8 on the unsharded "
                "tree before shard_llama_params instead"
            )
        # multi-adapter serving: a stack_lora pytree; each request picks
        # its adapter via add_request(adapter_id=...) (S-LoRA style)
        self._lora = lora
        if lora is not None:
            if forward_fn is not None:
                # model-agnostic forwards must accept the adapter kwargs
                # (gptj_forward and opt_forward do); fail at
                # construction, not deep inside the first jitted
                # prefill. A **kwargs wrapper is accepted (it forwards
                # the adapter kwargs at runtime).
                import inspect

                sig_params = inspect.signature(forward_fn).parameters
                has_var_kw = any(
                    p.kind is inspect.Parameter.VAR_KEYWORD
                    for p in sig_params.values()
                )
                if not has_var_kw and (
                    "lora" not in sig_params or "lora_ids" not in sig_params
                ):
                    raise NotImplementedError(
                        "forward_fn does not accept lora/lora_ids kwargs — "
                        "lora serving needs a forward with the llama_forward "
                        "adapter contract"
                    )
            first = next(iter(lora[0].values()))
            if first["A"].ndim != 3:
                raise ValueError(
                    "engine lora must be the STACKED form (stack_lora) — a "
                    "2D adapter would silently ignore adapter_ids"
                )
            self._n_adapters = int(first["A"].shape[0])
        init_cache = init_cache_fn or init_kv_cache
        self._cache_sharding = None
        if forward_fn is not None:
            fwd = forward_fn
        elif mesh is not None:
            from ..parallel.llama_tp import (
                kv_cache_specs, llama_forward_tp, shard_lora_params)

            if lora is not None:
                # adapters shard congruently with the base projections
                # (col targets: B on N; row targets: A on K — deltas ride
                # the existing per-layer psums token-identically)
                self._lora = lora = shard_lora_params(lora, mesh, tp_axis)

            def fwd(params, cfg, tokens, cache, positions, lora=None, lora_ids=None):
                return llama_forward_tp(
                    params, cfg, tokens, cache, positions, mesh, tp_axis,
                    lora=lora, lora_ids=lora_ids,
                )

            specs = kv_cache_specs(model_cfg, tp_axis)
            self._cache_sharding = jax.tree.map(
                lambda s: NamedSharding(mesh, s), specs,
                is_leaf=lambda x: isinstance(x, P),
            )
        else:
            fwd = llama_forward
        B = engine_cfg.max_batch
        self._alloc = None
        if engine_cfg.paged:
            from .paged import PageAllocator, init_page_pool

            if not model_cfg.kv_quant:
                raise ValueError("paged mode requires kv_quant=True (int8 pages)")
            if getattr(model_cfg, "kv_bits", 8) == 4 and mesh is not None:
                raise NotImplementedError(
                    "kv_bits=4 does not compose with a TP mesh yet — the "
                    "nib_prev staging leaves need their own shardings")
            if model_cfg.max_seq_len % engine_cfg.page_size:
                raise ValueError("paged mode needs max_seq_len % page_size == 0")
            maxp = model_cfg.max_seq_len // engine_cfg.page_size
            n_pages = engine_cfg.num_pages or (B * maxp + 1)
            # page 0 is the reserved trash page: retired slots keep
            # writing there so their real pages free immediately
            self._alloc = PageAllocator(
                n_pages, engine_cfg.page_size, maxp, reserve_page0=True)
            self.cache = init_page_pool(model_cfg, n_pages, engine_cfg.page_size)
            if getattr(model_cfg, "kv_bits", 8) == 4:
                # one-step nibble staging for the pair-packed flush
                # (models/llama.flush_paged_writes kv4 path)
                from .paged import add_nib_staging

                self.cache = add_nib_staging(self.cache, model_cfg, B)
        else:
            self.cache = init_cache(model_cfg, B)
        if self._cache_sharding is not None:
            self.cache = jax.device_put(self.cache, self._cache_sharding)
        self.seq_lens = np.zeros((B,), np.int32)  # host-side slot lengths
        self.active = np.zeros((B,), bool)
        self.slot_tokens: List[List[int]] = [[] for _ in range(B)]
        self.slot_budget = np.zeros((B,), np.int32)
        self._last_tokens = np.zeros((B,), np.int32)
        self.slot_adapter = np.zeros((B,), np.int32)
        self._rng = jax.random.PRNGKey(0)

        mcfg = model_cfg
        temperature = float(engine_cfg.temperature)
        top_k = int(engine_cfg.top_k)

        def sample(logits, key):
            """In-jit sampling: greedy or temperature/top-k categorical."""
            if temperature <= 0.0:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            l = logits.astype(jnp.float32) / temperature
            if top_k > 0:
                kth = jnp.sort(l, axis=-1)[:, -top_k][:, None]
                l = jnp.where(l < kth, -jnp.inf, l)
            return jax.random.categorical(key, l, axis=-1).astype(jnp.int32)

        lora = self._lora

        def fwd_l(params, cfg, tokens, cache, positions, ids):
            if lora is None:
                return fwd(params, cfg, tokens, cache, positions)
            return fwd(params, cfg, tokens, cache, positions,
                       lora=lora, lora_ids=ids)

        # W8A8 prefill (EngineConfig.w8a8_prefill): prefill calls see a
        # TRANSIENT int8-repacked params tree under a matching int8
        # config; decode keeps the original 4-bit params/config.
        pf_cfg = mcfg
        self._repack_prefill = None
        if engine_cfg.w8a8_prefill:  # mesh rejected at the top of __init__
            from ..models.llama import repack_params_int8

            try:
                pf_cfg = dataclasses.replace(
                    mcfg, quant="int8", llm_int8_threshold=0.0)
            except TypeError as e:
                raise NotImplementedError(
                    f"w8a8_prefill needs quant/llm_int8_threshold config "
                    f"fields ({type(mcfg).__name__} lacks them)"
                ) from e
            # ONE jitted dispatch per prefill batch (a per-leaf host loop
            # would pay the ~30 ms tunnel dispatch 200+ times)
            self._repack_prefill = jax.jit(
                lambda p: repack_params_int8(p, mcfg)[0])

        @jax.jit
        def prefill_fn(params, tokens, true_len, key, ids):
            """tokens (K, Tpad) -> (sampled next token (K,), cache_K)."""
            K, T = tokens.shape
            cacheK = init_cache(mcfg, K)
            pos = jnp.broadcast_to(jnp.arange(T), (K, T))
            logits, cacheK = fwd_l(params, pf_cfg, tokens, cacheK, pos, ids)
            last = jnp.take_along_axis(
                logits, (true_len - 1).reshape(K, 1, 1), axis=1
            )[:, 0]
            return sample(last, key), cacheK

        @jax.jit
        def chunk_prefill_fn(params, tokens_c, off, cacheK, true_len, key, ids):
            """One prefill CHUNK: tokens (K, C) at absolute offset `off`
            into the shared scratch cache. `off` is a traced scalar, so
            every chunk of every prompt length reuses one compiled
            program per (K, C). Returns (sampled token, hit, cacheK)
            where hit[k] marks the chunk containing prompt k's last
            token (whose sample is the request's first generated
            token)."""
            K, C = tokens_c.shape
            pos = off + jnp.broadcast_to(jnp.arange(C), (K, C))
            logits, cacheK = fwd_l(params, pf_cfg, tokens_c, cacheK, pos, ids)
            idx = jnp.clip(true_len - 1 - off, 0, C - 1)
            last = jnp.take_along_axis(logits, idx.reshape(K, 1, 1), axis=1)[:, 0]
            hit = (true_len - 1 >= off) & (true_len - 1 < off + C)
            return sample(last, key), hit, cacheK

        @jax.jit
        def insert_fn(cache, cacheK, slots, valid):
            """Insert every valid sub-batch k of the prefill cache at batch
            slot slots[k] — ONE jitted call (and one cache round-trip) per
            prefill batch; XLA chains the dynamic_update_slices in place.
            Invalid (padding) entries rewrite the slot's own current
            content, i.e. a no-op. Small K unrolls; large K rolls into a
            fori_loop so HLO size stays O(1) in prefill batch (compile
            time at max_batch>=32 was linear in K x cache leaves)."""
            K = slots.shape[0]

            def ins_k(k, cache):
                def ins(big, small):
                    # big (L, B, S, ...), small (L, K, S, ...)
                    small_k = jax.lax.dynamic_slice_in_dim(small, k, 1, axis=1)
                    start = (0, slots[k]) + (0,) * (big.ndim - 2)
                    cur = jax.lax.dynamic_slice(big, start, small_k.shape)
                    small_k = jnp.where(valid[k], small_k.astype(big.dtype), cur)
                    return jax.lax.dynamic_update_slice(big, small_k, start)

                return jax.tree_util.tree_map(ins, cache, cacheK)

            if K > 16:
                cache = jax.lax.fori_loop(0, K, ins_k, cache)
            else:
                for k in range(K):
                    cache = ins_k(k, cache)
            if self._cache_sharding is not None:
                cache = jax.lax.with_sharding_constraint(cache, self._cache_sharding)
            return cache

        @partial(jax.jit, static_argnums=(0,))
        def broadcast_prefix_fn(Kb, prefix_cache):
            """(L, 1, ...) stored prefix KV -> (L, Kb, ...) scratch cache
            (chunked-prefill-over-prefix starts from this instead of a
            zero cache; absolute positions make the rest identical)."""
            out = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(
                    x, (x.shape[0], Kb) + x.shape[2:]
                ).astype(x.dtype),
                prefix_cache,
            )
            if self._cache_sharding is not None:
                out = jax.lax.with_sharding_constraint(out, self._cache_sharding)
            return out

        @jax.jit
        def prefix_prefill_fn(params, tokens, true_len, key, ids, prefix_cache, plen):
            """Suffix prefill on top of a shared-prefix cache: the scratch
            cache starts as the stored prefix KV (broadcast across the
            batch) and suffix positions continue at `plen` — absolute-
            position masking attends the prefix rows for free."""
            K, T = tokens.shape
            cacheK = broadcast_prefix_fn(K, prefix_cache)
            pos = plen + jnp.broadcast_to(jnp.arange(T), (K, T))
            logits, cacheK = fwd_l(params, pf_cfg, tokens, cacheK, pos, ids)
            last = jnp.take_along_axis(
                logits, (true_len - 1).reshape(K, 1, 1), axis=1
            )[:, 0]
            return sample(last, key), cacheK

        @jax.jit
        def decode_fn(params, cache, tokens, positions, key, ids):
            """tokens (B, 1), positions (B, 1) -> (next tokens (B,), cache).
            Sampling stays on device: the step's host transfer is B int32s."""
            logits, cache = fwd_l(params, mcfg, tokens, cache, positions, ids)
            return sample(logits[:, 0], key), cache

        @partial(jax.jit, donate_argnums=(1,), static_argnums=(9,))
        def paged_decode_fn(params, pool, page_table, write_page, write_off,
                            tokens, positions, key, ids, pages_hint):
            """Paged decode step: the pool pytree is DONATED so page
            writes stay in place; the host-resolved indirection (table +
            this step's write page/offset per row) rides inside the cache
            dict, which write_and_attend recognizes. `pages_hint`
            (static, bucketed by step() via _grid_bucket) truncates the
            attend grid to the live page horizon — trailing grid steps
            cost ~0.1-0.3 us each even when skipped, 2.2x the whole
            attend at the B=48 avg-512 point (ops/paged_attention.py)."""
            cache = dict(pool)
            cache["page_table"] = page_table
            cache["write_page"] = write_page
            cache["write_off"] = write_off
            cfg = (mcfg if pages_hint is None
                   else dataclasses.replace(mcfg, pages_hint=pages_hint))
            logits, cache = fwd_l(params, cfg, tokens, cache, positions, ids)
            return sample(logits[:, 0], key), {k: cache[k] for k in pool}

        @partial(jax.jit, donate_argnums=(0,))
        def paged_insert_fn(pool, cacheK, page_ids, used, valid, slot_arr, lens):
            from .paged import paged_ingest

            pool = paged_ingest(pool, cacheK, page_ids, used, valid)
            if "nib_prev_k" in pool:
                # kv4: seed the nibble staging leaf with each row's LAST
                # prefill token so its odd-offset first decode write can
                # rebuild the shared byte without reading the pool.
                # requant_nib4 IS _pack4's encoder — bit-exact by
                # construction (shared helper in ops/paged_attention.py).
                from ..ops.paged_attention import requant_nib4 as nib4

                idx = jnp.maximum(lens - 1, 0)
                k_last = jnp.take_along_axis(  # k: (L,K,H,D,S) token-LAST
                    cacheK["k"], idx.reshape(1, -1, 1, 1, 1), axis=4)[..., 0]
                v_last = jnp.take_along_axis(  # v: (L,K,H,S,D)
                    cacheK["v"], idx.reshape(1, -1, 1, 1, 1), axis=3)[:, :, :, 0, :]
                nk, nv = nib4(k_last), nib4(v_last)
                for i in range(slot_arr.shape[0]):
                    s = slot_arr[i]
                    for leaf, src in (("nib_prev_k", nk), ("nib_prev_v", nv)):
                        cur = jax.lax.dynamic_slice(
                            pool[leaf], (0, s, 0, 0),
                            (src.shape[0], 1, src.shape[2], src.shape[3]))
                        u = jnp.where(valid[i], src[:, i][:, None], cur)
                        pool[leaf] = jax.lax.dynamic_update_slice(
                            pool[leaf], u, (0, s, 0, 0))
            if self._cache_sharding is not None:  # keep pages head-sharded
                pool = jax.lax.with_sharding_constraint(pool, self._cache_sharding)
            return pool

        self._paged_decode = paged_decode_fn
        self._paged_insert = paged_insert_fn
        self._broadcast_prefix = broadcast_prefix_fn
        self._prefill = prefill_fn
        self._prefix_prefill = prefix_prefill_fn
        self._chunk_prefill = chunk_prefill_fn
        self._insert = insert_fn
        self._decode = decode_fn
        self._prefixes: Dict[int, Dict] = {}  # prefix_id -> {cache, tokens, adapter}
        self._next_prefix_id = 0
        self._fwd = fwd
        self._init_cache = init_cache

    def _next_key(self):
        self._rng, key = jax.random.split(self._rng)
        return key

    # ----------------------------------------------------------------- slots
    def register_prefix(self, prefix_ids: Sequence[int], adapter_id: int = 0) -> int:
        """Prefill a shared prefix (e.g. a system prompt) ONCE and keep
        its KV; add_request(prefix=pid) then pays only the suffix prefill.
        The stored cache is (L, 1, S, ...) and broadcasts across each
        prefill batch."""
        prompt = list(prefix_ids)
        if not prompt or len(prompt) > self.mcfg.max_seq_len - 2:
            raise ValueError("prefix must be non-empty and fit the cache")
        T = min(
            max(_bucket(len(prompt), self.ecfg.prefill_buckets), len(prompt)),
            self.mcfg.max_seq_len,
        )
        toks = np.zeros((1, T), np.int32)
        toks[0, : len(prompt)] = prompt
        _, cache1 = self._prefill(
            self._prefill_params(), jnp.asarray(toks),
            jnp.asarray([len(prompt)], np.int32),
            self._next_key(), jnp.asarray([adapter_id], np.int32),
        )
        pid = self._next_prefix_id
        self._next_prefix_id += 1
        self._prefixes[pid] = {"cache": cache1, "tokens": prompt, "adapter": adapter_id}
        return pid

    def _prefill_params(self):
        """Params tree the prefill calls should see: the original tree,
        or (w8a8_prefill) a TRANSIENT int8 repack rebuilt per prefill
        batch in one jitted dispatch (~165 us/weight of regrid, amortized
        over every chunk of the batch) and dropped when the caller's
        reference dies — decode never holds the int8 copy."""
        if self._repack_prefill is None:
            return self.params
        return self._repack_prefill(self.params)

    def unregister_prefix(self, pid: int) -> None:
        """Free a cached prefix's device KV (prefixes otherwise pin a full
        (L, 1, max_seq, ...) cache each for the process lifetime)."""
        self._prefixes.pop(pid, None)

    def free_slots(self) -> List[int]:
        return [i for i in range(self.ecfg.max_batch) if not self.active[i]]

    def add_request(
        self, prompt_ids: Sequence[int], max_new_tokens: Optional[int] = None,
        adapter_id: int = 0,
    ) -> int:
        """Prefill a prompt into a free slot; returns the slot id."""
        return self.add_requests([prompt_ids], max_new_tokens, [adapter_id])[0]

    def add_requests(
        self, prompts: Sequence[Sequence[int]], max_new_tokens: Optional[int] = None,
        adapter_ids: Optional[Sequence[int]] = None,
        prefix: Optional[int] = None,
    ) -> List[int]:
        """Prefill several prompts as ONE padded batch (reference-free
        design; round-1 prefilled sequentially batch-1 per request, a
        wall-clock bug at engine fill time). Returns the slot ids."""
        slots = self.free_slots()
        if len(prompts) > len(slots):
            raise RuntimeError("not enough free slots; call step() until they free")
        if not prompts:
            return []
        budget = self.ecfg.max_new_tokens if max_new_tokens is None else max_new_tokens
        if budget < 1:
            raise ValueError("max_new_tokens must be >= 1")
        pre = self._prefixes[prefix] if prefix is not None else None
        plen = len(pre["tokens"]) if pre is not None else 0
        # omitting adapter_ids means adapter 0 for every request; make that
        # explicit BEFORE the prefix check so a prefix registered with
        # adapter!=0 can never be silently mixed with default-adapter decode
        eff_adapter_ids = adapter_ids if adapter_ids is not None else [0] * len(prompts)
        n_ad = getattr(self, "_n_adapters", 1)
        for a in eff_adapter_ids:
            if not 0 <= a < max(n_ad, 1):
                raise ValueError(f"adapter_id {a} out of range [0, {n_ad})")
        if pre is not None and any(a != pre["adapter"] for a in eff_adapter_ids):
            # the prefix KV was computed WITH its adapter's deltas
            raise ValueError(
                "prefix was registered with adapter "
                f"{pre['adapter']}; requests using it must match"
            )
        for prompt in prompts:
            if plen + len(prompt) > self.mcfg.max_seq_len - 1:
                raise ValueError("prompt longer than max_seq_len")
        # one common length bucket (shorter prompts pad up to it) and a
        # pow2 batch bucket — bounds compilations to |Kb| x |Tb| variants.
        # Prompts past the largest bucket still get a T that FITS them
        # (clamped to the cache length).
        max_len = max(len(p) for p in prompts)
        T = min(
            max(_bucket(max_len, self.ecfg.prefill_buckets), max_len),
            self.mcfg.max_seq_len - plen,
        )
        K = len(prompts)
        Kb = _pow2_bucket(K, self.ecfg.max_batch)
        toks = np.zeros((Kb, T), np.int32)
        lens = np.ones((Kb,), np.int32)  # dummy rows: len 1, never inserted
        for i, prompt in enumerate(prompts):
            toks[i, : len(prompt)] = prompt
            lens[i] = len(prompt)
        aid = np.zeros((Kb,), np.int32)
        aid[: len(eff_adapter_ids)] = eff_adapter_ids
        chunk = self.ecfg.prefill_chunk
        # chunking pads T up to a chunk multiple (Tc); if plen + Tc
        # overruns the cache, the last chunk's dynamic_update_slice write
        # would CLAMP its start and silently clobber earlier KV — route
        # such near-capacity prompts through the unchunked path instead
        # (always correct: T itself fits by the prompt-length guard)
        chunk_fits = (
            chunk > 0
            and plen + (-(-T // chunk) * chunk) <= self.mcfg.max_seq_len
        )
        if chunk_fits and T > chunk:
            # chunked prefill: re-pad to a multiple of the chunk size and
            # stream chunks through ONE compiled program, carrying the
            # scratch cache; the chunk containing each prompt's last
            # token contributes its sampled first generation. COMPOSES
            # with prefix caching: the scratch cache starts as the
            # broadcast prefix KV and chunk offsets/lengths are absolute
            # (plen 0 without a prefix — same compiled program), so a
            # long suffix on a shared prefix pays only chunked SUFFIX
            # prefill (r3 review: the old elif silently skipped chunking
            # for prefix requests).
            Tc = -(-T // chunk) * chunk
            toks_c = np.zeros((Kb, Tc), np.int32)
            toks_c[:, :T] = toks
            if pre is not None:
                cacheK = self._broadcast_prefix(Kb, pre["cache"])
            else:
                cacheK = self._init_cache(self.mcfg, Kb)
                if self._cache_sharding is not None:
                    cacheK = jax.device_put(cacheK, self._cache_sharding)
            lens_j = jnp.asarray(lens) + jnp.int32(plen)  # absolute
            aid_j = jnp.asarray(aid)
            nxt = jnp.zeros((Kb,), jnp.int32)
            pparams = self._prefill_params()  # transient under w8a8_prefill
            for ci in range(Tc // chunk):
                tok, hit, cacheK = self._chunk_prefill(
                    pparams, jnp.asarray(toks_c[:, ci * chunk:(ci + 1) * chunk]),
                    jnp.int32(plen + ci * chunk), cacheK, lens_j,
                    self._next_key(), aid_j,
                )
                nxt = jnp.where(hit, tok, nxt)
            del pparams
        elif pre is not None:
            nxt, cacheK = self._prefix_prefill(
                self._prefill_params(), jnp.asarray(toks), jnp.asarray(lens),
                self._next_key(), jnp.asarray(aid), pre["cache"],
                jnp.int32(plen),
            )
        else:
            nxt, cacheK = self._prefill(
                self._prefill_params(), jnp.asarray(toks), jnp.asarray(lens),
                self._next_key(), jnp.asarray(aid),
            )
        nxt = np.asarray(nxt)
        slot_arr = np.zeros((Kb,), np.int32)
        valid = np.zeros((Kb,), bool)
        for i in range(K):
            slot_arr[i] = slots[i]
            valid[i] = True
        if self._alloc is not None:
            # paginate the contiguous prefill scratch into pool pages
            maxp = self._alloc.max_pages
            page_ids = np.zeros((Kb, maxp), np.int32)
            used = np.zeros((Kb,), np.int32)
            got: List[int] = []
            try:
                for i, prompt in enumerate(prompts):
                    pages = self._alloc.alloc_slot(slots[i], plen + len(prompt))
                    page_ids[i, : len(pages)] = pages
                    used[i] = len(pages)
                    got.append(slots[i])
            except Exception:
                for s in got:  # don't leak pages on pool exhaustion
                    self._alloc.release_slot(s)
                raise
            total = np.asarray(lens, np.int32) + np.int32(plen)  # absolute
            self.cache = self._paged_insert(
                self.cache, cacheK, jnp.asarray(page_ids),
                jnp.asarray(used), jnp.asarray(valid),
                jnp.asarray(slot_arr), jnp.asarray(total),
            )
        else:
            self.cache = self._insert(
                self.cache, cacheK, jnp.asarray(slot_arr), jnp.asarray(valid)
            )
        out_slots: List[int] = []
        for i, prompt in enumerate(prompts):
            slot = slots[i]
            tok = int(nxt[i])
            full_prompt = (pre["tokens"] if pre is not None else []) + list(prompt)
            self.slot_tokens[slot] = full_prompt + [tok]
            self.slot_adapter[slot] = aid[i]
            self.seq_lens[slot] = len(full_prompt)
            self._last_tokens[slot] = tok
            self.slot_budget[slot] = budget - 1
            # the prefill already produced one token: it may exhaust the
            # budget or be EOS — retire immediately in that case
            self.active[slot] = not (
                tok == self.ecfg.eos_token or self.slot_budget[slot] <= 0
            )
            out_slots.append(slot)
        return out_slots

    def step(self) -> Dict[int, int]:
        """One decode step for every active slot. Returns {slot: new_token}
        and retires finished slots."""
        if not self.active.any():
            return {}
        B = self.ecfg.max_batch
        tokens = jnp.asarray(self._last_tokens.reshape(B, 1), jnp.int32)
        positions = jnp.asarray(self.seq_lens.reshape(B, 1), jnp.int32)
        if self._alloc is not None:
            P = self.ecfg.page_size
            # inactive rows write to the reserved trash page 0 so retired
            # slots' pages are ALREADY free (released at retirement)
            wp = np.zeros((B,), np.int32)
            wo = np.zeros((B,), np.int32)
            used_pages = 1
            for b in range(B):
                if self.active[b]:
                    pos = int(self.seq_lens[b])
                    self._alloc.extend_slot(b, pos + 1)
                    wp[b] = self._alloc.tables[b][pos // P]
                    wo[b] = pos % P
                    used_pages = max(used_pages, -(-pos // P))
            # static attend-grid truncation, bucketed so the number of
            # compiled variants stays small (see paged_decode_fn)
            hint = _grid_bucket(used_pages, self.mcfg.max_seq_len // P)
            nxt_dev, self.cache = self._paged_decode(
                self.params, self.cache, self._alloc.table_array(range(B)),
                jnp.asarray(wp), jnp.asarray(wo), tokens, positions,
                self._next_key(), jnp.asarray(self.slot_adapter), hint,
            )
        else:
            nxt_dev, self.cache = self._decode(
                self.params, self.cache, tokens, positions, self._next_key(),
                jnp.asarray(self.slot_adapter),
            )
        nxt = np.asarray(nxt_dev)  # the step's single host transfer
        out: Dict[int, int] = {}
        for b in range(B):
            if not self.active[b]:
                continue
            self.seq_lens[b] += 1
            tok = int(nxt[b])
            self.slot_tokens[b].append(tok)
            self._last_tokens[b] = tok
            out[b] = tok
            self.slot_budget[b] -= 1
            done = (
                tok == self.ecfg.eos_token
                or self.slot_budget[b] <= 0
                or self.seq_lens[b] >= self.mcfg.max_seq_len - 1
            )
            if done:
                self.active[b] = False
                if self._alloc is not None:
                    self._alloc.release_slot(b)
        return out

    def generate(
        self, prompts: Sequence[Sequence[int]], max_new_tokens: Optional[int] = None,
        adapter_ids: Optional[Sequence[int]] = None,
        on_token=None,
    ) -> List[List[int]]:
        """Continuous batching: streams prompts through the slot pool.
        `adapter_ids` (one per prompt) routes each request to its adapter
        when the engine serves a stack_lora pytree. `on_token(request_id,
        token)` streams each generated token as it is produced."""
        pending = list(enumerate(prompts))
        results: Dict[int, List[int]] = {}
        slot_owner: Dict[int, int] = {}

        def fill():
            take = min(len(pending), len(self.free_slots()))
            if not take:
                return
            batch = [pending.pop(0) for _ in range(take)]
            aids = [adapter_ids[rid] if adapter_ids is not None else 0 for rid, _ in batch]
            slots = self.add_requests([p for _, p in batch], max_new_tokens, aids)
            for (rid, prompt), slot in zip(batch, slots):
                if on_token is not None:
                    on_token(rid, self.slot_tokens[slot][-1])  # prefill's token
                if self.active[slot]:
                    slot_owner[slot] = rid
                else:  # retired at prefill (budget 1 or first-token EOS)
                    results[rid] = self.slot_tokens[slot][len(prompt):]

        fill()
        while self.active.any() or pending:
            before = self.active.copy()
            new = self.step()
            if on_token is not None:
                for slot, tok in new.items():
                    if slot in slot_owner:
                        on_token(slot_owner[slot], tok)
            for b in range(self.ecfg.max_batch):
                if before[b] and not self.active[b]:
                    rid = slot_owner.pop(b, None)
                    if rid is None:  # slot activated outside this generate()
                        continue
                    plen = len(prompts[rid])
                    results[rid] = self.slot_tokens[b][plen:]
            fill()
        return [results[i] for i in range(len(prompts))]


    def generate_speculative(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: int,
        draft_params: Dict,
        draft_cfg,
        gamma: int = 4,
        temperature: float = 0.0,
        seed: int = 0,
        draft_forward=None,
    ) -> List[List[int]]:
        """Latency-oriented speculative generation: the whole batch runs
        the single-dispatch jitted draft-verify loop (engine/speculative.py)
        against this engine's model (its forward_fn) as the target.
        Ragged prompts are right-padded to the bucket with per-row
        cursors (r5) — each row's output is exactly its own-prompt
        generation; the batch still COMMITS in lockstep (min-acceptance),
        so prefer generate() when prompt lengths vary wildly and
        throughput matters. Does not touch the slot pool/cache. EOS
        truncation matches generate() (output includes the EOS token,
        nothing after it).

        Under a TP mesh both target and draft forwards route through
        llama_forward_tp (the engine's own fwd): pass draft_params
        pre-sharded with shard_llama_params(draft_cfg) on the same mesh.
        The loop-carried caches inherit the kv_cache_specs shardings from
        the shard_map out_specs via GSPMD propagation, so weights and KV
        never gather."""
        from .speculative import speculative_generate_jit

        if self.mesh is not None:
            # same divisibility contract as the engine's own TP forward —
            # fail fast here rather than deep inside the jitted loop
            tp = self.mesh.shape[self._tp_axis]
            if (
                draft_cfg.num_heads % tp
                or draft_cfg.num_kv_heads % tp
                or draft_cfg.intermediate_size % tp
            ):
                raise ValueError(
                    f"draft config not divisible by TP={tp} "
                    "(heads/kv_heads/intermediate_size)"
                )
        if self._lora is not None:
            raise NotImplementedError(
                "speculative decoding does not apply the engine's lora "
                "adapters — it would silently serve the base model"
            )
        lens = [len(p) for p in prompts]
        if min(lens) < 1:
            raise ValueError("generate_speculative needs non-empty prompts")
        T = max(lens)
        # ragged batches (r5): RIGHT-pad to the bucket; pad slots sit past
        # each row's cursor so the absolute-position mask hides them until
        # real tokens overwrite them (speculative_generate_jit docstring)
        toks = np.zeros((len(prompts), T), np.int32)
        for i, pr in enumerate(prompts):
            toks[i, : lens[i]] = pr
        out, _stats = speculative_generate_jit(
            self.params, self.mcfg, draft_params, draft_cfg,
            jnp.asarray(toks), max_new_tokens, gamma=gamma,
            temperature=temperature, seed=seed,
            target_forward=self._fwd,
            # the draft is usually the same model family as the target
            draft_forward=draft_forward or self._fwd,
            lengths=jnp.asarray(lens, jnp.int32),
        )
        rows = [list(map(int, row)) for row in np.asarray(out)]
        eos = self.ecfg.eos_token
        if eos >= 0:
            rows = [r[: r.index(eos) + 1] if eos in r else r for r in rows]
        return rows

    # ------------------------------------------------------------- recovery
    def snapshot(self) -> Dict:
        """Checkpointable engine state: the (quantized) KV cache plus the
        host-side scheduler state — SURVEY.md §5's "restartable decode
        loop with checkpointed KV-cache" (the reference has no failure
        story: host launchers std::exit(1) on error, op_quant.cpp:916).
        Pair with checkpoints.save_checkpoint for durable snapshots."""
        snap = {
            "cache": self.cache,
            "seq_lens": self.seq_lens.copy(),
            "active": self.active.copy(),
            "slot_tokens": [list(t) for t in self.slot_tokens],
            "slot_budget": self.slot_budget.copy(),
            "slot_adapter": self.slot_adapter.copy(),
            "last_tokens": self._last_tokens.copy(),
            "rng": np.asarray(jax.random.key_data(self._rng)).copy(),
        }
        if self._alloc is not None:  # page-table truth rides the snapshot
            snap["page_tables"] = [
                list(self._alloc.tables.get(b, []))
                for b in range(self.ecfg.max_batch)
            ]
        return snap

    def durable_snapshot(self) -> Dict:
        """snapshot() with every field as a fixed-shape array — directly
        orbax-serializable (checkpoints.save_checkpoint) for crash-restart
        durability."""
        snap = self.snapshot()
        # size from the actual slot contents: per-call max_new_tokens
        # overrides can exceed ecfg.max_new_tokens
        S = max(
            self.mcfg.max_seq_len + self.ecfg.max_new_tokens,
            max((len(t) for t in snap["slot_tokens"]), default=0) + 1,
        )
        toks = np.zeros((self.ecfg.max_batch, S), np.int32)
        lens = np.zeros((self.ecfg.max_batch,), np.int32)
        for i, t in enumerate(snap.pop("slot_tokens")):
            toks[i, : len(t)] = t
            lens[i] = len(t)
        snap["slot_tokens_padded"] = toks
        snap["slot_token_lens"] = lens
        if "page_tables" in snap:
            tabs = snap.pop("page_tables")
            pt = np.zeros((self.ecfg.max_batch, self._alloc.max_pages), np.int32)
            pl = np.zeros((self.ecfg.max_batch,), np.int32)
            for i, t in enumerate(tabs):
                pt[i, : len(t)] = t
                pl[i] = len(t)
            snap["page_tables_padded"] = pt
            snap["page_table_lens"] = pl
        return snap

    def restore_durable(self, snap: Dict) -> None:
        snap = dict(snap)
        toks = np.asarray(snap.pop("slot_tokens_padded"))
        lens = np.asarray(snap.pop("slot_token_lens"))
        snap["slot_tokens"] = [
            [int(x) for x in row[:l]] for row, l in zip(toks, lens)
        ]
        if "page_tables_padded" in snap:
            pt = np.asarray(snap.pop("page_tables_padded"))
            pl = np.asarray(snap.pop("page_table_lens"))
            snap["page_tables"] = [
                [int(x) for x in row[:l]] for row, l in zip(pt, pl)
            ]
        self.restore(snap)

    def restore(self, snap: Dict) -> None:
        """Resume decoding from a snapshot (same model/engine config):
        in-flight requests continue from their exact positions. Under TP
        the cache is re-placed with its mesh shardings."""
        cache = jax.tree_util.tree_map(jnp.asarray, snap["cache"])
        if self._cache_sharding is not None:
            cache = jax.device_put(cache, self._cache_sharding)
        self.cache = cache
        self.seq_lens = np.asarray(snap["seq_lens"], np.int32).copy()
        self.active = np.asarray(snap["active"], bool).copy()
        self.slot_tokens = [list(t) for t in snap["slot_tokens"]]
        self.slot_budget = np.asarray(snap["slot_budget"], np.int32).copy()
        if "slot_adapter" in snap:
            self.slot_adapter = np.asarray(snap["slot_adapter"], np.int32).copy()
        else:
            # older snapshots predate multi-lora: they were taken with every
            # slot on adapter 0, so stale per-slot ids from THIS engine's
            # prior serving must not leak into the resumed decode
            self.slot_adapter = np.zeros_like(self.slot_adapter)
        self._last_tokens = np.asarray(snap["last_tokens"], np.int32).copy()
        if self._alloc is not None:
            if "page_tables" not in snap:
                raise ValueError(
                    "snapshot has no page tables — it was taken by a "
                    "non-paged engine and cannot restore into paged mode"
                )
            tabs = snap["page_tables"]
            self._alloc.tables = {
                b: list(map(int, t)) for b, t in enumerate(tabs) if len(t)
            }
            held = {p for t in self._alloc.tables.values() for p in t}
            self._alloc._free = [
                p for p in range(1, self._alloc.num_pages) if p not in held
            ]
        if "rng" in snap:  # sampled decoding resumes bit-identically too
            self._rng = jax.random.wrap_key_data(jnp.asarray(snap["rng"]))
