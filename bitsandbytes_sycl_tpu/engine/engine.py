"""Continuous-batching inference engine.

Slot-based scheduler over static shapes (jit-friendly): the KV cache is a
fixed (layers, max_batch, max_seq) int8 pytree; each sequence owns a batch
slot; prefill runs batch-1 into a scratch cache and is inserted at its
slot with dynamic_update_slice; decode advances every active slot in one
fused step. Finished slots are immediately refilled from the pending
queue — the "continuous batching" of the north star (BASELINE.json).

Design notes:
- cache slot index == absolute token position, so padded prefill entries
  beyond the true length are overwritten by later decode writes before
  the causal mask can ever expose them.
- prompt lengths are bucketed (powers of two) to bound recompilation.
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


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class InferenceEngine:
    """Continuous-batching decode over a quantized decoder model.

    Model-agnostic: any forward with the (params, cfg, tokens, cache,
    positions) -> (logits, cache) contract works — llama_forward
    (default) and models.gptj.gptj_forward both do. Pass matching
    forward_fn/init_cache_fn for non-llama families."""

    def __init__(
        self,
        model_cfg: LlamaConfig,
        params: Dict,
        engine_cfg: EngineConfig = EngineConfig(),
        forward_fn=None,
        init_cache_fn=None,
    ):
        self.mcfg = model_cfg
        self.ecfg = engine_cfg
        self.params = params
        fwd = forward_fn or llama_forward
        init_cache = init_cache_fn or init_kv_cache
        B = engine_cfg.max_batch
        self.cache = init_cache(model_cfg, B)
        self.seq_lens = np.zeros((B,), np.int32)  # host-side slot lengths
        self.active = np.zeros((B,), bool)
        self.slot_tokens: List[List[int]] = [[] for _ in range(B)]
        self.slot_budget = np.zeros((B,), np.int32)
        self._last_tokens = np.zeros((B,), np.int32)
        self._rng = jax.random.PRNGKey(0)

        mcfg = model_cfg

        @jax.jit
        def prefill_fn(params, tokens, true_len):
            """tokens (1, Tpad) -> (last valid logits (1, vocab), cache1)."""
            T = tokens.shape[1]
            cache1 = init_cache(mcfg, 1)
            pos = jnp.broadcast_to(jnp.arange(T), (1, T))
            logits, cache1 = fwd(params, mcfg, tokens, cache1, pos)
            last = jnp.take_along_axis(
                logits, (true_len - 1).reshape(1, 1, 1), axis=1
            )[:, 0]
            return last, cache1

        @jax.jit
        def insert_fn(cache, cache1, slot):
            def ins(big, small):
                # big (L, B, S, ...), small (L, 1, S, ...)
                start = (0, slot) + (0,) * (big.ndim - 2)
                return jax.lax.dynamic_update_slice(big, small.astype(big.dtype), start)

            return jax.tree_util.tree_map(ins, cache, cache1)

        @jax.jit
        def decode_fn(params, cache, tokens, positions):
            """tokens (B, 1), positions (B, 1) -> (logits (B, vocab), cache)."""
            logits, cache = fwd(params, mcfg, tokens, cache, positions)
            return logits[:, 0], cache

        self._prefill = prefill_fn
        self._insert = insert_fn
        self._decode = decode_fn

    # ----------------------------------------------------------------- slots
    def free_slots(self) -> List[int]:
        return [i for i in range(self.ecfg.max_batch) if not self.active[i]]

    def add_request(self, prompt_ids: Sequence[int], max_new_tokens: Optional[int] = None) -> int:
        """Prefill a prompt into a free slot; returns the slot id."""
        slots = self.free_slots()
        if not slots:
            raise RuntimeError("no free slots; call step() until one frees")
        slot = slots[0]
        prompt = list(prompt_ids)
        if len(prompt) > self.mcfg.max_seq_len - 1:
            raise ValueError("prompt longer than max_seq_len")
        budget = self.ecfg.max_new_tokens if max_new_tokens is None else max_new_tokens
        if budget < 1:
            raise ValueError("max_new_tokens must be >= 1")
        # bucket clamps to the cache length: the prefill pad may not exceed
        # the KV sequence axis
        T = min(_bucket(len(prompt), self.ecfg.prefill_buckets), self.mcfg.max_seq_len)
        padded = prompt + [0] * (T - len(prompt))
        tokens = jnp.asarray([padded], jnp.int32)
        last_logits, cache1 = self._prefill(self.params, tokens, jnp.asarray([len(prompt)], jnp.int32))
        self.cache = self._insert(self.cache, cache1, slot)
        nxt = int(self._sample(last_logits)[0])
        self.slot_tokens[slot] = list(prompt) + [nxt]
        self.seq_lens[slot] = len(prompt)
        self._last_tokens[slot] = nxt
        self.slot_budget[slot] = budget - 1
        # the prefill already produced one token: it may exhaust the budget
        # or be EOS — retire immediately in that case
        self.active[slot] = not (
            nxt == self.ecfg.eos_token or self.slot_budget[slot] <= 0
        )
        return slot

    def _sample(self, logits: jax.Array) -> np.ndarray:
        if self.ecfg.temperature <= 0.0:
            return np.asarray(jnp.argmax(logits, axis=-1))
        l = logits / self.ecfg.temperature
        if self.ecfg.top_k > 0:
            kth = jnp.sort(l, axis=-1)[:, -self.ecfg.top_k][:, None]
            l = jnp.where(l < kth, -jnp.inf, l)
        self._rng, key = jax.random.split(self._rng)
        return np.asarray(jax.random.categorical(key, l, axis=-1))

    def step(self) -> Dict[int, int]:
        """One decode step for every active slot. Returns {slot: new_token}
        and retires finished slots."""
        if not self.active.any():
            return {}
        B = self.ecfg.max_batch
        tokens = jnp.asarray(self._last_tokens.reshape(B, 1), jnp.int32)
        positions = jnp.asarray(self.seq_lens.reshape(B, 1), jnp.int32)
        logits, self.cache = self._decode(self.params, self.cache, tokens, positions)
        nxt = self._sample(logits)
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
        return out

    def generate(
        self, prompts: Sequence[Sequence[int]], max_new_tokens: Optional[int] = None
    ) -> List[List[int]]:
        """Continuous batching: streams prompts through the slot pool."""
        pending = list(enumerate(prompts))
        results: Dict[int, List[int]] = {}
        slot_owner: Dict[int, int] = {}

        def fill():
            while pending and self.free_slots():
                rid, prompt = pending.pop(0)
                slot = self.add_request(prompt, max_new_tokens)
                if self.active[slot]:
                    slot_owner[slot] = rid
                else:  # retired at prefill (budget 1 or first-token EOS)
                    results[rid] = self.slot_tokens[slot][len(prompt):]

        fill()
        while self.active.any() or pending:
            before = self.active.copy()
            self.step()
            for b in range(self.ecfg.max_batch):
                if before[b] and not self.active[b]:
                    rid = slot_owner.pop(b, None)
                    if rid is None:  # slot activated outside this generate()
                        continue
                    plen = len(prompts[rid])
                    results[rid] = self.slot_tokens[b][plen:]
            fill()
        return [results[i] for i in range(len(prompts))]


    # ------------------------------------------------------------- recovery
    def snapshot(self) -> Dict:
        """Checkpointable engine state: the (quantized) KV cache plus the
        host-side scheduler state — SURVEY.md §5's "restartable decode
        loop with checkpointed KV-cache" (the reference has no failure
        story: host launchers std::exit(1) on error, op_quant.cpp:916).
        Pair with checkpoints.save_checkpoint for durable snapshots."""
        return {
            "cache": self.cache,
            "seq_lens": self.seq_lens.copy(),
            "active": self.active.copy(),
            "slot_tokens": [list(t) for t in self.slot_tokens],
            "slot_budget": self.slot_budget.copy(),
            "last_tokens": self._last_tokens.copy(),
            "rng": np.asarray(jax.random.key_data(self._rng)).copy(),
        }

    def restore(self, snap: Dict) -> None:
        """Resume decoding from a snapshot (same model/engine config):
        in-flight requests continue from their exact positions."""
        self.cache = jax.tree_util.tree_map(jnp.asarray, snap["cache"])
        self.seq_lens = np.asarray(snap["seq_lens"], np.int32).copy()
        self.active = np.asarray(snap["active"], bool).copy()
        self.slot_tokens = [list(t) for t in snap["slot_tokens"]]
        self.slot_budget = np.asarray(snap["slot_budget"], np.int32).copy()
        self._last_tokens = np.asarray(snap["last_tokens"], np.int32).copy()
        if "rng" in snap:  # sampled decoding resumes bit-identically too
            self._rng = jax.random.wrap_key_data(jnp.asarray(snap["rng"]))
