"""Speculative decoding: a cheap DRAFT model proposes gamma tokens, the
TARGET verifies them in ONE cached forward (Leviathan et al., 2211.17192
— greedy acceptance variant, which is exactly lossless).

Fits this framework natively:
- both models use the absolute-position KV cache (models/llama.py), so
  rejected draft positions simply leave stale entries that the next
  accepted tokens overwrite before the causal mask can expose them — no
  cache rollback machinery at all;
- the verify step is a T=gamma+1 cached prefill through the same fused
  kernels as decode, so the target reads its weights once per gamma+1
  tokens instead of once per token — the whole point on a weight-
  bandwidth-bound chip;
- quantization gives the draft for free: e.g. an int4/NF4 quantization
  of the SAME checkpoint (or a smaller model) drafts for the int8/fp
  target.

The reference has no serving layer (SURVEY.md §5); this is north-star
scope (BASELINE.json "tokens/s/chip").
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaConfig, init_kv_cache, llama_forward

__all__ = ["speculative_generate", "speculative_generate_jit"]


def _greedy(logits):
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _probs(logits, temperature):
    l = np.asarray(logits, np.float64) / temperature
    l -= l.max(axis=-1, keepdims=True)
    e = np.exp(l)
    return e / e.sum(axis=-1, keepdims=True)


def _accept_and_correct(d_tokens, q, p, rng):
    """Pure-numpy speculative-sampling acceptance (Leviathan et al. §2.3):
    token j accepts with prob min(1, p_j(d_j)/q_j(d_j)); the first
    rejection resamples from norm(relu(p_j - q_j)); full acceptance draws
    the bonus token from p_gamma. Exactly preserves the target
    distribution — unit-tested statistically in tests/test_engine.py.

    d_tokens (B, g) draft proposals; q (B, g, V) draft distributions;
    p (B, g+1, V) target distributions. Returns (acc (B,), fix (B,)):
    acc[b] accepted count, fix[b] the correction/bonus token.
    """
    B, g = d_tokens.shape
    acc = np.zeros((B,), np.int64)
    fix = np.zeros((B,), np.int64)
    for b in range(B):
        j = 0
        while j < g:
            d = d_tokens[b, j]
            ratio = p[b, j, d] / max(q[b, j, d], 1e-30)
            if rng.random() < ratio:
                j += 1
                continue
            resid = np.maximum(p[b, j] - q[b, j], 0.0)
            tot = resid.sum()
            if tot <= 0:  # p <= q everywhere it matters: fall back to p
                resid, tot = p[b, j], p[b, j].sum()
            fix[b] = rng.choice(len(resid), p=resid / tot)
            break
        acc[b] = j
        if j == g:  # every proposal accepted: bonus token from p_gamma
            fix[b] = rng.choice(p.shape[-1], p=p[b, g] / p[b, g].sum())
    return acc, fix


def speculative_generate(
    target_params: Dict,
    target_cfg: LlamaConfig,
    draft_params: Dict,
    draft_cfg: LlamaConfig,
    prompts: jax.Array,  # (B, T) int32, a common-length prompt batch
    max_new_tokens: int,
    gamma: int = 4,
    target_forward: Callable = llama_forward,
    draft_forward: Callable = llama_forward,
    temperature: float = 0.0,
    seed: int = 0,
) -> Tuple[np.ndarray, Dict]:
    """Speculative decode: returns (tokens (B, max_new_tokens), stats).

    temperature <= 0: greedy acceptance — output IDENTICAL to greedy
    decoding with the target alone. temperature > 0: speculative
    SAMPLING (rejection scheme, _accept_and_correct) — output distributed
    exactly as temperature sampling from the target alone.

    stats: {"target_calls": int, "accept_rate": float}.
    """
    B, T = prompts.shape
    # the draft writes KV as far as the target does; a too-short draft
    # cache would silently clamp writes onto earlier positions and
    # collapse the acceptance rate with no error surfaced
    need = T + max_new_tokens + gamma + 1
    if target_cfg.max_seq_len < need:
        raise ValueError(
            f"target max_seq_len {target_cfg.max_seq_len} < required {need} "
            "(prompt + max_new_tokens + gamma + 1)"
        )
    if draft_cfg.max_seq_len < need:
        raise ValueError(
            f"draft max_seq_len {draft_cfg.max_seq_len} < required {need} "
            "(prompt + max_new_tokens + gamma + 1)"
        )
    sampling = temperature > 0.0
    host_rng = np.random.default_rng(seed)

    t_cache = init_kv_cache(target_cfg, B)
    d_cache = init_kv_cache(draft_cfg, B)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))

    tfwd = jax.jit(lambda p, t, c, ps: target_forward(p, target_cfg, t, c, ps))
    dfwd = jax.jit(lambda p, t, c, ps: draft_forward(p, draft_cfg, t, c, ps))

    # prefill both models; the target's last logits give the first token
    logits, t_cache = tfwd(target_params, prompts, t_cache, pos)
    _, d_cache = dfwd(draft_params, prompts, d_cache, pos)
    if sampling:
        p0 = _probs(logits[:, -1], temperature)
        last = np.asarray(
            [host_rng.choice(p0.shape[-1], p=p0[b] / p0[b].sum()) for b in range(B)],
            np.int32,
        )
    else:
        last = np.asarray(_greedy(logits[:, -1]))  # (B,)

    out = np.zeros((B, max_new_tokens), np.int32)
    out[:, 0] = last
    n_done = 1
    cur = np.full((B,), T, np.int32)  # position of `last` (next write pos)
    target_calls = 1
    proposed = accepted = 0
    # tokens the draft must ingest before proposing: normally just `last`
    # (re-writing the stale/corrected entry at its position); after a fully
    # accepted round also the draft's own final proposal d_gamma, whose KV
    # was never written (it was only ever an output)
    pending = last[:, None]  # (B, L) ending at position `cur`

    while n_done < max_new_tokens:
        # --- draft ingests pending tokens, then proposes gamma tokens ---
        d_tokens = np.zeros((B, gamma), np.int32)
        q_rows = []  # sampling: draft distribution per proposal step
        L = pending.shape[1]
        dl, d_cache = dfwd(
            draft_params,
            jnp.asarray(pending),
            d_cache,
            jnp.asarray(cur[:, None] + np.arange(-L + 1, 1)[None, :]),
        )

        def propose(step_logits):
            if not sampling:
                return np.asarray(_greedy(step_logits))
            q = _probs(step_logits, temperature)
            q_rows.append(q)
            return np.asarray(
                [host_rng.choice(q.shape[-1], p=q[b] / q[b].sum()) for b in range(B)],
                np.int32,
            )

        d_in = propose(dl[:, -1])
        d_tokens[:, 0] = d_in
        for j in range(1, gamma):
            dl, d_cache = dfwd(
                draft_params,
                jnp.asarray(d_in[:, None]),
                d_cache,
                jnp.asarray((cur + j)[:, None]),
            )
            d_in = propose(dl[:, 0])
            d_tokens[:, j] = d_in

        # --- target verifies [last, d_1..d_gamma] in one cached forward ---
        ver_tokens = np.concatenate([last[:, None], d_tokens], axis=1)  # (B, g+1)
        ver_pos = cur[:, None] + np.arange(gamma + 1)[None, :]
        vl, t_cache = tfwd(
            target_params, jnp.asarray(ver_tokens), t_cache, jnp.asarray(ver_pos)
        )
        target_calls += 1

        # --- per-sequence acceptance + correction/bonus token ---
        if sampling:
            p_all = _probs(vl, temperature)  # (B, g+1, V)
            acc, fix = _accept_and_correct(
                d_tokens, np.stack(q_rows, axis=1), p_all, host_rng
            )
        else:
            tgt = np.asarray(_greedy(vl))  # tgt[:, i] follows prefix..ver[i]
            match = d_tokens == tgt[:, :gamma]
            acc = np.where(match.all(axis=1), gamma, match.argmin(axis=1))  # (B,)
            fix = tgt[np.arange(B), acc]
        proposed += int(B * gamma)
        accepted += int(acc.sum())

        # keep the batch in lockstep: commit the MINIMUM acceptance + 1
        # tokens for every sequence, so all positions stay aligned without
        # ragged bookkeeping. A sequence's committed tokens are its own
        # d_1..d_{step-1} (all verified: step-1 <= acc[b]) plus, at index
        # step, either d_step (still verified) or its correction token.
        step = int(acc.min()) + 1
        for b in range(B):
            toks = list(d_tokens[b, : acc[b]]) + [int(fix[b])]
            take = min(step, max_new_tokens - n_done)
            out[b, n_done : n_done + take] = toks[:take]
        last = out[:, min(n_done + step, max_new_tokens) - 1].copy()
        if step == gamma + 1:
            # fully accepted: d_gamma's KV is missing from the draft cache
            pending = np.stack([d_tokens[:, gamma - 1], last], axis=1)
        else:
            pending = last[:, None]
        cur = cur + step
        n_done += step

    return out, {
        "target_calls": target_calls,
        "accept_rate": accepted / max(proposed, 1),
    }


def speculative_generate_jit(
    target_params: Dict,
    target_cfg: LlamaConfig,
    draft_params: Dict,
    draft_cfg: LlamaConfig,
    prompts: jax.Array,  # (B, T) int32, RIGHT-padded past each row's length
    max_new_tokens: int,
    gamma: int = 4,
    target_forward: Callable = llama_forward,
    draft_forward: Callable = llama_forward,
    temperature: float = 0.0,
    seed: int = 0,
    lengths: Optional[jax.Array] = None,  # (B,) true prompt lengths (ragged)
) -> Tuple[jax.Array, Dict]:
    """Speculative decode as ONE jitted device program — zero host
    round-trips (the host-loop variant pays a dispatch per draft step,
    ruinous over a remote tunnel; here the whole generation is a single
    lax.while_loop dispatch). temperature <= 0: token-identical to
    target-only greedy. temperature > 0: device-side speculative
    SAMPLING (rejection scheme, _accept_and_correct_jax) distributed
    exactly as target-only temperature sampling.

    TPU-first mechanics:
    - static shapes throughout: every round ingests a fixed 2-token chunk
      into the draft (rewriting an already-correct position is IDEMPOTENT
      — k/v of a token depend only on its own hidden state), drafts
      gamma tokens, verifies gamma+1;
    - the commit length is data-dependent, so each round WRITES all
      gamma+1 candidates into the output buffer and only ADVANCES the
      cursor by min-acceptance+1 — uncommitted garbage is overwritten by
      the next round before it can be read;
    - lockstep batching: cursors are a (B,) vector (rows keep their own
      absolute positions), min-acceptance over B.

    RAGGED batches (r5): pass `lengths` (B,) with prompts RIGHT-padded to
    the bucket. Pad slots get positions past the row's cursor like any
    stale cache entry: the absolute-position mask (s_ids <= q_pos,
    models/llama.py) hides them until real tokens overwrite them — the
    SAME invariant that already covers rejected draft positions, so each
    row's output is exactly its own-prompt greedy/sampled generation.
    The per-row position arrays are what the engine's own decode steps
    feed the forward anyway, so every fused kernel path is unchanged.

    Returns (tokens (B, max_new_tokens) on device, stats with traced
    "rounds" — np them after the call).
    """
    B, T = prompts.shape
    need = T + max_new_tokens + gamma + 2
    if target_cfg.max_seq_len < need:
        raise ValueError(
            f"target max_seq_len {target_cfg.max_seq_len} < required {need} "
            "(prompt + max_new_tokens + gamma + 1)"
        )
    if draft_cfg.max_seq_len < need:
        raise ValueError(
            f"draft max_seq_len {draft_cfg.max_seq_len} < required {need} "
            "(prompt + max_new_tokens + gamma + 1)"
        )

    cache_key = (target_cfg, draft_cfg, B, T, max_new_tokens, gamma,
                 target_forward, draft_forward, float(temperature))
    cached = _JIT_CACHE.get(cache_key)
    sampling = temperature > 0.0
    key0 = jax.random.PRNGKey(seed)
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    lengths = jnp.asarray(lengths, jnp.int32)
    if cached is not None:
        out, rounds = cached(target_params, draft_params, prompts, key0, lengths)
        return out, {"rounds": rounds}

    def run(target_params, draft_params, prompts, key0, lengths):
        rows = jnp.arange(B)
        t_cache = init_kv_cache(target_cfg, B)
        d_cache = init_kv_cache(draft_cfg, B)
        pos = jnp.broadcast_to(jnp.arange(T), (B, T))
        logits, t_cache = target_forward(target_params, target_cfg, prompts, t_cache, pos)
        _, d_cache = draft_forward(draft_params, draft_cfg, prompts, d_cache, pos)
        key0_, kfirst = jax.random.split(key0)
        last_logits = logits[rows, lengths - 1]  # (B, V) per-row last REAL slot
        if sampling:
            first = jax.random.categorical(
                kfirst, last_logits.astype(jnp.float32) / temperature, axis=-1
            ).astype(jnp.int32)
        else:
            first = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)  # (B,)

        L = max_new_tokens + gamma + 2
        out = jnp.zeros((B, L), jnp.int32)
        out = out.at[:, 0].set(first)

        def cond(state):
            n_done = state[4]
            return n_done < max_new_tokens

        def body(state):
            t_cache, d_cache, out, cur, n_done, last, prev, rounds, key = state
            key, kacc = jax.random.split(key)
            # draft ingests [prev@cur-1 (idempotent rewrite), last@cur]
            chunk = jnp.stack([prev, last], axis=1)
            cpos = jnp.stack([cur - 1, cur], axis=1)
            dl, d_cache = draft_forward(draft_params, draft_cfg, chunk, d_cache, cpos)

            def propose(step_logits, j):
                if not sampling:
                    return jnp.argmax(step_logits, axis=-1).astype(jnp.int32), None
                kj = jax.random.fold_in(key, j)
                ql = step_logits.astype(jnp.float32) / temperature
                tok = jax.random.categorical(kj, ql, axis=-1).astype(jnp.int32)
                return tok, jax.nn.softmax(ql, axis=-1)

            d, q0 = propose(dl[:, -1], 0)
            d_toks, q_rows = [d], [q0]
            for j in range(1, gamma):
                dl, d_cache = draft_forward(
                    draft_params, draft_cfg, d[:, None], d_cache,
                    (cur + j)[:, None],
                )
                d, qj = propose(dl[:, 0], j)
                d_toks.append(d)
                q_rows.append(qj)
            d_tokens = jnp.stack(d_toks, axis=1)  # (B, gamma)

            ver = jnp.concatenate([last[:, None], d_tokens], axis=1)
            vpos = cur[:, None] + jnp.broadcast_to(jnp.arange(gamma + 1), (B, gamma + 1))
            vl, t_cache = target_forward(target_params, target_cfg, ver, t_cache, vpos)
            if sampling:
                p_all = jax.nn.softmax(vl.astype(jnp.float32) / temperature, axis=-1)
                acc, fix = _accept_and_correct_jax(
                    d_tokens, jnp.stack(q_rows, axis=1), p_all, kacc
                )
            else:
                tgt = jnp.argmax(vl, axis=-1).astype(jnp.int32)  # (B, gamma+1)
                match = (d_tokens == tgt[:, :gamma]).astype(jnp.int32)
                acc = jnp.cumprod(match, axis=1).sum(axis=1)  # (B,)
                fix = jnp.take_along_axis(tgt, acc[:, None], axis=1)[:, 0]
            step = jnp.min(acc) + 1

            # candidates: d_1..d_gamma with the correction spliced at acc
            cand = jnp.concatenate([d_tokens, d_tokens[:, -1:]], axis=1)  # (B, g+1)
            cand = cand.at[jnp.arange(B), acc].set(fix)

            # committed tokens start at out index n_done (`last` sits at
            # n_done-1); uncommitted tail gets overwritten next round
            out = jax.lax.dynamic_update_slice(out, cand, (0, n_done))
            new_last = jnp.take_along_axis(cand, jnp.full((B, 1), step - 1), axis=1)[:, 0]
            new_prev = jnp.where(
                step >= 2,
                jnp.take_along_axis(cand, jnp.full((B, 1), jnp.maximum(step - 2, 0)), axis=1)[:, 0],
                last,
            )
            return (t_cache, d_cache, out, cur + step, n_done + step,
                    new_last, new_prev, rounds + 1, key)

        state = (
            t_cache, d_cache, out, lengths, jnp.int32(1),
            first, prompts[rows, lengths - 1], jnp.int32(0), key0_,
        )
        state = jax.lax.while_loop(cond, body, state)
        return state[2][:, :max_new_tokens], state[7]

    jitted = jax.jit(run)
    # cache the jit wrapper: rebuilding it per call re-TRACES the whole
    # multi-forward while_loop every time (measured ~120 ms/call of pure
    # tracing for an 8-layer model)
    _JIT_CACHE[cache_key] = jitted
    out, rounds = jitted(target_params, draft_params, prompts, key0, lengths)
    return out, {"rounds": rounds}


_JIT_CACHE: Dict = {}


def _accept_and_correct_jax(d_tokens, q, p, key):
    """Vectorized jax version of _accept_and_correct (same lemma, runs
    inside the jitted loop): accept d_j while u_j < p_j(d_j)/q_j(d_j);
    first rejection resamples from norm(relu(p_j - q_j)); full acceptance
    draws the bonus from p_gamma. Returns (acc (B,), fix (B,))."""
    B, g = d_tokens.shape
    ku, kf = jax.random.split(key)
    u = jax.random.uniform(ku, (B, g))
    p_at = jnp.take_along_axis(p[:, :g], d_tokens[..., None], axis=-1)[..., 0]
    q_at = jnp.take_along_axis(q, d_tokens[..., None], axis=-1)[..., 0]
    accept = u < p_at / jnp.maximum(q_at, 1e-30)  # (B, g)
    acc = jnp.cumprod(accept.astype(jnp.int32), axis=1).sum(axis=1)  # (B,)

    # residual distribution at the rejection point (or p_gamma bonus)
    p_row = jnp.take_along_axis(p, acc[:, None, None], axis=1)[:, 0]  # (B, V)
    full = acc >= g
    q_row = jnp.take_along_axis(
        q, jnp.minimum(acc, g - 1)[:, None, None], axis=1
    )[:, 0]
    resid = jnp.where(full[:, None], p_row, jnp.maximum(p_row - q_row, 0.0))
    # degenerate residual (p <= q everywhere): fall back to p_row
    resid = jnp.where(
        (resid.sum(-1, keepdims=True) <= 0.0), p_row, resid
    )
    fix = jax.random.categorical(kf, jnp.log(jnp.maximum(resid, 1e-38)), axis=-1)
    return acc, fix.astype(jnp.int32)
