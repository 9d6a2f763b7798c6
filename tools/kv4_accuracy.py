#!/usr/bin/env python
"""Model-level accuracy bound for the int4 KV cache (kv_bits=4, r5).

The kv4 pages only exist on the paged DECODE path, which the full-
sequence harness (tools/accuracy_scale.py) never exercises — so this
tool measures TEACHER-FORCED PERPLEXITY THROUGH THE DECODE LOOP
itself: every held-out token is fed one step at a time through
`llama_forward` with a paged pool cache at kv_bits in {8, 4}, exactly
the path the serving engine runs (the tiny head_dim takes the gather
fallback, which is exact-tested against the Pallas kernel —
tests/test_paged.py kv4 suite). FP32 weights isolate the KV effect.

Usage: python tools/kv4_accuracy.py [--seeds 3] [--steps 600]
Reports, per seed: decode-path ppl with int8 KV and int4 KV over the
cacheless fp32 forward's ppl, plus the PAIRED kv4/kv8 ratio.
"""

import argparse
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import dataclasses

from bitsandbytes_sycl_tpu.engine.paged import init_page_pool
from bitsandbytes_sycl_tpu.models.llama import LlamaConfig, llama_forward
from tools.accuracy_scale import BASE, ppl, second_order_corpus, train_one

P = 128  # one page covers the whole eval window


def decode_ppl(params, cfg, windows, batch=16):
    """Teacher-forced nll through per-token paged decode steps."""
    T = windows.shape[1]
    maxp = -(-cfg.max_seq_len // P)

    @jax.jit
    def run(params, toks, pool):
        table = jnp.broadcast_to(
            jnp.arange(1, batch * maxp + 1, dtype=jnp.int32).reshape(
                batch, maxp), (batch, maxp))
        cache = dict(pool, page_table=table,
                     write_page=jnp.zeros((batch,), jnp.int32),
                     write_off=jnp.zeros((batch,), jnp.int32))

        def step(carry, t):
            cache, nll, cnt = carry
            cache["write_page"] = jnp.take_along_axis(
                cache["page_table"], (t // P)[None, None], axis=1)[:, 0]
            cache["write_off"] = jnp.broadcast_to(t % P, (batch,))
            tok = jax.lax.dynamic_slice_in_dim(toks, t, 1, axis=1)
            pos = jnp.broadcast_to(t, (batch, 1))
            logits, cache = llama_forward(params, cfg, tok, cache, pos)
            logp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32))
            nxt = jax.lax.dynamic_slice_in_dim(
                toks, jnp.minimum(t + 1, T - 1), 1, axis=1)[:, 0]
            take = jnp.take_along_axis(logp, nxt[:, None], axis=1)[:, 0]
            live = t < T - 1  # last position has no teacher target
            return (cache, nll - jnp.where(live, take, 0.0).sum(),
                    cnt + jnp.where(live, batch, 0)), ()

        (cache, nll, cnt), _ = jax.lax.scan(
            step, (cache, jnp.float32(0), jnp.int32(0)), jnp.arange(T))
        return nll, cnt

    tot, n = 0.0, 0
    for i in range(0, len(windows), batch):
        wb = windows[i:i + batch]
        if len(wb) < batch:
            break
        pool = init_page_pool(cfg, batch * maxp + 1, P)
        if getattr(cfg, "kv_bits", 8) == 4:
            from bitsandbytes_sycl_tpu.engine.paged import add_nib_staging

            pool = add_nib_staging(pool, cfg, batch)
        nll, cnt = run(params, jnp.asarray(wb), pool)
        tot += float(nll)
        n += int(cnt)
    return float(np.exp(tot / n))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--steps", type=int, default=600)
    args = ap.parse_args()

    SEQ = BASE["max_seq_len"]
    # same corpus scaling rationale as accuracy_scale.main (data must
    # outscale the 3.5M params)
    corpus = second_order_corpus(576_000 + 129 * SEQ)
    train = corpus[:576_000].reshape(-1, SEQ)
    heldout = np.asarray(
        corpus[576_000: 576_000 + 128 * SEQ].reshape(-1, SEQ), np.int32)

    paired = []
    for seed in range(args.seeds):
        params = train_one(seed, args.steps, train, heldout)
        cfg_fp = LlamaConfig(**BASE)
        p_fp = ppl(params, cfg_fp, heldout)
        cfgs = {
            bits: dataclasses.replace(
                LlamaConfig(**{**BASE, "kv_quant": True}), kv_bits=bits)
            for bits in (8, 4)
        }
        p8 = decode_ppl(params, cfgs[8], heldout)
        p4 = decode_ppl(params, cfgs[4], heldout)
        paired.append(p4 / p8)
        print(f"seed {seed}: fp(full-seq) {p_fp:.4f}  kv8-decode {p8:.4f} "
              f"({p8 / p_fp:.4f}x)  kv4-decode {p4:.4f} ({p4 / p_fp:.4f}x)  "
              f"paired kv4/kv8 {p4 / p8:.5f}", flush=True)
    arr = np.asarray(paired)
    print(f"paired kv4/kv8 ppl ratio over {args.seeds} seeds: "
          f"{arr.mean():.5f} +- {arr.std():.5f}")


if __name__ == "__main__":
    main()
