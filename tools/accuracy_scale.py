#!/usr/bin/env python
"""Scaled accuracy harness (r3 review item 6): a deeper/wider tiny model
on a harder corpus, trained across SEEDS, so the per-format perplexity
deltas can be compared against run-to-run noise (the in-suite 2L/128h
harness rank-orders formats but its deltas sit near its own noise floor).

Model: 4L/256h/8H llama (≈3.5M params — the largest that trains in
minutes on CPU). Corpus: SECOND-order Markov chain over vocab 256 with
sparse peaked transitions — much higher entropy than the suite's
first-order vocab-64 chain, so logit perturbations cost measurable ppl.

Usage:  python tools/accuracy_scale.py [--seeds 3] [--steps 600]
Prints a markdown table (pasted into docs/ACCURACY.md) with, per format,
mean ppl ratio over seeds and the seed-noise std of the fp32 baseline.
"""

import argparse
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, "/root/repo")
from bitsandbytes_sycl_tpu.models.llama import (
    LlamaConfig, init_params, llama_forward, quantize_params,
)

SEQ = 64
BASE = dict(
    vocab_size=256, hidden_size=256, intermediate_size=512, num_layers=4,
    num_heads=8, num_kv_heads=8, max_seq_len=SEQ, kv_quant=False,
    dtype=jnp.float32,
)


def second_order_corpus(n_tokens: int, vocab: int = 256, seed: int = 0) -> np.ndarray:
    """Second-order Markov chain: p(x_t | x_{t-1}, x_{t-2}) with 6 sparse
    successors per state pair (hashed pair -> row, so the table stays
    vocab^2-free)."""
    rng = np.random.default_rng(seed)
    n_rows = 4096
    succ = rng.integers(0, vocab, size=(n_rows, 6))
    probs = rng.dirichlet([2.0, 1.0, 0.7, 0.5, 0.3, 0.2], size=n_rows)
    out = np.empty(n_tokens, np.int64)
    out[0] = rng.integers(vocab)
    out[1] = rng.integers(vocab)
    for t in range(2, n_tokens):
        row = (out[t - 1] * 1000003 + out[t - 2]) % n_rows
        out[t] = succ[row, rng.choice(6, p=probs[row])]
    return out


def ppl(params, cfg, windows, batch=16):
    @jax.jit
    def nll(toks):
        logits, _ = llama_forward(params, cfg, toks[:, :-1])
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        ll = jnp.take_along_axis(lp, toks[:, 1:, None], axis=-1)
        return -ll.sum(), ll.size

    total = count = 0
    for i in range(0, windows.shape[0] - batch + 1, batch):
        s, c = nll(windows[i: i + batch])
        total += float(s)
        count += int(c)
    return float(np.exp(total / count))


def train_one(seed: int, steps: int, train, heldout):
    cfg_fp = LlamaConfig(quant="none", **BASE)
    params = init_params(cfg_fp, jax.random.PRNGKey(seed))
    tx = optax.adam(2e-3)
    st = tx.init(params)

    @jax.jit
    def step(params, st, toks):
        def loss(p):
            logits, _ = llama_forward(p, cfg_fp, toks[:, :-1])
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return -jnp.mean(jnp.take_along_axis(lp, toks[:, 1:, None], axis=-1))

        l, g = jax.value_and_grad(loss)(params)
        upd, st2 = tx.update(g, st)
        return optax.apply_updates(params, upd), st2, l

    rng = np.random.default_rng(seed + 100)
    t0 = time.time()
    for it in range(steps):
        idx = rng.choice(train.shape[0], 32, replace=False)
        params, st, l = step(params, st, jnp.asarray(train[idx], jnp.int32))
        if it % 100 == 0:
            print(f"  seed {seed} step {it} loss {float(l):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return params


FORMATS = [
    ("int8", False), ("nf4", False), ("nf4", True),
    ("fp4", False), ("int4", False), ("af4", False),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--steps", type=int, default=600)
    # r5 (VERDICT r4 weak #5): the a8 delta needs a CI smaller than NF4's
    # own delta (~0.09%). 10x the decode-size eval windows AND pair the
    # comparison (same quantized params, same windows, a8 on vs off — the
    # only varying factor is the kernel numerics, so model-seed variance
    # cancels entirely).
    ap.add_argument("--a8_windows", type=int, default=640)
    args = ap.parse_args()

    # data must outscale the 3.5M params or the model memorizes the
    # train windows and held-out ppl explodes (first attempt: 72k tokens
    # -> train loss 0.95 UNDER the chain's ~1.45-nat entropy, held-out
    # ppl 51k, and quantization RATIOS < 1 — noise as regularizer; a
    # meaningless harness). 576k train tokens ≈ 2.4 epochs at 600 steps.
    need = 576_000 + max(256, args.a8_windows) * SEQ
    corpus = second_order_corpus(need + SEQ)
    train = corpus[:576_000].reshape(-1, SEQ)
    held_all = corpus[576_000:]
    heldout = jnp.asarray(held_all[: 256 * SEQ].reshape(-1, SEQ), jnp.int32)
    a8_eval = jnp.asarray(
        held_all[: args.a8_windows * SEQ].reshape(-1, SEQ), jnp.int32)

    fp_ppls, ratios = [], {f: [] for f in FORMATS}
    a8_paired = []  # ppl(nf4, W4A8 decode) / ppl(nf4, exact decode), paired
    for seed in range(args.seeds):
        params = train_one(seed, args.steps, train, heldout)
        cfg_fp = LlamaConfig(quant="none", **BASE)
        p_fp = ppl(params, cfg_fp, heldout)
        fp_ppls.append(p_fp)
        print(f"seed {seed}: fp32 ppl {p_fp:.4f}", flush=True)
        for quant, a8 in FORMATS:
            cfg_q = LlamaConfig(quant=quant, a8_decode=a8, **BASE)
            qparams = quantize_params(params, cfg_q)
            if a8:
                # decode-size rows so W4A8 actually routes
                r = ppl(qparams, cfg_q, heldout[:64], batch=1) / ppl(
                    params, cfg_fp, heldout[:64], batch=1)
            else:
                r = ppl(qparams, cfg_q, heldout) / p_fp
            ratios[(quant, a8)].append(r)
            print(f"  {quant}{'+a8' if a8 else ''}: ratio {r:.5f}", flush=True)
        # paired a8-on-NF4 delta: SAME params, SAME windows, batch=1
        # decode-size rows — only the decode kernel differs
        cfg_nf4 = LlamaConfig(quant="nf4", a8_decode=False, **BASE)
        cfg_a8 = LlamaConfig(quant="nf4", a8_decode=True, **BASE)
        qp = quantize_params(params, cfg_nf4)
        pr = ppl(qp, cfg_a8, a8_eval, batch=1) / ppl(qp, cfg_nf4, a8_eval, batch=1)
        a8_paired.append(pr)
        print(f"  paired a8/exact on nf4 ({args.a8_windows} windows): "
              f"{pr:.6f}", flush=True)

    fp_noise = np.std(fp_ppls) / np.mean(fp_ppls)
    print("\n## Results (paste into docs/ACCURACY.md)\n")
    print(f"fp32 ppl mean {np.mean(fp_ppls):.4f}, seed noise (rel std) "
          f"{fp_noise:.5f} over {args.seeds} seeds\n")
    # delta/noise uses the PAIRED std (each ratio is quantized-vs-fp32 on
    # the SAME trained params, so the unpaired fp32-ppl seed spread is not
    # the relevant yardstick — the ratio's own seed spread is)
    print("| format | mean ppl ratio | std over seeds | delta/paired-noise |")
    print("|---|---|---|---|")
    for f in FORMATS:
        rs = np.asarray(ratios[f])
        name = f[0] + ("+a8" if f[1] else "")
        dn = (rs.mean() - 1.0) / max(rs.std(), 1e-9)
        print(f"| {name} | {rs.mean():.5f} | {rs.std():.5f} | {dn:.1f}x |")
    pa = np.asarray(a8_paired)
    print(
        f"\npaired a8-on-NF4 ppl ratio ({args.a8_windows} decode windows, "
        f"same params/windows, kernel-only difference): "
        f"mean {pa.mean():.6f} +- {pa.std():.6f} over {args.seeds} seeds"
    )


if __name__ == "__main__":
    main()
