"""Model-level accuracy gates: perplexity of quantized formats vs the
full-precision model on a TRAINED network (VERDICT r2 missing item 1 —
random-weight noise envelopes say nothing about end-task quality).

The reference's only model-level check loads a real GPT-J
(tests_pvc/test_int8_hf.py:9-18); no real checkpoint exists in this
environment (zero egress), so the harness trains a tiny llama on a
structured corpus to convergence and gates each quantized format's
held-out perplexity RATIO against fp32. Results are recorded in
docs/ACCURACY.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from bitsandbytes_sycl_tpu.models.llama import (
    LlamaConfig, init_params, llama_forward, quantize_params,
)

SEQ = 64


def _markov_corpus(n_tokens: int, vocab: int = 64, seed: int = 0) -> np.ndarray:
    """First-order Markov chain with a sparse, peaked transition matrix —
    learnable structure with nonzero entropy (unlike a fixed cycle)."""
    rng = np.random.default_rng(seed)
    T = np.zeros((vocab, vocab))
    for i in range(vocab):
        nxt = rng.choice(vocab, size=4, replace=False)
        T[i, nxt] = rng.dirichlet([2.0, 1.0, 0.5, 0.25])
    out = np.empty(n_tokens, np.int64)
    out[0] = rng.integers(vocab)
    for t in range(1, n_tokens):
        out[t] = rng.choice(vocab, p=T[out[t - 1]])
    return out


def _ppl(params, cfg, windows: jnp.ndarray, batch: int = 16) -> float:
    @jax.jit
    def nll(toks):
        logits, _ = llama_forward(params, cfg, toks[:, :-1])
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        ll = jnp.take_along_axis(lp, toks[:, 1:, None], axis=-1)
        return -ll.sum(), ll.size

    total = count = 0
    for i in range(0, windows.shape[0] - batch + 1, batch):
        s, c = nll(windows[i : i + batch])
        total += float(s)
        count += int(c)
    return float(np.exp(total / count))


@pytest.fixture(scope="module")
def trained():
    base = dict(
        vocab_size=64, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=4, num_kv_heads=4, max_seq_len=SEQ, kv_quant=False,
        dtype=jnp.float32,
    )
    cfg_fp = LlamaConfig(quant="none", **base)
    params = init_params(cfg_fp, jax.random.PRNGKey(0))

    corpus = _markov_corpus(40_000)
    train = corpus[:32_000].reshape(-1, SEQ)
    heldout = jnp.asarray(corpus[32_000:].reshape(-1, SEQ), jnp.int32)

    tx = optax.adam(3e-3)
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

    rng = np.random.default_rng(1)
    for it in range(240):
        idx = rng.choice(train.shape[0], 32, replace=False)
        params, st, l = step(params, st, jnp.asarray(train[idx], jnp.int32))
    return base, params, heldout, float(l)


def test_trained_model_learned(trained):
    base, params, heldout, final_loss = trained
    cfg_fp = LlamaConfig(quant="none", **base)
    ppl = _ppl(params, cfg_fp, heldout)
    # the chain's per-step entropy gives ppl ~2.4; an untrained model sits
    # at ~vocab (64). Converged = well under 4.
    assert ppl < 4.0, ppl


@pytest.mark.parametrize(
    "quant,a8,bound",
    [
        ("int8", False, 1.02),   # LLM.int8: ~lossless (BASELINE "fp16 parity")
        ("nf4", False, 1.05),    # QLoRA-reported class of gap
        ("nf4", True, 1.08),     # + per-row int8 activations (W4A8 decode)
        ("fp4", False, 1.08),    # fp4 is the weakest 4-bit code (QLoRA paper)
        ("int4", False, 1.08),
    ],
)
def test_quantized_ppl_ratio_gate(trained, quant, a8, bound):
    """Held-out perplexity of each quantized format stays within its
    published-class ratio of the fp32 model (docs/ACCURACY.md)."""
    base, params, heldout, _ = trained
    cfg_fp = LlamaConfig(quant="none", **base)
    ppl_fp = _ppl(params, cfg_fp, heldout)

    cfg_q = LlamaConfig(quant=quant, a8_decode=a8, **base)
    qparams = quantize_params(params, cfg_q)
    # W4A8 routes rows < 64 only (decode sizes): evaluate batch=1 so the
    # 63-row windows actually exercise the int8-activation kernel, and
    # compare against the fp model at the same batch
    batch = 1 if a8 else 16
    if a8:
        ppl_fp = _ppl(params, cfg_fp, heldout[:48], batch=1)
        ppl_q = _ppl(qparams, cfg_q, heldout[:48], batch=1)
    else:
        ppl_q = _ppl(qparams, cfg_q, heldout)
    ratio = ppl_q / ppl_fp
    assert ratio < bound, (quant, a8, ppl_fp, ppl_q, ratio)
