#!/usr/bin/env python
"""Perplexity of a quantized model on a token file — the accuracy-at-
model-level check (BASELINE "NF4 accuracy within its reported perplexity
gap"). Usable once real weights/corpora are available; self-demo on a
tiny random model otherwise.

  python tools/perplexity.py <hf_dir> <tokens.npy> [--quant nf4]
  python tools/perplexity.py                      # tiny self-demo
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np


def perplexity(params, cfg, tokens: np.ndarray, seq_len: int = 512, batch: int = 4):
    """Mean perplexity over non-overlapping windows of `tokens`."""
    from bitsandbytes_sycl_tpu.models.llama import llama_forward

    n_win = len(tokens) // seq_len
    toks = jnp.asarray(tokens[: n_win * seq_len].reshape(n_win, seq_len), jnp.int32)

    @jax.jit
    def nll(batch_toks):
        logits, _ = llama_forward(params, cfg, batch_toks[:, :-1])
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tgt = batch_toks[:, 1:]
        ll = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        return -ll.sum(), ll.size

    total, count = 0.0, 0
    for i in range(0, n_win - batch + 1, batch):
        s, c = nll(toks[i : i + batch])
        total += float(s)
        count += int(c)
    return float(np.exp(total / max(count, 1)))


def main(argv):
    from bitsandbytes_sycl_tpu.models.llama import LlamaConfig, init_params

    quant = argv[argv.index("--quant") + 1] if "--quant" in argv else "nf4"
    pos = [a for a in argv if not a.startswith("-")]
    if len(pos) >= 2:
        from bitsandbytes_sycl_tpu.checkpoints import load_llama_from_hf

        cfg, params = load_llama_from_hf(pos[0])
        tokens = np.load(pos[1])
        print(f"{quant} perplexity:", perplexity(params, cfg, tokens))
        return
    # self-demo: quantization ppl gap on a tiny random model + random text
    # (absolute values are meaningless; the GAP between formats is the demo)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, 6000)
    for q in ("none", "int8", quant):
        cfg = LlamaConfig.tiny(quant=q, dtype=jnp.float32, max_seq_len=256)
        params = init_params(cfg, jax.random.PRNGKey(0))
        print(f"{q:>5}: ppl {perplexity(params, cfg, tokens, seq_len=128, batch=4):.2f}")


if __name__ == "__main__":
    main(sys.argv[1:])
