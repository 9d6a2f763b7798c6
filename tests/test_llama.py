"""Llama model family: forward correctness, cache consistency, quant modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitsandbytes_sycl_tpu.models import LlamaConfig, init_params, llama_forward
from bitsandbytes_sycl_tpu.models.llama import init_kv_cache, quantize_params


@pytest.fixture(scope="module")
def tiny():
    cfg = LlamaConfig.tiny(quant="nf4", dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_forward_shapes(tiny):
    cfg, params = tiny
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)))
    logits, _ = llama_forward(params, cfg, tokens)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_prefill_decode_consistency(tiny):
    """Decoding token-by-token with the int8 KV cache must match the
    no-cache full forward (within KV-quant noise)."""
    cfg, params = tiny
    B, T = 1, 12
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))

    logits_full, _ = llama_forward(params, cfg, tokens)

    # prefill first 8 tokens, decode the rest one at a time
    cache = init_kv_cache(cfg, B)
    pos = jnp.broadcast_to(jnp.arange(8), (B, 8))
    logits_pre, cache = llama_forward(params, cfg, tokens[:, :8], cache, pos)
    np.testing.assert_allclose(
        np.asarray(logits_pre[:, -1]), np.asarray(logits_full[:, 7]), atol=0.15, rtol=0.1
    )
    for t in range(8, T):
        ptv = jnp.full((B, 1), t)
        logits_t, cache = llama_forward(params, cfg, tokens[:, t : t + 1], cache, ptv)
        np.testing.assert_allclose(
            np.asarray(logits_t[:, 0]), np.asarray(logits_full[:, t]), atol=0.15, rtol=0.1
        )


def test_fp_cache_exact():
    """With kv_quant off, cache decode matches full forward tightly."""
    cfg = LlamaConfig.tiny(quant="none", kv_quant=False, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(2))
    B, T = 2, 10
    tokens = jnp.asarray(np.random.default_rng(3).integers(0, cfg.vocab_size, (B, T)))
    logits_full, _ = llama_forward(params, cfg, tokens)
    cache = init_kv_cache(cfg, B)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))
    logits_c, _ = llama_forward(params, cfg, tokens, cache, pos)
    np.testing.assert_allclose(
        np.asarray(logits_c), np.asarray(logits_full), atol=2e-4, rtol=1e-3
    )


@pytest.mark.parametrize("quant", ["int8", "int4", "none"])
def test_quant_modes(quant):
    cfg = LlamaConfig.tiny(quant=quant, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(4))
    tokens = jnp.asarray([[1, 2, 3]])
    logits, _ = llama_forward(params, cfg, tokens)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_quant_vs_fp_close():
    """NF4 logits stay close to full-precision logits on a tiny model."""
    cfg_fp = LlamaConfig.tiny(quant="none", dtype=jnp.float32)
    fp = init_params(cfg_fp, jax.random.PRNGKey(5))

    # build fp param tree in the quantize_params expected structure
    cfg_q = LlamaConfig.tiny(quant="nf4", dtype=jnp.float32)
    qp = quantize_params(fp, cfg_q)
    tokens = jnp.asarray(np.random.default_rng(6).integers(0, cfg_fp.vocab_size, (2, 8)))
    lf, _ = llama_forward(fp, cfg_fp, tokens)
    lq, _ = llama_forward(qp, cfg_q, tokens)
    # random-init logits are near-uniform so argmax is meaningless; require
    # strong per-position logit correlation instead
    a, b = np.asarray(lf).reshape(-1, cfg_fp.vocab_size), np.asarray(lq).reshape(-1, cfg_fp.vocab_size)
    a = a - a.mean(-1, keepdims=True)
    b = b - b.mean(-1, keepdims=True)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9)
    assert cos.min() > 0.8 and cos.mean() > 0.9, (cos.min(), cos.mean())


def test_gqa_heads():
    cfg = LlamaConfig.tiny(num_heads=8, num_kv_heads=2, quant="none", dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(7))
    logits, _ = llama_forward(params, cfg, jnp.asarray([[1, 2, 3, 4]]))
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_jit_decode_step(tiny):
    cfg, params = tiny
    B = 2
    cache = init_kv_cache(cfg, B)

    @jax.jit
    def step(params, cache, tok, pos):
        return llama_forward(params, cfg, tok, cache, pos)

    tok = jnp.asarray([[3], [5]])
    pos = jnp.zeros((B, 1), jnp.int32)
    logits, cache = step(params, cache, tok, pos)
    logits, cache = step(params, cache, tok, pos + 1)
    assert logits.shape == (B, 1, cfg.vocab_size)


def test_qlora_finetune_loss_decreases():
    """QLoRA end-to-end: frozen NF4 base + rank-4 adapters + adam8bit.
    The loss on a learnable pattern must drop (the reference's own demo
    never showed decreasing loss — SURVEY.md §6 caveat)."""
    import optax
    from bitsandbytes_sycl_tpu import optim as bnb_optim
    from bitsandbytes_sycl_tpu.models.lora import init_lora, qlora_loss_fn

    cfg = LlamaConfig.tiny(num_layers=2, quant="nf4", kv_quant=False, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    lora = init_lora(cfg, jax.random.PRNGKey(1), rank=4, targets=("q_proj", "v_proj"))
    loss_fn = qlora_loss_fn(params, cfg)

    # learnable data: fixed next-token mapping
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 17)), jnp.int32)

    opt = bnb_optim.adam(optim_bits=8, learning_rate=3e-3, min_8bit_size=256)
    state = opt.init(lora)

    @jax.jit
    def step(lora, state):
        l, g = jax.value_and_grad(loss_fn)(lora, toks)
        upd, state = opt.update(g, state, lora)
        return optax.apply_updates(lora, upd), state, l

    losses = []
    for _ in range(12):
        lora, state, l = step(lora, state)
        losses.append(float(l))
    assert losses[-1] < losses[0] - 0.05, losses
    # frozen base untouched by construction; adapters moved
    assert float(jnp.abs(lora[0]["q_proj"]["B"]).max()) > 0


def test_qlora_grad_through_a8_decode():
    """W4A8 is training-safe: jax.grad through a model with a8_decode=True
    (small-batch QLoRA routes rows<64 through the W4A8 kernel) returns
    finite adapter grads close to the exact-path grads — the custom_vjp
    backward is the exact dequant matmul (VERDICT r2 item 3)."""
    import dataclasses as _dc

    from bitsandbytes_sycl_tpu.models.lora import init_lora, qlora_loss_fn

    cfg = LlamaConfig.tiny(num_layers=2, quant="nf4", kv_quant=False, dtype=jnp.float32)
    cfg8 = _dc.replace(cfg, a8_decode=True)
    params = init_params(cfg, jax.random.PRNGKey(0))
    lora = init_lora(cfg, jax.random.PRNGKey(1), rank=4, targets=("q_proj", "v_proj"))
    # nonzero B so grads flow through both A and B
    lora = jax.tree.map(lambda x: x + 0.01 if x.ndim == 2 else x, lora)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 9)), jnp.int32)

    l_ex, g_ex = jax.value_and_grad(qlora_loss_fn(params, cfg))(lora, toks)
    l_a8, g_a8 = jax.value_and_grad(qlora_loss_fn(params, cfg8))(lora, toks)
    # losses agree to W4A8 activation-noise level; grads finite and close
    assert np.isfinite(float(l_a8))
    assert abs(float(l_a8) - float(l_ex)) / (abs(float(l_ex)) + 1e-9) < 0.05
    flat_ex = jnp.concatenate([a.reshape(-1) for a in jax.tree.leaves(g_ex)])
    flat_a8 = jnp.concatenate([a.reshape(-1) for a in jax.tree.leaves(g_a8)])
    assert bool(jnp.isfinite(flat_a8).all())
    assert float(jnp.abs(flat_a8).max()) > 0, "zero grads: vjp not wired"
    rel = float(jnp.abs(flat_a8 - flat_ex).mean() / (jnp.abs(flat_ex).mean() + 1e-9))
    assert rel < 0.25, rel


def test_lora_merge_matches_adapter_forward():
    from bitsandbytes_sycl_tpu.models.lora import init_lora, merge_lora

    cfg = LlamaConfig.tiny(num_layers=2, quant="none", kv_quant=False, dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    params = init_params(cfg, key)
    lora = init_lora(cfg, jax.random.PRNGKey(4), rank=4)
    # give B nonzero values so the delta is active
    lora = jax.tree.map(lambda x: x + 0.01 if x.ndim == 2 else x, lora)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 9)), jnp.int32)
    la, _ = llama_forward(params, cfg, toks, lora=lora)
    merged = merge_lora(params, lora)
    lm, _ = llama_forward(merged, cfg, toks)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lm), rtol=1e-4, atol=1e-4)


def test_a8_decode_close_to_exact_path():
    """a8_decode routes small-M 4-bit matmuls through the W4A8 kernel:
    decode logits must stay within LLM.int8-class noise of the exact
    path, and greedy tokens should (typically) agree on peaked logits."""
    import dataclasses

    from bitsandbytes_sycl_tpu.models.llama import (
        LlamaConfig, init_kv_cache, init_params, llama_forward,
    )

    cfg = LlamaConfig.tiny(quant="nf4", dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    cfg8 = dataclasses.replace(cfg, a8_decode=True)

    toks = jnp.asarray([[5, 6, 7, 8, 1, 2, 3, 4]], jnp.int32)  # M=8 rows
    pos = jnp.broadcast_to(jnp.arange(8), (1, 8))
    c1 = init_kv_cache(cfg, 1)
    c2 = init_kv_cache(cfg8, 1)
    # prefill M=8 and decode M=1 (padded) BOTH route through the W4A8
    # kernel; assert the route is actually taken so this test cannot
    # silently compare the exact path against itself
    import bitsandbytes_sycl_tpu.ops.matmul_w4a8 as w4a8_mod

    calls = {"n": 0}
    orig = w4a8_mod._w4a8_call

    def counted(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    w4a8_mod._w4a8_call = counted
    try:
        l1, c1 = llama_forward(params, cfg, toks, c1, pos)
        l2, c2 = llama_forward(params, cfg8, toks, c2, pos)
        assert calls["n"] > 0, "W4A8 kernel was never invoked"
    finally:
        w4a8_mod._w4a8_call = orig
    a, b = np.asarray(l1, np.float32), np.asarray(l2, np.float32)
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert rel < 0.05, rel

    # decode step (M=1: the ragged-M pad path)
    d1, _ = llama_forward(params, cfg, toks[:, -1:], c1, jnp.full((1, 1), 8, jnp.int32))
    d2, _ = llama_forward(params, cfg8, toks[:, -1:], c2, jnp.full((1, 1), 8, jnp.int32))
    a, b = np.asarray(d1, np.float32), np.asarray(d2, np.float32)
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert rel < 0.05, rel


def test_multi_lora_batched_serving():
    """Batched multi-adapter serving: each sequence routed to its own
    adapter must match running that adapter alone (S-LoRA-style)."""
    from bitsandbytes_sycl_tpu.models.llama import (
        LlamaConfig, init_params, llama_forward,
    )
    from bitsandbytes_sycl_tpu.models.lora import init_lora, stack_lora

    cfg = LlamaConfig.tiny(quant="nf4", dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    a0 = init_lora(cfg, jax.random.PRNGKey(1), rank=4)
    a1 = init_lora(cfg, jax.random.PRNGKey(2), rank=4)
    # make the deltas nonzero (B starts at zero by LoRA init)
    for a, k in ((a0, 11), (a1, 22)):
        for layer in a:
            for name in layer:
                layer[name]["B"] = jnp.asarray(
                    np.random.default_rng(k).normal(size=layer[name]["B"].shape) * 0.05,
                    jnp.float32,
                )
    stacked = stack_lora([a0, a1])

    toks = jnp.asarray(np.random.default_rng(3).integers(1, 256, (2, 6)), jnp.int32)
    ids = jnp.asarray([0, 1], jnp.int32)
    got, _ = llama_forward(params, cfg, toks, lora=stacked, lora_ids=ids)

    ref0, _ = llama_forward(params, cfg, toks[:1], lora=a0)
    ref1, _ = llama_forward(params, cfg, toks[1:], lora=a1)
    np.testing.assert_allclose(
        np.asarray(got[0], np.float32), np.asarray(ref0[0], np.float32), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got[1], np.float32), np.asarray(ref1[0], np.float32), rtol=2e-4, atol=2e-4
    )
    # adapters actually differ
    assert np.abs(np.asarray(got[0]) - np.asarray(got[1])).max() > 1e-3
