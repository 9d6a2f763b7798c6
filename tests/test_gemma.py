"""Gemma family: llama substrate + GeGLU + (1+w) RMSNorm + scaled/tied
embeddings + decoupled head_dim. The reference has no model code
(SURVEY.md §5); this extends the model zoo (see models/gemma.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitsandbytes_sycl_tpu.models.gemma import GemmaConfig, gemma_forward
from bitsandbytes_sycl_tpu.models.llama import init_kv_cache, init_params


@pytest.fixture(scope="module")
def setup():
    cfg = GemmaConfig.tiny(quant="nf4", dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_config_defaults_and_compat():
    big = GemmaConfig()
    assert (big.hd, big.mlp_act, big.norm_offset) == (256, "gelu_tanh", True)
    assert big.scale_embeddings and big.tie_embeddings
    assert big.num_heads * big.hd == 4096 != big.hidden_size  # decoupled
    g2 = GemmaConfig.gemma2b()
    assert (g2.num_layers, g2.num_kv_heads) == (18, 1)  # MQA
    tiny = GemmaConfig.tiny()
    t2 = dataclasses.replace(tiny, a8_decode=True)  # frozen/hashable
    assert t2.norm_offset and hash(t2) is not None


def test_gemma_hooks_are_live(setup):
    """Each architectural hook must change the logits when toggled —
    guards against a hook silently not being threaded through."""
    cfg, params = setup
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 8)), jnp.int32)
    base, _ = gemma_forward(params, cfg, toks)
    for field, off in (
        ("mlp_act", "silu"),
        ("norm_offset", False),
        ("scale_embeddings", False),
    ):
        alt, _ = gemma_forward(params, dataclasses.replace(cfg, **{field: off}), toks)
        assert float(jnp.abs(base - alt).max()) > 0, field
    # tied embeddings: no lm_head tensor in the tree, logits = x @ E^T
    assert "lm_head" not in params


def test_prefill_decode_consistency(setup):
    """Cached decode equals the cacheless forward (decoupled head_dim
    flows through the KV cache and attention reshape)."""
    cfg, params = setup
    cfg = dataclasses.replace(cfg, kv_quant=False)
    T = 10
    toks = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, T)), jnp.int32)
    full, _ = gemma_forward(params, cfg, toks)

    cache = init_kv_cache(cfg, 2)
    pos = jnp.broadcast_to(jnp.arange(T - 1), (2, T - 1))
    _, cache = gemma_forward(params, cfg, toks[:, :-1], cache, pos)
    ld, _ = gemma_forward(
        params, cfg, toks[:, -1:], cache, jnp.full((2, 1), T - 1, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(ld[:, 0]), np.asarray(full[:, -1]), atol=2e-3, rtol=1e-3
    )


def test_engine_serves_gemma(setup):
    from bitsandbytes_sycl_tpu.engine import EngineConfig, InferenceEngine

    cfg, params = setup
    eng = InferenceEngine(
        cfg, params, EngineConfig(max_batch=2, max_new_tokens=5, prefill_buckets=(16,))
    )
    outs = eng.generate([[1, 2, 3], [7, 8, 9, 10]])
    assert [len(o) for o in outs] == [5, 5]

    cache = init_kv_cache(cfg, 1)
    logits, cache = gemma_forward(
        params, cfg, jnp.asarray([[1, 2, 3]]), cache,
        jnp.broadcast_to(jnp.arange(3), (1, 3)),
    )
    ref = [int(jnp.argmax(logits[0, -1]))]
    for i in range(4):
        logits, cache = gemma_forward(
            params, cfg, jnp.asarray([[ref[-1]]]), cache,
            jnp.full((1, 1), 3 + i, jnp.int32),
        )
        ref.append(int(jnp.argmax(logits[0, 0])))
    assert outs[0] == ref, (outs[0], ref)


def test_gemma_pipeline_parallel_matches_single_device():
    """GPipe forward honors the Gemma hooks (scaled embeds at stage 0,
    offset final norm, GeGLU layer bodies)."""
    from bitsandbytes_sycl_tpu.parallel import make_mesh
    from bitsandbytes_sycl_tpu.parallel.pipeline import (
        llama_forward_pp, stack_stage_params,
    )

    cfg = GemmaConfig.tiny(num_layers=4, quant="nf4", kv_quant=False, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(1))
    mesh = make_mesh({"stage": 4})
    stage_layers, rest = stack_stage_params(params, cfg, 4, mesh)

    B, T = 4, 8
    toks = jnp.asarray(np.random.default_rng(1).integers(0, 256, (B, T)), jnp.int32)
    logits_pp = llama_forward_pp(stage_layers, rest, cfg, toks, mesh, n_micro=2)
    logits_1d, _ = gemma_forward(params, cfg, toks)
    np.testing.assert_allclose(
        np.asarray(logits_pp, np.float32), np.asarray(logits_1d, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_hf_config_mapping():
    from bitsandbytes_sycl_tpu.models.gemma import _config_from_hf

    hf = {
        "vocab_size": 256000, "hidden_size": 3072, "intermediate_size": 24576,
        "num_hidden_layers": 28, "num_attention_heads": 16,
        "num_key_value_heads": 16, "head_dim": 256,
        "max_position_embeddings": 8192, "rope_theta": 10000.0,
        "rms_norm_eps": 1e-6, "model_type": "gemma",
    }
    cfg = _config_from_hf(hf)
    assert (cfg.hd, cfg.mlp_act, cfg.norm_offset, cfg.tie_embeddings) == (
        256, "gelu_tanh", True, True,
    )
    assert cfg.max_seq_len == 4096  # clamped


# ---------------------------------------------------------------------------
# Gemma-2 (sandwich norms, softcapping, alternating windows, query scale)
# ---------------------------------------------------------------------------


def test_gemma2_hooks_are_live():
    """Each Gemma-2 hook must change the logits (a dead hook would pass
    HF parity on configs that don't exercise it)."""
    import dataclasses

    from bitsandbytes_sycl_tpu.models.gemma import Gemma2Config, gemma2_forward

    # query_scale must DIFFER from head_dim or disabling it is a no-op
    cfg = Gemma2Config.tiny(quant="none", dtype=jnp.float32, query_scale=16.0,
                            attn_logit_softcap=5.0, final_logit_softcap=4.0,
                            sliding_window=4)  # binds at T=8
    params = init_params(cfg, jax.random.PRNGKey(0))
    assert "attn_out_norm" in params["layers"][0]
    toks = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])
    base, _ = gemma2_forward(params, cfg, toks)
    assert float(jnp.max(jnp.abs(base))) <= 4.0 + 1e-4  # final softcap binds
    for field, val in (
        ("attn_logit_softcap", None),
        ("final_logit_softcap", None),
        ("query_scale", None),
        ("sliding_alternating", False),
        ("sliding_window", 2),
    ):
        alt, _ = gemma2_forward(
            params, dataclasses.replace(cfg, **{field: val}), toks)
        assert float(jnp.abs(alt - base).max()) > 1e-5, field


def test_gemma2_engine_decode_matches_uncached():
    """Greedy engine decode over the Gemma-2 config (sandwich norms +
    softcaps + alternating windows through write_and_attend and the
    paged/contiguous caches) must match the uncached teacher-forced
    forward."""
    from bitsandbytes_sycl_tpu.engine import EngineConfig, InferenceEngine
    from bitsandbytes_sycl_tpu.models.gemma import Gemma2Config, gemma2_forward

    cfg = Gemma2Config.tiny(quant="nf4", kv_quant=True, dtype=jnp.float32,
                            max_seq_len=128, sliding_window=16)
    params = init_params(cfg, jax.random.PRNGKey(1))
    prompt = [3, 17, 5, 9]
    eng = InferenceEngine(cfg, params, EngineConfig(max_batch=2))
    out = eng.generate([prompt], max_new_tokens=5)[0]

    seq = list(prompt)
    for _ in range(5):  # teacher-forced uncached reference
        logits, _ = gemma2_forward(params, cfg, jnp.asarray([seq]))
        seq.append(int(jnp.argmax(logits[0, -1])))
    assert out == seq[len(prompt):], (out, seq[len(prompt):])


def test_gemma2_tensor_parallel_matches_single_device():
    """Gemma-2 hooks under TP: sandwich norms replicate (generic 1D-leaf
    spec), softcaps/query scale are static kernel params inside the
    shard_map body, and the alternating-window per-layer config replace
    stays trace-time static — TP logits must match single-device."""
    from bitsandbytes_sycl_tpu.models.gemma import Gemma2Config, gemma2_forward
    from bitsandbytes_sycl_tpu.parallel import make_mesh
    from bitsandbytes_sycl_tpu.parallel.llama_tp import (
        llama_forward_tp, shard_llama_params,
    )

    # a8_decode=False: this is an EXACTNESS test for the TP hooks — the
    # W4A8 route (the r4 default for LUT 4-bit types) quantizes each
    # row-parallel shard's activation slice under its own absmax, so
    # a8xTP is int8-class-noise-close, not exact (covered at that
    # tolerance by test_parallel.test_llama_forward_tp_with_a8_decode)
    cfg = Gemma2Config.tiny(
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
        quant="nf4", kv_quant=False, dtype=jnp.float32, a8_decode=False,
        sliding_window=4, query_scale=16.0,
    )
    params = init_params(cfg, jax.random.PRNGKey(2))
    mesh = make_mesh({"model": 2})
    sharded = shard_llama_params(params, cfg, mesh)
    toks = jnp.asarray(np.random.default_rng(2).integers(0, 256, (2, 8)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(8), (2, 8))
    logits_tp, _ = llama_forward_tp(sharded, cfg, toks, None, positions, mesh)
    logits_1d, _ = gemma2_forward(params, cfg, toks)
    np.testing.assert_allclose(
        np.asarray(logits_tp, np.float32), np.asarray(logits_1d, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_gemma2_paged_engine_matches_contiguous():
    """Gemma-2 through the paged engine (gather fallback at hd=64 —
    softcap/scale/window ride the XLA path) vs the contiguous engine."""
    from bitsandbytes_sycl_tpu.engine import EngineConfig, InferenceEngine
    from bitsandbytes_sycl_tpu.models.gemma import Gemma2Config

    cfg = Gemma2Config.tiny(quant="nf4", kv_quant=True, dtype=jnp.float32,
                            max_seq_len=256, sliding_window=16, head_dim=64)
    params = init_params(cfg, jax.random.PRNGKey(3))
    prompts = [[3, 17, 5, 9], [42, 7, 8]]
    ref = InferenceEngine(cfg, params, EngineConfig(max_batch=2)).generate(
        prompts, max_new_tokens=6)
    out = InferenceEngine(cfg, params, EngineConfig(max_batch=2, paged=True)).generate(
        prompts, max_new_tokens=6)
    assert out == ref, (out, ref)
