"""Mistral family: llama substrate + sliding-window attention + GQA."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitsandbytes_sycl_tpu.models.llama import init_kv_cache, init_params
from bitsandbytes_sycl_tpu.models.mistral import MistralConfig, mistral_forward


@pytest.fixture(scope="module")
def setup():
    cfg = MistralConfig.tiny(quant="nf4", dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_config_defaults_and_compat():
    big = MistralConfig()
    assert (big.intermediate_size, big.num_kv_heads, big.sliding_window) == (14336, 8, 4096)
    tiny = MistralConfig.tiny()
    # frozen-dataclass compatibility: replace and hashing must work (the
    # speculative jit cache keys on the config)
    t2 = dataclasses.replace(tiny, a8_decode=True)
    assert t2.sliding_window == tiny.sliding_window and hash(t2) != None  # noqa: E711


def test_sliding_window_binds(setup):
    """Positions beyond the window must not influence logits; positions
    inside it must match full attention exactly."""
    cfg, params = setup
    w = cfg.sliding_window
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, w + 8)), jnp.int32)
    lw, _ = mistral_forward(params, cfg, toks)
    lf, _ = mistral_forward(params, dataclasses.replace(cfg, sliding_window=None), toks)
    # positions < w see every prior token either way -> identical logits
    np.testing.assert_array_equal(np.asarray(lw[:, :w]), np.asarray(lf[:, :w]))
    # beyond it, windowing changes attention -> logits differ
    assert float(jnp.abs(lw[:, w:] - lf[:, w:]).max()) > 0

    # receptive-field check needs a SINGLE layer (stacked layers see
    # ~L*w back — the Mistral paper's long-range mechanism): a token
    # outside the window must not affect the last logit, one inside must
    cfg1 = MistralConfig.tiny(quant="none", num_layers=1, dtype=jnp.float32)
    from bitsandbytes_sycl_tpu.models.llama import init_params as _init

    p1 = _init(cfg1, jax.random.PRNGKey(3))
    l1, _ = mistral_forward(p1, cfg1, toks)
    toks_out = toks.at[:, 0].set((toks[:, 0] + 1) % 256)  # pos 0: outside (T-1)-w
    l2, _ = mistral_forward(p1, cfg1, toks_out)
    np.testing.assert_array_equal(np.asarray(l1[:, -1]), np.asarray(l2[:, -1]))
    toks_in = toks.at[:, -2].set((toks[:, -2] + 1) % 256)  # inside the window
    l3, _ = mistral_forward(p1, cfg1, toks_in)
    assert float(jnp.abs(l1[:, -1] - l3[:, -1]).max()) > 0


def test_prefill_decode_consistency(setup):
    """Cached decode equals the cacheless forward at the same positions,
    window mask included."""
    cfg, params = setup
    cfg = dataclasses.replace(cfg, kv_quant=False)  # exact cache: strict check
    T = cfg.sliding_window + 6
    toks = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, T)), jnp.int32)
    full, _ = mistral_forward(params, cfg, toks)

    cache = init_kv_cache(cfg, 2)
    pos = jnp.broadcast_to(jnp.arange(T - 1), (2, T - 1))
    _, cache = mistral_forward(params, cfg, toks[:, :-1], cache, pos)
    ld, _ = mistral_forward(
        params, cfg, toks[:, -1:], cache, jnp.full((2, 1), T - 1, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(ld[:, 0]), np.asarray(full[:, -1]), atol=2e-3, rtol=1e-3
    )


def test_engine_serves_mistral(setup):
    """The engine's forward contract covers the family (window < cache len
    covers the family; CPU tests take the XLA attention fallback)."""
    from bitsandbytes_sycl_tpu.engine import EngineConfig, InferenceEngine

    cfg, params = setup
    eng = InferenceEngine(
        cfg, params, EngineConfig(max_batch=2, max_new_tokens=5, prefill_buckets=(16,))
    )
    outs = eng.generate([[1, 2, 3], [7, 8, 9, 10]])
    assert [len(o) for o in outs] == [5, 5]

    # engine output matches token-by-token decode through mistral_forward
    cache = init_kv_cache(cfg, 1)
    prompt = [1, 2, 3]
    logits, cache = mistral_forward(
        params, cfg, jnp.asarray([prompt]), cache,
        jnp.broadcast_to(jnp.arange(3), (1, 3)),
    )
    ref = [int(jnp.argmax(logits[0, -1]))]
    for i in range(4):
        logits, cache = mistral_forward(
            params, cfg, jnp.asarray([[ref[-1]]]), cache,
            jnp.full((1, 1), 3 + i, jnp.int32),
        )
        ref.append(int(jnp.argmax(logits[0, 0])))
    assert outs[0] == ref, (outs[0], ref)


def test_hf_config_mapping(tmp_path):
    import json

    from bitsandbytes_sycl_tpu.models.mistral import _config_from_hf

    hf = {
        "vocab_size": 32000, "hidden_size": 4096, "intermediate_size": 14336,
        "num_hidden_layers": 32, "num_attention_heads": 32,
        "num_key_value_heads": 8, "max_position_embeddings": 32768,
        "rope_theta": 10000.0, "rms_norm_eps": 1e-5, "sliding_window": 4096,
        "model_type": "mistral",
    }
    cfg, _ = _config_from_hf(hf)
    assert cfg.sliding_window == 4096 and cfg.num_kv_heads == 8
    assert cfg.max_seq_len == 4096  # clamped


# ---------------------------------------------------------------------------
# Qwen2 (llama + qkv biases)
# ---------------------------------------------------------------------------


def test_qwen2_bias_flows_and_engine_serves():
    from bitsandbytes_sycl_tpu.engine import EngineConfig, InferenceEngine
    from bitsandbytes_sycl_tpu.models.qwen2 import Qwen2Config, qwen2_forward

    cfg = Qwen2Config.tiny(quant="nf4", dtype=jnp.float32)
    assert cfg.attn_bias
    params = init_params(cfg, jax.random.PRNGKey(0))
    assert "q_bias" in params["layers"][0]
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 9)), jnp.int32)
    l1, _ = qwen2_forward(params, cfg, toks)
    assert bool(jnp.isfinite(l1).all())
    # zeroing the biases changes the logits (they're live)
    import copy

    p2 = copy.deepcopy(params)
    for layer in p2["layers"]:
        for k in ("q_bias", "k_bias", "v_bias"):
            layer[k] = jnp.zeros_like(layer[k])
    l2, _ = qwen2_forward(p2, cfg, toks)
    assert float(jnp.abs(l1 - l2).max()) > 0

    eng = InferenceEngine(
        cfg, params, EngineConfig(max_batch=2, max_new_tokens=4, prefill_buckets=(16,))
    )
    outs = eng.generate([[1, 2, 3], [4, 5]])
    assert [len(o) for o in outs] == [4, 4]


def test_qwen2_tensor_parallel_biases_shard():
    """TP forward with qkv biases: the bias shards with its column-parallel
    projection; logits match single-device."""
    from bitsandbytes_sycl_tpu.models.qwen2 import Qwen2Config, qwen2_forward
    from bitsandbytes_sycl_tpu.parallel import make_mesh, shard_llama_params
    from bitsandbytes_sycl_tpu.parallel.llama_tp import llama_forward_tp

    # a8_decode=False: rtol 2e-4 exactness claim — the W4A8 default
    # quantizes row-parallel activation shards independently (noise-close
    # only; covered by test_parallel.test_llama_forward_tp_with_a8_decode)
    cfg = Qwen2Config.tiny(quant="nf4", dtype=jnp.float32, kv_quant=False,
                           a8_decode=False)
    params = init_params(cfg, jax.random.PRNGKey(1))
    toks = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 8)), jnp.int32)
    ref, _ = qwen2_forward(params, cfg, toks, init_kv_cache(cfg, 2),
                           jnp.broadcast_to(jnp.arange(8), (2, 8)))

    from jax.sharding import PartitionSpec as P

    mesh = make_mesh({"model": 2})
    sharded = shard_llama_params(params, cfg, mesh)
    assert sharded["layers"][0]["q_bias"].sharding.spec == P("model")
    out, _ = llama_forward_tp(
        sharded, cfg, toks, init_kv_cache(cfg, 2),
        jnp.broadcast_to(jnp.arange(8), (2, 8)), mesh, "model",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_windowed_fused_attention_matches_xla_path(monkeypatch):
    """Force the fused int8-KV kernels on (interpret mode on CPU) for a
    BINDING window: logits must match the masked-XLA fallback — proving
    Mistral rides the flash kernels rather than forfeiting them (round-3
    change: the kernels grew a static `window` mask)."""
    from bitsandbytes_sycl_tpu.models import llama as L

    cfg = MistralConfig.tiny(
        hidden_size=256, num_heads=2, num_kv_heads=2, head_dim=128,
        max_seq_len=128, sliding_window=16, num_layers=1,
        quant="none", dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.PRNGKey(5))
    T = 40  # > window: binding
    toks = jnp.asarray(np.random.default_rng(9).integers(0, 256, (1, T)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T), (1, T))

    def run():
        cache = init_kv_cache(cfg, 1)
        lp, cache = mistral_forward(params, cfg, toks, cache, pos)
        ld, _ = mistral_forward(
            params, cfg, toks[:, -1:] * 0 + 7, cache, jnp.full((1, 1), T, jnp.int32)
        )
        return np.asarray(lp, np.float32), np.asarray(ld, np.float32)

    xp, xd = run()  # XLA fallback (CPU default)
    monkeypatch.setattr(L, "_use_fused_decode_attn", lambda cfg: True)
    fp, fd = run()  # fused kernels, interpret mode
    np.testing.assert_allclose(fp, xp, rtol=2e-3, atol=2e-3)  # prefill kernel
    np.testing.assert_allclose(fd, xd, rtol=2e-3, atol=2e-3)  # decode kernel
