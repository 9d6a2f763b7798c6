"""HF-transformers parity — the reference's test_int8_hf equivalent
(tests_pvc/test_int8_hf.py loads GPT-J with load_in_8bit and generates;
here: build a tiny HF Llama, import through checkpoints.load_llama_from_hf,
and compare logits against transformers' own CPU forward)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from bitsandbytes_sycl_tpu.checkpoints import load_llama_from_hf
from bitsandbytes_sycl_tpu.models.llama import llama_forward
import dataclasses


@pytest.fixture(scope="module")
def hf_model(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("hf_llama")
    model.save_pretrained(d, safe_serialization=True)
    toks = torch.randint(0, 256, (2, 12))
    with torch.no_grad():
        ref_logits = model(toks).logits.float().numpy()
    return str(d), toks.numpy(), ref_logits


def test_hf_import_fp_parity(hf_model):
    """quant='none' import must reproduce transformers logits closely
    (fp32 vs our bf16-configurable compute; use f32 here for tightness)."""
    model_dir, toks, ref = hf_model
    cfg, params = load_llama_from_hf(model_dir)
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_llama_from_hf(model_dir, cfg=cfg)
    logits, _ = llama_forward(params, cfg, jnp.asarray(toks))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel


def test_hf_import_nf4_close(hf_model):
    """NF4-quantized import stays within 4-bit quantization noise of the
    fp reference (random tiny init => logits are near-zero-mean; use a
    norm-relative bound)."""
    model_dir, toks, ref = hf_model
    cfg, _ = load_llama_from_hf(model_dir)
    cfg = dataclasses.replace(cfg, quant="nf4", dtype=jnp.float32)
    _, params = load_llama_from_hf(model_dir, cfg=cfg)
    logits, _ = llama_forward(params, cfg, jnp.asarray(toks))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.25, rel


# ---------------------------------------------------------------------------
# GPT-J (the reference's actual integration-test model family)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hf_gptj(tmp_path_factory):
    cfg = transformers.GPTJConfig(
        vocab_size=256, n_embd=256, n_layer=2, n_head=2, rotary_dim=32,
        n_positions=128, n_inner=None,
    )
    torch.manual_seed(1)
    model = transformers.GPTJForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("hf_gptj")
    model.save_pretrained(d, safe_serialization=True)
    toks = torch.randint(0, 256, (2, 10))
    with torch.no_grad():
        ref_logits = model(toks).logits.float().numpy()
    return str(d), toks.numpy(), ref_logits


def test_hf_gptj_fp_parity(hf_gptj):
    import dataclasses as dc
    from bitsandbytes_sycl_tpu.checkpoints import load_gptj_from_hf
    from bitsandbytes_sycl_tpu.models.gptj import gptj_forward

    model_dir, toks, ref = hf_gptj
    cfg, _ = load_gptj_from_hf(model_dir)
    cfg = dc.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_gptj_from_hf(model_dir, cfg=cfg)
    logits, _ = gptj_forward(params, cfg, jnp.asarray(toks))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel


def test_hf_gptj_nf4_and_cache_decode(hf_gptj):
    import dataclasses as dc
    from bitsandbytes_sycl_tpu.checkpoints import load_gptj_from_hf
    from bitsandbytes_sycl_tpu.models.gptj import gptj_forward, init_gptj_kv_cache

    model_dir, toks, ref = hf_gptj
    cfg, _ = load_gptj_from_hf(model_dir)
    cfg = dc.replace(cfg, quant="nf4", dtype=jnp.float32, kv_quant=True)
    _, params = load_gptj_from_hf(model_dir, cfg=cfg)
    B, T = toks.shape
    # cacheless forward within quantization noise of transformers
    logits, _ = gptj_forward(params, cfg, jnp.asarray(toks))
    rel = np.linalg.norm(np.asarray(logits) - ref) / np.linalg.norm(ref)
    assert rel < 0.25, rel
    # prefill + decode through the int8 cache matches the cacheless forward
    cache = init_gptj_kv_cache(cfg, B)
    pos = jnp.broadcast_to(jnp.arange(T - 1), (B, T - 1))
    _, cache = gptj_forward(params, cfg, jnp.asarray(toks[:, :-1]), cache, pos)
    posd = jnp.full((B, 1), T - 1, jnp.int32)
    ld, _ = gptj_forward(params, cfg, jnp.asarray(toks[:, -1:]), cache, posd)
    rel2 = np.linalg.norm(np.asarray(ld[:, 0]) - np.asarray(logits[:, -1])) / np.linalg.norm(
        np.asarray(logits[:, -1])
    )
    assert rel2 < 0.05, rel2


def test_hf_import_bf16_checkpoint(tmp_path):
    """Real HF Llama checkpoints ship BF16 safetensors — the native
    reader + converters must load them end-to-end (safetensors' numpy
    framework cannot; this was round-2's loader motivation)."""
    cfg_hf = transformers.LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(cfg_hf).eval()
    toks = torch.randint(0, 128, (1, 8))
    with torch.no_grad():
        ref = model(toks).logits.float().numpy()
    model = model.to(torch.bfloat16)
    d = str(tmp_path / "bf16_llama")
    model.save_pretrained(d, safe_serialization=True)

    cfg, params = load_llama_from_hf(d)
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_llama_from_hf(d, cfg=cfg)
    logits, _ = llama_forward(params, cfg, jnp.asarray(toks.numpy()))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 5e-2, rel  # bf16 storage noise on a tiny random model


# ---------------------------------------------------------------------------
# Qwen2 (llama + qkv biases) and Mistral (llama + sliding window)
# ---------------------------------------------------------------------------


def test_hf_qwen2_fp_parity(tmp_path):
    """Tiny HF Qwen2 -> load_qwen2_from_hf (llama loader + bias tensors)
    must reproduce transformers logits; biases must actually matter."""
    from bitsandbytes_sycl_tpu.models.qwen2 import load_qwen2_from_hf, qwen2_forward

    cfg_hf = transformers.Qwen2Config(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6,
        rope_theta=10000.0, tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    model = transformers.Qwen2ForCausalLM(cfg_hf).eval()
    with torch.no_grad():  # HF zero-inits biases: give them real values
        for layer in model.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.normal_(0.0, 0.05)
    d = tmp_path / "hf_qwen2"
    model.save_pretrained(d, safe_serialization=True)
    toks = torch.randint(0, 256, (2, 12))
    with torch.no_grad():
        ref = model(toks).logits.float().numpy()

    cfg, params = load_qwen2_from_hf(str(d))
    assert cfg.attn_bias and "q_bias" in params["layers"][0]
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_qwen2_from_hf(str(d), cfg=cfg)
    logits, _ = qwen2_forward(params, cfg, jnp.asarray(toks.numpy()))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel

    # dropping the biases must change the logits (they're live in the fwd)
    params_nb = dict(params)
    params_nb["layers"] = [
        {k: v for k, v in l.items() if not k.endswith("_bias")} for l in params["layers"]
    ]
    logits_nb, _ = qwen2_forward(params_nb, cfg, jnp.asarray(toks.numpy()))
    assert float(jnp.abs(logits - logits_nb).max()) > 0


def test_hf_mistral_fp_parity(tmp_path):
    """Tiny HF Mistral (sliding window binding at T > window) through
    load_mistral_from_hf matches transformers' windowed attention."""
    from bitsandbytes_sycl_tpu.models.mistral import load_mistral_from_hf, mistral_forward

    cfg_hf = transformers.MistralConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, sliding_window=8,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(3)
    model = transformers.MistralForCausalLM(cfg_hf).eval()
    d = tmp_path / "hf_mistral"
    model.save_pretrained(d, safe_serialization=True)
    T = 24  # > window: the mask binds
    toks = torch.randint(0, 256, (2, T))
    with torch.no_grad():
        ref = model(toks).logits.float().numpy()

    cfg, _ = load_mistral_from_hf(str(d))
    assert cfg.sliding_window == 8
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_mistral_from_hf(str(d), cfg=cfg)
    logits, _ = mistral_forward(params, cfg, jnp.asarray(toks.numpy()))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel


# ---------------------------------------------------------------------------
# Phi (gptj substrate + NeoX partial rotary + biased attention projections)
# ---------------------------------------------------------------------------


def test_hf_phi_fp_parity_and_cache_decode(tmp_path):
    """Tiny HF Phi (partial_rotary_factor < 1, biased q/k/v/dense) through
    load_phi_from_hf must reproduce transformers logits — a wrong rope
    convention (interleaved vs half-split) or dropped bias shows up as a
    large rel error. Then prefill+decode through the int8 cache must
    match the cacheless forward."""
    from bitsandbytes_sycl_tpu.models.phi import load_phi_from_hf, phi_forward
    from bitsandbytes_sycl_tpu.models.gptj import init_gptj_kv_cache

    cfg_hf = transformers.PhiConfig(
        vocab_size=256, hidden_size=256, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, layer_norm_eps=1e-5,
        partial_rotary_factor=0.5, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(7)
    model = transformers.PhiForCausalLM(cfg_hf).eval()
    with torch.no_grad():  # exercise the bias path with real values
        for layer in model.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj, layer.self_attn.dense):
                proj.bias.normal_(0.0, 0.05)
    d = tmp_path / "hf_phi"
    model.save_pretrained(d, safe_serialization=True)
    toks = torch.randint(0, 256, (2, 12))
    with torch.no_grad():
        ref = model(toks).logits.float().numpy()

    cfg, _ = load_phi_from_hf(str(d))
    assert cfg.rope_style == "neox" and cfg.rotary_dim == 32  # 0.5 * hd=64
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_phi_from_hf(str(d), cfg=cfg)
    assert "q_bias" in params["layers"][0]
    logits, _ = phi_forward(params, cfg, jnp.asarray(toks.numpy()))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel

    # prefill + decode through the int8 KV cache == cacheless forward
    B, T = toks.shape
    cache = init_gptj_kv_cache(cfg, B)
    pos = jnp.broadcast_to(jnp.arange(T - 1), (B, T - 1))
    _, cache = phi_forward(params, cfg, jnp.asarray(toks.numpy()[:, :-1]), cache, pos)
    posd = jnp.full((B, 1), T - 1, jnp.int32)
    ld, _ = phi_forward(params, cfg, jnp.asarray(toks.numpy()[:, -1:]), cache, posd)
    rel2 = np.linalg.norm(np.asarray(ld[:, 0]) - got[:, -1]) / np.linalg.norm(got[:, -1])
    assert rel2 < 0.05, rel2


# ---------------------------------------------------------------------------
# GPT-NeoX / Pythia (gptj substrate + dual LN + fused-qkv de-interleave)
# ---------------------------------------------------------------------------


def test_hf_neox_fp_parity_and_cache_decode(tmp_path):
    """Tiny HF GPT-NeoX (parallel residual with a SEPARATE post-attention
    LayerNorm feeding the MLP, 25% rotary, fused qkv) through
    load_neox_from_hf must reproduce transformers logits — a wrong qkv
    de-interleave or a shared-LN shortcut shows up as a large rel error."""
    from bitsandbytes_sycl_tpu.models.neox import load_neox_from_hf, neox_forward
    from bitsandbytes_sycl_tpu.models.gptj import init_gptj_kv_cache

    cfg_hf = transformers.GPTNeoXConfig(
        vocab_size=256, hidden_size=256, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, layer_norm_eps=1e-5,
        rotary_pct=0.25, rotary_emb_base=10000,
        use_parallel_residual=True, tie_word_embeddings=False,
        hidden_act="gelu", attn_implementation="eager",
    )
    torch.manual_seed(9)
    model = transformers.GPTNeoXForCausalLM(cfg_hf).eval()
    d = tmp_path / "hf_neox"
    model.save_pretrained(d, safe_serialization=True)
    toks = torch.randint(0, 256, (2, 12))
    with torch.no_grad():
        ref = model(toks).logits.float().numpy()

    cfg, _ = load_neox_from_hf(str(d))
    assert cfg.rope_style == "neox" and cfg.rotary_dim == 16  # 0.25 * hd=64
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_neox_from_hf(str(d), cfg=cfg)
    assert "ln2_w" in params["layers"][0]
    logits, _ = neox_forward(params, cfg, jnp.asarray(toks.numpy()))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel

    # prefill + decode through the int8 KV cache == cacheless forward
    B, T = toks.shape
    cache = init_gptj_kv_cache(cfg, B)
    pos = jnp.broadcast_to(jnp.arange(T - 1), (B, T - 1))
    _, cache = neox_forward(params, cfg, jnp.asarray(toks.numpy()[:, :-1]), cache, pos)
    posd = jnp.full((B, 1), T - 1, jnp.int32)
    ld, _ = neox_forward(params, cfg, jnp.asarray(toks.numpy()[:, -1:]), cache, posd)
    rel2 = np.linalg.norm(np.asarray(ld[:, 0]) - got[:, -1]) / np.linalg.norm(got[:, -1])
    assert rel2 < 0.05, rel2


# ---------------------------------------------------------------------------
# Gemma (llama + GeGLU + (1+w) norms + scaled/tied embeddings + wide hd)
# ---------------------------------------------------------------------------


def test_hf_gemma_fp_parity(tmp_path):
    """Tiny HF Gemma (decoupled head_dim: 4 heads x 32 != 256 hidden)
    through load_gemma_from_hf must reproduce transformers logits — this
    exercises all four Gemma hooks at once (a wrong (1+w)/GeGLU/scaling
    convention shows up as a large rel error)."""
    from bitsandbytes_sycl_tpu.models.gemma import gemma_forward, load_gemma_from_hf

    cfg_hf = transformers.GemmaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rms_norm_eps=1e-6,
        rope_theta=10000.0, hidden_act="gelu_pytorch_tanh",
        hidden_activation="gelu_pytorch_tanh", tie_word_embeddings=True,
        attn_implementation="eager",
    )
    torch.manual_seed(5)
    model = transformers.GemmaForCausalLM(cfg_hf).eval()
    d = tmp_path / "hf_gemma"
    model.save_pretrained(d, safe_serialization=True)
    toks = torch.randint(0, 256, (2, 12))
    with torch.no_grad():
        ref = model(toks).logits.float().numpy()

    cfg, _ = load_gemma_from_hf(str(d))
    assert cfg.hd == 32 and cfg.norm_offset and cfg.tie_embeddings
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_gemma_from_hf(str(d), cfg=cfg)
    assert "lm_head" not in params  # tied
    logits, _ = gemma_forward(params, cfg, jnp.asarray(toks.numpy()))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel


# ---------------------------------------------------------------------------
# Gemma-2 (sandwich norms, logit softcapping, alternating sliding/global,
# query_pre_attn_scalar) — arxiv 2408.00118
# ---------------------------------------------------------------------------


def test_hf_gemma2_fp_parity(tmp_path):
    """Tiny HF Gemma-2 through load_gemma2_from_hf must reproduce
    transformers logits — pins all four Gemma-2 hooks at once (the
    sandwich-norm KEY MAPPING is the subtle one: HF's
    post_attention_layernorm is the attention OUTPUT norm here, and the
    pre-MLP norm is pre_feedforward_layernorm)."""
    from bitsandbytes_sycl_tpu.models.gemma import (
        gemma2_forward, load_gemma2_from_hf,
    )

    cfg_hf = transformers.Gemma2Config(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rms_norm_eps=1e-6,
        rope_theta=10000.0, hidden_activation="gelu_pytorch_tanh",
        tie_word_embeddings=True, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, query_pre_attn_scalar=32,
        sliding_window=8,  # small enough to BIND at T=12 (even layers)
        attn_implementation="eager",
    )
    torch.manual_seed(7)
    model = transformers.Gemma2ForCausalLM(cfg_hf).eval()
    d = tmp_path / "hf_gemma2"
    model.save_pretrained(d, safe_serialization=True)
    toks = torch.randint(0, 256, (2, 12))
    with torch.no_grad():
        ref = model(toks).logits.float().numpy()

    cfg, _ = load_gemma2_from_hf(str(d))
    assert cfg.sandwich_norms and cfg.sliding_alternating
    assert cfg.attn_logit_softcap == 50.0 and cfg.final_logit_softcap == 30.0
    assert cfg.query_scale == 32.0 and cfg.sliding_window == 8
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_gemma2_from_hf(str(d), cfg=cfg)
    assert "attn_out_norm" in params["layers"][0]
    logits, _ = gemma2_forward(params, cfg, jnp.asarray(toks.numpy()))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel

    # NF4-quantized stays in the quantization-noise envelope (4 layers
    # of random weights accumulate more noise than the 2-layer tests'
    # 0.25 bound; trained-weight accuracy is gated in test_accuracy.py)
    cfg_q = dataclasses.replace(cfg, quant="nf4", dtype=jnp.float32)
    _, params_q = load_gemma2_from_hf(str(d), cfg=cfg_q)
    logits_q, _ = gemma2_forward(params_q, cfg_q, jnp.asarray(toks.numpy()))
    rel_q = np.linalg.norm(np.asarray(logits_q) - ref) / np.linalg.norm(ref)
    assert rel_q < 0.35, rel_q


# ---------------------------------------------------------------------------


def test_hf_falcon_mq_fp_parity_and_cache_decode(tmp_path):
    """Tiny HF Falcon in the 7B layout (multi_query: ONE kv head shared
    by all q heads, single shared LN, parallel residual, bias-free,
    full-head-dim NeoX rope) through load_falcon_from_hf must reproduce
    transformers logits — a wrong [q*H|k|v] fused split or a partial
    rotary shows up as a large rel error. Also proves the int8 KV cache
    at the kv_heads=1 GQA extreme."""
    from bitsandbytes_sycl_tpu.models.falcon import (
        falcon_forward, load_falcon_from_hf)
    from bitsandbytes_sycl_tpu.models.gptj import init_gptj_kv_cache

    cfg_hf = transformers.FalconConfig(
        vocab_size=256, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False,
        layer_norm_epsilon=1e-5, max_position_embeddings=128,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(11)
    model = transformers.FalconForCausalLM(cfg_hf).eval()
    d = tmp_path / "hf_falcon"
    model.save_pretrained(d, safe_serialization=True)
    toks = torch.randint(0, 256, (2, 12))
    with torch.no_grad():
        ref = model(toks).logits.float().numpy()

    cfg, _ = load_falcon_from_hf(str(d))
    assert cfg.num_kv_heads == 1 and cfg.rotary_dim == cfg.hd
    assert cfg.rope_style == "neox" and not cfg.attn_bias
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_falcon_from_hf(str(d), cfg=cfg)
    assert "ln2_w" not in params["layers"][0]  # single shared LN
    logits, _ = falcon_forward(params, cfg, jnp.asarray(toks.numpy()))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel

    # prefill + decode through the int8 KV cache == cacheless forward
    B, T = toks.shape
    cache = init_gptj_kv_cache(cfg, B)
    pos = jnp.broadcast_to(jnp.arange(T - 1), (B, T - 1))
    _, cache = falcon_forward(params, cfg, jnp.asarray(toks.numpy()[:, :-1]), cache, pos)
    posd = jnp.full((B, 1), T - 1, jnp.int32)
    ld, _ = falcon_forward(params, cfg, jnp.asarray(toks.numpy()[:, -1:]), cache, posd)
    rel2 = np.linalg.norm(np.asarray(ld[:, 0]) - got[:, -1]) / np.linalg.norm(got[:, -1])
    assert rel2 < 0.05, rel2


def test_hf_falcon_new_arch_fp_parity(tmp_path):
    """Tiny HF Falcon in the 40B/180B layout (new_decoder_architecture:
    grouped [q*g|k|v] fused qkv with kv_heads=2 and TWO independent
    LayerNorms ln_attn/ln_mlp of the layer input) must match
    transformers — a wrong group de-interleave or a shared-LN shortcut
    breaks this."""
    from bitsandbytes_sycl_tpu.models.falcon import (
        falcon_forward, load_falcon_from_hf)

    cfg_hf = transformers.FalconConfig(
        vocab_size=256, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2, multi_query=False,
        parallel_attn=True, new_decoder_architecture=True, bias=False,
        alibi=False, layer_norm_epsilon=1e-5, max_position_embeddings=128,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(12)
    model = transformers.FalconForCausalLM(cfg_hf).eval()
    d = tmp_path / "hf_falcon40"
    model.save_pretrained(d, safe_serialization=True)
    toks = torch.randint(0, 256, (2, 10))
    with torch.no_grad():
        ref = model(toks).logits.float().numpy()

    cfg, _ = load_falcon_from_hf(str(d))
    assert cfg.num_kv_heads == 2
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_falcon_from_hf(str(d), cfg=cfg)
    assert "ln2_w" in params["layers"][0]  # independent MLP-branch LN
    logits, _ = falcon_forward(params, cfg, jnp.asarray(toks.numpy()))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel

    # NF4-quantized stays in the quantization-noise envelope
    cfg_q = dataclasses.replace(cfg, quant="nf4", dtype=jnp.float32)
    _, params_q = load_falcon_from_hf(str(d), cfg=cfg_q)
    logits_q, _ = falcon_forward(params_q, cfg_q, jnp.asarray(toks.numpy()))
    rel_q = np.linalg.norm(np.asarray(logits_q) - ref) / np.linalg.norm(ref)
    assert rel_q < 0.35, rel_q


# ---------------------------------------------------------------------------


def test_hf_opt_fp_parity_and_cache_decode(tmp_path):
    """Tiny HF OPT (sequential pre-LN decoder, learned positions with the
    +2 offset, biased projections, ReLU MLP, tied head) through
    load_opt_from_hf must reproduce transformers logits — a wrong
    position offset or a missed bias shows up as a large rel error.
    OPT is the LLM.int8() paper's eval family (the reference's headline
    algorithm), hence first-class here."""
    from bitsandbytes_sycl_tpu.models.opt import (
        init_opt_kv_cache, load_opt_from_hf, opt_forward)

    cfg_hf = transformers.OPTConfig(
        vocab_size=256, hidden_size=256, num_hidden_layers=2,
        ffn_dim=512, num_attention_heads=4, max_position_embeddings=128,
        do_layer_norm_before=True, word_embed_proj_dim=256,
        activation_function="relu", tie_word_embeddings=True,
        attn_implementation="eager",
    )
    torch.manual_seed(13)
    model = transformers.OPTForCausalLM(cfg_hf).eval()
    d = tmp_path / "hf_opt"
    model.save_pretrained(d, safe_serialization=True)
    toks = torch.randint(0, 256, (2, 12))
    with torch.no_grad():
        ref = model(toks).logits.float().numpy()

    cfg, _ = load_opt_from_hf(str(d))
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_opt_from_hf(str(d), cfg=cfg)
    logits, _ = opt_forward(params, cfg, jnp.asarray(toks.numpy()))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel

    # prefill + decode through the int8 KV cache == cacheless forward
    B, T = toks.shape
    cache = init_opt_kv_cache(cfg, B)
    pos = jnp.broadcast_to(jnp.arange(T - 1), (B, T - 1))
    _, cache = opt_forward(params, cfg, jnp.asarray(toks.numpy()[:, :-1]), cache, pos)
    posd = jnp.full((B, 1), T - 1, jnp.int32)
    ld, _ = opt_forward(params, cfg, jnp.asarray(toks.numpy()[:, -1:]), cache, posd)
    rel2 = np.linalg.norm(np.asarray(ld[:, 0]) - got[:, -1]) / np.linalg.norm(got[:, -1])
    assert rel2 < 0.05, rel2

    # LLM.int8 quantized (the paper pairing) stays in the noise envelope
    cfg_q = dataclasses.replace(cfg, quant="int8", dtype=jnp.float32)
    _, params_q = load_opt_from_hf(str(d), cfg=cfg_q)
    logits_q, _ = opt_forward(params_q, cfg_q, jnp.asarray(toks.numpy()))
    rel_q = np.linalg.norm(np.asarray(logits_q) - ref) / np.linalg.norm(ref)
    assert rel_q < 0.25, rel_q


def test_hf_opt_350m_projections(tmp_path):
    """OPT-350M layout: word_embed_proj_dim != hidden_size routes through
    project_in/project_out. Parity against transformers."""
    from bitsandbytes_sycl_tpu.models.opt import load_opt_from_hf, opt_forward

    cfg_hf = transformers.OPTConfig(
        vocab_size=256, hidden_size=256, num_hidden_layers=2,
        ffn_dim=512, num_attention_heads=4, max_position_embeddings=128,
        do_layer_norm_before=True, word_embed_proj_dim=128,
        activation_function="relu", tie_word_embeddings=True,
        attn_implementation="eager",
    )
    torch.manual_seed(14)
    model = transformers.OPTForCausalLM(cfg_hf).eval()
    d = tmp_path / "hf_opt350"
    model.save_pretrained(d, safe_serialization=True)
    toks = torch.randint(0, 256, (2, 10))
    with torch.no_grad():
        ref = model(toks).logits.float().numpy()

    cfg, _ = load_opt_from_hf(str(d))
    assert cfg.word_embed_proj_dim == 128
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_opt_from_hf(str(d), cfg=cfg)
    assert "project_in" in params and "project_out" in params
    logits, _ = opt_forward(params, cfg, jnp.asarray(toks.numpy()))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel


def test_hf_gpt2_fp_parity_and_cache_decode(tmp_path):
    """Tiny HF GPT-2 (Conv1D transposed weights, column-fused [q|k|v]
    c_attn, 0-offset learned positions, gelu_new) through
    load_gpt2_from_hf must reproduce transformers logits — a missed
    Conv1D transpose or a wrong fused split is a large rel error."""
    from bitsandbytes_sycl_tpu.models.gpt2 import gpt2_forward, load_gpt2_from_hf
    from bitsandbytes_sycl_tpu.models.opt import init_opt_kv_cache

    cfg_hf = transformers.GPT2Config(
        vocab_size=256, n_embd=256, n_layer=2, n_head=4, n_positions=128,
        n_inner=512, activation_function="gelu_new",
        attn_implementation="eager",
    )
    torch.manual_seed(15)
    model = transformers.GPT2LMHeadModel(cfg_hf).eval()
    d = tmp_path / "hf_gpt2"
    model.save_pretrained(d, safe_serialization=True)
    toks = torch.randint(0, 256, (2, 12))
    with torch.no_grad():
        ref = model(toks).logits.float().numpy()

    cfg, _ = load_gpt2_from_hf(str(d))
    assert cfg.pos_offset == 0 and cfg.act == "gelu_tanh"
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_gpt2_from_hf(str(d), cfg=cfg)
    logits, _ = gpt2_forward(params, cfg, jnp.asarray(toks.numpy()))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel

    # prefill + decode through the int8 KV cache == cacheless forward
    B, T = toks.shape
    cache = init_opt_kv_cache(cfg, B)
    pos = jnp.broadcast_to(jnp.arange(T - 1), (B, T - 1))
    _, cache = gpt2_forward(params, cfg, jnp.asarray(toks.numpy()[:, :-1]), cache, pos)
    posd = jnp.full((B, 1), T - 1, jnp.int32)
    ld, _ = gpt2_forward(params, cfg, jnp.asarray(toks.numpy()[:, -1:]), cache, posd)
    rel2 = np.linalg.norm(np.asarray(ld[:, 0]) - got[:, -1]) / np.linalg.norm(got[:, -1])
    assert rel2 < 0.05, rel2


def test_hf_bloom_fp_parity_and_cache_decode(tmp_path):
    """Tiny HF BLOOM (ALiBi distance bias — no position embeddings,
    embedding LayerNorm, per-head [q|k|v] fused qkv, gelu_tanh) through
    load_bloom_from_hf must reproduce transformers logits — wrong alibi
    slopes or a missed embed-LN show up as a large rel error. BLOOM is,
    with OPT, the LLM.int8() paper's target family. The cached decode
    check proves the int8 KV cache is ALiBi-compatible (bias recomputed
    from absolute positions at attend time, nothing stored)."""
    from bitsandbytes_sycl_tpu.models.bloom import bloom_forward, load_bloom_from_hf
    from bitsandbytes_sycl_tpu.models.opt import init_opt_kv_cache

    cfg_hf = transformers.BloomConfig(
        vocab_size=256, hidden_size=256, n_layer=2, n_head=4,
        layer_norm_epsilon=1e-5,
        apply_residual_connection_post_layernorm=False, slow_but_exact=False,
        tie_word_embeddings=True, attn_implementation="eager",
    )
    torch.manual_seed(16)
    model = transformers.BloomForCausalLM(cfg_hf).eval()
    d = tmp_path / "hf_bloom"
    model.save_pretrained(d, safe_serialization=True)
    toks = torch.randint(0, 256, (2, 12))
    with torch.no_grad():
        ref = model(toks).logits.float().numpy()

    cfg, _ = load_bloom_from_hf(str(d))
    assert cfg.alibi
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_bloom_from_hf(str(d), cfg=cfg)
    assert "wln_w" in params and "wpe" not in params
    logits, _ = bloom_forward(params, cfg, jnp.asarray(toks.numpy()))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel

    # prefill + decode through the int8 KV cache == cacheless forward
    B, T = toks.shape
    cache = init_opt_kv_cache(cfg, B)
    pos = jnp.broadcast_to(jnp.arange(T - 1), (B, T - 1))
    _, cache = bloom_forward(params, cfg, jnp.asarray(toks.numpy()[:, :-1]), cache, pos)
    posd = jnp.full((B, 1), T - 1, jnp.int32)
    ld, _ = bloom_forward(params, cfg, jnp.asarray(toks.numpy()[:, -1:]), cache, posd)
    rel2 = np.linalg.norm(np.asarray(ld[:, 0]) - got[:, -1]) / np.linalg.norm(got[:, -1])
    assert rel2 < 0.05, rel2


def test_alibi_slopes_match_reference():
    """Slopes for power-of-two and ragged head counts match the ALiBi
    paper recipe (and HF's build_alibi_tensor values)."""
    from bitsandbytes_sycl_tpu.models.llama import alibi_slopes

    s8 = alibi_slopes(8)
    np.testing.assert_allclose(s8, [2.0 ** (-(i + 1)) for i in range(8)], rtol=1e-6)
    # ragged count: first 8 are the pow2(8) sequence, the 4 extras are
    # every-other entry of the pow2(16) sequence (2^-0.5, 2^-1.5, ...)
    s12 = alibi_slopes(12)
    assert len(s12) == 12
    np.testing.assert_allclose(s12[:8], s8, rtol=1e-6)
    np.testing.assert_allclose(
        s12[8:], [2.0 ** -(0.5 + i) for i in range(4)], rtol=1e-6
    )
