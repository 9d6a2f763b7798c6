"""Gemma family — llama-shaped decoder with GeGLU, unity-offset RMSNorm,
scaled embeddings, and a wide decoupled head_dim.

Gemma (arxiv 2403.08295) differs from llama in four ways, each a config
hook on the quantized llama substrate (models/llama.py):
  - GeGLU MLP: tanh-approx GELU gate (`mlp_act="gelu_tanh"`; HF
    hidden_act "gelu_pytorch_tanh"),
  - RMSNorm weights store the offset from unity — forward applies
    (1 + w), so a zero-init weight is the identity norm
    (`norm_offset=True`),
  - token embeddings are multiplied by sqrt(hidden_size)
    (`scale_embeddings=True`),
  - head_dim=256 decoupled from hidden/num_heads (Gemma-7B: 3072 hidden,
    16 heads, 16*256=4096-wide q/o projections) — `head_dim` override.
Embeddings are always tied (no lm_head tensor in HF checkpoints).

HF checkpoints use llama key names, so the family rides the llama
substrate end to end: fused 4-bit/int8 kernels, int8 KV cache, engine,
TP (wide q/o shard over their 4096 projection dim), PP. The reference
has no model code at all (SURVEY.md §5); this extends the BASELINE
model zoo alongside Mistral and Qwen2.
"""

from __future__ import annotations

import os

from .llama import LlamaConfig

__all__ = ["GemmaConfig", "gemma_forward", "load_gemma_from_hf",
           "Gemma2Config", "gemma2_forward", "load_gemma2_from_hf"]


class GemmaConfig(LlamaConfig):
    """LlamaConfig with Gemma-7B defaults (28L/3072h/16H, head_dim 256,
    GeGLU, (1+w) norms, scaled + tied embeddings)."""

    def __init__(self, **kw):
        defaults = dict(
            vocab_size=256000, hidden_size=3072, intermediate_size=24576,
            num_layers=28, num_heads=16, num_kv_heads=16, head_dim=256,
            max_seq_len=4096, rope_theta=10000.0, rms_eps=1e-6,
            mlp_act="gelu_tanh", norm_offset=True, scale_embeddings=True,
            tie_embeddings=True,
        )
        defaults.update(kw)
        super().__init__(**defaults)

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(
            vocab_size=256, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
            max_seq_len=128,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def gemma2b(cls, **kw):
        defaults = dict(
            hidden_size=2048, intermediate_size=16384, num_layers=18,
            num_heads=8, num_kv_heads=1,
        )
        defaults.update(kw)
        return cls(**defaults)


from .llama import llama_forward as gemma_forward  # noqa: E402


def load_gemma_from_hf(model_dir: str, cfg=None, use_native_quantizer: bool = True):
    """HF Gemma checkpoint -> quantized param tree. Gemma ships llama key
    names (norm weights already stored as the offset-from-unity our
    norm_offset convention applies), so this delegates to the llama
    loader with the Gemma config hooks set."""
    import json

    from ..checkpoints import load_llama_from_hf

    if cfg is None:
        with open(os.path.join(model_dir, "config.json")) as f:
            hf = json.load(f)
        cfg = _config_from_hf(hf)
    return load_llama_from_hf(model_dir, cfg=cfg, use_native_quantizer=use_native_quantizer)


def _config_from_hf(hf: dict) -> GemmaConfig:
    return GemmaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=hf.get("head_dim", hf["hidden_size"] // hf["num_attention_heads"]),
        max_seq_len=min(hf.get("max_position_embeddings", 4096), 4096),
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_eps=hf.get("rms_norm_eps", 1e-6),
        tie_embeddings=True,  # Gemma checkpoints never ship lm_head
    )


# ---------------------------------------------------------------------------
# Gemma-2 (arxiv 2408.00118): sandwich norms, logit softcapping,
# alternating sliding/global attention, query_pre_attn_scalar
# ---------------------------------------------------------------------------


class Gemma2Config(GemmaConfig):
    """Gemma-9B-class defaults on the llama substrate. On top of Gemma-1's
    hooks (GeGLU, (1+w) norms, scaled+tied embeddings, wide head_dim):
      - sandwich norms: RMSNorm on the attention and MLP OUTPUTS before
        their residual adds (params carry attn_out_norm / ffn_out_norm;
        HF post_attention_layernorm / post_feedforward_layernorm),
      - attention logit softcapping 50.0 and final logit softcapping 30.0
        (cap*tanh(x/cap), applied inside the flash kernels pre-mask),
      - alternating attention: even layers slide (window 4096), odd are
        global (HF Gemma2 layer_types pattern),
      - softmax scale query_pre_attn_scalar**-0.5 instead of hd**-0.5.
    All ride the fused int8-KV flash kernels (decode/prefill/paged take
    static softcap/sm_scale/window params — ops/attention.py)."""

    def __init__(self, **kw):
        defaults = dict(
            vocab_size=256000, hidden_size=3584, intermediate_size=14336,
            num_layers=42, num_heads=16, num_kv_heads=8, head_dim=256,
            max_seq_len=4096, rope_theta=10000.0, rms_eps=1e-6,
            sandwich_norms=True, attn_logit_softcap=50.0,
            final_logit_softcap=30.0, query_scale=256.0,
            sliding_window=4096, sliding_alternating=True,
        )
        defaults.update(kw)
        super().__init__(**defaults)

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(
            vocab_size=256, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
            max_seq_len=128, query_scale=64.0, sliding_window=64,
        )
        defaults.update(kw)
        return cls(**defaults)


from .llama import llama_forward as gemma2_forward  # noqa: E402


def load_gemma2_from_hf(model_dir: str, cfg=None, use_native_quantizer: bool = True):
    """HF Gemma-2 checkpoint -> quantized param tree (sandwich-norm key
    mapping lives in checkpoints._HF_LAYER_MAP_SANDWICH)."""
    import json

    from ..checkpoints import load_llama_from_hf

    if cfg is None:
        with open(os.path.join(model_dir, "config.json")) as f:
            hf = json.load(f)
        cfg = _config_from_hf2(hf)
    return load_llama_from_hf(model_dir, cfg=cfg, use_native_quantizer=use_native_quantizer)


def _config_from_hf2(hf: dict) -> Gemma2Config:
    return Gemma2Config(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=hf.get("head_dim", hf["hidden_size"] // hf["num_attention_heads"]),
        max_seq_len=min(hf.get("max_position_embeddings", 4096), 4096),
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_eps=hf.get("rms_norm_eps", 1e-6),
        attn_logit_softcap=hf.get("attn_logit_softcapping", 50.0),
        final_logit_softcap=hf.get("final_logit_softcapping", 30.0),
        query_scale=float(hf.get("query_pre_attn_scalar", 256)),
        sliding_window=hf.get("sliding_window", 4096),
        tie_embeddings=True,
    )
