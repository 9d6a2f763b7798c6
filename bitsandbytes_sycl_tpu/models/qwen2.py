"""Qwen2 family — llama architecture + additive q/k/v biases + GQA.

Qwen2/Qwen2.5 (arxiv 2407.10671) is a llama-shaped decoder (RMSNorm,
SwiGLU, rotary, GQA) whose attention projections carry biases and whose
small variants tie the embeddings. HF checkpoints use llama key names
plus `self_attn.{q,k,v}_proj.bias`, so the family rides the quantized
llama substrate (models/llama.py) end to end — fused kernels, int8 KV,
engine, TP (biases shard with their column-parallel projections).
"""

from __future__ import annotations

import os

from .llama import LlamaConfig

__all__ = ["Qwen2Config", "qwen2_forward", "load_qwen2_from_hf"]


class Qwen2Config(LlamaConfig):
    """LlamaConfig with Qwen2-7B defaults (28L/3584h/28H/4kv, qkv bias,
    rope_theta 1e6)."""

    def __init__(self, **kw):
        defaults = dict(
            vocab_size=152064, hidden_size=3584, intermediate_size=18944,
            num_layers=28, num_heads=28, num_kv_heads=4, max_seq_len=4096,
            rope_theta=1e6, attn_bias=True,
        )
        defaults.update(kw)
        super().__init__(**defaults)

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(
            vocab_size=256, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=4, num_kv_heads=2, max_seq_len=128,
        )
        defaults.update(kw)
        return cls(**defaults)


from .llama import llama_forward as qwen2_forward  # noqa: E402


def load_qwen2_from_hf(model_dir: str, cfg=None, use_native_quantizer: bool = True):
    """HF Qwen2 checkpoint -> quantized param tree (llama loader + the
    bias tensors, keyed off cfg.attn_bias)."""
    import json

    from ..checkpoints import load_llama_from_hf

    if cfg is None:
        with open(os.path.join(model_dir, "config.json")) as f:
            hf = json.load(f)
        cfg = _config_from_hf(hf)
    return load_llama_from_hf(model_dir, cfg=cfg, use_native_quantizer=use_native_quantizer)


def _config_from_hf(hf: dict) -> Qwen2Config:
    return Qwen2Config(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        max_seq_len=min(hf.get("max_position_embeddings", 4096), 4096),
        rope_theta=hf.get("rope_theta", 1e6),
        rms_eps=hf.get("rms_norm_eps", 1e-6),
        tie_embeddings=hf.get("tie_word_embeddings", False),
        attn_bias=True,
    )
