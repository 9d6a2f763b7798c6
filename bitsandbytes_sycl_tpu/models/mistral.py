"""Mistral family — llama architecture + sliding-window attention + GQA.

Mistral-7B is structurally a llama (RMSNorm, SwiGLU MLP, rotary, GQA
with 8 kv heads) whose attention is windowed to the last `sliding_window`
positions (Mistral 7B paper, arxiv 2310.06825). HF checkpoints use the
llama key names, so the whole family rides the quantized llama substrate
(models/llama.py: same fused kernels, int8 KV cache, engine, TP).

The reference has no model code at all (SURVEY.md §5); this extends the
BASELINE.json configs[3]/[4] model zoo.
"""

from __future__ import annotations

import os

from .llama import LlamaConfig

__all__ = ["MistralConfig", "mistral_forward", "load_mistral_from_hf"]


class MistralConfig(LlamaConfig):
    """LlamaConfig with Mistral-7B-v0.1 defaults. Frozen-dataclass
    subclassing keeps pytree/config compatibility: every llama entry
    point (llama_forward, engine, TP sharding, checkpoints) accepts it."""

    def __init__(self, **kw):
        defaults = dict(
            vocab_size=32000, hidden_size=4096, intermediate_size=14336,
            num_layers=32, num_heads=32, num_kv_heads=8, max_seq_len=4096,
            rope_theta=10000.0, sliding_window=4096,
        )
        defaults.update(kw)
        super().__init__(**defaults)

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(
            vocab_size=256, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=4, num_kv_heads=2, max_seq_len=128,
            sliding_window=16,
        )
        defaults.update(kw)
        return cls(**defaults)


# the forward IS llama_forward (the window lives in the config/mask);
# exported under the family name for discoverability
from .llama import llama_forward as mistral_forward  # noqa: E402


def load_mistral_from_hf(model_dir: str, cfg=None, use_native_quantizer: bool = True):
    """HF Mistral checkpoint -> quantized param tree. Mistral ships llama
    key names, so this delegates to the llama loader and layers the
    window/GQA fields from config.json on top."""
    import json

    from ..checkpoints import load_llama_from_hf

    if cfg is None:
        with open(os.path.join(model_dir, "config.json")) as f:
            hf = json.load(f)
        base, _ = _config_from_hf(hf)
        cfg = base
    return load_llama_from_hf(model_dir, cfg=cfg, use_native_quantizer=use_native_quantizer)


def _config_from_hf(hf: dict):
    cfg = MistralConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", 8),
        max_seq_len=min(hf.get("max_position_embeddings", 4096), 4096),
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_eps=hf.get("rms_norm_eps", 1e-5),
        sliding_window=hf.get("sliding_window"),
        tie_embeddings=hf.get("tie_word_embeddings", False),
    )
    return cfg, hf
