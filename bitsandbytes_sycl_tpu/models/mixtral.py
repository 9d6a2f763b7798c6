"""Mixtral family — llama attention + top-2 routed mixture-of-experts FFN.

Mixtral-8x7B (arxiv 2401.04088) is a Mistral-shaped decoder (RMSNorm,
rotary, GQA with 8 kv heads) whose dense SwiGLU MLP is replaced by a
block-sparse MoE: a replicated router picks 2 of 8 experts per token and
the chosen experts' SwiGLU outputs combine with renormalized softmax
weights. This rides the quantized llama substrate end to end
(models/llama.py `_moe_ffn`): experts are stored as STACKED quantized
pytrees (leading dim E) so expert parallelism is a plain sharding
decision — P("model", ...) on the expert dim under llama_forward_tp,
router replicated, contributions riding the existing per-layer psum.

The reference has no model/MoE code at all (SURVEY.md §2.3 lists EP as
absent); this is new-build surface extending the BASELINE.json
configs[3]/[4] model zoo.
"""

from __future__ import annotations

import os

from .llama import LlamaConfig

__all__ = ["MixtralConfig", "mixtral_forward", "load_mixtral_from_hf"]


class MixtralConfig(LlamaConfig):
    """LlamaConfig with Mixtral-8x7B defaults (32L/4096h/32H/8kv,
    8 experts top-2, rope_theta 1e6, full attention)."""

    def __init__(self, **kw):
        defaults = dict(
            vocab_size=32000, hidden_size=4096, intermediate_size=14336,
            num_layers=32, num_heads=32, num_kv_heads=8, max_seq_len=4096,
            rope_theta=1e6, num_experts=8, num_experts_per_tok=2,
        )
        defaults.update(kw)
        super().__init__(**defaults)

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(
            vocab_size=256, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=4, num_kv_heads=2, max_seq_len=128,
            num_experts=4, num_experts_per_tok=2,
        )
        defaults.update(kw)
        return cls(**defaults)


# the forward IS llama_forward (the MoE block keys off `experts` in the
# layer params); exported under the family name for discoverability
from .llama import llama_forward as mixtral_forward  # noqa: E402


def load_mixtral_from_hf(model_dir: str, cfg=None, use_native_quantizer: bool = True):
    """HF Mixtral checkpoint -> quantized param tree. Attention/norm/embed
    keys are llama-shaped; the MoE block maps
    `block_sparse_moe.gate` -> router and
    `block_sparse_moe.experts.{e}.w1/w3/w2` -> stacked
    gate_proj/up_proj/down_proj. Returns (cfg, params)."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from ..checkpoints import _read_hf_tensors
    from .llama import _quantize_linear, stack_experts

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    if cfg is None:
        cfg = MixtralConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            num_kv_heads=hf.get("num_key_value_heads", 8),
            max_seq_len=min(hf.get("max_position_embeddings", 4096), 4096),
            rope_theta=hf.get("rope_theta", 1e6),
            rms_eps=hf.get("rms_norm_eps", 1e-5),
            num_experts=hf.get("num_local_experts", 8),
            num_experts_per_tok=hf.get("num_experts_per_tok", 2),
            tie_embeddings=hf.get("tie_word_embeddings", False),
        )
    tensors = _read_hf_tensors(model_dir)

    def get(name):
        return jnp.asarray(np.asarray(tensors[name], np.float32))

    layers = []
    for li in range(cfg.num_layers):
        pre = f"model.layers.{li}."
        moe = pre + "block_sparse_moe."
        layers.append({
            "input_norm": get(pre + "input_layernorm.weight"),
            "post_attn_norm": get(pre + "post_attention_layernorm.weight"),
            "q_proj": _quantize_linear(get(pre + "self_attn.q_proj.weight"), cfg),
            "k_proj": _quantize_linear(get(pre + "self_attn.k_proj.weight"), cfg),
            "v_proj": _quantize_linear(get(pre + "self_attn.v_proj.weight"), cfg),
            "o_proj": _quantize_linear(get(pre + "self_attn.o_proj.weight"), cfg),
            "router": get(moe + "gate.weight"),
            "experts": stack_experts([
                {
                    "gate_proj": _quantize_linear(get(moe + f"experts.{e}.w1.weight"), cfg),
                    "up_proj": _quantize_linear(get(moe + f"experts.{e}.w3.weight"), cfg),
                    "down_proj": _quantize_linear(get(moe + f"experts.{e}.w2.weight"), cfg),
                }
                for e in range(cfg.num_experts)
            ]),
        })
    params = {
        "embed": get("model.embed_tokens.weight").astype(cfg.dtype),
        "layers": layers,
        "final_norm": get("model.norm.weight"),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = _quantize_linear(get("lm_head.weight"), cfg)
    return cfg, params
