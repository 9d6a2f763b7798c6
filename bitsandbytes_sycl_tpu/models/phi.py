"""Phi family (phi-1/1.5/2) — GPT-J architecture + NeoX rotary + biases.

Phi-2 (microsoft/phi-2) is structurally a GPT-J decoder: parallel
attention+MLP off ONE LayerNorm, partial rotary embeddings, MHA, GELU
MLP with biases, biased lm_head. It differs only in (a) the rotary
convention — half-split (NeoX) instead of interleaved — and (b) biases
on the q/k/v/dense projections. Both ride the GPT-J substrate
(models/gptj.py: rope_style="neox", attn_bias=True), which in turn
reuses the quantized-linear dispatch, int8 KV cache and flash kernels
from models.llama.

The reference has no model code (SURVEY.md §5); its one real-model test
is HF GPT-J via load_in_8bit (tests_pvc/test_int8_hf.py:1-20). This
extends that integration surface to the Phi checkpoints.
"""

from __future__ import annotations

import os

from .gptj import GPTJConfig, gptj_forward

__all__ = ["PhiConfig", "phi_forward", "load_phi_from_hf"]


class PhiConfig(GPTJConfig):
    """GPTJConfig with phi-2 defaults (32L/2560h/32H, rotary_dim 32 =
    0.4 * head_dim, NeoX rope, biased attention projections)."""

    def __init__(self, **kw):
        defaults = dict(
            vocab_size=51200, hidden_size=2560, num_layers=32,
            num_heads=32, rotary_dim=32, max_seq_len=2048,
            rope_style="neox", attn_bias=True,
        )
        defaults.update(kw)
        super().__init__(**defaults)

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=256, hidden_size=256, num_layers=2, num_heads=2,
                 rotary_dim=64, max_seq_len=128)
        d.update(kw)
        return cls(**d)


# the forward IS gptj_forward (rope/bias behavior lives in the config);
# exported under the family name for discoverability
phi_forward = gptj_forward


def load_phi_from_hf(model_dir: str, cfg=None, quant: str = "nf4"):
    """Load a HuggingFace Phi checkpoint directory (PhiForCausalLM key
    names: model.layers.N.self_attn.{q,k,v}_proj/dense, mlp.fc1/fc2,
    input_layernorm, model.final_layernorm, biased lm_head) and quantize
    into the GPT-J-substrate param tree. Returns (cfg, params)."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from ..checkpoints import _read_hf_tensors
    from .llama import _quantize_linear

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    if cfg is None:
        hd = hf["hidden_size"] // hf["num_attention_heads"]
        cfg = PhiConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            rotary_dim=int(hf.get("partial_rotary_factor", 0.4) * hd),
            max_seq_len=min(hf.get("max_position_embeddings", 2048), 4096),
            ln_eps=hf.get("layer_norm_eps", 1e-5),
            rope_theta=hf.get("rope_theta", 10000.0),
            quant=quant,
        )
    tensors = _read_hf_tensors(model_dir)

    def get(name):
        return jnp.asarray(np.asarray(tensors[name], np.float32))

    layers = []
    for li in range(cfg.num_layers):
        pre = f"model.layers.{li}."
        layers.append({
            "ln_w": get(pre + "input_layernorm.weight"),
            "ln_b": get(pre + "input_layernorm.bias"),
            "q_proj": _quantize_linear(get(pre + "self_attn.q_proj.weight"), cfg),
            "q_bias": get(pre + "self_attn.q_proj.bias"),
            "k_proj": _quantize_linear(get(pre + "self_attn.k_proj.weight"), cfg),
            "k_bias": get(pre + "self_attn.k_proj.bias"),
            "v_proj": _quantize_linear(get(pre + "self_attn.v_proj.weight"), cfg),
            "v_bias": get(pre + "self_attn.v_proj.bias"),
            "out_proj": _quantize_linear(get(pre + "self_attn.dense.weight"), cfg),
            "out_bias": get(pre + "self_attn.dense.bias"),
            "fc_in": _quantize_linear(get(pre + "mlp.fc1.weight"), cfg),
            "fc_in_b": get(pre + "mlp.fc1.bias"),
            "fc_out": _quantize_linear(get(pre + "mlp.fc2.weight"), cfg),
            "fc_out_b": get(pre + "mlp.fc2.bias"),
        })
    params = {
        "wte": get("model.embed_tokens.weight").astype(cfg.dtype),
        "layers": layers,
        "ln_f_w": get("model.final_layernorm.weight"),
        "ln_f_b": get("model.final_layernorm.bias"),
        "lm_head": _quantize_linear(get("lm_head.weight"), cfg),
        "lm_head_b": get("lm_head.bias"),
    }
    return cfg, params
