"""GPT-NeoX family (Pythia, GPT-NeoX-20B) — GPT-J substrate + dual LN.

GPT-NeoX (arxiv 2204.06745) is a parallel-residual decoder like GPT-J,
with three differences handled by the substrate (models/gptj.py):
(a) the MLP branch reads its OWN LayerNorm of the layer input
(`use_parallel_residual`; params carry ln2_w/ln2_b), (b) rotary is the
half-split NeoX convention on the first rotary_pct * head_dim dims
(rope_style="neox"), (c) attention projections carry biases
(attn_bias=True) and q/k/v ship FUSED in the checkpoint
(`attention.query_key_value`, per-head [q|k|v] interleaved) — the
loader de-interleaves them into the substrate's separate projections so
the quantized-linear dispatch, int8 KV cache and flash kernels apply
unchanged.

The reference has no model code (SURVEY.md §5); this extends the
BASELINE.json configs[3]/[4] model zoo to the Pythia suite — the
standard open checkpoints for quantization-accuracy research.
"""

from __future__ import annotations

import os

from .gptj import GPTJConfig, gptj_forward

__all__ = ["NeoXConfig", "neox_forward", "load_neox_from_hf"]


class NeoXConfig(GPTJConfig):
    """GPTJConfig with Pythia-6.9B defaults (32L/4096h/32H, rotary 25%,
    NeoX rope, biased attention, dual-LN parallel residual)."""

    def __init__(self, **kw):
        defaults = dict(
            vocab_size=50432, hidden_size=4096, num_layers=32,
            num_heads=32, rotary_dim=32, max_seq_len=2048,
            rope_style="neox", attn_bias=True, act="gelu",
        )
        defaults.update(kw)
        super().__init__(**defaults)

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=256, hidden_size=256, num_layers=2, num_heads=2,
                 rotary_dim=32, max_seq_len=128)
        d.update(kw)
        return cls(**d)


# the forward IS gptj_forward (dual-LN/rope/bias behavior lives in the
# config and param keys); exported under the family name
neox_forward = gptj_forward


def load_neox_from_hf(model_dir: str, cfg=None, quant: str = "nf4"):
    """Load a HuggingFace GPT-NeoX checkpoint directory (GPTNeoXForCausalLM
    key names) and quantize into the GPT-J-substrate param tree,
    de-interleaving the fused query_key_value projection. Returns
    (cfg, params). Only use_parallel_residual=True checkpoints are
    supported (the architecture's default; all Pythia models)."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from ..checkpoints import _read_hf_tensors
    from .llama import _quantize_linear

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    if not hf.get("use_parallel_residual", True):
        raise NotImplementedError(
            "sequential-residual GPT-NeoX checkpoints are not supported "
            "(the substrate implements the parallel block)"
        )
    if cfg is None:
        hd = hf["hidden_size"] // hf["num_attention_heads"]
        cfg = NeoXConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            rotary_dim=int(hf.get("rotary_pct", 0.25) * hd),
            max_seq_len=min(hf.get("max_position_embeddings", 2048), 4096),
            ln_eps=hf.get("layer_norm_eps", 1e-5),
            rope_theta=hf.get("rope_theta", hf.get("rotary_emb_base", 10000.0)),
            quant=quant,
        )
    tensors = _read_hf_tensors(model_dir)

    def get(name):
        return jnp.asarray(np.asarray(tensors[name], np.float32))

    h, H = cfg.hidden_size, cfg.num_heads
    hd = cfg.hd
    layers = []
    for li in range(cfg.num_layers):
        pre = f"gpt_neox.layers.{li}."
        # fused qkv: (3h, h) laid out per-head [q_head | k_head | v_head]
        qkv_w = np.asarray(tensors[pre + "attention.query_key_value.weight"], np.float32)
        qkv_b = np.asarray(tensors[pre + "attention.query_key_value.bias"], np.float32)
        w3 = qkv_w.reshape(H, 3, hd, h)
        b3 = qkv_b.reshape(H, 3, hd)
        qw, kw, vw = (jnp.asarray(w3[:, j].reshape(H * hd, h)) for j in range(3))
        qb, kb, vb = (jnp.asarray(b3[:, j].reshape(H * hd)) for j in range(3))
        layers.append({
            "ln_w": get(pre + "input_layernorm.weight"),
            "ln_b": get(pre + "input_layernorm.bias"),
            "ln2_w": get(pre + "post_attention_layernorm.weight"),
            "ln2_b": get(pre + "post_attention_layernorm.bias"),
            "q_proj": _quantize_linear(qw, cfg),
            "q_bias": qb,
            "k_proj": _quantize_linear(kw, cfg),
            "k_bias": kb,
            "v_proj": _quantize_linear(vw, cfg),
            "v_bias": vb,
            "out_proj": _quantize_linear(get(pre + "attention.dense.weight"), cfg),
            "out_bias": get(pre + "attention.dense.bias"),
            "fc_in": _quantize_linear(get(pre + "mlp.dense_h_to_4h.weight"), cfg),
            "fc_in_b": get(pre + "mlp.dense_h_to_4h.bias"),
            "fc_out": _quantize_linear(get(pre + "mlp.dense_4h_to_h.weight"), cfg),
            "fc_out_b": get(pre + "mlp.dense_4h_to_h.bias"),
        })
    params = {
        "wte": get("gpt_neox.embed_in.weight").astype(cfg.dtype),
        "layers": layers,
        "ln_f_w": get("gpt_neox.final_layer_norm.weight"),
        "ln_f_b": get("gpt_neox.final_layer_norm.bias"),
        "lm_head": _quantize_linear(get("embed_out.weight"), cfg),
        "lm_head_b": jnp.zeros((cfg.vocab_size,), jnp.float32),
    }
    return cfg, params
