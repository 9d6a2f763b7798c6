"""BLOOM family (BigScience 560M…176B) — OPT substrate + ALiBi.

BLOOM-176B is, with OPT-175B, the model LLM.int8() — the reference's
headline algorithm — was built for and evaluated on (the original
bitsandbytes served BLOOM int8 inference), so it belongs in the zoo.

Architecturally it is the sequential pre-LN decoder of models/opt.py
with: (a) NO position embeddings — ALiBi distance bias added to the
attention logits instead (cfg.alibi=True; llama._alibi_bias carries the
per-head slopes, and attention routes to the XLA path since the fused
int8-KV kernels don't model the bias), (b) a LayerNorm applied directly
to the token embeddings (word_embeddings_layernorm → the substrate's
wln_w/wln_b), (c) per-head [q|k|v]-interleaved fused qkv (NeoX-style
de-interleave at load), (d) gelu_tanh MLP. The int8 KV cache machinery
applies unchanged (writes are position-indexed; only the attend differs).

Only apply_residual_connection_post_layernorm=False checkpoints are
supported (the default for every released BLOOM).
"""

from __future__ import annotations

import os

from .opt import OPTConfig, opt_forward

__all__ = ["BloomConfig", "bloom_forward", "load_bloom_from_hf"]


class BloomConfig(OPTConfig):
    """OPTConfig with BLOOM defaults (alibi, embed-LN, gelu_tanh;
    bloom-7b1 scale: 30L/4096h/32H)."""

    def __init__(self, **kw):
        defaults = dict(
            vocab_size=250880, hidden_size=4096, num_layers=30,
            num_heads=32, max_seq_len=2048, act="gelu_tanh", alibi=True,
        )
        defaults.update(kw)
        super().__init__(**defaults)

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=256, hidden_size=256, num_layers=2, num_heads=4,
                 max_seq_len=128, ffn_dim=512)
        d.update(kw)
        return cls(**d)


# the forward IS opt_forward (alibi/embed-LN behavior lives in the
# config and param keys)
bloom_forward = opt_forward


def load_bloom_from_hf(model_dir: str, cfg=None, quant: str = "nf4"):
    """Load a HuggingFace BLOOM checkpoint directory (BloomForCausalLM
    key names) and quantize into the OPT-substrate param tree,
    de-interleaving the per-head [q|k|v] fused qkv. Returns (cfg, params)."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from ..checkpoints import _read_hf_tensors
    from .llama import _quantize_linear

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    if hf.get("apply_residual_connection_post_layernorm", False):
        raise NotImplementedError(
            "post-layernorm-residual BLOOM checkpoints are not supported"
        )
    H = hf.get("n_head", hf.get("num_attention_heads"))
    h = hf.get("hidden_size", hf.get("n_embed"))
    if cfg is None:
        cfg = BloomConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=h,
            num_layers=hf.get("n_layer", hf.get("num_hidden_layers")),
            num_heads=H,
            ln_eps=hf.get("layer_norm_epsilon", 1e-5),
            quant=quant,
        )
    tensors = _read_hf_tensors(model_dir)
    pfx = "transformer." if any(k.startswith("transformer.") for k in tensors) else ""

    def get(name):
        return jnp.asarray(np.asarray(tensors[pfx + name], np.float32))

    hd = cfg.hd
    layers = []
    for li in range(cfg.num_layers):
        pre = f"h.{li}."
        # fused qkv: (3h, h) per-head [q|k|v] interleave (HF
        # BloomAttention._split_heads view(B,T,H,3,hd))
        qkv_w = np.asarray(
            tensors[pfx + pre + "self_attention.query_key_value.weight"], np.float32
        ).reshape(H, 3, hd, h)
        qkv_b = np.asarray(
            tensors[pfx + pre + "self_attention.query_key_value.bias"], np.float32
        ).reshape(H, 3, hd)
        qw, kw, vw = (jnp.asarray(qkv_w[:, j].reshape(H * hd, h)) for j in range(3))
        qb, kb, vb = (jnp.asarray(qkv_b[:, j].reshape(H * hd)) for j in range(3))
        layers.append({
            "ln1_w": get(pre + "input_layernorm.weight"),
            "ln1_b": get(pre + "input_layernorm.bias"),
            "q_proj": _quantize_linear(qw, cfg),
            "q_bias": qb,
            "k_proj": _quantize_linear(kw, cfg),
            "k_bias": kb,
            "v_proj": _quantize_linear(vw, cfg),
            "v_bias": vb,
            "out_proj": _quantize_linear(get(pre + "self_attention.dense.weight"), cfg),
            "out_bias": get(pre + "self_attention.dense.bias"),
            "ln2_w": get(pre + "post_attention_layernorm.weight"),
            "ln2_b": get(pre + "post_attention_layernorm.bias"),
            "fc1": _quantize_linear(get(pre + "mlp.dense_h_to_4h.weight"), cfg),
            "fc1_b": get(pre + "mlp.dense_h_to_4h.bias"),
            "fc2": _quantize_linear(get(pre + "mlp.dense_4h_to_h.weight"), cfg),
            "fc2_b": get(pre + "mlp.dense_4h_to_h.bias"),
        })
    wte = get("word_embeddings.weight")
    head = (
        jnp.asarray(np.asarray(tensors["lm_head.weight"], np.float32))
        if "lm_head.weight" in tensors
        else wte  # tied (BLOOM default)
    )
    params = {
        "wte": wte.astype(cfg.dtype),
        "wln_w": get("word_embeddings_layernorm.weight"),
        "wln_b": get("word_embeddings_layernorm.bias"),
        "layers": layers,
        "ln_f_w": get("ln_f.weight"),
        "ln_f_b": get("ln_f.bias"),
        "lm_head": _quantize_linear(head, cfg),
    }
    return cfg, params
