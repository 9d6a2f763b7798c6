"""Falcon family (Falcon-7B/40B/180B, tiiuae) — GPT-J substrate + MQA/GQA.

Falcon (arxiv 2311.16867) is a parallel-residual decoder like GPT-J with
four differences, all carried by the substrate (models/gptj.py):
(a) multi-query / grouped-query attention — kv_heads < num_heads; the
shared llama KV cache and flash kernels already handle GQA, so only the
k/v projection widths change, (b) rotary is the NeoX half-split
convention over the FULL head_dim (rope_style="neox",
rotary_dim=head_dim), (c) no biases anywhere (the substrate's fc/head
biases are zero-filled; attn_bias=False), (d) Falcon-40B/180B's
"new_decoder_architecture" uses two independent LayerNorms of the layer
input (ln_attn for attention, ln_mlp for the MLP branch) — exactly the
substrate's NeoX-style ln2 path.

The fused query_key_value checkpoint layouts (three generations of them)
are de-interleaved at load time into the substrate's separate q/k/v
projections so the quantized-linear dispatch, int8 KV cache and flash
kernels apply unchanged:
- new_decoder_architecture (40B/180B): Hkv groups of
  [q*(H/Hkv) | k | v] heads;
- multi_query (7B): [q*H | k | v];
- neither (falcon-rw): per-head [q | k | v] interleave (NeoX-style).

Only parallel_attn=True, alibi=False checkpoints are supported (all
mainline Falcon models); falcon-rw's alibi has no rotary analog here.

The reference has no model code (SURVEY.md §5); this extends the
BASELINE.json configs[3]/[4] model zoo to the Falcon suite — the first
mainstream MQA family, exercising the GQA kernels at their kv_heads=1
extreme.
"""

from __future__ import annotations

import os

from .gptj import GPTJConfig, gptj_forward

__all__ = ["FalconConfig", "falcon_forward", "load_falcon_from_hf"]


class FalconConfig(GPTJConfig):
    """GPTJConfig with Falcon-7B defaults (32L/4544h/71H, multi-query
    kv_heads=1, full-head-dim NeoX rope, bias-free, single shared LN)."""

    def __init__(self, **kw):
        defaults = dict(
            vocab_size=65024, hidden_size=4544, num_layers=32,
            num_heads=71, kv_heads=1, rotary_dim=64, max_seq_len=2048,
            rope_style="neox", attn_bias=False, act="gelu",
        )
        defaults.update(kw)
        super().__init__(**defaults)

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=256, hidden_size=256, num_layers=2, num_heads=4,
                 kv_heads=1, rotary_dim=64, max_seq_len=128)
        d.update(kw)
        return cls(**d)


# the forward IS gptj_forward (MQA/rope/dual-LN behavior lives in the
# config and param keys); exported under the family name
falcon_forward = gptj_forward


def load_falcon_from_hf(model_dir: str, cfg=None, quant: str = "nf4"):
    """Load a HuggingFace Falcon checkpoint directory (FalconForCausalLM
    key names) and quantize into the GPT-J-substrate param tree,
    de-interleaving the fused query_key_value projection for all three
    Falcon layout generations. Returns (cfg, params)."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from ..checkpoints import _read_hf_tensors
    from .llama import _quantize_linear

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    if hf.get("alibi", False):
        raise NotImplementedError(
            "alibi Falcon checkpoints (falcon-rw) are not supported — the "
            "substrate's attention is rotary"
        )
    if not hf.get("parallel_attn", True):
        raise NotImplementedError(
            "sequential-residual Falcon checkpoints are not supported "
            "(the substrate implements the parallel block)"
        )
    if hf.get("bias", False):
        raise NotImplementedError(
            "bias=true Falcon checkpoints are not supported — the loader "
            "builds bias-free projections (mainline Falcon ships none)"
        )
    new_arch = hf.get("new_decoder_architecture", False)
    H = hf["num_attention_heads"]
    hd = hf["hidden_size"] // H
    if new_arch:
        Hkv = hf.get("num_kv_heads", H)
    elif hf.get("multi_query", True):
        Hkv = 1
    else:
        Hkv = H
    if cfg is None:
        cfg = FalconConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=H,
            kv_heads=Hkv,
            rotary_dim=hd,
            max_seq_len=min(hf.get("max_position_embeddings", 2048), 4096),
            ln_eps=hf.get("layer_norm_epsilon", 1e-5),
            rope_theta=hf.get("rope_theta", 10000.0),
            quant=quant,
        )
    tensors = _read_hf_tensors(model_dir)

    def get(name):
        return jnp.asarray(np.asarray(tensors[name], np.float32))

    h = cfg.hidden_size
    layers = []
    for li in range(cfg.num_layers):
        pre = f"transformer.h.{li}."
        qkv = np.asarray(
            tensors[pre + "self_attention.query_key_value.weight"], np.float32
        )
        if new_arch:
            # Hkv groups of [q*(H/Hkv) | k | v] heads
            g = H // Hkv
            w = qkv.reshape(Hkv, g + 2, hd, h)
            qw = w[:, :g].reshape(H * hd, h)
            kw = w[:, g].reshape(Hkv * hd, h)
            vw = w[:, g + 1].reshape(Hkv * hd, h)
        elif Hkv == 1:
            # [q*H | k | v]
            qw = qkv[: H * hd]
            kw = qkv[H * hd: H * hd + hd]
            vw = qkv[H * hd + hd:]
        else:
            # per-head [q | k | v] interleave (NeoX-style)
            w = qkv.reshape(H, 3, hd, h)
            qw, kw, vw = (w[:, j].reshape(H * hd, h) for j in range(3))
        layer = {
            "q_proj": _quantize_linear(jnp.asarray(qw), cfg),
            "k_proj": _quantize_linear(jnp.asarray(kw), cfg),
            "v_proj": _quantize_linear(jnp.asarray(vw), cfg),
            "out_proj": _quantize_linear(get(pre + "self_attention.dense.weight"), cfg),
            "fc_in": _quantize_linear(get(pre + "mlp.dense_h_to_4h.weight"), cfg),
            # ffn width from the checkpoint (ffn_hidden_size, default 4h)
            "fc_in_b": jnp.zeros(
                (tensors[pre + "mlp.dense_h_to_4h.weight"].shape[0],), jnp.float32
            ),
            "fc_out": _quantize_linear(get(pre + "mlp.dense_4h_to_h.weight"), cfg),
            "fc_out_b": jnp.zeros((h,), jnp.float32),
        }
        if new_arch:
            layer["ln_w"] = get(pre + "ln_attn.weight")
            layer["ln_b"] = get(pre + "ln_attn.bias")
            layer["ln2_w"] = get(pre + "ln_mlp.weight")
            layer["ln2_b"] = get(pre + "ln_mlp.bias")
        else:
            layer["ln_w"] = get(pre + "input_layernorm.weight")
            layer["ln_b"] = get(pre + "input_layernorm.bias")
        layers.append(layer)
    wte = get("transformer.word_embeddings.weight")
    # Falcon ties lm_head to the embedding; standalone head if shipped
    head = (
        get("lm_head.weight") if "lm_head.weight" in tensors else wte
    )
    params = {
        "wte": wte.astype(cfg.dtype),
        "layers": layers,
        "ln_f_w": get("transformer.ln_f.weight"),
        "ln_f_b": get("transformer.ln_f.bias"),
        "lm_head": _quantize_linear(head, cfg),
        "lm_head_b": jnp.zeros((cfg.vocab_size,), jnp.float32),
    }
    return cfg, params
