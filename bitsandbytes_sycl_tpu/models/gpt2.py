"""GPT-2 family (117M…1.5B) — OPT substrate with gelu + 0-offset positions.

GPT-2 is architecturally the OPT decoder (sequential pre-LN LayerNorm
blocks, learned absolute positions, biased projections, 2-layer MLP)
with a tanh-approx gelu instead of ReLU and no position-table offset —
both config knobs on the substrate (models/opt.py). Weights are stored
as HF Conv1D ((in, out), the transpose of a Linear) with the qkv fused
column-wise [q|k|v]; the loader transposes and block-splits them into
the substrate's separate quantized projections so the k-bit dispatch,
int8 KV cache and flash kernels apply unchanged.

The reference ships no model code (SURVEY.md §5); GPT-2 rounds out the
zoo with the most widely distributed small checkpoints for quantization
smoke tests.
"""

from __future__ import annotations

import os

from .opt import OPTConfig, opt_forward

__all__ = ["GPT2Config", "gpt2_forward", "load_gpt2_from_hf"]


class GPT2Config(OPTConfig):
    """OPTConfig with GPT-2-small defaults (12L/768h/12H, gelu_tanh,
    0-offset learned positions)."""

    def __init__(self, **kw):
        defaults = dict(
            vocab_size=50257, hidden_size=768, num_layers=12, num_heads=12,
            max_seq_len=1024, act="gelu_tanh", pos_offset=0,
        )
        defaults.update(kw)
        super().__init__(**defaults)

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=256, hidden_size=256, num_layers=2, num_heads=4,
                 max_seq_len=128, ffn_dim=512)
        d.update(kw)
        return cls(**d)


# the forward IS opt_forward (activation/offset live in the config)
gpt2_forward = opt_forward


def load_gpt2_from_hf(model_dir: str, cfg=None, quant: str = "nf4"):
    """Load a HuggingFace GPT-2 checkpoint directory (GPT2LMHeadModel key
    names, Conv1D layout) and quantize into the OPT-substrate param tree.
    Returns (cfg, params)."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from ..checkpoints import _read_hf_tensors
    from .llama import _quantize_linear

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    for flag in ("scale_attn_by_inverse_layer_idx", "reorder_and_upcast_attn"):
        if hf.get(flag, False):
            raise NotImplementedError(
                f"GPT-2 checkpoints with {flag}=true are not supported — "
                "the substrate attention has no per-layer scaling variant"
            )
    # HF activation_function -> substrate act (opt_forward); mainline
    # GPT-2 ships gelu_new. Unknown activations must not load silently.
    act_map = {"gelu_new": "gelu_tanh", "gelu_pytorch_tanh": "gelu_tanh",
               "gelu": "gelu", "relu": "relu"}
    hf_act = hf.get("activation_function", "gelu_new")
    if hf_act not in act_map:
        raise NotImplementedError(
            f"GPT-2 activation_function={hf_act!r} is not supported "
            f"(known: {sorted(act_map)})"
        )
    if cfg is None:
        cfg = GPT2Config(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["n_embd"],
            num_layers=hf["n_layer"],
            num_heads=hf["n_head"],
            ffn_dim=hf.get("n_inner") or 4 * hf["n_embd"],
            max_seq_len=min(hf.get("n_positions", 1024), 4096),
            ln_eps=hf.get("layer_norm_epsilon", 1e-5),
            act=act_map[hf_act],
            quant=quant,
        )
    tensors = _read_hf_tensors(model_dir)
    pfx = "transformer." if any(k.startswith("transformer.") for k in tensors) else ""

    def get(name):
        return jnp.asarray(np.asarray(tensors[pfx + name], np.float32))

    def conv1d_t(name):
        # HF Conv1D stores (in, out); the substrate wants (out, in)
        return jnp.asarray(np.asarray(tensors[pfx + name], np.float32).T)

    h = cfg.hidden_size
    layers = []
    for li in range(cfg.num_layers):
        pre = f"h.{li}."
        qkv_w = conv1d_t(pre + "attn.c_attn.weight")  # (3h, h)
        qkv_b = get(pre + "attn.c_attn.bias")  # (3h,)
        qw, kw, vw = qkv_w[:h], qkv_w[h:2 * h], qkv_w[2 * h:]
        qb, kb, vb = qkv_b[:h], qkv_b[h:2 * h], qkv_b[2 * h:]
        layers.append({
            "ln1_w": get(pre + "ln_1.weight"),
            "ln1_b": get(pre + "ln_1.bias"),
            "q_proj": _quantize_linear(qw, cfg),
            "q_bias": qb,
            "k_proj": _quantize_linear(kw, cfg),
            "k_bias": kb,
            "v_proj": _quantize_linear(vw, cfg),
            "v_bias": vb,
            "out_proj": _quantize_linear(conv1d_t(pre + "attn.c_proj.weight"), cfg),
            "out_bias": get(pre + "attn.c_proj.bias"),
            "ln2_w": get(pre + "ln_2.weight"),
            "ln2_b": get(pre + "ln_2.bias"),
            "fc1": _quantize_linear(conv1d_t(pre + "mlp.c_fc.weight"), cfg),
            "fc1_b": get(pre + "mlp.c_fc.bias"),
            "fc2": _quantize_linear(conv1d_t(pre + "mlp.c_proj.weight"), cfg),
            "fc2_b": get(pre + "mlp.c_proj.bias"),
        })
    wte = get("wte.weight")
    head = (
        jnp.asarray(np.asarray(tensors["lm_head.weight"], np.float32))
        if "lm_head.weight" in tensors
        else wte  # tied (GPT-2 default)
    )
    params = {
        "wte": wte.astype(cfg.dtype),
        "wpe": get("wpe.weight").astype(cfg.dtype),
        "layers": layers,
        "ln_f_w": get("ln_f.weight"),
        "ln_f_b": get("ln_f.bias"),
        "lm_head": _quantize_linear(head, cfg),
    }
    return cfg, params
