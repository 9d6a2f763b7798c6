"""OPT family (Meta OPT-125M…66B) — sequential pre-LN decoder.

OPT (arxiv 2205.01068) is the model family the LLM.int8() paper — the
reference's headline algorithm — was evaluated on, so it belongs in the
zoo the reference implies (the reference itself ships no model code;
its real-model test loads GPT-J via HF hooks, tests_pvc/test_int8_hf.py).

Architecture, vs the two existing substrates: SEQUENTIAL residual
(x += attn(LN1(x)); x += mlp(LN2(x))) like llama but with LayerNorm
(not RMSNorm), biases on every projection, LEARNED absolute position
embeddings with OPT's historical +2 offset (no rotary), and a plain
ReLU 2-layer MLP (not gated). The quantized-linear dispatch
(llama.apply_linear — NF4/FP4/int4 fused kernels, W4A8 routing,
LLM.int8), the int8 KV cache layout and the flash attention kernels are
reused unchanged; OPT-350M's word_embed_proj_dim projections
(project_in/out) are supported.

Only do_layer_norm_before=True checkpoints are supported (all sizes
except the 350M quirk); post-LN would reorder the residual math.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gptj import GPTJConfig, _ln
from .llama import (_alibi_bias, _attention, _quantize_linear, apply_linear,
                    write_and_attend)

__all__ = ["OPTConfig", "init_opt_params", "opt_forward", "load_opt_from_hf"]


@dataclasses.dataclass(frozen=True)
class OPTConfig(GPTJConfig):
    """GPTJConfig field surface (the shared currency of the quantized
    dispatch/cache/engine) + OPT's own knobs. rotary fields are unused.
    Defaults: OPT-6.7B (32L/4096h/32H, ffn 4h)."""

    # MLP activation (overrides the GPTJConfig default): OPT is ReLU
    act: str = "relu"
    ffn_dim: Optional[int] = None  # None = 4*hidden_size
    # OPT-350M: embeddings live in a narrower dim with in/out projections
    word_embed_proj_dim: Optional[int] = None
    # learned-position table offset: OPT's historical +2; GPT-2 uses 0
    pos_offset: int = 2
    # ALiBi positional bias instead of position embeddings (BLOOM);
    # routes attention to the XLA path (llama._use_fused_decode_attn)
    alibi: bool = False
    # TP-internal (set by opt_forward_tp, never by users): global head
    # count + mesh axis so each shard slices its slope block
    alibi_total_heads: Optional[int] = None
    alibi_axis: Optional[str] = None

    @property
    def ffn(self) -> int:
        return self.ffn_dim or 4 * self.hidden_size

    @property
    def embed_dim(self) -> int:
        return self.word_embed_proj_dim or self.hidden_size

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=256, hidden_size=256, num_layers=2, num_heads=4,
                 max_seq_len=128, ffn_dim=512)
        d.update(kw)
        return cls(**d)


def init_opt_params(cfg: OPTConfig, key: jax.Array) -> Dict:
    keys = jax.random.split(key, cfg.num_layers + 4)

    def dense(k, shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[1]))
        return jax.random.normal(k, shape, jnp.float32) * scale

    h, ff, w = cfg.hidden_size, cfg.ffn, cfg.embed_dim
    qd = cfg.num_heads * cfg.hd
    kvd = cfg.num_kv_heads * cfg.hd
    layers = []
    for li in range(cfg.num_layers):
        lk = jax.random.split(keys[li], 6)
        layers.append({
            "ln1_w": jnp.ones((h,), jnp.float32),
            "ln1_b": jnp.zeros((h,), jnp.float32),
            "q_proj": _quantize_linear(dense(lk[0], (qd, h)), cfg),
            "q_bias": jnp.zeros((qd,), jnp.float32),
            "k_proj": _quantize_linear(dense(lk[1], (kvd, h)), cfg),
            "k_bias": jnp.zeros((kvd,), jnp.float32),
            "v_proj": _quantize_linear(dense(lk[2], (kvd, h)), cfg),
            "v_bias": jnp.zeros((kvd,), jnp.float32),
            "out_proj": _quantize_linear(dense(lk[3], (h, qd)), cfg),
            "out_bias": jnp.zeros((h,), jnp.float32),
            "ln2_w": jnp.ones((h,), jnp.float32),
            "ln2_b": jnp.zeros((h,), jnp.float32),
            "fc1": _quantize_linear(dense(lk[4], (ff, h)), cfg),
            "fc1_b": jnp.zeros((ff,), jnp.float32),
            "fc2": _quantize_linear(dense(lk[5], (h, ff)), cfg),
            "fc2_b": jnp.zeros((h,), jnp.float32),
        })
    params = {
        "wte": dense(keys[-4], (cfg.vocab_size, w), scale=0.02).astype(cfg.dtype),
        "layers": layers,
        "ln_f_w": jnp.ones((h,), jnp.float32),
        "ln_f_b": jnp.zeros((h,), jnp.float32),
        # tied head (OPT default); a loader may install an untied one
        "lm_head": _quantize_linear(
            dense(keys[-2], (cfg.vocab_size, w), scale=0.02), cfg
        ),
    }
    if not cfg.alibi:
        # learned positions carry OPT's pos_offset extra rows; ALiBi
        # families (BLOOM) have no position table at all
        params["wpe"] = dense(
            keys[-3], (cfg.max_seq_len + cfg.pos_offset, h), scale=0.02
        ).astype(cfg.dtype)
    else:
        params["wln_w"] = jnp.ones((h,), jnp.float32)  # BLOOM embed LN
        params["wln_b"] = jnp.zeros((h,), jnp.float32)
    if w != h:
        # fresh key — reusing lm_head's key would correlate the
        # projection inits with the head
        k1, k2 = jax.random.split(keys[-1])
        params["project_in"] = _quantize_linear(dense(k1, (h, w)), cfg)
        params["project_out"] = _quantize_linear(dense(k2, (w, h)), cfg)
    return params


def opt_forward(
    params: Dict,
    cfg: OPTConfig,
    tokens: jax.Array,  # (B, T)
    cache: Optional[Dict] = None,
    positions: Optional[jax.Array] = None,
    seq_lens: Optional[jax.Array] = None,  # unused; engine-signature parity
    psum_axis: Optional[str] = None,  # mesh axis for TP row-parallel sums
    lora: Optional[list] = None,  # per-layer {proj_name: {A,B,scale}} adapters
    lora_ids: Optional[jax.Array] = None,  # (B,) per-sequence adapter ids
) -> Tuple[jax.Array, Optional[Dict]]:
    """Same contract as llama_forward/gptj_forward: (logits, cache),
    including the engine's multi-adapter LoRA kwargs (projection names:
    q/k/v/out_proj, fc1, fc2)."""
    from .llama import _lora_for

    B, T = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    ids_bt = (
        jnp.broadcast_to(lora_ids[:, None], (B, T)) if lora_ids is not None else None
    )

    x = jnp.take(params["wte"], tokens, axis=0).astype(cfg.dtype)
    if "wln_w" in params:  # BLOOM: LayerNorm straight after the embedding
        x = _ln(x, params["wln_w"], params["wln_b"], cfg.ln_eps)
    if "project_in" in params:
        x = apply_linear(x, params["project_in"], cfg)
    if "wpe" in params:
        # learned absolute positions (OPT: +2 offset rows in the table,
        # HF OPTLearnedPositionalEmbedding; GPT-2: offset 0); ALiBi
        # families carry no position table — distance bias in attention
        x = x + jnp.take(
            params["wpe"], positions + cfg.pos_offset, axis=0
        ).astype(cfg.dtype)

    use_cache = cache is not None
    S = cfg.max_seq_len if use_cache else T
    if use_cache:
        mask = jnp.arange(S)[None, None, :] <= positions[:, :, None]
    else:
        mask = jnp.broadcast_to(jnp.tril(jnp.ones((T, T), bool))[None], (B, T, T))

    new_cache = dict(cache) if use_cache else None
    if use_cache:
        from .llama import maybe_init_pend

        new_cache = maybe_init_pend(new_cache, cfg, T, positions)
    for li, layer in enumerate(params["layers"]):
        h = _ln(x, layer["ln1_w"], layer["ln1_b"], cfg.ln_eps)
        q = apply_linear(h, layer["q_proj"], cfg, _lora_for(lora, li, "q_proj"), ids_bt) + layer["q_bias"].astype(cfg.dtype)
        k = apply_linear(h, layer["k_proj"], cfg, _lora_for(lora, li, "k_proj"), ids_bt) + layer["k_bias"].astype(cfg.dtype)
        v = apply_linear(h, layer["v_proj"], cfg, _lora_for(lora, li, "v_proj"), ids_bt) + layer["v_bias"].astype(cfg.dtype)
        q = q.reshape(B, T, cfg.num_heads, cfg.hd)
        k = k.reshape(B, T, cfg.num_kv_heads, cfg.hd)
        v = v.reshape(B, T, cfg.num_kv_heads, cfg.hd)
        if use_cache:
            attn, new_cache = write_and_attend(
                new_cache, li, q, k, v, positions, mask, cfg
            )
        else:
            bias = (
                _alibi_bias(cfg, positions, T) if cfg.alibi else None
            )
            attn = _attention(q, k, v, mask, cfg.dtype, bias=bias)
        attn = attn.astype(cfg.dtype).reshape(B, T, -1)
        attn_out = apply_linear(attn, layer["out_proj"], cfg, _lora_for(lora, li, "out_proj"), ids_bt)
        if psum_axis is not None:
            attn_out = jax.lax.psum(attn_out, psum_axis)
        x = x + attn_out + layer["out_bias"].astype(cfg.dtype)

        h = _ln(x, layer["ln2_w"], layer["ln2_b"], cfg.ln_eps)
        ff = apply_linear(h, layer["fc1"], cfg, _lora_for(lora, li, "fc1"), ids_bt) + layer["fc1_b"].astype(cfg.dtype)
        # OPT: relu; GPT-2 rides this substrate with gelu_tanh (HF gelu_new)
        act = getattr(cfg, "act", "relu")
        if act == "relu":
            ff = jax.nn.relu(ff)
        else:
            ff = jax.nn.gelu(
                ff.astype(jnp.float32), approximate=act == "gelu_tanh"
            ).astype(cfg.dtype)
        ff = apply_linear(ff, layer["fc2"], cfg, _lora_for(lora, li, "fc2"), ids_bt)
        if psum_axis is not None:
            ff = jax.lax.psum(ff, psum_axis)
        x = x + ff + layer["fc2_b"].astype(cfg.dtype)

    if use_cache and "pend_k" in new_cache:
        from .llama import flush_paged_writes

        new_cache = flush_paged_writes(new_cache)
    x = _ln(x, params["ln_f_w"], params["ln_f_b"], cfg.ln_eps)
    if "project_out" in params:
        x = apply_linear(x, params["project_out"], cfg)
    logits = apply_linear(x, params["lm_head"], cfg).astype(jnp.float32)
    return logits, new_cache


def load_opt_from_hf(model_dir: str, cfg=None, quant: str = "nf4"):
    """Load a HuggingFace OPT checkpoint directory (OPTForCausalLM key
    names, model.decoder.*) and quantize into the param tree above.
    Returns (cfg, params). Only do_layer_norm_before=True checkpoints
    are supported (all mainline sizes; the 350M post-LN quirk is not)."""
    import json

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    if not hf.get("do_layer_norm_before", True):
        raise NotImplementedError(
            "post-LayerNorm OPT checkpoints (do_layer_norm_before=False) "
            "are not supported"
        )
    # guard the variant knobs the loader hardcodes (all mainline OPT
    # sizes match the defaults; a variant must not load silently wrong)
    hf_act = hf.get("activation_function", "relu")
    if hf_act != "relu":
        raise NotImplementedError(
            f"OPT activation_function={hf_act!r} is not supported "
            "(the substrate hardcodes relu for OPT)"
        )
    if not hf.get("enable_bias", True):
        raise NotImplementedError(
            "enable_bias=false OPT checkpoints are not supported — the "
            "loader reads a bias for every projection"
        )
    if not hf.get("layer_norm_elementwise_affine", True):
        raise NotImplementedError(
            "layer_norm_elementwise_affine=false OPT checkpoints are not "
            "supported — the loader reads LayerNorm weight/bias tensors"
        )
    if cfg is None:
        cfg = OPTConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            ffn_dim=hf.get("ffn_dim", 4 * hf["hidden_size"]),
            word_embed_proj_dim=hf.get("word_embed_proj_dim", hf["hidden_size"]),
            max_seq_len=min(hf.get("max_position_embeddings", 2048), 4096),
            ln_eps=1e-5,
            quant=quant,
        )
    from ..checkpoints import _read_hf_tensors

    tensors = _read_hf_tensors(model_dir)
    pfx = (
        "model.decoder."
        if any(k.startswith("model.decoder.") for k in tensors)
        else "decoder."
    )

    def get(name):
        return jnp.asarray(np.asarray(tensors[pfx + name], np.float32))

    layers = []
    for li in range(cfg.num_layers):
        pre = f"layers.{li}."
        layers.append({
            "ln1_w": get(pre + "self_attn_layer_norm.weight"),
            "ln1_b": get(pre + "self_attn_layer_norm.bias"),
            "q_proj": _quantize_linear(get(pre + "self_attn.q_proj.weight"), cfg),
            "q_bias": get(pre + "self_attn.q_proj.bias"),
            "k_proj": _quantize_linear(get(pre + "self_attn.k_proj.weight"), cfg),
            "k_bias": get(pre + "self_attn.k_proj.bias"),
            "v_proj": _quantize_linear(get(pre + "self_attn.v_proj.weight"), cfg),
            "v_bias": get(pre + "self_attn.v_proj.bias"),
            "out_proj": _quantize_linear(get(pre + "self_attn.out_proj.weight"), cfg),
            "out_bias": get(pre + "self_attn.out_proj.bias"),
            "ln2_w": get(pre + "final_layer_norm.weight"),
            "ln2_b": get(pre + "final_layer_norm.bias"),
            "fc1": _quantize_linear(get(pre + "fc1.weight"), cfg),
            "fc1_b": get(pre + "fc1.bias"),
            "fc2": _quantize_linear(get(pre + "fc2.weight"), cfg),
            "fc2_b": get(pre + "fc2.bias"),
        })
    wte = get("embed_tokens.weight")
    # HF slices the +2 offset rows INTO the table (max_pos+2 rows total)
    wpe = get("embed_positions.weight")
    head = (
        jnp.asarray(np.asarray(tensors["lm_head.weight"], np.float32))
        if "lm_head.weight" in tensors
        else wte  # tied (OPT default)
    )
    params = {
        "wte": wte.astype(cfg.dtype),
        "wpe": wpe.astype(cfg.dtype),
        "layers": layers,
        "ln_f_w": get("final_layer_norm.weight"),
        "ln_f_b": get("final_layer_norm.bias"),
        "lm_head": _quantize_linear(head, cfg),
    }
    if cfg.word_embed_proj_dim and cfg.word_embed_proj_dim != cfg.hidden_size:
        params["project_in"] = _quantize_linear(get("project_in.weight"), cfg)
        params["project_out"] = _quantize_linear(get("project_out.weight"), cfg)
    return cfg, params


def init_opt_kv_cache(cfg: OPTConfig, batch: int) -> Dict:
    """Same head-major int8 layout as llama (the config shims make the
    llama cache builder apply as-is)."""
    from .llama import init_kv_cache

    return init_kv_cache(cfg, batch)
