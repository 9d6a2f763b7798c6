"""GPT-J family decoder with k-bit quantized weights.

The reference's only real-model integration test loads GPT-J with
load_in_8bit (tests_pvc/test_int8_hf.py:1-20) — this is that model
family, TPU-native: parallel attention+MLP blocks off one LayerNorm,
interleaved ("rotate_every_two") rotary on the first rotary_dim dims,
MHA, biased projections in the MLP/head. Reuses the quantized-linear
dispatch, int8 KV cache layout and flash attention kernels from
models.llama.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .llama import _quantize_linear, apply_linear, write_and_attend

__all__ = ["GPTJConfig", "init_gptj_params", "gptj_forward", "init_gptj_kv_cache"]


@dataclasses.dataclass(frozen=True)
class GPTJConfig:
    vocab_size: int = 50400
    hidden_size: int = 4096
    num_layers: int = 28
    num_heads: int = 16
    head_dim: Optional[int] = None  # override for TP-local configs
    rotary_dim: int = 64
    max_seq_len: int = 2048
    ln_eps: float = 1e-5
    # rotary convention on the first rotary_dim dims: "gptj" = interleaved
    # rotate_every_two; "neox" = half-split (Phi-1/2, GPT-NeoX)
    rope_style: str = "gptj"
    rope_theta: float = 10000.0
    # MLP activation: "gelu_tanh" (GPT-J/Phi, HF gelu_new) or "gelu"
    # (GPT-NeoX exact erf gelu)
    act: str = "gelu_tanh"
    # additive biases on q/k/v/out projections (Phi); fc/head biases are
    # always present (GPT-J has them)
    attn_bias: bool = False
    # multi/grouped-query attention (Falcon): number of kv heads; None =
    # num_heads (GPT-J/Phi/NeoX). The shared llama cache + flash kernels
    # already handle GQA, so only the k/v projection widths change.
    kv_heads: Optional[int] = None
    dtype: Any = jnp.bfloat16
    quant: str = "nf4"
    blocksize: int = 64
    compress_stats: bool = False  # 8-bit scales decoded in-kernel
    a8_decode: bool = True  # W4A8 decode routing (see llama.apply_linear)
    absmax_dtype: str = "bfloat16"  # scale storage; bf16 is free (see llama)
    llm_int8_threshold: float = 6.0
    kv_quant: bool = True
    # int4 paged KV pages (see llama.LlamaConfig.kv_bits — the paged
    # machinery is shared, detection is by pool dtype)
    kv_bits: int = 8
    # paged decode grid truncation (see llama.LlamaConfig.pages_hint)
    pages_hint: Optional[int] = None

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    # shims so the shared quantized-linear dispatch works unchanged
    @property
    def num_kv_heads(self) -> int:
        return self.kv_heads or self.num_heads

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=256, hidden_size=256, num_layers=2, num_heads=2,
                 rotary_dim=32, max_seq_len=128)
        d.update(kw)
        return cls(**d)


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _rope_interleaved(
    x: jax.Array, positions: jax.Array, rotary_dim: int, theta: float = 10000.0
) -> jax.Array:
    """GPT-J rotary: rotate_every_two on the first rotary_dim dims
    (pairs (0,1),(2,3),...), rest passed through."""
    B, T, H, D = x.shape
    r = rotary_dim
    xr, xp = x[..., :r].astype(jnp.float32), x[..., r:]
    freqs = 1.0 / (theta ** (jnp.arange(0, r, 2, dtype=jnp.float32) / r))
    ang = positions.astype(jnp.float32)[:, :, None] * freqs[None, None, :]  # (B,T,r/2)
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    x1 = xr[..., 0::2]
    x2 = xr[..., 1::2]
    ro = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1).reshape(B, T, H, r)
    return jnp.concatenate([ro.astype(x.dtype), xp], axis=-1)


def _rope_neox_partial(
    x: jax.Array, positions: jax.Array, rotary_dim: int, theta: float = 10000.0
) -> jax.Array:
    """Phi/GPT-NeoX rotary: llama-style half-split rotation applied to the
    first rotary_dim dims only, rest passed through (HF PhiAttention
    partial_rotary_factor semantics)."""
    from .llama import _rope

    xr, xp = x[..., :rotary_dim], x[..., rotary_dim:]
    return jnp.concatenate([_rope(xr, positions, theta), xp], axis=-1)


def init_gptj_kv_cache(cfg: GPTJConfig, batch: int) -> Dict:
    """Same head-major layout as llama (K transposed) so the flash
    kernels apply unchanged — GPTJConfig exposes the num_kv_heads/hd
    shims exactly so the llama cache builder works as-is."""
    from .llama import init_kv_cache

    return init_kv_cache(cfg, batch)


def init_gptj_params(cfg: GPTJConfig, key: jax.Array) -> Dict:
    keys = jax.random.split(key, cfg.num_layers + 2)

    def dense(k, shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[1]))
        return jax.random.normal(k, shape, jnp.float32) * scale

    h, ff = cfg.hidden_size, 4 * cfg.hidden_size
    qdim = cfg.num_heads * cfg.hd
    kvdim = cfg.num_kv_heads * cfg.hd
    layers = []
    for li in range(cfg.num_layers):
        lk = jax.random.split(keys[li], 6)
        layer = {
            "ln_w": jnp.ones((h,), jnp.float32),
            "ln_b": jnp.zeros((h,), jnp.float32),
            "q_proj": _quantize_linear(dense(lk[0], (qdim, h)), cfg),
            "k_proj": _quantize_linear(dense(lk[1], (kvdim, h)), cfg),
            "v_proj": _quantize_linear(dense(lk[2], (kvdim, h)), cfg),
            "out_proj": _quantize_linear(dense(lk[3], (h, qdim)), cfg),
            "fc_in": _quantize_linear(dense(lk[4], (ff, h)), cfg),
            "fc_in_b": jnp.zeros((ff,), jnp.float32),
            "fc_out": _quantize_linear(dense(lk[5], (h, ff)), cfg),
            "fc_out_b": jnp.zeros((h,), jnp.float32),
        }
        if cfg.attn_bias:  # Phi-style biased q/k/v/dense
            bk = jax.random.split(keys[li], 4)
            layer["q_bias"] = jax.random.normal(bk[0], (qdim,), jnp.float32) * 0.02
            layer["k_bias"] = jax.random.normal(bk[1], (kvdim,), jnp.float32) * 0.02
            layer["v_bias"] = jax.random.normal(bk[2], (kvdim,), jnp.float32) * 0.02
            layer["out_bias"] = jax.random.normal(bk[3], (h,), jnp.float32) * 0.02
        layers.append(layer)
    return {
        "wte": dense(keys[-2], (cfg.vocab_size, h), scale=0.02).astype(cfg.dtype),
        "layers": layers,
        "ln_f_w": jnp.ones((h,), jnp.float32),
        "ln_f_b": jnp.zeros((h,), jnp.float32),
        "lm_head": _quantize_linear(dense(keys[-1], (cfg.vocab_size, h), scale=0.02), cfg),
        "lm_head_b": jnp.zeros((cfg.vocab_size,), jnp.float32),
    }


def gptj_forward(
    params: Dict,
    cfg: GPTJConfig,
    tokens: jax.Array,  # (B, T)
    cache: Optional[Dict] = None,
    positions: Optional[jax.Array] = None,
    seq_lens: Optional[jax.Array] = None,  # unused; engine-signature parity
    psum_axis: Optional[str] = None,  # mesh axis for TP row-parallel sums
    lora: Optional[list] = None,  # per-layer {proj_name: {A,B,scale}} adapters
    lora_ids: Optional[jax.Array] = None,  # (B,) per-sequence adapter ids
) -> Tuple[jax.Array, Optional[Dict]]:
    """Same contract as llama_forward: (logits, updated cache). LoRA
    adapters target any of q/k/v/out_proj/fc_in/fc_out by key name."""
    from .llama import _lora_for

    B, T = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    ids_bt = (
        jnp.broadcast_to(lora_ids[:, None], (B, T)) if lora_ids is not None else None
    )

    x = jnp.take(params["wte"], tokens, axis=0).astype(cfg.dtype)
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
        h = _ln(x, layer["ln_w"], layer["ln_b"], cfg.ln_eps)
        # GPT-NeoX: the parallel MLP branch reads its OWN LayerNorm of
        # the layer input (use_parallel_residual); GPT-J/Phi share h
        h_mlp = (
            _ln(x, layer["ln2_w"], layer["ln2_b"], cfg.ln_eps)
            if "ln2_w" in layer
            else h
        )
        q = apply_linear(h, layer["q_proj"], cfg, _lora_for(lora, li, "q_proj"), ids_bt)
        k = apply_linear(h, layer["k_proj"], cfg, _lora_for(lora, li, "k_proj"), ids_bt)
        v = apply_linear(h, layer["v_proj"], cfg, _lora_for(lora, li, "v_proj"), ids_bt)
        if "q_bias" in layer:  # Phi-style biased attention projections
            q = q + layer["q_bias"].astype(q.dtype)
            k = k + layer["k_bias"].astype(k.dtype)
            v = v + layer["v_bias"].astype(v.dtype)
        q = q.reshape(B, T, cfg.num_heads, cfg.hd)
        k = k.reshape(B, T, cfg.num_kv_heads, cfg.hd)
        v = v.reshape(B, T, cfg.num_kv_heads, cfg.hd)
        rope = (
            _rope_neox_partial
            if getattr(cfg, "rope_style", "gptj") == "neox"
            else _rope_interleaved
        )
        q = rope(q, positions, cfg.rotary_dim, cfg.rope_theta)
        k = rope(k, positions, cfg.rotary_dim, cfg.rope_theta)

        if use_cache:
            attn, new_cache = write_and_attend(new_cache, li, q, k, v, positions, mask, cfg)
        else:
            from .llama import _attention

            attn = _attention(q, k, v, mask, cfg.dtype)
        # -1 keeps the reshape valid for TP-local head shards
        attn = attn.astype(cfg.dtype).reshape(B, T, -1)
        attn_out = apply_linear(attn, layer["out_proj"], cfg, _lora_for(lora, li, "out_proj"), ids_bt)

        # parallel MLP block (same LN as attention for GPT-J/Phi; its own
        # LN for GPT-NeoX — see h_mlp above)
        ff = apply_linear(h_mlp, layer["fc_in"], cfg, _lora_for(lora, li, "fc_in"), ids_bt) + layer["fc_in_b"].astype(cfg.dtype)
        ff = jax.nn.gelu(
            ff.astype(jnp.float32),
            approximate=getattr(cfg, "act", "gelu_tanh") == "gelu_tanh",
        ).astype(cfg.dtype)
        ff = apply_linear(ff, layer["fc_out"], cfg, _lora_for(lora, li, "fc_out"), ids_bt)
        if psum_axis is not None:
            # row-parallel partial sums; biases are added ONCE, after
            attn_out = jax.lax.psum(attn_out, psum_axis)
            ff = jax.lax.psum(ff, psum_axis)
        if "out_bias" in layer:  # Phi: biased attention dense
            attn_out = attn_out + layer["out_bias"].astype(cfg.dtype)
        ff = ff + layer["fc_out_b"].astype(cfg.dtype)

        x = x + attn_out + ff

    if use_cache and "pend_k" in new_cache:
        from .llama import flush_paged_writes

        new_cache = flush_paged_writes(new_cache)
    x = _ln(x, params["ln_f_w"], params["ln_f_b"], cfg.ln_eps)
    logits = apply_linear(x, params["lm_head"], cfg).astype(jnp.float32)
    logits = logits + params["lm_head_b"].astype(jnp.float32)
    return logits, new_cache
