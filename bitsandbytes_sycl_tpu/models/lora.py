"""QLoRA: low-rank adapters over frozen quantized weights.

The BASELINE.json training config is QLoRA-parity finetuning: the base
model stays NF4 (Params4bit-style frozen weights, here QLinearWeight
pytrees), only rank-r adapters train, and the optimizer is blockwise
8-bit Adam — every piece the reference provides for QLoRA
(quantize_4bit + MatMul4Bit + Adam8bit) composed the TPU-native way:
adapters are just pytrees threaded through llama_forward(lora=...),
so the whole fine-tune step is one jitted (and shardable) computation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaConfig, _fp_layer_shapes, llama_forward

__all__ = ["init_lora", "qlora_loss_fn", "merge_lora", "stack_lora"]

_DEFAULT_TARGETS = ("q_proj", "v_proj")


def init_lora(
    cfg: LlamaConfig,
    key: jax.Array,
    rank: int = 8,
    alpha: float = 16.0,
    targets: Sequence[str] = _DEFAULT_TARGETS,
) -> List[Dict]:
    """Per-layer adapter pytree: A ~ N(0, 1/r) (r, in), B = 0 (out, r) —
    the standard LoRA init so the delta starts at zero."""
    shapes = _fp_layer_shapes(cfg)
    out = []
    keys = jax.random.split(key, cfg.num_layers)
    for li in range(cfg.num_layers):
        lk = jax.random.split(keys[li], len(targets))
        layer = {}
        for t, k in zip(targets, lk):
            n, kin = shapes[t]
            layer[t] = {
                "A": jax.random.normal(k, (rank, kin), jnp.float32) / np.sqrt(rank),
                "B": jnp.zeros((n, rank), jnp.float32),
                "scale": jnp.asarray(alpha / rank, jnp.float32),
            }
        out.append(layer)
    return out


def qlora_loss_fn(params: Dict, cfg: LlamaConfig):
    """Returns loss(lora, tokens) — causal LM cross-entropy with the
    quantized base frozen (gradients flow only into the adapters; the
    custom_vjp on the fused 4-bit matmul already gives activations their
    cotangent and the packed weights a zero one)."""

    def loss(lora, tokens):
        logits, _ = llama_forward(params, cfg, tokens[:, :-1], lora=lora)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = tokens[:, 1:]
        ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return -jnp.mean(ll)

    return loss


def merge_lora(fp_params: Dict, lora: List[Dict]) -> Dict:
    """Fold adapters into FULL-PRECISION weights (for export/re-quantize):
    W' = W + scale * B @ A. Operates on the fp param tree (the quantized
    tree is frozen storage; merging into it would double-quantize)."""
    out = {k: v for k, v in fp_params.items() if k != "layers"}
    out["layers"] = []
    for layer, lr in zip(fp_params["layers"], lora):
        new = dict(layer)
        for t, ab in lr.items():
            delta = (ab["B"] @ ab["A"]) * ab["scale"]
            new[t] = jnp.asarray(layer[t], jnp.float32) + delta
        out["layers"].append(new)
    return out


def stack_lora(adapters: Sequence[List[Dict]]) -> List[Dict]:
    """Stack N independently-trained adapter pytrees (each from
    init_lora / training) into the BATCHED multi-adapter form
    llama_forward serves with per-sequence `lora_ids` (S-LoRA-style
    multi-tenant serving): every leaf gains a leading adapter axis —
    A (n, r, K), B (n, N, r), scale (n,)."""
    n_layers = len(adapters[0])
    for a in adapters[1:]:
        if len(a) != n_layers or any(
            set(a[li]) != set(adapters[0][li]) for li in range(n_layers)
        ):
            raise ValueError(
                "stack_lora needs identical layer counts and target sets "
                "across adapters (otherwise some deltas would be dropped)"
            )
    out = []
    for li in range(n_layers):
        layer = {}
        for name in adapters[0][li]:
            layer[name] = {
                "A": jnp.stack([a[li][name]["A"] for a in adapters]),
                "B": jnp.stack([a[li][name]["B"] for a in adapters]),
                "scale": jnp.stack(
                    [jnp.asarray(a[li][name]["scale"]) for a in adapters]
                ),
            }
        out.append(layer)
    return out
