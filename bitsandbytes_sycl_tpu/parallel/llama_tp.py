"""Tensor-parallel quantized Llama forward — shard_map over a "model" axis.

The reference is single-device (SURVEY.md §2.3: no collectives anywhere);
this implements the BASELINE.json configs[4] layout: Megatron-style TP
with quantized weights sharded CONGRUENTLY with their scales:

- q/k/v/gate/up: column-parallel (output heads / ffn channels sharded)
- o/down: row-parallel (input sharded), partial sums reduced with one
  `psum` per projection over ICI
- int8 KV cache: sharded over the kv-head axis — attention is fully local
- embed / norms / lm_head: replicated (logits identical on every device)

Per decode step the only communication is 2 psums of the (B, T, hidden)
activation per layer — the quantized weights and the KV cache never move.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.llama import LlamaConfig, llama_forward
from ..ops.common import QLinearWeight
from .mesh import qweight_pspec, qweight_sharding, retile_qweight_row_tp

__all__ = [
    "llama_param_specs", "shard_llama_params", "kv_cache_specs",
    "llama_forward_tp", "lora_param_specs", "shard_lora_params",
]

# projection -> TP sharding direction
_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_ROW = ("o_proj", "down_proj")


def _proj_spec(name: str, w, axis: str, col=_COL, row=_ROW):
    """Sharding spec for one projection — shared by every decoder family
    (llama here, gptj_tp passes its own col/row name sets)."""
    if isinstance(w, QLinearWeight):
        if name in col:
            return qweight_pspec(w, "col", axis)
        if name in row:
            return qweight_pspec(w, "row", axis)
        return jax.tree.map(lambda _: P(), w)
    if isinstance(w, dict) and "CB" in w:
        if name in col:
            spec = {"CB": P(axis, None), "SCB": P(axis)}
            if "outliers" in w:
                # sidecar: x replicated under col-parallel; subB (budget, N)
                # shards on N with the weight rows
                spec["outliers"] = {"idx": P(), "keep": P(), "subB": P(None, axis)}
            return spec
        if name in row:
            # per-output-row scales stay replicated when K is sharded
            # (outliers were stripped by _prep_row_weight for row weights)
            return {"CB": P(None, axis), "SCB": P()}
        return jax.tree.map(lambda _: P(), w)
    # unquantized fp weight (N, K)
    if name in col:
        return P(axis, None)
    if name in row:
        return P(None, axis)
    return P()


def _prep_row_weight(name: str, w, row, tp: int):
    """Row-parallel prep shared across families: planar 4-bit weights need
    contiguous-K retiling; static outlier sidecars (global-K indices)
    are dropped for K-sharded int8 weights."""
    if name in row and isinstance(w, QLinearWeight) and tp > 1:
        return retile_qweight_row_tp(w, tp)
    if name in row and isinstance(w, dict) and "outliers" in w:
        return {k: v for k, v in w.items() if k != "outliers"}
    return w


def _device_put_tree(params, specs, mesh):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def llama_param_specs(params: Dict, cfg: LlamaConfig, axis: str = "model") -> Dict:
    """PartitionSpec pytree matching the param pytree."""
    specs = {
        "embed": P(),
        "final_norm": P(),
        "layers": [],
    }
    for layer in params["layers"]:
        ls = {}
        for name, w in layer.items():
            if name == "experts":
                # expert parallelism: stacked expert weights shard on
                # their leading (expert) dim; each expert stays whole
                ls[name] = jax.tree.map(
                    lambda a: P(axis, *([None] * (a.ndim - 1))), w
                )
            elif name.endswith("_proj"):
                ls[name] = _proj_spec(name, w, axis)
            elif name in ("q_bias", "k_bias", "v_bias"):
                # qkv biases shard with their column-parallel projections
                ls[name] = P(axis)
            else:
                ls[name] = P()  # norms + the MoE router stay replicated
        specs["layers"].append(ls)
    if "lm_head" in params:
        specs["lm_head"] = jax.tree.map(lambda _: P(), params["lm_head"])
    return specs


def shard_llama_params(params: Dict, cfg: LlamaConfig, mesh: Mesh, axis: str = "model") -> Dict:
    tp = mesh.shape[axis]
    params = dict(params)
    params["layers"] = [
        {name: _prep_row_weight(name, w, _ROW, tp) for name, w in layer.items()}
        for layer in params["layers"]
    ]
    return _device_put_tree(params, llama_param_specs(params, cfg, axis), mesh)


def lora_param_specs(lora, axis: str = "model", col=_COL, row=_ROW):
    """PartitionSpec pytree for a (possibly stacked) adapter list, sharded
    CONGRUENTLY with the base projections so the deltas ride the existing
    TP math: column-parallel targets shard B on the output dim (the delta
    is local per shard); row-parallel targets shard A on the input dim
    (the partial xa sums through the layer's existing psum — psum(B @
    xa_partial) == B @ sum(xa) by linearity). A leading adapter-stack dim
    (stack_lora) is never sharded. Non-proj target names (gptj fc_in/
    fc_out map col/row by their shapes' role) must be passed via col/row."""
    def spec_for(name, ab):
        nd = ab["A"].ndim  # 2 = single adapter, 3 = stacked
        if name in col:
            a_spec, b_spec = P(), (P(axis, None) if nd == 2 else P(None, axis, None))
        elif name in row:
            a_spec, b_spec = (P(None, axis) if nd == 2 else P(None, None, axis)), P()
        else:
            a_spec = b_spec = P()
        return {"A": a_spec, "B": b_spec, "scale": P()}

    return [
        {name: spec_for(name, ab) for name, ab in layer.items()}
        for layer in lora
    ]


def shard_lora_params(lora, mesh: Mesh, axis: str = "model", col=_COL, row=_ROW):
    """Place an adapter pytree on the mesh congruently with the base
    weights (see lora_param_specs)."""
    return _device_put_tree(lora, lora_param_specs(lora, axis, col, row), mesh)


def kv_cache_specs(cfg: LlamaConfig, axis: str = "model") -> Dict:
    """Cache sharded over the kv-head dim (dim 2 of every leaf)."""
    if cfg.kv_quant:
        return {
            "k": P(None, None, axis),
            "v": P(None, None, axis),
            "k_scale": P(None, None, axis),
            "v_scale": P(None, None, axis),
        }
    return {"k": P(None, None, axis), "v": P(None, None, axis)}


def _localize(obj, tp: int):
    """Rebuild QLinearWeight metadata for per-device shards: shard_map
    hands the body local leaves but dataclass meta (logical N, K) still
    describes the global weight."""
    if isinstance(obj, QLinearWeight):
        if obj.packed.ndim != 2:
            # stacked experts (E, K/2, N): sharded on the expert dim
            # only — the per-expert metadata is already local
            return obj
        K = obj.packed.shape[0] * 2
        N = obj.packed.shape[1]
        return QLinearWeight(
            packed=obj.packed, absmax=obj.absmax, shape=(N, K),
            blocksize=obj.blocksize, quant_type=obj.quant_type, dtype=obj.dtype,
            absmax_scale=obj.absmax_scale, absmax_offset=obj.absmax_offset,
        )
    if isinstance(obj, dict):
        return {k: _localize(v, tp) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_localize(v, tp) for v in obj]
    return obj


def llama_forward_tp(
    params: Dict,
    cfg: LlamaConfig,
    tokens: jax.Array,
    cache: Optional[Dict],
    positions: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    lora=None,
    lora_ids: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[Dict]]:
    """TP forward: params/cache pre-sharded per llama_param_specs /
    kv_cache_specs; tokens/positions replicated. Returns replicated
    logits and the sharded updated cache. `lora` (single or stacked
    adapters, pre-sharded with shard_lora_params or replicated) rides
    the same shard_map — its specs derive from each target's col/row
    role, so the deltas stay token-identical to the single-device
    forward."""
    tp = mesh.shape[axis]
    if cfg.num_heads % tp or cfg.num_kv_heads % tp or cfg.intermediate_size % tp:
        raise ValueError(
            f"TP={tp} must divide num_heads({cfg.num_heads}), "
            f"num_kv_heads({cfg.num_kv_heads}) and intermediate_size"
            f"({cfg.intermediate_size})"
        )
    if getattr(cfg, "num_experts", 1) > 1 and cfg.num_experts % tp:
        raise ValueError(
            f"EP={tp} must divide num_experts({cfg.num_experts})"
        )
    cfg_local = dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=cfg.intermediate_size // tp,
        head_dim=cfg.hd,
    )
    pspecs = llama_param_specs(params, cfg, axis)
    cspecs = kv_cache_specs(cfg, axis) if cache is not None else None
    if cache is not None and "page_table" in cache:
        # paged pool (engine paged mode): pool leaves carry the kv-head
        # dim at axis 2 exactly like the contiguous cache, so they reuse
        # the same specs; the host-resolved indirection (table + write
        # page/offset) is replicated — every device writes its own head
        # shard of the same page
        cspecs = dict(cspecs)
        cspecs["page_table"] = P()
        cspecs["write_page"] = P()
        cspecs["write_off"] = P()

    lspecs = lora_param_specs(lora, axis) if lora is not None else None
    idspec = P() if lora_ids is not None else None

    def body(params_l, tokens, cache_l, positions, lora_l, ids):
        params_l = _localize(params_l, tp)
        logits, new_cache = llama_forward(
            params_l, cfg_local, tokens, cache_l, positions, psum_axis=axis,
            lora=lora_l, lora_ids=ids,
        )
        return logits, new_cache

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(pspecs, P(), cspecs, P(), lspecs, idspec),
        out_specs=(P(), cspecs),
        check_rep=False,
    )
    return fn(params, tokens, cache, positions, lora, lora_ids)
