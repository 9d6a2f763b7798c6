"""Tensor-parallel OPT/GPT-2 forward — Megatron-style over a "model" axis.

Same scheme as llama_tp/gptj_tp (the reference has no distributed path,
SURVEY.md §2.3), adapted to the sequential pre-LN block (models/opt.py):

- q/k/v/fc1: column-parallel (heads / ff channels sharded), their biases
  shard with the output channels
- out_proj/fc2: row-parallel, ONE psum per sub-block per layer; their
  biases stay replicated — opt_forward adds them once, after the psum
- int8 KV cache sharded over the head dim; wte/wpe/ln/lm_head and the
  350M project_in/out replicated
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.opt import OPTConfig, opt_forward
from .llama_tp import (_device_put_tree, _localize, _prep_row_weight,
                       _proj_spec, kv_cache_specs)

__all__ = ["opt_param_specs", "shard_opt_params", "opt_forward_tp"]

_COL = ("q_proj", "k_proj", "v_proj", "fc1")
_ROW = ("out_proj", "fc2")


def opt_param_specs(params: Dict, cfg: OPTConfig, axis: str = "model") -> Dict:
    specs = {
        k: jax.tree.map(lambda _: P(), v) for k, v in params.items() if k != "layers"
    }
    specs["layers"] = []
    for layer in params["layers"]:
        ls = {}
        for name, w in layer.items():
            if name in _COL or name in _ROW:
                ls[name] = _proj_spec(name, w, axis, col=_COL, row=_ROW)
            elif name in ("q_bias", "k_bias", "v_bias", "fc1_b"):
                # shard with the column-parallel output channels;
                # out_bias/fc2_b stay replicated — opt_forward adds them
                # once, after the psum
                ls[name] = P(axis)
            else:
                ls[name] = P()
        specs["layers"].append(ls)
    return specs


def shard_opt_params(params: Dict, cfg: OPTConfig, mesh: Mesh, axis: str = "model") -> Dict:
    tp = mesh.shape[axis]
    params = dict(params)
    params["layers"] = [
        {name: _prep_row_weight(name, w, _ROW, tp) for name, w in layer.items()}
        for layer in params["layers"]
    ]
    return _device_put_tree(params, opt_param_specs(params, cfg, axis), mesh)


def opt_forward_tp(
    params: Dict,
    cfg: OPTConfig,
    tokens: jax.Array,
    cache: Optional[Dict],
    positions: jax.Array,
    mesh: Mesh,
    axis: str = "model",
) -> Tuple[jax.Array, Optional[Dict]]:
    """TP forward: params pre-sharded per opt_param_specs; cache sharded
    per llama_tp.kv_cache_specs (same head-major layout). Returns
    replicated logits and the sharded updated cache."""
    tp = mesh.shape[axis]
    if cfg.num_heads % tp or cfg.num_kv_heads % tp:
        raise ValueError(f"TP={tp} must divide num_heads({cfg.num_heads})")
    # ALiBi: the per-head slope sequence is GLOBAL — hand the local
    # forward the total head count + mesh axis so each shard
    # dynamic-slices its contiguous slope block (llama._alibi_bias)
    cfg_local = dataclasses.replace(
        cfg, num_heads=cfg.num_heads // tp, head_dim=cfg.hd,
        kv_heads=cfg.num_kv_heads // tp,
        alibi_total_heads=(cfg.num_heads if getattr(cfg, "alibi", False) else None),
        alibi_axis=(axis if getattr(cfg, "alibi", False) else None),
    )
    pspecs = opt_param_specs(params, cfg, axis)
    cspecs = kv_cache_specs(cfg, axis) if cache is not None else None

    def body(params_l, tokens, cache_l, positions):
        params_l = _localize(params_l, tp)
        return opt_forward(
            params_l, cfg_local, tokens, cache_l, positions, psum_axis=axis
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(pspecs, P(), cspecs, P()),
        out_specs=(P(), cspecs),
        check_rep=False,
    )
    return fn(params, tokens, cache, positions)
