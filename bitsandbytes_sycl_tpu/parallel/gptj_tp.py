"""Tensor-parallel GPT-J forward — Megatron-style over a "model" axis.

Same scheme as llama_tp (the reference has no distributed path at all,
SURVEY.md §2.3), adapted to the GPT-J block (parallel attention + MLP
off one LayerNorm, interleaved rotary, biased MLP):

- q/k/v/fc_in: column-parallel (heads / ff channels sharded); fc_in's
  bias shards with its output channels
- out_proj/fc_out: row-parallel, ONE psum per branch per layer, biases
  added once after the reduction (models/gptj.py psum_axis hook)
- int8 KV cache sharded over the head dim; embed/ln/lm_head replicated
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.gptj import GPTJConfig, gptj_forward
from .llama_tp import _device_put_tree, _localize, _prep_row_weight, _proj_spec, kv_cache_specs

__all__ = ["gptj_param_specs", "shard_gptj_params", "gptj_forward_tp"]

_COL = ("q_proj", "k_proj", "v_proj", "fc_in")
_ROW = ("out_proj", "fc_out")


def gptj_param_specs(params: Dict, cfg: GPTJConfig, axis: str = "model") -> Dict:
    # top-level entries (wte, ln_f, lm_head — possibly quantized pytrees)
    # replicate leaf-wise
    specs = {
        k: jax.tree.map(lambda _: P(), v) for k, v in params.items() if k != "layers"
    }
    specs["layers"] = []
    for layer in params["layers"]:
        ls = {}
        for name, w in layer.items():
            if name in _COL or name in _ROW:
                ls[name] = _proj_spec(name, w, axis, col=_COL, row=_ROW)
            elif name in ("fc_in_b", "q_bias", "k_bias", "v_bias"):
                # shard with the column-parallel projection's output
                # channels (fc_in / Phi's biased q/k/v); out_bias stays
                # replicated — gptj_forward adds it once, after the psum
                ls[name] = P(axis)
            else:
                ls[name] = P()
        specs["layers"].append(ls)
    return specs


def shard_gptj_params(params: Dict, cfg: GPTJConfig, mesh: Mesh, axis: str = "model") -> Dict:
    tp = mesh.shape[axis]
    params = dict(params)
    params["layers"] = [
        {name: _prep_row_weight(name, w, _ROW, tp) for name, w in layer.items()}
        for layer in params["layers"]
    ]
    return _device_put_tree(params, gptj_param_specs(params, cfg, axis), mesh)


def gptj_forward_tp(
    params: Dict,
    cfg: GPTJConfig,
    tokens: jax.Array,
    cache: Optional[Dict],
    positions: jax.Array,
    mesh: Mesh,
    axis: str = "model",
) -> Tuple[jax.Array, Optional[Dict]]:
    """TP forward: params pre-sharded per gptj_param_specs; cache sharded
    per llama_tp.kv_cache_specs (same head-major layout). Returns
    replicated logits and the sharded updated cache."""
    tp = mesh.shape[axis]
    if cfg.num_heads % tp:
        raise ValueError(f"TP={tp} must divide num_heads({cfg.num_heads})")
    cfg_local = dataclasses.replace(cfg, num_heads=cfg.num_heads // tp, head_dim=cfg.hd)
    pspecs = gptj_param_specs(params, cfg, axis)
    cspecs = kv_cache_specs(cfg, axis) if cache is not None else None

    def body(params_l, tokens, cache_l, positions):
        params_l = _localize(params_l, tp)
        return gptj_forward(
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
