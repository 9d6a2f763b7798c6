"""Tensor-parallel quantized matmuls over a mesh (shard_map + XLA
collectives). Replaces nothing in the reference — it has no distributed
path (SURVEY.md §2.3); this is the BASELINE.json configs[3]/[4] layer.

Patterns (Megatron-style, collectives ride ICI):
- column-parallel: W (N,K) sharded on N; x replicated; local fused
  matmul; output stays N-sharded (or all_gather when gather_output).
- row-parallel: W sharded on K; x feature-sharded; local partial matmul;
  psum. Together col->row forms one attention/MLP block with exactly one
  reduction per block.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax import shard_map  # jax >= 0.6 name
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.common import QLinearWeight
from ..ops.matmul_4bit import matmul_4bit_fused
from .. import functional as F
from .mesh import qweight_pspec

__all__ = [
    "tp_matmul_4bit_col",
    "tp_matmul_4bit_row",
    "tp_all_gather_matmul_4bit",
    "tp_matmul_int8_col",
    "tp_matmul_int8_row",
]


def _local_qw(qw_template: QLinearWeight, packed, absmax, am_scale=None, am_offset=None) -> QLinearWeight:
    n = packed.shape[1]
    k = 2 * packed.shape[0]
    return dataclasses.replace(
        qw_template, packed=packed, absmax=absmax, shape=(n, k),
        absmax_scale=am_scale, absmax_offset=am_offset,
    )


def _side_args(qw: QLinearWeight, wspec):
    """Compressed-stat sidecars threaded through shard_map (the sidecars
    shard with N under col / replicate under row, mesh._dim_specs)."""
    if qw.compressed:
        return (qw.absmax_scale, qw.absmax_offset), (wspec.absmax_scale, wspec.absmax_offset)
    return (), ()


def tp_matmul_4bit_col(
    x: jax.Array,
    qw: QLinearWeight,
    mesh: Mesh,
    axis: str = "model",
    bias: Optional[jax.Array] = None,
    gather_output: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Column-parallel fused 4-bit linear: W sharded on output features."""

    def local(x, packed, absmax, bias_l, *side):
        qwl = _local_qw(qw, packed, absmax, *side)
        out = matmul_4bit_fused(x, qwl, bias=bias_l[0], compute_dtype=compute_dtype)
        if gather_output:
            out = jax.lax.all_gather(out, axis, axis=-1, tiled=True)
        return out

    N = qw.shape[0]
    bias_arr = (bias if bias is not None else jnp.zeros((N,), compute_dtype)).reshape(1, N)
    out_spec = P() if gather_output else P(None, axis)
    wspec = qweight_pspec(qw, "col", axis)
    side, side_specs = _side_args(qw, wspec)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), wspec.packed, wspec.absmax, P(None, axis)) + side_specs,
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(x.astype(compute_dtype), qw.packed, qw.absmax, bias_arr, *side)


def tp_matmul_4bit_row(
    x: jax.Array,
    qw: QLinearWeight,
    mesh: Mesh,
    axis: str = "model",
    bias: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Row-parallel fused 4-bit linear: W sharded on input features K;
    partial products psum'ed over the axis.

    x is split into its hi/lo planar halves so each device's activation
    slice matches its packed byte rows (ops/common.py layout note).
    """
    N, K = qw.shape

    def local(xh, xl, packed, absmax, *side, bias_l=None):
        qwl = _local_qw(qw, packed, absmax, *side)
        xloc = jnp.concatenate([xh, xl], axis=-1)
        out = matmul_4bit_fused(xloc, qwl, bias=None, compute_dtype=compute_dtype)
        out = jax.lax.psum(out, axis)
        return out + bias_l if bias_l is not None else out

    x = x.astype(compute_dtype)
    x_hi, x_lo = x[..., : K // 2], x[..., K // 2 :]
    wspec = qweight_pspec(qw, "row", axis)
    bias_arr = bias.astype(compute_dtype) if bias is not None else None
    xspec = P(*([None] * (x.ndim - 1)), axis)  # shard the FEATURE (last) dim
    side, side_specs = _side_args(qw, wspec)
    fn = shard_map(
        partial(local, bias_l=bias_arr),
        mesh=mesh,
        in_specs=(xspec, xspec, wspec.packed, wspec.absmax) + side_specs,
        out_specs=P(),
        check_vma=False,
    )
    return fn(x_hi, x_lo, qw.packed, qw.absmax, *side)


def tp_all_gather_matmul_4bit(
    x: jax.Array,
    qw: QLinearWeight,
    mesh: Mesh,
    axis: str = "model",
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """FSDP-style: weight col-sharded at rest; each device all_gathers the
    packed bytes (4-bit on the wire — 4x cheaper than gathering bf16) and
    computes the full matmul. XLA's latency-hiding scheduler overlaps the
    gather with prior compute."""

    def local(x, packed, absmax, *side):
        packed_full = jax.lax.all_gather(packed, axis, axis=1, tiled=True)
        absmax_full = jax.lax.all_gather(absmax, axis, axis=2, tiled=True)
        kw = {}
        if side:
            kw = {
                "absmax_scale": jax.lax.all_gather(side[0], axis, axis=2, tiled=True),
                "absmax_offset": jax.lax.all_gather(side[1], axis, axis=2, tiled=True),
            }
        qwl = dataclasses.replace(qw, packed=packed_full, absmax=absmax_full, **kw)
        return matmul_4bit_fused(x, qwl, compute_dtype=compute_dtype)

    wspec = qweight_pspec(qw, "col", axis)
    side, side_specs = _side_args(qw, wspec)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), wspec.packed, wspec.absmax) + side_specs,
        out_specs=P(),
        check_vma=False,
    )
    return fn(x.astype(compute_dtype), qw.packed, qw.absmax, *side)


def tp_matmul_int8_col(
    x: jax.Array,
    CB: jax.Array,
    SCB: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    threshold: float = 0.0,
    gather_output: bool = False,
) -> jax.Array:
    """Column-parallel LLM.int8 linear: CB (N,K) and SCB (N,) sharded on N.
    Activation row-stats are computed locally on the replicated x, so
    numerics are identical to single-device."""

    def local(x, CB_l, SCB_l):
        out = F.llm_int8_matmul(x, CB_l, SCB_l, threshold=threshold)
        if gather_output:
            out = jax.lax.all_gather(out, axis, axis=-1, tiled=True)
        return out

    out_spec = P() if gather_output else P(None, axis)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(x, CB, SCB)


def tp_matmul_int8_row(
    x: jax.Array,
    CB: jax.Array,
    SCB: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    threshold: float = 0.0,
) -> jax.Array:
    """Row-parallel LLM.int8 linear: CB sharded on K; x feature-sharded;
    psum of partials. Each shard quantizes its activation slice with its
    local row absmax — the per-shard scales differ from the reference's
    global-row quantization but the error bound is the same or tighter
    (absmax_local <= absmax_global)."""

    def local(x_l, CB_l, SCB_l):
        out = F.llm_int8_matmul(x_l, CB_l, SCB_l, threshold=threshold)
        return jax.lax.psum(out, axis)

    xspec = P(*([None] * (x.ndim - 1)), axis)  # shard the FEATURE (last) dim
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(xspec, P(None, axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(x, CB, SCB)
