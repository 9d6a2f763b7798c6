"""Mesh construction and PartitionSpecs for quantized weights.

Blockwise-absmax sharding rule (SURVEY.md §7 "hard parts"): scales must
shard congruently with their data blocks. In kernel layout
(ops/common.py) a QLinearWeight is packed (K//2, N) + absmax (K//bs, N):

- "col" (output/N) sharding:  packed P(None, axis), absmax P(None, axis)
  — every device owns all K blocks of its N-slice; no scale crossing.
- "row" (input/K) sharding:   packed P(axis, None), absmax P(axis, None)
  — valid because K//2 and K//bs split proportionally when the per-device
  K-shard is a multiple of 2*blocksize (checked at shard time).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.common import QLinearWeight

__all__ = [
    "retile_qweight_row_tp",
    "make_mesh",
    "initialize_distributed",
    "qweight_pspec",
    "qweight_sharding",
    "shard_qweight",
]


def make_mesh(shape: Dict[str, int], devices=None) -> Mesh:
    """Build a named mesh, e.g. make_mesh({"data": 2, "model": 4}).

    Axis sizes must multiply to the device count. Uses
    mesh_utils.create_device_mesh for ICI-friendly placement when
    possible.
    """
    names = tuple(shape.keys())
    sizes = tuple(shape.values())
    n = int(np.prod(sizes))
    if devices is None:
        devices = jax.devices()[:n]
    if len(devices) != n:
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(sizes, devices=devices)
    except Exception:
        dev_array = np.array(devices).reshape(sizes)
    return Mesh(dev_array, names)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: jax.distributed.initialize with env fallback
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op for a single process."""
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"],
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def _dim_specs(dim: str, axis: str):
    # packed (K//2, N); absmax (2, K//(2*bs), N); compressed-stat sidecars
    # (2, 1, N) shard with N under col, replicate under row (they are
    # per-column reductions over ALL K blocks, identical on every K shard)
    if dim == "col":
        return P(None, axis), P(None, None, axis), P(None, None, axis)
    if dim == "row":
        return P(axis, None), P(None, axis, None), P()
    if dim == "replicated":
        return P(), P(), P()
    raise ValueError(dim)


def qweight_pspec(qw: QLinearWeight, dim: str, axis: str = "model") -> QLinearWeight:
    """PartitionSpec pytree shaped like `qw` (same static metadata, spec
    leaves) — usable directly as a shard_map in_spec.

    dim="col": shard output features N (column-parallel linear).
    dim="row": shard input features K (row-parallel linear).
    dim="replicated": no sharding.
    """
    import dataclasses

    p_packed, p_absmax, p_side = _dim_specs(dim, axis)
    side = {}
    if qw.absmax_scale is not None:
        side = {"absmax_scale": p_side, "absmax_offset": p_side}
    return dataclasses.replace(qw, packed=p_packed, absmax=p_absmax, **side)


def qweight_sharding(
    qw: QLinearWeight, mesh: Mesh, dim: str, axis: str = "model"
) -> QLinearWeight:
    import dataclasses

    p_packed, p_absmax, p_side = _dim_specs(dim, axis)
    side = {}
    if qw.absmax_scale is not None:
        side = {
            "absmax_scale": NamedSharding(mesh, p_side),
            "absmax_offset": NamedSharding(mesh, p_side),
        }
    return dataclasses.replace(
        qw,
        packed=NamedSharding(mesh, p_packed),
        absmax=NamedSharding(mesh, p_absmax),
        **side,
    )


def shard_qweight(
    qw: QLinearWeight, mesh: Mesh, dim: str = "col", axis: str = "model"
) -> QLinearWeight:
    """device_put a QLinearWeight with congruent data/scale sharding."""
    n_shards = mesh.shape[axis]
    N, K = qw.shape
    if dim == "col" and N % (128 * n_shards) != 0:
        raise ValueError(f"col-sharding needs N({N}) % 128*{n_shards} == 0")
    if dim == "row":
        per_dev_k = K // n_shards
        if per_dev_k % (2 * qw.blocksize) != 0:
            raise ValueError(
                f"row-sharding needs K/shard ({per_dev_k}) divisible by 2*blocksize "
                f"({2 * qw.blocksize}) so absmax blocks never cross shards"
            )
    return jax.device_put(qw, qweight_sharding(qw, mesh, dim, axis))


def retile_qweight_row_tp(qw: QLinearWeight, tp: int) -> QLinearWeight:
    """Lossless repack for ROW (input-K) tensor-parallel sharding of a
    planar-packed weight.

    The planar layout (ops/common.py) stores element k in byte row k for
    k < K/2 (hi nibble) and in byte row k - K/2 (lo nibble) otherwise, so
    slicing byte rows [d*K/(2tp), (d+1)*K/(2tp)) hands device d TWO
    disjoint half-ranges of K — not the contiguous [d*K/tp, (d+1)*K/tp)
    that a row-parallel matmul's local activations cover. This rebuilds
    the packed/absmax arrays so each device's slice is a self-consistent
    local planar pack of its contiguous K range. Sharding specs are
    unchanged (P(axis, None) / P(None, axis, None)).
    """
    import jax.numpy as jnp

    N, K = qw.shape
    bs = qw.blocksize
    Kd = K // tp
    if Kd % (2 * bs) != 0:
        raise ValueError(f"K/tp ({Kd}) must be divisible by 2*blocksize ({2 * bs})")
    hi = (qw.packed >> 4).astype(jnp.uint8)  # elements [0, K/2), (K/2, N)
    lo = (qw.packed & 0xF).astype(jnp.uint8)  # elements [K/2, K)
    codes = jnp.concatenate([hi, lo], axis=0)  # (K, N) element-ordered
    amax = qw.scales_f32().reshape(K // bs, N)  # block-ordered along K
    packs, amaxs = [], []
    for d in range(tp):
        cd = codes[d * Kd : (d + 1) * Kd]
        packs.append((cd[: Kd // 2] << 4 | cd[Kd // 2 :]).astype(jnp.uint8))
        amaxs.append(amax[d * Kd // bs : (d + 1) * Kd // bs].reshape(2, Kd // (2 * bs), N))
    # bf16-stored scales round-trip exactly (scales_f32 is a widening cast)
    new_amax = jnp.concatenate(amaxs, axis=1).astype(qw.absmax.dtype if not qw.compressed else jnp.float32)
    am_scale = am_offset = None
    if qw.compressed:
        # re-encode against the retiled plane grouping: the per-(plane,
        # column) stats are computed over the GLOBAL dim-1 range, so they
        # replicate across row shards and every device decodes its slice
        # with the same sidecars (one extra half-step of scale noise)
        from ..ops.common import compress_absmax

        new_amax, am_scale, am_offset = compress_absmax(new_amax)
    return QLinearWeight(
        packed=jnp.concatenate(packs, axis=0),
        absmax=new_amax,
        shape=(N, K),
        blocksize=bs,
        quant_type=qw.quant_type,
        dtype=qw.dtype,
        absmax_scale=am_scale,
        absmax_offset=am_offset,
    )
