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
    # packed is (K//2, N); absmax is (2, K//(2*bs), N)
    if dim == "col":
        return P(None, axis), P(None, None, axis)
    if dim == "row":
        return P(axis, None), P(None, axis, None)
    if dim == "replicated":
        return P(), P()
    raise ValueError(dim)


def qweight_pspec(qw: QLinearWeight, dim: str, axis: str = "model") -> QLinearWeight:
    """PartitionSpec pytree shaped like `qw` (same static metadata, spec
    leaves) — usable directly as a shard_map in_spec.

    dim="col": shard output features N (column-parallel linear).
    dim="row": shard input features K (row-parallel linear).
    dim="replicated": no sharding.
    """
    import dataclasses

    p_packed, p_absmax = _dim_specs(dim, axis)
    return dataclasses.replace(qw, packed=p_packed, absmax=p_absmax)


def qweight_sharding(
    qw: QLinearWeight, mesh: Mesh, dim: str, axis: str = "model"
) -> QLinearWeight:
    import dataclasses

    p_packed, p_absmax = _dim_specs(dim, axis)
    return dataclasses.replace(
        qw, packed=NamedSharding(mesh, p_packed), absmax=NamedSharding(mesh, p_absmax)
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
