"""Utilities: outlier detection, serialization helpers, model surgery.

Reference: python_src_quants/utils.py (OutlierTracer :42-104,
find_outlier_dims :84, replace_linear :124, pack_dict_to_tensor :169-200).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "find_outlier_dims",
    "OutlierTracer",
    "pack_dict_to_tensor",
    "unpack_tensor_to_dict",
    "replace_linear",
]


def find_outlier_dims(
    weight: jax.Array, reduction_dim: int = 0, zscore: float = 4.0, topk: Optional[int] = None
) -> jax.Array:
    """Columns whose magnitude is a z-score outlier vs the rest
    (reference utils.py:84-104: std-based test over per-dim magnitudes).

    Returns indices if topk is set (static size, jit-friendly), else a
    boolean mask.
    """
    m = jnp.mean(jnp.abs(weight.astype(jnp.float32)), axis=reduction_dim)
    mu, std = jnp.mean(m), jnp.std(m)
    z = (m - mu) / (std + 1e-12)
    if topk is not None:
        _vals, idx = jax.lax.top_k(z, topk)
        return idx
    return z > zscore


class OutlierTracer:
    """Weight-outlier registry. The reference version hooks torch module
    forwards and hashes weights (utils.py:42-82); in a functional world we
    compute from the weight directly and memoize by array identity.
    """

    _instance: Optional["OutlierTracer"] = None

    def __init__(self):
        self.cache: Dict[int, np.ndarray] = {}

    @classmethod
    def get_instance(cls) -> "OutlierTracer":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def get_outliers(self, weight: jax.Array, zscore: float = 4.0) -> np.ndarray:
        key = id(weight)
        if key not in self.cache:
            self.cache[key] = np.asarray(find_outlier_dims(weight, zscore=zscore))
        return self.cache[key]

    def get_hvalue(self, weight: jax.Array) -> int:
        return id(weight)


def pack_dict_to_tensor(d: Dict[str, Any]) -> np.ndarray:
    """JSON-encode a dict into a uint8 array so non-tensor quantization
    metadata can ride inside safetensors state_dicts
    (reference utils.py:169-183)."""
    return np.frombuffer(json.dumps(d).encode("utf-8"), dtype=np.uint8).copy()


def unpack_tensor_to_dict(t) -> Dict[str, Any]:
    """(reference utils.py:186-200)"""
    arr = np.asarray(t, dtype=np.uint8)
    return json.loads(arr.tobytes().decode("utf-8"))


def replace_linear(
    params,
    quant_type: str = "nf4",
    blocksize: int = 64,
    compress_statistics: bool = False,
    predicate=None,
):
    """Model surgery on a parameter pytree: every 2D kernel/weight leaf is
    replaced by its quantized form — the functional analog of the
    reference's replace_linear module rewrite (utils.py:124-166).
    Alias of nn.quantize_linear_params."""
    from ..nn.modules import quantize_linear_params

    return quantize_linear_params(
        params,
        quant_type=quant_type,
        blocksize=blocksize,
        compress_statistics=compress_statistics,
        predicate=predicate,
    )
