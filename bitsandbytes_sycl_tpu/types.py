"""Core pytree types: QuantState and quantized-array containers.

TPU-first design notes
----------------------
Unlike the reference (python_src_quants/functional.py:625-798), where
QuantState is a mutable host object carrying device pointers, here quantized
tensors are **immutable pytrees**: packed integer data plus a scale pytree.
That makes them first-class citizens of jit / pjit / shard_map / optax —
they can be donated, sharded with PartitionSpecs, checkpointed with orbax,
and traced through custom_vjp, with no side effects.

Static metadata (shape, dtype, blocksize, quant_type) lives in pytree
*aux data* so jit recompiles only when the format changes, never per value.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import codebooks

__all__ = ["QuantState", "QTensor", "blocks_for"]


def blocks_for(n: int, blocksize: int) -> int:
    return (n + blocksize - 1) // blocksize


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["absmax", "code", "offset", "state2"],
    meta_fields=["shape", "dtype", "blocksize", "quant_type"],
)
@dataclasses.dataclass(frozen=True)
class QuantState:
    """Everything needed to undo a blockwise quantization.

    Mirrors the reference QuantState (functional.py:625-798) but as a frozen
    JAX pytree. `absmax` is float32 per-block scale — or uint8 codes when
    `state2` is set (nested / double quantization, functional.py:1243-1257).

    Fields
    ------
    absmax:     (n_blocks,) float32, or uint8 when nested.
    code:       the codebook, (256,) or (16,) float32, in code order.
    offset:     nested only — scalar f32 mean of absmax removed before
                requantization.
    state2:     nested only — QuantState of the 8-bit requantized absmax.
    shape:      original array shape (static).
    dtype:      original dtype name, e.g. "bfloat16" (static, string for
                hashability and bnb-checkpoint interop).
    blocksize:  elements per quantization block (static).
    quant_type: "nf4" | "fp4" | "int4" | "af4" | "dynamic" | "linear" |
                "fp8" | "quantile" (static).
    """

    absmax: jax.Array
    code: jax.Array
    shape: Tuple[int, ...]
    dtype: str
    blocksize: int
    quant_type: str
    offset: Optional[jax.Array] = None
    state2: Optional["QuantState"] = None

    @property
    def nested(self) -> bool:
        return self.state2 is not None

    @property
    def jdtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    def dequant_absmax(self) -> jax.Array:
        """Return float32 per-block absmax, decoding the nested level if
        present (reference: functional.py:959-963)."""
        if not self.nested:
            return self.absmax
        from . import functional as F  # local import to avoid cycle

        absmax = F.dequantize_blockwise(self.absmax, self.state2)
        return (absmax + self.offset).astype(jnp.float32)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "quant_state"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class QTensor:
    """A quantized tensor: packed integer payload + its QuantState.

    `data` layout:
      - 8-bit: uint8 codes, flat (n,) in row-major order of the original.
      - 4-bit: uint8, flat (ceil(n/2),); each byte packs element 2i in the
        high nibble and 2i+1 in the low nibble (kernel_quant.cpp:1337-1348).
    """

    data: jax.Array
    quant_state: QuantState

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.quant_state.shape)

    @property
    def dtype(self) -> jnp.dtype:
        return self.quant_state.jdtype

    def dequantize(self) -> jax.Array:
        from . import functional as F

        if self.quant_state.quant_type in ("nf4", "fp4", "int4", "af4"):
            return F.dequantize_4bit(self.data, self.quant_state)
        return F.dequantize_blockwise(self.data, self.quant_state)
