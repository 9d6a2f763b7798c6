"""Research ops: FP8 matmul (reference parity for tests_pvc/autograd.py:436).

The reference's test imports ``bnb.research.matmul_fp8_mixed`` /
``matmul_fp8_global`` but ships NO implementation (the symbols come from
upstream bitsandbytes' research package). This module provides the TPU
build: FP8 is *simulated* through the FP8 codebooks
(codebooks.create_fp8_map) exactly like upstream — quantize through the
E4M3/E5M2 map, dequantize, then matmul. On TPU this simulated path IS the
native one: v5e has no FP8 MXU mode, the dot runs in bf16/f32 either way,
so there is no faster "real" fp8 kernel being skipped.

Semantics (upstream research/autograd/_functions.py):
- mixed:  A quantized blockwise with the forward (E4M3) map at ``bsz``,
  B per-tensor; backward quantizes grad blockwise with the backward
  (E5M2) map at ``bsz2`` for grad_A, grad_B uses the unquantized grad.
- global: A and B per-tensor with the forward map; backward quantizes
  grad per-tensor with the backward map for BOTH grads.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from . import codebooks
from . import functional as F

__all__ = ["matmul_fp8_mixed", "matmul_fp8_global", "default_fp8_codes"]


def default_fp8_codes():
    """(fw E4M3, bw E5M2) maps as in the reference test
    (tests_pvc/autograd.py:452-453)."""
    fw = jnp.asarray(codebooks.create_fp8_map(True, 4, 3, 8))
    bw = jnp.asarray(codebooks.create_fp8_map(True, 5, 2, 8))
    return fw, bw


def _q_blockwise(x, code, blocksize):
    if x.size == 0:
        return x
    q, st = F.quantize_blockwise(x, code=code, blocksize=min(blocksize, max(x.size, 1)))
    return F.dequantize_blockwise(q, st).astype(x.dtype)


def _q_global(x, code):
    if x.size == 0:
        return x
    q, (absmax, table) = F.quantize(x, code=code)
    return F.dequantize(q, absmax=absmax, code=table).astype(x.dtype)


def _resolve(fw_code, bw_code):
    if fw_code is None or bw_code is None:
        dfw, dbw = default_fp8_codes()
        fw_code = dfw if fw_code is None else fw_code
        bw_code = dbw if bw_code is None else bw_code
    return fw_code, bw_code


# --- mixed ---------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _mm_fp8_mixed(A, B, fw_code, bw_code, bsz, bsz2):
    out, _ = _fp8_fwd_mixed(A, B, fw_code, bw_code, bsz, bsz2)
    return out


def _fp8_fwd_mixed(A, B, fw_code, bw_code, bsz, bsz2):
    fA = _q_blockwise(A, fw_code, bsz)
    fB = _q_global(B, fw_code)
    out = jnp.matmul(fA, fB, preferred_element_type=jnp.float32).astype(A.dtype)
    return out, (fA, fB, fw_code, bw_code)


def _grad_b(fA, g, b_ndim):
    """Cotangent for B: a^T @ g. For a 2D weight with batched activations
    (upstream supports 3D A) the batch dims sum into the weight grad; a
    batched B keeps per-batch grads."""
    if b_ndim > 2:
        return jnp.matmul(
            jnp.swapaxes(fA, -1, -2), g, preferred_element_type=jnp.float32
        )
    k = fA.shape[-1]
    n = g.shape[-1]
    return jnp.matmul(
        fA.reshape(-1, k).T, g.reshape(-1, n), preferred_element_type=jnp.float32
    )


def _fp8_bwd_mixed(bsz, bsz2, res, g):
    fA, fB, fw_code, bw_code = res
    fg = _q_blockwise(g, bw_code, bsz2)
    grad_A = jnp.matmul(
        fg, jnp.swapaxes(fB, -1, -2), preferred_element_type=jnp.float32
    ).astype(fA.dtype)
    grad_B = _grad_b(fA, g, fB.ndim).astype(fB.dtype)
    return grad_A, grad_B, jnp.zeros_like(fw_code), jnp.zeros_like(bw_code)


_mm_fp8_mixed.defvjp(_fp8_fwd_mixed, _fp8_bwd_mixed)


def matmul_fp8_mixed(
    A: jax.Array,
    B: jax.Array,
    fw_code: Optional[jax.Array] = None,
    bw_code: Optional[jax.Array] = None,
    bsz: int = 64,
    bsz2: int = 256,
) -> jax.Array:
    """out = fp8(A) @ fp8(B); grad_A flows through an E5M2-quantized grad,
    grad_B through the raw grad (upstream "mixed" rule)."""
    fw_code, bw_code = _resolve(fw_code, bw_code)
    return _mm_fp8_mixed(A, B, fw_code, bw_code, bsz, bsz2)


# --- global --------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _mm_fp8_global(A, B, fw_code, bw_code, bsz, bsz2):
    out, _ = _fp8_fwd_global(A, B, fw_code, bw_code, bsz, bsz2)
    return out


def _fp8_fwd_global(A, B, fw_code, bw_code, bsz, bsz2):
    fA = _q_global(A, fw_code)
    fB = _q_global(B, fw_code)
    out = jnp.matmul(fA, fB, preferred_element_type=jnp.float32).astype(A.dtype)
    return out, (fA, fB, fw_code, bw_code)


def _fp8_bwd_global(bsz, bsz2, res, g):
    fA, fB, fw_code, bw_code = res
    fg = _q_global(g, bw_code)
    grad_A = jnp.matmul(
        fg, jnp.swapaxes(fB, -1, -2), preferred_element_type=jnp.float32
    ).astype(fA.dtype)
    grad_B = _grad_b(fA, fg, fB.ndim).astype(fB.dtype)
    return grad_A, grad_B, jnp.zeros_like(fw_code), jnp.zeros_like(bw_code)


_mm_fp8_global.defvjp(_fp8_fwd_global, _fp8_bwd_global)


def matmul_fp8_global(
    A: jax.Array,
    B: jax.Array,
    fw_code: Optional[jax.Array] = None,
    bw_code: Optional[jax.Array] = None,
    bsz: int = 64,
    bsz2: int = 256,
) -> jax.Array:
    fw_code, bw_code = _resolve(fw_code, bw_code)
    return _mm_fp8_global(A, B, fw_code, bw_code, bsz, bsz2)
