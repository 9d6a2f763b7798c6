"""Differentiable quantized matmuls via jax.custom_vjp.

TPU-native replacement for the reference's torch.autograd layer
(python_src_quants/autograd/_functions.py): MatMul8bitLt -> `matmul`,
MatMul4Bit -> `matmul_4bit`. There is no MatmulLtState mutation — weight
quantization state is an explicit argument (a pytree), and the whole
forward is one jitted computation instead of ~8 kernel launches.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import functional as F
from .types import QuantState

__all__ = ["matmul", "matmul_4bit", "matmul_8bit_lt"]


def _zero_cotangent(x):
    """Zero cotangent for a (possibly integer-dtype) pytree: float0 for
    integer leaves per JAX's custom_vjp contract, zeros otherwise."""
    def leaf(a):
        if jnp.issubdtype(jnp.result_type(a), jnp.inexact):
            return jnp.zeros_like(a)
        return np.zeros(jnp.shape(a), dtype=jax.dtypes.float0)

    return jax.tree_util.tree_map(leaf, x)


# ---------------------------------------------------------------------------
# LLM.int8(): y = A @ dequant(CB)^T + outlier sidecar; backward matches the
# reference's grad_A = g @ dequant(CB) (autograd/_functions.py:436-483)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def matmul_8bit_lt(A, CB, SCB, threshold=6.0, bias=None, outliers=None):
    return F.llm_int8_matmul(A, CB, SCB, threshold=threshold, bias=bias, outliers=outliers)


def _mm8_fwd(A, CB, SCB, threshold, bias, outliers):
    out = F.llm_int8_matmul(A, CB, SCB, threshold=threshold, bias=bias, outliers=outliers)
    return out, (A, CB, SCB, bias, outliers)


def _mm8_bwd(threshold, res, g):
    A, CB, SCB, bias, outliers = res
    g2 = g.reshape(-1, g.shape[-1])
    # grad_A = g @ dequant(CB). The reference quantizes g to int8 first
    # (autograd/_functions.py:455,465-473); we keep full precision for the
    # cotangent — strictly more accurate, same cost class on the MXU.
    W = CB.astype(jnp.float32) * (SCB.astype(jnp.float32)[:, None] / 127.0)
    grad_A = jnp.matmul(g2.astype(jnp.float32), W).reshape(A.shape).astype(A.dtype)
    grad_bias = None if bias is None else g2.sum(0).astype(bias.dtype)
    return grad_A, _zero_cotangent(CB), jnp.zeros_like(SCB), grad_bias, _zero_cotangent(outliers)


matmul_8bit_lt.defvjp(_mm8_fwd, _mm8_bwd)


# ---------------------------------------------------------------------------
# 4-bit: y = A @ dequant(W)^T; grad_A = g @ dequant(W)
# (autograd/_functions.py:490-540 MatMul4Bit)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _matmul_4bit_vjp(A, data, quant_state, bias):
    return F.matmul_4bit_ref(A, data, quant_state, bias)


def _mm4_fwd(A, data, quant_state, bias):
    out = F.matmul_4bit_ref(A, data, quant_state, bias)
    # zero-size carrier keeps A's dtype in the residuals without keeping A
    return out, (data, quant_state, bias, jnp.zeros((0,), A.dtype))


def _mm4_bwd(res, g):
    data, quant_state, bias, a_dtype_carrier = res
    W = F.dequantize_4bit(data, quant_state).astype(g.dtype)
    grad_A = jnp.matmul(g, W, preferred_element_type=jnp.float32).astype(
        a_dtype_carrier.dtype
    )
    grad_bias = None if bias is None else g.reshape(-1, g.shape[-1]).sum(0).astype(bias.dtype)
    return grad_A, _zero_cotangent(data), _zero_cotangent(quant_state), grad_bias


_matmul_4bit_vjp.defvjp(_mm4_fwd, _mm4_bwd)


def matmul_4bit(
    A: jax.Array,
    data: jax.Array,
    quant_state: QuantState,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Differentiable 4-bit weight-only matmul. The packed weight has
    logical shape (out, in) like a bnb Linear4bit weight; computes
    A @ W^T + bias. Gradients flow to A (and bias) only — quantized
    weights are frozen, like the reference (grad_B unsupported,
    _functions.py:536).

    Concrete (non-traced) weights auto-route to the fused Pallas kernel
    via a cached one-time repack, mirroring the reference's batch-1
    dispatch to gemv_4bit (_functions.py:565-575) but for every batch
    size; matmul_4bit_kernel's custom_vjp keeps it differentiable in A."""
    qw = F._route_fused_4bit(A, data, quant_state)
    if qw is not None:
        return matmul_4bit_kernel(A, qw, bias)
    return _matmul_4bit_vjp(A, data, quant_state, bias)


@dataclasses.dataclass
class MatmulLtState:
    """Compat shim for the reference's per-layer weight-cache state
    (autograd/_functions.py:246-285). Here it is a plain immutable value:
    no CxB/SB/tile bookkeeping exists because TPU has no tiled layouts,
    and quantization is explicit rather than cached-on-first-forward."""

    CB: Optional[jax.Array] = None  # int8 (N, K)
    SCB: Optional[jax.Array] = None  # f32 (N,)
    threshold: float = 0.0
    has_fp16_weights: bool = True
    use_pool: bool = False

    def reset_grads(self):
        return None


def matmul(
    A: jax.Array,
    B: jax.Array,
    SCB: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    threshold: float = 0.0,
    state: Optional[MatmulLtState] = None,
) -> jax.Array:
    """bnb.matmul equivalent — LLM.int8() linear (reference
    autograd/_functions.py:543-554).

    Forms:
      matmul(A, CB, SCB, ...)            pre-quantized int8 weight
      matmul(A, W, threshold=...)        fp weight, trainable (int8 fwd)
      matmul(A, None, state=state, ...)  reference-style state object
    """
    if state is not None:
        if state.has_fp16_weights:
            return matmul_8bit_train(A, B, state.threshold, bias)
        return matmul_8bit_lt(A, state.CB, state.SCB, state.threshold, bias)
    if SCB is None:
        return matmul_8bit_train(A, B, threshold, bias)
    return matmul_8bit_lt(A, B, SCB, threshold, bias)


# ---------------------------------------------------------------------------
# LLM.int8() with trainable fp weights (has_fp16_weights=True): the int8
# forward is a quantized surrogate; gradients flow to W like the reference's
# training mode (autograd/_functions.py:341-360, 436-483)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def matmul_8bit_train(A, W, threshold=0.0, bias=None):
    CB, SCB = F.int8_vectorwise_quant(W)
    return F.llm_int8_matmul(A, CB, SCB, threshold=threshold, bias=bias)


def _mm8t_fwd(A, W, threshold, bias):
    CB, SCB = F.int8_vectorwise_quant(W)
    out = F.llm_int8_matmul(A, CB, SCB, threshold=threshold, bias=bias)
    return out, (A, W, bias)


def _mm8t_bwd(threshold, res, g):
    A, W, bias = res
    g2 = g.reshape(-1, g.shape[-1]).astype(jnp.float32)
    A2 = A.reshape(-1, A.shape[-1]).astype(jnp.float32)
    grad_A = jnp.matmul(g2, W.astype(jnp.float32)).reshape(A.shape).astype(A.dtype)
    grad_W = jnp.matmul(g2.T, A2).astype(W.dtype)
    grad_bias = None if bias is None else g2.sum(0).astype(bias.dtype)
    return grad_A, grad_W, grad_bias


matmul_8bit_train.defvjp(_mm8t_fwd, _mm8t_bwd)


# ---------------------------------------------------------------------------
# fused-kernel 4-bit matmul (QLinearWeight layout, Pallas on TPU)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def matmul_4bit_kernel(A, w, bias):
    from .ops import matmul_4bit_fused

    return matmul_4bit_fused(A, w, bias, compute_dtype=jnp.result_type(A))


def _mm4k_fwd(A, w, bias):
    from .ops import matmul_4bit_fused

    out = matmul_4bit_fused(A, w, bias, compute_dtype=jnp.result_type(A))
    return out, (w, bias, jnp.zeros((0,), A.dtype))


def _mm4k_bwd(res, g):
    w, bias, a_dtype_carrier = res
    Wd = w.dequantize().astype(g.dtype)  # (N, K)
    grad_A = jnp.matmul(g, Wd, preferred_element_type=jnp.float32).astype(a_dtype_carrier.dtype)
    grad_bias = None if bias is None else g.reshape(-1, g.shape[-1]).sum(0).astype(bias.dtype)
    return grad_A, _zero_cotangent(w), grad_bias


matmul_4bit_kernel.defvjp(_mm4k_fwd, _mm4k_bwd)


# ---------------------------------------------------------------------------
# legacy vectorwise int8 matmul — MatMul8bit / matmul_cublas
# (reference autograd/_functions.py:107-210, 543-554)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def matmul_cublas(A, B, quant_type="vector"):
    """Legacy int8 matmul: quantize A per-row and B per-col vectorwise,
    int8 dot, rescale — forward of the reference MatMul8bit. Backward is
    full precision (the reference quantizes grads too; we keep the same
    contract with tighter numerics)."""
    return _legacy_int8_mm(A, B, quant_type)


def _legacy_int8_mm(A, B, quant_type):
    from . import legacy as L

    qA, sA = L.vectorwise_quant(A, dim=A.ndim - 1, quant_type=quant_type)
    qB, sB = L.vectorwise_quant(B, dim=0, quant_type=quant_type)
    i32 = jax.lax.dot_general(
        qA, qB, (((A.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = i32.astype(jnp.float32) * (sA * sB) / (127.0 * 127.0)
    return out.astype(jnp.result_type(A))


def _mmc_fwd(A, B, quant_type):
    return _legacy_int8_mm(A, B, quant_type), (A, B)


def _mmc_bwd(quant_type, res, g):
    A, B = res
    gf = g.astype(jnp.float32)
    grad_A = jnp.matmul(gf, B.astype(jnp.float32).T).astype(A.dtype)
    ga2 = gf.reshape(-1, gf.shape[-1])
    A2 = A.reshape(-1, A.shape[-1]).astype(jnp.float32)
    grad_B = jnp.matmul(A2.T, ga2).astype(B.dtype)
    return grad_A, grad_B


matmul_cublas.defvjp(_mmc_fwd, _mmc_bwd)


def mm_cublas(A, B, quant_type="vector"):
    return matmul_cublas(A, B, quant_type)


def bmm_cublas(A, B, quant_type="vector"):
    """Batched legacy int8 matmul (reference __init__.py exports bmm_cublas)."""
    assert A.ndim == 3 and B.ndim == 3
    return jax.vmap(lambda a, b: matmul_cublas(a, b, quant_type))(A, B)


class GlobalOutlierPooler:
    """Tracks outlier feature indices across layers of one model
    (reference autograd/_functions.py:29-55)."""

    _instance = None

    def __init__(self):
        self.outliers = set()
        self.model_dim = None

    @classmethod
    def get_instance(cls):
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def initialize(self):
        self.outliers = set()
        self.model_dim = None

    def add_outliers(self, outlier_idx, feature_dim):
        if self.model_dim is None:
            self.model_dim = feature_dim
        if feature_dim != self.model_dim:
            return  # second FFN matrix — wrong dim, per the reference
        self.outliers.update(np.asarray(outlier_idx).tolist())

    def get_current_outlier_idx(self):
        return jnp.asarray(sorted(self.outliers), jnp.int32)


def get_inverse_transform_indices(transform_tile, tile_size):
    """Index permutation that undoes an arbitrary tiled layout transform
    (reference autograd/_functions.py:58-86). On TPU layouts are identity
    so this is only useful for importing GPU-tiled checkpoints."""
    d1, d2 = tile_size
    assert d1 * d2 < 2**31
    tile_indices = np.arange(d1 * d2, dtype=np.int32).reshape(d1, d2)
    permuted = np.asarray(transform_tile(jnp.asarray(tile_indices))).reshape(-1)
    inverse = np.empty_like(permuted)
    inverse[permuted] = np.arange(permuted.size, dtype=np.int32)
    return jnp.asarray(inverse.reshape(d1, d2))


def undo_layout(permuted_tensor: jax.Array, tile_indices: jax.Array) -> jax.Array:
    """Restore row-major order from a tiled layout: gather by the inverse
    permutation from get_inverse_transform_indices
    (reference autograd/_functions.py:89-104)."""
    flat = permuted_tensor.reshape(-1)
    return flat[tile_indices.reshape(-1)].reshape(permuted_tensor.shape)
