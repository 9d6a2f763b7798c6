"""Legacy / auxiliary op surface for drop-in parity with the reference.

Covers the reference components the modern TPU path doesn't need but a
migrating user may call (SURVEY.md §2 rows P3g, P3h, parts of P3e/P4):

- vectorwise_* quantization family (functional.py:2786-2911) — the
  pure-torch helpers behind the legacy MatMul8bit autograd fn;
- igemm / batched_igemm (functional.py:2063-2257) — int8 GEMM with
  cuBLAS transpose gymnastics replaced by plain dot_general;
- COO/CSR/CSC sparse containers + spmm_coo / spmm_coo_very_sparse
  (functional.py:2438-2507, 2656-2783);
- layout `transform` / extract_outliers (functional.py:2607-2653,
  2914-2936): col32/col_turing/col_ampere exist only to feed cublasLt,
  so on TPU `transform` implements the dtype/transpose semantics and
  treats every tiled order as row-major;
- paged-memory API (functional.py:111-245): CUDA unified memory has no
  TPU analog; get_paged returns ordinary arrays, prefetch is a no-op.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import functional as F

__all__ = [
    "vectorwise_quant",
    "vectorwise_dequant",
    "vectorwise_mm_dequant",
    "dequant_min_max",
    "igemm",
    "batched_igemm",
    "COOSparseTensor",
    "CSRSparseTensor",
    "CSCSparseTensor",
    "coo2csr",
    "coo2csc",
    "coo_zeros",
    "spmm_coo",
    "spmm_coo_very_sparse",
    "transform",
    "extract_outliers",
    "GlobalPageManager",
    "get_paged",
    "prefetch_tensor",
    "fill",
    "arange",
    "_mul",
]


# ---------------------------------------------------------------------------
# vectorwise quantization family (reference functional.py:2786-2911)
# ---------------------------------------------------------------------------


def vectorwise_quant(x: jax.Array, dim: int = 0, quant_type: str = "vector"):
    """Returns (int8 codes, scale). quant_type:
    linear (whole tensor) | vector (per-dim absmax) | row |
    zeropoint / vector-zeropoint (asymmetric) | truncated-vector.
    """
    xf = x.astype(jnp.float32)
    if quant_type == "linear":
        maxv = jnp.max(jnp.abs(xf))
        xq = jnp.clip(jnp.round(xf / maxv * 127), -127, 127).astype(jnp.int8)
        return xq, maxv
    if quant_type in ("vector", "row"):
        maxv = jnp.max(jnp.abs(xf), axis=dim, keepdims=True)
        xq = jnp.clip(jnp.round(xf * (127.0 * F._safe_inv(maxv))), -127, 127).astype(jnp.int8)
        return xq, maxv
    if quant_type == "truncated-vector":
        absx = jnp.abs(xf)
        maxv = jnp.quantile(absx, 0.96, axis=dim, keepdims=True)
        xq = jnp.clip(jnp.round(xf * (127.0 * F._safe_inv(maxv))), -127, 127).astype(jnp.int8)
        return xq, maxv
    if quant_type in ("zeropoint", "vector-zeropoint"):
        if quant_type == "zeropoint":
            dyna = jnp.max(xf) - jnp.min(xf)
            minv = jnp.min(xf)
        else:
            dyna = jnp.max(xf, axis=dim, keepdims=True) - jnp.min(xf, axis=dim, keepdims=True)
            minv = jnp.min(xf, axis=dim, keepdims=True)
        dyna = jnp.where(dyna == 0, 1.0, dyna)
        qx = 255.0 / dyna
        zpx = jnp.round(minv * qx) - 128
        xq = jnp.clip(jnp.round(xf * qx + zpx) - zpx - 128, -128, 127).astype(jnp.int8)
        # return scale in the same (value, zeropoint-fused) convention
        return xq, (qx, zpx)
    raise ValueError(f"unknown quant_type {quant_type!r}")


def vectorwise_dequant(xq: jax.Array, max1, quant_type: str = "vector") -> jax.Array:
    if quant_type == "vector":
        return xq.astype(jnp.float32) * max1 / 127.0
    if quant_type == "linear":
        return xq.astype(jnp.float32) * max1 / 127.0
    raise ValueError(quant_type)


def vectorwise_mm_dequant(xq: jax.Array, S1, S2, dtype=jnp.bfloat16, quant_type: str = "vector"):
    """Dequantize an int32 matmul result with per-row S1 and per-col S2
    scales (reference functional.py:2841-2898, 'vector' path)."""
    if quant_type == "vector":
        x = xq.astype(jnp.float32) * (S1 * S2) / (127.0 * 127.0)
        return x.astype(dtype)
    raise ValueError(quant_type)


def dequant_min_max(xq, A, B, SA, SB, dtype=jnp.bfloat16):
    """(reference functional.py:2900-2911) zeropoint variant epilogue."""
    offset = B.astype(jnp.float32).sum(0) * (SA[0] + SA[1])
    x = xq.astype(jnp.float32) * SB[0] * SA[0] / (127 * 127)
    return (x + offset).astype(dtype)


# ---------------------------------------------------------------------------
# int8 GEMM (reference functional.py:2063-2257). No transpose gymnastics:
# XLA/Mosaic pick layouts.
# ---------------------------------------------------------------------------


def igemm(A: jax.Array, B: jax.Array, out: Optional[jax.Array] = None) -> jax.Array:
    """int8 matmul -> int32.

    2D: (M,K)x(K,N). 3D x 3D with matching batch: the reference reduces
    einsum 'bsi,bso->io' (test_matmulqlt.py:194-204): A (B,S,I), B (B,S,O)
    -> (I,O) summing over batch and sequence.
    """
    if A.ndim == 3 and B.ndim == 3:
        return jnp.einsum(
            "bsi,bso->io", A.astype(jnp.int32), B.astype(jnp.int32),
            preferred_element_type=jnp.int32,
        )
    return jax.lax.dot_general(
        A, B, (((A.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def batched_igemm(A: jax.Array, B: jax.Array) -> jax.Array:
    """Batched int8 bmm -> int32 (reference functional.py:2223-2257)."""
    assert A.ndim == 3 and B.ndim == 3
    return jax.lax.dot_general(
        A, B, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
    )


# ---------------------------------------------------------------------------
# sparse containers + spmm (reference functional.py:2438-2507, 2656-2783).
# Fixed-capacity COO: nnz is static (jit-compatible); padding rows carry
# val=0 so scatter-adds are harmless.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class COOSparseTensor:
    rows: int
    cols: int
    nnz: int
    rowidx: jax.Array  # (nnz,) int32
    colidx: jax.Array  # (nnz,) int32
    values: jax.Array  # (nnz,)


@dataclasses.dataclass
class CSRSparseTensor:
    rows: int
    cols: int
    nnz: int
    rowptr: jax.Array  # (rows+1,)
    colidx: jax.Array
    values: jax.Array


@dataclasses.dataclass
class CSCSparseTensor:
    rows: int
    cols: int
    nnz: int
    colptr: jax.Array  # (cols+1,)
    rowidx: jax.Array
    values: jax.Array


def coo_zeros(rows: int, cols: int, nnz: int, dtype=jnp.float32) -> COOSparseTensor:
    return COOSparseTensor(
        rows, cols, nnz,
        jnp.zeros((nnz,), jnp.int32), jnp.zeros((nnz,), jnp.int32), jnp.zeros((nnz,), dtype),
    )


def coo2csr(coo: COOSparseTensor) -> CSRSparseTensor:
    order = jnp.argsort(coo.rowidx)
    rowidx = coo.rowidx[order]
    counts = jnp.zeros((coo.rows,), jnp.int32).at[rowidx].add(1)
    rowptr = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
    return CSRSparseTensor(
        coo.rows, coo.cols, coo.nnz, rowptr, coo.colidx[order], coo.values[order]
    )


def coo2csc(coo: COOSparseTensor) -> CSCSparseTensor:
    order = jnp.argsort(coo.colidx)
    colidx = coo.colidx[order]
    counts = jnp.zeros((coo.cols,), jnp.int32).at[colidx].add(1)
    colptr = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
    return CSCSparseTensor(
        coo.rows, coo.cols, coo.nnz, colptr, coo.rowidx[order], coo.values[order]
    )


def spmm_coo(coo: COOSparseTensor, B: jax.Array) -> jax.Array:
    """Sparse (rows x cols) @ dense (cols x N). On TPU random scatter
    matmuls don't map to the MXU; gather rows of B by colidx and
    segment-sum — fine at LLM.int8 outlier sparsity (<1%)."""
    gathered = B[coo.colidx] * coo.values[:, None].astype(B.dtype)
    out = jnp.zeros((coo.rows, B.shape[1]), gathered.dtype)
    return out.at[coo.rowidx].add(gathered)


def spmm_coo_very_sparse(coo: COOSparseTensor, B: jax.Array, dequant_stats=None) -> jax.Array:
    """Reference kspmm_coo_very_sparse_naive (kernel_gemm.cpp:1398-1551):
    optionally dequantizes int8 B rows with per-row stats."""
    Bf = B.astype(jnp.float32)
    if dequant_stats is not None:
        Bf = Bf * dequant_stats[:, None].astype(jnp.float32) / 127.0
    gathered = Bf[coo.colidx] * coo.values[:, None].astype(jnp.float32)
    out = jnp.zeros((coo.rows, B.shape[1]), jnp.float32)
    return out.at[coo.rowidx].add(gathered)


# ---------------------------------------------------------------------------
# layout transforms (reference functional.py:2607-2653): tiled GPU orders
# are meaningless on TPU — row/col semantics only.
# ---------------------------------------------------------------------------


def transform(
    A: jax.Array,
    to_order: str = "col32",
    from_order: str = "row",
    transpose: bool = False,
    state=None,
) -> Tuple[jax.Array, Tuple]:
    """Layout converter. On TPU all tiled orders (col32/col_turing/
    col_ampere) are identity — Mosaic manages physical tiling — so this
    keeps only the transpose semantics and returns (array, (shape, order))
    mirroring the reference's (out, state) contract."""
    out = A.T if transpose else A
    return out, (out.shape, to_order)


def extract_outliers(A: jax.Array, state, idx: jax.Array) -> jax.Array:
    """Gather outlier columns of an int8 weight (reference
    kernel_quant.cpp:3992-4056 undoes tiled layouts first; row-major here)."""
    return jnp.take(A, idx, axis=1)


# ---------------------------------------------------------------------------
# paged memory API (reference functional.py:111-245): no-op on TPU
# ---------------------------------------------------------------------------


class GlobalPageManager:
    """API-compatible stub of the CUDA unified-memory page manager
    (functional.py:111-134). XLA owns HBM; nothing to page."""

    _instance = None

    def __init__(self):
        self.paged_tensors = []

    @classmethod
    def get_instance(cls):
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def prefetch_all(self, to_cpu: bool = False) -> None:
        return None


def get_paged(*shape, dtype=jnp.float32, **kw) -> jax.Array:
    arr = jnp.zeros(shape, dtype=dtype)
    GlobalPageManager.get_instance().paged_tensors.append(arr)
    return arr


def prefetch_tensor(A: jax.Array, to_cpu: bool = False) -> None:
    return None


def fill(A: jax.Array, value) -> jax.Array:
    """(reference kernel kfunc<FILL>, kernel_quant.cpp:4057-4093).
    Functional: returns the filled array."""
    return jnp.full_like(A, value)


def arange(A: jax.Array) -> jax.Array:
    return jnp.arange(A.size, dtype=A.dtype).reshape(A.shape)


def _mul(A: jax.Array, B: jax.Array) -> jax.Array:
    return A * B
