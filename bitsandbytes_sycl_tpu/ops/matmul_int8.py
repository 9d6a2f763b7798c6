"""Fused LLM.int8() matmul Pallas kernel.

The reference's LLM.int8 forward is ~8 separate kernel launches
(autograd/_functions.py:292-434: cget_col_row_stats -> cdouble_rowcol_quant
-> ctransform_row2col32 -> cigemmlt_turing_32 -> cdequant_mm_int32_fp16 +
torch fp16 sidecar), each a full HBM round-trip. Here the whole chain is
ONE kernel:

- activation int8 quantization happens in VMEM per tile (the row absmax is
  a cheap XLA reduction over the tiny activation matrix; the quantized CA
  is never materialized in HBM — reference kernel N6 writes both CA and
  CAt to global memory),
- the int8 x int8 -> int32 dot runs on the MXU with an int32 VMEM
  accumulator (reference: oneDNN matmul on a col32/col_ampere layout,
  op_gemm.cpp:541-655 — no layout zoo here, plain row-major),
- the dequant epilogue (row absmax x per-row weight scale / 127^2 + bias,
  reference kernel_quant.cpp:3848-3990 kdequant_mm_int32_fp16) is fused at
  the last K step, so the (M, N) int32 tile never leaves VMEM.

The fp16 outlier sidecar (threshold > 0) stays outside the kernel: it is a
(M, budget) x (budget, N) matmul over <=64 gathered columns — sub-1% of
the main dot's FLOPs — handled in functional.llm_int8_matmul.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_mode, pick_tile as _pick_tile, safe_inv

__all__ = ["int8_matmul_fused"]


def _mm8_kernel(
    x_ref, inv_ref, w_ref, scb_ref, bias_ref, o_ref, acc_ref,
    *, nk, out_dtype, has_bias,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # quantize the activation tile in VMEM: CA = round(x * 127/absmax)
    xq = jnp.clip(
        jnp.round(x_ref[:].astype(jnp.float32) * inv_ref[:]), -127.0, 127.0
    ).astype(jnp.int8)
    # int8 x int8 -> int32 on the MXU; weight tile is (TN, TK) row-major
    acc_ref[:] += jax.lax.dot_general(
        xq, w_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _():
        # x ~ xq / inv,  w ~ CB * SCB/127  =>  out = acc * (1/inv) * SCB/127
        scale = (1.0 / inv_ref[:]) * (scb_ref[:] * (1.0 / 127.0))
        out = acc_ref[:].astype(jnp.float32) * scale
        if has_bias:
            out = out + bias_ref[:].astype(jnp.float32)
        o_ref[:] = out.astype(out_dtype)


@partial(jax.jit, static_argnames=("out_dtype", "tm", "tn", "tk"))
def _int8_matmul_call(x, inv, CB, SCB, bias, out_dtype, tm, tn, tk):
    M, K = x.shape
    N = CB.shape[0]
    nk = K // tk
    grid = (M // tm, N // tn, nk)

    kernel = functools.partial(
        _mm8_kernel, nk=nk, out_dtype=out_dtype, has_bias=bias is not None
    )
    bias_arr = (bias if bias is not None else jnp.zeros((N,), jnp.float32)).reshape(1, N)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda m, n, k: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tk), lambda m, n, k: (n, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + N * K + M * N * 2 + M * 4 + N * 8,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(x, inv.reshape(M, 1), CB, SCB.astype(jnp.float32).reshape(1, N), bias_arr)


def int8_matmul_fused(
    x: jax.Array,
    CB: jax.Array,
    SCB: jax.Array,
    row_absmax: jax.Array,
    bias: Optional[jax.Array] = None,
    out_dtype=None,
) -> jax.Array:
    """out = dequant(quant_rowwise(x) @ CB^T) + bias, one Pallas kernel.

    x: (M, K) float; CB: (N, K) int8; SCB: (N,) per-row weight absmax;
    row_absmax: (M,) per-row activation absmax (precomputed so outlier
    masking can be applied upstream). Returns (M, N).

    Falls back to None (caller uses the jnp path) for untileable shapes.
    """
    M, K = x.shape
    N = CB.shape[0]
    out_dtype = out_dtype or jnp.result_type(x)

    # measured crossover (4096^2, v5e): M=8 fused 25us vs XLA-int8 30us /
    # bf16 48us; M=256 fused 44us vs XLA 31us (in-kernel re-quantization of
    # the x tile repeats per N-tile, so its cost grows with M while XLA
    # quantizes once). Decode/small-batch -> fused; prefill -> XLA path.
    if M == 0 or M > 128:
        return None

    tn = _pick_tile(N, (512, 256, 128))
    tk = _pick_tile(K, (1024, 512, 256, 128))
    if tn is None or tk is None:
        return None

    # rows with absmax 0 are all-zero: any inv works (xq=0); epilogue's
    # 1/inv stays finite with inv=127
    inv = jnp.where(row_absmax > 0, 127.0 * safe_inv(row_absmax), 127.0).astype(jnp.float32)

    # pad M up to ONE m-tile: the kernel re-reads the ENTIRE weight per
    # m-tile, so tile COUNT dominates at decode sizes (same finding as
    # the 4-bit kernel's r3 m-tile fix). Picking the largest DIVISOR
    # tile was the r4 "~14.5 GB HBM cliff": M=40 divided to tm=8 -> 5
    # m-tiles -> 5x the 6.7 GB int8 weight traffic per 7B step (B=40
    # repack 722 tok/s vs B=32's tm=32 single tile at 1176) — traced to
    # _int8_matmul_call at 40.9 ms/step vs its ~10 ms weight-read floor
    # (tools/experiments/hbm_cliff_probe.py trace8; dead-ballast sweeps
    # to 15.4 GB total showed NO memory effect). Padded rows are free
    # MXU work in this weight-bound regime.
    Mp = next(c for c in (8, 16, 32, 64, 128, 256) if c >= M)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
        inv = jnp.pad(inv, (0, Mp - M), constant_values=1.0)
        out = _int8_matmul_call(x, inv, CB, SCB, bias, jnp.dtype(out_dtype), Mp, tn, tk)
        return out[:M]
    return _int8_matmul_call(x, inv, CB, SCB, bias, jnp.dtype(out_dtype), Mp, tn, tk)
