#!/usr/bin/env python
"""W8A8 prefill route vs the r3 routes (run on the real TPU).

Round-3 left NF4 prefill at 0.76x (dequant-to-bf16-HBM + dense bf16
matmul). Hypothesis (VERDICT r3 item 1): decode the nibbles ONCE to int8
codes (half the write bytes) and run ONE dense int8-MXU GEMM (2x the
bf16 rate) with the blockwise scales collapsed per output column — the
regrid error is bounded far inside NF4's own grid error.

Measures at 4096x4096 (and optionally 11008x4096): bf16 matmul, the
routed exact path (matmul_4bit_fused: m-tiles or dequant-to-HBM), and
matmul_4bit_w8a8_prefill, for M in {256, 512, 1024, 2048, 4096}.

Methodology: tools/microbench.py scalar-return harness; the WEIGHT is
made loop-variant (absmax * (1 + 1e-30*i)) so the weight-only dequant
pallas_call cannot be hoisted/CSE'd out of the timing loop (CLAUDE.md).
"""

import dataclasses
import sys
import timeit

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bitsandbytes_sycl_tpu.ops import (
    matmul_4bit_fused,
    matmul_4bit_w8a8_prefill,
    quantize_4bit_native,
)

N = K = 4096
REPS = 4


def measure(op, x, qw, iters_pair):
    lo, hi = iters_pair

    def runner(iters):
        @jax.jit
        def rr(x, qw):
            def body(i, x):
                w = (
                    dataclasses.replace(
                        qw, absmax=qw.absmax * (1.0 + 1e-30 * i.astype(jnp.float32))
                    )
                    if qw is not None
                    else None
                )
                return op(x, w)[:, :K].astype(x.dtype) * 1e-3 + x

            return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32))

        np.asarray(rr(x, qw))
        return min(
            timeit.timeit(lambda: np.asarray(rr(x, qw)), number=1) for _ in range(REPS)
        )

    return (runner(hi) - runner(lo)) / (hi - lo)


def main():
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(N, K)) * 0.02, jnp.float32)
    Wb = W.astype(jnp.bfloat16)
    quant_types = sys.argv[1].split(",") if len(sys.argv) > 1 else ["nf4"]
    ms = [int(v) for v in sys.argv[2].split(",")] if len(sys.argv) > 2 else [256, 512, 1024, 2048, 4096]
    qws = {qt: quantize_4bit_native(W, blocksize=64, quant_type=qt) for qt in quant_types}

    # one-time correctness spot check on device
    x0 = jnp.asarray(rng.normal(size=(64, K)), jnp.bfloat16)
    for qt in quant_types:
        out = np.asarray(matmul_4bit_w8a8_prefill(x0, qws[qt]).astype(jnp.float32))
        ref = np.asarray(
            jnp.matmul(x0.astype(jnp.float32), qws[qt].dequantize().astype(jnp.float32).T)
        )
        rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
        print(f"[check] {qt} w8a8 rel err vs stored codes: {rel:.4f}", flush=True)

    for M in ms:
        iters = (20, 120) if M >= 2048 else (50, 300)
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        t_bf16 = measure(lambda x, w: x @ Wb.T, x, None, iters)
        print(f"M={M:5d} bf16 matmul   {t_bf16*1e6:9.2f} us  1.00x", flush=True)
        for qt in quant_types:
            t = measure(lambda x, w: matmul_4bit_fused(x, w), x, qws[qt], iters)
            print(f"M={M:5d} {qt} exact     {t*1e6:9.2f} us  {t_bf16/t:5.2f}x", flush=True)
            t = measure(lambda x, w: matmul_4bit_w8a8_prefill(x, w), x, qws[qt], iters)
            print(f"M={M:5d} {qt} W8A8      {t*1e6:9.2f} us  {t_bf16/t:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
