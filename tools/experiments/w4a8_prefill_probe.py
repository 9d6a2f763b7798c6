#!/usr/bin/env python
"""W4A8 at prefill M with coarse blocksizes (run on the real TPU).

Round-2 closed decode (bs=128 W4A8 beats bf16 at M=8) and round-3 closed
large-M prefill (m-tiles + dequant-to-HBM), leaving M=256 at ~0.56x. The
remaining hypothesis: at M=256 the W4A8 sub-dot K equals the quantization
blocksize, so bs=256 turns each sub-dot into a 256x256x256 MXU tile —
possibly closing the gap at LLM.int8-class accuracy. This probe measures
bf16 vs exact-NF4 vs W4A8 x blocksize {64,128,256} at M in {64, 256}.
Methodology = tools/microbench.py.
"""

import sys
import timeit

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bitsandbytes_sycl_tpu.ops import matmul_4bit_fused, matmul_4bit_w4a8, quantize_4bit_native

N = K = 4096
LO_ITERS, HI_ITERS, REPS = 100, 600, 4


def measure(op, x):
    def runner(iters):
        @jax.jit
        def rr(x):
            def body(i, x):
                return op(x)[:, :K].astype(x.dtype) * 1e-3 + x

            return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32))

        np.asarray(rr(x))
        return min(
            timeit.timeit(lambda: np.asarray(rr(x)), number=1) for _ in range(REPS)
        )

    return (runner(HI_ITERS) - runner(LO_ITERS)) / (HI_ITERS - LO_ITERS)


def main():
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(N, K)) * 0.02, jnp.float32)
    Wb = W.astype(jnp.bfloat16)
    qws = {bs: quantize_4bit_native(W, blocksize=bs, quant_type="nf4") for bs in (64, 128, 256)}

    for M in (64, 256):
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        t_bf16 = measure(lambda x: x @ Wb.T, x)
        print(f"M={M} bf16 matmul       {t_bf16*1e6:9.2f} us  1.00x")
        t = measure(lambda x: matmul_4bit_fused(x, qws[64]), x)
        print(f"M={M} nf4 exact bs=64   {t*1e6:9.2f} us  {t_bf16/t:5.2f}x")
        for bs in (64, 128, 256):
            t = measure(lambda x, q=qws[bs]: matmul_4bit_w4a8(x, q), x)
            print(f"M={M} W4A8 bs={bs:<4}     {t*1e6:9.2f} us  {t_bf16/t:5.2f}x")


if __name__ == "__main__":
    main()
