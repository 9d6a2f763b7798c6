#!/usr/bin/env python
"""Headline benchmark: fused NF4 dequant-matmul decode throughput relative
to the bf16 matmul roofline on one chip (BASELINE.md target: >=90% of
fp16-matmul-roofline tokens/s for 4-bit decode).

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = bf16_matmul_time / fused_nf4_time for a 4096x4096 decode
               step at batch 8 (i.e. NF4 tokens/s as a fraction of the
               fp16-roofline tokens/s; 1.0 = parity, 3.56 = ideal 4-bit).
vs_baseline  = value / 0.90 (the north-star threshold).

Methodology: the axon tunnel adds ~25ms per dispatch and the chip is
shared, so each op is timed as min-over-reps of (t(hi_iters) -
t(lo_iters)) / (hi - lo) with the op chained inside one jitted
lax.fori_loop — pure device time, no dispatch overhead, robust to noise.
"""

import json
import sys
import timeit

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bitsandbytes_sycl_tpu.ops import matmul_4bit_fused, quantize_4bit_native

N = K = 4096
M = 8
# work must dwarf the ~25ms tunnel dispatch jitter: 2000 iters ~ 100-200ms
LO_ITERS, HI_ITERS, REPS = 200, 2000, 5


def measure(op, x):
    def runner(iters):
        @jax.jit
        def rr(x):
            def body(i, x):
                return op(x)[:, :K] * 1e-3 + x

            return jax.lax.fori_loop(0, iters, body, x)

        rr(x).block_until_ready()
        return min(
            timeit.timeit(lambda: rr(x).block_until_ready(), number=1) for _ in range(REPS)
        )

    return (runner(HI_ITERS) - runner(LO_ITERS)) / (HI_ITERS - LO_ITERS)


def main():
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(N, K)) * 0.02, jnp.float32)
    qw = quantize_4bit_native(W, blocksize=64, quant_type="nf4")
    Wb = W.astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)

    t_bf16 = measure(lambda x: x @ Wb.T, x)
    t_nf4 = measure(lambda x: matmul_4bit_fused(x, qw), x)

    value = t_bf16 / t_nf4
    print(
        json.dumps(
            {
                "metric": "nf4_fused_decode_speed_vs_bf16_matmul_4096",
                "value": round(float(value), 4),
                "unit": "x (1.0=bf16 parity, 3.56=ideal 4-bit)",
                "vs_baseline": round(float(value) / 0.90, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
