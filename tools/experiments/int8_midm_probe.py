#!/usr/bin/env python
"""int8 fused-kernel vs XLA path at serving mid-M (real TPU).

The r4 serving repack routes through llm_int8_matmul, which picks the
fused Pallas kernel for M<=128 (crossover measured in r2 at M=8/256
only). The w8a8_pieces probe measured the RAW XLA dot at 1.6-2.7x bf16
for M in [48,256] — if the fused kernel is slower there, the routing
boundary needs to move. Shapes: 4096x4096 and the 7B wide projections.
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
from bitsandbytes_sycl_tpu import functional as F

REPS = 4


def measure(op, x, *arrs, iters=(50, 300)):
    lo, hi = iters

    def runner(n):
        @jax.jit
        def rr(x, *arrs):
            def body(i, x):
                y = op(x * (1.0 + 1e-30 * i.astype(x.dtype)), *arrs)
                K = x.shape[1]
                N = y.shape[1]
                c = -(-N // K)
                yp = jnp.pad(y.astype(jnp.float32), ((0, 0), (0, c * K - N))) if c * K != N else y.astype(jnp.float32)
                return x + yp.reshape(x.shape[0], c, K).sum(axis=1).astype(x.dtype) * 1e-4

            return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

        np.asarray(rr(x, *arrs))
        return min(timeit.timeit(lambda: np.asarray(rr(x, *arrs)), number=1) for _ in range(REPS))

    return (runner(hi) - runner(lo)) / (hi - lo)


def main():
    rng = np.random.default_rng(0)
    shapes = [(4096, 4096), (11008, 4096), (4096, 11008), (32000, 4096)]
    ms = [int(v) for v in sys.argv[1].split(",")] if len(sys.argv) > 1 else [32, 48, 64, 128]
    for (N, K) in shapes:
        W = jnp.asarray(rng.normal(size=(N, K)) * 0.02, jnp.float32)
        CB, SCB = F.int8_vectorwise_quant(W)
        Wb = W.astype(jnp.bfloat16)
        for M in ms:
            x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
            t_bf = measure(lambda x, w: x @ w.T, x, Wb)
            t_f = measure(
                lambda x, cb, scb: F.llm_int8_matmul(x, cb, scb, threshold=0.0, use_fused=True),
                x, CB, SCB)
            t_x = measure(
                lambda x, cb, scb: F.llm_int8_matmul(x, cb, scb, threshold=0.0, use_fused=False),
                x, CB, SCB)
            print(f"{N}x{K} M={M:4d}: bf16 {t_bf*1e6:7.1f}  fused {t_f*1e6:7.1f} "
                  f"({t_bf/t_f:4.2f}x)  xla {t_x*1e6:7.1f} ({t_bf/t_x:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
