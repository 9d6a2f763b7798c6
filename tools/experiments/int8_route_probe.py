#!/usr/bin/env python
"""Fused int8 kernel vs XLA int8-dot path at repack-serving M (r5).

r4 fact: XLA's plain int8 dot + fused epilogue is the fast path for
W8A8 at every M>=32 — but llm_int8_matmul dispatches the FUSED Pallas
kernel for all M<=128. Post m-tile fix, which wins at M in 40..128 on
the three 7B projection shapes?"""
import sys, timeit
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
import bitsandbytes_sycl_tpu.functional as F

def measure(op, x, CB, SCB, lo=100, hi=600, reps=5):
    K = x.shape[1]
    def runner(iters):
        @jax.jit
        def rr(x, CB, SCB):
            def body(i, x):
                y = op(x, (CB.astype(jnp.int32) + (i * jnp.int32(0))).astype(jnp.int8), SCB)
                N = y.shape[1]
                c = -(-N // K)
                yp = jnp.pad(y, ((0, 0), (0, c * K - N))) if c * K != N else y
                return x + yp.reshape(x.shape[0], c, K).sum(axis=1).astype(x.dtype) * 1e-4
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32))
        np.asarray(rr(x, CB, SCB))
        return min(timeit.timeit(lambda: np.asarray(rr(x, CB, SCB)), number=1) for _ in range(reps))
    return (runner(hi) - runner(lo)) / (hi - lo)

for (N, K) in ((4096, 4096), (11008, 4096), (4096, 11008)):
    kw = jax.random.PRNGKey(0)
    W = jax.random.normal(kw, (N, K), jnp.float32) * 0.02
    CB, SCB = F.int8_vectorwise_quant(W)
    for M in (40, 48, 64, 96, 128):
        x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.float32)
        tf = measure(lambda x, cb, scb: F.llm_int8_matmul(x, cb, scb, threshold=0.0, use_fused=True), x, CB, SCB)
        tx = measure(lambda x, cb, scb: F.llm_int8_matmul(x, cb, scb, threshold=0.0, use_fused=False), x, CB, SCB)
        print(f"{N}x{K} M={M:4d} fused {tf*1e6:8.2f} us   xla {tx*1e6:8.2f} us   fused/xla {tf/tx:5.2f}", flush=True)
