#!/usr/bin/env python
"""Kernel-variant microbenchmark (run on the real TPU chip).

Times each op as min-over-reps of (t(hi)-t(lo))/(hi-lo) with the op chained
inside one jitted fori_loop — pure device time, robust to the ~25ms axon
dispatch jitter (same methodology as bench.py).
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
from bitsandbytes_sycl_tpu.ops import matmul_4bit_fused, matmul_4bit_w4a8, quantize_4bit_native
from bitsandbytes_sycl_tpu.ops.matmul_int8 import int8_matmul_fused

N = K = 4096
LO_ITERS, HI_ITERS, REPS = 100, 600, 4


def measure(op, x):
    """Harness rules (CLAUDE.md, round-3 lessons): full-output feedback so
    XLA cannot algebraically collapse reduce(dot); SCALAR return + np.asarray
    (block_until_ready is a no-op on axon, and shipping the carry through
    the ~35 MB/s tunnel drowns the iteration delta in transfer jitter)."""

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
    qw_nf4 = quantize_4bit_native(W, blocksize=64, quant_type="nf4")
    qw_int4 = quantize_4bit_native(W, blocksize=64, quant_type="int4")
    CB, SCB = F.int8_vectorwise_quant(W)
    Wb = W.astype(jnp.bfloat16)

    for M in (8, 256):
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        xf = x.astype(jnp.float32)
        t_bf16 = measure(lambda x: x @ Wb.T, x)
        print(f"M={M} bf16 matmul          {t_bf16 * 1e6:9.2f} us  1.00x")

        cases = [
            ("nf4 fused decode=f32 ", lambda x: matmul_4bit_fused(x, qw_nf4, decode_dtype=jnp.float32), x),
            ("nf4 fused decode=bf16", lambda x: matmul_4bit_fused(x, qw_nf4, decode_dtype=jnp.bfloat16), x),
            ("int4 fused            ", lambda x: matmul_4bit_fused(x, qw_int4), x),
            ("nf4 W4A8 int8-MXU     ", lambda x: matmul_4bit_w4a8(x, qw_nf4), x),
            ("int8 xla path         ", lambda x: F.llm_int8_matmul(x, CB, SCB, threshold=0.0, use_fused=False), x),
            ("int8 pallas fused     ", lambda x: F.llm_int8_matmul(x, CB, SCB, threshold=0.0, use_fused=True), x),
            ("int8 pallas thresh=6  ", lambda x: F.llm_int8_matmul(x, CB, SCB, threshold=6.0, use_fused=True), x),
        ]
        for name, op, inp in cases:
            try:
                t = measure(op, inp)
                print(f"M={M} {name} {t * 1e6:9.2f} us  {t_bf16 / t:5.2f}x")
            except Exception as e:  # noqa: BLE001
                print(f"M={M} {name} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__" and "--optim8" not in sys.argv:
    main()


def bench_optim8():
    """Fused Adam8bit step bandwidth at several sizes (run on TPU)."""
    from bitsandbytes_sycl_tpu import optim

    for n in (1 << 22, 1 << 24, 1 << 26):
        params = {"w": jnp.zeros((n,), jnp.float32)}
        tx = optim.adam8bit(1e-3, min_8bit_size=1024)
        st = tx.init(params)
        g = {"w": jnp.ones((n,), jnp.float32) * 1e-3}

        def step(g, st):
            upd, st2 = tx.update(g, st, params)
            return upd["w"], st2

        # warm + time: chain updates so state flows through the loop
        import timeit as _t

        jitted = jax.jit(lambda g, st: step(g, st))
        u, st2 = jitted(g, st)
        np.asarray(u)

        def run():
            u, _ = jitted(g, st)
            return np.asarray(u[:8])

        t = min(_t.timeit(run, number=1) for _ in range(6))
        bytes_ = n * (4 + 4 + 1 + 1 + 4 + 1 + 1)  # r g,p,s1,s2; w p,s1,s2
        print(f"adam8bit n={n>>20}M  {t*1e3:7.2f} ms  {bytes_/t/1e9:6.1f} GB/s")


if __name__ == "__main__" and "--optim8" in sys.argv:
    bench_optim8()
    sys.exit(0)
