#!/usr/bin/env python
"""Prefill (large-M) 4-bit matmul benchmark — tm-cap sweep on the fused
kernel (bigger m-tiles amortize the per-tile weight decode) vs the
(n,m,k)-grid scratch kernel vs the bf16 matmul roofline. Run ON the chip:

    timeout 1800 python tools/bench_prefill.py [--ms 256,1024,4096]

Consumption: the FULL output feeds back into the carry (x += y*1e-3).
jnp.mean-style consumption is NOT safe for XLA baselines: the algebraic
simplifier can collapse reduce(dot) and the "matmul" times below the MXU
roofline (observed: 28.7us at M=256 vs a 44us roofline floor).
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
    matmul_4bit_fused, quantize_4bit_native,
)
from bitsandbytes_sycl_tpu.ops import matmul_4bit as m4


def measure(op, x, *arrs, lo=50, hi=250, reps=6):
    """Full-output feedback INSIDE the loop (y[:, :K] adds elementwise, so
    XLA cannot algebraically collapse the matmul the way jnp.mean lets it),
    but only a SCALAR leaves the device — returning the (M, K) carry ships
    up to 32 MB through the tunnel per call and its ~100 ms transfer jitter
    drowns the iteration delta (the bug behind two bogus bench rounds)."""

    def runner(iters):
        @jax.jit
        def rr(x, *arrs):
            def body(i, x):
                y = op(x, i, *arrs)
                return x + y[:, : x.shape[1]].astype(x.dtype) * 1e-3

            return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32))

        np.asarray(rr(x, *arrs))
        return min(
            timeit.timeit(lambda: np.asarray(rr(x, *arrs)), number=1)
            for _ in range(reps)
        )

    return (runner(hi) - runner(lo)) / (hi - lo)


def main():
    N = K = 4096
    ms = (256, 1024, 4096)
    if "--ms" in sys.argv:
        ms = tuple(int(v) for v in sys.argv[sys.argv.index("--ms") + 1].split(","))

    a = jnp.ones((128, 128), jnp.bfloat16)
    np.asarray(a @ a)
    print("probe ok", flush=True)

    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(N, K)) * 0.02, jnp.float32)
    qw = quantize_4bit_native(W, blocksize=64, quant_type="nf4")
    qw_i4 = quantize_4bit_native(W, blocksize=64, quant_type="int4")
    Wb = W.astype(jnp.bfloat16)

    def variant(q):
        return lambda x, i, pk, am: matmul_4bit_fused(
            x, dataclasses.replace(q, packed=pk, absmax=am * (1.0 + 1e-30 * i))
        )

    saved_cap, saved_min = m4._TM_CAP_ELEMS, m4.PREFILL_MIN_M
    m4.PREFILL_MIN_M = 1 << 30
    for M in ms:
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        t_bf16 = measure(lambda x, i, w: x @ ((1.0 + 1e-30 * i) * w.T), x, Wb)
        print(f"M={M:5d} bf16 matmul       {t_bf16*1e6:9.1f} us  1.00x", flush=True)

        cases = [
            ("nf4 tm<=1024     ", 1024 * 512, 1 << 30, qw),
            ("nf4 hbm-dequant  ", saved_cap, 1, qw),
            ("int4 tm<=1024    ", 1024 * 512, 1 << 30, qw_i4),
            ("int4 hbm-dequant ", saved_cap, 1, qw_i4),
        ]
        for name, cap, pmin, q in cases:
            if M < 512 and "1024" in name:
                continue
            m4._TM_CAP_ELEMS, m4.PREFILL_MIN_M = cap, pmin
            try:
                t = measure(variant(q), x, q.packed, q.absmax)
                print(f"M={M:5d} {name} {t*1e6:9.1f} us  {t_bf16/t:5.2f}x", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"M={M:5d} {name} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
            finally:
                m4._TM_CAP_ELEMS, m4.PREFILL_MIN_M = saved_cap, 1 << 30
    m4._TM_CAP_ELEMS, m4.PREFILL_MIN_M = saved_cap, saved_min


if __name__ == "__main__":
    main()
