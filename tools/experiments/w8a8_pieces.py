#!/usr/bin/env python
"""W8A8 piece attribution + prepacked mid-M measurement (real TPU).

Variants at 4096x4096 NF4 bs64:
  full     — matmul_4bit_w8a8_prefill (dequant per call)      [loop-variant absmax]
  prepack  — wq int8 held in HBM; per-call act-quant + int8 dot + epilogue
  dotonly  — pre-quantized xq, prepacked wq, raw int32 dot
  dequant  — dequantize_to_int8 alone
full - prepack = per-call dequant cost; prepack - dotonly = act quant +
epilogue. `prepack` IS the serving-repack design for mid-M (VERDICT r3
item 2): measure it at M in {48, 64, 128, 256, 1024, 2048, 4096}.
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
    dequantize_to_int8,
    matmul_4bit_w4a8,
    matmul_4bit_w8a8_prefill,
    quantize_4bit_native,
)
from bitsandbytes_sycl_tpu.ops.common import safe_inv

N = K = 4096
REPS = 4


def measure(make_body, args, iters_pair):
    lo, hi = iters_pair

    def runner(iters):
        @jax.jit
        def rr(*args):
            body = make_body(*args)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, args[0]).astype(jnp.float32))

        np.asarray(rr(*args))
        return min(
            timeit.timeit(lambda: np.asarray(rr(*args)), number=1) for _ in range(REPS)
        )

    return (runner(hi) - runner(lo)) / (hi - lo)


def main():
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(N, K)) * 0.02, jnp.float32)
    Wb = W.astype(jnp.bfloat16)
    qw = quantize_4bit_native(W, blocksize=64, quant_type="nf4")
    wq8, colmax = dequantize_to_int8(qw)  # prepacked (K, N) int8
    ms = [int(v) for v in sys.argv[1].split(",")] if len(sys.argv) > 1 else [48, 64, 128, 256, 1024, 2048, 4096]

    # dequant alone (weight loop-variant; fold wq8 output back into a dummy carry)
    def dequant_body(x, *_):
        def body(i, x):
            w = dataclasses.replace(qw, absmax=qw.absmax * (1.0 + 1e-30 * i.astype(jnp.float32)))
            o, cm = dequantize_to_int8(w)
            return x + o[: x.shape[0], : x.shape[1]].astype(x.dtype) * 1e-6 + cm[: x.shape[1]].astype(x.dtype) * 1e-6
        return body
    xd = jnp.zeros((128, K), jnp.float32)
    t = measure(dequant_body, (xd,), (50, 300))
    print(f"dequant-to-int8 alone: {t*1e6:9.2f} us", flush=True)

    for M in ms:
        iters = (20, 120) if M >= 2048 else (50, 300)
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)

        def bf16_body(x, *_):
            return lambda i, x: (x @ Wb.T)[:, :K].astype(x.dtype) * 1e-3 + x
        t_bf16 = measure(bf16_body, (x,), iters)
        print(f"M={M:5d} bf16     {t_bf16*1e6:9.2f} us  1.00x", flush=True)

        def prepack_body(x, wq8, cm):
            def body(i, x):
                xf = x.astype(jnp.float32)
                ram = jnp.max(jnp.abs(xf), axis=1)
                xq = jnp.clip(jnp.round(xf * (127.0 * safe_inv(ram)).reshape(-1, 1)), -127., 127.).astype(jnp.int8)
                o32 = jax.lax.dot_general(xq, wq8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
                o = o32.astype(jnp.float32) * ((ram / 127.0).reshape(-1, 1) * (cm / 127.0).reshape(1, -1))
                return o[:, :K].astype(x.dtype) * 1e-3 + x
            return body
        t = measure(prepack_body, (x, wq8, colmax), iters)
        print(f"M={M:5d} prepack  {t*1e6:9.2f} us  {t_bf16/t:5.2f}x", flush=True)

        xq0 = jnp.asarray(rng.integers(-127, 128, size=(M, K)), jnp.int8)

        def dot_body(xq, wq8, *_):
            def body(i, xq):
                o32 = jax.lax.dot_general(xq, wq8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
                return (xq + (o32[:, :K] & 1).astype(jnp.int8)).astype(jnp.int8)
            return body
        t = measure(dot_body, (xq0, wq8), iters)
        print(f"M={M:5d} dotonly  {t*1e6:9.2f} us  {t_bf16/t:5.2f}x", flush=True)

        if M <= 256:
            def w4a8_body(x, *_):
                def body(i, x):
                    w = dataclasses.replace(qw, absmax=qw.absmax * (1.0 + 1e-30 * i.astype(jnp.float32)))
                    return matmul_4bit_w4a8(x, w)[:, :K].astype(x.dtype) * 1e-3 + x
                return body
            t = measure(w4a8_body, (x,), iters)
            print(f"M={M:5d} w4a8     {t*1e6:9.2f} us  {t_bf16/t:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
