#!/usr/bin/env python
"""Mid-M W4A8 experiment (VERDICT r4 ask #2): accumulate int32 across
quantization blocks under a shared scale instead of a per-block f32
epilogue.

Why: the shipped W4A8 kernel pays, per output element, one f32
convert+multiply-add PER QUANTIZATION BLOCK (K/bs = 64 VPU MACs at
4096/bs64) — at mid M that epilogue alone exceeds the whole int8 MXU
dot (~41 ps/elem vs 10.4). The grouped kernel requantizes the decoded
int8 codes onto the PER-COLUMN int8 grid in-kernel (the same
regrid as ops.dequantize_to_int8, f = absmax*127/colmax, but fused —
no HBM round trip), runs ONE deep int8 dot per (m,n,k) tile with an
int32 VMEM accumulator across ALL k-tiles (127*127*K < 2^31 for any
real K), and applies scales once at the end: rowmax outside, colmax in
the epilogue.

Cost model per output element at tile height tm (4096^2):
  decode tree 23/4 + rescale ~5 f32-ops per weight elem -> K*10.75/tm
  dot: K int8-MACs on MXU (394T)  epilogue: ~2 f32 ops TOTAL
  tm=512 -> ~31 ps vs shipped ~63 ps vs bf16 20.8 ps.

Variants measured at 4096x4096 NF4 (bs 64 and 128):
  bf16      — the roofline baseline
  w4a8      — shipped kernel (tm capped at 128)
  w4a8.tmX  — shipped kernel with taller m-tiles (256/512)
  grp.tmX   — the grouped kernel at tm in {256, 512, 1024}
  exact     — matmul_4bit_fused (current mid-M route)
  w8a8      — dequant-once-to-HBM + dense int8 dot (the M>=2048 route)
"""

import dataclasses
import functools
import sys
import timeit
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from bitsandbytes_sycl_tpu.ops import (
    matmul_4bit_fused, matmul_4bit_w4a8, matmul_4bit_w8a8_prefill,
    quantize_4bit_native,
)
from bitsandbytes_sycl_tpu.ops.common import interpret_mode, safe_inv
from bitsandbytes_sycl_tpu.ops.matmul_w4a8 import matmul_4bit_w4a8_grouped

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
    ms = [int(v) for v in sys.argv[1].split(",")] if len(sys.argv) > 1 else [256, 512, 1024, 2048]
    bss = [int(v) for v in sys.argv[2].split(",")] if len(sys.argv) > 2 else [64, 128]
    kw = jax.random.PRNGKey(0)
    W = jax.random.normal(kw, (N, K), jnp.float32) * 0.02
    Wb = W.astype(jnp.bfloat16)

    # whole-half K tile (llama down_proj K=5632 class): the scales block
    # (2, nblocks, tn) takes the equal-dim escape with a non-8-aligned
    # sublane dim — interpret mode does NOT check this, so verify LOWERED
    Wh = jax.random.normal(jax.random.PRNGKey(3), (512, 5632), jnp.float32) * 0.02
    qwh = quantize_4bit_native(Wh, blocksize=64, quant_type="nf4")
    xh = jax.random.normal(jax.random.PRNGKey(4), (256, 5632), jnp.bfloat16)
    refh = xh.astype(jnp.float32) @ qwh.dequantize().astype(jnp.float32).T
    goth = matmul_4bit_w4a8_grouped(xh, qwh, out_dtype=jnp.float32, tm=256)
    relh = float(jnp.linalg.norm(goth - refh) / jnp.linalg.norm(refh))
    print(f"whole-half K=5632 grouped rel err: {relh:.4f}", flush=True)

    for bs in bss:
        qw = quantize_4bit_native(W, blocksize=bs, quant_type="nf4")
        # correctness vs dequant reference at tiny M first (rel err)
        xs = jax.random.normal(jax.random.PRNGKey(1), (256, K), jnp.bfloat16)
        ref = (xs.astype(jnp.float32) @ qw.dequantize().astype(jnp.float32).T)
        got = matmul_4bit_w4a8_grouped(xs, qw, out_dtype=jnp.float32, tm=256)
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        print(f"bs={bs} grouped rel err vs dequant: {rel:.4f}", flush=True)

        for M in ms:
            iters = (20, 120) if M >= 2048 else (50, 300)
            x = jax.random.normal(jax.random.PRNGKey(2), (M, K), jnp.bfloat16)

            def bf16_body(x, *_):
                return lambda i, x: ((x @ ((1.0 + 1e-30 * i) * Wb.T))[:, :K] * 1e-3 + x).astype(x.dtype)
            t_bf16 = measure(bf16_body, (x,), iters)
            print(f"bs={bs} M={M:5d} bf16      {t_bf16*1e6:9.2f} us  1.00x", flush=True)

            def qvar_body(op):
                def mk(x, *_):
                    def body(i, x):
                        w = dataclasses.replace(qw, absmax=qw.absmax * (1.0 + 1e-30 * i.astype(jnp.float32)))
                        return (op(x, w)[:, :K].astype(jnp.float32) * 1e-3 + x.astype(jnp.float32)).astype(x.dtype)
                    return body
                return mk

            for name, op in (
                ("w4a8    ", lambda x, w: matmul_4bit_w4a8(x, w)),
                ("exact   ", lambda x, w: matmul_4bit_fused(x, w)),
                ("w8a8    ", lambda x, w: matmul_4bit_w8a8_prefill(x, w)),
            ):
                try:
                    t = measure(qvar_body(op), (x,), iters)
                    print(f"bs={bs} M={M:5d} {name}  {t*1e6:9.2f} us  {t_bf16/t:5.2f}x", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"bs={bs} M={M:5d} {name}  FAILED {str(e)[:100]}", flush=True)

            tms = (32, 64, 128, 256) if M <= 128 else (256, 512, 1024, 2048)
            for tm in tms:
                if tm > max(M, 256) or (M <= 128 and tm < M):
                    continue
                try:
                    t = measure(qvar_body(lambda x, w, _tm=tm: matmul_4bit_w4a8_grouped(x, w, tm=_tm)), (x,), iters)
                    print(f"bs={bs} M={M:5d} grp.tm{tm:<4d} {t*1e6:9.2f} us  {t_bf16/t:5.2f}x", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"bs={bs} M={M:5d} grp.tm{tm:<4d} FAILED {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
