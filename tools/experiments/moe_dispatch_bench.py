#!/usr/bin/env python
"""MoE prefill: dense combine vs capacity dispatch (run on the real TPU).

Times one Mixtral-shaped MoE FFN layer (models/llama._moe_ffn) both ways
at prefill token counts, plus the dense-MLP lower bound of the same
total FLOPs budget. Methodology = tools/microbench.py: min-over-reps of
chained-iteration deltas, full-output feedback (x is loop-variant so the
expert kernels cannot be hoisted/CSE'd), scalar return.

Shape notes: N tokens <= 1024 and capacity C <= 1024 keep every expert
matmul on the fused m-tile route (the M>=2048 dequant-to-HBM route
dequantizes the constant weight x-independently, which a fori_loop
timing harness would hoist).
"""

import dataclasses
import faulthandler
import sys
import timeit

faulthandler.dump_traceback_later(180, repeat=True, file=sys.stderr)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bitsandbytes_sycl_tpu.models.llama import (
    LlamaConfig, _moe_ffn, _quantize_linear, stack_experts,
)

E, K_TOP, H, FF = 8, 2, 2048, 5632
LO_ITERS, HI_ITERS, REPS = 20, 120, 4


def measure(op, x, layer):
    """The expert tree rides as a jit ARGUMENT: captured as a closure it
    becomes executable constants (a ~140 MB packed tree serialized
    half-GB compile-cache entries in the paged-attention probe)."""

    def runner(iters):
        @jax.jit
        def rr(x, layer):
            def body(i, x):
                return op(x, layer).astype(x.dtype) * 1e-3 + x

            return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32))

        print(f"  compiling iters={iters} ...", flush=True)
        np.asarray(rr(x, layer))
        print(f"  timing iters={iters} ...", flush=True)
        return min(
            timeit.timeit(lambda: np.asarray(rr(x, layer)), number=1)
            for _ in range(REPS)
        )

    return (runner(HI_ITERS) - runner(LO_ITERS)) / (HI_ITERS - LO_ITERS)


def main():
    # all weights generated ON DEVICE (host->device over the axon tunnel
    # measured ~1 MB/s effective for big numpy arrays — see
    # paged_attn_bench.py docstring)
    key = jax.random.PRNGKey(0)
    keys = iter(jax.random.split(key, 3 * E + 3))
    base = LlamaConfig(
        hidden_size=H, intermediate_size=FF, num_experts=E,
        num_experts_per_tok=K_TOP, quant="nf4", dtype=jnp.bfloat16,
    )
    layer = {
        "router": jax.random.normal(next(keys), (E, H), jnp.float32) * 0.02,
        "experts": stack_experts([
            {
                "gate_proj": _quantize_linear(jax.random.normal(next(keys), (FF, H), jnp.float32) * 0.02, base),
                "up_proj": _quantize_linear(jax.random.normal(next(keys), (FF, H), jnp.float32) * 0.02, base),
                "down_proj": _quantize_linear(jax.random.normal(next(keys), (H, FF), jnp.float32) * 0.02, base),
            }
            for _ in range(E)
        ]),
    }

    for n in (256, 1024):
        x = jax.random.normal(next(keys), (1, n, H), jnp.bfloat16)

        def op_dense(x, layer, cfg=base):
            return _moe_ffn(x, layer, cfg, None)

        cfg_disp = dataclasses.replace(base, moe_dispatch_min_tokens=1, moe_capacity_factor=1.25)

        def op_disp(x, layer, cfg=cfg_disp):
            return _moe_ffn(x, layer, cfg, None)

        t_dense = measure(op_dense, x, layer)
        t_disp = measure(op_disp, x, layer)
        cap = int(np.ceil(1.25 * n * K_TOP / E))
        print(
            f"N={n}: dense {t_dense*1e6:9.1f} us | dispatch(C={cap}) "
            f"{t_disp*1e6:9.1f} us | speedup {t_dense/t_disp:5.2f}x "
            f"(FLOP ratio bound {E/(1.25*K_TOP):.1f}x)"
        )


if __name__ == "__main__":
    main()
