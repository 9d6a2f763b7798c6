#!/usr/bin/env python
"""Does the paged attend grid pay for TRAILING (clamped) steps?

The shipped kernel's grid is (B, max_pages) with max_pages = table
width = max_seq_len / P (32 at the 7B serving point), but at the
B=48 avg-512-live serving point only ~4-5 pages per sequence are USED.
Trailing steps are clamped to a repeated block index (no DMA, compute
@pl.when'd off), yet CLAUDE.md records ~0.5 us of per-grid-step cost
even for tiny/skipped work. 48 x ~28 skipped steps x 32 layers would
be ~4-6 ms of the measured ~15 ms attend share.

Probe: same pool/lengths, identical math, two table widths —
  - width 32 (shipped: grid (48, 32))
  - width  5 (truncated to the live horizon: grid (48, 5))
Gap = pure trailing-step overhead (the width-5 call reads the same
pages; every length <= 5*P so outputs are identical).

Also measures a P=256 pool (width 16 / truncated 3) to separate
"fewer, larger DMAs" from "fewer skipped steps".
"""

import faulthandler
import sys
import timeit

faulthandler.dump_traceback_later(240, repeat=True, file=sys.stderr)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bitsandbytes_sycl_tpu.ops.paged_attention import paged_decode_attention_int8

B, H, D = 48, 32, 128
LO, HI, REPS = 50, 250, 4


def measure(op, q, *arrays):
    def runner(iters):
        @jax.jit
        def rr(q, *arrays):
            def body(i, q):
                return q + op(q, *arrays).astype(q.dtype) * 1e-3

            return jnp.sum(jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32))

        print(f"  compiling iters={iters} ...", flush=True)
        np.asarray(rr(q, *arrays))
        return min(
            timeit.timeit(lambda: np.asarray(rr(q, *arrays)), number=1)
            for _ in range(REPS)
        )

    return (runner(HI) - runner(LO)) / (HI - LO)


def run_case(P, widths):
    # mixed live lengths averaging ~512, all <= min(widths)*P tokens
    rng = np.random.default_rng(0)
    lengths_np = rng.integers(384, 641, size=(B,)).astype(np.int32)
    used = int(np.ceil(lengths_np.max() / P))
    npages_used = used
    NP = B * npages_used + 1
    keys = jax.random.split(jax.random.PRNGKey(P), 5)
    q = jax.random.normal(keys[0], (B, 1, H, D), jnp.bfloat16)
    kp = jax.random.randint(keys[1], (NP, H, P, D), -127, 128, jnp.int8)
    vp = jax.random.randint(keys[2], (NP, H, P, D), -127, 128, jnp.int8)
    ksp = jax.random.uniform(keys[3], (NP, H, P), jnp.float32, 0.5, 2.0)
    vsp = jax.random.uniform(keys[4], (NP, H, P), jnp.float32, 0.5, 2.0)
    lengths = jnp.asarray(lengths_np)
    ids = np.arange(1, B * npages_used + 1, dtype=np.int32).reshape(B, npages_used)
    for width in widths:
        if width < npages_used:
            continue
        tab = np.zeros((B, width), np.int32)
        tab[:, :npages_used] = ids
        table = jnp.asarray(tab)
        t = measure(
            lambda q, kp, ksp, vp, vsp: paged_decode_attention_int8(
                q, kp, ksp, vp, vsp, table, lengths),
            q, kp, ksp, vp, vsp)
        bytes_read = float(np.sum(np.ceil(lengths_np / P)) * P * H * D * 2)
        print(f"P={P:3d} table_width={width:3d} grid={B}x{width}: "
              f"{t*1e6:9.2f} us  ({bytes_read / t / 1e9:.0f} GB/s eff)",
              flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    run_case(128, (32, 5))
    run_case(256, (16, 3))


if __name__ == "__main__":
    main()
