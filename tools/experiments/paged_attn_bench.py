#!/usr/bin/env python
"""Paged vs contiguous flash-decode attention (run on the real TPU).

The paged kernel (ops/paged_attention.py) fetches one full page slab
(all kv heads) per grid step, with the page table scalar-prefetched
into the Mosaic index_map. This probe measures, at the 7B decode shape
(B=8, S=2048, Hkv=Hq=32, D=128, P=128):
  - contiguous flash-decode kernel (ops/attention.py), the r2 baseline
  - paged kernel, identity page table (pages in order)
  - paged kernel, shuffled page table (worst-case locality)
Methodology = tools/microbench.py (q loop-variant; kernels are opaque
custom calls so internal work cannot be DCE'd; scalar return). All
inputs are generated ON DEVICE: host->device transfer over the axon
tunnel runs ~35 MB/s and shipping the 134 MB pool from numpy dominated
wall time (the first version of this probe spent ~12 min in transfers).

Measured 2026-08-17 (v5e): the first kernel design (grid (B, Hkv,
pages), (1,1,D,P) blocks) ran 2081 us vs 218 us contiguous — 4096 grid
steps of 16 KB DMAs. The head-folded redesign (grid (B, pages), one
contiguous (Hkv, D, P) slab per DMA): identity 168 us, shuffled 170 us,
vs contiguous 217 us — the paged kernel is FASTER (its page slabs are
fully contiguous; the contiguous kernel's (1,1,D,S) blocks stride
across the (B,H,D,S) cache) and locality-insensitive. Round-3 layout
flip: K pages went TOKEN-MAJOR (NP,H,P,D) to legalize the in-place
write kernel — this bench now measures that layout (probe measured
186 us for it vs 168 us transposed-K; the write kernel buys back
36 ms/step at B=48).
"""

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
from bitsandbytes_sycl_tpu.ops.attention import decode_attention_int8
from bitsandbytes_sycl_tpu.ops.paged_attention import paged_decode_attention_int8

B, S, H, D, P = 8, 2048, 32, 128, 128
LO, HI, REPS = 50, 300, 4


def measure(op, q, *arrays):
    """op(q, *arrays) -> (B,1,H,D). The KV arrays MUST ride as jit
    ARGUMENTS: captured as closures they become executable constants —
    a 134 MB pool baked into jit_rr serialized a 551 MB compile-cache
    entry per (op, iters) pair and each runner() call spent minutes
    compiling + writing it (this is the CLAUDE.md 'never captures'
    rule biting a timing harness)."""

    def runner(iters):
        @jax.jit
        def rr(q, *arrays):
            def body(i, q):
                return q + op(q, *arrays).astype(q.dtype) * 1e-3

            return jnp.sum(jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32))

        print(f"  compiling iters={iters} ...", flush=True)
        np.asarray(rr(q, *arrays))
        print(f"  timing iters={iters} ...", flush=True)
        return min(
            timeit.timeit(lambda: np.asarray(rr(q, *arrays)), number=1)
            for _ in range(REPS)
        )

    return (runner(HI) - runner(LO)) / (HI - LO)


def main():
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(keys[0], (B, 1, H, D), jnp.bfloat16)
    kc = jax.random.randint(keys[1], (B, H, D, S), -127, 128, jnp.int8)
    vc = jax.random.randint(keys[2], (B, H, S, D), -127, 128, jnp.int8)
    ks = jax.random.uniform(keys[3], (B, H, S), jnp.float32, 0.5, 2.0)
    vs = jax.random.uniform(keys[4], (B, H, S), jnp.float32, 0.5, 2.0)
    lengths = jnp.full((B,), S, jnp.int32)

    t = measure(
        lambda q, kc, ks, vc, vs: decode_attention_int8(q, kc, ks, vc, vs, lengths),
        q, kc, ks, vc, vs)
    print(f"contiguous flash-decode      {t*1e6:9.2f} us", flush=True)

    # pool layout: page j of batch b (device-side reshuffles)
    npages = S // P
    NP = B * npages

    @jax.jit
    def to_pool(kc, vc, ks, vs):
        kp = kc.reshape(B, H, D, npages, P).transpose(0, 3, 1, 4, 2).reshape(NP, H, P, D)
        vp = vc.reshape(B, H, npages, P, D).transpose(0, 2, 1, 3, 4).reshape(NP, H, P, D)
        ksp = ks.reshape(B, H, npages, P).transpose(0, 2, 1, 3).reshape(NP, H, P)
        vsp = vs.reshape(B, H, npages, P).transpose(0, 2, 1, 3).reshape(NP, H, P)
        return kp, vp, ksp, vsp

    kp, vp, ksp, vsp = to_pool(kc, vc, ks, vs)

    for name, order in (
        ("identity", np.arange(NP)),
        ("shuffled", np.random.default_rng(0).permutation(NP)),
    ):
        # pool slot j holds logical page order[j]; the table maps each
        # logical page i to its slot (argsort(order)[i] = j with order[j]=i)
        oj = jnp.asarray(order)
        kpj, vpj = jnp.take(kp, oj, axis=0), jnp.take(vp, oj, axis=0)
        kspj, vspj = jnp.take(ksp, oj, axis=0), jnp.take(vsp, oj, axis=0)
        table = jnp.asarray(np.argsort(order).reshape(B, npages).astype(np.int32))
        t = measure(
            lambda q, kpj, kspj, vpj, vspj: paged_decode_attention_int8(
                q, kpj, kspj, vpj, vspj, table, lengths),
            q, kpj, kspj, vpj, vspj)
        print(f"paged flash-decode {name:9} {t*1e6:9.2f} us", flush=True)


if __name__ == "__main__":
    main()
