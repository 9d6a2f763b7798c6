#!/usr/bin/env python
"""ALiBi kernel lowering + parity check on the REAL TPU (the slope
operand blocks — (1,rep,1), (1,1,1), (Hq,1) — are min-tile-escape shapes
that interpret mode does not validate; CLAUDE.md notes (B,H,1)-class
blocks have failed before). Also times the decode kernel with/without
the bias to confirm it stays ~free."""

import sys
import timeit

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bitsandbytes_sycl_tpu.models.llama import alibi_slopes
from bitsandbytes_sycl_tpu.ops.attention import (
    decode_attention_int8_stacked, prefill_attention_int8,
)
from bitsandbytes_sycl_tpu.ops.paged_attention import paged_decode_attention_int8


def consume(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def main():
    rng = np.random.default_rng(0)
    B, Hq, Hkv, S, D, Lyr = 8, 32, 32, 2048, 128, 1
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.bfloat16)
    kq = jnp.asarray(rng.integers(-127, 128, (Lyr, B, Hkv, D, S)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(0.5, 2.0, (Lyr, B, Hkv, S)).astype(np.float32))
    vq = jnp.asarray(rng.integers(-127, 128, (Lyr, B, Hkv, S, D)).astype(np.int8))
    vs = jnp.asarray(rng.uniform(0.5, 2.0, (Lyr, B, Hkv, S)).astype(np.float32))
    new_kv = (
        jnp.asarray(rng.integers(-127, 128, (B, Hkv, D)).astype(np.int8)),
        jnp.asarray(rng.uniform(0.5, 2.0, (B, Hkv)).astype(np.float32)),
        jnp.asarray(rng.integers(-127, 128, (B, Hkv, D)).astype(np.int8)),
        jnp.asarray(rng.uniform(0.5, 2.0, (B, Hkv)).astype(np.float32)),
    )
    lengths = jnp.asarray(rng.integers(100, S - 2, B), jnp.int32)
    sl = jnp.asarray(alibi_slopes(Hq))

    # decode (stacked, deferred-write form — the serving path)
    out = decode_attention_int8_stacked(q, kq, ks, vq, vs, 0, lengths,
                                        new_kv=new_kv, alibi_slopes=sl)
    print("decode+alibi lowered ok:", consume(out), flush=True)
    # numeric spot-check vs an XLA reference on ONE (b, h)
    b, h = 1, 5
    kf = np.asarray(kq)[0, b, h].astype(np.float32) * (np.asarray(ks)[0, b, h][None, :] / 127.0)
    vf = np.asarray(vq)[0, b, h].astype(np.float32) * (np.asarray(vs)[0, b, h][:, None] / 127.0)
    knf = np.asarray(new_kv[0])[b, h].astype(np.float32) * float(new_kv[1][b, h]) / 127.0
    vnf = np.asarray(new_kv[2])[b, h].astype(np.float32) * float(new_kv[3][b, h]) / 127.0
    L = int(lengths[b])
    qv = np.asarray(q, np.float32)[b, 0, h]
    sc = qv @ kf / np.sqrt(D) + float(sl[h]) * (np.arange(S) - L)
    sc = np.where(np.arange(S) < L, sc, -1e30)
    scn = qv @ knf / np.sqrt(D)
    m = max(sc.max(), scn)
    w, wn = np.exp(sc - m), np.exp(scn - m)
    ref = (w @ vf + wn * vnf) / (w.sum() + wn)
    err = np.abs(np.asarray(out, np.float32)[b, 0, h] - ref).max()
    print(f"decode+alibi parity maxerr {err:.5f} (bf16 out)", flush=True)

    # prefill
    qp = jnp.asarray(rng.normal(size=(B, 256, Hq, D)), jnp.bfloat16)
    starts = jnp.zeros((B,), jnp.int32)
    outp = prefill_attention_int8(qp, kq[0], ks[0], vq[0], vs[0], starts,
                                  alibi_slopes=sl)
    print("prefill+alibi lowered ok:", consume(outp), flush=True)

    # paged
    P, NP, MAXP = 128, 64, 8
    kp = jnp.asarray(rng.integers(-127, 128, (NP, Hkv, P, D)).astype(np.int8))
    ksp = jnp.asarray(rng.uniform(0.5, 2.0, (NP, Hkv, P)).astype(np.float32))
    vp = jnp.asarray(rng.integers(-127, 128, (NP, Hkv, P, D)).astype(np.int8))
    vsp = jnp.asarray(rng.uniform(0.5, 2.0, (NP, Hkv, P)).astype(np.float32))
    pt = jnp.asarray(rng.permutation(NP)[: B * MAXP].reshape(B, MAXP), jnp.int32)
    plen = jnp.asarray(rng.integers(100, MAXP * P - 2, B), jnp.int32)
    outg = paged_decode_attention_int8(q, kp, ksp, vp, vsp, pt, plen,
                                       alibi_slopes=sl)
    print("paged+alibi lowered ok:", consume(outg), flush=True)

    # timing: alibi cost on the decode kernel
    def time_it(fn):
        @jax.jit
        def rr(q, iters):
            def body(i, q):
                o = fn(q * (1.0 + 1e-30 * i.astype(jnp.bfloat16)))
                return q + o * jnp.asarray(1e-3, q.dtype)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32))
        np.asarray(rr(q, 50))
        lo = min(timeit.timeit(lambda: np.asarray(rr(q, 50)), number=1) for _ in range(4))
        hi = min(timeit.timeit(lambda: np.asarray(rr(q, 300)), number=1) for _ in range(4))
        return (hi - lo) / 250

    t0 = time_it(lambda qq: decode_attention_int8_stacked(
        qq, kq, ks, vq, vs, 0, lengths, new_kv=new_kv))
    t1 = time_it(lambda qq: decode_attention_int8_stacked(
        qq, kq, ks, vq, vs, 0, lengths, new_kv=new_kv, alibi_slopes=sl))
    print(f"decode kernel: {t0*1e6:.1f} us plain, {t1*1e6:.1f} us +alibi", flush=True)


if __name__ == "__main__":
    main()
