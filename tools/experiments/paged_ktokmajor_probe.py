#!/usr/bin/env python
"""Does token-major K (pages (NP,H,P,D), dot contracting on D of both
operands — upstream jax paged-kernel style) match the transposed-K
paged attend (168 us at the 7B decode shape)? If yes, the layout flip
unlocks a LEGAL Pallas in-place write kernel (a token becomes one
lane-contiguous (H, D) block of the flattened (H, P*D) page view),
replacing the 36 ms/step of unrolled DUS writes measured by
paged7b_breakdown.py at B=48."""

import faulthandler
import functools
import sys
import timeit

faulthandler.dump_traceback_later(240, repeat=True, file=sys.stderr)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from bitsandbytes_sycl_tpu.ops.paged_attention import paged_decode_attention_int8

B, S, H, D, P = 8, 2048, 32, 128, 128
LO, HI, REPS = 50, 300, 4


def _kernel(
    li_ref, pt_ref, len_ref,
    q_ref, k_ref, ks_ref, v_ref, vs_ref,
    o_ref,
    m_ref, l_ref, acc_ref, sc_ref, pv_ref,
    *, Pg, R, Hh, n_pages, scale,
):
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    used = jnp.maximum((len_ref[b] + Pg - 1) // Pg, 1)

    @pl.when(j < used)
    def _update():
        for h in range(Hh):
            q = q_ref[0, h].astype(jnp.float32)  # (R, D)
            k = k_ref[0, 0, h].astype(jnp.float32)  # (P, D) token-major
            sc_ref[h * R:(h + 1) * R, :] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),  # contract D with D
                preferred_element_type=jnp.float32,
            )
        ks = ks_ref[0, 0].astype(jnp.float32)
        ksr = jnp.broadcast_to(ks[:, None, :], (Hh, R, Pg)).reshape(Hh * R, Pg)
        sc = sc_ref[:] * (ksr * scale)
        pos = j * Pg + jax.lax.broadcasted_iota(jnp.int32, (Hh * R, Pg), 1)
        sc = jnp.where(pos < len_ref[b], sc, -1e30)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        w = jnp.exp(sc - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(w, axis=1, keepdims=True)
        vs = vs_ref[0, 0].astype(jnp.float32)
        vsr = jnp.broadcast_to(vs[:, None, :], (Hh, R, Pg)).reshape(Hh * R, Pg)
        wv = w * (vsr * jnp.float32(1.0 / 127.0))
        for h in range(Hh):
            v = v_ref[0, 0, h].astype(jnp.float32)  # (P, D)
            pv_ref[h * R:(h + 1) * R, :] = jax.lax.dot_general(
                wv[h * R:(h + 1) * R, :], v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m_ref[:] = m_new
        acc_ref[:] = acc_ref[:] * alpha + pv_ref[:]

    @pl.when(j == n_pages - 1)
    def _fin():
        inv = jnp.where(len_ref[b] > 0, 1.0 / l_ref[:], 0.0)
        o_ref[:] = (acc_ref[:] * inv).reshape(o_ref.shape).astype(o_ref.dtype)


@jax.jit
def attend_tokmajor(q4, kp, ksp, vp, vsp, li, pt, lens):
    Bq, Hkv, rep, Dd = q4.shape
    Pg = vp.shape[3]
    maxp = pt.shape[1]

    def page_map(b, j, li, pt, lens):
        used = jnp.maximum((lens[b] + Pg - 1) // Pg, 1)
        return (li[0], pt[b, jnp.minimum(j, used - 1)], 0, 0, 0)

    def scale_map(b, j, li, pt, lens):
        used = jnp.maximum((lens[b] + Pg - 1) // Pg, 1)
        return (li[0], pt[b, jnp.minimum(j, used - 1)], 0, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Bq, maxp),
        in_specs=[
            pl.BlockSpec((1, Hkv, rep, Dd), lambda b, j, li, pt, lens: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv, Pg, Dd), page_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv, Pg), scale_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv, Pg, Dd), page_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv, Pg), scale_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hkv, rep, Dd),
                               lambda b, j, li, pt, lens: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hkv * rep, 1), jnp.float32),
            pltpu.VMEM((Hkv * rep, 1), jnp.float32),
            pltpu.VMEM((Hkv * rep, Dd), jnp.float32),
            pltpu.VMEM((Hkv * rep, Pg), jnp.float32),
            pltpu.VMEM((Hkv * rep, Dd), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, Pg=Pg, R=rep, Hh=Hkv, n_pages=maxp,
                          scale=1.0 / (float(np.sqrt(Dd)) * 127.0)),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((Bq, Hkv, rep, Dd), q4.dtype),
        interpret=False,
    )(li.astype(jnp.int32), pt.astype(jnp.int32), lens.astype(jnp.int32),
      q4, kp, ksp, vp, vsp)


def measure(op, q, *arrays):
    def runner(iters):
        @jax.jit
        def rr(q, *arrays):
            def body(i, q):
                return q + op(q, *arrays).astype(q.dtype) * 1e-3
            return jnp.sum(jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32))
        print(f"  compiling iters={iters} ...", flush=True)
        np.asarray(rr(q, *arrays))
        print(f"  timing iters={iters} ...", flush=True)
        return min(timeit.timeit(lambda: np.asarray(rr(q, *arrays)), number=1)
                   for _ in range(REPS))
    return (runner(HI) - runner(LO)) / (HI - LO)


def main():
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(keys[0], (B, 1, H, D), jnp.bfloat16)
    npages = S // P
    NP = B * npages
    kp_t = jax.random.randint(keys[1], (1, NP, H, D, P), -127, 128, jnp.int8)
    vp = jax.random.randint(keys[2], (1, NP, H, P, D), -127, 128, jnp.int8)
    ks = jax.random.uniform(keys[3], (1, NP, H, P), jnp.float32, 0.5, 2.0)
    vs = jax.random.uniform(keys[4], (1, NP, H, P), jnp.float32, 0.5, 2.0)
    table = jnp.asarray(np.arange(NP).reshape(B, npages).astype(np.int32))
    lengths = jnp.full((B,), S, jnp.int32)
    li = jnp.zeros((1,), jnp.int32)
    q4 = q.reshape(B, H, 1, D)

    # correctness: token-major vs shipped transposed-K kernel
    kp_tok = jnp.swapaxes(kp_t, 3, 4)  # (1,NP,H,P,D)
    want = paged_decode_attention_int8(q, kp_t[0], ks[0], vp[0], vs[0], table, lengths)
    got = attend_tokmajor(q4, kp_tok, ks, vp, vs, li, table, lengths).reshape(B, 1, H, D)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32)).max()
    print("tokmajor vs shipped max abs err:", err, flush=True)
    assert err < 2e-2

    t = measure(lambda q, kp_tok, ks, vp, vs: attend_tokmajor(
        q.reshape(B, H, 1, D), kp_tok, ks, vp, vs, li, table, lengths
    ).reshape(B, 1, H, D), q, kp_tok, ks, vp, vs)
    print(f"paged attend TOKEN-MAJOR K {t*1e6:9.2f} us  (shipped transposed-K: 168-178)", flush=True)


if __name__ == "__main__":
    main()
