"""Probe: custom-qmap (arbitrary sorted 256-entry codebook) 8-bit
blockwise Adam step at 16M params — fused select-tree Pallas kernel
(ops/optim8.py qmap1=/qmap2=) vs the XLA select-tree path vs the old
searchsorted/take lowering it replaced, with the dynamic-codec fused
kernel as the floor.

Run ON THE TPU (JAX_PLATFORMS=''), serialized with other TPU jobs:

    timeout 1800 env JAX_PLATFORMS='' python tools/experiments/lut_optim_probe.py

Methodology (CLAUDE.md): chain steps by feeding p/state outputs back as
the fori_loop carry (natural full consumption — every output element
feeds the next step), g kept loop-variant, return ONE scalar, time as
(t(hi)-t(lo))/(hi-lo) min-over-reps.
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

import bitsandbytes_sycl_tpu.functional as F

N = 16 * 1024 * 1024
BS = 2048


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    kg, kp = jax.random.split(key)
    g = jax.random.normal(kg, (N,), jnp.float32) * 0.01
    p = jax.random.normal(kp, (N,), jnp.float32) * 0.02
    nb = N // BS
    s1 = jnp.asarray(rng.integers(0, 256, N), jnp.uint8)
    s2 = jnp.asarray(rng.integers(0, 256, N), jnp.uint8)
    am1 = jnp.asarray(np.abs(rng.normal(size=(nb,))) * 1e-3, jnp.float32)
    am2 = jnp.asarray(np.abs(rng.normal(size=(nb,))) * 1e-5, jnp.float32)
    return g, p, s1, am1, s2, am2


def quantile_maps():
    rng = np.random.default_rng(3)
    q1 = np.sort(np.unique(np.tanh(rng.normal(size=400)))).astype(np.float32)[:256]
    q2 = np.sort(np.unique(np.abs(np.tanh(rng.normal(size=500)))))[:256].astype(np.float32)
    return q1, q2


Q1, Q2 = quantile_maps()


def one_step(kind, carry, g, qa, qb):
    """One optimizer step. qa/qb are traced table args (used by lut_xla
    so the fused-dispatch concreteness check fails and the XLA tree path
    runs); other kinds ignore them."""
    p, s1, am1, s2, am2 = carry
    kw = dict(beta1=0.9, beta2=0.999, eps=1e-8, step=3, lr=1e-3,
              weight_decay=0.01, blocksize=BS)
    if kind == "dynamic":
        out = F.optimizer_update_8bit_blockwise(
            "adam", g, p, s1, am1, s2, am2, None, None, codec="dynamic", **kw)
    elif kind == "lut_fused":
        out = F.optimizer_update_8bit_blockwise(
            "adam", g, p, s1, am1, s2, am2, Q1, Q2, **kw)
    elif kind == "lut_xla":
        out = F.optimizer_update_8bit_blockwise(
            "adam", g, p, s1, am1, s2, am2, qa, qb, **kw)
    elif kind == "searchsorted":
        # the OLD lowering this change replaced: take + searchsorted
        mids1 = (qa[1:] + qa[:-1]) / 2.0
        mids2 = (qb[1:] + qb[:-1]) / 2.0

        def dec(c, am, q):
            return jnp.take(q, c.astype(jnp.int32)) * jnp.repeat(am, BS)

        s1f = dec(s1, am1, qa)
        s2f = dec(s2, am2, qb)
        n1 = s1f * 0.9 + 0.1 * g
        n2 = s2f * 0.999 + 0.001 * g * g
        c1 = 1 - 0.9**3
        c2 = np.sqrt(1 - 0.999**3)
        pn = (p - 1e-3 * (n1 / c1) / (jnp.sqrt(n2) / c2 + 1e-8)) * (1 - 1e-5)

        def req(s, mids):
            b = s.reshape(-1, BS)
            am = jnp.abs(b).max(1)
            normed = b / jnp.where(am[:, None] == 0, 1, am[:, None])
            return (
                jnp.searchsorted(mids, normed, side="left").astype(jnp.uint8).reshape(-1),
                am,
            )

        c1o, a1 = req(n1, mids1)
        c2o, a2 = req(n2, mids2)
        out = (pn, c1o, a1, c2o, a2)
    else:
        raise ValueError(kind)
    return (out[0], out[1], out[2], out[3], out[4])


def timed(kind, iters_lo=2, iters_hi=6, reps=3):
    g, p, s1, am1, s2, am2 = make_inputs()
    qa = jnp.asarray(Q1)
    qb = jnp.asarray(Q2)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(g, p, s1, am1, s2, am2, qa, qb, iters):
        def body(i, carry):
            return one_step(kind, carry, g * (1.0 + 1e-30 * i), qa, qb)

        pout, c1, a1, c2, a2 = jax.lax.fori_loop(0, iters, body, (p, s1, am1, s2, am2))
        return (jnp.sum(pout) + jnp.sum(c1.astype(jnp.float32)) + jnp.sum(a1)
                + jnp.sum(c2.astype(jnp.float32)) + jnp.sum(a2))

    def t(iters):
        t0 = time.perf_counter()
        v = run(g, p, s1, am1, s2, am2, qa, qb, iters=iters)
        np.asarray(v)
        return time.perf_counter() - t0

    t(iters_lo)
    t(iters_hi)  # compile both
    best = min(
        (t(iters_hi) - t(iters_lo)) / (iters_hi - iters_lo) for _ in range(reps)
    )
    return best


def main():
    kinds = sys.argv[1:] or ["dynamic", "lut_fused", "lut_xla", "searchsorted"]
    for kind in kinds:
        try:
            ms = timed(kind) * 1e3
            print(f"{kind:14s} {ms:9.3f} ms/step  ({N/1e6:.0f}M params, bs={BS})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{kind:14s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
