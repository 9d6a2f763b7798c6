#!/usr/bin/env python
"""One-process serialized TPU re-drive of everything added this round.

Run: JAX_PLATFORMS='' python tools/tpu_redrive.py [section ...]
Sections: fp8 stoch lamb optim8 spec engine (default: all).
Each section is independently try/excepted so a transient tunnel error
doesn't kill the rest; one process serializes chip access (CLAUDE.md).
"""

import sys
import time
import traceback

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def sec_fp8():
    from bitsandbytes_sycl_tpu.research import matmul_fp8_global, matmul_fp8_mixed

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(32, 256)), jnp.float32)
    B = jnp.asarray(rng.normal(size=(256, 64)) * 0.06, jnp.float32)
    for fn in (matmul_fp8_mixed, matmul_fp8_global):
        out = fn(A, B)
        err = np.abs(np.asarray(out) - np.asarray(A) @ np.asarray(B)).mean()
        g = jax.grad(lambda a: fn(a, B).sum())(A)
        ok = err < 0.115 and bool(np.isfinite(np.asarray(g)).all())
        print(f"  {fn.__name__}: fwd mean err {err:.4f} grads finite -> {'OK' if ok else 'FAIL'}")
        assert ok


def sec_stoch():
    from bitsandbytes_sycl_tpu import functional as F

    a = jnp.full((4096,), 0.30103, jnp.float32).at[0].set(1.0)
    q, qs = F.quantize_blockwise(a, blocksize=4096, key=jax.random.PRNGKey(0))
    codes = np.unique(np.asarray(q)[1:])
    print(f"  stochastic codes: {codes} -> {'OK' if codes.size == 2 else 'FAIL'}")
    assert codes.size == 2


def sec_lamb():
    from bitsandbytes_sycl_tpu import optim

    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.normal(size=(8192,)) * 0.01, jnp.float32)}
    for bits in (32, 8):
        tx = optim.lamb(learning_rate=1e-2, optim_bits=bits, min_8bit_size=1024)
        st = tx.init(params)
        g = {"w": jnp.asarray(rng.normal(size=(8192,)) * 1e3, jnp.float32)}
        upd, st = tx.update(g, st, params)
        sn = float(jnp.linalg.norm(upd["w"].astype(jnp.float32)))
        bound = float(jnp.linalg.norm(params["w"])) * 1e-2
        print(f"  lamb{bits}: step {sn:.5f} <= bound {bound:.5f} -> {'OK' if sn <= bound * 1.05 else 'FAIL'}")
        assert sn <= bound * 1.05


def sec_optim8():
    """Bandwidth of the fused Adam8bit step — chained fori_loop delta
    (CLAUDE.md methodology; a single-dispatch timing only measures the
    ~30 ms tunnel latency)."""
    import timeit

    from bitsandbytes_sycl_tpu import functional as F
    from bitsandbytes_sycl_tpu.optim.base import _QMAP1, _QMAP2

    n = 1 << 24
    nb = n // 2048
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(n,)) * 1e-3, jnp.float32)
    p = jnp.asarray(rng.normal(size=(n,)) * 1e-2, jnp.float32)
    s1 = jnp.full((n,), 127, jnp.uint8)
    a1 = jnp.zeros((nb,), jnp.float32)
    s2 = jnp.zeros((n,), jnp.uint8)
    a2 = jnp.zeros((nb,), jnp.float32)

    def runner(iters):
        @jax.jit
        def rr(g, p, s1, a1, s2, a2):
            def body(i, carry):
                p, s1, a1, s2, a2 = carry
                out = F.optimizer_update_8bit_blockwise(
                    "adam", g * (1.0 + 1e-30 * i), p, s1, a1, s2, a2,
                    _QMAP1, _QMAP2, 0.9, 0.999, 1e-8, 1, 1e-6,
                    blocksize=2048, codec="dynamic",
                )
                return out

            p2, s1, a1, s2, a2 = jax.lax.fori_loop(0, iters, body, (p, s1, a1, s2, a2))
            return p2[:8] + a1[:8]

        np.asarray(rr(g, p, s1, a1, s2, a2))
        return min(
            timeit.timeit(lambda: np.asarray(rr(g, p, s1, a1, s2, a2)), number=1)
            for _ in range(4)
        )

    lo, hi = 10, 60
    t = (runner(hi) - runner(lo)) / (hi - lo)
    bw = n * 16 / t / 1e9
    print(f"  adam8bit n={n >> 20}M: {t * 1e3:.2f} ms/step  {bw:.0f} GB/s (r1: 1.68 ms / 160 GB/s)")


def sec_spec():
    """Speculative decoding on-chip: lossless + wall-clock win (int4 draft
    for an NF4 target, same checkpoint)."""
    import dataclasses
    import timeit

    from bitsandbytes_sycl_tpu.engine import speculative_generate
    from bitsandbytes_sycl_tpu.models import LlamaConfig, init_params
    from bitsandbytes_sycl_tpu.models.llama import init_kv_cache, llama_forward

    cfg = LlamaConfig(
        vocab_size=512, hidden_size=512, intermediate_size=1024, num_layers=4,
        num_heads=8, num_kv_heads=8, max_seq_len=128, quant="nf4", dtype=jnp.bfloat16,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    prompts = jnp.asarray(np.random.default_rng(0).integers(1, 512, (1, 8)), jnp.int32)
    out, stats = speculative_generate(params, cfg, params, cfg, prompts, 24, gamma=4)
    # reference greedy
    cache = init_kv_cache(cfg, 1)
    pos = jnp.broadcast_to(jnp.arange(8), (1, 8))
    lg, cache = llama_forward(params, cfg, prompts, cache, pos)
    ref = [int(jnp.argmax(lg[0, -1]))]
    for i in range(23):
        lg, cache = llama_forward(
            params, cfg, jnp.asarray([[ref[-1]]]), cache, jnp.asarray([[8 + i]])
        )
        ref.append(int(jnp.argmax(lg[0, 0])))
    ok = list(out[0]) == ref
    print(f"  lossless vs greedy: {'OK' if ok else 'FAIL'}  accept={stats['accept_rate']:.2f} target_calls={stats['target_calls']}")
    assert ok


def sec_engine():
    from bitsandbytes_sycl_tpu.engine import EngineConfig, InferenceEngine
    from bitsandbytes_sycl_tpu.models import LlamaConfig, init_params

    cfg = LlamaConfig(
        vocab_size=512, hidden_size=512, intermediate_size=1024, num_layers=2,
        num_heads=8, num_kv_heads=8, max_seq_len=64, quant="nf4", dtype=jnp.bfloat16,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    eng = InferenceEngine(cfg, params, EngineConfig(max_batch=4, max_new_tokens=8, prefill_buckets=(16,)))
    outs = eng.generate([[1, 2, 3], [4, 5], [6, 7, 8, 9]])
    ok = [len(o) for o in outs] == [8, 8, 8]
    print(f"  engine batched-prefill generate: {'OK' if ok else 'FAIL'}")
    assert ok


SECTIONS = {
    "fp8": sec_fp8,
    "stoch": sec_stoch,
    "lamb": sec_lamb,
    "optim8": sec_optim8,
    "spec": sec_spec,
    "engine": sec_engine,
}


def main():
    names = [a for a in sys.argv[1:] if a in SECTIONS] or list(SECTIONS)
    print(f"devices: {jax.devices()}")
    failures = []
    for name in names:
        t0 = time.time()
        print(f"[{name}]")
        try:
            SECTIONS[name]()
            print(f"[{name}] done in {time.time() - t0:.1f}s")
        except Exception:
            failures.append(name)
            traceback.print_exc()
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
