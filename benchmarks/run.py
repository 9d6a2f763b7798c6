#!/usr/bin/env python
"""Benchmark suite — one JSON line per benchmark (the thing the reference
never had: its only harness is commented out, tests_pvc/test_matmulqlt.py
:274-342,375).

Usage (real TPU):  python benchmarks/run.py [name ...]
Names: nf4_matmul int8_matmul attn_decode attn_prefill adam8bit model_decode

Methodology (see CLAUDE.md): min-over-reps of chained-iteration deltas;
every output element consumed (no DCE); weights loop-variant (no hoist);
np.asarray to force completion (block_until_ready is a no-op on axon).
"""

import dataclasses
import json
import sys
import timeit
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def _measure(op, x, *arrs, lo=100, hi=600, reps=4):
    """Large arrays go through jit ARGUMENTS (captured constants get
    serialized into the remote-compile request: HTTP 413)."""

    def runner(iters):
        @jax.jit
        def rr(x, *arrs):
            def body(i, x):
                return x + jnp.mean(op(x, i, *arrs)).astype(x.dtype) * 1e-6

            return jax.lax.fori_loop(0, iters, body, x)

        np.asarray(rr(x, *arrs))
        return min(
            timeit.timeit(lambda: np.asarray(rr(x, *arrs)), number=1) for _ in range(reps)
        )

    return (runner(hi) - runner(lo)) / (hi - lo)


def _emit(name, value, unit, baseline=None):
    rec = {"metric": name, "value": round(float(value), 4), "unit": unit}
    if baseline is not None:
        rec["vs_baseline"] = round(float(value) / baseline, 4)
    print(json.dumps(rec), flush=True)


def nf4_matmul():
    from bitsandbytes_sycl_tpu.ops import matmul_4bit_fused, quantize_4bit_native

    rng = np.random.default_rng(0)
    N = K = 4096
    W = jnp.asarray(rng.normal(size=(N, K)) * 0.02, jnp.float32)
    qw = quantize_4bit_native(W, blocksize=64, quant_type="nf4")
    Wb = W.astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(8, K)), jnp.bfloat16)
    t_b = _measure(lambda x, i, w: x @ w.T, x, Wb)
    t_k = _measure(
        lambda x, i, pk, am: matmul_4bit_fused(
            x, dataclasses.replace(qw, packed=pk, absmax=am * (1.0 + 1e-30 * i))
        ),
        x, qw.packed, qw.absmax,
    )
    _emit("nf4_fused_vs_bf16_matmul_4096_m8", t_b / t_k, "x (1=parity)", 0.90)


def int8_matmul():
    from bitsandbytes_sycl_tpu import functional as F

    rng = np.random.default_rng(0)
    N = K = 4096
    W = jnp.asarray(rng.normal(size=(N, K)) * 0.02, jnp.float32)
    CB, SCB = F.int8_vectorwise_quant(W)
    Wb = W.astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(8, K)), jnp.bfloat16)
    t_b = _measure(lambda x, i, w: x @ w.T, x, Wb)
    t_k = _measure(
        lambda x, i, cb, scb: F.llm_int8_matmul(x, cb, scb * (1.0 + 1e-30 * i), threshold=0.0),
        x, CB, SCB,
    )
    _emit("int8_fused_vs_bf16_matmul_4096_m8", t_b / t_k, "x (1=parity)", 1.0)


def attn_decode():
    from bitsandbytes_sycl_tpu.models import llama as L
    from bitsandbytes_sycl_tpu.ops.attention import decode_attention_int8

    B, S, H, D = 8, 2048, 32, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    kq, ks = L._kv_quantize(k)
    vq, vs = L._kv_quantize(v)
    kqt, ksh = kq.transpose(0, 2, 3, 1), ks.transpose(0, 2, 1)
    vqh, vsh = vq.transpose(0, 2, 1, 3), vs.transpose(0, 2, 1)
    lengths = jnp.full((B,), S, jnp.int32)
    kb, vb = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    mask = jnp.ones((B, 1, S), bool)
    t_b = _measure(
        lambda x, i, k, v: L._attention(x, k, v, mask, jnp.bfloat16), q, kb, vb, lo=50, hi=300
    )
    t_k = _measure(
        lambda x, i, kq_, ks_, vq_, vs_: decode_attention_int8(
            x, kq_, ks_ * (1.0 + 1e-30 * i), vq_, vs_, lengths
        ),
        q, kqt, ksh, vqh, vsh, lo=50, hi=300,
    )
    _emit("attn_decode_int8_vs_bf16_b8_s2048", t_b / t_k, "x (1=parity)", 1.0)


def attn_prefill():
    from bitsandbytes_sycl_tpu.models import llama as L
    from bitsandbytes_sycl_tpu.ops.attention import prefill_attention_int8

    B, T, S, H, D = 1, 2048, 2048, 32, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    kq, ks = L._kv_quantize(k)
    vq, vs = L._kv_quantize(v)
    kqt, ksh = kq.transpose(0, 2, 3, 1), ks.transpose(0, 2, 1)
    vqh, vsh = vq.transpose(0, 2, 1, 3), vs.transpose(0, 2, 1)
    starts = jnp.zeros((B,), jnp.int32)
    kf, vf = L._kv_dequantize(kq, ks, jnp.bfloat16), L._kv_dequantize(vq, vs, jnp.bfloat16)
    mask = jnp.arange(S)[None, None, :] <= jnp.arange(T)[None, :, None]
    t_x = _measure(
        lambda x, i, k, v: L._attention(x, k, v, mask, jnp.bfloat16), q, kf, vf, lo=20, hi=120
    )
    t_k = _measure(
        lambda x, i, kq_, ks_, vq_, vs_: prefill_attention_int8(
            x, kq_, ks_ * (1.0 + 1e-30 * i), vq_, vs_, starts
        ),
        q, kqt, ksh, vqh, vsh, lo=20, hi=120,
    )
    _emit("attn_prefill_flash_vs_xla_t2048", t_x / t_k, "x speedup", 1.0)


def adam8bit():
    from bitsandbytes_sycl_tpu import functional as F

    n = 16 * 1024 * 1024
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(n,)) * 0.02, jnp.float32)
    g = jnp.asarray(rng.normal(size=(n,)) * 0.01, jnp.float32)
    s1 = jnp.asarray(rng.integers(0, 256, n), jnp.uint8)
    s2 = jnp.asarray(rng.integers(0, 256, n), jnp.uint8)
    am1 = jnp.asarray(np.abs(rng.normal(size=(n // 2048,))) * 1e-3, jnp.float32)
    am2 = jnp.asarray(np.abs(rng.normal(size=(n // 2048,))) * 1e-5, jnp.float32)

    def chained(iters):
        @jax.jit
        def rr(g, p, s1, am1, s2, am2):
            def body(i, carry):
                p, s1, am1, s2, am2 = carry
                return F.optimizer_update_8bit_blockwise(
                    "adam", g, p, s1, am1, s2, am2, None, None,
                    beta1=0.9, beta2=0.999, eps=1e-8, step=5, lr=1e-3, codec="dynamic",
                )

            out = jax.lax.fori_loop(0, iters, body, (p, s1, am1, s2, am2))
            return out[0][:8]

        np.asarray(rr(g, p, s1, am1, s2, am2))
        return min(
            timeit.timeit(lambda: np.asarray(rr(g, p, s1, am1, s2, am2)), number=1)
            for _ in range(4)
        )

    t = (chained(40) - chained(10)) / 30
    _emit("adam8bit_16M_params_gbps", n * 16 / t / 1e9, "GB/s effective", 100.0)


def model_decode():
    from bitsandbytes_sycl_tpu.models.llama import (
        LlamaConfig, init_kv_cache, init_params, llama_forward,
    )

    B, S = 8, 1024
    cfg = LlamaConfig(
        vocab_size=8192, hidden_size=2048, intermediate_size=5632,
        num_layers=4, num_heads=16, num_kv_heads=16, head_dim=128,
        max_seq_len=S, dtype=jnp.bfloat16, quant="nf4", kv_quant=True,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    toks = jnp.ones((B, 1), jnp.int32)
    pos0 = jnp.full((B, 1), S // 2, jnp.int32)
    cache = init_kv_cache(cfg, B)

    def step(carry, _):
        cache, toks, pos = carry
        logits, cache = llama_forward(params, cfg, toks, cache, pos)
        nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        return (cache, nxt.reshape(B, 1), pos + 1), ()

    @jax.jit
    def decode_n(cache, toks, pos, arr):
        (cache, toks, pos), _ = jax.lax.scan(step, (cache, toks, pos), arr)
        return toks

    def run(n):
        arr = jnp.zeros((n,))
        np.asarray(decode_n(cache, toks, pos0, arr))
        return min(
            timeit.timeit(lambda: np.asarray(decode_n(cache, toks, pos0, arr)), number=1)
            for _ in range(3)
        )

    t = (run(40) - run(10)) / 30
    _emit("model_decode_4L2048h_nf4_int8kv_toks", B / t, "tok/s", 4000.0)


def model7b_decode(quant="nf4"):
    """Full-size Llama-7B decode (NOT in the default list: ~4 GB of weight
    init + several minutes of compile). Measured round 1: NF4 207 tok/s,
    int4 300, int8 339 (B=8, S=1024, int8 KV, one v5e). Arg format
    "<quant>[-a8][.bsN][@B]", e.g. "nf4-a8.bs128" for the serving7b
    preset or "nf4-a8@64" for a large-batch point."""
    from bitsandbytes_sycl_tpu.models.llama import (
        LlamaConfig, init_kv_cache, init_params, llama_forward,
    )

    B, S, bs = 8, 1024, 64
    if "@" in quant:
        quant, b_str = quant.split("@", 1)
        B = int(b_str)
    if ".bs" in quant:
        quant, bs_str = quant.split(".bs", 1)
        bs = int(bs_str)
    a8 = quant.endswith("-a8")
    quant = quant[:-3] if a8 else quant
    cfg = LlamaConfig(max_seq_len=S, quant=quant, kv_quant=True, dtype=jnp.bfloat16,
                      a8_decode=a8, blocksize=bs)
    params = init_params(cfg, jax.random.PRNGKey(0))
    np.asarray(params["final_norm"])
    cache = init_kv_cache(cfg, B)
    toks = jnp.ones((B, 1), jnp.int32)
    pos0 = jnp.full((B, 1), S // 2, jnp.int32)

    @jax.jit
    def decode_n(params, cache, toks, pos, arr):
        def step(carry, _):
            cache, toks, pos = carry
            logits, cache = llama_forward(params, cfg, toks, cache, pos)
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return (cache, nxt.reshape(B, 1), pos + 1), ()

        (cache, toks, pos), _ = jax.lax.scan(step, (cache, toks, pos), arr)
        return toks

    def run(n):
        arr = jnp.zeros((n,))
        np.asarray(decode_n(params, cache, toks, pos0, arr))
        return min(
            timeit.timeit(lambda: np.asarray(decode_n(params, cache, toks, pos0, arr)), number=1)
            for _ in range(3)
        )

    t = (run(20) - run(5)) / 15
    suffix = ("_a8" if a8 else "") + (f"_bs{bs}" if bs != 64 else "")
    _emit(f"llama7b_{quant}{suffix}_int8kv_decode_b{B}", B / t, "tok/s", 200.0)


def model7b_prefill(quant="nf4"):
    """Full-size Llama-7B PREFILL (B=8, T=512 -> M=4096 rows per linear):
    the workload the round-3 prefill routing targets. Reports tok/s and,
    for nf4, the same measurement with the round-2 routing (tm<=256, no
    HBM-dequant route) for an in-place speedup ratio."""
    from bitsandbytes_sycl_tpu.models.llama import (
        LlamaConfig, init_kv_cache, init_params, llama_forward,
    )
    from bitsandbytes_sycl_tpu.ops import matmul_4bit as m4

    B, T, S = 8, 512, 1024
    cfg = LlamaConfig(max_seq_len=S, quant=quant, kv_quant=True, dtype=jnp.bfloat16)
    params = init_params(cfg, jax.random.PRNGKey(0))
    np.asarray(params["final_norm"])
    toks = jnp.ones((B, T), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))

    def measure():
        cache = init_kv_cache(cfg, B)

        @jax.jit
        def prefill(params, cache, toks, pos, arr):
            def step(carry, _):
                cache, t = carry
                logits, cache = llama_forward(params, cfg, t, cache, pos)
                # feed a token derived from logits back so scan iterations chain
                t = (t + jnp.argmax(logits[:, :1], axis=-1).astype(jnp.int32)) % 32000
                return (cache, t), ()

            (cache, t), _ = jax.lax.scan(step, (cache, toks), arr)
            return t

        def run(n):
            np.asarray(prefill(params, cache, toks, pos, jnp.zeros((n,))))
            return min(
                timeit.timeit(
                    lambda: np.asarray(prefill(params, cache, toks, pos, jnp.zeros((n,)))),
                    number=1,
                )
                for _ in range(3)
            )

        return (run(8) - run(2)) / 6

    t3 = measure()
    _emit(f"llama7b_{quant}_prefill_b8_t512", B * T / t3, "tok/s", None)
    if quant == "nf4":
        saved = (m4._tm_candidates, m4.PREFILL_MIN_M, m4.PREFILL_MIN_M_UNALIGNED)
        try:
            # round-2 routing: fused kernel only, m-tiles capped at 64 for
            # the whole-half-K down_proj (r2's tm=256 there OOMs Mosaic's
            # scoped VMEM — r2 never ran a 7B prefill; 64 is the largest
            # m-tile that compiles, so this measures r2's routing at its
            # best-possible legal configuration)
            m4._tm_candidates = lambda tkb, dt, whole_half=False: tuple(
                c for c in (256, 128, 64, 32, 16, 8) if c * tkb <= 64 * 5504
            ) or (8,)
            m4.PREFILL_MIN_M = m4.PREFILL_MIN_M_UNALIGNED = 1 << 30
            t2 = measure()
            _emit("llama7b_nf4_prefill_r3_vs_r2_routing", t2 / t3, "x speedup", 1.0)
        except Exception as e:  # pragma: no cover - depends on backend
            print(f"# r2-routing emulation failed: {type(e).__name__}", file=sys.stderr)
        finally:
            m4._tm_candidates, m4.PREFILL_MIN_M, m4.PREFILL_MIN_M_UNALIGNED = saved


def model7b_chunked_prefill(arg="256"):
    """Chunked-prefill throughput at the chunk size SERVING.md recommends
    (M = B*chunk rows per linear — the M in [256, 2048) window): nf4
    exact routing vs the r5 amortized W8A8 prefill (EngineConfig
    w8a8_prefill — ONE repack per prefill batch, int8-MXU chunks). The
    repack runs INSIDE the timed region with loop-variant params so its
    per-batch cost is included, not hoisted."""
    from bitsandbytes_sycl_tpu.models.llama import (
        LlamaConfig, init_kv_cache, init_params, llama_forward,
        repack_params_int8,
    )

    C = int(arg)
    B, T, S = 1, 2048, 4096
    cfg = LlamaConfig(max_seq_len=S, quant="nf4", kv_quant=True,
                      dtype=jnp.bfloat16)
    cfg8 = LlamaConfig(max_seq_len=S, quant="int8", llm_int8_threshold=0.0,
                       kv_quant=True, dtype=jnp.bfloat16)
    params = init_params(cfg, jax.random.PRNGKey(0))
    np.asarray(params["final_norm"])
    toks = jnp.ones((B, T), jnp.int32)

    def variant(use_w8a8):
        cache0 = init_kv_cache(cfg, B)

        @jax.jit
        def prefill_rounds(params, cache, toks, arr):
            def round_(carry, _):
                cache, t = carry
                # loop-variant params: the repack cannot hoist out of scan
                factor = 1.0 + 1e-30 * jnp.sum(t).astype(jnp.float32)
                pv = jax.tree_util.tree_map(
                    lambda a: a * factor
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
                if use_w8a8:
                    pv = repack_params_int8(pv, cfg)[0]
                    ccfg = cfg8
                else:
                    ccfg = cfg
                last = jnp.zeros((B, 1), jnp.int32)
                for ci in range(T // C):
                    pos = ci * C + jnp.broadcast_to(jnp.arange(C), (B, C))
                    logits, cache = llama_forward(
                        pv, ccfg, jax.lax.dynamic_slice_in_dim(t, ci * C, C, 1),
                        cache, pos)
                    last = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                t = (t + last) % 32000
                return (cache, t), ()

            (cache, t), _ = jax.lax.scan(round_, (cache, toks), arr)
            return t

        def run(n):
            np.asarray(prefill_rounds(params, cache0, toks, jnp.zeros((n,))))
            return min(
                timeit.timeit(
                    lambda: np.asarray(
                        prefill_rounds(params, cache0, toks, jnp.zeros((n,)))),
                    number=1)
                for _ in range(3)
            )

        return (run(8) - run(2)) / 6

    t_nf4 = variant(False)
    _emit(f"llama7b_nf4_chunked{C}_prefill_b{B}", B * T / t_nf4, "tok/s", None)
    t_w8 = variant(True)
    _emit(f"llama7b_w8a8_chunked{C}_prefill_b{B}", B * T / t_w8, "tok/s", None)
    _emit(f"llama7b_chunked{C}_w8a8_vs_nf4", t_nf4 / t_w8, "x speedup", 1.0)


def model7b_paged_decode(arg="48"):
    """Large-batch 7B serving point that ONLY paged KV makes possible:
    B concurrent sequences averaging ~512 live tokens decode through the
    page-table flash kernel (ops/paged_attention.py) at max_seq_len 4096.
    One page id spans all 32 layers (33.6 MB / 128 tokens ≈ 262 KB/token):
    a slot-contiguous int8 cache would pin B x 4096 x 262 KB = 69 GB at
    B=64 — on this 16 GB chip next to ~4 GB of NF4 weights it fits only
    ~11 slots, while pages sized to tokens IN FLIGHT serve 48+ sequences
    in ~10 GB (B=64 pools OOM'd by ~0.9 GB; 48 is the measured fit).
    Mirrors the engine's decode math exactly (same cache pytree contract
    as models/llama._paged_write_and_attend); page indirection is
    computed in-graph from positions (pages pre-allocated for the
    measured horizon). Arg: "<B>[.bsN][.lenN]" (default 48, blocksize
    64, avg live length 512 — e.g. "16.bs128.len2048" for the
    long-context point; mind the pool budget: B x ceil((len+153)/128)
    pages x 33.6 MB must fit beside ~4 GB of weights)."""
    from bitsandbytes_sycl_tpu.engine.paged import init_page_pool
    from bitsandbytes_sycl_tpu.models.llama import (
        LlamaConfig, init_params, llama_forward,
    )

    bs, avg_len, quant = 64, 512, "nf4"
    # ".wide": ENGINE-REALISTIC table width (max_seq_len/P = 32 columns,
    # trailing ones garbage) instead of the horizon-sized table — this
    # is what the engine's allocator hands the kernel. ".widehint" adds
    # the pow2-bucketed cfg.pages_hint the engine now sets per step;
    # wide-without-hint measures the trailing-grid-step overhead the
    # hint removes (ops/paged_attention.py docstring).
    wide = hint = repack = kv4 = False
    if ".kv4" in arg:
        # int4 KV pages (r5): half the pool bytes and attention reads
        arg = arg.replace(".kv4", "")
        kv4 = True
    if arg.endswith(".widehint"):
        arg, wide, hint = arg[: -len(".widehint")], True, True
    elif arg.endswith(".wide"):
        arg, wide = arg[: -len(".wide")], True
    repack_only = None
    if ".repackbig" in arg:
        # PARTIAL repack: only the wide FFN projections + lm_head go int8
        # (most of the W4A8 sub-dot penalty, ~+2.3 GB instead of +3.3) —
        # fits the B=48 avg-512 pool where the full repack does not
        arg = arg.replace(".repackbig", "")
        repack = True
        repack_only = {"gate_proj", "up_proj", "down_proj", "lm_head"}
    elif ".repack" in arg:
        # serving-time 4-bit -> int8 repack (models/llama.repack_params_int8,
        # r4): 2x weight memory (6.7 GB) for 1.6-2.1x faster mid-M linears
        # — the pool budget shrinks accordingly (B*maxp*33.6MB + 6.7GB
        # must fit; B=32 avg-512 fits, B=48 avg-512 does NOT)
        arg = arg.replace(".repack", "")
        repack = True
    if ".len" in arg:
        arg, len_str = arg.split(".len", 1)
        avg_len = int(len_str)
    if ".bs" in arg:
        arg, bs_str = arg.split(".bs", 1)
        bs = int(bs_str)
    if "." in arg:  # e.g. "48.int4" — quant type suffix
        arg, quant = arg.split(".", 1)
    B = int(arg)
    S, P = 4096, 128
    # a8_decode only pays for LUT codebooks (docs/PERFORMANCE.md)
    cfg = LlamaConfig(max_seq_len=S, quant=quant, kv_quant=True,
                      dtype=jnp.bfloat16, a8_decode=(quant != "int4"),
                      blocksize=bs, kv_bits=4 if kv4 else 8)
    params = init_params(cfg, jax.random.PRNGKey(0))
    if repack:
        from bitsandbytes_sycl_tpu.models.llama import repack_params_int8

        params, cfg = repack_params_int8(params, cfg, only=repack_only)
    np.asarray(params["final_norm"])

    # mixed live lengths averaging ~avg_len; horizon = start + 25 steps
    rng = np.random.default_rng(0)
    start = rng.integers(avg_len - 128, avg_len + 128, size=(B,)).astype(np.int32)
    maxp = int(np.ceil((int(start.max()) + 25) / P))
    n_pages = B * maxp + 1  # + reserved trash page
    pool = init_page_pool(cfg, n_pages, P)
    tab_np = np.arange(1, B * maxp + 1, dtype=np.int32).reshape(B, maxp)
    if wide:  # engine-realistic width; pool unchanged (table is tiny)
        tab_np = np.pad(tab_np, ((0, 0), (0, S // P - maxp)))
        if hint:
            from bitsandbytes_sycl_tpu.engine.engine import _grid_bucket
            cfg = dataclasses.replace(
                cfg, pages_hint=_grid_bucket(maxp, S // P))
    table = jnp.asarray(tab_np)
    pos0 = jnp.asarray(start)[:, None]
    toks = jnp.ones((B, 1), jnp.int32)
    cache = dict(pool, page_table=table,
                 write_page=jnp.zeros((B,), jnp.int32),
                 write_off=jnp.zeros((B,), jnp.int32))
    if kv4:
        # nibble staging for the pair-packed flush. Zero-seeding is fine
        # HERE (unlike the engine, which seeds from the last prefill
        # token): this bench's pool starts all-zero, so the one byte an
        # odd-offset first write rebuilds holds no real token
        from bitsandbytes_sycl_tpu.engine.paged import add_nib_staging

        cache = add_nib_staging(cache, cfg, B)

    # the ~11 GB pool must be DONATED (a copied carry would double-buffer
    # past the 16 GB chip); each call returns it for re-threading
    @partial(jax.jit, donate_argnums=(1,))
    def decode_n(params, cache, toks, pos, arr):
        def step(carry, _):
            cache, toks, pos = carry
            p = pos[:, 0]
            cache["write_page"] = jnp.take_along_axis(
                cache["page_table"], (p // P)[:, None], axis=1)[:, 0]
            cache["write_off"] = p % P
            logits, cache = llama_forward(params, cfg, toks, cache, pos)
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return (cache, nxt.reshape(B, 1), pos + 1), ()

        (cache, toks, pos), _ = jax.lax.scan(step, (cache, toks, pos), arr)
        return toks, cache

    def run(n):
        nonlocal cache
        arr = jnp.zeros((n,))
        out, cache = decode_n(params, cache, toks, pos0, arr)
        np.asarray(out)  # scalar-ish (B,1) — never ship the pool
        ts = []
        for _ in range(3):
            t0 = timeit.default_timer()
            out, cache = decode_n(params, cache, toks, pos0, arr)
            np.asarray(out)
            ts.append(timeit.default_timer() - t0)
        return min(ts)

    t = (run(20) - run(5)) / 15
    sfx = ("_a8" if cfg.a8_decode else "") + (f"_bs{bs}" if bs != 64 else "")
    sfx += ("_widehint" if (wide and hint) else "_wide" if wide else "")
    sfx += ("_repack8big" if (repack and repack_only) else "_repack8" if repack else "")
    sfx += ("_kv4" if kv4 else "")
    _emit(f"llama7b_{quant}{sfx}_PAGED_decode_b{B}_avg{avg_len}", B / t, "tok/s", 200.0)


ALL = {
    "nf4_matmul": nf4_matmul,
    "int8_matmul": int8_matmul,
    "attn_decode": attn_decode,
    "attn_prefill": attn_prefill,
    "adam8bit": adam8bit,
    "model_decode": model_decode,
}

EXTRA = {  # opt-in: heavy (GBs of weight init + minutes of compile)
    "model7b_decode": model7b_decode,
    "model7b_prefill": model7b_prefill,
    "model7b_paged_decode": model7b_paged_decode,
    "model7b_chunked_prefill": model7b_chunked_prefill,
}



def spec_decode():
    """Jitted speculative decode (single dispatch): plain greedy scan vs
    draft-verify rounds. Random weights give meaningless ACCEPTANCE, so
    we report the mechanics: ms/round, tokens/round actually committed,
    and the implied ceiling at full acceptance (real checkpoints sit
    between). Draft = int4 quantization of the SAME fp weights (the
    'free draft'); target = nf4."""
    from bitsandbytes_sycl_tpu.engine.speculative import speculative_generate_jit
    from bitsandbytes_sycl_tpu.models.llama import (
        LlamaConfig, init_kv_cache, init_params, llama_forward, quantize_params,
    )

    B, T, NEW, GAMMA = 1, 8, 64, 4
    base = dict(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_layers=8, num_heads=16, num_kv_heads=16, max_seq_len=256,
        kv_quant=True, dtype=jnp.bfloat16,
    )
    cfg_fp = LlamaConfig(quant="none", **base)
    fp = init_params(cfg_fp, jax.random.PRNGKey(0))
    cfg_t = LlamaConfig(quant="nf4", **base)
    cfg_d = LlamaConfig(quant="int4", **base)
    tgt = quantize_params(fp, cfg_t)
    drf = quantize_params(fp, cfg_d)
    prompts = jnp.asarray(np.random.default_rng(0).integers(1, 32000, (B, T)), jnp.int32)

    # per-token time as a GENERATION-LENGTH delta: t(64 new) - t(16 new)
    # over 48 tokens — cancels the ~30 ms tunnel dispatch latency and the
    # shared prefill (CLAUDE.md delta methodology, applied per-generation
    # since each generation is already one fused dispatch)
    LO = 16

    def make_plain(new):
        @jax.jit
        def plain(params, prompts):
            cache = init_kv_cache(cfg_t, B)
            pos = jnp.broadcast_to(jnp.arange(T), (B, T))
            lg, cache = llama_forward(params, cfg_t, prompts, cache, pos)
            tok0 = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)

            def step(carry, _):
                cache, tok, p = carry
                lg, cache = llama_forward(params, cfg_t, tok[:, None], cache, p[:, None])
                return (cache, jnp.argmax(lg[:, 0], -1).astype(jnp.int32), p + 1), tok

            (_, _, _), toks = jax.lax.scan(
                step, (cache, tok0, jnp.full((B,), T, jnp.int32)), jnp.arange(new)
            )
            return toks

        np.asarray(plain(tgt, prompts))
        return plain

    plains = {n: make_plain(n) for n in (LO, NEW)}

    def t_of(fn):
        return min(timeit.timeit(lambda: np.asarray(fn(tgt, prompts)), number=1) for _ in range(4))

    t_plain = (t_of(plains[NEW]) - t_of(plains[LO])) / (NEW - LO)

    def spec(new):
        out, stats = speculative_generate_jit(tgt, cfg_t, drf, cfg_d, prompts, new, gamma=GAMMA)
        return np.asarray(out), int(stats["rounds"])

    _, rounds_lo = spec(LO)
    _, rounds = spec(NEW)
    t_s = {}
    for n in (LO, NEW):
        t_s[n] = min(timeit.timeit(lambda n=n: spec(n), number=1) for _ in range(4))
    t_spec = (t_s[NEW] - t_s[LO]) / (NEW - LO)
    toks_per_round = (NEW - LO) / max(rounds - rounds_lo, 1)
    _emit("spec_decode_plain", 1.0 / t_plain, "tok/s (delta method)")
    _emit("spec_decode_speculative", 1.0 / t_spec, "tok/s (delta method)")
    _emit("spec_decode_tokens_per_round", toks_per_round, f"tok/round (ceiling {GAMMA+1})")
    print(f"# rounds={rounds} t_plain={t_plain*1e3:.2f}ms/tok t_spec={t_spec*1e3:.2f}ms/tok", file=sys.stderr)


EXTRA["spec_decode"] = spec_decode


if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for n in names:
        if ":" in n:  # e.g. model7b_decode:nf4-a8
            fn, arg = n.split(":", 1)
            (ALL | EXTRA)[fn](arg)
        else:
            (ALL | EXTRA)[n]()
