"""Paged int8 KV attention (ops/paged_attention.py + engine/paged.py).

The reference has no attention/serving code (SURVEY.md §5); paging is
new-build serving surface (vLLM-style block tables, TPU-native design).
Kernels run in interpret mode on CPU (conftest), same as the other
Pallas coverage.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bitsandbytes_sycl_tpu.engine.paged import PagedKVPool
from bitsandbytes_sycl_tpu.models import llama as L
from bitsandbytes_sycl_tpu.ops.paged_attention import paged_decode_attention_int8


def _mk_kv(rng, B, S, Hkv, D):
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    kq, ks = L._kv_quantize(k)
    vq, vs = L._kv_quantize(v)
    return k, v, kq, ks, vq, vs


def test_paged_kernel_matches_contiguous_flash_decode():
    """Scatter a contiguous int8 cache into SHUFFLED pages; the paged
    kernel through the page table must equal the contiguous flash-decode
    kernel (which itself is pinned to the dequant reference)."""
    from bitsandbytes_sycl_tpu.ops.attention import decode_attention_int8

    B, S, Hkv, Hq, D, P = 2, 512, 2, 4, 128, 128
    rng = np.random.default_rng(31)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32)
    _, _, kq, ks, vq, vs = _mk_kv(rng, B, S, Hkv, D)
    lengths = jnp.asarray([317, 512], jnp.int32)

    # contiguous reference (kernel layouts)
    kqh = kq.transpose(0, 2, 3, 1)  # (B, Hkv, D, S)
    ksh = ks.transpose(0, 2, 1)
    vqh = vq.transpose(0, 2, 1, 3)
    vsh = vs.transpose(0, 2, 1)
    ref = decode_attention_int8(q, kqh, ksh, vqh, vsh, lengths)
    assert ref is not None

    # build a paged pool: page p of batch b lands at a shuffled pool slot
    n_seq_pages = S // P
    NP = B * n_seq_pages + 3
    perm = rng.permutation(NP)
    kp = np.zeros((NP, Hkv, P, D), np.int8)
    ksp = np.zeros((NP, Hkv, P), np.float32)
    vp = np.zeros((NP, Hkv, P, D), np.int8)
    vsp = np.zeros((NP, Hkv, P), np.float32)
    table = np.zeros((B, n_seq_pages), np.int32)
    for b in range(B):
        for j in range(n_seq_pages):
            pid = int(perm[b * n_seq_pages + j])
            table[b, j] = pid
            sl = slice(j * P, (j + 1) * P)
            kp[pid] = np.asarray(kqh[b, :, :, sl]).transpose(0, 2, 1)
            ksp[pid] = np.asarray(ksh[b, :, sl])
            vp[pid] = np.asarray(vqh[b, :, sl, :])
            vsp[pid] = np.asarray(vsh[b, :, sl])

    out = paged_decode_attention_int8(
        q, jnp.asarray(kp), jnp.asarray(ksp), jnp.asarray(vp), jnp.asarray(vsp),
        jnp.asarray(table), lengths,
    )
    assert out is not None
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_pages_hint_truncated_grid_is_exact():
    """`pages_hint` truncates the attend grid's page dimension to the
    live horizon (trailing steps cost ~0.1-0.3 us each even when
    skipped — 2.2x the whole attend at the B=48 serving point). With
    every length inside hint*P tokens the truncated grid must be
    BIT-identical to the full-width grid: the removed steps were fully
    clamped/masked no-ops."""
    B, Hkv, Hq, D, P = 3, 2, 4, 128, 128
    width, used = 8, 4  # table sized for max_seq, only 4 pages live
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32)
    NP = B * used + 1
    kp = jnp.asarray(rng.integers(-127, 128, (NP, Hkv, P, D)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 128, (NP, Hkv, P, D)), jnp.int8)
    ksp = jnp.asarray(rng.uniform(0.5, 2.0, (NP, Hkv, P)), jnp.float32)
    vsp = jnp.asarray(rng.uniform(0.5, 2.0, (NP, Hkv, P)), jnp.float32)
    table = np.zeros((B, width), np.int32)  # cols past `used` = garbage 0s
    table[:, :used] = 1 + np.arange(B * used, dtype=np.int32).reshape(B, used)
    table = jnp.asarray(table)
    lengths = jnp.asarray([317, used * P, 1], jnp.int32)

    full = paged_decode_attention_int8(
        q, kp, ksp, vp, vsp, table, lengths)
    for hint in (used, used + 2, width + 99):  # over-wide hints clamp
        trunc = paged_decode_attention_int8(
            q, kp, ksp, vp, vsp, table, lengths, pages_hint=hint)
        np.testing.assert_array_equal(np.asarray(trunc), np.asarray(full))

    # an over-long row truncates to its first hint pages (documented
    # contract for stale inactive slots) but stays finite
    short = paged_decode_attention_int8(
        q, kp, ksp, vp, vsp, table,
        jnp.asarray([width * P, used * P, 1], jnp.int32), pages_hint=used)
    assert np.isfinite(np.asarray(short)).all()


def test_pool_alloc_free_reuse():
    cfg = L.LlamaConfig.tiny(num_layers=1, max_seq_len=512)
    pool = PagedKVPool(cfg, num_pages=6, page_size=128)
    assert pool.free_pages() == 6
    p0 = pool.alloc_slot(0, 300)  # 3 pages
    assert len(p0) == 3 and pool.free_pages() == 3
    pool.extend_slot(0, 400)  # grows to 4
    assert len(pool.tables[0]) == 4 and pool.free_pages() == 2
    with pytest.raises(RuntimeError):
        pool.alloc_slot(1, 128 * 3)  # only 2 free
    pool.release_slot(0)
    assert pool.free_pages() == 6
    pool.alloc_slot(1, 512)  # reuses released pages (4 = the per-seq max)
    assert pool.free_pages() == 2
    with pytest.raises(ValueError):
        pool.alloc_slot(2, 4096 * 2)  # > max_seq_len worth of pages


def test_pool_ingest_then_decode_write_then_attend():
    """End-to-end paged flow: prefill a contiguous cache, paginate it,
    append one decode step's kv through write_decode_step, and attend —
    must equal the dequant reference over the concatenated sequence."""
    cfg = L.LlamaConfig.tiny(
        num_layers=2, num_heads=2, num_kv_heads=2, hidden_size=256,
        max_seq_len=512,
    )
    B, S, Hkv, D, P = 2, 512, 2, 128, 128
    T0 = [200, 256]  # prefilled lengths per slot
    rng = np.random.default_rng(33)
    k, v, kq, ks, vq, vs = _mk_kv(rng, B, S, Hkv, D)

    # emulate the model's contiguous cache for one layer of interest
    cache = {
        "k": jnp.zeros((cfg.num_layers, B, Hkv, D, S), jnp.int8),
        "v": jnp.zeros((cfg.num_layers, B, Hkv, S, D), jnp.int8),
        "k_scale": jnp.zeros((cfg.num_layers, B, Hkv, S), jnp.float32),
        "v_scale": jnp.zeros((cfg.num_layers, B, Hkv, S), jnp.float32),
    }
    li = 1
    cache["k"] = cache["k"].at[li].set(kq.transpose(0, 2, 3, 1))
    cache["v"] = cache["v"].at[li].set(vq.transpose(0, 2, 1, 3))
    cache["k_scale"] = cache["k_scale"].at[li].set(ks.transpose(0, 2, 1))
    cache["v_scale"] = cache["v_scale"].at[li].set(vs.transpose(0, 2, 1))

    pool = PagedKVPool(cfg, num_pages=12, page_size=P)
    slots = [7, 9]
    for i, s in enumerate(slots):
        pool.ingest_contiguous(s, cache, i, T0[i])

    # one decode step: new k/v at positions T0
    knew = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    vnew = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    kqn, ksn = L._kv_quantize(knew)
    vqn, vsn = L._kv_quantize(vnew)
    for i, s in enumerate(slots):
        pool.extend_slot(s, T0[i] + 1)
    pool.write_decode_step(
        li,
        kqn.transpose(0, 2, 3, 1), ksn.transpose(0, 2, 1),
        vqn.transpose(0, 2, 1, 3), vsn.transpose(0, 2, 1),
        slots, np.asarray(T0),
    )

    q = jnp.asarray(rng.normal(size=(B, 1, cfg.num_heads, D)), jnp.float32)
    lengths = np.asarray(T0) + 1
    out = pool.attend(li, q, slots, lengths)
    assert out is not None

    # dequant reference over the concatenated (prefix + new) kv
    kf = L._kv_dequantize(kq, ks, jnp.float32)
    vf = L._kv_dequantize(vq, vs, jnp.float32)
    kn = L._kv_dequantize(kqn, ksn, jnp.float32)
    vn = L._kv_dequantize(vqn, vsn, jnp.float32)
    outs = []
    for b in range(B):
        kcat = jnp.concatenate([kf[b, : T0[b]], kn[b]], axis=0)[None]
        vcat = jnp.concatenate([vf[b, : T0[b]], vn[b]], axis=0)[None]
        mask = jnp.ones((1, 1, T0[b] + 1), bool)
        outs.append(L._attention(q[b : b + 1], kcat, vcat, mask, jnp.float32))
    ref = jnp.concatenate(outs, axis=0)
    rel = float(np.linalg.norm(np.asarray(out) - np.asarray(ref)) / np.linalg.norm(np.asarray(ref)))
    assert rel < 5e-3, rel


# --------------------------------------------------------------------------
# engine paged mode (EngineConfig.paged): decode through page tables
# --------------------------------------------------------------------------

from bitsandbytes_sycl_tpu.engine import EngineConfig, InferenceEngine  # noqa: E402


def _paged_cfgs(**kw):
    """Tiny config whose head_dim=128 keeps the paged kernel tileable
    (D % 128 == 0) so the Pallas path runs (interpret mode on CPU)."""
    mcfg = L.LlamaConfig.tiny(
        hidden_size=256, num_heads=2, num_kv_heads=1, head_dim=128,
        max_seq_len=256, **kw,
    )
    return mcfg


def _gen(mcfg, ecfg, prompts, max_new=6):
    params = L.init_params(mcfg, jax.random.PRNGKey(0))
    eng = InferenceEngine(mcfg, params, ecfg)
    return eng, eng.generate(prompts, max_new_tokens=max_new)


def _slot_kv(eng, slot, n):
    """(k, k_scale, v) for one slot's first n tokens, paged or contiguous."""
    if eng._alloc is not None:
        pages = eng._alloc.tables[slot]
        # K pages are TOKEN-MAJOR (L, H, P, D); contiguous K is (L, H, D, S)
        k = np.concatenate(
            [np.asarray(eng.cache["k"][:, p]) for p in pages], axis=2
        ).transpose(0, 1, 3, 2)
        ks = np.concatenate([np.asarray(eng.cache["k_scale"][:, p]) for p in pages], axis=2)
        v = np.concatenate([np.asarray(eng.cache["v"][:, p]) for p in pages], axis=2)
    else:
        k = np.asarray(eng.cache["k"][:, slot])
        ks = np.asarray(eng.cache["k_scale"][:, slot])
        v = np.asarray(eng.cache["v"][:, slot])
    return k[..., :n], ks[..., :n], v[:, :, :n]


def test_engine_paged_matches_contiguous_kernel_path():
    """Paged decode through the page-table kernel vs the slot-contiguous
    engine. The two ATTEND implementations differ by ~1 bf16 ulp (online
    vs one-shot softmax), which random tiny-model logits can't separate
    (top-2 gaps sit at the same scale) — so the parity contract is pinned
    where it is exact: identical prefill tokens (same code path) and
    teacher-forced decode steps whose written KV matches the contiguous
    cache within one int8 code."""
    # a8_decode=False: this test's premise is that paged and contiguous
    # prefill share ONE code path — the W4A8 default routes by total row
    # count, which differs between the two engines' prefill batching, so
    # token-identity across paging modes holds only on the exact path
    # (the engine-level a8/int8 paged serving path is covered by
    # test_engine.test_engine_serves_repacked_int8 and the serving benches)
    mcfg = _paged_cfgs(a8_decode=False)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7, 6, 5, 4, 3, 2, 1]]
    params = L.init_params(mcfg, jax.random.PRNGKey(0))
    ec = InferenceEngine(mcfg, params, EngineConfig(max_batch=2))
    ep = InferenceEngine(mcfg, params, EngineConfig(max_batch=2, paged=True))
    ec.add_requests(prompts)
    ep.add_requests(prompts)
    assert list(ec._last_tokens) == list(ep._last_tokens)  # same prefill path
    for _ in range(3):
        # teacher-force identical inputs so bf16-ulp attend deltas cannot
        # compound into different trajectories
        ep._last_tokens = ec._last_tokens.copy()
        ec.step()
        ep.step()
    for slot, p in enumerate(prompts):
        n = len(p) + 3
        kc, ksc, vc = _slot_kv(ec, slot, n)
        kp, ksp, vp = _slot_kv(ep, slot, n)
        assert np.abs(kp.astype(np.int32) - kc.astype(np.int32)).max() <= 1
        assert np.abs(vp.astype(np.int32) - vc.astype(np.int32)).max() <= 1
        np.testing.assert_allclose(ksp, ksc, rtol=2e-2)
    # retiring everything returns every page to the free list
    for b in range(2):
        ep.active[b] = False
        ep._alloc.release_slot(b)
    assert ep._alloc.free_pages() == ep._alloc.num_pages - 1  # minus trash


def test_engine_paged_fallback_and_slot_reuse():
    """hd=64 is untileable for the paged kernel -> the gather fallback
    carries decode; 3 prompts through 2 slots exercises page release and
    reallocation across continuous-batching slot reuse."""
    mcfg = L.LlamaConfig.tiny()  # hd=64, max_seq_len=128 (divisible by 128)
    prompts = [[1, 2, 3], [4, 5, 6, 7], [8, 9]]
    _, ref = _gen(mcfg, EngineConfig(max_batch=2), prompts, max_new=5)
    eng, out = _gen(
        mcfg, EngineConfig(max_batch=2, paged=True, num_pages=4), prompts,
        max_new=5,
    )
    assert out == ref
    assert eng._alloc.free_pages() == 3  # 4 minus the reserved trash page


def test_engine_paged_snapshot_restore_resumes_identically():
    mcfg = _paged_cfgs()
    params = L.init_params(mcfg, jax.random.PRNGKey(1))
    ecfg = EngineConfig(max_batch=2, paged=True)
    ref_eng = InferenceEngine(mcfg, params, ecfg)
    ref = ref_eng.generate([[1, 2, 3], [4, 5]], max_new_tokens=8)

    eng = InferenceEngine(mcfg, params, ecfg)
    eng.add_requests([[1, 2, 3], [4, 5]], max_new_tokens=8)
    for _ in range(3):
        eng.step()
    snap = eng.durable_snapshot()

    eng2 = InferenceEngine(mcfg, params, ecfg)
    eng2.restore_durable(snap)
    while eng2.active.any():
        eng2.step()
    got = [eng2.slot_tokens[b][len(p):] for b, p in enumerate([[1, 2, 3], [4, 5]])]
    assert got == ref


def test_engine_paged_composes_with_chunked_prefill():
    """Chunked prefill accumulates the contiguous scratch cache chunk by
    chunk; the paged ingest paginates the final result — tokens must
    match the contiguous engine's. hd=64 keeps BOTH engines on the same
    XLA attend math (paged takes the gather fallback), so token equality
    is deterministic — the kernel path's ulp-level divergence is covered
    by the teacher-forced KV parity test above."""
    mcfg = L.LlamaConfig.tiny()  # hd=64 -> same-math gather fallback
    prompts = [[i % 7 + 1 for i in range(37)], [3, 1, 4, 1, 5]]
    _, ref = _gen(mcfg, EngineConfig(max_batch=2), prompts, max_new=4)
    _, out = _gen(
        mcfg, EngineConfig(max_batch=2, paged=True, prefill_chunk=16),
        prompts, max_new=4,
    )
    assert out == ref


def test_engine_paged_composes_with_prefix_cache():
    """register_prefix keeps its KV in a contiguous (L, 1, S, ...) cache;
    suffix prefill lands on top of it and the paged ingest paginates the
    combined result — tokens must match the contiguous engine's (hd=64:
    same-math fallback, see the chunked-prefill test)."""
    mcfg = L.LlamaConfig.tiny()
    params = L.init_params(mcfg, jax.random.PRNGKey(2))
    pre = [7, 7, 3, 2]
    suffixes = [[1, 2, 3], [4, 5]]

    def run(ecfg):
        eng = InferenceEngine(mcfg, params, ecfg)
        pid = eng.register_prefix(pre)
        eng.add_requests(suffixes, max_new_tokens=5, prefix=pid)
        while eng.active.any():
            eng.step()
        return [eng.slot_tokens[b][len(pre) + len(s):] for b, s in enumerate(suffixes)]

    ref = run(EngineConfig(max_batch=2))
    out = run(EngineConfig(max_batch=2, paged=True))
    assert out == ref


def test_engine_paged_pool_exhaustion_raises():
    mcfg = _paged_cfgs()
    params = L.init_params(mcfg, jax.random.PRNGKey(0))
    # 2 usable pages (3 minus trash): a 2-slot batch of 129+ tokens needs
    # 2 pages each -> exhaustion must raise, not corrupt
    eng = InferenceEngine(
        mcfg, params, EngineConfig(max_batch=2, paged=True, num_pages=3)
    )
    with pytest.raises(RuntimeError, match="exhausted"):
        eng.add_requests([[1] * 140, [2] * 140])
    # failed admission must not leak pages
    assert eng._alloc.free_pages() == 2
    # a batch that fits still admits fine afterwards
    eng.add_requests([[1] * 100, [2] * 100], max_new_tokens=2)


def test_engine_paged_tp_matches_contiguous_tp():
    """Paged x TP: pool leaves shard on the kv-head axis (same specs as
    the contiguous cache), indirection arrays replicate. Compared against
    the CONTIGUOUS engine on the SAME mesh so both sides share psum
    order and attend math (hd=64 gather fallback) — only the paging
    differs, and tokens must be identical."""
    from bitsandbytes_sycl_tpu.parallel import make_mesh, shard_llama_params

    mcfg = L.LlamaConfig.tiny()  # heads=4/kv=2: divisible by tp=2
    params = L.init_params(mcfg, jax.random.PRNGKey(4))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    mesh = make_mesh({"model": 2})
    sharded = shard_llama_params(params, mcfg, mesh)
    ref = InferenceEngine(
        mcfg, sharded, EngineConfig(max_batch=2), mesh=mesh
    ).generate(prompts, max_new_tokens=5)
    out = InferenceEngine(
        mcfg, sharded, EngineConfig(max_batch=2, paged=True), mesh=mesh
    ).generate(prompts, max_new_tokens=5)
    assert out == ref


def test_engine_paged_rejects_bad_configs():
    mcfg = _paged_cfgs(kv_quant=False)
    params = None
    with pytest.raises(ValueError, match="kv_quant"):
        InferenceEngine(mcfg, params, EngineConfig(paged=True))
    mcfg = L.LlamaConfig.tiny(max_seq_len=200)
    with pytest.raises(ValueError, match="page_size"):
        InferenceEngine(mcfg, params, EngineConfig(paged=True))


def test_paged_attend_stacked_layer_select():
    """The stacked attend kernel must read layer `li` of the pool (the
    scalar-prefetched layer index picks the block, never a slice)."""
    from bitsandbytes_sycl_tpu.ops.paged_attention import (
        paged_decode_attention_int8, paged_decode_attention_int8_stacked,
    )

    rng = np.random.default_rng(5)
    L_, B, S, H, D, P = 3, 2, 256, 2, 128, 128
    NP, maxp = B * (S // P) + 1, S // P
    kp = jnp.asarray(rng.integers(-127, 128, (L_, NP, H, P, D)).astype(np.int8))
    vp = jnp.asarray(rng.integers(-127, 128, (L_, NP, H, P, D)).astype(np.int8))
    ksp = jnp.asarray(rng.uniform(0.5, 2.0, (L_, NP, H, P)).astype(np.float32))
    vsp = jnp.asarray(rng.uniform(0.5, 2.0, (L_, NP, H, P)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    table = jnp.asarray(rng.permutation(np.arange(1, NP))[: B * maxp]
                        .reshape(B, maxp).astype(np.int32))
    lengths = jnp.asarray([S, S - 77], jnp.int32)

    for li in range(L_):
        want = paged_decode_attention_int8(
            q, kp[li], ksp[li], vp[li], vsp[li], table, lengths)
        got = paged_decode_attention_int8_stacked(
            q, kp, ksp, vp, vsp, li, table, lengths)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=1e-5, atol=1e-5)


def test_paged_kernel_sliding_window_matches_contiguous():
    """Sliding-window masking through the paged kernel must equal the
    contiguous flash-decode kernel's (this was silently full-causal on
    the paged path before round 3 threaded `window` through it)."""
    from bitsandbytes_sycl_tpu.ops.attention import decode_attention_int8
    from bitsandbytes_sycl_tpu.ops.paged_attention import (
        paged_decode_attention_int8,
    )

    rng = np.random.default_rng(11)
    B, S, H, D, P, W = 2, 512, 2, 128, 128, 100
    kc = jnp.asarray(rng.integers(-127, 128, (B, H, D, S)).astype(np.int8))
    vc = jnp.asarray(rng.integers(-127, 128, (B, H, S, D)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(0.5, 2.0, (B, H, S)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.5, 2.0, (B, H, S)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    lengths = jnp.asarray([512, 300], jnp.int32)

    want = decode_attention_int8(q, kc, ks, vc, vs, lengths, window=W)

    npages = S // P
    NP = B * npages
    kp = np.asarray(kc).reshape(B, H, D, npages, P).transpose(0, 3, 1, 4, 2).reshape(NP, H, P, D)
    vp = np.asarray(vc).reshape(B, H, npages, P, D).transpose(0, 2, 1, 3, 4).reshape(NP, H, P, D)
    ksp = np.asarray(ks).reshape(B, H, npages, P).transpose(0, 2, 1, 3).reshape(NP, H, P)
    vsp = np.asarray(vs).reshape(B, H, npages, P).transpose(0, 2, 1, 3).reshape(NP, H, P)
    table = jnp.asarray(np.arange(NP).reshape(B, npages).astype(np.int32))
    got = paged_decode_attention_int8(
        q, jnp.asarray(kp), jnp.asarray(ksp), jnp.asarray(vp), jnp.asarray(vsp),
        table, lengths, window=W)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("window", [None, 100])
def test_paged_attend_new_kv_matches_write_then_read(window):
    """Deferred-write paged decode: attending the one-step-stale pool
    with the current token folded in from registers (new_kv) must equal
    writing the token into its page first and attending with lengths+1 —
    pins the paged kernel's has_new finalize (its own scratch reuse and
    alpha rescale, separate from attention.py's) in interpret mode."""
    from bitsandbytes_sycl_tpu.ops.paged_attention import (
        paged_decode_attention_int8_stacked,
    )

    Lyr, B, S, Hq, Hkv, D, P = 2, 3, 512, 4, 2, 128, 128
    npg = S // P
    NP = B * npg + 1
    rng = np.random.default_rng(19)
    kp = jnp.asarray(rng.integers(-127, 128, (Lyr, NP, Hkv, P, D)).astype(np.int8))
    vp = jnp.asarray(rng.integers(-127, 128, (Lyr, NP, Hkv, P, D)).astype(np.int8))
    ksp = jnp.asarray(rng.uniform(0.5, 2.0, (Lyr, NP, Hkv, P)).astype(np.float32))
    vsp = jnp.asarray(rng.uniform(0.5, 2.0, (Lyr, NP, Hkv, P)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32)
    table = jnp.asarray(np.arange(1, NP).reshape(B, npg).astype(np.int32))
    lengths = jnp.asarray([511, 200, 0], jnp.int32)  # POOL tokens per row
    kn = jnp.asarray(rng.integers(-127, 128, (B, Hkv, D)).astype(np.int8))
    vn = jnp.asarray(rng.integers(-127, 128, (B, Hkv, D)).astype(np.int8))
    ksn = jnp.asarray(rng.uniform(0.5, 2.0, (B, Hkv)).astype(np.float32))
    vsn = jnp.asarray(rng.uniform(0.5, 2.0, (B, Hkv)).astype(np.float32))
    li = 1

    # write-then-read reference
    k2, v2 = np.asarray(kp).copy(), np.asarray(vp).copy()
    ks2, vs2 = np.asarray(ksp).copy(), np.asarray(vsp).copy()
    for b in range(B):
        pos = int(lengths[b])
        pg, off = int(table[b, pos // P]), pos % P
        k2[li, pg, :, off, :] = np.asarray(kn[b])
        v2[li, pg, :, off, :] = np.asarray(vn[b])
        ks2[li, pg, :, off] = np.asarray(ksn[b])
        vs2[li, pg, :, off] = np.asarray(vsn[b])
    want = paged_decode_attention_int8_stacked(
        q, jnp.asarray(k2), jnp.asarray(ks2), jnp.asarray(v2), jnp.asarray(vs2),
        li, table, lengths + 1, window=window)
    got = paged_decode_attention_int8_stacked(
        q, kp, ksp, vp, vsp, li, table, lengths,
        new_kv=(kn, ksn, vn, vsn), window=window)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_engine_paged_serves_gptj_substrate_families():
    """Paged mode composes with forward_fn families: the page-table cache
    keys flow through the SHARED write_and_attend, so the gptj substrate
    (here Falcon: MQA kv_heads=1, head_dim=128 keeps the paged kernel
    tileable) must produce the same greedy tokens paged as contiguous."""
    from bitsandbytes_sycl_tpu.engine import EngineConfig, InferenceEngine
    from bitsandbytes_sycl_tpu.models.falcon import FalconConfig, falcon_forward
    from bitsandbytes_sycl_tpu.models.gptj import init_gptj_kv_cache, init_gptj_params

    cfg = FalconConfig.tiny(
        hidden_size=256, num_heads=2, kv_heads=1, head_dim=128,
        rotary_dim=128, max_seq_len=256, kv_quant=True, quant="nf4",
    )
    params = init_gptj_params(cfg, jax.random.PRNGKey(0))
    prompts = [[1, 2, 3, 4], [9, 8, 7, 6, 5]]
    kw = dict(forward_fn=falcon_forward, init_cache_fn=init_gptj_kv_cache)
    ec = InferenceEngine(cfg, params, EngineConfig(max_batch=2), **kw)
    ep = InferenceEngine(cfg, params, EngineConfig(max_batch=2, paged=True), **kw)
    ref = ec.generate(prompts, max_new_tokens=6)
    out = ep.generate(prompts, max_new_tokens=6)
    assert out == ref, (out, ref)


# ---------------------------------------------------------------------------
# int4 KV pages (kv_bits=4, r5)
# ---------------------------------------------------------------------------


def test_kv4_pack_unpack_roundtrip():
    """_pack4 (ingest requant + adjacent-pair nibble pack) and
    _kv4_unpack invert each other on codes that sit on the ±7 grid;
    _scale_cols / _kv4_scales_logical invert each other too."""
    from bitsandbytes_sycl_tpu.engine.paged import _pack4, _scale_cols

    rng = np.random.default_rng(7)
    c4 = rng.integers(-7, 8, (2, 3, 2, 128, 16)).astype(np.int8)
    c8 = (c4.astype(np.int32) * 18).astype(np.int8)  # 18*7/127 ~ 1: exact requant
    packed = _pack4(jnp.asarray(c8), tok_axis=3)
    assert packed.dtype == jnp.uint8 and packed.shape[3] == 64
    back = np.asarray(L._kv4_unpack(packed))
    np.testing.assert_array_equal(back, c4)

    s = jnp.asarray(rng.uniform(0.5, 2.0, (2, 3, 2, 128)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(L._kv4_scales_logical(_scale_cols(s, 3))), np.asarray(s))


def test_paged_attend_kv4_matches_unpacked_reference():
    """The kv4 kernel (pair-packed pages, in-kernel nibble decode,
    parity-grouped columns) must equal explicit unpack + dequant +
    masked softmax, with the new_kv register fold on the same ±7 grid."""
    from bitsandbytes_sycl_tpu.engine.paged import _pack4, _scale_cols
    from bitsandbytes_sycl_tpu.ops.paged_attention import (
        paged_decode_attention_int8_stacked,
    )

    Lyr, B, S, Hq, Hkv, D, P = 2, 3, 512, 4, 2, 128, 128
    npg = S // P
    NP = B * npg + 1
    rng = np.random.default_rng(23)
    c4k = rng.integers(-7, 8, (Lyr, NP, Hkv, P, D)).astype(np.int8)
    c4v = rng.integers(-7, 8, (Lyr, NP, Hkv, P, D)).astype(np.int8)
    ks_log = jnp.asarray(rng.uniform(0.5, 2.0, (Lyr, NP, Hkv, P)).astype(np.float32))
    vs_log = jnp.asarray(rng.uniform(0.5, 2.0, (Lyr, NP, Hkv, P)).astype(np.float32))
    ksp, vsp = _scale_cols(ks_log, 3), _scale_cols(vs_log, 3)  # pool order
    kp = _pack4(jnp.asarray((c4k.astype(np.int32) * 18).astype(np.int8)), tok_axis=3)
    vp = _pack4(jnp.asarray((c4v.astype(np.int32) * 18).astype(np.int8)), tok_axis=3)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32)
    table = jnp.asarray(np.arange(1, NP).reshape(B, npg).astype(np.int32))
    lengths = jnp.asarray([511, 200, 1], jnp.int32)
    kn = jnp.asarray(rng.integers(-7, 8, (B, Hkv, D)).astype(np.int8))
    vn = jnp.asarray(rng.integers(-7, 8, (B, Hkv, D)).astype(np.int8))
    ksn = jnp.asarray(rng.uniform(0.5, 2.0, (B, Hkv)).astype(np.float32))
    vsn = jnp.asarray(rng.uniform(0.5, 2.0, (B, Hkv)).astype(np.float32))
    li = 1

    got = paged_decode_attention_int8_stacked(
        q, kp, ksp, vp, vsp, li, table, lengths, new_kv=(kn, ksn, vn, vsn))
    assert got is not None

    # explicit reference: unpack -> dequant (absmax/7) -> gather logical
    # sequence -> append token -> masked softmax attend
    R = Hq // Hkv
    sm = 1.0 / np.sqrt(D)
    for b in range(B):
        n = int(lengths[b])
        ks_rows, vs_rows = [], []
        k_rows, v_rows = [], []
        for j in range(npg):
            pid = int(table[b, j])
            k_rows.append(np.asarray(L._kv4_unpack(kp[li, pid])))  # (Hkv,P,D)
            v_rows.append(np.asarray(L._kv4_unpack(vp[li, pid])))
            ks_rows.append(np.asarray(ks_log[li, pid]))  # logical order
            vs_rows.append(np.asarray(vs_log[li, pid]))
        kseq = np.concatenate(k_rows, axis=1)[:, :n, :].astype(np.float32)
        vseq = np.concatenate(v_rows, axis=1)[:, :n, :].astype(np.float32)
        kss = np.concatenate(ks_rows, axis=1)[:, :n]
        vss = np.concatenate(vs_rows, axis=1)[:, :n]
        kf = kseq * (kss[:, :, None] / 7.0)
        vf = vseq * (vss[:, :, None] / 7.0)
        kf = np.concatenate(
            [kf, (np.asarray(kn[b], np.float32) * np.asarray(ksn[b])[:, None] / 7.0)[:, None, :]],
            axis=1)
        vf = np.concatenate(
            [vf, (np.asarray(vn[b], np.float32) * np.asarray(vsn[b])[:, None] / 7.0)[:, None, :]],
            axis=1)
        for h in range(Hkv):
            for r in range(R):
                qv = np.asarray(q[b, 0, h * R + r], np.float32)
                sc = (kf[h] @ qv) * sm
                w = np.exp(sc - sc.max())
                w /= w.sum()
                want = w @ vf[h]
                np.testing.assert_allclose(
                    np.asarray(got[b, 0, h * R + r]), want, rtol=2e-4, atol=2e-4)


def test_flush_paged_writes_kv4_pairs_without_reading():
    """Two consecutive flushes (even offset then odd) must land both
    tokens of a shared byte row WITHOUT reading the pool: the even write
    lands (nib<<4), the odd write rebuilds the byte from the nib_prev
    staging leaf. Scales land at the parity-grouped column index."""
    Lyr, B, H, D, P, NP = 2, 2, 2, 8, 128, 4
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (Lyr, NP, H, P // 2, D)).astype(np.uint8)
    cache = {
        "k": jnp.asarray(base), "v": jnp.asarray(base.copy()),
        "k_scale": jnp.zeros((Lyr, NP, H, P), jnp.float32),
        "v_scale": jnp.zeros((Lyr, NP, H, P), jnp.float32),
        "write_page": jnp.asarray([1, 3], jnp.int32),
        "write_off": jnp.asarray([40, 40], jnp.int32),  # even offsets
        "page_table": jnp.zeros((B, 2), jnp.int32),
        "nib_prev_k": jnp.zeros((Lyr, B, H, D), jnp.uint8),
        "nib_prev_v": jnp.zeros((Lyr, B, H, D), jnp.uint8),
    }
    pk0 = rng.integers(-7, 8, (Lyr, B, H, D)).astype(np.int8)
    pv0 = rng.integers(-7, 8, (Lyr, B, H, D)).astype(np.int8)
    pk1 = rng.integers(-7, 8, (Lyr, B, H, D)).astype(np.int8)
    pv1 = rng.integers(-7, 8, (Lyr, B, H, D)).astype(np.int8)

    def flush(cache, pk, pv, sval):
        cache = L.init_pend(dict(cache))
        for li in range(Lyr):
            L._stage_pend(cache, li,
                          jnp.asarray(pk[li][:, None, :, :]),
                          jnp.full((B, 1, H), sval, jnp.float32),
                          jnp.asarray(pv[li][:, None, :, :]),
                          jnp.full((B, 1, H), sval, jnp.float32))
        return L.flush_paged_writes(cache)

    cache = flush(cache, pk0, pv0, 1.5)  # token at off 40 (even)
    cache["write_off"] = jnp.asarray([41, 41], jnp.int32)
    cache = flush(cache, pk1, pv1, 2.5)  # token at off 41 (odd)

    got_k = np.asarray(cache["k"])
    got_ks = np.asarray(cache["k_scale"])
    half = P // 2
    for b, page in enumerate([1, 3]):
        for li in range(Lyr):
            codes = np.asarray(L._kv4_unpack(got_k[li, page, :, 20:21, :]))
            np.testing.assert_array_equal(codes[:, 0, :], pk0[li, b])  # tok 40
            np.testing.assert_array_equal(codes[:, 1, :], pk1[li, b])  # tok 41
        # scale columns: token 40 -> c = 20, token 41 -> c = half + 20
        assert got_ks[0, page, 0, 20] == 1.5
        assert got_ks[0, page, 0, half + 20] == 2.5
    # every other byte row untouched
    mask = np.ones_like(base, bool)
    for page in (1, 3):
        mask[:, page, :, 20, :] = False
    np.testing.assert_array_equal(got_k[mask], base[mask])


def test_engine_paged_kv4_generates_deterministically():
    """End-to-end: a kv_bits=4 paged engine serves mixed prompts through
    the kernel path (D=128) and the gather fallback (hd=64); pool leaves
    are packed uint8 at half the rows; generation is deterministic
    (two fresh engines agree); the int8 twin serves the same prompts
    (kv4 is opt-in, not a fork of the machinery)."""
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7, 6, 5, 4, 3, 2, 1]]
    for hd in (128, 64):
        mcfg = L.LlamaConfig.tiny(
            hidden_size=256, num_heads=2, num_kv_heads=1, head_dim=hd,
            max_seq_len=256, kv_bits=4,
        )
        params = L.init_params(mcfg, jax.random.PRNGKey(0))
        eng = InferenceEngine(mcfg, params, EngineConfig(max_batch=2, paged=True))
        assert eng.cache["v"].dtype == jnp.uint8
        assert eng.cache["v"].shape[3] == eng.ecfg.page_size // 2  # pair rows
        assert eng.cache["v"].shape[4] == hd
        out = eng.generate(prompts, max_new_tokens=6)
        assert all(len(o) == 6 for o in out)
        eng2 = InferenceEngine(mcfg, params, EngineConfig(max_batch=2, paged=True))
        assert eng2.generate(prompts, max_new_tokens=6) == out

        # int8 twin: same machinery must serve kv_bits=8 (token identity
        # is NOT asserted — the accuracy class differs)
        mcfg8 = L.LlamaConfig.tiny(
            hidden_size=256, num_heads=2, num_kv_heads=1, head_dim=hd,
            max_seq_len=256,
        )
        eng8 = InferenceEngine(mcfg8, params, EngineConfig(max_batch=2, paged=True))
        out8 = eng8.generate(prompts, max_new_tokens=6)
        assert all(len(o) == 6 for o in out8)


def test_engine_paged_kv4_serves_gptj_substrate():
    """kv_bits=4 composes with forward_fn families (Falcon MQA on the
    gptj substrate): pool packs, generation runs and is deterministic —
    detection is by pool dtype, so the shared write_and_attend path
    needs no per-family wiring beyond the config field."""
    from bitsandbytes_sycl_tpu.models.falcon import FalconConfig, falcon_forward
    from bitsandbytes_sycl_tpu.models.gptj import init_gptj_kv_cache, init_gptj_params

    cfg = FalconConfig.tiny(
        hidden_size=256, num_heads=2, kv_heads=1, head_dim=128,
        rotary_dim=128, max_seq_len=256, kv_quant=True, quant="nf4",
        kv_bits=4,
    )
    params = init_gptj_params(cfg, jax.random.PRNGKey(0))
    prompts = [[1, 2, 3, 4], [9, 8, 7, 6, 5]]
    kw = dict(forward_fn=falcon_forward, init_cache_fn=init_gptj_kv_cache)
    ep = InferenceEngine(cfg, params, EngineConfig(max_batch=2, paged=True), **kw)
    assert ep.cache["v"].dtype == jnp.uint8
    out = ep.generate(prompts, max_new_tokens=6)
    assert all(len(o) == 6 for o in out)
    ep2 = InferenceEngine(cfg, params, EngineConfig(max_batch=2, paged=True), **kw)
    assert ep2.generate(prompts, max_new_tokens=6) == out
