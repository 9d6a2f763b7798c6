"""Pallas kernel tests — run in interpreter mode on the CPU mesh (the
compiled path is exercised on the real chip by bench.py / verify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bitsandbytes_sycl_tpu as bnb
from bitsandbytes_sycl_tpu import functional as F
from bitsandbytes_sycl_tpu.ops import (
    QLinearWeight,
    matmul_4bit_fused,
    quantize_4bit_native,
    to_kernel_layout,
)
from bitsandbytes_sycl_tpu.ops.common import from_kernel_layout


@pytest.fixture(scope="module")
def weight():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(256, 1024)) * 0.02, jnp.float32)


@pytest.mark.parametrize("quant_type", ["nf4", "fp4", "int4"])
def test_native_quantize_matches_reference(weight, quant_type):
    """Kernel-layout quantization must produce the same dequantized values
    as the bnb-format functional path (same codebooks, same rounding)."""
    qw = quantize_4bit_native(weight, blocksize=64, quant_type=quant_type)
    packed_ref, qs_ref = F.quantize_4bit(weight, blocksize=64, quant_type=quant_type)
    d_native = np.asarray(qw.dequantize(), np.float32)
    d_ref = np.asarray(F.dequantize_4bit(packed_ref, qs_ref), np.float32)
    np.testing.assert_allclose(d_native, d_ref, atol=1e-6)


def test_kernel_layout_roundtrip(weight):
    """bnb paired format -> kernel layout -> bnb format is lossless."""
    packed, qs = F.quantize_4bit(weight, blocksize=64, quant_type="nf4")
    qw = to_kernel_layout(packed, qs)
    packed2, qs2 = from_kernel_layout(qw)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(packed2))
    np.testing.assert_allclose(np.asarray(qs.absmax), np.asarray(qs2.absmax), atol=0)


@pytest.mark.parametrize("quant_type", ["nf4", "int4"])
@pytest.mark.parametrize("M", [1, 8, 32])
def test_matmul_4bit_fused_interpret(weight, quant_type, M):
    qw = quantize_4bit_native(weight, blocksize=64, quant_type=quant_type)
    rng = np.random.default_rng(M)
    x = jnp.asarray(rng.normal(size=(M, 1024)), jnp.float32)
    y = matmul_4bit_fused(x, qw, compute_dtype=jnp.float32)
    ref = np.asarray(x) @ np.asarray(qw.dequantize(), np.float32).T
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("quant_type", ["nf4", "fp4", "int4", "af4"])
@pytest.mark.parametrize("compressed", [False, True])
def test_dequantize_transposed_kernel(weight, quant_type, compressed):
    """The standalone dequant kernel (backs the large-M prefill route and
    fast dequantize) must reproduce the exact dequantized weight."""
    from bitsandbytes_sycl_tpu.ops.matmul_4bit import dequantize_transposed

    qw = quantize_4bit_native(
        weight, blocksize=64, quant_type=quant_type, compress_statistics=compressed
    )
    Wt = dequantize_transposed(qw, out_dtype=jnp.float32)
    ref = np.asarray(qw.dequantize(), np.float32).T
    np.testing.assert_allclose(np.asarray(Wt), ref, rtol=1e-6, atol=1e-6)


def test_matmul_4bit_prefill_hbm_route(weight):
    """M >= PREFILL_MIN_M takes the dequant-once-to-HBM + dense-matmul
    route (reference MatMul4Bit forward, autograd/_functions.py:507) and
    must match the exact dequant matmul; ragged M needs no padding."""
    from bitsandbytes_sycl_tpu.ops import matmul_4bit as m4

    qw = quantize_4bit_native(weight, blocksize=64, quant_type="nf4")
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(300, 1024)), jnp.float32)
    calls = {"n": 0}
    orig = m4.dequantize_transposed

    def counted(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    saved = m4.PREFILL_MIN_M
    m4.dequantize_transposed, m4.PREFILL_MIN_M = counted, 256
    try:
        y = m4.matmul_4bit_fused(x, qw, compute_dtype=jnp.float32)
    finally:
        m4.dequantize_transposed, m4.PREFILL_MIN_M = orig, saved
    assert calls["n"] == 1, "HBM-dequant route not taken at M=300"
    assert y.shape == (300, 256)
    ref = np.asarray(x) @ np.asarray(qw.dequantize(), np.float32).T
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-2, atol=2e-2)

    # bias flows through the route too
    b = jnp.arange(256, dtype=jnp.float32) * 0.01
    m4.PREFILL_MIN_M = 256
    try:
        yb = m4.matmul_4bit_fused(x, qw, bias=b, compute_dtype=jnp.float32)
    finally:
        m4.PREFILL_MIN_M = saved
    np.testing.assert_allclose(np.asarray(yb), ref + np.asarray(b), rtol=2e-2, atol=2e-2)


def test_tm_candidates_vmem_cap():
    """Large m-tiles amortize per-tile decode but are capped so x blocks
    fit VMEM: big tkb (whole-half K, e.g. llama down_proj) must exclude
    the 1024-row tiles that would blow the budget."""
    from bitsandbytes_sycl_tpu.ops.matmul_4bit import _tm_candidates

    assert _tm_candidates(512, jnp.bfloat16)[0] == 1024
    assert _tm_candidates(5504, jnp.bfloat16)[0] <= 256
    assert _tm_candidates(512, jnp.float32)[0] <= 1024


def test_matmul_4bit_fused_bias(weight):
    qw = quantize_4bit_native(weight, blocksize=64, quant_type="nf4")
    b = jnp.asarray(np.random.default_rng(7).normal(size=(256,)), jnp.float32)
    x = jnp.ones((8, 1024), jnp.float32)
    y = matmul_4bit_fused(x, qw, bias=b, compute_dtype=jnp.float32)
    ref = np.ones((8, 1024)) @ np.asarray(qw.dequantize(), np.float32).T + np.asarray(b)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-2, atol=2e-2)


def test_matmul_4bit_fused_fallback_shapes():
    """K=96 isn't divisible by 2*64 -> quantize_4bit_native refuses."""
    W = jnp.asarray(np.random.default_rng(1).normal(size=(64, 96)), jnp.float32)
    with pytest.raises(ValueError):
        quantize_4bit_native(W, blocksize=64, quant_type="nf4")


def test_matmul_4bit_whole_half_routing():
    """Weights whose packed half is not a multiple of 8 quant blocks
    (llama-7B down_proj K=11008 -> one whole-half 5504-row k tile) must
    (a) cap the fused kernel's m-tile at UNALIGNED_TM_MAX — tm=256 there
    exceeds Mosaic's 16 MB scoped-VMEM stack on v5e (measured 24 MB) —
    and (b) cross over to the dequant-once-to-HBM route at the LOWER
    PREFILL_MIN_M_UNALIGNED threshold, where the per-m-tile weight
    re-decode already dominates."""
    from bitsandbytes_sycl_tpu.ops import matmul_4bit as m4

    K = 1408  # half = 704 = 11 blocks of 64: not 8-block aligned
    rng = np.random.default_rng(7)
    W = jnp.asarray(rng.normal(size=(256, K)) * 0.02, jnp.float32)
    qw = quantize_4bit_native(W, blocksize=64, quant_type="nf4")
    tn, tkb = m4._nk_tiles(qw, 256, K)
    assert tkb == K // 2  # the whole-half escape hatch fired
    assert max(m4._tm_candidates(tkb, jnp.bfloat16, True)) <= m4.UNALIGNED_TM_MAX

    calls = {"n": 0}
    orig = m4.dequantize_transposed

    def counted(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    m4.dequantize_transposed = counted
    try:
        ref = lambda x: np.asarray(x) @ np.asarray(qw.dequantize(), np.float32).T
        # M just above the unaligned crossover: HBM-dequant route
        x = jnp.asarray(rng.normal(size=(m4.PREFILL_MIN_M_UNALIGNED, K)), jnp.float32)
        y = m4.matmul_4bit_fused(x, qw, compute_dtype=jnp.float32)
        assert calls["n"] == 1, "unaligned-half weight did not take the HBM route"
        np.testing.assert_allclose(np.asarray(y), ref(x), rtol=2e-2, atol=2e-2)
        # M below it: fused kernel (no dequant call), tm capped
        x2 = jnp.asarray(rng.normal(size=(128, K)), jnp.float32)
        y2 = m4.matmul_4bit_fused(x2, qw, compute_dtype=jnp.float32)
        assert calls["n"] == 1
        np.testing.assert_allclose(np.asarray(y2), ref(x2), rtol=2e-2, atol=2e-2)
    finally:
        m4.dequantize_transposed = orig


def test_gemv_4bit_auto_routes_to_fused_kernel(weight):
    """Concrete bnb-format weights hit the fused kernel through a cached
    one-time repack (reference auto-dispatch, _functions.py:565-575)."""
    packed, qs = F.quantize_4bit(weight, blocksize=64, quant_type="nf4")
    x = jnp.asarray(np.random.default_rng(5).normal(size=(1, 1024)), jnp.float32)
    qw = F._route_fused_4bit(x, packed, qs)
    assert isinstance(qw, QLinearWeight)
    assert F._route_fused_4bit(x, packed, qs) is qw  # cache hit, same object
    y = F.gemv_4bit(x, packed, qs)
    ref = np.asarray(x) @ np.asarray(F.dequantize_4bit(packed, qs), np.float32).T
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-2, atol=2e-2)


def test_matmul_4bit_routed_grad(weight):
    """autograd.matmul_4bit routes to the kernel and stays differentiable."""
    from bitsandbytes_sycl_tpu.autograd import matmul_4bit

    packed, qs = F.quantize_4bit(weight, blocksize=64, quant_type="nf4")
    x = jnp.asarray(np.random.default_rng(6).normal(size=(8, 1024)), jnp.float32)
    y = matmul_4bit(x, packed, qs)
    ref = np.asarray(x) @ np.asarray(F.dequantize_4bit(packed, qs), np.float32).T
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-2, atol=2e-2)
    g = jax.grad(lambda x: matmul_4bit(x, packed, qs).sum())(x)
    gref = np.ones((8, 256), np.float32) @ np.asarray(F.dequantize_4bit(packed, qs), np.float32)
    np.testing.assert_allclose(np.asarray(g), gref, rtol=5e-2, atol=5e-3)


def test_gemv_4bit_traced_weight_falls_back(weight):
    """Inside jit the weight is a tracer: the dequant path must be taken
    (no host-side repack), with identical results."""
    import dataclasses

    packed, qs = F.quantize_4bit(weight, blocksize=64, quant_type="nf4")
    x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 1024)), jnp.float32)

    @jax.jit
    def f(x, p, am):
        return F.gemv_4bit(x, p, dataclasses.replace(qs, absmax=am))

    y = f(x, packed, qs.absmax)
    ref = np.asarray(x) @ np.asarray(F.dequantize_4bit(packed, qs), np.float32).T
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_matmul_4bit_kernel_grad(weight):
    from bitsandbytes_sycl_tpu.autograd import matmul_4bit_kernel

    qw = quantize_4bit_native(weight, blocksize=64, quant_type="nf4")
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 1024)), jnp.float32)
    g = jax.grad(lambda x: matmul_4bit_kernel(x, qw, None).sum())(x)
    ref = np.ones((8, 256), np.float32) @ np.asarray(qw.dequantize(), np.float32)
    # f32 accumulation-order differences only
    np.testing.assert_allclose(np.asarray(g), ref, rtol=5e-2, atol=5e-3)


def test_odd_m_padding(weight):
    qw = quantize_4bit_native(weight, blocksize=64, quant_type="nf4")
    x = jnp.asarray(np.random.default_rng(3).normal(size=(5, 1024)), jnp.float32)
    y = matmul_4bit_fused(x, qw, compute_dtype=jnp.float32)
    assert y.shape == (5, 256)
    ref = np.asarray(x) @ np.asarray(qw.dequantize(), np.float32).T
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-2, atol=2e-2)


def test_3d_input(weight):
    qw = quantize_4bit_native(weight, blocksize=64, quant_type="nf4")
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 4, 1024)), jnp.float32)
    y = matmul_4bit_fused(x, qw, compute_dtype=jnp.float32)
    assert y.shape == (2, 4, 256)


def test_qlinearweight_is_pytree(weight):
    qw = quantize_4bit_native(weight, blocksize=64, quant_type="nf4")
    leaves, treedef = jax.tree_util.tree_flatten(qw)
    qw2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert qw2.blocksize == 64 and qw2.quant_type == "nf4"


# --- compressed statistics (nested absmax, reference functional.py:1243-1257) ---


def test_compress_absmax_roundtrip(weight):
    from bitsandbytes_sycl_tpu.ops.common import compress_absmax, decode_absmax

    qw = quantize_4bit_native(weight, blocksize=64, quant_type="nf4")
    codes, scale, offset = compress_absmax(qw.absmax)
    assert codes.dtype == jnp.uint8 and scale.shape == (2, 1, 256) == offset.shape
    dec = np.asarray(decode_absmax(codes, scale, offset))
    ref = np.asarray(qw.absmax)
    # dynamic-map half-step of the per-column range
    rng = np.asarray(scale).max()
    assert np.abs(dec - ref).max() <= 0.008 * rng + 1e-7


def test_quantize_native_compressed_accuracy(weight):
    """Compressed scales must stay inside the reference NF4 accuracy
    envelope (mean abs matmul err < 0.115, tests_pvc/autograd.py:389)."""
    qw = quantize_4bit_native(weight, blocksize=64, quant_type="nf4", compress_statistics=True)
    assert qw.compressed and qw.absmax.dtype == jnp.uint8
    d = np.asarray(qw.dequantize(), np.float32)
    w = np.asarray(weight)
    raw = np.asarray(
        quantize_4bit_native(weight, blocksize=64, quant_type="nf4").dequantize(), np.float32
    )
    # scale compression adds at most ~1% on top of NF4's own error
    assert np.abs(d - w).mean() <= np.abs(raw - w).mean() * 1.05


@pytest.mark.parametrize("quant_type", ["nf4", "int4"])
@pytest.mark.parametrize("M", [1, 8])
def test_matmul_4bit_fused_compressed(weight, quant_type, M):
    qw = quantize_4bit_native(
        weight, blocksize=64, quant_type=quant_type, compress_statistics=True
    )
    rng = np.random.default_rng(M)
    x = jnp.asarray(rng.normal(size=(M, 1024)), jnp.float32)
    y = matmul_4bit_fused(x, qw, compute_dtype=jnp.float32)
    ref = np.asarray(x) @ np.asarray(qw.dequantize(), np.float32).T
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-2, atol=2e-2)


def test_to_kernel_layout_inherits_nested(weight):
    """A nested bnb QuantState stays 8-bit in kernel layout (the round-1
    layout eagerly decompressed to f32, losing the bandwidth win)."""
    packed, qs = F.quantize_4bit(weight, blocksize=64, quant_type="nf4", compress_statistics=True)
    assert qs.nested
    qw = to_kernel_layout(packed, qs)
    assert qw.compressed and qw.absmax.dtype == jnp.uint8
    d_kernel = np.asarray(qw.dequantize(), np.float32)
    d_bnb = np.asarray(F.dequantize_4bit(packed, qs), np.float32)
    # same codec precision class, different grouping: small scale noise only
    denom = np.abs(d_bnb).max()
    assert np.abs(d_kernel - d_bnb).max() <= 0.02 * denom


def test_bf16_absmax_storage(weight):
    """bf16 scale storage: half the scale memory, raw kernel path (the
    kernel casts scales to its decode dtype anyway — measured free)."""
    qw = quantize_4bit_native(weight, blocksize=64, quant_type="nf4", absmax_dtype=jnp.bfloat16)
    assert qw.absmax.dtype == jnp.bfloat16 and not qw.compressed
    x = jnp.asarray(np.random.default_rng(9).normal(size=(8, 1024)), jnp.float32)
    y = matmul_4bit_fused(x, qw, compute_dtype=jnp.float32)
    ref = np.asarray(x) @ np.asarray(qw.dequantize(), np.float32).T
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-2, atol=2e-2)
    # accuracy stays within ~bf16 rounding of the f32-scale path
    raw = np.asarray(
        quantize_4bit_native(weight, blocksize=64, quant_type="nf4").dequantize(), np.float32
    )
    d = np.asarray(qw.dequantize(), np.float32)
    w = np.asarray(weight)
    assert np.abs(d - w).mean() <= np.abs(raw - w).mean() * 1.01


def test_compressed_pspec_and_row_retile(weight):
    from bitsandbytes_sycl_tpu.parallel.mesh import qweight_pspec, retile_qweight_row_tp

    qw = quantize_4bit_native(weight, blocksize=64, quant_type="nf4", compress_statistics=True)
    spec = qweight_pspec(qw, "col")
    assert spec.absmax_scale is not None  # sidecars got specs, not arrays
    ref = np.asarray(qw.dequantize(), np.float32)  # (N, K)
    tp = 4
    rt = retile_qweight_row_tp(qw, tp)
    assert rt.compressed
    # each device's slice is a self-consistent local planar pack of its
    # contiguous K range (sidecars replicated); validate slice by slice
    N, K = qw.shape
    Kd = K // tp
    for d in range(tp):
        local = QLinearWeight(
            packed=rt.packed[d * Kd // 2 : (d + 1) * Kd // 2],
            absmax=rt.absmax[:, d * Kd // (2 * 64) : (d + 1) * Kd // (2 * 64)],
            shape=(N, Kd),
            blocksize=64,
            quant_type="nf4",
            dtype=rt.dtype,
            absmax_scale=rt.absmax_scale,
            absmax_offset=rt.absmax_offset,
        )
        dloc = np.asarray(local.dequantize(), np.float32)
        # nibbles exact; scales re-encode once more (one extra half-step)
        assert np.abs(dloc - ref[:, d * Kd : (d + 1) * Kd]).max() <= 0.02 * np.abs(ref).max()


# ---------------------------------------------------------------------------
# fused LLM.int8() kernel (ops/matmul_int8.py)
# ---------------------------------------------------------------------------

from bitsandbytes_sycl_tpu.ops.matmul_int8 import int8_matmul_fused


@pytest.mark.parametrize("M", [1, 8, 24])
def test_int8_matmul_fused_matches_jnp_path(M):
    rng = np.random.default_rng(M)
    W = jnp.asarray(rng.normal(size=(256, 512)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(M, 512)), jnp.float32)
    CB, SCB = F.int8_vectorwise_quant(W)
    row_absmax = jnp.max(jnp.abs(x), axis=1)
    out = int8_matmul_fused(x, CB, SCB, row_absmax, out_dtype=jnp.float32)
    assert out is not None and out.shape == (M, 256)
    CA, SCA = F.int8_vectorwise_quant(x)
    ref = F.int8_mm_dequant(F.int8_linear_matmul(CA, CB), SCA, SCB, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_int8_matmul_fused_bias_and_untileable():
    rng = np.random.default_rng(3)
    W = jnp.asarray(rng.normal(size=(256, 512)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(8, 512)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(256,)), jnp.float32)
    row_absmax = jnp.max(jnp.abs(x), axis=1)
    CB, SCB = F.int8_vectorwise_quant(W)
    out = int8_matmul_fused(x, CB, SCB, row_absmax, bias=bias, out_dtype=jnp.float32)
    ref = int8_matmul_fused(x, CB, SCB, row_absmax, out_dtype=jnp.float32) + bias[None, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    # K=100 not tileable -> kernel declines, caller falls back
    assert int8_matmul_fused(x[:, :100], CB[:, :100], SCB, row_absmax) is None


@pytest.mark.parametrize("threshold", [0.0, 2.5])
def test_llm_int8_matmul_fused_vs_reference_path(threshold):
    """Full llm_int8_matmul with use_fused=True (interpreted Pallas) must
    match the pure-jnp path, outlier sidecar included."""
    rng = np.random.default_rng(11)
    W = jnp.asarray(rng.normal(size=(256, 512)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(8, 512)), jnp.float32)
    x = x.at[:, 7].set(8.0)  # force an outlier column past threshold
    CB, SCB = F.int8_vectorwise_quant(W)
    out_fused = F.llm_int8_matmul(x, CB, SCB, threshold=threshold, use_fused=True)
    out_ref = F.llm_int8_matmul(x, CB, SCB, threshold=threshold, use_fused=False)
    np.testing.assert_allclose(
        np.asarray(out_fused, np.float32), np.asarray(out_ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_llm_int8_static_outliers_matches_dynamic():
    """With the true outlier column set passed statically, the static path
    must match dynamic per-call detection."""
    rng = np.random.default_rng(21)
    W = jnp.asarray(rng.normal(size=(256, 512)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(8, 512)), jnp.float32)
    x = x.at[:, 31].set(9.0).at[:, 400].set(-7.5)
    CB, SCB = F.int8_vectorwise_quant(W)
    col_absmax = np.max(np.abs(np.asarray(x)), axis=0)
    idx = jnp.asarray(np.where(col_absmax >= 6.0)[0], jnp.int32)
    ol = F.llm_int8_prepare_outliers(CB, SCB, idx)
    out_static = F.llm_int8_matmul(x, CB, SCB, threshold=6.0, outliers=ol, use_fused=False)
    out_dyn = F.llm_int8_matmul(x, CB, SCB, threshold=6.0, use_fused=False)
    np.testing.assert_allclose(
        np.asarray(out_static, np.float32), np.asarray(out_dyn, np.float32), rtol=1e-4, atol=1e-4
    )
    # fused kernel variant agrees too
    out_static_f = F.llm_int8_matmul(x, CB, SCB, threshold=6.0, outliers=ol, use_fused=True)
    np.testing.assert_allclose(
        np.asarray(out_static_f, np.float32), np.asarray(out_dyn, np.float32), rtol=2e-2, atol=2e-2
    )


def test_linear8bitlt_outlier_idx_module():
    import flax.linen as fnn
    from bitsandbytes_sycl_tpu.nn import Linear8bitLt

    layer = Linear8bitLt(features=128, threshold=6.0, outlier_idx=(3, 77), compute_dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(4, 256)), jnp.float32)
    variables = layer.init(jax.random.key(0), x)
    assert "outliers" in variables["quants"]["weight"]
    y = layer.apply(variables, x)
    assert y.shape == (4, 128) and bool(jnp.all(jnp.isfinite(y)))


# ---------------------------------------------------------------------------
# flash-decode int8-KV attention kernel (ops/attention.py)
# ---------------------------------------------------------------------------

from bitsandbytes_sycl_tpu.models import llama as L
from bitsandbytes_sycl_tpu.ops.attention import decode_attention_int8


@pytest.mark.parametrize("gqa", [1, 2])
def test_decode_attention_int8_matches_dequant_path(gqa):
    B, S, Hkv, D = 2, 256, 4, 128
    Hq = Hkv * gqa
    rng = np.random.default_rng(gqa)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    kq, ks = L._kv_quantize(k)
    vq, vs = L._kv_quantize(v)
    lengths = jnp.asarray([117, 256], jnp.int32)

    # kernel cache layouts: K transposed (B,H,D,S), V (B,H,S,D)
    kqh, ksh = kq.transpose(0, 2, 3, 1), ks.transpose(0, 2, 1)
    vqh, vsh = vq.transpose(0, 2, 1, 3), vs.transpose(0, 2, 1)
    out = decode_attention_int8(q, kqh, ksh, vqh, vsh, lengths)
    assert out is not None and out.shape == (B, 1, Hq, D)

    kf = L._kv_dequantize(kq, ks, jnp.float32)
    vf = L._kv_dequantize(vq, vs, jnp.float32)
    mask = jnp.arange(S)[None, None, :] < lengths[:, None, None]
    ref = L._attention(q, kf, vf, mask, jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 5e-3, rel


def test_decode_attention_int8_declines_untileable():
    q = jnp.zeros((2, 1, 4, 64), jnp.float32)  # D=64 < 128
    kq = jnp.zeros((2, 4, 64, 256), jnp.int8)
    vq = jnp.zeros((2, 4, 256, 64), jnp.int8)
    ks = jnp.zeros((2, 4, 256), jnp.float32)
    assert decode_attention_int8(q, kq, ks, vq, ks, jnp.ones(2, jnp.int32)) is None


@pytest.mark.parametrize("gqa", [1, 2])
def test_prefill_attention_int8_matches_dequant_path(gqa):
    from bitsandbytes_sycl_tpu.ops.attention import prefill_attention_int8

    B, T, S, Hkv, D = 2, 32, 256, 2, 128
    Hq = Hkv * gqa
    rng = np.random.default_rng(gqa + 10)
    q = jnp.asarray(rng.normal(size=(B, T, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    kq, ks = L._kv_quantize(k)
    vq, vs = L._kv_quantize(v)
    starts = jnp.asarray([0, 37], jnp.int32)  # batch 1 continues from pos 37

    kqt, ksh = kq.transpose(0, 2, 3, 1), ks.transpose(0, 2, 1)
    vqh, vsh = vq.transpose(0, 2, 1, 3), vs.transpose(0, 2, 1)
    out = prefill_attention_int8(q, kqt, ksh, vqh, vsh, starts, tq=16, ts=128)
    assert out is not None and out.shape == (B, T, Hq, D)

    kf = L._kv_dequantize(kq, ks, jnp.float32)
    vf = L._kv_dequantize(vq, vs, jnp.float32)
    # reference causal-with-offset mask: s <= start_b + t
    s_ids = jnp.arange(S)[None, None, :]
    q_pos = (starts[:, None] + jnp.arange(T)[None, :])[:, :, None]
    mask = s_ids <= q_pos
    ref = L._attention(q, kf, vf, mask, jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 5e-3, rel


def test_decode_attention_zero_length_slot_outputs_zeros():
    """A slot with 0 valid cache tokens must yield zeros, not the mean of
    the (stale) V cache."""
    B, S, H, D = 2, 128, 2, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    kq, ks = L._kv_quantize(k)
    vq, vs = L._kv_quantize(v)
    out = decode_attention_int8(
        q, kq.transpose(0, 2, 3, 1), ks.transpose(0, 2, 1),
        vq.transpose(0, 2, 1, 3), vs.transpose(0, 2, 1),
        jnp.asarray([0, 64], jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)
    assert float(jnp.abs(out[1]).max()) > 0


def test_fused_matmuls_handle_empty_batch():
    """M=0 must not crash the kernel entry points (CLAUDE.md convention:
    untileable -> fall back / decline)."""
    rng = np.random.default_rng(1)
    W = jnp.asarray(rng.normal(size=(256, 512)), jnp.float32)
    qw = quantize_4bit_native(W, blocksize=64, quant_type="nf4")
    y = matmul_4bit_fused(jnp.zeros((0, 512), jnp.float32), qw, compute_dtype=jnp.float32)
    assert y.shape == (0, 256)
    CB, SCB = F.int8_vectorwise_quant(W)
    assert int8_matmul_fused(jnp.zeros((0, 512)), CB, SCB, jnp.zeros((0,))) is None


# --- W4A8 path (ops/matmul_w4a8.py) ---


@pytest.mark.parametrize("K", [1024, 2048])  # 2048 exercises nk>1 k-steps
def test_matmul_4bit_w4a8_matches_quantized_reference(K):
    """Kernel must equal the explicit numpy model of the same math:
    int8 row-quantized activations x int8 weight codes x block scales."""
    from bitsandbytes_sycl_tpu.ops import matmul_4bit_w4a8

    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(256, K)) * 0.02, jnp.float32)
    qw = quantize_4bit_native(W, blocksize=64, quant_type="nf4")
    x = jnp.asarray(rng.normal(size=(8, K)), jnp.float32)
    y = np.asarray(matmul_4bit_w4a8(x, qw, out_dtype=jnp.float32))

    # numpy reference of the SAME quantization
    xn = np.asarray(x)
    ax = np.abs(xn).max(axis=1, keepdims=True)
    xq = np.clip(np.round(xn * 127.0 / ax), -127, 127)
    table = np.asarray([float(v) for v in qw.code])
    codes_i8 = np.round(table * 127.0)
    # dequantize weight on the int8 code grid
    packed = np.asarray(qw.packed)
    hi = (packed >> 4) & 0xF
    lo = packed & 0xF
    w_codes = np.concatenate([codes_i8[hi], codes_i8[lo]], axis=0)  # (K, N)
    scales = np.asarray(qw.scales_f32()).reshape(-1, 256)  # (K//bs, N)
    wsc = np.repeat(scales / 127.0, 64, axis=0)  # (K, N)
    ref = (xq @ (w_codes * wsc)) * (ax / 127.0)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("quant_type", ["nf4", "fp4", "af4"])
def test_matmul_4bit_w4a8_accuracy_envelope(weight, quant_type):
    """vs the exact fp32 matmul: W4A8 adds LLM.int8-class activation
    noise on top of the 4-bit codebook — must stay within a few percent
    (the int8 code table is generic over any 16-entry codebook)."""
    from bitsandbytes_sycl_tpu.ops import matmul_4bit_w4a8

    qw = quantize_4bit_native(weight, blocksize=64, quant_type=quant_type)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 1024)), jnp.float32)
    y = np.asarray(matmul_4bit_w4a8(x, qw, out_dtype=jnp.float32))
    exact = np.asarray(x) @ np.asarray(qw.dequantize(), np.float32).T
    rel = np.abs(y - exact).mean() / np.abs(exact).mean()
    assert rel < 0.02, rel  # int8 activation + code-grid noise


def test_matmul_4bit_w4a8_bias_and_fallback(weight):
    from bitsandbytes_sycl_tpu.ops import matmul_4bit_w4a8

    qw = quantize_4bit_native(weight, blocksize=64, quant_type="nf4")
    b = jnp.arange(256, dtype=jnp.float32) * 0.01
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 1024)), jnp.float32)
    y = np.asarray(matmul_4bit_w4a8(x, qw, bias=b, out_dtype=jnp.float32))
    y0 = np.asarray(matmul_4bit_w4a8(x, qw, out_dtype=jnp.float32))
    np.testing.assert_allclose(y, y0 + np.asarray(b), rtol=1e-5, atol=1e-5)

    # compressed scales route to the exact bf16 path (still correct)
    qwc = quantize_4bit_native(weight, blocksize=64, quant_type="nf4", compress_statistics=True)
    yc = np.asarray(matmul_4bit_w4a8(x, qwc, out_dtype=jnp.float32))
    ref = np.asarray(x) @ np.asarray(qwc.dequantize(), np.float32).T
    np.testing.assert_allclose(yc, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("bs", [64, 128])
def test_matmul_4bit_w4a8_grouped_matches_reference(bs):
    """Grouped mid-M kernel (r5): int32 accumulation across all blocks
    under the per-column regrid — must equal the explicit numpy model
    (codes regridded c' = round(c * absmax/colmax), one deep int8 dot,
    colmax/rowmax epilogue)."""
    from bitsandbytes_sycl_tpu.ops import matmul_4bit_w4a8_grouped

    K = 2048  # nk > 1 k-steps at bs=64 (tkb=512)
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(256, K)) * 0.02, jnp.float32)
    qw = quantize_4bit_native(W, blocksize=bs, quant_type="nf4")
    x = jnp.asarray(rng.normal(size=(300, K)), jnp.float32)  # pads to tm
    y = np.asarray(matmul_4bit_w4a8_grouped(x, qw, out_dtype=jnp.float32))

    xn = np.asarray(x)
    ax = np.abs(xn).max(axis=1, keepdims=True)
    xq = np.clip(np.round(xn * 127.0 / ax), -127, 127)
    table = np.asarray([float(v) for v in qw.code])
    codes_i8 = np.round(table * 127.0)
    packed = np.asarray(qw.packed)
    w_codes = np.concatenate(
        [codes_i8[(packed >> 4) & 0xF], codes_i8[packed & 0xF]], axis=0)  # (K, N)
    scales = np.asarray(qw.scales_f32()).reshape(-1, 256)  # (K//bs, N)
    colmax = scales.max(axis=0)
    f = np.repeat(scales * 127.0 / colmax, bs, axis=0)  # (K, N)
    wg = np.clip(np.round(w_codes * (f / 127.0)), -127, 127)
    ref = (xq @ wg) * (ax / 127.0) * (colmax / 127.0)[None, :]
    # f32-vs-f64 regrid/round TIES put a fraction of elements one int8
    # step off the f64 model; everything else must match to f32 rounding
    bad = ~np.isclose(y, ref, rtol=1e-4, atol=1e-4)
    assert bad.mean() < 0.01, f"{bad.mean():.4f} of elements off"
    assert np.abs(y - ref).max() < 0.01, np.abs(y - ref).max()


@pytest.mark.parametrize("qt", ["nf4", "int4", "fp4"])
def test_matmul_4bit_w4a8_grouped_envelope_and_fallback(weight, qt):
    """Same W8A8 accuracy class as the prefill route, for every 4-bit
    grid the router can send here (r5 routing includes int4 — decode
    amortizes over the m-tile so the arithmetic-decode edge is moot);
    compressed scales fall back to the exact path."""
    from bitsandbytes_sycl_tpu.ops import matmul_4bit_w4a8_grouped

    qw = quantize_4bit_native(weight, blocksize=64, quant_type=qt)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 1024)), jnp.float32)
    b = jnp.arange(256, dtype=jnp.float32) * 0.01
    y = np.asarray(matmul_4bit_w4a8_grouped(x, qw, bias=b, out_dtype=jnp.float32))
    exact = np.asarray(x) @ np.asarray(qw.dequantize(), np.float32).T + np.asarray(b)
    rel = np.abs(y - exact).mean() / np.abs(exact).mean()
    assert rel < 0.02, rel

    qwc = quantize_4bit_native(weight, blocksize=64, quant_type="nf4",
                               compress_statistics=True)
    yc = np.asarray(matmul_4bit_w4a8_grouped(x, qwc, out_dtype=jnp.float32))
    ref = np.asarray(x) @ np.asarray(qwc.dequantize(), np.float32).T
    np.testing.assert_allclose(yc, ref, rtol=2e-2, atol=2e-2)


def test_matmul_4bit_w4a8_grouped_grad(weight):
    """The grouped kernel is on the a8 prefill routing path, so QLoRA
    training steps differentiate through it: custom_vjp backward is the
    EXACT dequant path (straight-through w.r.t. activation quant),
    matching matmul_4bit_w4a8's contract (reference
    autograd/_functions.py:520-540)."""
    from bitsandbytes_sycl_tpu.ops import matmul_4bit_w4a8_grouped

    qw = quantize_4bit_native(weight, blocksize=64, quant_type="nf4")
    x = jnp.asarray(np.random.default_rng(2).normal(size=(16, 1024)), jnp.float32)

    def loss(x):
        return jnp.sum(matmul_4bit_w4a8_grouped(x, qw, out_dtype=jnp.float32) ** 2)

    g = np.asarray(jax.grad(loss)(x))
    y = np.asarray(matmul_4bit_w4a8_grouped(x, qw, out_dtype=jnp.float32))
    gref = 2.0 * y @ np.asarray(qw.dequantize(), np.float32)
    rel = np.linalg.norm(g - gref) / np.linalg.norm(gref)
    assert np.isfinite(g).all() and rel < 1e-5, rel


def test_matmul_4bit_fused_whole_half_tile():
    """K whose half isn't a multiple of 8 blocks (llama down_proj K=5632
    class) takes the whole-half-plane escape hatch (ops/matmul_4bit.py
    _nk_tiles) — absmax tile dim equals the array dim."""
    K = 1152  # half=576: 576 % 512 != 0, 576 % 64 == 0 -> whole-half tile
    rng = np.random.default_rng(11)
    W = jnp.asarray(rng.normal(size=(256, K)) * 0.02, jnp.float32)
    qw = quantize_4bit_native(W, blocksize=64, quant_type="nf4")
    x = jnp.asarray(rng.normal(size=(8, K)), jnp.float32)
    y = matmul_4bit_fused(x, qw, compute_dtype=jnp.float32)
    ref = np.asarray(x) @ np.asarray(qw.dequantize(), np.float32).T
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-2, atol=2e-2)

    # W4A8 covers the same escape hatch
    from bitsandbytes_sycl_tpu.ops import matmul_4bit_w4a8

    y8 = np.asarray(matmul_4bit_w4a8(x, qw, out_dtype=jnp.float32))
    rel = np.abs(y8 - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def test_decode_attention_int8_sliding_window():
    """window=w must equal the dequant path with the (len-w, len] mask
    (Mistral decode); window >= S must equal the unwindowed kernel."""
    B, S, Hkv, D = 2, 256, 2, 128
    Hq = 4
    rng = np.random.default_rng(21)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    kq, ks = L._kv_quantize(k)
    vq, vs = L._kv_quantize(v)
    lengths = jnp.asarray([117, 256], jnp.int32)
    kqh, ksh = kq.transpose(0, 2, 3, 1), ks.transpose(0, 2, 1)
    vqh, vsh = vq.transpose(0, 2, 1, 3), vs.transpose(0, 2, 1)

    w = 64
    out = decode_attention_int8(q, kqh, ksh, vqh, vsh, lengths, window=w)
    kf = L._kv_dequantize(kq, ks, jnp.float32)
    vf = L._kv_dequantize(vq, vs, jnp.float32)
    s_ids = jnp.arange(S)[None, None, :]
    mask = (s_ids < lengths[:, None, None]) & (s_ids >= lengths[:, None, None] - w)
    ref = L._attention(q, kf, vf, mask, jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 5e-3, rel
    # the window must actually bind (differ from full attention)
    full = decode_attention_int8(q, kqh, ksh, vqh, vsh, lengths)
    assert float(jnp.abs(out - full).max()) > 0
    # non-binding window (>= S) short-circuits to the unwindowed kernel
    out_big = decode_attention_int8(q, kqh, ksh, vqh, vsh, lengths, window=S)
    np.testing.assert_array_equal(np.asarray(out_big), np.asarray(full))


def test_prefill_attention_int8_sliding_window():
    """Windowed flash prefill == dequant path with the causal-and-window
    mask, including kv chunks fully outside the window (w < ts)."""
    from bitsandbytes_sycl_tpu.ops.attention import prefill_attention_int8

    B, T, S, Hkv, D = 2, 32, 256, 2, 128
    Hq = 4
    rng = np.random.default_rng(22)
    q = jnp.asarray(rng.normal(size=(B, T, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    kq, ks = L._kv_quantize(k)
    vq, vs = L._kv_quantize(v)
    starts = jnp.asarray([0, 160], jnp.int32)  # batch 1: rows far into the cache
    kqt, ksh = kq.transpose(0, 2, 3, 1), ks.transpose(0, 2, 1)
    vqh, vsh = vq.transpose(0, 2, 1, 3), vs.transpose(0, 2, 1)

    w = 48  # < ts=128: some kv chunks are fully masked for some q rows
    out = prefill_attention_int8(q, kqt, ksh, vqh, vsh, starts, tq=16, ts=128, window=w)
    assert out is not None

    kf = L._kv_dequantize(kq, ks, jnp.float32)
    vf = L._kv_dequantize(vq, vs, jnp.float32)
    s_ids = jnp.arange(S)[None, None, :]
    q_pos = (starts[:, None] + jnp.arange(T)[None, :])[:, :, None]
    mask = (s_ids <= q_pos) & (q_pos - s_ids < w)
    ref = L._attention(q, kf, vf, mask, jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 5e-3, rel


@pytest.mark.parametrize("window", [None, 64])
def test_decode_attention_int8_stacked_layer_select(window):
    """The layer-stacked decode kernel must attend over exactly layer
    `li` of the (L, B, H, D, S) engine cache — the scalar-prefetched
    layer index picks the block, so per-layer calls share one compiled
    kernel and XLA never materializes a cache[li] slice (the decode
    bandwidth leak measured in the paged-pool work, round 3)."""
    from bitsandbytes_sycl_tpu.ops.attention import (
        decode_attention_int8_stacked,
    )

    Lyr, B, S, Hkv, D = 3, 2, 256, 2, 128
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (Lyr, B, Hkv, D, S)).astype(np.int8))
    vq = jnp.asarray(rng.integers(-127, 128, (Lyr, B, Hkv, S, D)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(0.5, 2.0, (Lyr, B, Hkv, S)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.5, 2.0, (Lyr, B, Hkv, S)).astype(np.float32))
    lengths = jnp.asarray([117, 256], jnp.int32)

    for li in range(Lyr):
        want = decode_attention_int8(
            q, kq[li], ks[li], vq[li], vs[li], lengths, window=window)
        got = decode_attention_int8_stacked(
            q, kq, ks, vq, vs, li, lengths, window=window)
        assert got is not None
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("window", [None, 50])
def test_decode_attention_stacked_new_kv_matches_write_then_read(window):
    """Deferred-write decode: attending the one-step-stale cache with the
    current token folded in from registers (new_kv) must equal writing
    the token first and attending with lengths+1."""
    from bitsandbytes_sycl_tpu.ops.attention import (
        decode_attention_int8_stacked,
    )

    Lyr, B, S, Hkv, D = 2, 3, 256, 2, 128
    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.normal(size=(B, 1, 2 * Hkv, D)), jnp.float32)  # GQA
    kq = jnp.asarray(rng.integers(-127, 128, (Lyr, B, Hkv, D, S)).astype(np.int8))
    vq = jnp.asarray(rng.integers(-127, 128, (Lyr, B, Hkv, S, D)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(0.5, 2.0, (Lyr, B, Hkv, S)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.5, 2.0, (Lyr, B, Hkv, S)).astype(np.float32))
    lengths = jnp.asarray([117, 255, 0], jnp.int32)  # cache tokens per row
    kn = jnp.asarray(rng.integers(-127, 128, (B, Hkv, D)).astype(np.int8))
    vn = jnp.asarray(rng.integers(-127, 128, (B, Hkv, D)).astype(np.int8))
    ksn = jnp.asarray(rng.uniform(0.5, 2.0, (B, Hkv)).astype(np.float32))
    vsn = jnp.asarray(rng.uniform(0.5, 2.0, (B, Hkv)).astype(np.float32))
    li = 1

    # write-then-read reference
    k2, v2 = np.asarray(kq).copy(), np.asarray(vq).copy()
    ks2, vs2 = np.asarray(ks).copy(), np.asarray(vs).copy()
    for b in range(B):
        pos = int(lengths[b])
        k2[li, b, :, :, pos] = np.asarray(kn[b])
        v2[li, b, :, pos, :] = np.asarray(vn[b])
        ks2[li, b, :, pos] = np.asarray(ksn[b])
        vs2[li, b, :, pos] = np.asarray(vsn[b])
    want = decode_attention_int8_stacked(
        q, jnp.asarray(k2), jnp.asarray(ks2), jnp.asarray(v2), jnp.asarray(vs2),
        li, lengths + 1, window=window)
    got = decode_attention_int8_stacked(
        q, kq, ks, vq, vs, li, lengths, new_kv=(kn, ksn, vn, vsn),
        window=window)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("window", [None, 64])
def test_prefill_attention_int8_stacked_layer_select(window):
    """The layer-stacked prefill kernel must attend over exactly layer
    `li` (scalar-prefetched block selection — no cache[li] slice)."""
    from bitsandbytes_sycl_tpu.ops.attention import (
        prefill_attention_int8, prefill_attention_int8_stacked,
    )

    Lyr, B, T, S, Hkv, D = 3, 2, 64, 256, 2, 128
    rng = np.random.default_rng(17)
    q = jnp.asarray(rng.normal(size=(B, T, 2 * Hkv, D)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (Lyr, B, Hkv, D, S)).astype(np.int8))
    vq = jnp.asarray(rng.integers(-127, 128, (Lyr, B, Hkv, S, D)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(0.5, 2.0, (Lyr, B, Hkv, S)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.5, 2.0, (Lyr, B, Hkv, S)).astype(np.float32))
    starts = jnp.asarray([0, 100], jnp.int32)

    for li in range(Lyr):
        want = prefill_attention_int8(
            q, kq[li], ks[li], vq[li], vs[li], starts, window=window)
        got = prefill_attention_int8_stacked(
            q, kq, ks, vq, vs, li, starts, window=window)
        assert got is not None
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


# --- W8A8 prefill route (ops/matmul_w4a8.py, r4) ---


@pytest.mark.parametrize("quant_type", ["nf4", "fp4", "int4"])
def test_dequantize_to_int8_regrid_bound(weight, quant_type):
    """The per-column int8 regrid of the dequantized 4-bit weight must be
    within ONE int8 code step of the exact dequant (half a step from
    rounding + up to half a step from the bf16 decode tree)."""
    from bitsandbytes_sycl_tpu.ops import dequantize_to_int8

    qw = quantize_4bit_native(weight, blocksize=64, quant_type=quant_type)
    wq, colmax = dequantize_to_int8(qw)
    assert wq is not None and wq.shape == (1024, 256)
    Wre = np.asarray(wq, np.float32) * (np.asarray(colmax)[None, :] / 127.0)
    exact = np.asarray(qw.dequantize(), np.float32).T  # (K, N)
    err = np.abs(Wre - exact)
    step = np.asarray(colmax)[None, :] / 127.0
    assert np.all(err <= step + 1e-7), err.max()


@pytest.mark.parametrize("quant_type", ["nf4", "int4"])
def test_matmul_4bit_w8a8_prefill_accuracy_envelope(weight, quant_type):
    """vs the exact matmul of the stored codes: the W8A8 route adds the
    W4A8 activation class + the per-column regrid — same few-percent
    envelope as matmul_4bit_w4a8."""
    from bitsandbytes_sycl_tpu.ops import matmul_4bit_w8a8_prefill

    qw = quantize_4bit_native(weight, blocksize=64, quant_type=quant_type)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(64, 1024)), jnp.float32)
    y = np.asarray(matmul_4bit_w8a8_prefill(x, qw, out_dtype=jnp.float32))
    exact = np.asarray(x) @ np.asarray(qw.dequantize(), np.float32).T
    rel = np.abs(y - exact).mean() / np.abs(exact).mean()
    assert rel < 0.02, rel


def test_matmul_4bit_w8a8_prefill_bias_grad_and_fallback(weight):
    from bitsandbytes_sycl_tpu.ops import matmul_4bit_w8a8_prefill

    qw = quantize_4bit_native(weight, blocksize=64, quant_type="nf4")
    b = jnp.arange(256, dtype=jnp.float32) * 0.01
    x = jnp.asarray(np.random.default_rng(2).normal(size=(16, 1024)), jnp.float32)
    y = np.asarray(matmul_4bit_w8a8_prefill(x, qw, bias=b, out_dtype=jnp.float32))
    y0 = np.asarray(matmul_4bit_w8a8_prefill(x, qw, out_dtype=jnp.float32))
    np.testing.assert_allclose(y, y0 + np.asarray(b), rtol=1e-5, atol=1e-5)

    # backward is the EXACT dequant path (QLoRA trains on clean grads)
    g = jax.grad(lambda x: jnp.sum(matmul_4bit_w8a8_prefill(x, qw).astype(jnp.float32)))(x)
    gref = jnp.ones((16, 256)) @ qw.dequantize().astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), rtol=2e-2, atol=2e-2)

    # untileable N (not a multiple of 128) falls back to the exact path
    Wodd = jnp.asarray(np.random.default_rng(3).normal(size=(192, 1024)) * 0.02, jnp.float32)
    qodd = quantize_4bit_native(Wodd, blocksize=64, quant_type="nf4")
    yodd = np.asarray(matmul_4bit_w8a8_prefill(x, qodd, out_dtype=jnp.float32))
    ref = np.asarray(x) @ np.asarray(qodd.dequantize(), np.float32).T
    np.testing.assert_allclose(yodd, ref, rtol=2e-2, atol=2e-2)


def test_apply_linear_w8a8_routing_boundary(monkeypatch):
    """a8_decode 4-way routing (r5): rows <= lim -> W4A8 GEMV, the
    (lim, grouped_min] gap -> exact, rows > grouped_min -> the grouped
    kernel, and (blocksize<=64 only) rows >= W8A8_PREFILL_MIN_M -> the
    per-call W8A8 regrid route (r3 review: 'routing boundary tested')."""
    import bitsandbytes_sycl_tpu.models.llama as L
    from bitsandbytes_sycl_tpu.ops import matmul_w4a8 as mw

    cfg = L.LlamaConfig.tiny(quant="nf4", a8_decode=True, dtype=jnp.float32)
    W = jnp.asarray(np.random.default_rng(0).normal(size=(256, 1024)) * 0.02, jnp.float32)
    qw = quantize_4bit_native(W, blocksize=64, quant_type="nf4")
    qw128 = quantize_4bit_native(W, blocksize=128, quant_type="nf4")
    calls = []
    real_w4a8, real_w8a8 = mw.matmul_4bit_w4a8, mw.matmul_4bit_w8a8_prefill
    real_grp = mw.matmul_4bit_w4a8_grouped
    monkeypatch.setattr(
        mw, "matmul_4bit_w4a8",
        lambda *a, **k: calls.append("w4a8") or real_w4a8(*a, **k))
    monkeypatch.setattr(
        mw, "matmul_4bit_w8a8_prefill",
        lambda *a, **k: calls.append("w8a8") or real_w8a8(*a, **k))
    monkeypatch.setattr(
        mw, "matmul_4bit_w4a8_grouped",
        lambda *a, **k: calls.append("grouped") or real_grp(*a, **k))

    for weight, rows, expect in (
        (qw, 8, "w4a8"),
        (qw, 192, "exact"),       # (lim=128, grouped_min=256] gap at bs=64
        (qw, 512, "grouped"),
        (qw, 4096, "w8a8"),       # bs<=64 only: per-call regrid from 4096
        (qw128, 256, "grouped"),  # bs=128: grouped already wins at 256
        (qw128, 4096, "grouped"),  # bs>=128: grouped beats w8a8 at 4096 too
    ):
        calls.clear()
        x = jnp.zeros((rows, 1024), jnp.float32)
        L.apply_linear(x, weight, cfg)
        got = calls[0] if calls else "exact"
        assert got == expect, (rows, got, calls)


def test_repack_params_int8_parity():
    """repack_params_int8: forward logits stay within the 4-bit model's
    own quantization envelope, MoE experts stay 4-bit, and the repacked
    tree shards under TP."""
    from bitsandbytes_sycl_tpu.models import llama as L

    cfg = L.LlamaConfig.tiny(quant="nf4", dtype=jnp.float32)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    p8, cfg8 = L.repack_params_int8(params, cfg)
    assert cfg8.quant == "int8" and cfg8.llm_int8_threshold == 0.0
    assert isinstance(p8["layers"][0]["q_proj"], dict)
    toks = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
    ref, _ = L.llama_forward(params, cfg, toks)
    got, _ = L.llama_forward(p8, cfg8, toks)
    # int8-regrid + per-row activation quant: LLM.int8-class noise
    rel = float(jnp.abs(got - ref).mean() / (jnp.abs(ref).mean() + 1e-9))
    assert rel < 0.05, rel

    # MoE: stacked experts stay 4-bit
    cfg_moe = L.LlamaConfig.tiny(quant="nf4", num_experts=2, dtype=jnp.float32)
    pm = L.init_params(cfg_moe, jax.random.PRNGKey(1))
    pm8, _ = L.repack_params_int8(pm, cfg_moe)
    from bitsandbytes_sycl_tpu.ops import QLinearWeight
    assert isinstance(pm8["layers"][0]["experts"]["gate_proj"], QLinearWeight)


# --- ALiBi in the flash kernels (r3 review item 3: unfence BLOOM) ---


def _alibi_ref_attend(q, kq, ks, vq, vs, lengths, slopes, new_kv=None):
    """XLA reference: dequantize, score with -slope*(qpos-kpos), mask,
    softmax. q (B,1,Hq,D); cache (B,Hkv,D,S)/(B,Hkv,S,D)."""
    B, _, Hq, D = q.shape
    Hkv, S = vq.shape[1], vq.shape[2]
    rep = Hq // Hkv
    kf = np.asarray(kq, np.float32) * (np.asarray(ks)[:, :, None, :] / 127.0)  # (B,Hkv,D,S)
    vf = np.asarray(vq, np.float32) * (np.asarray(vs)[:, :, :, None] / 127.0)  # (B,Hkv,S,D)
    if new_kv is not None:
        kn, ksn, vn, vsn = new_kv  # (B,Hkv,D) i8, (B,Hkv) f32, ...
        knf = np.asarray(kn, np.float32) * (np.asarray(ksn)[:, :, None] / 127.0)
        vnf = np.asarray(vn, np.float32) * (np.asarray(vsn)[:, :, None] / 127.0)
        kf = np.concatenate([kf, knf[:, :, :, None]], axis=3)
        vf = np.concatenate([vf, vnf[:, :, None, :]], axis=2)
        S = S + 1
    out = np.zeros((B, 1, Hq, D), np.float32)
    for b in range(B):
        L = int(lengths[b])
        qpos = L if new_kv is not None else L - 1
        kpos = np.arange(S)
        if new_kv is not None:
            kpos = kpos.copy()
            kpos[S - 1] = qpos  # the in-register token sits AT the query
        for h in range(Hq):
            sc = np.asarray(q, np.float32)[b, 0, h] @ kf[b, h // rep] / np.sqrt(D)
            sc += np.asarray(slopes)[h] * (kpos - qpos)
            valid = np.arange(S) < L
            if new_kv is not None:
                valid[S - 1] = True  # the in-register token (distance 0)
            sc = np.where(valid, sc, -1e30)
            w = np.exp(sc - sc.max())
            w /= w.sum()
            out[b, 0, h] = w @ vf[b, h // rep]
    return out


def _rand_cache(rng, B, Hkv, S, D):
    kq = jnp.asarray(rng.integers(-127, 128, (B, Hkv, D, S)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(0.5, 2.0, (B, Hkv, S)).astype(np.float32))
    vq = jnp.asarray(rng.integers(-127, 128, (B, Hkv, S, D)).astype(np.int8))
    vs = jnp.asarray(rng.uniform(0.5, 2.0, (B, Hkv, S)).astype(np.float32))
    return kq, ks, vq, vs


def test_decode_attention_int8_alibi_matches_reference():
    from bitsandbytes_sycl_tpu.models.llama import alibi_slopes
    from bitsandbytes_sycl_tpu.ops.attention import decode_attention_int8

    B, Hq, Hkv, S, D = 2, 4, 2, 256, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32)
    kq, ks, vq, vs = _rand_cache(rng, B, Hkv, S, D)
    lengths = jnp.asarray([100, 256], jnp.int32)
    sl = jnp.asarray(alibi_slopes(Hq))
    got = decode_attention_int8(q, kq, ks, vq, vs, lengths, alibi_slopes=sl)
    assert got is not None
    ref = _alibi_ref_attend(q, kq, ks, vq, vs, lengths, sl)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_decode_attention_int8_stacked_alibi_with_new_kv():
    """ALiBi composes with the deferred-write fold-in: the in-register
    token sits at distance 0 (zero bias)."""
    from bitsandbytes_sycl_tpu.models.llama import alibi_slopes
    from bitsandbytes_sycl_tpu.ops.attention import decode_attention_int8_stacked

    Lyr, B, Hq, Hkv, S, D = 2, 2, 4, 2, 256, 128
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32)
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
    lengths = jnp.asarray([60, 200], jnp.int32)
    sl = jnp.asarray(alibi_slopes(Hq))
    for li in range(Lyr):
        got = decode_attention_int8_stacked(
            q, kq, ks, vq, vs, li, lengths, new_kv=new_kv, alibi_slopes=sl)
        assert got is not None
        ref = _alibi_ref_attend(
            q, kq[li], ks[li], vq[li], vs[li], lengths, sl, new_kv=new_kv)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_prefill_attention_int8_alibi_matches_reference():
    from bitsandbytes_sycl_tpu.models.llama import alibi_slopes
    from bitsandbytes_sycl_tpu.ops.attention import prefill_attention_int8

    B, T, Hq, Hkv, S, D = 2, 64, 4, 2, 256, 128
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, T, Hq, D)), jnp.float32)
    kq, ks, vq, vs = _rand_cache(rng, B, Hkv, S, D)
    starts = jnp.asarray([0, 100], jnp.int32)
    sl = jnp.asarray(alibi_slopes(Hq))
    got = prefill_attention_int8(q, kq, ks, vq, vs, starts, alibi_slopes=sl)
    assert got is not None
    # reference: per-row decode-style attention at qpos = start + t
    kf = np.asarray(kq, np.float32) * (np.asarray(ks)[:, :, None, :] / 127.0)
    vf = np.asarray(vq, np.float32) * (np.asarray(vs)[:, :, :, None] / 127.0)
    ref = np.zeros((B, T, Hq, D), np.float32)
    rep = Hq // Hkv
    for b in range(B):
        for t in range(T):
            qpos = int(starts[b]) + t
            for h in range(Hq):
                sc = np.asarray(q, np.float32)[b, t, h] @ kf[b, h // rep] / np.sqrt(D)
                sc += np.asarray(sl)[h] * (np.arange(S) - qpos)
                sc = np.where(np.arange(S) <= qpos, sc, -1e30)
                w = np.exp(sc - sc.max()); w /= w.sum()
                ref[b, t, h] = w @ vf[b, h // rep]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_paged_decode_attention_alibi_matches_reference():
    from bitsandbytes_sycl_tpu.models.llama import alibi_slopes
    from bitsandbytes_sycl_tpu.ops.paged_attention import paged_decode_attention_int8

    B, Hq, Hkv, P, NP, MAXP, D = 2, 4, 2, 128, 9, 4, 128
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32)
    kp = jnp.asarray(rng.integers(-127, 128, (NP, Hkv, P, D)).astype(np.int8))
    ksp = jnp.asarray(rng.uniform(0.5, 2.0, (NP, Hkv, P)).astype(np.float32))
    vp = jnp.asarray(rng.integers(-127, 128, (NP, Hkv, P, D)).astype(np.int8))
    vsp = jnp.asarray(rng.uniform(0.5, 2.0, (NP, Hkv, P)).astype(np.float32))
    pt = jnp.asarray([[1, 3, 5, 7], [2, 4, 6, 8]], jnp.int32)
    lengths = jnp.asarray([300, 450], jnp.int32)
    sl = jnp.asarray(alibi_slopes(Hq))
    got = paged_decode_attention_int8(
        q, kp, ksp, vp, vsp, pt, lengths, alibi_slopes=sl)
    assert got is not None
    # gather pages into a contiguous (B,Hkv,D,S)/(B,Hkv,S,D) view
    S = MAXP * P
    kg = np.asarray(kp)[np.asarray(pt)]  # (B,MAXP,Hkv,P,D)
    ksg = np.asarray(ksp)[np.asarray(pt)]
    vg = np.asarray(vp)[np.asarray(pt)]
    vsg = np.asarray(vsp)[np.asarray(pt)]
    kq_c = kg.transpose(0, 2, 4, 1, 3).reshape(B, Hkv, D, S)
    ks_c = ksg.transpose(0, 2, 1, 3).reshape(B, Hkv, S)
    vq_c = vg.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, S, D)
    vs_c = vsg.transpose(0, 2, 1, 3).reshape(B, Hkv, S)
    ref = _alibi_ref_attend(q, kq_c, ks_c, vq_c, vs_c, lengths, sl)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# lut8 select trees (gather-free take/searchsorted used by codecs)
# ---------------------------------------------------------------------------


def test_lut8_trees_match_numpy():
    from bitsandbytes_sycl_tpu.ops.lut8 import searchsorted_tree, take_tree

    rng = np.random.default_rng(0)
    for n in (7, 16, 255, 256):
        table = np.sort(rng.normal(size=n)).astype(np.float32)
        idx = rng.integers(0, n, size=(5, 37)).astype(np.int32)
        for t in (table, jnp.asarray(table)):
            np.testing.assert_array_equal(np.asarray(take_tree(jnp.asarray(idx), t)), table[idx])
        x = (rng.normal(size=(3, 129)) * 1.5).astype(np.float32)
        x.ravel()[:n] = table  # exact boundary hits exercise tie behavior
        for side in ("left", "right"):
            for t in (table, jnp.asarray(table)):
                got = np.asarray(searchsorted_tree(jnp.asarray(x), t, side=side))
                np.testing.assert_array_equal(got, np.searchsorted(table, x, side=side))
