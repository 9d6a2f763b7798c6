"""Blockwise 8-bit and 4-bit quantize/dequantize — parity with the
reference's accuracy envelopes (SURVEY.md §4, tests_pvc/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bitsandbytes_sycl_tpu as bnb
from bitsandbytes_sycl_tpu import functional as F


@pytest.mark.parametrize("blocksize", [64, 128, 256, 512, 1024, 2048, 4096])
def test_quantize_blockwise_roundtrip(blocksize):
    rng = np.random.default_rng(42)
    a = rng.normal(size=(31, 517)).astype(np.float32)  # non-multiple of blocksize
    q, qs = F.quantize_blockwise(jnp.asarray(a), blocksize=blocksize)
    assert q.shape == a.shape and q.dtype == jnp.uint8
    assert qs.absmax.shape == ((a.size + blocksize - 1) // blocksize,)
    out = F.dequantize_blockwise(q, qs)
    assert out.shape == a.shape
    err = np.abs(np.asarray(out) - a)
    relerr = err.mean() / np.abs(a).mean()
    # dynamic 8-bit blockwise: ~0.01 relative error (bnb's documented regime)
    assert relerr < 0.02, relerr


def test_quantize_blockwise_codebook_values_exact():
    """Values that sit exactly on codebook entries round-trip exactly."""
    code = np.asarray(bnb.codebooks.create_dynamic_map())
    a = jnp.asarray(code * 0.5)  # absmax=0.5, normalized == codebook
    q, qs = F.quantize_blockwise(a, blocksize=256)
    out = F.dequantize_blockwise(q, qs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(a), atol=1e-7)


def test_quantize_blockwise_nested():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4096,)).astype(np.float32)
    q, qs = F.quantize_blockwise(jnp.asarray(a), blocksize=64, nested=True)
    assert qs.nested and qs.state2 is not None
    assert qs.absmax.dtype == jnp.uint8
    out = F.dequantize_blockwise(q, qs)
    err = np.abs(np.asarray(out) - a).mean() / np.abs(a).mean()
    assert err < 0.03, err


def test_zeros_block():
    a = jnp.zeros((512,), jnp.float32)
    q, qs = F.quantize_blockwise(a, blocksize=64)
    out = F.dequantize_blockwise(q, qs)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


@pytest.mark.parametrize("quant_type", ["nf4", "fp4"])
@pytest.mark.parametrize("blocksize", [64, 128])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_quantize_4bit_roundtrip(quant_type, blocksize, dtype):
    rng = np.random.default_rng(1)
    a = rng.normal(size=(128, 96)).astype(np.float32)
    aj = jnp.asarray(a, dtype)
    packed, qs = F.quantize_4bit(aj, blocksize=blocksize, quant_type=quant_type)
    assert packed.shape == (a.size // 2,)
    assert qs.shape == (128, 96) and qs.quant_type == quant_type
    out = F.dequantize_4bit(packed, qs)
    assert out.dtype == dtype and out.shape == (128, 96)
    err = np.abs(np.asarray(out, np.float32) - a).mean()
    # reference envelope: NF4/FP4 abs err; normal data absmax~3 per block
    bound = 0.15 if quant_type == "nf4" else 0.4
    assert err < bound, err


def test_quantize_4bit_packing_order():
    """Element 2i -> high nibble (kernel_quant.cpp:1337-1348)."""
    a = jnp.asarray([1.0, -1.0, 0.0, 0.5])
    packed, qs = F.quantize_4bit(a, blocksize=4, quant_type="nf4")
    b0 = int(np.asarray(packed)[0])
    assert b0 >> 4 == 15  # +1.0 -> code 0b1111
    assert b0 & 0xF == 0  # -1.0 -> code 0b0000


def test_quantize_4bit_odd_numel():
    a = jnp.asarray(np.random.default_rng(2).normal(size=(65,)), jnp.float32)
    packed, qs = F.quantize_4bit(a, blocksize=64, quant_type="nf4")
    assert packed.shape == (33,)
    out = F.dequantize_4bit(packed, qs)
    assert out.shape == (65,)


def test_quantize_4bit_compress_statistics():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(256, 64)).astype(np.float32)
    p1, qs1 = F.quantize_4bit(jnp.asarray(a), quant_type="nf4", compress_statistics=False)
    p2, qs2 = F.quantize_4bit(jnp.asarray(a), quant_type="nf4", compress_statistics=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    o1 = np.asarray(F.dequantize_4bit(p1, qs1))
    o2 = np.asarray(F.dequantize_4bit(p2, qs2))
    # nested absmax adds a little error but must stay close
    assert np.abs(o1 - o2).mean() < 0.01
    assert np.abs(o2 - a).mean() < 0.15


def test_nf4_tie_goes_to_lower_code():
    """x exactly on a decision threshold takes the lower code, matching the
    strict-> tree (kernel_quant.cpp:709)."""
    thr = 0.03979014977812767
    a = jnp.asarray([thr, 1.0])  # absmax 1.0
    packed, qs = F.quantize_4bit(a, blocksize=2, quant_type="nf4")
    b0 = int(np.asarray(packed)[0])
    assert b0 >> 4 == 0b0111  # lower side: code 7 (0.0)... nearest-below


def test_fp4_code_assignments():
    """Check the non-monotone FP4 rank->code permutation against
    dQuantizeFP4 (kernel_quant.cpp:547-592)."""
    vals = [0.0, 0.005, 0.17, 0.26, 0.34, 0.51, 0.68, 0.99, -0.99, -0.3]
    expect = [0b0000, 0b0001, 0b0110, 0b0111, 0b0100, 0b0101, 0b0010, 0b0011, 0b1011, 0b1100]
    a = jnp.asarray(vals + [1.0, -1.0])  # force absmax 1
    packed, qs = F.quantize_4bit(a, blocksize=len(vals) + 2, quant_type="fp4")
    codes = np.asarray(F.unpack_4bit(packed, a.shape[0]))
    for i, e in enumerate(expect):
        assert codes[i] == e, (i, vals[i], codes[i], e)


def test_whole_tensor_quantize():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(1024,)).astype(np.float32)
    q, state = F.quantize(jnp.asarray(a))
    out = np.asarray(F.dequantize(q, state))
    assert np.abs(out - a).mean() / np.abs(a).mean() < 0.02


def test_estimate_quantiles():
    rng = np.random.default_rng(5)
    a = rng.normal(size=(100_000,)).astype(np.float32)
    q = np.asarray(F.estimate_quantiles(jnp.asarray(a)))
    assert q.shape == (256,)
    # median near 0, symmetric tails
    assert abs(q[127]) < 0.05
    assert q[0] < -2.0 and q[-1] > 2.0


def test_jit_roundtrip():
    @jax.jit
    def rt(a):
        q, qs = F.quantize_4bit(a, quant_type="nf4")
        return F.dequantize_4bit(q, qs)

    a = jnp.asarray(np.random.default_rng(6).normal(size=(64, 64)), jnp.float32)
    out = rt(a)
    assert np.abs(np.asarray(out) - np.asarray(a)).mean() < 0.15


def test_quantstate_is_pytree():
    a = jnp.asarray(np.random.default_rng(7).normal(size=(128,)), jnp.float32)
    _, qs = F.quantize_4bit(a, quant_type="nf4", compress_statistics=True)
    leaves, treedef = jax.tree_util.tree_flatten(qs)
    qs2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert qs2.blocksize == qs.blocksize and qs2.quant_type == "nf4"
    assert qs2.nested


def test_stochastic_rounding_unbiased():
    """key= enables stochastic rounding (reference STOCHASTIC path,
    kernel_quant.cpp:1229): codes land on the bracketing entries and the
    dequantized EXPECTATION beats round-to-nearest's bias."""
    val = 0.30103  # sits between dynamic-map entries
    # first element 1.0 pins the block absmax so `val` stays off-grid
    a = jnp.full((4096,), val, jnp.float32).at[0].set(1.0)
    q_rtn, qs = F.quantize_blockwise(a, blocksize=4096)
    d_rtn = float(np.asarray(F.dequantize_blockwise(q_rtn, qs))[1])
    # round-to-nearest: every `val` element gets the same code
    assert np.unique(np.asarray(q_rtn)[1:]).size == 1

    means = []
    for seed in range(8):
        q, qs2 = F.quantize_blockwise(a, blocksize=4096, key=jax.random.PRNGKey(seed))
        codes = np.unique(np.asarray(q)[1:])
        assert codes.size == 2  # exactly the two bracketing entries
        means.append(np.asarray(F.dequantize_blockwise(q, qs2))[1:].mean())
    # expectation over stochastic draws is closer to the value than the
    # deterministic rounding of this (deliberately off-center) input
    assert abs(np.mean(means) - val) < abs(d_rtn - val) * 0.5


def test_stochastic_rounding_custom_code():
    code = jnp.asarray(np.linspace(-1, 1, 256), jnp.float32)
    a = jnp.asarray(np.random.default_rng(8).normal(size=(1024,)) * 0.5, jnp.float32)
    q, qs = F.quantize_blockwise(a, code=code, blocksize=256, key=jax.random.PRNGKey(0))
    d = np.asarray(F.dequantize_blockwise(q, qs))
    assert np.abs(d - np.asarray(a)).mean() < 0.02
