"""FP8 matmul parity (reference tests_pvc/autograd.py:424-502
test_matmul_fp8 — envelopes: fwd mean abs err < 0.115, gradA close
atol .015 / rtol .1, gradB mostly-close, empty dim2 -> zero grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bitsandbytes_sycl_tpu as bnb
from bitsandbytes_sycl_tpu import codebooks
from bitsandbytes_sycl_tpu.research import matmul_fp8_global, matmul_fp8_mixed


@pytest.mark.parametrize("fn", [matmul_fp8_mixed, matmul_fp8_global])
@pytest.mark.parametrize("dims", [(32, 64, 48), (17, 96, 33)])
def test_matmul_fp8_forward_envelope(fn, dims):
    m, k, n = dims
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    # xavier-ish B like the reference (autograd.py:450)
    B = jnp.asarray(rng.normal(size=(k, n)) * np.sqrt(2.0 / (k + n)), jnp.float32)
    fw = jnp.asarray(codebooks.create_fp8_map(True, 4, 3, 8))
    bw = jnp.asarray(codebooks.create_fp8_map(True, 5, 2, 8))
    out = fn(A, B, fw, bw)
    ref = np.asarray(A) @ np.asarray(B)
    err = np.abs(np.asarray(out) - ref).mean()
    assert err < 0.115, err


@pytest.mark.parametrize("fn", [matmul_fp8_mixed, matmul_fp8_global])
def test_matmul_fp8_grads(fn):
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)
    B = jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)

    def loss_fp8(A, B):
        return jnp.mean((fn(A, B) - tgt) ** 2)

    def loss_ref(A, B):
        return jnp.mean((A @ B - tgt) ** 2)

    gA, gB = jax.grad(loss_fp8, argnums=(0, 1))(A, B)
    rA, rB = jax.grad(loss_ref, argnums=(0, 1))(A, B)
    # fp8 grads track the fp32 grads closely (reference atol .015/rtol .1
    # with output copy-back; here the fp8 forward noise flows through the
    # MSE, so compare with a proportional envelope)
    assert np.abs(np.asarray(gA) - np.asarray(rA)).mean() < 0.02
    nB = np.asarray(rB)
    close = np.isclose(np.asarray(gB), nB, atol=0.06, rtol=0.3)
    assert (~close).sum() <= nB.size * 0.1


def test_matmul_fp8_empty_dim():
    """dim2=0 (reference parametrizes dim2=0): empty output, zero grads."""
    A = jnp.zeros((0, 64), jnp.float32)
    B = jnp.asarray(np.random.default_rng(2).normal(size=(64, 32)), jnp.float32)
    out = matmul_fp8_mixed(A, B)
    assert out.shape == (0, 32)
    gB = jax.grad(lambda B: matmul_fp8_mixed(A, B).sum())(B)
    assert float(jnp.abs(gB).sum()) == 0.0


def test_matmul_fp8_default_codes_and_dtype():
    A = jnp.asarray(np.random.default_rng(3).normal(size=(8, 128)), jnp.bfloat16)
    B = jnp.asarray(np.random.default_rng(4).normal(size=(128, 16)) * 0.1, jnp.bfloat16)
    out = matmul_fp8_global(A, B)
    assert out.dtype == A.dtype  # reference asserts dtype passthrough (:462)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_matmul_fp8_batched_grads():
    """3D activations (upstream supports batched A): grads must work and
    the 2D weight grad sums over batch dims."""
    rng = np.random.default_rng(5)
    A = jnp.asarray(rng.normal(size=(2, 8, 64)), jnp.float32)
    B = jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32)
    for fn in (matmul_fp8_mixed, matmul_fp8_global):
        out = fn(A, B)
        assert out.shape == (2, 8, 32)
        gA, gB = jax.grad(lambda a, b: fn(a, b).sum(), argnums=(0, 1))(A, B)
        assert gA.shape == A.shape and gB.shape == B.shape
        assert np.isfinite(np.asarray(gA)).all() and np.isfinite(np.asarray(gB)).all()
