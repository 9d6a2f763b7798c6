"""nn module integration — mirrors tests_pvc/test_8bit.py and
test_simple_nn.py (the configs[0] workload: 784->256->10 MLP that must
actually learn, unlike the reference's README log)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import bitsandbytes_sycl_tpu as bnb
from bitsandbytes_sycl_tpu import nn as bnn
from bitsandbytes_sycl_tpu import optim as bnb_optim


def test_linear4bit_forward_close_to_dense():
    m = bnn.Linear4bit(features=64, compute_dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 96)), jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), x)
    assert "quants" in vs and "params" in vs
    y = m.apply(vs, x)
    assert y.shape == (8, 64)
    # compare against dequantized weight matmul
    qd = vs["quants"]["weight"]
    W = bnb.dequantize_4bit(qd["packed"], qd["quant_state"]).astype(jnp.float32)
    ref = x @ W.T
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("cls", [bnn.LinearNF4, bnn.LinearFP4])
def test_linear4bit_subclasses(cls):
    m = cls(features=32, compute_dtype=jnp.float32)
    x = jnp.ones((2, 64), jnp.float32)
    vs = m.init(jax.random.PRNGKey(1), x)
    qt = vs["quants"]["weight"]["quant_state"].quant_type
    assert qt == ("nf4" if cls is bnn.LinearNF4 else "fp4")
    assert m.apply(vs, x).shape == (2, 32)


def test_linear8bitlt_inference_envelope():
    """int8 linear vs fp32 linear — reference tolerance: <=1.75% of elems
    outside (atol .01 rtol .1) scaled to our magnitudes
    (tests_pvc/test_matmulqlt.py:47-50)."""
    m = bnn.Linear8bitLt(features=96, threshold=0.0, compute_dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(16, 128)), jnp.float32)
    vs = m.init(jax.random.PRNGKey(2), x)
    y = m.apply(vs, x)
    CB, SCB = vs["quants"]["weight"]["CB"], vs["quants"]["weight"]["SCB"]
    W = np.asarray(CB, np.float32) * (np.asarray(SCB)[:, None] / 127.0)
    ref = np.asarray(x) @ W.T
    # int8 activation quant noise only
    mismatch = np.mean(~np.isclose(np.asarray(y), ref, atol=0.01, rtol=0.1))
    assert mismatch <= 0.0175, mismatch


def test_linear8bitlt_training_grads():
    m = bnn.Linear8bitLt(features=32, has_fp16_weights=True, threshold=6.0, compute_dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 48)), jnp.float32)
    vs = m.init(jax.random.PRNGKey(3), x)
    assert "weight" in vs["params"]  # trainable

    def loss(params):
        return (m.apply({"params": params}, x) ** 2).sum()

    g = jax.grad(loss)(vs["params"])
    assert g["weight"].shape == (32, 48)
    assert float(jnp.abs(g["weight"]).sum()) > 0


def test_stable_embedding():
    m = bnn.StableEmbedding(num_embeddings=100, features=16)
    ids = jnp.asarray([[1, 2, 3]])
    vs = m.init(jax.random.PRNGKey(4), ids)
    out = m.apply(vs, ids)
    assert out.shape == (1, 3, 16)
    # layernorm'd: per-vector mean ~0
    np.testing.assert_allclose(np.asarray(out).mean(-1), 0.0, atol=1e-5)


def test_embedding():
    m = bnn.Embedding(num_embeddings=10, features=4)
    vs = m.init(jax.random.PRNGKey(5), jnp.asarray([0]))
    assert m.apply(vs, jnp.asarray([7, 3])).shape == (2, 4)


def test_quantize_linear_params_surgery():
    params = {
        "layer1": {"kernel": jnp.ones((64, 128)), "bias": jnp.zeros((64,))},
        "emb": jnp.ones((100,)),
    }
    q = bnn.quantize_linear_params(params, quant_type="nf4")
    assert "packed" in q["layer1"]["kernel"]
    assert q["layer1"]["bias"].shape == (64,)
    assert q["emb"].shape == (100,)


class MLP(nn.Module):
    """The configs[0] workload: 784 -> 256 -> 10, int8 linears."""

    @nn.compact
    def __call__(self, x):
        x = bnn.Linear8bitLt(256, has_fp16_weights=True, threshold=6.0, compute_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = bnn.Linear8bitLt(10, has_fp16_weights=True, threshold=6.0, compute_dtype=jnp.float32)(x)
        return x


def test_simple_nn_training_loss_decreases():
    """End-to-end: int8 MLP + Adam8bit on random data. The reference's own
    README log never shows the loss decreasing (SURVEY.md §6 caveat) — ours
    must."""
    rng = np.random.default_rng(42)
    X = jnp.asarray(rng.normal(size=(64, 784)), jnp.float32)
    Y = jnp.asarray(rng.integers(0, 10, size=(64,)))

    model = MLP()
    vs = model.init(jax.random.PRNGKey(0), X)
    params = vs["params"]
    tx = bnb_optim.adam8bit(1e-3, min_8bit_size=256)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply({"params": p}, X)
            return optax.softmax_cross_entropy_with_integer_labels(logits, Y).mean()

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


def test_outlier_aware_linear():
    """OutlierAwareLinear (reference nn/modules.py:824-848 + the
    OutlierTracer's find_outlier_dims z-score rule, utils.py:84-104):
    outlier input dims stay high-precision, so accuracy with an injected
    outlier column must beat plain int8 row-wise quantization."""
    from bitsandbytes_sycl_tpu.nn import OutlierAwareLinear
    from bitsandbytes_sycl_tpu import functional as F

    rng = np.random.default_rng(0)
    W = rng.normal(size=(64, 256)).astype(np.float32) * 0.02
    W[:, 17] *= 40.0  # one outlier input dim (std z-score >> 4)
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)

    m = OutlierAwareLinear(features=64, use_bias=False, compute_dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    variables = {"params": {"weight": jnp.asarray(W)}}
    y = m.apply(variables, x)

    ref = np.asarray(x) @ W.T
    # plain int8 row-wise quantization of the full W for comparison
    CB, SCB = F.int8_vectorwise_quant(jnp.asarray(W))
    Wq = np.asarray(CB, np.float32) * (np.asarray(SCB)[:, None] / 127.0)
    err_plain = np.abs(np.asarray(x) @ Wq.T - ref).mean()
    err_aware = np.abs(np.asarray(y) - ref).mean()
    assert err_aware < err_plain * 0.5, (err_aware, err_plain)


def test_switchback_linear_bnb():
    """SwitchBackLinearBnb (reference nn/modules.py:851-884): int8
    forward within the LLM.int8 accuracy envelope; backward is the
    straight fp path (grads match the fp linear's)."""
    from bitsandbytes_sycl_tpu.nn import SwitchBackLinearBnb

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
    m = SwitchBackLinearBnb(features=32, use_bias=True, compute_dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    W = np.asarray(variables["params"]["weight"], np.float32)
    b = np.asarray(variables["params"]["bias"], np.float32)

    y = np.asarray(m.apply(variables, x))
    ref = np.asarray(x) @ W.T + b
    denom = np.abs(ref).max()
    assert np.abs(y - ref).max() / denom < 0.05  # int8 fwd envelope

    # SwitchBack: backward is full-precision — weight grad equals the fp
    # linear's weight grad (up to the int8 fwd error through the loss)
    def loss(v):
        return (m.apply(v, x) ** 2).mean()

    g = jax.grad(loss)(variables)["params"]["weight"]
    gref = jax.grad(
        lambda Wv: ((x @ Wv.T + jnp.asarray(b)) ** 2).mean()
    )(jnp.asarray(W))
    cos = np.sum(np.asarray(g) * np.asarray(gref)) / (
        np.linalg.norm(np.asarray(g)) * np.linalg.norm(np.asarray(gref)) + 1e-12
    )
    assert cos > 0.99, cos
