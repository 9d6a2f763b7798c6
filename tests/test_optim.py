"""Optimizer parity — mirrors tests_pvc/test_optimizer8bit.py: dequantized
8-bit states and params must track the exact 32-bit optimizer within the
reference envelope (mean |dp| <~ 1.2e-4/step, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from bitsandbytes_sycl_tpu import functional as F
from bitsandbytes_sycl_tpu import optim as bnb_optim


def _run(tx, params, grads_seq):
    state = tx.init(params)

    @jax.jit
    def step(params, state, g):
        updates, state = tx.update(g, state, params)
        return optax.apply_updates(params, updates), state

    for g in grads_seq:
        params, state = step(params, state, g)
    return params, state


def _make_data(n_steps=20, shape=(47, 97), seed=0):
    rng = np.random.default_rng(seed)
    p0 = {"w": jnp.asarray(rng.normal(size=shape), jnp.float32)}
    gs = [{"w": jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)} for _ in range(n_steps)]
    return p0, gs


def test_adam32_matches_optax_adam():
    p0, gs = _make_data()
    p_ref, _ = _run(optax.adam(1e-3, 0.9, 0.999, 1e-8), p0, gs)
    p_bnb, _ = _run(bnb_optim.adam32bit(1e-3), p0, gs)
    np.testing.assert_allclose(np.asarray(p_bnb["w"]), np.asarray(p_ref["w"]), atol=2e-6)


def test_adam8bit_drift_envelope():
    p0, gs = _make_data(n_steps=30, shape=(64, 128))
    p_ref, _ = _run(bnb_optim.adam32bit(1e-3), p0, gs)
    p_8bit, s8 = _run(bnb_optim.adam8bit(1e-3, min_8bit_size=64), p0, gs)
    err = np.abs(np.asarray(p_8bit["w"]) - np.asarray(p_ref["w"])).mean()
    # reference: ~1.2e-4 mean abs err/step (test_optimizer8bit.py:166-169)
    assert err < 1.2e-4 * 30, err
    leaf = s8.inner["w"]
    assert leaf["state1"].dtype == jnp.uint8
    assert leaf["state2"].dtype == jnp.uint8
    assert leaf["absmax1"].shape == ((64 * 128 + 2047) // 2048,)


def test_adam8bit_small_tensor_stays_32bit():
    p0 = {"w": jnp.ones((10, 10), jnp.float32)}
    tx = bnb_optim.adam8bit(1e-3)  # min_8bit_size=4096 > 100
    st = tx.init(p0)
    assert st.inner["w"]["state1"].dtype == jnp.float32


def test_lion_matches_optax_lion():
    p0, gs = _make_data(n_steps=15)
    p_ref, _ = _run(optax.lion(1e-4, b1=0.9, b2=0.99), p0, gs)
    p_bnb, _ = _run(bnb_optim.lion32bit(1e-4, betas=(0.9, 0.99)), p0, gs)
    np.testing.assert_allclose(np.asarray(p_bnb["w"]), np.asarray(p_ref["w"]), atol=2e-5)


def test_momentum_matches_optax_sgd():
    p0, gs = _make_data(n_steps=15)
    p_ref, _ = _run(optax.sgd(1e-3, momentum=0.9), p0, gs)
    p_bnb, _ = _run(bnb_optim.sgd32bit(1e-3, momentum=0.9), p0, gs)
    np.testing.assert_allclose(np.asarray(p_bnb["w"]), np.asarray(p_ref["w"]), atol=2e-6)


def test_rmsprop_updates_move_params():
    p0, gs = _make_data(n_steps=10)
    p, _ = _run(bnb_optim.rmsprop32bit(1e-3), p0, gs)
    assert not np.allclose(np.asarray(p["w"]), np.asarray(p0["w"]))


def test_adagrad_updates_move_params():
    p0, gs = _make_data(n_steps=10)
    p, _ = _run(bnb_optim.adagrad32bit(1e-2), p0, gs)
    assert not np.allclose(np.asarray(p["w"]), np.asarray(p0["w"]))


def test_lamb_trust_ratio_bounds_update():
    p0, gs = _make_data(n_steps=5)
    p, _ = _run(bnb_optim.lamb32bit(1e-1, max_unorm=0.01), p0, gs)
    rel = np.linalg.norm(np.asarray(p["w"]) - np.asarray(p0["w"])) / np.linalg.norm(
        np.asarray(p0["w"])
    )
    # each step's update norm clipped to ~1% of param norm
    assert rel < 0.06, rel


def test_lars_momentum_with_trust_ratio():
    """LARS = momentum + per-layer trust clipping (reference
    str2optimizer32bit["lars"], functional.py:79). With a huge max_unorm
    the clip never binds and LARS == SGD-with-momentum; with a tight one
    the realized update norm is bounded."""
    p0, gs = _make_data(n_steps=10)
    p_ref, _ = _run(optax.sgd(1e-3, momentum=0.9), p0, gs)
    p_lars, _ = _run(bnb_optim.lars32bit(1e-3, momentum=0.9, max_unorm=1e9), p0, gs)
    np.testing.assert_allclose(np.asarray(p_lars["w"]), np.asarray(p_ref["w"]), atol=2e-6)

    p_tight, _ = _run(bnb_optim.lars32bit(1e-1, momentum=0.9, max_unorm=0.01), p0, gs)
    rel = np.linalg.norm(np.asarray(p_tight["w"]) - np.asarray(p0["w"])) / np.linalg.norm(
        np.asarray(p0["w"])
    )
    assert rel < 0.12, rel

    with pytest.raises(ValueError):  # upstream bnb: LARS requires momentum
        bnb_optim.lars(1e-3, momentum=0)
    # 8-bit variant constructs and runs
    p8, _ = _run(bnb_optim.lars8bit(1e-3), p0, gs[:3])
    assert not np.allclose(np.asarray(p8["w"]), np.asarray(p0["w"]))


def test_adamw_decoupled_decay():
    p0 = {"w": jnp.ones((8, 8), jnp.float32)}
    gs = [{"w": jnp.zeros((8, 8), jnp.float32)}]
    # zero grad, wd>0: adamw still shrinks params multiplicatively
    p, _ = _run(bnb_optim.adamw32bit(1e-1, weight_decay=0.5), p0, gs)
    np.testing.assert_allclose(np.asarray(p["w"]), 1.0 - 0.1 * 0.5, atol=1e-6)


def test_percentile_clipping_scales_spikes():
    p0, _ = _make_data(n_steps=1, shape=(32, 32))
    tx = bnb_optim.adam32bit(1e-2, percentile_clipping=5)
    state = tx.init(p0)
    rng = np.random.default_rng(1)

    @jax.jit
    def step(params, state, g):
        updates, state = tx.update(g, state, params)
        return optax.apply_updates(params, updates), state

    params = p0
    for i in range(10):
        g = {"w": jnp.asarray(rng.normal(size=(32, 32)) * 0.01, jnp.float32)}
        params, state = step(params, state, g)
    # now a 1000x spike: clipped update must stay small
    before = np.asarray(params["w"]).copy()
    spike = {"w": jnp.asarray(rng.normal(size=(32, 32)) * 10.0, jnp.float32)}
    params, state = step(params, state, spike)
    delta = np.abs(np.asarray(params["w"]) - before).max()
    assert delta < 0.05, delta


def test_paged_aliases_exist_and_run():
    p0, gs = _make_data(n_steps=2, shape=(16, 16))
    for ctor in (bnb_optim.paged_adam8bit, bnb_optim.paged_adamw32bit, bnb_optim.paged_lion8bit):
        _run(ctor(1e-3, min_8bit_size=16), p0, gs)


def test_state_pytree_roundtrip():
    """Optimizer state must survive flatten/unflatten — the orbax
    checkpoint contract (reference: state_dict round-trip every 10 steps,
    test_optimizer8bit.py:174-210)."""
    p0, gs = _make_data(n_steps=3, shape=(64, 64))
    tx = bnb_optim.adam8bit(1e-3, min_8bit_size=64)
    p1, s1 = _run(tx, p0, gs)
    leaves, treedef = jax.tree_util.tree_flatten(s1)
    s1b = jax.tree_util.tree_unflatten(treedef, leaves)
    # continue stepping from the reloaded state: must match exactly
    @jax.jit
    def step(params, state, g):
        updates, state = tx.update(g, state, params)
        return optax.apply_updates(params, updates), state

    pa, _ = step(p1, s1, gs[0])
    pb, _ = step(p1, s1b, gs[0])
    np.testing.assert_array_equal(np.asarray(pa["w"]), np.asarray(pb["w"]))


def test_global_optim_manager_overrides():
    params = {"emb": {"embedding": jnp.ones((128, 64))}, "dense": {"w": jnp.ones((128, 64))}}
    mgr = bnb_optim.GlobalOptimManager()
    mgr.register_module_override("embedding", optim_bits=32)
    tx = mgr.build("adam", params, optim_bits=8, min_8bit_size=64)
    st = tx.init(params)
    inner = st.inner_states  # optax.multi_transform PartitionState
    # embedding routed to 32-bit transform (label 1), dense to 8-bit (label 0)
    emb_state = inner[1].inner_state.inner["emb"]["embedding"]
    dense_state = inner[0].inner_state.inner["dense"]["w"]
    assert emb_state["state1"].dtype == jnp.float32
    assert dense_state["state1"].dtype == jnp.uint8


# ---------------------------------------------------------------------------
# fused Pallas 8-bit blockwise optimizer kernel (ops/optim8.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["adam", "momentum", "rmsprop", "adagrad", "lion"])
def test_optim8_pallas_kernel_matches_codec_path(name):
    import jax
    from bitsandbytes_sycl_tpu.ops.optim8 import _ROWS, optim8_blockwise_fused

    bs = 256
    nb = _ROWS
    n = nb * bs
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.normal(size=(n,)) * 0.01, jnp.float32)
    p = jnp.asarray(rng.normal(size=(n,)) * 0.02, jnp.float32)
    s1 = jnp.asarray(rng.integers(0, 256, n), jnp.uint8)
    am1 = jnp.asarray(np.abs(rng.normal(size=(nb,))) * 1e-3, jnp.float32)
    two = name == "adam"
    s2 = jnp.asarray(rng.integers(0, 256, n), jnp.uint8) if two else None
    am2 = jnp.asarray(np.abs(rng.normal(size=(nb,))) * 1e-5, jnp.float32) if two else None

    ref = F.optimizer_update_8bit_blockwise(
        name, g, p, s1, am1, s2, am2, None, None,
        beta1=0.9, beta2=0.999, eps=1e-8, step=3, lr=1e-3,
        weight_decay=0.01, blocksize=bs, codec="dynamic",
    )

    if two:
        c1 = 1.0 - 0.9**3
        c2 = float(np.sqrt(1.0 - 0.999**3))
        scalars = jnp.asarray(
            [0.9, 0.999, 1e-8 * c2, -1e-3 * c2 / c1, 1.0 - 1e-3 * 0.01, 1.0, 0.0, 0.0],
            jnp.float32,
        )
        out = optim8_blockwise_fused(
            name, g.reshape(nb, bs), p.reshape(nb, bs),
            s1.reshape(nb, bs), am1, s2.reshape(nb, bs), am2, scalars,
        )
        po, c1o, a1, c2o, a2 = out
        np.testing.assert_allclose(np.asarray(po).ravel(), np.asarray(ref[0]), rtol=1e-4, atol=1e-7)
        assert np.mean(np.asarray(c1o).ravel() == np.asarray(ref[1])) > 0.999
        assert np.mean(np.asarray(c2o).ravel() == np.asarray(ref[3])) > 0.999
        np.testing.assert_allclose(np.asarray(a1), np.asarray(ref[2]), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(ref[4]), rtol=1e-4)
    else:
        scalars = jnp.asarray([0.9, 0.999, 1e-8, 1e-3, 0.01, 1.0, 0.0, 0.0], jnp.float32)
        out = optim8_blockwise_fused(
            name, g.reshape(nb, bs), p.reshape(nb, bs), s1.reshape(nb, bs), am1, None, None, scalars,
        )
        po, c1o, a1 = out
        np.testing.assert_allclose(np.asarray(po).ravel(), np.asarray(ref[0]), rtol=1e-4, atol=1e-7)
        assert np.mean(np.asarray(c1o).ravel() == np.asarray(ref[1])) > 0.999
        np.testing.assert_allclose(np.asarray(a1), np.asarray(ref[2]), rtol=1e-4)


def test_stochastic_adjust_unbiased_and_degenerate():
    """E[decode(stochastic codes)] must equal the input value (the whole
    point of stochastic rounding); u=1 (never step) returns nearest."""
    from bitsandbytes_sycl_tpu.ops.dynamic8 import (
        dynamic_decode, dynamic_encode, stochastic_adjust,
    )

    rng = np.random.default_rng(0)
    for signed in (True, False):
        vals = rng.uniform(0.001 if not signed else -0.9, 0.9, size=(64,)).astype(np.float32)
        x = jnp.asarray(np.repeat(vals, 512).reshape(64, 512))
        codes = dynamic_encode(x, signed=signed)
        u = jnp.asarray(rng.uniform(0, 1, x.shape), jnp.float32)
        out = stochastic_adjust(codes, x, u, signed=signed)
        dec = np.asarray(dynamic_decode(out, signed=signed))
        # per-row mean of 512 independent roundings converges to the value
        err = np.abs(dec.mean(axis=1) - vals)
        step = np.abs(
            np.asarray(dynamic_decode(jnp.clip(codes[:, :1].astype(jnp.int32) + 1, 0, 255).astype(jnp.uint8), signed=signed))[:, 0]
            - np.asarray(dynamic_decode(codes[:, :1], signed=signed))[:, 0]
        )
        assert (err < np.maximum(step, 1e-7) * 0.35 + 1e-7).mean() > 0.9, err.max()
        # u >= 1 never steps: exact nearest codes
        same = stochastic_adjust(codes, x, jnp.ones_like(u), signed=signed)
        np.testing.assert_array_equal(np.asarray(same), np.asarray(codes))


def test_optim8_stochastic_rounding_paths_agree():
    """XLA codec path and the fused Pallas kernel must produce IDENTICAL
    codes under stochastic rounding when fed the same noise, and an
    adam8bit(stochastic_rounding=True) training step must still move
    params sanely."""
    from bitsandbytes_sycl_tpu.ops.optim8 import _ROWS, optim8_blockwise_fused

    bs = 256
    nb = _ROWS
    n = nb * bs
    rng = np.random.default_rng(9)
    g = jnp.asarray(rng.normal(size=(n,)) * 0.01, jnp.float32)
    p = jnp.asarray(rng.normal(size=(n,)) * 0.02, jnp.float32)
    s1 = jnp.asarray(rng.integers(0, 256, n), jnp.uint8)
    am1 = jnp.asarray(np.abs(rng.normal(size=(nb,))) * 1e-3, jnp.float32)
    s2 = jnp.asarray(rng.integers(0, 256, n), jnp.uint8)
    am2 = jnp.asarray(np.abs(rng.normal(size=(nb,))) * 1e-5, jnp.float32)

    # the seed/noise the functional path derives for step=3
    noise = jax.random.uniform(
        jax.random.fold_in(jax.random.PRNGKey(0xB17B), jnp.int32(3)), (n,), jnp.float32
    )
    ref = F.optimizer_update_8bit_blockwise(
        "adam", g, p, s1, am1, s2, am2, None, None,
        beta1=0.9, beta2=0.999, eps=1e-8, step=3, lr=1e-3,
        weight_decay=0.0, blocksize=bs, codec="dynamic", stochastic_rounding=True,
    )
    det = F.optimizer_update_8bit_blockwise(
        "adam", g, p, s1, am1, s2, am2, None, None,
        beta1=0.9, beta2=0.999, eps=1e-8, step=3, lr=1e-3,
        weight_decay=0.0, blocksize=bs, codec="dynamic", stochastic_rounding=False,
    )
    # stochastic and deterministic codes differ somewhere but never by >1
    d1 = np.asarray(ref[1], np.int32) - np.asarray(det[1], np.int32)
    assert np.abs(d1).max() <= 1 and np.abs(d1).sum() > 0

    c1 = 1.0 - 0.9**3
    c2f = float(np.sqrt(1.0 - 0.999**3))
    scalars = jnp.asarray(
        [0.9, 0.999, 1e-8 * c2f, -1e-3 * c2f / c1, 1.0, 1.0, 0.0, 0.0], jnp.float32
    )
    out = optim8_blockwise_fused(
        "adam", g.reshape(nb, bs), p.reshape(nb, bs),
        s1.reshape(nb, bs), am1, s2.reshape(nb, bs), am2, scalars,
        u=noise.reshape(nb, bs),
    )
    assert np.mean(np.asarray(out[1]).ravel() == np.asarray(ref[1])) > 0.999
    assert np.mean(np.asarray(out[3]).ravel() == np.asarray(ref[3])) > 0.999

    # end-to-end through make_optimizer
    p0, gs = _make_data(n_steps=8, shape=(64, 128))
    p_sr, _ = _run(bnb_optim.adam(optim_bits=8, min_8bit_size=256, stochastic_rounding=True), p0, gs)
    p_dt, _ = _run(bnb_optim.adam(optim_bits=8, min_8bit_size=256), p0, gs)
    assert not np.allclose(np.asarray(p_sr["w"]), np.asarray(p0["w"]))
    rel = np.abs(np.asarray(p_sr["w"]) - np.asarray(p_dt["w"])).mean() / (
        np.abs(np.asarray(p_dt["w"]) - np.asarray(p0["w"])).mean() + 1e-12
    )
    assert rel < 0.5, rel  # same trajectory up to rounding noise


def test_optim8_pallas_nan_gradient_leaves_state():
    from bitsandbytes_sycl_tpu.ops.optim8 import _ROWS, optim8_blockwise_fused

    bs = 256
    nb = _ROWS
    n = nb * bs
    rng = np.random.default_rng(3)
    g = jnp.full((n,), jnp.nan, jnp.float32)
    p = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    s1 = jnp.asarray(rng.integers(0, 256, n), jnp.uint8)
    am1 = jnp.asarray(np.abs(rng.normal(size=(nb,))) * 1e-3, jnp.float32)
    s2 = jnp.asarray(rng.integers(0, 256, n), jnp.uint8)
    am2 = jnp.asarray(np.abs(rng.normal(size=(nb,))) * 1e-5, jnp.float32)
    scalars = jnp.asarray([0.9, 0.999, 1e-8, -1e-3, 1.0, 1.0, 0.0, 0.0], jnp.float32)
    po, c1o, a1, c2o, a2 = optim8_blockwise_fused(
        "adam", g.reshape(nb, bs), p.reshape(nb, bs), s1.reshape(nb, bs), am1,
        s2.reshape(nb, bs), am2, scalars,
    )
    np.testing.assert_allclose(np.asarray(po).ravel(), np.asarray(p), atol=0)


def test_analysis_adam_tracks_quantization_error():
    from bitsandbytes_sycl_tpu.optim import analysis_adam

    params = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(4096,)), jnp.float32)}
    opt = analysis_adam(1e-3)
    st = opt.init(params)
    p = params
    for _ in range(3):
        g = {"w": jnp.sin(p["w"])}
        up, st = opt.update(g, st, p)
        p = optax.apply_updates(p, up)
    s = st.inner["w"]
    assert int(s["counts"]) == 3 * 4096
    # 8-bit dynamic quantization of the update: small but nonzero error
    mean_abs = float(s["abserr"]) / int(s["counts"])
    assert 0 < mean_abs < 1e-4
    assert bool(jnp.all(jnp.isfinite(p["w"])))


def test_optimizer_update_8bit_global_max():
    """Non-blockwise (per-tensor max) 8-bit update: parity-named wrapper
    (reference functional.py:1621, kernels N8)."""
    rng = np.random.default_rng(5)
    n = 4096
    g = jnp.asarray(rng.normal(size=(n,)) * 0.01, jnp.float32)
    p = jnp.asarray(rng.normal(size=(n,)) * 0.1, jnp.float32)
    s1 = jnp.zeros((n,), jnp.uint8)
    s2 = jnp.zeros((n,), jnp.uint8)
    out = F.optimizer_update_8bit(
        "adam", g, p, s1, s2, 0.9, 0.999, 1e-8, 1, 1e-3, codec="dynamic",
    )
    new_p, c1, nm1, c2, nm2 = out
    assert nm1.shape[0] == 1 and float(nm1[0]) > 0
    # one step from zero state: m = (1-b1) g -> new_max1 == max|m|
    np.testing.assert_allclose(float(nm1[0]), float(jnp.max(jnp.abs(0.1 * g))), rtol=1e-5)
    # decoded param update matches the fp32 formula within 8-bit noise
    ref_p, _, _ = F.optimizer_update_32bit("adam", g, p, jnp.zeros_like(g), jnp.zeros_like(g),
                                           0.9, 0.999, 1e-8, 1, 1e-3)
    np.testing.assert_allclose(np.asarray(new_p), np.asarray(ref_p), atol=5e-5)


def test_max_unorm_trust_ratio_32bit():
    """Reference unorm semantics (kernel_quant.cpp:1506-1614 + LAMB's
    max_unorm=1.0): the RAW lr-less update norm is clipped to
    max_unorm * ||p|| before lr applies."""
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(256,)) * 0.01, jnp.float32)
    g = jnp.asarray(rng.normal(size=(256,)) * 100.0, jnp.float32)  # huge step
    s1 = jnp.zeros((256,), jnp.float32)
    s2 = jnp.zeros((256,), jnp.float32)
    lr, mu = 1e-3, 0.5

    new_p, _, _ = F.optimizer_update_32bit(
        "lamb", g, p, s1, s2, 0.9, 0.999, 1e-8, 1, lr, max_unorm=mu
    )
    # adam raw update at step 1 has ||u|| ~ sqrt(n) >> mu*||p||, so the
    # realized step must sit exactly on the trust boundary
    c1, c2 = 1.0 - 0.9, np.sqrt(1.0 - 0.999)
    raw_norm = np.linalg.norm(np.asarray(new_p - p)) / (lr * c2 / c1)
    limit = mu * np.linalg.norm(np.asarray(p))
    np.testing.assert_allclose(raw_norm, limit, rtol=1e-3)

    # large ||p|| -> raw update norm (~sqrt(n), g-scale-invariant for
    # adam) sits below the boundary -> unclipped == plain adam
    p_big = p * 1000.0
    clipped, _, _ = F.optimizer_update_32bit(
        "lamb", g, p_big, s1, s2, 0.9, 0.999, 1e-8, 1, lr, max_unorm=mu
    )
    plain, _, _ = F.optimizer_update_32bit(
        "adam", g, p_big, s1, s2, 0.9, 0.999, 1e-8, 1, lr
    )
    np.testing.assert_allclose(np.asarray(clipped), np.asarray(plain), atol=0)


def test_lamb_optimizer_bounded_step():
    """optim.lamb: with max_unorm=1.0 every step's raw norm is bounded by
    the param norm, 32-bit and 8-bit states alike."""
    from bitsandbytes_sycl_tpu import optim

    for bits in (32, 8):
        params = {"w": jnp.asarray(np.random.default_rng(1).normal(size=(8192,)) * 0.01, jnp.float32)}
        tx = optim.lamb(learning_rate=1e-2, optim_bits=bits, min_8bit_size=1024)
        st = tx.init(params)
        g = {"w": jnp.asarray(np.random.default_rng(2).normal(size=(8192,)) * 1e3, jnp.float32)}
        upd, st = tx.update(g, st, params)
        step_norm = float(jnp.linalg.norm(upd["w"].astype(jnp.float32)))
        bound = 1.0 * float(jnp.linalg.norm(params["w"])) * 1e-2  # max_unorm * ||p|| * lr
        assert step_norm <= bound * 1.05, (bits, step_norm, bound)


def test_lamb_moves_zero_init_params():
    """The trust-ratio +eps floor: zero-norm params (zero-init LoRA B /
    classifier heads) must still receive updates."""
    from bitsandbytes_sycl_tpu import optim

    params = {"b": jnp.zeros((4096,), jnp.float32)}
    g = {"b": jnp.asarray(np.random.default_rng(0).normal(size=(4096,)), jnp.float32)}
    for bits in (32, 8):
        tx = optim.lamb(learning_rate=1e-2, optim_bits=bits, min_8bit_size=1024)
        st = tx.init(params)
        upd, st = tx.update(g, st, params)
        assert float(jnp.abs(upd["b"]).max()) > 0.0, bits


# ---------------------------------------------------------------------------
# custom-qmap (quantile / user-table) codec: select trees + fused LUT kernel
# (reference: arbitrary smem codebooks, kernel_quant.cpp:2715-2974)
# ---------------------------------------------------------------------------


def _quantile_maps(seed=3):
    rng = np.random.default_rng(seed)
    q1 = np.sort(np.unique(np.tanh(rng.normal(size=400)))).astype(np.float32)[:256]
    q2 = np.sort(np.unique(np.abs(np.tanh(rng.normal(size=500)))))[:256].astype(np.float32)
    assert q1.shape == q2.shape == (256,)
    assert np.all(np.diff(q1) > 0) and np.all(np.diff(q2) > 0)
    return q1, q2


def test_custom_qmap_adam_matches_searchsorted_semantics():
    """The XLA select-tree path must reproduce the take/searchsorted
    definition of the custom-qmap codec bit-exactly (codes) and to f32
    rounding (params)."""
    q1, q2 = _quantile_maps()
    rng = np.random.default_rng(11)
    bs = 2048
    n = bs * 4
    g = jnp.asarray(rng.normal(size=(n,)) * 0.01, jnp.float32)
    p = jnp.asarray(rng.normal(size=(n,)) * 0.02, jnp.float32)
    s1 = jnp.asarray(rng.integers(0, 256, n), jnp.uint8)
    am1 = jnp.asarray(np.abs(rng.normal(size=(n // bs,))) * 1e-3, jnp.float32)
    s2 = jnp.asarray(rng.integers(0, 256, n), jnp.uint8)
    am2 = jnp.asarray(np.abs(rng.normal(size=(n // bs,))) * 1e-5, jnp.float32)

    out = F.optimizer_update_8bit_blockwise(
        "adam", g, p, s1, am1, s2, am2, jnp.asarray(q1), jnp.asarray(q2),
        beta1=0.9, beta2=0.999, eps=1e-8, step=3, lr=1e-3,
        weight_decay=0.01, blocksize=bs,
    )

    mids1 = (q1[1:] + q1[:-1]) / 2.0
    mids2 = (q2[1:] + q2[:-1]) / 2.0
    s1f = q1[np.asarray(s1)] * np.repeat(np.asarray(am1), bs)
    s2f = q2[np.asarray(s2)] * np.repeat(np.asarray(am2), bs)
    gf, pf = np.asarray(g), np.asarray(p)
    n1 = s1f * 0.9 + 0.1 * gf
    n2 = s2f * 0.999 + 0.001 * gf * gf
    c1 = 1 - 0.9**3
    c2 = np.sqrt(1 - 0.999**3)
    pnew = (pf - 1e-3 * (n1 / c1) / (np.sqrt(np.maximum(n2, 0)) / c2 + 1e-8)) * (1 - 1e-5)

    def req(s, mids, table=None):
        b = s.reshape(-1, bs)
        am = np.abs(b).max(1)
        normed = b / np.where(am[:, None] == 0, 1, am[:, None])
        rank = np.searchsorted(mids, normed, side="left")
        if table is not None:
            # state1 sign preservation (kernel_quant.cpp:2935-2941)
            mism = (rank < np.signbit(table).sum()) != np.signbit(normed)
            rank = np.where(mism, np.clip(rank + np.where(normed > 0, 1, -1), 0, 255), rank)
        return rank.astype(np.uint8).reshape(-1), am

    rc1, ra1 = req(n1.astype(np.float32), mids1, table=q1)
    rc2, ra2 = req(np.maximum(n2, 0).astype(np.float32), mids2)
    # n2 stays >= 0 here (q2 is an unsigned map, decode >= 0)
    np.testing.assert_allclose(np.asarray(out[0]), pnew.astype(np.float32), rtol=2e-4, atol=1e-6)
    assert np.mean(np.asarray(out[1]) == rc1) > 0.999
    assert np.mean(np.asarray(out[3]) == rc2) > 0.999
    np.testing.assert_allclose(np.asarray(out[2]), ra1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[4]), ra2, rtol=1e-5)


@pytest.mark.parametrize("name", ["adam", "lion"])
def test_optim8_lut_kernel_matches_xla_tree_path(name):
    """The fused LUT-codec Pallas kernel (qmap1=/qmap2=, interpret mode on
    CPU) matches the XLA select-tree path within the same envelope as the
    dynamic-codec kernel parity test."""
    from bitsandbytes_sycl_tpu.ops.optim8 import _ROWS_LUT, optim8_blockwise_fused

    q1, q2 = _quantile_maps()
    rng = np.random.default_rng(7)
    bs = 512
    nb = _ROWS_LUT
    n = nb * bs
    g = jnp.asarray(rng.normal(size=(n,)) * 0.01, jnp.float32)
    p = jnp.asarray(rng.normal(size=(n,)) * 0.02, jnp.float32)
    s1 = jnp.asarray(rng.integers(0, 256, n), jnp.uint8)
    am1 = jnp.asarray(np.abs(rng.normal(size=(nb,))) * 1e-3, jnp.float32)
    two = name == "adam"
    s2 = jnp.asarray(rng.integers(0, 256, n), jnp.uint8) if two else None
    am2 = jnp.asarray(np.abs(rng.normal(size=(nb,))) * 1e-5, jnp.float32) if two else None

    ref = F.optimizer_update_8bit_blockwise(
        name, g, p, s1, am1, s2, am2, jnp.asarray(q1), jnp.asarray(q2) if two else None,
        beta1=0.9, beta2=0.999, eps=1e-8, step=3, lr=1e-3,
        weight_decay=0.01, blocksize=bs,
    )

    if two:
        c1 = 1.0 - 0.9**3
        c2 = float(np.sqrt(1.0 - 0.999**3))
        scalars = jnp.asarray(
            [0.9, 0.999, 1e-8 * c2, -1e-3 * c2 / c1, 1.0 - 1e-3 * 0.01, 1.0, 0.0, 0.0],
            jnp.float32,
        )
        out = optim8_blockwise_fused(
            name, g.reshape(nb, bs), p.reshape(nb, bs),
            s1.reshape(nb, bs), am1, s2.reshape(nb, bs), am2, scalars,
            qmap1=q1, qmap2=q2,
        )
        po, c1o, a1, c2o, a2 = out
        np.testing.assert_allclose(np.asarray(po).ravel(), np.asarray(ref[0]), rtol=1e-4, atol=1e-7)
        assert np.mean(np.asarray(c1o).ravel() == np.asarray(ref[1])) > 0.999
        assert np.mean(np.asarray(c2o).ravel() == np.asarray(ref[3])) > 0.999
        np.testing.assert_allclose(np.asarray(a1).ravel(), np.asarray(ref[2]), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a2).ravel(), np.asarray(ref[4]), rtol=1e-4)
    else:
        scalars = jnp.asarray([0.9, 0.999, 1e-8, 1e-3, 0.01, 1.0, 0.0, 0.0], jnp.float32)
        out = optim8_blockwise_fused(
            name, g.reshape(nb, bs), p.reshape(nb, bs), s1.reshape(nb, bs), am1,
            None, None, scalars, qmap1=q1,
        )
        po, c1o, a1 = out
        np.testing.assert_allclose(np.asarray(po).ravel(), np.asarray(ref[0]), rtol=1e-4, atol=1e-7)
        assert np.mean(np.asarray(c1o).ravel() == np.asarray(ref[1])) > 0.999
        np.testing.assert_allclose(np.asarray(a1).ravel(), np.asarray(ref[2]), rtol=1e-4)


def test_optim8_lut_kernel_refuses_stochastic_and_bad_tiles():
    """Guards: stochastic rounding, untileable shapes, invalid tables and
    a 2-state call missing qmap2 all return None (the caller falls back to
    the XLA tree path) instead of crashing."""
    from bitsandbytes_sycl_tpu.ops.optim8 import _ROWS_LUT, optim8_blockwise_fused

    q1, q2 = _quantile_maps()
    nb, bs = _ROWS_LUT, 512
    g = jnp.zeros((nb, bs), jnp.float32)
    s = jnp.zeros((nb, bs), jnp.uint8)
    am = jnp.ones((nb,), jnp.float32)
    scalars = jnp.zeros((8,), jnp.float32)
    u = jnp.zeros((nb, bs), jnp.float32)
    assert optim8_blockwise_fused("lion", g, g, s, am, None, None, scalars, u=u, qmap1=q1) is None
    g3 = jnp.zeros((3, bs), jnp.float32)
    assert optim8_blockwise_fused(
        "lion", g3, g3, jnp.zeros((3, bs), jnp.uint8), jnp.ones((3,)), None, None, scalars, qmap1=q1
    ) is None
    # 2-state with qmap1 but no qmap2: documented fallback, not a crash
    assert optim8_blockwise_fused(
        "adam", g, g, s, am, s, am, scalars, qmap1=q1, qmap2=None
    ) is None
    # invalid tables: wrong shape, non-monotone, constant
    assert optim8_blockwise_fused(
        "lion", g, g, s, am, None, None, scalars, qmap1=q1[:100]
    ) is None
    assert optim8_blockwise_fused(
        "lion", g, g, s, am, None, None, scalars, qmap1=q1[::-1].copy()
    ) is None
    assert optim8_blockwise_fused(
        "lion", g, g, s, am, None, None, scalars, qmap1=np.zeros(256, np.float32)
    ) is None


def test_optim8_lut_kernel_dedupes_zero_padded_codebook():
    """A zero-padded sub-256 codebook (the reference's convention for
    <8-bit types, codebooks._pad_sorted_to_256) and a peaked-data quantile
    map with repeated entries both dispatch to the FUSED kernel, with
    codes identical to the XLA tree path (VERDICT r4 weak #6)."""
    from bitsandbytes_sycl_tpu import codebooks
    from bitsandbytes_sycl_tpu.ops.optim8 import (
        _ROWS_LUT, lut_table_ok, optim8_blockwise_fused,
    )

    # 7-bit signed map zero-padded to 256: 127 duplicate zeros
    sub = np.sort(np.tanh(np.linspace(-2.0, 2.0, 129))).astype(np.float32)
    q1 = codebooks._pad_sorted_to_256(list(sub))
    assert np.unique(q1).size < 256 and lut_table_ok(q1)
    # peaked-data quantile map: repeated quantiles
    peaked = np.concatenate([np.zeros(400), np.tanh(np.random.default_rng(0).normal(size=112))])
    q2 = np.sort(np.quantile(np.abs(peaked), np.linspace(0, 1, 256))).astype(np.float32)
    assert np.unique(q2).size < 256 and lut_table_ok(q2)

    rng = np.random.default_rng(5)
    nb, bs = _ROWS_LUT, 512
    n = nb * bs
    g = jnp.asarray(rng.normal(size=(n,)) * 0.01, jnp.float32)
    p = jnp.asarray(rng.normal(size=(n,)) * 0.02, jnp.float32)
    s1 = jnp.asarray(rng.integers(0, 256, n), jnp.uint8)
    am1 = jnp.asarray(np.abs(rng.normal(size=(nb,))) * 1e-3, jnp.float32)
    s2 = jnp.asarray(rng.integers(0, 256, n), jnp.uint8)
    am2 = jnp.asarray(np.abs(rng.normal(size=(nb,))) * 1e-5, jnp.float32)

    c1 = 1.0 - 0.9**3
    c2f = float(np.sqrt(1.0 - 0.999**3))
    scalars = jnp.asarray(
        [0.9, 0.999, 1e-8 * c2f, -1e-3 * c2f / c1, 1.0, 1.0, 0.0, 0.0], jnp.float32
    )
    out = optim8_blockwise_fused(
        "adam", g.reshape(nb, bs), p.reshape(nb, bs),
        s1.reshape(nb, bs), am1, s2.reshape(nb, bs), am2, scalars,
        qmap1=q1, qmap2=q2,
    )
    assert out is not None, "deduped tables must dispatch fused"
    ref = F.optimizer_update_8bit_blockwise(
        "adam", g, p, s1, am1, s2, am2, jnp.asarray(q1), jnp.asarray(q2),
        beta1=0.9, beta2=0.999, eps=1e-8, step=3, lr=1e-3,
        weight_decay=0.0, blocksize=bs,
    )
    po, c1o, a1, c2o, a2 = out
    np.testing.assert_allclose(np.asarray(po).ravel(), np.asarray(ref[0]), rtol=1e-4, atol=1e-7)
    assert np.mean(np.asarray(c1o).ravel() == np.asarray(ref[1])) > 0.999
    assert np.mean(np.asarray(c2o).ravel() == np.asarray(ref[3])) > 0.999
    # encode lands on the FIRST index of each duplicate run, so decode
    # through the original table round-trips exactly
    dec_fused = q1[np.asarray(c1o).ravel()]
    dec_xla = q1[np.asarray(ref[1])]
    np.testing.assert_array_equal(dec_fused, dec_xla)


def test_optim8_state1_sign_preserved():
    """The reference bumps state1 codes so a nonzero momentum never
    requantizes to zero/wrong sign (kernel_quant.cpp:2935-2941). A tiny
    negative momentum must decode back negative on both the fused and
    XLA paths, for both the dynamic and custom-qmap codecs."""
    bs = 2048
    nb = 2
    n = nb * bs
    rng = np.random.default_rng(9)
    # gradients chosen so n1 = 0.1*g has magnitudes straddling the
    # zero-rounding threshold of the block (one huge element sets absmax)
    g = np.zeros(n, np.float32)
    g[0] = 1.0  # absmax anchor per block
    g[bs] = 1.0
    tiny = rng.uniform(1e-9, 1e-7, size=100).astype(np.float32)
    g[1:101] = -tiny  # tiny NEGATIVE gradients -> tiny negative momentum
    p = jnp.zeros((n,), jnp.float32)
    s1 = jnp.full((n,), 127, jnp.uint8)  # zero state (dynamic map)
    am1 = jnp.zeros((nb,), jnp.float32)
    s2 = jnp.full((n,), 0, jnp.uint8)
    am2 = jnp.zeros((nb,), jnp.float32)

    out = F.optimizer_update_8bit_blockwise(
        "adam", jnp.asarray(g), p, s1, am1, s2, am2, None, None,
        beta1=0.9, beta2=0.999, eps=1e-8, step=1, lr=1e-3, blocksize=bs,
    )
    from bitsandbytes_sycl_tpu.ops.dynamic8 import dynamic_decode

    dec = np.asarray(dynamic_decode(out[1], signed=True)) * np.repeat(np.asarray(out[2]), bs)
    assert np.all(dec[1:101] < 0), "tiny negative momentum must stay negative"

    # custom-qmap path (XLA tree): same invariant
    q1, q2 = _quantile_maps()
    out2 = F.optimizer_update_8bit_blockwise(
        "adam", jnp.asarray(g), p,
        jnp.full((n,), int(np.argmin(np.abs(q1))), jnp.uint8), am1,
        jnp.zeros((n,), jnp.uint8), am2,
        jnp.asarray(q1), jnp.asarray(q2),
        beta1=0.9, beta2=0.999, eps=1e-8, step=1, lr=1e-3, blocksize=bs,
    )
    dec2 = q1[np.asarray(out2[1])] * np.repeat(np.asarray(out2[2]), bs)
    assert np.all(dec2[1:101] < 0)


def test_custom_qmap_stochastic_rounding_warns():
    """stochastic_rounding with a custom qmap degrades to deterministic
    rounding — loudly (ADVICE r4)."""
    import warnings

    q1, q2 = _quantile_maps()
    bs = 2048
    n = bs
    g = jnp.ones((n,), jnp.float32) * 0.01
    s = jnp.zeros((n,), jnp.uint8)
    am = jnp.ones((1,), jnp.float32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        F.optimizer_update_8bit_blockwise(
            "adam", g, g, s, am, s, am, jnp.asarray(q1), jnp.asarray(q2),
            beta1=0.9, beta2=0.999, eps=1e-8, step=1, lr=1e-3,
            blocksize=bs, stochastic_rounding=True,
        )
    assert any("stochastic_rounding" in str(x.message) for x in w)
