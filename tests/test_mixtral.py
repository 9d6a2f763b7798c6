"""Mixtral family — top-2 routed MoE FFN on the llama substrate, plus
expert parallelism (stacked experts sharded on the expert dim).

The reference has no model or MoE code (SURVEY.md §2.3 lists EP as
absent); these are new-build surface tests for models/mixtral.py and
llama._moe_ffn.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from bitsandbytes_sycl_tpu.models.llama import init_kv_cache, init_params
from bitsandbytes_sycl_tpu.models.mixtral import MixtralConfig, mixtral_forward


@pytest.fixture(scope="module")
def setup():
    # a8_decode=False: these are exactness tests against manually
    # dequantized expert weights / single-device EP — the W4A8 default's
    # per-row int8 activation quant is noise-close, not exact (its TP
    # composition is covered in test_parallel)
    cfg = MixtralConfig.tiny(quant="nf4", dtype=jnp.float32, a8_decode=False)
    params = init_params(cfg, jax.random.PRNGKey(11))
    return cfg, params


def test_param_tree_shape(setup):
    """MoE layers carry a replicated router and STACKED experts (leading
    dim E on every leaf), and no dense gate/up/down."""
    cfg, params = setup
    layer = params["layers"][0]
    assert "gate_proj" not in layer and "router" in layer
    assert layer["router"].shape == (cfg.num_experts, cfg.hidden_size)
    leaves = jax.tree.leaves(layer["experts"])
    assert all(l.shape[0] == cfg.num_experts for l in leaves)


def test_moe_matches_manual_reference(setup):
    """_moe_ffn == hand-rolled HF MixtralSparseMoeBlock math (softmax over
    all experts -> top-k -> renormalize -> weighted SwiGLU sum) computed
    from the dequantized expert weights."""
    from bitsandbytes_sycl_tpu.models.llama import _expert_slice, _moe_ffn

    cfg, params = setup
    layer = params["layers"][0]
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(2, 5, cfg.hidden_size)), jnp.float32)

    got = np.asarray(_moe_ffn(h, layer, cfg, None), np.float32)

    logits = np.asarray(h, np.float32) @ np.asarray(layer["router"], np.float32).T
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    order = np.argsort(-probs, axis=-1)[..., : cfg.num_experts_per_tok]
    ref = np.zeros_like(np.asarray(h, np.float32))
    for b in range(h.shape[0]):
        for t in range(h.shape[1]):
            sel = order[b, t]
            w = probs[b, t, sel]
            w = w / w.sum()
            for wi, e in zip(w, sel):
                ex = _expert_slice(layer["experts"], int(e))
                g = np.asarray(ex["gate_proj"].dequantize(), np.float32)
                u = np.asarray(ex["up_proj"].dequantize(), np.float32)
                d = np.asarray(ex["down_proj"].dequantize(), np.float32)
                xv = np.asarray(h[b, t], np.float32)
                act = (xv @ g.T) / (1 + np.exp(-(xv @ g.T))) * (xv @ u.T)
                ref[b, t] += wi * (act @ d.T)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel


def test_dispatch_path_matches_dense_combine(setup):
    """With ample capacity the GShard-style dispatch/combine einsum path
    equals dense combine (same routing, no drops); with a starved
    capacity it must drop overflow tokens (outputs differ, stay finite)."""
    from bitsandbytes_sycl_tpu.models.llama import _moe_ffn

    cfg, params = setup
    layer = params["layers"][0]
    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.normal(size=(2, 64, cfg.hidden_size)), jnp.float32)

    dense = np.asarray(_moe_ffn(h, layer, cfg, None), np.float32)
    cfg_disp = dataclasses.replace(
        cfg, moe_dispatch_min_tokens=1, moe_capacity_factor=float(cfg.num_experts),
    )  # cf=E => C=N: no token can overflow
    disp = np.asarray(_moe_ffn(h, layer, cfg_disp, None), np.float32)
    np.testing.assert_allclose(disp, dense, rtol=1e-5, atol=1e-5)

    cfg_tight = dataclasses.replace(
        cfg, moe_dispatch_min_tokens=1, moe_capacity_factor=0.25,
    )
    tight = np.asarray(_moe_ffn(h, layer, cfg_tight, None), np.float32)
    assert np.isfinite(tight).all()
    assert np.abs(tight - dense).max() > 0  # drops actually happened


def test_dispatch_path_under_expert_parallel(setup):
    """The dispatch path composes with EP: each device dispatches into
    its local experts' capacity buffers; ample capacity == single-device
    dense output."""
    from jax.sharding import NamedSharding
    from bitsandbytes_sycl_tpu.parallel import make_mesh
    from bitsandbytes_sycl_tpu.parallel.llama_tp import (
        kv_cache_specs, llama_forward_tp, shard_llama_params,
    )

    cfg, params = setup
    cfg_disp = dataclasses.replace(
        cfg, moe_dispatch_min_tokens=1, moe_capacity_factor=float(cfg.num_experts),
    )
    mesh = make_mesh({"model": 2})
    sp = shard_llama_params(params, cfg_disp, mesh)
    B, T = 2, 8
    toks = jnp.asarray(np.random.default_rng(6).integers(0, 256, (B, T)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))
    lt, _ = llama_forward_tp(sp, cfg_disp, toks, None, pos, mesh)
    l1, _ = mixtral_forward(params, cfg, toks, None, pos)
    np.testing.assert_allclose(
        np.asarray(lt, np.float32), np.asarray(l1, np.float32), rtol=2e-2, atol=2e-2
    )


def test_prefill_decode_consistency(setup):
    """Prefill+decode through the int8 KV cache matches the cacheless
    forward — the MoE block composes with the shared attention path."""
    cfg, params = setup
    B, T = 2, 9
    toks = jnp.asarray(np.random.default_rng(1).integers(0, 256, (B, T)), jnp.int32)
    full, _ = mixtral_forward(params, cfg, toks)

    cache = init_kv_cache(cfg, B)
    pos = jnp.broadcast_to(jnp.arange(T - 1), (B, T - 1))
    _, cache = mixtral_forward(params, cfg, toks[:, :-1], cache, pos)
    posd = jnp.full((B, 1), T - 1, jnp.int32)
    ld, _ = mixtral_forward(params, cfg, toks[:, -1:], cache, posd)
    rel = np.linalg.norm(np.asarray(ld[:, 0]) - np.asarray(full[:, -1])) / np.linalg.norm(
        np.asarray(full[:, -1])
    )
    assert rel < 0.05, rel


def test_expert_parallel_matches_single_device(setup):
    """EP over the "model" axis: stacked experts shard on the expert dim,
    router replicated, routing computed globally on every device and the
    local windows combined by the layer psum — logits == single-device;
    attention TP (heads) composes on the same axis."""
    from jax.sharding import NamedSharding
    from bitsandbytes_sycl_tpu.parallel import make_mesh
    from bitsandbytes_sycl_tpu.parallel.llama_tp import (
        kv_cache_specs, llama_forward_tp, shard_llama_params,
    )

    cfg, params = setup
    mesh = make_mesh({"model": 2})  # 4 experts -> 2/device; 4 heads, 2 kv
    sp = shard_llama_params(params, cfg, mesh)
    # the expert stack really is sharded on its leading dim
    ex_leaf = jax.tree.leaves(sp["layers"][0]["experts"])[0]
    assert ex_leaf.sharding.spec[0] == "model"

    B, T = 2, 6
    toks = jnp.asarray(np.random.default_rng(2).integers(0, 256, (B, T)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))
    cache = init_kv_cache(cfg, B)
    cache_sh = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache, kv_cache_specs(cfg),
        is_leaf=lambda x: isinstance(x, P),
    )

    lt, ct = llama_forward_tp(sp, cfg, toks, cache_sh, pos, mesh)
    l1, c1 = mixtral_forward(params, cfg, toks, cache, pos)
    np.testing.assert_allclose(
        np.asarray(lt, np.float32), np.asarray(l1, np.float32), rtol=2e-2, atol=2e-2
    )
    posd = jnp.full((B, 1), T, jnp.int32)
    ldt, _ = llama_forward_tp(sp, cfg, toks[:, -1:], ct, posd, mesh)
    ld1, _ = mixtral_forward(params, cfg, toks[:, -1:], c1, posd)
    np.testing.assert_allclose(
        np.asarray(ldt, np.float32), np.asarray(ld1, np.float32), rtol=2e-2, atol=2e-2
    )


def test_ep_requires_divisibility(setup):
    from bitsandbytes_sycl_tpu.parallel import make_mesh
    from bitsandbytes_sycl_tpu.parallel.llama_tp import llama_forward_tp

    cfg, params = setup
    cfg3 = dataclasses.replace(cfg, num_experts=3)
    mesh = make_mesh({"model": 2})
    with pytest.raises(ValueError, match="num_experts"):
        llama_forward_tp(params, cfg3, jnp.zeros((1, 1), jnp.int32), None,
                         jnp.zeros((1, 1), jnp.int32), mesh)


def test_quantize_params_handles_expert_stack(setup):
    """quantize_params must quantize each stacked fp expert (not leave
    the MoE subtree silently fp): nf4-requantized forward stays within
    4-bit noise of the fp forward."""
    from bitsandbytes_sycl_tpu.models.llama import quantize_params
    from bitsandbytes_sycl_tpu.ops.common import QLinearWeight

    cfg_fp = dataclasses.replace(setup[0], quant="none")
    fp = init_params(cfg_fp, jax.random.PRNGKey(17))
    cfg_q = dataclasses.replace(cfg_fp, quant="nf4")
    qp = quantize_params(fp, cfg_q)
    assert isinstance(qp["layers"][0]["experts"]["gate_proj"], QLinearWeight)
    toks = jnp.asarray(np.random.default_rng(8).integers(0, 256, (1, 6)), jnp.int32)
    lf, _ = mixtral_forward(fp, cfg_fp, toks)
    lq, _ = mixtral_forward(qp, cfg_q, toks)
    rel = np.linalg.norm(np.asarray(lq) - np.asarray(lf)) / np.linalg.norm(np.asarray(lf))
    # looser than the dense-model 0.25 bound: a tiny RANDOM router has
    # near-uniform logits, so 4-bit noise flips some top-k routing
    # decisions (discrete output changes on top of quantization noise)
    assert rel < 0.5, rel


def test_engine_serves_mixtral(setup):
    """The engine's (params, cfg, tokens, cache, positions) contract
    covers the MoE family unchanged."""
    from bitsandbytes_sycl_tpu.engine import EngineConfig, InferenceEngine

    cfg, params = setup
    eng = InferenceEngine(cfg, params, EngineConfig(max_batch=2, max_new_tokens=4))
    outs = eng.generate([[3, 5, 7], [2, 4, 6, 8]], max_new_tokens=4)
    assert len(outs) == 2 and all(len(o) == 4 for o in outs)


def test_hf_mixtral_fp_parity(tmp_path):
    """Tiny HF Mixtral through load_mixtral_from_hf must reproduce
    transformers logits — wrong routing (softmax/top-k/renormalize
    order) or expert key mapping shows up as a large rel error."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from bitsandbytes_sycl_tpu.models.mixtral import load_mixtral_from_hf

    cfg_hf = transformers.MixtralConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        num_local_experts=4, num_experts_per_tok=2, rope_theta=10000.0,
        sliding_window=None, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(13)
    model = transformers.MixtralForCausalLM(cfg_hf).eval()
    d = tmp_path / "hf_mixtral"
    model.save_pretrained(d, safe_serialization=True)
    toks = torch.randint(0, 256, (2, 12))
    with torch.no_grad():
        ref = model(toks).logits.float().numpy()

    cfg, _ = load_mixtral_from_hf(str(d))
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    cfg = dataclasses.replace(cfg, quant="none", dtype=jnp.float32)
    _, params = load_mixtral_from_hf(str(d), cfg=cfg)
    logits, _ = mixtral_forward(params, cfg, jnp.asarray(toks.numpy()))
    got = np.asarray(logits, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel
