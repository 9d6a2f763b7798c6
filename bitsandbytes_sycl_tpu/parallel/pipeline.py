"""Pipeline parallelism — GPipe-style microbatch pipeline over a "stage"
mesh axis with `ppermute` boundary transfers.

SURVEY.md §2.3 plans PP as the >1-host scaling path when TP alone is
insufficient (layer stages ride DCN, whose lower bandwidth only has to
carry one (micro_B, T, hidden) activation per stage boundary per tick,
not weights). The reference has no distributed code at all.

Design: layers are partitioned contiguously into S stages; each stage's
quantized weights are stacked on a leading stage axis and sharded
P("stage") so every device holds only its own layers. The classic
(n_micro + S - 1)-tick schedule runs inside one shard_map: each tick,
every stage runs its layer block on its current microbatch while the
boundary activations rotate one stage forward via ppermute — compute and
ICI/DCN transfer overlap across ticks under XLA's latency-hiding
scheduler.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.llama import LlamaConfig, llama_forward

__all__ = [
    "stack_stage_params",
    "llama_forward_pp",
    "init_stage_kv_cache",
    "llama_forward_pp_decode",
]


def _stack_leaves(layer_dicts: List[Dict]):
    """Stack a list of per-layer pytrees into one pytree with a leading
    axis (used twice: layers-per-stage, then stages)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_dicts)


def stack_stage_params(params: Dict, cfg: LlamaConfig, n_stages: int, mesh: Mesh, axis: str = "stage"):
    """Partition layers contiguously into n_stages, stack each stage's
    layers, then stack stages on a leading axis sharded P(stage).
    Embed/final_norm/lm_head are replicated (first/last stage use them).

    Returns (stage_params, per_layer_struct) where stage_params leaves
    have shape (n_stages, layers_per_stage, ...).
    """
    L = cfg.num_layers
    assert L % n_stages == 0, f"num_layers {L} % n_stages {n_stages} != 0"
    per = L // n_stages
    stages = []
    for s in range(n_stages):
        stages.append(_stack_leaves(params["layers"][s * per : (s + 1) * per]))
    stacked = _stack_leaves(stages)  # leading dims (n_stages, per, ...)
    sharded = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), stacked
    )
    rest = {k: v for k, v in params.items() if k != "layers"}
    rest = jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), rest)
    return sharded, rest


def llama_forward_pp(
    stage_layers,
    rest: Dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # (B, T); B % n_micro == 0
    mesh: Mesh,
    n_micro: int,
    axis: str = "stage",
) -> jax.Array:
    """Cacheless pipelined forward (prefill/training-style): returns
    logits (B, T, vocab), replicated.

    Each tick every stage processes one microbatch through its layer
    block (a lax.scan over the stacked per-stage layers), then boundary
    activations ppermute one stage forward.
    """
    S = mesh.shape[axis]
    B, T = tokens.shape
    assert B % n_micro == 0
    mb = B // n_micro
    H = cfg.hidden_size
    cfg1 = dataclasses.replace(cfg, num_layers=1)

    lspecs = jax.tree.map(lambda _: P(axis), stage_layers)
    rspecs = jax.tree.map(lambda _: P(), rest)

    def body(layers_l, rest_l, tokens):
        sid = jax.lax.axis_index(axis)
        # drop the stage axis shard_map leaves: (1, per, ...) -> (per, ...)
        layers_l = jax.tree.map(lambda x: x[0], layers_l)

        def run_block(x):
            """Run this stage's `per` layers on activations x (mb, T, H)."""

            def one(x, layer):
                params1 = {"layers": [layer], "embed": rest_l["embed"],
                           "final_norm": rest_l["final_norm"]}
                # reuse llama_forward's layer body via a single-layer call
                # on pre-embedded activations: bypass embed/head by calling
                # the internal layer computation
                return _run_single_layer(params1["layers"][0], cfg1, x), None

            x, _ = jax.lax.scan(one, x, layers_l)
            return x

        micros = tokens.reshape(n_micro, mb, T)
        embed = rest_l["embed"]

        def embed_mb(i):
            return _embed(embed, micros[i], cfg)

        buf = jnp.zeros((mb, T, H), cfg.dtype)  # stage input register
        outs = jnp.zeros((n_micro, mb, T, H), cfg.dtype)

        def tick(t, carry):
            buf, outs = carry
            # first stage injects microbatch t (if any remain)
            inject = jnp.where(t < n_micro, t, 0)
            x_in = jnp.where(sid == 0, embed_mb(inject), buf)
            y = run_block(x_in)
            # last stage collects microbatch (t - S + 1)
            done_idx = jnp.clip(t - S + 1, 0, n_micro - 1)
            collect = jnp.logical_and(sid == S - 1, t >= S - 1)
            outs = jax.lax.dynamic_update_slice(
                outs,
                jnp.where(collect, y, outs[done_idx])[None],
                (done_idx, 0, 0, 0),
            )
            # rotate boundary activations one stage forward
            buf = jax.lax.ppermute(y, axis, [(i, (i + 1) % S) for i in range(S)])
            return buf, outs

        buf, outs = jax.lax.fori_loop(0, n_micro + S - 1, tick, (buf, outs))
        # final norm + head on the last stage's collected activations;
        # broadcast via masked psum (ppermute requires a permutation, not
        # one-to-many) so logits come back replicated
        if S > 1:
            outs = jax.lax.psum(
                jnp.where(sid == S - 1, outs, jnp.zeros_like(outs)), axis
            )
        x = outs.reshape(B, T, H)
        x = _rms(x, rest_l["final_norm"], cfg.rms_eps, getattr(cfg, "norm_offset", False))
        if "lm_head" in rest_l:
            from ..models.llama import apply_linear

            logits = apply_linear(x, rest_l["lm_head"], cfg)
        else:
            logits = jnp.matmul(x, rest_l["embed"].T.astype(cfg.dtype))
        return logits.astype(jnp.float32)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(lspecs, rspecs, P()),
        out_specs=P(),
        check_rep=False,
    )
    return fn(stage_layers, rest, tokens)


def _rms(x, w, eps, offset: bool = False):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    wf = w.astype(jnp.float32) + 1.0 if offset else w.astype(jnp.float32)
    return (n * wf).astype(x.dtype)


def _embed(embed, toks, cfg):
    """Token embedding incl. Gemma's sqrt(hidden) scaling — mirrors the
    embed step of models.llama.llama_forward."""
    x = jnp.take(embed, toks, axis=0).astype(cfg.dtype)
    if getattr(cfg, "scale_embeddings", False):
        import numpy as _np

        x = x * jnp.asarray(_np.sqrt(cfg.hidden_size), cfg.dtype)
    return x


# ---------------------------------------------------------------------------
# PP with KV cache: pipelined prefill + decode (VERDICT r1 item 8 — round 1
# was cacheless-only, so multi-host decode was impossible)
# ---------------------------------------------------------------------------


def init_stage_kv_cache(
    cfg: LlamaConfig, batch: int, n_stages: int, mesh: Mesh, axis: str = "stage"
) -> Dict:
    """KV cache with the layer axis split (n_stages, layers_per_stage, ...)
    and sharded P(stage): each device holds exactly its own layers' cache —
    cache never rides the interconnect (only the (mb, T, hidden) boundary
    activations do)."""
    from ..models.llama import init_kv_cache

    per = cfg.num_layers // n_stages
    full = init_kv_cache(cfg, batch)

    def split(x):
        return x.reshape((n_stages, per) + x.shape[1:])

    stacked = jax.tree.map(split, full)
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), stacked
    )


def _run_single_layer_cached(layer, cfg: LlamaConfig, x, cache1, positions, psum_axis=None):
    """One decoder layer on pre-embedded activations with a single-layer
    KV-cache view (leaves (1, B, ...)). Mirrors llama_forward's cached
    layer body via the shared write_and_attend."""
    from ..models.llama import _mlp_act, _rms_norm, _rope, apply_linear, write_and_attend

    B, T, _ = x.shape
    S = cache1["k"].shape[-1]  # max_seq (last axis of transposed K)
    s_ids = jnp.arange(S)[None, None, :]
    mask = s_ids <= positions[:, :, None]  # (B, T, S) absolute causal
    norm_off = getattr(cfg, "norm_offset", False)

    h = _rms_norm(x, layer["input_norm"], cfg.rms_eps, norm_off)
    q = apply_linear(h, layer["q_proj"], cfg).reshape(B, T, cfg.num_heads, cfg.hd)
    k = apply_linear(h, layer["k_proj"], cfg).reshape(B, T, cfg.num_kv_heads, cfg.hd)
    v = apply_linear(h, layer["v_proj"], cfg).reshape(B, T, cfg.num_kv_heads, cfg.hd)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)
    attn, cache1 = write_and_attend(cache1, 0, q, k, v, positions, mask, cfg)
    attn = attn.astype(cfg.dtype).reshape(B, T, cfg.num_heads * cfg.hd)
    o = apply_linear(attn, layer["o_proj"], cfg)
    if psum_axis is not None:
        o = jax.lax.psum(o, psum_axis)
    x = x + o
    h = _rms_norm(x, layer["post_attn_norm"], cfg.rms_eps, norm_off)
    gate = apply_linear(h, layer["gate_proj"], cfg)
    up = apply_linear(h, layer["up_proj"], cfg)
    d = apply_linear(
        _mlp_act(cfg, gate.astype(jnp.float32)).astype(cfg.dtype) * up, layer["down_proj"], cfg
    )
    if psum_axis is not None:
        d = jax.lax.psum(d, psum_axis)
    return x + d, cache1


def _tp_layer_specs(layer_leaf_tree, stage_axis: str, tp_axis: str):
    """Specs for stage-stacked fp layer params (S, per, N, K), TP-sharded
    Megatron-style on top of the stage axis (TPxPP composition; fp
    weights only — quantized row-parallel needs per-device retiling)."""
    col = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
    row = ("o_proj", "down_proj")

    def spec(name):
        if name in col:
            return P(stage_axis, None, tp_axis, None)
        if name in row:
            return P(stage_axis, None, None, tp_axis)
        return P(stage_axis)

    return {name: spec(name) for name in layer_leaf_tree}


def llama_forward_pp_decode(
    stage_layers,
    rest: Dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # (B, T): T=1 decode, T=prompt prefill
    cache: Dict,  # from init_stage_kv_cache
    positions: jax.Array,  # (B, T) absolute positions
    mesh: Mesh,
    n_micro: int = 1,
    axis: str = "stage",
    tp_axis: Optional[str] = None,
):
    """Pipelined CACHED forward: returns (logits (B, T, vocab) replicated,
    updated stage cache). Works for both prefill (T = prompt length,
    positions 0..T-1) and decode (T = 1), so a multi-host 7B can serve
    end-to-end over a stage mesh. With `tp_axis` each stage's layer block
    additionally runs Megatron-TP over that mesh axis (fp weights)."""
    S = mesh.shape[axis]
    B, T = tokens.shape
    assert B % n_micro == 0
    mb = B // n_micro
    H = cfg.hidden_size
    per = cfg.num_layers // S
    tp = mesh.shape[tp_axis] if tp_axis else 1
    cfg1 = dataclasses.replace(
        cfg,
        num_layers=per,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=cfg.intermediate_size // tp,
        head_dim=cfg.hd,
    )

    if tp_axis is None:
        lspecs = jax.tree.map(lambda _: P(axis), stage_layers)
    else:
        name_specs = _tp_layer_specs(stage_layers, axis, tp_axis)
        lspecs = {
            name: jax.tree.map(lambda _, s=name_specs[name]: s, leaf)
            for name, leaf in stage_layers.items()
        }
    rspecs = jax.tree.map(lambda _: P(), rest)
    # cache shards over stage; under TP also over the kv-head dim (index 3
    # of the stacked (S, per, B, H, ...) leaves)
    if tp_axis is None:
        cspecs = jax.tree.map(lambda _: P(axis), cache)
    else:
        cspecs = jax.tree.map(lambda _: P(axis, None, None, tp_axis), cache)

    def body(layers_l, rest_l, tokens, cache_l, positions):
        sid = jax.lax.axis_index(axis)
        layers_l = jax.tree.map(lambda x: x[0], layers_l)  # (per, ...)
        cache_l = jax.tree.map(lambda x: x[0], cache_l)  # (per, B, ...)
        micros = tokens.reshape(n_micro, mb, T)
        pos_m = positions.reshape(n_micro, mb, T)
        embed = rest_l["embed"]

        buf = jnp.zeros((mb, T, H), cfg.dtype)
        outs = jnp.zeros((n_micro, mb, T, H), cfg.dtype)

        def tick(t, carry):
            buf, outs, cache_l = carry
            m = jnp.clip(t - sid, 0, n_micro - 1)  # this stage's microbatch
            valid = jnp.logical_and(t - sid >= 0, t - sid < n_micro)
            x_in = jnp.where(
                sid == 0,
                _embed(embed, micros[m], cfg),
                buf,
            )
            pos = pos_m[m]  # (mb, T)
            # slice this microbatch's rows out of the stage cache
            cache_mb = jax.tree.map(
                lambda c: jax.lax.dynamic_slice_in_dim(c, m * mb, mb, axis=1), cache_l
            )

            def one(x, layer_and_cache):
                layer, cl = layer_and_cache
                cl1 = jax.tree.map(lambda a: a[None], cl)  # (1, mb, ...)
                x, cl1 = _run_single_layer_cached(layer, cfg1, x, cl1, pos, tp_axis)
                return x, jax.tree.map(lambda a: a[0], cl1)

            y, new_cache_mb = jax.lax.scan(one, x_in, (layers_l, cache_mb))
            # bubble ticks must not write the cache
            new_cache_mb = jax.tree.map(
                lambda n, o: jnp.where(valid, n, o), new_cache_mb, cache_mb
            )
            cache_l = jax.tree.map(
                lambda c, n: jax.lax.dynamic_update_slice_in_dim(c, n, m * mb, axis=1),
                cache_l, new_cache_mb,
            )
            # last stage collects microbatch t - S + 1
            done_idx = jnp.clip(t - S + 1, 0, n_micro - 1)
            collect = jnp.logical_and(sid == S - 1, t >= S - 1)
            outs = jax.lax.dynamic_update_slice(
                outs,
                jnp.where(collect, y, outs[done_idx])[None],
                (done_idx, 0, 0, 0),
            )
            buf = jax.lax.ppermute(y, axis, [(i, (i + 1) % S) for i in range(S)])
            return buf, outs, cache_l

        buf, outs, cache_l = jax.lax.fori_loop(
            0, n_micro + S - 1, tick, (buf, outs, cache_l)
        )
        if S > 1:
            outs = jax.lax.psum(
                jnp.where(sid == S - 1, outs, jnp.zeros_like(outs)), axis
            )
        x = outs.reshape(B, T, H)
        x = _rms(x, rest_l["final_norm"], cfg.rms_eps, getattr(cfg, "norm_offset", False))
        if "lm_head" in rest_l:
            from ..models.llama import apply_linear

            logits = apply_linear(x, rest_l["lm_head"], cfg)
        else:
            logits = jnp.matmul(x, rest_l["embed"].T.astype(cfg.dtype))
        return logits.astype(jnp.float32), jax.tree.map(lambda a: a[None], cache_l)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(lspecs, rspecs, P(), cspecs, P()),
        out_specs=(P(), cspecs),
        check_rep=False,
    )
    return fn(stage_layers, rest, tokens, cache, positions)


def _run_single_layer(layer, cfg1: LlamaConfig, x: jax.Array) -> jax.Array:
    """One decoder layer on pre-embedded activations (B, T, H), cacheless
    causal attention — mirrors the layer body of models.llama.llama_forward."""
    from ..models.llama import _attention, _mlp_act, _rms_norm, _rope, apply_linear

    B, T, H = x.shape
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    mask = jnp.broadcast_to(jnp.tril(jnp.ones((T, T), bool))[None], (B, T, T))
    norm_off = getattr(cfg1, "norm_offset", False)

    h = _rms_norm(x, layer["input_norm"], cfg1.rms_eps, norm_off)
    q = apply_linear(h, layer["q_proj"], cfg1).reshape(B, T, cfg1.num_heads, cfg1.hd)
    k = apply_linear(h, layer["k_proj"], cfg1).reshape(B, T, cfg1.num_kv_heads, cfg1.hd)
    v = apply_linear(h, layer["v_proj"], cfg1).reshape(B, T, cfg1.num_kv_heads, cfg1.hd)
    q = _rope(q, positions, cfg1.rope_theta)
    k = _rope(k, positions, cfg1.rope_theta)
    attn = _attention(q, k, v, mask, cfg1.dtype)
    attn = attn.reshape(B, T, cfg1.num_heads * cfg1.hd)
    x = x + apply_linear(attn, layer["o_proj"], cfg1)
    h = _rms_norm(x, layer["post_attn_norm"], cfg1.rms_eps, norm_off)
    gate = apply_linear(h, layer["gate_proj"], cfg1)
    up = apply_linear(h, layer["up_proj"], cfg1)
    x = x + apply_linear(
        _mlp_act(cfg1, gate.astype(jnp.float32)).astype(cfg1.dtype) * up, layer["down_proj"], cfg1
    )
    return x
