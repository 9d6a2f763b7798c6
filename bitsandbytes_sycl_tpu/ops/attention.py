"""Fused int8-KV decode attention (flash-decode) Pallas kernel.

The reference has no attention code (SURVEY.md §5: sequence length exists
only as a flattened GEMM dim) — this kernel is engine infrastructure for
the BASELINE.json decode configs.

Why a kernel: with an int8-quantized KV cache, the XLA path dequantizes
the whole cache to bf16 in HBM and then runs attention over it — ~2.5x
the necessary traffic (measured B8·S2048·H32·D128 on v5e: bf16 cache
377 us ≈ 704 GB/s roofline; int8 cache via dequant-then-attend 531 us).
Here the cache stays int8 in HBM; each (batch, head) handles its full
sequence in VMEM (a 4096-token int8 K tile is 512 KB).

Layout is everything (all three were measured):
- K is stored TRANSPOSED, (B, H, D, S): scores come out as a (1, S)
  lane-major row from one wide MXU dot q(1,D)·K(D,S) — a (S,1) column
  variant lane-reduces on the VPU instead (~2x slower overall);
- per-token scales are (B, H, 1, S), lane-major: an (S, 1) scale block
  pads each f32 to a full 128-lane row and DMAs 128x the bytes (this
  alone made a chunked first version 5x SLOWER than bf16);
- V stays (B, H, S, D) so the weighted sum is the wide dot w(1,S)·V(S,D).

Per (b,h) step: two MXU dots + one exp row; K absmax is applied to the
score row post-dot and V absmax + the 1/l softmax normalizer are folded
into the weight row pre-dot, so the int8 tiles are touched exactly once.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_mode

__all__ = [
    "decode_attention_int8",
    "decode_attention_int8_stacked",
    "prefill_attention_int8",
    "prefill_attention_int8_stacked",
]


def _attn_kernel(
    len_ref,  # scalar prefetch: (B,) int32 valid lengths
    *refs,  # q, cache blocks, [slopes], [optional new-token operands], out
    S, R, scale, window=None, softcap=None, has_new=False, has_alibi=False,
):
    refs = list(refs)
    q_ref, k_ref, ks_ref, v_ref, vs_ref = refs[:5]
    rest = refs[5:]
    sl_ref = rest.pop(0) if has_alibi else None
    if has_new:
        kn_ref, vn_ref, ksn_ref, vsn_ref, o_ref = rest
    else:
        (o_ref,) = rest
    b = pl.program_id(0)

    # f32 dot operands: Mosaic mis-lowers skinny bf16 dots
    # ('vector.broadcast' bf16->f32 verification failure); the kernel is
    # bandwidth-bound so the MXU precision tier doesn't matter.
    # R = GQA group size: all R query heads sharing this kv head attend in
    # one step, so each kv tile is fetched from HBM exactly ONCE (a
    # per-q-head grid refetches it R times).
    q = q_ref[:].reshape(R, -1).astype(jnp.float32)  # (R, D)
    k = k_ref[:].reshape(-1, S).astype(jnp.float32)  # (D, S) transposed
    # (R,S) score rows; per-token K absmax applied post-dot:
    # q·(k_i8*s) = s*(q·k_i8); `scale` folds 1/(sqrt(D)*127)
    sc = jax.lax.dot_general(
        q, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    sc = sc * (ks_ref[:].reshape(1, S) * scale)
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
    # the query position: len-1, or len when the current token rides in
    # registers (has_new: deferred-write design, len counts CACHE tokens)
    qpos = len_ref[b] if has_new else len_ref[b] - 1
    if has_alibi:
        # ALiBi (BLOOM, arxiv 2108.12409): -slope_h * (qpos - kpos) on
        # the REAL logits (pre-softcap/mask); the r3 review fenced BLOOM
        # out of every fast path for lack of exactly this term
        sl = sl_ref[:].reshape(R, 1)  # per-q-head slopes for this kv head
        sc = sc + sl * (pos - qpos).astype(jnp.float32)
    if softcap is not None:
        # Gemma-2 attention logit softcapping: cap*tanh(logit/cap) —
        # applied to REAL logits, so before the -1e30 mask fill
        sc = softcap * jnp.tanh(sc * jnp.float32(1.0 / softcap))

    valid = pos < len_ref[b]
    if window is not None:
        # sliding window (Mistral): query attends keys in (qpos-window, qpos]
        valid = jnp.logical_and(valid, pos >= qpos + 1 - window)
    sc = jnp.where(valid, sc, -1e30)

    if has_new:
        # fold THIS STEP's token in from registers — exact softmax over
        # the (S+1)-length row; always valid (distance 0 from the query).
        # `q` is the same f32 operand the score dot used above.
        kn = kn_ref[:].reshape(1, -1).astype(jnp.float32)  # (1, D)
        sc_new = jnp.sum(q * kn, axis=1, keepdims=True)  # (R, 1)
        sc_new = sc_new * (ksn_ref[:].reshape(1, 1) * scale)
        if softcap is not None:
            sc_new = softcap * jnp.tanh(sc_new * jnp.float32(1.0 / softcap))
        m = jnp.maximum(jnp.max(sc, axis=1, keepdims=True), sc_new)
        w = jnp.exp(sc - m)
        w_new = jnp.exp(sc_new - m)  # (R, 1)
        l = jnp.sum(w, axis=1, keepdims=True) + w_new
        inv = 1.0 / l  # l >= w_new > 0: no zero-length guard needed
        v = v_ref[:].reshape(S, -1).astype(jnp.float32)  # (S, D)
        wv = w * (vs_ref[:].reshape(1, S) * jnp.float32(1.0 / 127.0)) * inv
        o = jax.lax.dot_general(
            wv, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        vn = vn_ref[:].reshape(1, -1).astype(jnp.float32)  # (1, D)
        o = o + (w_new * inv * (vsn_ref[:].reshape(1, 1)
                                * jnp.float32(1.0 / 127.0))) * vn
        o_ref[:] = o.reshape(o_ref.shape).astype(o_ref.dtype)
        return

    m = jnp.max(sc, axis=1, keepdims=True)  # (R, 1)
    w = jnp.exp(sc - m)  # (R, S)
    l = jnp.sum(w, axis=1, keepdims=True)
    # l >= 1 even for a fully-masked row (the max position contributes
    # exp(0)), so guard on the actual valid length: len == 0 -> zeros,
    # not the mean of the stale V cache
    inv = jnp.where(len_ref[b] > 0, 1.0 / l, 0.0)

    v = v_ref[:].reshape(S, -1).astype(jnp.float32)  # (S, D)
    # fold per-token V absmax and the 1/l normalizer into the weight rows:
    # (w/l)·(v_i8*s) = (w*s*inv/127)·v_i8
    wv = w * (vs_ref[:].reshape(1, S) * jnp.float32(1.0 / 127.0)) * inv
    o = jax.lax.dot_general(
        wv, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (R, D)
    o_ref[:] = o.reshape(o_ref.shape).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("window", "softcap", "sm_scale"))
def _decode_attn_call(q4, kq, ks4, vq, vs4, lengths, window=None,
                      softcap=None, sm_scale=None, alibi=None):
    # q4 is grouped (B, Hkv, rep, D): q heads [h*rep, (h+1)*rep) share kv
    # head h, so the grid runs per KV head and each kv tile is read once
    B, Hkv, rep, D = q4.shape
    S = vq.shape[2]

    in_specs = [
        pl.BlockSpec((1, 1, rep, D), lambda b, h, L: (b, h, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D, S), lambda b, h, L: (b, h, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, S), lambda b, h, L: (b, h, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, S, D), lambda b, h, L: (b, h, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, S), lambda b, h, L: (b, h, 0, 0), memory_space=pltpu.VMEM),
    ]
    extra = ()
    if alibi is not None:
        # per-q-head ALiBi slopes grouped like q: (Hkv, rep, 1); the
        # block's last two dims equal the array dims (min-tile escape)
        in_specs.append(
            pl.BlockSpec((1, rep, 1), lambda b, h, L: (h, 0, 0),
                         memory_space=pltpu.VMEM))
        extra = (alibi.reshape(Hkv, rep, 1).astype(jnp.float32),)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, rep, D), lambda b, h, L: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    sm = sm_scale if sm_scale is not None else 1.0 / float(np.sqrt(D))
    kernel = functools.partial(
        _attn_kernel, S=S, R=rep, scale=sm / 127.0,
        window=window, softcap=softcap, has_alibi=alibi is not None,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, D), q4.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * rep * S * D,
            bytes_accessed=2 * B * S * Hkv * D + 8 * B * S * Hkv + B * Hkv * rep * D * 4,
            transcendentals=B * Hkv * rep * S,
        ),
        interpret=interpret_mode(),
    )(lengths.astype(jnp.int32), q4, kq, ks4, vq, vs4, *extra)


def decode_attention_int8(
    q: jax.Array,  # (B, 1, Hq, D) float
    kq: jax.Array,  # (B, Hkv, D, S) int8 — K stored transposed
    ks: jax.Array,  # (B, Hkv, S) f32 per-token-head absmax
    vq: jax.Array,  # (B, Hkv, S, D) int8
    vs: jax.Array,  # (B, Hkv, S) f32
    lengths: jax.Array,  # (B,) int32: cache slots [0, len) are valid
    window: Optional[int] = None,  # sliding window (Mistral): attend slots >= len-window
    softcap: Optional[float] = None,  # Gemma-2 logit softcapping cap*tanh(x/cap)
    sm_scale: Optional[float] = None,  # softmax scale override (Gemma-2 query_pre_attn_scalar)
    alibi_slopes: Optional[jax.Array] = None,  # (Hq,) ALiBi slopes (BLOOM)
) -> Optional[jax.Array]:
    """Single-step (T=1) attention over an int8 KV cache, one fused kernel.

    Scales are the raw per-(token,head) absmax stored by
    models.llama._kv_quantize (the 1/127 dequant factor is folded into
    kernel constants). `alibi_slopes` adds -slope_h*(qpos-kpos) to the
    logits in-kernel (BLOOM; r3 review item 3). Returns (B, 1, Hq, D) in
    q.dtype, or None if the shapes can't tile (caller falls back to
    dequantize-then-attend).
    """
    B, T, Hq, D = q.shape
    Hkv, S = vq.shape[1], vq.shape[2]
    if T != 1 or D % 128 != 0 or Hq % Hkv != 0 or S % 128 != 0:
        return None
    if 2 * S * D > 8 * 1024 * 1024:  # BOTH whole-S int8 tiles (K and V) stay resident
        return None
    if window is not None and window >= S:
        window = None  # can never bind: drop the extra mask ops
    # group q heads by their kv head: (B,1,Hq,D) -> (B, Hkv, rep, D)
    q4 = q.reshape(B, Hkv, Hq // Hkv, D)
    out = _decode_attn_call(
        q4, kq, ks.reshape(B, Hkv, 1, S), vq, vs.reshape(B, Hkv, 1, S), lengths,
        window=window, softcap=softcap, sm_scale=sm_scale, alibi=alibi_slopes,
    )
    return out.reshape(B, 1, Hq, D)


@partial(jax.jit, static_argnames=("window", "softcap", "sm_scale"))
def _decode_attn_call_stacked(q4, kq, ks5, vq, vs5, li, lengths, new_kv=None,
                              window=None, softcap=None, sm_scale=None,
                              alibi=None):
    B, Hkv, rep, D = q4.shape
    S = vq.shape[3]
    has_new = new_kv is not None

    in_specs = [
        pl.BlockSpec((1, 1, rep, D), lambda b, h, li, L: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, D, S), lambda b, h, li, L: (li[0], b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, 1, S), lambda b, h, li, L: (li[0], b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, S, D), lambda b, h, li, L: (li[0], b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, 1, S), lambda b, h, li, L: (li[0], b, h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if alibi is not None:
        in_specs.append(
            pl.BlockSpec((1, rep, 1), lambda b, h, li, L: (h, 0, 0),
                         memory_space=pltpu.VMEM))
    if has_new:
        in_specs += [
            pl.BlockSpec((1, 1, 1, D), lambda b, h, li, L: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, D), lambda b, h, li, L: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda b, h, li, L: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda b, h, li, L: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, rep, D), lambda b, h, li, L: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def kernel(li_ref, len_ref, *refs, **kw):
        # same math as _attn_kernel; the layer index only drives block
        # selection in the index_maps above
        return _attn_kernel(len_ref, *refs, **kw)

    sm = sm_scale if sm_scale is not None else 1.0 / float(np.sqrt(D))
    extra = ()
    if alibi is not None:
        extra += (alibi.reshape(Hkv, rep, 1).astype(jnp.float32),)
    if has_new:
        kn, ksn, vn, vsn = new_kv
        extra += (kn[:, :, None, :], vn[:, :, None, :],
                  ksn[:, :, None, None], vsn[:, :, None, None])
    return pl.pallas_call(
        functools.partial(
            kernel, S=S, R=rep, scale=sm / 127.0,
            window=window, softcap=softcap, has_new=has_new,
            has_alibi=alibi is not None,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, D), q4.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * rep * S * D,
            bytes_accessed=2 * B * S * Hkv * D + 8 * B * S * Hkv + B * Hkv * rep * D * 4,
            transcendentals=B * Hkv * rep * S,
        ),
        interpret=interpret_mode(),
    )(li.astype(jnp.int32), lengths.astype(jnp.int32), q4, kq, ks5, vq, vs5,
      *extra)


def decode_attention_int8_stacked(
    q: jax.Array,  # (B, 1, Hq, D) float
    kq: jax.Array,  # (L, B, Hkv, D, S) int8 — layer-stacked cache
    ks: jax.Array,  # (L, B, Hkv, S) f32
    vq: jax.Array,  # (L, B, Hkv, S, D) int8
    vs: jax.Array,  # (L, B, Hkv, S) f32
    li,  # int or (1,) int32 — layer to attend over
    lengths: jax.Array,  # (B,) int32 tokens IN THE CACHE per sequence
    new_kv=None,  # optional (kq (B,Hkv,D) i8, ks (B,Hkv) f32, vq, vs):
    # THIS step's token folded in from registers (deferred-write design;
    # lengths then exclude it)
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sm_scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,  # (Hq,) ALiBi slopes (BLOOM)
) -> Optional[jax.Array]:
    """decode_attention_int8 over layer `li` of the layer-STACKED engine
    cache. The layer index is a scalar-prefetch operand picking the
    block: all layers share ONE compiled kernel and XLA never
    materializes a per-layer cache slice — slicing `cache[li]` as the
    kernel operand copies the layer's full (B,Hkv,D,S) panes every call
    (measured ~2.2 GB/step across 32 layers at the 7B B=8 shape; the
    same leak the paged pool fixed, ops/paged_attention.py)."""
    B, T, Hq, D = q.shape
    L, Hkv, S = vq.shape[0], vq.shape[2], vq.shape[3]
    if T != 1 or D % 128 != 0 or Hq % Hkv != 0 or S % 128 != 0:
        return None
    if 2 * S * D > 8 * 1024 * 1024:
        return None
    if window is not None and window >= S:
        window = None
    q4 = q.reshape(B, Hkv, Hq // Hkv, D)
    li = jnp.asarray(li, jnp.int32).reshape(1)
    out = _decode_attn_call_stacked(
        q4, kq, ks.reshape(L, B, Hkv, 1, S), vq, vs.reshape(L, B, Hkv, 1, S),
        li, lengths, new_kv=new_kv, window=window, softcap=softcap,
        sm_scale=sm_scale, alibi=alibi_slopes,
    )
    return out.reshape(B, 1, Hq, D)


# ---------------------------------------------------------------------------
# flash PREFILL over the int8 KV cache: grid (B, H, q-tiles, kv-chunks)
# with online-softmax carries in VMEM scratch. Measured 1.62x vs the XLA
# einsum path at T=S=2048 (XLA partially fuses the softmax chain, but
# still reads a bf16 cache and spills score tiles); VMEM-resident scores
# also bound memory at O(T*D) instead of O(T*S).
# ---------------------------------------------------------------------------


def _prefill_kernel(
    start_ref,  # scalar prefetch: (B,) int32 first absolute position per batch
    q_ref, k_ref, ks_ref, v_ref, vs_ref,
    *rest,  # [slopes], out, scratch (m, l, acc)
    tq, ts, nkv, scale, window=None, softcap=None, has_alibi=False,
):
    rest = list(rest)
    sl_ref = rest.pop(0) if has_alibi else None
    o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    qi = pl.program_id(2)
    si = pl.program_id(3)

    @pl.when(si == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:].reshape(tq, -1).astype(jnp.float32)  # (TQ, D)
    k = k_ref[:].reshape(-1, ts).astype(jnp.float32)  # (D, TS) transposed
    sc = jax.lax.dot_general(
        q, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, TS)
    sc = sc * (ks_ref[:].reshape(1, ts) * scale)
    # causal mask in absolute positions: kv slot s is valid for query row r
    # iff s <= start_b + qi*tq + r  (cache holds [0, start+T) after writes)
    q_pos = start_ref[b] + qi * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 0)
    k_pos = si * ts + jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1)
    if has_alibi:
        # ALiBi: -slope_h * (q_pos - k_pos) on the real logits (BLOOM)
        sl = sl_ref[:].reshape(1, 1)  # this head's slope
        sc = sc + sl * (k_pos - q_pos).astype(jnp.float32)
    if softcap is not None:
        sc = softcap * jnp.tanh(sc * jnp.float32(1.0 / softcap))

    valid = k_pos <= q_pos
    if window is not None:
        # sliding window (Mistral): query t attends keys in (t-window, t];
        # the diagonal k==q is always in-window, so every row keeps >= 1
        # valid slot and the online-softmax l stays >= 1
        valid = jnp.logical_and(valid, q_pos - k_pos < window)
    sc = jnp.where(valid, sc, -1e30)

    m_prev = m_ref[:]  # (TQ, 1)
    m_new = jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    w = jnp.exp(sc - m_new)  # (TQ, TS)
    l_ref[:] = l_ref[:] * corr + jnp.sum(w, axis=1, keepdims=True)
    m_ref[:] = m_new

    v = v_ref[:].reshape(ts, -1).astype(jnp.float32)  # (TS, D)
    wv = w * (vs_ref[:].reshape(1, ts) * jnp.float32(1.0 / 127.0))
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        wv, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(si == nkv - 1)
    def _():
        # causal rows always have >= 1 valid slot (k_pos 0 <= q_pos), and
        # online-softmax l >= 1 regardless, so a zero-guard would be dead
        o_ref[:] = (acc_ref[:] / l_ref[:]).reshape(o_ref.shape).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("tq", "ts", "window", "softcap", "sm_scale"))
def _prefill_attn_call(q4, kq, ks4, vq, vs4, starts, tq, ts, window=None,
                       softcap=None, sm_scale=None, alibi=None):
    B, Hq, T, D = q4.shape
    S, Hkv = vq.shape[2], vq.shape[1]
    nq, nkv = T // tq, S // ts
    rep = Hq // Hkv

    in_specs = [
        pl.BlockSpec((1, 1, tq, D), lambda b, h, qi, si, L: (b, h, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 1, D, ts), lambda b, h, qi, si, L, _r=rep: (b, h // _r, 0, si), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, 1, 1, ts), lambda b, h, qi, si, L, _r=rep: (b, h // _r, 0, si), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, 1, ts, D), lambda b, h, qi, si, L, _r=rep: (b, h // _r, si, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, 1, 1, ts), lambda b, h, qi, si, L, _r=rep: (b, h // _r, 0, si), memory_space=pltpu.VMEM
        ),
    ]
    extra = ()
    if alibi is not None:
        # one slope per q head: (Hq, 1, 1) with (1, 1, 1) blocks — the
        # last two dims equal the array dims (min-tile escape)
        in_specs.append(
            pl.BlockSpec((1, 1, 1), lambda b, h, qi, si, L: (h, 0, 0),
                         memory_space=pltpu.VMEM))
        extra = (alibi.reshape(Hq, 1, 1).astype(jnp.float32),)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hq, nq, nkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, tq, D), lambda b, h, qi, si, L: (b, h, qi, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _prefill_kernel, tq=tq, ts=ts, nkv=nkv,
        scale=(sm_scale if sm_scale is not None else 1.0 / float(np.sqrt(D))) / 127.0, window=window, softcap=softcap,
        has_alibi=alibi is not None,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, T, D), q4.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * T * S * D,
            bytes_accessed=2 * B * S * Hkv * D + B * Hq * T * D * 4,
            transcendentals=B * Hq * T * S,
        ),
        interpret=interpret_mode(),
    )(starts.astype(jnp.int32), q4, kq, ks4, vq, vs4, *extra)


@partial(jax.jit, static_argnames=("tq", "ts", "window", "softcap", "sm_scale"))
def _prefill_attn_call_stacked(q4, kq, ks5, vq, vs5, li, starts, tq, ts,
                               window=None, softcap=None, sm_scale=None,
                               alibi=None):
    B, Hq, T, D = q4.shape
    S, Hkv = vq.shape[3], vq.shape[2]
    nq, nkv = T // tq, S // ts
    rep = Hq // Hkv

    in_specs = [
        pl.BlockSpec((1, 1, tq, D),
                     lambda b, h, qi, si, li, L: (b, h, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 1, 1, D, ts),
            lambda b, h, qi, si, li, L, _r=rep: (li[0], b, h // _r, 0, si),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 1, 1, 1, ts),
            lambda b, h, qi, si, li, L, _r=rep: (li[0], b, h // _r, 0, si),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 1, 1, ts, D),
            lambda b, h, qi, si, li, L, _r=rep: (li[0], b, h // _r, si, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 1, 1, 1, ts),
            lambda b, h, qi, si, li, L, _r=rep: (li[0], b, h // _r, 0, si),
            memory_space=pltpu.VMEM),
    ]
    extra = ()
    if alibi is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, 1), lambda b, h, qi, si, li, L: (h, 0, 0),
                         memory_space=pltpu.VMEM))
        extra = (alibi.reshape(Hq, 1, 1).astype(jnp.float32),)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hq, nq, nkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, tq, D), lambda b, h, qi, si, li, L: (b, h, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, D), jnp.float32),
        ],
    )

    def kernel(li_ref, start_ref, *refs, **kw):
        # same math as _prefill_kernel; li only picks cache blocks
        return _prefill_kernel(start_ref, *refs, **kw)

    return pl.pallas_call(
        functools.partial(
            kernel, tq=tq, ts=ts, nkv=nkv,
            scale=(sm_scale if sm_scale is not None else 1.0 / float(np.sqrt(D))) / 127.0,
            window=window, softcap=softcap, has_alibi=alibi is not None,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, T, D), q4.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * T * S * D,
            bytes_accessed=2 * B * S * Hkv * D + B * Hq * T * D * 4,
            transcendentals=B * Hq * T * S,
        ),
        interpret=interpret_mode(),
    )(li.astype(jnp.int32), starts.astype(jnp.int32), q4, kq, ks5, vq, vs5,
      *extra)


def prefill_attention_int8_stacked(
    q: jax.Array,  # (B, T, Hq, D)
    kq: jax.Array,  # (L, B, Hkv, D, S) int8 — layer-stacked cache
    ks: jax.Array,  # (L, B, Hkv, S)
    vq: jax.Array,  # (L, B, Hkv, S, D) int8
    vs: jax.Array,  # (L, B, Hkv, S)
    li,  # int or (1,) int32 — layer to attend over
    starts: jax.Array,  # (B,) absolute position of query row 0 per batch
    tq: int = 256,
    ts: int = 512,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sm_scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,  # (Hq,) ALiBi slopes (BLOOM)
) -> Optional[jax.Array]:
    """prefill_attention_int8 over layer `li` of the layer-STACKED engine
    cache — same no-slice rule as the decode kernels (slicing cache[li]
    as the operand materializes the layer's full panes every call, which
    chunked prefill pays once per CHUNK per layer)."""
    B, T, Hq, D = q.shape
    L, Hkv, S = vq.shape[0], vq.shape[2], vq.shape[3]
    if D % 128 != 0 or Hq % Hkv != 0:
        return None
    tq = min(tq, T)
    while T % tq != 0 and tq > 8:
        tq //= 2
    ts = min(ts, S)
    while S % ts != 0 and ts >= 256:
        ts //= 2
    if T % tq != 0 or S % ts != 0 or tq < 8 or ts < 128:
        return None
    if window is not None and window >= S:
        window = None  # can never bind
    q4 = q.transpose(0, 2, 1, 3)  # (B, Hq, T, D)
    li = jnp.asarray(li, jnp.int32).reshape(1)
    out = _prefill_attn_call_stacked(
        q4, kq, ks.reshape(L, B, Hkv, 1, S), vq, vs.reshape(L, B, Hkv, 1, S),
        li, starts, tq, ts, window=window, softcap=softcap, sm_scale=sm_scale,
        alibi=alibi_slopes,
    )
    return out.transpose(0, 2, 1, 3)


def prefill_attention_int8(
    q: jax.Array,  # (B, T, Hq, D)
    kq: jax.Array,  # (B, Hkv, D, S) int8
    ks: jax.Array,  # (B, Hkv, S)
    vq: jax.Array,  # (B, Hkv, S, D) int8
    vs: jax.Array,  # (B, Hkv, S)
    starts: jax.Array,  # (B,) absolute position of query row 0 per batch
    tq: int = 256,
    ts: int = 512,
    window: Optional[int] = None,  # sliding window (Mistral): keys in (t-window, t]
    softcap: Optional[float] = None,  # Gemma-2 logit softcapping
    sm_scale: Optional[float] = None,  # softmax scale override
    alibi_slopes: Optional[jax.Array] = None,  # (Hq,) ALiBi slopes (BLOOM)
) -> Optional[jax.Array]:
    """Causal flash attention over the int8 KV cache for prefill (T > 1).
    Returns (B, T, Hq, D) or None if untileable (caller falls back)."""
    B, T, Hq, D = q.shape
    Hkv, S = vq.shape[1], vq.shape[2]
    if D % 128 != 0 or Hq % Hkv != 0:
        return None
    tq = min(tq, T)
    while T % tq != 0 and tq > 8:
        tq //= 2
    ts = min(ts, S)
    while S % ts != 0 and ts >= 256:
        ts //= 2
    if T % tq != 0 or S % ts != 0 or tq < 8 or ts < 128:
        return None
    if window is not None and window >= S:
        window = None  # can never bind
    q4 = q.transpose(0, 2, 1, 3)  # (B, Hq, T, D)
    out = _prefill_attn_call(
        q4, kq, ks.reshape(B, Hkv, 1, S), vq, vs.reshape(B, Hkv, 1, S), starts, tq, ts,
        window=window, softcap=softcap, sm_scale=sm_scale, alibi=alibi_slopes,
    )
    return out.transpose(0, 2, 1, 3)
