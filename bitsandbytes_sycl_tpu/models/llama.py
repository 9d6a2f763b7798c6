"""Llama-family decoder with k-bit quantized weights — TPU-native.

Pure-functional (params as pytrees, no module state) so the whole decode
step jits/shards cleanly: quantized linears are QLinearWeight pytrees
(fused Pallas matmul), int8 linears are {CB, SCB} (LLM.int8), and the
KV cache is an explicit int8-quantized pytree threaded through forward.

The reference has no model/attention code at all (SURVEY.md §5
"long-context: entirely absent") — this is the BASELINE.json configs[3]/[4]
engine substrate.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import functional as F
from ..ops.common import QLinearWeight, quantize_4bit_native
from ..ops.matmul_4bit import matmul_4bit_fused

__all__ = [
    "LlamaConfig",
    "init_params",
    "quantize_params",
    "repack_params_int8",
    "llama_forward",
    "init_kv_cache",
]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: Optional[int] = None
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    # weight quantization: "nf4" | "fp4" | "int4" | "af4" | "int8" | "none"
    quant: str = "nf4"
    blocksize: int = 64
    # 8-bit per-block scales decoded in-kernel (reference nested stats,
    # functional.py:1243-1257) — 4x less scale memory, ~7% kernel cost
    compress_stats: bool = False
    # scale storage dtype for 4-bit weights: "bfloat16" halves scale
    # memory at zero kernel cost (measured; the kernel casts anyway)
    absmax_dtype: str = "bfloat16"
    # W4A8 decode: route small-M LUT-4-bit matmuls through the int8-MXU
    # kernel (ops/matmul_w4a8.py) — measured 1.4-1.5x the exact
    # bf16-decode path at M=8 on v5e, at LLM.int8-class activation-quant
    # accuracy. DEFAULT ON since round 4: the model-level ppl cost is
    # measured ~zero on top of NF4's own +0.5% (docs/ACCURACY.md, gated
    # in tests/test_accuracy.py); int4 never routes here (its arithmetic
    # decode already beats W4A8). Set False for bit-exact decode w.r.t.
    # the stored 4-bit codes.
    a8_decode: bool = True
    llm_int8_threshold: float = 6.0
    kv_quant: bool = True  # int8 KV cache
    # KV bit width for the PAGED pool (engine paged mode, r5): 4 packs
    # ADJACENT TOKEN PAIRS per byte (page byte row r = token 2r in the
    # HI nibble, 2r+1 in the LO; sign-magnitude ±7 grid, per-token
    # absmax) — half the attention HBM reads and half the pool memory,
    # decoded in-kernel by the paged flash-decode kernel; decode writes
    # stay write-only DUS via the nib_prev staging leaf (layout
    # rationale: engine/paged.init_page_pool). The contiguous prefill
    # scratch stays int8 (requantized once at ingest); contiguous-cache
    # decode ignores this field. Requires kv_quant.
    kv_bits: int = 8
    tie_embeddings: bool = False
    # sliding-window attention (Mistral): query t attends keys in
    # (t - window, t]. None = full causal. Rides the fused int8-KV flash
    # kernels via their static `window` mask (ops/attention.py); the
    # uncached / non-int8 paths apply the same window in the XLA mask.
    sliding_window: Optional[int] = None
    # additive q/k/v projection biases (Qwen2): params carry
    # q_bias/k_bias/v_bias per layer when True
    attn_bias: bool = False
    # MLP gate activation: "silu" (llama/mistral/qwen2) or "gelu_tanh"
    # (Gemma's GeGLU; HF hidden_act "gelu_pytorch_tanh")
    mlp_act: str = "silu"
    # RMSNorm weight convention: True applies (1 + w) (Gemma stores the
    # offset from unity, so a zero-init weight is the identity norm)
    norm_offset: bool = False
    # multiply token embeddings by sqrt(hidden_size) (Gemma)
    scale_embeddings: bool = False
    # Gemma-2 hooks (all default-off; see models/gemma.Gemma2Config):
    # attention logit softcapping cap*tanh(logit/cap), applied in the
    # flash kernels pre-mask and in the XLA paths identically
    attn_logit_softcap: Optional[float] = None
    # final lm_head logit softcapping
    final_logit_softcap: Optional[float] = None
    # softmax scale = query_scale**-0.5 instead of head_dim**-0.5
    # (HF query_pre_attn_scalar)
    query_scale: Optional[float] = None
    # sandwich norms: extra RMSNorm on the attention and MLP OUTPUTS
    # before their residual adds (params carry attn_out_norm /
    # ffn_out_norm per layer)
    sandwich_norms: bool = False
    # alternate sliding/global attention: layers with even index use
    # sliding_window, odd layers are full causal (HF Gemma-2 pattern)
    sliding_alternating: bool = False
    # mixture-of-experts FFN (Mixtral): num_experts > 1 replaces the
    # dense MLP with a top-k routed MoE — params carry per-layer
    # `router` (E, h) and `experts` (stacked quantized gate/up/down,
    # leading dim E). Routing follows HF Mixtral: softmax over all E,
    # top-k, renormalize.
    num_experts: int = 1
    num_experts_per_tok: int = 2
    # MoE prefill dispatch: at >= this many tokens, route each token to
    # its chosen experts through capacity-bounded dispatch/combine
    # einsums (GShard-style) instead of dense combine — saves E/k x the
    # expert FLOPs at prefill sizes at the cost of dropping tokens that
    # overflow an expert's capacity (cf * N * k / E slots per expert).
    # 0 disables (dense combine everywhere — the lossless default).
    # Measured (docs/PERFORMANCE.md): with 4-bit weights dispatch LOSES
    # below ~8k tokens (expert matmuls are weight-decode-bound; dense
    # decodes the same bytes) — only enable for huge batches or EP.
    moe_dispatch_min_tokens: int = 0
    moe_capacity_factor: float = 2.0
    # paged decode: static host-known bound on USED pages per sequence.
    # The attend grid is (B, pages) and even SKIPPED trailing steps cost
    # ~0.1-0.3 us each (ops/paged_attention.py docstring: 782 -> 361
    # us/layer at the B=48 avg-512 point when truncated from 32 to 5).
    # The engine sets this per step, bucketed to powers of two from its
    # host-side slot lengths; None = full table width.
    pages_hint: Optional[int] = None

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls, **kw):
        """Test-sized config."""
        defaults = dict(
            vocab_size=256, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=4, num_kv_heads=2, max_seq_len=128,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def llama7b(cls, **kw):
        return cls(**kw)

    @classmethod
    def serving7b(cls, **kw):
        """Measured-best single-chip 7B serving preset (docs/PERFORMANCE.md
        + docs/ACCURACY.md): NF4 at blocksize 128 with W4A8 decode and
        deferred cache writes — 292 tok/s at B=8 (r3) vs 207 for the
        exact default, at a model-level ppl cost measured ~zero on top
        of NF4's +0.5%. Paged serving at B=48 reaches 637+ tok/s
        aggregate (benchmarks/run.py model7b_paged_decode)."""
        defaults = dict(
            quant="nf4", blocksize=128, a8_decode=True,
            absmax_dtype="bfloat16", kv_quant=True,
        )
        defaults.update(kw)
        return cls(**defaults)


# ---------------------------------------------------------------------------
# linear dispatch: one code path for every weight format
# ---------------------------------------------------------------------------


def _quantize_linear(W: jax.Array, cfg: LlamaConfig):
    if cfg.quant in ("nf4", "fp4", "int4", "af4"):
        return quantize_4bit_native(
            W, blocksize=cfg.blocksize, quant_type=cfg.quant,
            compress_statistics=cfg.compress_stats,
            absmax_dtype=jnp.dtype(getattr(cfg, "absmax_dtype", "float32")),
        )
    if cfg.quant == "int8":
        CB, SCB = F.int8_vectorwise_quant(W)
        out = {"CB": CB, "SCB": SCB}
        if cfg.llm_int8_threshold > 0.0:
            # static outlier columns predicted from weight statistics —
            # the reference's OutlierTracer flow (utils.py:42-104); 3x
            # faster than per-call activation top_k (see functional.py)
            from ..utils import find_outlier_dims

            idx = find_outlier_dims(W, reduction_dim=0, topk=min(32, W.shape[1]))
            out["outliers"] = F.llm_int8_prepare_outliers(CB, SCB, idx)
        return out
    return W.astype(cfg.dtype)


def repack_params_int8(params, cfg, only=None):
    """Serving-time 4-bit -> int8 repack (r3 review item 2, the mid-M fix).

    Replaces every 2D QLinearWeight leaf with LLM.int8-style {CB, SCB}
    (per-output-row int8 regrid of the DEQUANTIZED 4-bit weight — the
    regrid's absolute error, <= rowmax/254, sits far inside the 4-bit
    format's own grid error, so the codes keep NF4/FP4 fidelity) and
    returns a matching config (quant="int8", threshold 0: the codes need
    no activation outlier decomposition beyond the W4A8-class per-row
    activation quant already accepted for serving).

    Why: the W4A8 kernel's per-quantization-block sub-dots underutilize
    the MXU at mid M — M=48 (the B=48 paged serving step's linear size)
    measured 0.76x bf16, while the SAME weight repacked int8 runs the
    existing int8 machinery at 1.6-2.7x bf16 across M=48..4096
    (docs/PERFORMANCE.md r4 table). The trade is 2x weight memory
    (6.7 GB for 7B) — opt in for throughput-bound serving; keep 4-bit
    for memory-bound configs. Stacked MoE expert weights (3D) stay
    4-bit. Returns (params8, cfg8); the original tree is not mutated.

    `only`: optional set of param KEY NAMES to repack (e.g.
    {"gate_proj", "up_proj", "down_proj", "lm_head"}) — the PARTIAL
    repack for pool-budget-bound serving: the wide FFN projections are
    where the W4A8 sub-dot penalty is largest (their MAC count), so
    repacking just them buys most of the speedup for a third of the
    extra memory (the qkv/o projections stay 4-bit W4A8).
    """
    def walk(obj, name=None):
        if isinstance(obj, QLinearWeight):
            if obj.packed.ndim != 2:
                return obj  # stacked experts: keep 4-bit (see docstring)
            if only is not None and name not in only:
                return obj
            CB, SCB = F.int8_vectorwise_quant(
                obj.dequantize().astype(jnp.float32))
            return {"CB": CB, "SCB": SCB}
        if isinstance(obj, dict):
            return {k: walk(v, k) for k, v in obj.items()}
        if isinstance(obj, list):
            return [walk(v, name) for v in obj]
        return obj

    cfg8 = dataclasses.replace(cfg, quant="int8", llm_int8_threshold=0.0)
    return walk(params), cfg8


def _lora_for(lora, li: int, name: str):
    if lora is None:
        return None
    return lora[li].get(name)


def _apply_lora(x, out, lora, lora_ids):
    """Add the adapter delta. Single adapter: A (r, K), B (N, r). BATCHED
    multi-adapter serving (S-LoRA style; no reference counterpart):
    A (n_adapters, r, K), B (n_adapters, N, r) with per-ROW `lora_ids`
    — each sequence in the batch gets its own adapter in one einsum."""
    xf = x.astype(jnp.float32)
    if lora["A"].ndim == 2:
        xa = jnp.matmul(xf, lora["A"].T.astype(jnp.float32))
        delta = jnp.matmul(xa, lora["B"].T.astype(jnp.float32)) * lora["scale"]
        return out + delta.astype(out.dtype)
    # gather PER SEQUENCE (ids are constant along T by construction —
    # llama_forward broadcasts (B,) ids to (B, T)); a per-token gather
    # would materialize T copies of each adapter (~GBs at prefill)
    ids = lora_ids if lora_ids is not None else jnp.zeros(x.shape[:-1], jnp.int32)
    if x.ndim == 3:
        idb = ids[:, 0]  # (B,)
        A_sel = jnp.take(lora["A"].astype(jnp.float32), idb, axis=0)  # (B, r, K)
        B_sel = jnp.take(lora["B"].astype(jnp.float32), idb, axis=0)  # (B, N, r)
        s_sel = jnp.take(lora["scale"].astype(jnp.float32).reshape(-1), idb)
        xa = jnp.einsum("btk,brk->btr", xf, A_sel)
        delta = jnp.einsum("btr,bnr->btn", xa, B_sel) * s_sel[:, None, None]
        return out + delta.astype(out.dtype)
    lead = x.shape[:-1]
    x2 = xf.reshape(-1, x.shape[-1])
    idr = ids.reshape(-1)
    A_sel = jnp.take(lora["A"].astype(jnp.float32), idr, axis=0)  # (rows, r, K)
    B_sel = jnp.take(lora["B"].astype(jnp.float32), idr, axis=0)  # (rows, N, r)
    s_sel = jnp.take(lora["scale"].astype(jnp.float32).reshape(-1), idr)  # (rows,)
    xa = jnp.einsum("bk,brk->br", x2, A_sel)
    delta = jnp.einsum("br,bnr->bn", xa, B_sel) * s_sel[:, None]
    return out + delta.reshape(*lead, -1).astype(out.dtype)


def _w8a8_prefill_min() -> int:
    from ..ops.matmul_w4a8 import W8A8_PREFILL_MIN_M

    return W8A8_PREFILL_MIN_M


def _grouped_min(blocksize: int) -> int:
    from ..ops.matmul_w4a8 import grouped_min_m

    return grouped_min_m(blocksize)


def apply_linear(x: jax.Array, w, cfg: LlamaConfig, lora=None, lora_ids=None) -> jax.Array:
    if isinstance(w, QLinearWeight):
        rows = int(np.prod(x.shape[:-1]))
        # int4's arithmetic decode already beats W4A8 (docs/PERFORMANCE.md).
        # W4A8-vs-exact crossover (re-measured after the single-tile
        # padding fix, docs/PERFORMANCE.md): W4A8 wins through M=128 at
        # every blocksize (M=128/bs128: 0.79x bf16 vs exact 0.52x) and
        # through M=256 when the sub-dot K (= blocksize) is 256; the
        # exact m-tile kernel wins from M~1024.
        lim = 256 if w.blocksize >= 256 else 128
        a8 = getattr(cfg, "a8_decode", False)
        if a8 and 0 < rows <= lim and w.quant_type != "int4":
            from ..ops.matmul_w4a8 import matmul_4bit_w4a8

            out = matmul_4bit_w4a8(x, w, out_dtype=cfg.dtype)
        elif (
            a8
            and rows > _grouped_min(w.blocksize)
            and (w.blocksize >= 128 or rows < _w8a8_prefill_min())
        ):
            # Grouped mid/high-M route (r5, docs/PERFORMANCE.md): the
            # decoded int8 codes are requantized onto the per-column
            # int8 grid IN-KERNEL, so one deep int8-MXU dot accumulates
            # int32 across every quantization block and the scale
            # applies once per tile — measured 0.88x bf16 @M=512,
            # 1.08x @1024, 1.14x @2048 (bs=64; exact path was
            # 0.66-0.72x) and 1.00/1.23/1.26/1.20x @512-4096 at bs=128.
            # All 4-bit types: int4's arithmetic-decode edge only
            # matters at GEMV rows; here decode amortizes over the
            # m-tile. W8A8 accuracy class (same as the w4a8/w8a8
            # routes).
            from ..ops.matmul_w4a8 import matmul_4bit_w4a8_grouped

            out = matmul_4bit_w4a8_grouped(x, w, out_dtype=cfg.dtype)
        elif a8 and rows >= _w8a8_prefill_min():
            # Per-call W8A8 route (r4): decode the nibbles ONCE to int8
            # codes in HBM (~165 us at 4096²) and run one dense
            # int8-MXU GEMM. After r5's grouped kernel this only wins
            # at blocksize<=64 from M=4096 (1.23x vs grouped 1.02x).
            from ..ops.matmul_w4a8 import matmul_4bit_w8a8_prefill

            out = matmul_4bit_w8a8_prefill(x, w, out_dtype=cfg.dtype)
        else:
            out = matmul_4bit_fused(x, w, compute_dtype=cfg.dtype)
    elif isinstance(w, dict) and "CB" in w:
        out = F.llm_int8_matmul(
            x, w["CB"], w["SCB"], threshold=cfg.llm_int8_threshold,
            outliers=w.get("outliers"),
        )
    else:
        out = jnp.matmul(x, w.T, preferred_element_type=jnp.float32).astype(cfg.dtype)
    if lora is not None:
        # QLoRA adapter: frozen quantized base + trainable low-rank delta
        # (x @ A^T) @ B^T * (alpha / r); fp32 math, cast at the end
        out = _apply_lora(x, out, lora, lora_ids)
    return out


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def _fp_layer_shapes(cfg: LlamaConfig) -> Dict[str, Tuple[int, int]]:
    h, i = cfg.hidden_size, cfg.intermediate_size
    qd = cfg.num_heads * cfg.hd
    kvd = cfg.num_kv_heads * cfg.hd
    return {
        "q_proj": (qd, h),
        "k_proj": (kvd, h),
        "v_proj": (kvd, h),
        "o_proj": (h, qd),
        "gate_proj": (i, h),
        "up_proj": (i, h),
        "down_proj": (h, i),
    }


def init_params(cfg: LlamaConfig, key: jax.Array) -> Dict:
    """Random-init then quantize (for tests/benchmarks; real weights come
    from checkpoints.load_*)."""
    keys = jax.random.split(key, cfg.num_layers + 2)

    def dense(k, shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[1]))
        return (jax.random.normal(k, shape, jnp.float32) * scale)

    moe = getattr(cfg, "num_experts", 1) > 1
    layers = []
    for li in range(cfg.num_layers):
        lk = jax.random.split(keys[li], 8)
        shapes = _fp_layer_shapes(cfg)
        if moe:  # the dense MLP is replaced by router + stacked experts
            mlp_names = ("gate_proj", "up_proj", "down_proj")
            mlp_shapes = {n: shapes.pop(n) for n in mlp_names}
        layer = {
            name: _quantize_linear(dense(lk[j], shape), cfg)
            for j, (name, shape) in enumerate(shapes.items())
        }
        if moe:
            ek = jax.random.split(lk[6], cfg.num_experts + 1)
            layer["router"] = dense(ek[-1], (cfg.num_experts, cfg.hidden_size))
            layer["experts"] = stack_experts([
                {
                    n: _quantize_linear(dense(jax.random.fold_in(ek[e], j), s), cfg)
                    for j, (n, s) in enumerate(mlp_shapes.items())
                }
                for e in range(cfg.num_experts)
            ])
        layer["input_norm"] = jnp.ones((cfg.hidden_size,), jnp.float32)
        layer["post_attn_norm"] = jnp.ones((cfg.hidden_size,), jnp.float32)
        if getattr(cfg, "sandwich_norms", False):  # Gemma-2 output norms
            layer["attn_out_norm"] = jnp.ones((cfg.hidden_size,), jnp.float32)
            layer["ffn_out_norm"] = jnp.ones((cfg.hidden_size,), jnp.float32)
        if cfg.attn_bias:  # Qwen2-style additive qkv biases
            bk = jax.random.split(lk[7], 3)
            layer["q_bias"] = jax.random.normal(bk[0], (shapes["q_proj"][0],), jnp.float32) * 0.02
            layer["k_bias"] = jax.random.normal(bk[1], (shapes["k_proj"][0],), jnp.float32) * 0.02
            layer["v_bias"] = jax.random.normal(bk[2], (shapes["v_proj"][0],), jnp.float32) * 0.02
        layers.append(layer)
    params = {
        "embed": dense(keys[-2], (cfg.vocab_size, cfg.hidden_size), scale=0.02).astype(cfg.dtype),
        "layers": layers,
        "final_norm": jnp.ones((cfg.hidden_size,), jnp.float32),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = _quantize_linear(
            dense(keys[-1], (cfg.vocab_size, cfg.hidden_size), scale=0.02), cfg
        )
    return params


def quantize_params(fp_params: Dict, cfg: LlamaConfig) -> Dict:
    """Quantize a full-precision llama param pytree (same structure with
    2D fp arrays for the projections) into cfg.quant format."""
    out = {
        "embed": fp_params["embed"].astype(cfg.dtype),
        "final_norm": fp_params["final_norm"],
        "layers": [],
    }
    for layer in fp_params["layers"]:
        q = {}
        for name, w in layer.items():
            if name.endswith("_proj"):
                q[name] = _quantize_linear(jnp.asarray(w, jnp.float32), cfg)
            elif name == "experts":
                # MoE: fp experts come either stacked ({name: (E, n, k)})
                # or as a per-expert list — quantize each expert's 2D
                # weights and restack
                if isinstance(w, (list, tuple)):
                    per_expert = list(w)
                else:
                    E = jax.tree.leaves(w)[0].shape[0]
                    per_expert = [jax.tree.map(lambda a: a[e], w) for e in range(E)]
                q[name] = stack_experts([
                    {n2: _quantize_linear(jnp.asarray(w2, jnp.float32), cfg)
                     for n2, w2 in ex.items()}
                    for ex in per_expert
                ])
            else:
                q[name] = w  # norms, biases, the MoE router
        out["layers"].append(q)
    if "lm_head" in fp_params:
        out["lm_head"] = _quantize_linear(jnp.asarray(fp_params["lm_head"], jnp.float32), cfg)
    return out


# ---------------------------------------------------------------------------
# KV cache (int8, per-token-per-head absmax — finer than the reference
# needs since it has no attention; SURVEY.md §5 plans per-head blocks)
# ---------------------------------------------------------------------------


def init_kv_cache(cfg: LlamaConfig, batch: int) -> Dict:
    """Cache layout is HEAD-MAJOR and K is stored TRANSPOSED:
    K (L, B, H, D, S), V (L, B, H, S, D), scales (L, B, H, S) — exactly
    what the fused flash-decode kernel wants (ops/attention.py: wide
    lane-major MXU dots, no padded scale DMAs)."""
    L, B, S, H, D = cfg.num_layers, batch, cfg.max_seq_len, cfg.num_kv_heads, cfg.hd
    if cfg.kv_quant:
        return {
            "k": jnp.zeros((L, B, H, D, S), jnp.int8),
            "v": jnp.zeros((L, B, H, S, D), jnp.int8),
            "k_scale": jnp.zeros((L, B, H, S), jnp.float32),
            "v_scale": jnp.zeros((L, B, H, S), jnp.float32),
        }
    return {
        "k": jnp.zeros((L, B, H, S, D), cfg.dtype),
        "v": jnp.zeros((L, B, H, S, D), cfg.dtype),
    }


def _stacked_decode_ok(cfg: LlamaConfig) -> bool:
    """Will decode_attention_int8_stacked accept this config's shapes?
    (Mirrors its tileability guards; gates the deferred-write decode.)"""
    D, S = cfg.hd, cfg.max_seq_len
    return (D % 128 == 0 and cfg.num_heads % cfg.num_kv_heads == 0
            and S % 128 == 0 and 2 * S * D <= 8 * 1024 * 1024)


def _use_fused_decode_attn(cfg: LlamaConfig) -> bool:
    """The flash-decode kernel runs compiled on TPU; interpret mode is too
    slow for the per-layer loop, so CPU tests take the XLA fallback (the
    kernel itself is covered by interpret-mode unit tests). Sliding
    windows (Mistral), Gemma-2 softcapping and ALiBi (BLOOM — in-kernel
    -slope*distance bias since r4; the r3 review flagged BLOOM fenced
    out of every fast path) all ride the same kernels via static/operand
    parameters."""
    from ..ops.common import on_tpu

    return on_tpu()


def _alibi_slopes_local(cfg) -> Optional[jax.Array]:
    """(Hq_local,) ALiBi slope vector for the fused kernels, or None for
    non-ALiBi configs. Under TP the slope sequence is GLOBAL while
    cfg.num_heads is shard-local — same slicing as _alibi_bias."""
    if not getattr(cfg, "alibi", False):
        return None
    total = getattr(cfg, "alibi_total_heads", None) or cfg.num_heads
    slopes = jnp.asarray(alibi_slopes(total))
    ax = getattr(cfg, "alibi_axis", None)
    if ax is not None:
        off = jax.lax.axis_index(ax) * cfg.num_heads
        slopes = jax.lax.dynamic_slice(slopes, (off,), (cfg.num_heads,))
    return slopes


def _cache_write(arr: jax.Array, li: int, upd: jax.Array, starts: jax.Array, pos_axis: int) -> jax.Array:
    """Write `upd` (B, ...) into the stacked cache `arr` (L, B, ...) at
    per-batch position offsets `starts` (B,) along `pos_axis` (axis index
    within the per-(L,B) subarray). Positions MUST be contiguous per batch
    (true for both prefill [0..T) and decode [p, p+1)).

    Implemented as B UNROLLED dynamic_update_slice ops: XLA keeps them
    in-place under jit. The advanced-indexing scatter this replaces
    lowers to a Scatter HLO — catastrophic on TPU for the transposed K
    cache whose scattered runs are 1 element long. The B>16 fori_loop
    form (round 3's first large-batch design) is gone: a while loop
    carrying the multi-GB cache inside the engine's donated decode step
    broke XLA's buffer aliasing and the compiler inserted FULL-CACHE
    copies per step (measured on the paged pool: 9.7 GB -> 23.2 GB
    peak, OOM at B=48). HLO size grows with B, but the per-step write
    volume is trivial and unrolled DUS provably stays in place; the
    one-shot prefill inserts (engine insert_fn / paged_ingest) keep
    their fori_loops — a possible one-time copy per ADMISSION is
    bounded, unlike one per decode step. NOTE: decode configs that fail
    _stacked_decode_ok (e.g. 2*S*D > 8 MB VMEM at very long max_seq)
    fall back to this per-layer chain at 4xBxL ops per step — use the
    PAGED cache for long-context serving; its deferral has no such gate.
    """
    B = upd.shape[0]

    def _write_one(b, arr):
        u = jax.lax.dynamic_slice_in_dim(upd, b, 1, axis=0)[None]  # (1,1,...)
        idx = [li, b] + [0] * (arr.ndim - 2)
        idx[2 + pos_axis] = jax.lax.dynamic_index_in_dim(starts, b, keepdims=False)
        return jax.lax.dynamic_update_slice(arr, u.astype(arr.dtype), tuple(idx))

    for b in range(B):
        arr = _write_one(b, arr)
    return arr


def _paged_write_and_attend(new_cache: Dict, li: int, q, k, v, positions, cfg):
    """Decode-step attend over PAGED int8 KV storage (vLLM-style;
    ops/paged_attention.py). The cache pytree carries, beside the pool
    leaves (L, NP, ...), the step's host-resolved indirection:
    `page_table` (B, MAXP), `write_page` (B,), `write_off` (B,).

    DEFERRED-WRITE design (see ops/paged_attention.py docstring): this
    layer's quantized k/v are STAGED into small (L, B, ...) pend buffers
    (static-index DUS, in-place); the attend kernel reads the pool one
    step stale with the current token folded in from registers (exact
    online-softmax extension). flush_paged_writes lands all layers'
    tokens after the layer loop in 4xB DUS ops — per-layer DUS chains
    measured 36 ms/step at B=48."""
    kv4 = new_cache["v"].dtype == jnp.uint8  # int4-packed pool (kv_bits=4)
    levels = 7.0 if kv4 else 127.0
    kq, ks = _kv_quantize(k, levels)
    vq, vs = _kv_quantize(v, levels)
    pages, offs = new_cache["write_page"], new_cache["write_off"]
    from ..ops.paged_attention import paged_decode_attention_int8_stacked

    # stage this layer's token (pend leaves exist in decode steps;
    # maybe_init_pend creates them at forward entry)
    _stage_pend(new_cache, li, kq, ks, vq, vs)

    lengths = positions[:, 0]  # tokens IN THE POOL (current one rides new_kv)
    new_kv = (kq[:, 0], ks[:, 0], vq[:, 0], vs[:, 0])

    attn = paged_decode_attention_int8_stacked(
        q, new_cache["k"], new_cache["k_scale"],
        new_cache["v"], new_cache["v_scale"], li,
        new_cache["page_table"], lengths, new_kv=new_kv,
        window=getattr(cfg, "sliding_window", None),
        softcap=getattr(cfg, "attn_logit_softcap", None),
        sm_scale=_sm_scale(cfg),
        pages_hint=getattr(cfg, "pages_hint", None),
        alibi_slopes=_alibi_slopes_local(cfg),
    )
    if attn is not None:
        return attn, new_cache
    # untileable shapes (D or page not lane-aligned, e.g. tiny test
    # configs): gather the mapped pages back into a contiguous view,
    # append the in-register token, and take the XLA dequant-attend path
    pt = new_cache["page_table"]  # (B, MAXP)
    B, MAXP = pt.shape
    kg = jnp.take(new_cache["k"][li], pt, axis=0)  # (B,MAXP,H,P,D) token-major
    vg = jnp.take(new_cache["v"][li], pt, axis=0)  # (B,MAXP,H,P,D)
    ksg = jnp.take(new_cache["k_scale"][li], pt, axis=0)  # (B,MAXP,H,P)
    vsg = jnp.take(new_cache["v_scale"][li], pt, axis=0)
    if kv4:  # unpack (B,MAXP,H,P/2,D) uint8 -> (B,MAXP,H,P,D) ±7 codes
        kg, vg = _kv4_unpack(kg), _kv4_unpack(vg)
        ksg, vsg = _kv4_scales_logical(ksg), _kv4_scales_logical(vsg)
    S = MAXP * kg.shape[3]  # pages are token-major (..., P, D)
    # seq-major (B, S, H, D) contiguous logical views
    k_full = _kv_dequantize(
        kg.transpose(0, 1, 3, 2, 4).reshape(B, S, kg.shape[2], -1),
        ksg.transpose(0, 1, 3, 2).reshape(B, S, -1), cfg.dtype, levels,
    )
    v_full = _kv_dequantize(
        vg.transpose(0, 1, 3, 2, 4).reshape(B, S, vg.shape[2], -1),
        vsg.transpose(0, 1, 3, 2).reshape(B, S, -1), cfg.dtype, levels,
    )
    # the current token as the (S+1)-th column — same quantize/dequant
    # round-trip the pool would have applied
    k_full = jnp.concatenate(
        [k_full, _kv_dequantize(kq, ks, cfg.dtype, levels)], axis=1)
    v_full = jnp.concatenate(
        [v_full, _kv_dequantize(vq, vs, cfg.dtype, levels)], axis=1)
    mask = jnp.arange(S)[None, None, :] < positions[:, :, None]  # (B,1,S)
    sw = getattr(cfg, "sliding_window", None)
    if sw is not None:
        mask = mask & (positions[:, :, None] - jnp.arange(S)[None, None, :] < sw)
    mask = jnp.concatenate(
        [mask, jnp.ones((B, q.shape[1], 1), bool)], axis=2)  # self: always valid
    bias = None
    if getattr(cfg, "alibi", False):
        # pool order IS logical token order here; the appended current
        # token sits AT the query position (distance 0)
        sl = _alibi_slopes_local(cfg)
        kpos = jnp.concatenate(
            [jnp.broadcast_to(jnp.arange(S)[None, :], (B, S)),
             positions[:, 0:1]], axis=1)  # (B, S+1)
        dist = positions[:, None, :, None] - kpos[:, None, None, :]
        bias = -sl[None, :, None, None] * dist.astype(jnp.float32)
    return _attention(q, k_full, v_full, mask, cfg.dtype,
                      sm_scale=_sm_scale(cfg),
                      softcap=getattr(cfg, "attn_logit_softcap", None),
                      bias=bias), new_cache


def _stage_pend(new_cache: Dict, li: int, kq, ks, vq, vs) -> None:
    """Write layer li's quantized token into the pend staging buffers
    (static-index DUS, in place; shared by the paged and contiguous
    deferred-write paths)."""
    new_cache["pend_k"] = jax.lax.dynamic_update_slice(
        new_cache["pend_k"], kq[None, :, 0], (li, 0, 0, 0))
    new_cache["pend_v"] = jax.lax.dynamic_update_slice(
        new_cache["pend_v"], vq[None, :, 0], (li, 0, 0, 0))
    new_cache["pend_ks"] = jax.lax.dynamic_update_slice(
        new_cache["pend_ks"], ks[None, :, 0], (li, 0, 0))
    new_cache["pend_vs"] = jax.lax.dynamic_update_slice(
        new_cache["pend_vs"], vs[None, :, 0], (li, 0, 0))


_warned_decode_cliff: set = set()


def _warn_decode_cliff(cfg) -> None:
    """One-time warning for decode configs that silently pay the
    4xBxL per-step unrolled-DUS write cost (_cache_write docstring:
    measured 36 ms/step at B=48 on a 32-layer 7B)."""
    key = (cfg.hd, cfg.max_seq_len, cfg.num_heads, cfg.num_kv_heads)
    if key in _warned_decode_cliff:
        return
    _warned_decode_cliff.add(key)
    import warnings

    warnings.warn(
        "contiguous int8 KV decode for this config (head_dim=%d, "
        "max_seq_len=%d) cannot use the deferred-write flash-decode path "
        "(shape gate _stacked_decode_ok failed) — every step pays "
        "4*batch*layers tiny cache writes (~6 us each on v5e). Use the "
        "paged KV cache (engine paged mode) for long-context serving; "
        "its write deferral has no shape gate." % (cfg.hd, cfg.max_seq_len),
        stacklevel=3,
    )


def maybe_init_pend(new_cache: Dict, cfg, T: int, positions) -> Dict:
    """Decode-step (T=1) deferred-write gating, shared by every forward
    (llama, gptj): the paged pool always defers; the contiguous int8
    cache defers when the stacked flash kernel will actually run
    (TPU + tileable shapes) — the XLA fallback keeps immediate writes."""
    if T != 1:
        return new_cache
    if "page_table" in new_cache:
        return init_pend(new_cache)
    if (cfg.kv_quant and _use_fused_decode_attn(cfg)
            and _stacked_decode_ok(cfg)):
        return init_pend(new_cache, positions)
    if cfg.kv_quant and _use_fused_decode_attn(cfg):
        # the kernel would run but the shapes fail its gate: the silent
        # per-layer write cliff (item the r3 review flagged) — say so once
        _warn_decode_cliff(cfg)
    return new_cache


def init_pend(new_cache: Dict, positions=None) -> Dict:
    """Add this step's KV staging buffers to a cache dict (decode steps;
    deferred-write design — see _paged_write_and_attend). Works for both
    the paged pool (k (L,NP,H,P,D)) and the contiguous cache
    (k (L,B,H,D,S), which also stores `pend_pos` for the flush). Shapes
    derive from the cache leaves, not cfg — under shard_map TP the local
    kv-head count is cfg.num_kv_heads / tp."""
    paged = "write_page" in new_cache
    if paged:
        L, _NP, H, _P, D = new_cache["k"].shape
        B = new_cache["write_page"].shape[0]
    else:
        L, B, H, D, _S = new_cache["k"].shape
        new_cache["pend_pos"] = positions[:, 0].astype(jnp.int32)
    new_cache["pend_k"] = jnp.zeros((L, B, H, D), jnp.int8)
    new_cache["pend_v"] = jnp.zeros((L, B, H, D), jnp.int8)
    new_cache["pend_ks"] = jnp.zeros((L, B, H), jnp.float32)
    new_cache["pend_vs"] = jnp.zeros((L, B, H), jnp.float32)
    return new_cache


# kept as an alias for the engine/gptj call sites
init_paged_pend = init_pend


def flush_paged_writes(new_cache: Dict) -> Dict:
    """Land the step's staged tokens into the KV storage: ONE unrolled
    DUS per batch row per leaf covering ALL layers (the destination row/
    page and token offset are layer-invariant), i.e. 4xB ops instead of
    4xBxL. Unrolled DUS provably stays in place; fori_loop and
    Pallas-aliased forms both made XLA copy the multi-GB pool per step
    (ops/paged_attention.py docstring). Handles both the paged pool
    (token-major pages) and the contiguous cache (transposed K: token
    on the LAST axis)."""
    paged = "write_page" in new_cache
    if paged:
        rows, offs = new_cache["write_page"], new_cache["write_off"]
    else:
        rows = jnp.arange(new_cache["pend_pos"].shape[0], dtype=jnp.int32)
        offs = new_cache.pop("pend_pos")
    pk, pv = new_cache.pop("pend_k"), new_cache.pop("pend_v")
    pks, pvs = new_cache.pop("pend_ks"), new_cache.pop("pend_vs")
    B = pk.shape[1]
    kv4 = paged and new_cache["v"].dtype == jnp.uint8

    def upd(arr, vals, b, tok_axis):
        # vals (L, H[, D]) -> unit token axis inserted at tok_axis
        u = jnp.expand_dims(jnp.expand_dims(vals, 1), tok_axis)
        idx = [0] * arr.ndim
        idx[1] = jax.lax.dynamic_index_in_dim(rows, b, keepdims=False)
        idx[tok_axis] = jax.lax.dynamic_index_in_dim(offs, b, keepdims=False)
        return jax.lax.dynamic_update_slice(arr, u.astype(arr.dtype), tuple(idx))

    def _nib(vals):
        # vals are already ±7-grid codes (no requant) — the shared kv4
        # sign-magnitude encoding
        from ..ops.paged_attention import nib_sign_mag

        return nib_sign_mag(vals)

    def upd4(arr, prev_leaf, vals, b):
        # int4 pair-packed pool: the byte row (tokens 2r | 2r+1) is built
        # WITHOUT reading the pool — an even-offset token's lo neighbour
        # is a future (masked) token, an odd-offset one's hi neighbour is
        # LAST step's token, staged in the nib_prev leaf. A read-modify-
        # write here gave the pool a second reader and XLA copied the
        # whole multi-GB pool per step (compile-OOM at B=62).
        off = jax.lax.dynamic_index_in_dim(offs, b, keepdims=False)
        page = jax.lax.dynamic_index_in_dim(rows, b, keepdims=False)
        nib = _nib(vals)  # (L, H, D) uint8
        byte = jnp.where(off % 2 == 0, nib << 4, (prev_leaf[:, b] << 4) | nib)
        u = byte[:, None, :, None, :]  # (L,1,H,1,D)
        idx = (0, page, 0, off // 2, 0)
        return jax.lax.dynamic_update_slice(arr, u.astype(arr.dtype), idx)

    def upd4_scale(arr, vals, b):
        # scales live in the kernel's parity-grouped column order:
        # c(off) = (off%2)*(P/2) + off//2
        half = arr.shape[3] // 2
        off = jax.lax.dynamic_index_in_dim(offs, b, keepdims=False)
        page = jax.lax.dynamic_index_in_dim(rows, b, keepdims=False)
        u = jnp.expand_dims(jnp.expand_dims(vals, 1), 3)
        idx = (0, page, 0, (off % 2) * half + off // 2)
        return jax.lax.dynamic_update_slice(arr, u.astype(arr.dtype), idx)

    # token axis per leaf: paged pool K/V are token-major (L,NP,H,P,D);
    # contiguous K is transposed (L,B,H,D,S) with the token LAST
    for b in range(B):
        if kv4:
            new_cache["k"] = upd4(new_cache["k"], new_cache["nib_prev_k"],
                                  pk[:, b], b)
            new_cache["v"] = upd4(new_cache["v"], new_cache["nib_prev_v"],
                                  pv[:, b], b)
            new_cache["k_scale"] = upd4_scale(new_cache["k_scale"], pks[:, b], b)
            new_cache["v_scale"] = upd4_scale(new_cache["v_scale"], pvs[:, b], b)
            continue
        if paged:
            new_cache["k"] = upd(new_cache["k"], pk[:, b], b, 3)
        else:
            u = pk[:, b][:, None, :, :, None]  # (L,1,H,D,1)
            idx = (0, jax.lax.dynamic_index_in_dim(rows, b, keepdims=False),
                   0, 0, jax.lax.dynamic_index_in_dim(offs, b, keepdims=False))
            new_cache["k"] = jax.lax.dynamic_update_slice(
                new_cache["k"], u.astype(new_cache["k"].dtype), idx)
        new_cache["v"] = upd(new_cache["v"], pv[:, b], b, 3)
        new_cache["k_scale"] = upd(new_cache["k_scale"], pks[:, b], b, 3)
        new_cache["v_scale"] = upd(new_cache["v_scale"], pvs[:, b], b, 3)
    if kv4:
        # stage this step's nibbles for next step's odd-offset writes
        new_cache["nib_prev_k"] = _nib(pk)
        new_cache["nib_prev_v"] = _nib(pv)
    return new_cache


def _kv_quantize(x: jax.Array, levels: float = 127.0) -> Tuple[jax.Array, jax.Array]:
    """(B, T, H, D) -> int codes on the ±levels grid (int8 storage) +
    per-(token,head) absmax. levels=7 is the int4-pool grid (kv_bits=4):
    the codes ride pend buffers / the attend register fold as int8 and
    pack to nibbles at flush."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(absmax > 0, levels / absmax, 0.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * scale[..., None]),
                 -levels, levels)
    return q.astype(jnp.int8), absmax


def _kv_dequantize(q: jax.Array, absmax: jax.Array, dtype,
                   levels: float = 127.0) -> jax.Array:
    return (q.astype(jnp.float32) * (absmax[..., None] / levels)).astype(dtype)


def _kv4_unpack(packed: jax.Array) -> jax.Array:
    """(..., P/2, D) uint8 adjacent-token nibble pairs -> (..., P, D)
    int8 codes in [-7, 7] in LOGICAL token order (byte row r holds
    tokens 2r HI / 2r+1 LO — engine/paged._pack4's order)."""
    hi, lo = (packed >> 4).astype(jnp.int32), (packed & 0xF).astype(jnp.int32)

    def dec(nib):
        return jnp.where(nib >= 8, -(nib - 8), nib).astype(jnp.int8)

    pair = jnp.stack([dec(hi), dec(lo)], axis=-2)  # (..., P/2, 2, D)
    return pair.reshape(*packed.shape[:-2], -1, packed.shape[-1])


def _kv4_scales_logical(s: jax.Array) -> jax.Array:
    """Pool scales are stored in the kernel's parity-grouped COLUMN
    order (engine/paged._scale_cols); interleave back to token order."""
    half = s.shape[-1] // 2
    return jnp.stack([s[..., :half], s[..., half:]], axis=-1).reshape(
        *s.shape[:-1], -1)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _mlp_act(cfg, gate_f32: jax.Array) -> jax.Array:
    """Gate activation in f32: silu (llama) or tanh-gelu (Gemma GeGLU)."""
    if getattr(cfg, "mlp_act", "silu") == "gelu_tanh":
        return jax.nn.gelu(gate_f32, approximate=True)
    return jax.nn.silu(gate_f32)


def stack_experts(expert_list: list):
    """Stack per-expert weight pytrees (dicts of quantized/fp linears)
    into one pytree whose leaves carry a leading expert dim E — the
    layout MoE params use. Leading-dim stacking is what makes expert
    parallelism a plain sharding decision: P("model", None, ...) on the
    expert dim and shard_map hands each device its local experts."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *expert_list)


def _expert_slice(experts, e: int):
    """Static index of expert e out of the stacked pytree (aux metadata
    such as QLinearWeight.shape already describes ONE expert)."""
    return jax.tree.map(lambda a: a[e], experts)


def _moe_ffn(h: jax.Array, layer: Dict, cfg: LlamaConfig, psum_axis: Optional[str]) -> jax.Array:
    """Top-k routed mixture-of-experts FFN (Mixtral block_sparse_moe,
    HF MixtralSparseMoeBlock semantics: softmax over ALL experts first,
    then top-k, then renormalize the chosen weights).

    Dense-combine design (TPU-first): every local expert runs on all
    tokens and the router weight masks its contribution. At decode the
    step is HBM-bound on expert weight reads — which routing cannot
    avoid once any token in the batch picks an expert — so dense combine
    costs ~nothing extra and keeps shapes static (no scatter/gather, no
    capacity overflow). At prefill it spends E/k-times the dense-MLP
    FLOPs; expert parallelism divides that back by the mesh axis (each
    device computes only its E/tp local experts on replicated tokens and
    the contributions ride the existing down_proj psum).

    Under `psum_axis` the stacked experts are sharded on their leading
    dim while the router stays replicated: routing is computed globally
    and each device slices its own E_local window of the combine
    weights via axis_index. The caller psums the returned partial sum.
    """
    router_w = layer["router"]  # (E_global, h) fp, replicated
    e_global = router_w.shape[0]
    k = cfg.num_experts_per_tok
    logits = jnp.matmul(
        h.astype(jnp.float32), router_w.T.astype(jnp.float32)
    )  # (B, T, E)
    probs = jax.nn.softmax(logits, axis=-1)
    topw, topi = jax.lax.top_k(probs, k)
    topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    # scatter the k renormalized weights back to a dense (B, T, E) mask
    w_full = jnp.sum(
        jax.nn.one_hot(topi, e_global, dtype=jnp.float32) * topw[..., None], axis=-2
    )
    experts = layer["experts"]
    e_local = jax.tree.leaves(experts)[0].shape[0]
    if psum_axis is not None:
        # always slice under a mesh axis (tp=1 slices at 0 — identity):
        # the caller psums the return value, so each device must
        # contribute ONLY its local experts' share
        e0 = jax.lax.axis_index(psum_axis) * e_local
        w_loc = jax.lax.dynamic_slice_in_dim(w_full, e0, e_local, axis=-1)
    else:
        w_loc = w_full
    n_tok = int(np.prod(h.shape[:-1]))
    min_disp = getattr(cfg, "moe_dispatch_min_tokens", 0)
    if min_disp and n_tok >= min_disp:
        return _moe_dispatch(h, experts, w_loc, e_global, cfg)
    out = jnp.zeros(h.shape, jnp.float32)
    for e in range(e_local):
        ex = _expert_slice(experts, e)
        gate = apply_linear(h, ex["gate_proj"], cfg)
        up = apply_linear(h, ex["up_proj"], cfg)
        d = apply_linear(
            _mlp_act(cfg, gate.astype(jnp.float32)).astype(cfg.dtype) * up,
            ex["down_proj"], cfg,
        )
        out = out + w_loc[..., e : e + 1] * d.astype(jnp.float32)
    return out.astype(cfg.dtype)


def _moe_dispatch(
    h: jax.Array, experts, w_loc: jax.Array, e_global: int, cfg: LlamaConfig
) -> jax.Array:
    """Capacity-bounded MoE dispatch (GShard, arxiv 2006.16668): gather
    each expert's chosen tokens into a static (E_local, C, h) buffer via
    a one-hot dispatch einsum (an MXU contraction — no scatter HLO, no
    dynamic shapes), run the quantized expert FFN once per expert on its
    C-token buffer, and combine back weighted by the router.

    vs dense combine: expert FLOPs drop from E_local*N to E_local*C
    (C ~= cf*N*k/E_global) — the win at prefill sizes; the dispatch and
    combine einsums cost 2*N*E_local*C*h MACs on the MXU (small relative
    to the FFN for N << ~8*hidden). Tokens beyond an expert's capacity
    are DROPPED for that expert (their other top-k picks still count;
    the combine weight mass is simply missing) — the standard capacity
    trade; cf=2.0 makes drops rare for near-balanced routing. Serving
    paths that must be bitwise-lossless keep moe_dispatch_min_tokens=0.
    """
    lead = h.shape[:-1]
    hd = h.shape[-1]
    n = int(np.prod(lead))
    e_local = w_loc.shape[-1]
    k = cfg.num_experts_per_tok
    cf = getattr(cfg, "moe_capacity_factor", 2.0)
    cap = int(np.ceil(cf * n * k / e_global))
    cap = min(n, max(8, -(-cap // 8) * 8))  # static, sublane-aligned

    x = h.reshape(n, hd)
    w = w_loc.reshape(n, e_local)
    chosen = w > 0.0
    pos = jnp.cumsum(chosen.astype(jnp.int32), axis=0) - 1  # slot within expert
    keep = chosen & (pos < cap)
    # dispatch one-hot (N, E, C): token n -> slot pos[n,e] of expert e
    disp = jax.nn.one_hot(jnp.where(keep, pos, -1), cap, dtype=x.dtype)  # (N,E,C)
    xs = jnp.einsum("nec,nh->ech", disp, x)  # gather: (E, C, h)
    ys = []
    for e in range(e_local):
        ex = _expert_slice(experts, e)
        gate = apply_linear(xs[e], ex["gate_proj"], cfg)
        up = apply_linear(xs[e], ex["up_proj"], cfg)
        ys.append(apply_linear(
            _mlp_act(cfg, gate.astype(jnp.float32)).astype(cfg.dtype) * up,
            ex["down_proj"], cfg,
        ))
    ys = jnp.stack(ys)  # (E, C, h)
    comb = disp.astype(jnp.float32) * w[:, :, None]  # (N, E, C)
    out = jnp.einsum("nec,ech->nh", comb, ys.astype(jnp.float32))
    return out.reshape(*lead, hd).astype(cfg.dtype)


def _rms_norm(x: jax.Array, w: jax.Array, eps: float, offset: bool = False) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    wf = w.astype(jnp.float32) + 1.0 if offset else w  # Gemma stores w-1
    return (xf * jax.lax.rsqrt(var + eps) * wf).astype(x.dtype)


def _rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Rotary embedding, llama convention (half-split). x: (B,T,H,D)."""
    B, T, H, D = x.shape
    half = D // 2
    freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    angles = positions.astype(jnp.float32)[:, :, None] * freqs[None, None, :]  # (B,T,half)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).astype(x.dtype)


def _sm_scale(cfg) -> Optional[float]:
    """Softmax scale override: Gemma-2 scales scores by
    query_pre_attn_scalar**-0.5 instead of head_dim**-0.5."""
    qs = getattr(cfg, "query_scale", None)
    return None if qs is None else float(qs) ** -0.5


def _attention(q, k, v, mask, dtype, sm_scale=None, softcap=None, bias=None):
    """q: (B,T,Hq,D); k,v: (B,S,Hkv,D) full cache; GQA via head repeat.
    sm_scale overrides 1/sqrt(D) (Gemma-2 query_pre_attn_scalar);
    softcap applies cap*tanh(logit/cap) pre-mask (Gemma-2);
    bias (B,Hq,T,S) adds to the scaled logits pre-mask (ALiBi)."""
    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    if Hq != Hkv:
        rep = Hq // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32))
    scores = scores * (sm_scale if sm_scale is not None else 1.0 / np.sqrt(D))
    if bias is not None:
        scores = scores + bias
    if softcap is not None:
        scores = softcap * jnp.tanh(scores / softcap)
    scores = jnp.where(mask[:, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))
    return out.astype(dtype)



def alibi_slopes(n: int) -> np.ndarray:
    """ALiBi per-head slopes (Press et al., arxiv 2108.12409): the
    geometric sequence 2^(-8/n), with the paper's interpolation for
    non-power-of-two head counts (matches HF BloomModel.build_alibi)."""
    import math

    def pow2(m):
        start = 2.0 ** (-(2.0 ** -(math.log2(m) - 3)))
        return [start * start ** i for i in range(m)]

    if math.log2(n).is_integer():
        return np.asarray(pow2(n), np.float32)
    closest = 2 ** int(math.floor(math.log2(n)))
    return np.asarray(
        pow2(closest) + pow2(2 * closest)[0::2][: n - closest], np.float32
    )


def _alibi_bias(cfg, positions: jax.Array, S: int) -> jax.Array:
    """(B,Hq,T,S) additive logit bias: -slope_h * (q_pos - k_pos).
    Positive-distance rows only matter (k_pos > q_pos is masked);
    equivalent post-softmax to HF Bloom's slope*k_pos form (the per-row
    slope*q_pos offset cancels in softmax).

    Under TP the slope sequence is GLOBAL while cfg.num_heads is the
    shard-local count: opt_forward_tp sets alibi_total_heads/alibi_axis
    so each shard slices ITS contiguous head block (row-block sharded
    projections own heads [i*Hl, (i+1)*Hl))."""
    total = getattr(cfg, "alibi_total_heads", None) or cfg.num_heads
    slopes = jnp.asarray(alibi_slopes(total))  # (H_total,)
    ax = getattr(cfg, "alibi_axis", None)
    if ax is not None:
        off = jax.lax.axis_index(ax) * cfg.num_heads
        slopes = jax.lax.dynamic_slice(slopes, (off,), (cfg.num_heads,))
    dist = positions[:, None, :, None] - jnp.arange(S)[None, None, None, :]
    return -slopes[None, :, None, None] * dist.astype(jnp.float32)


def write_and_attend(new_cache: Dict, li: int, q, k, v, positions, mask, cfg):
    """Write this step's k/v into layer li of the cache and attend q over
    the full cache — the shared decode/prefill attention block for every
    model family (llama, gptj). Dispatches to the fused int8-KV flash
    kernels on TPU with the dequantize-then-attend XLA fallback.
    Returns (attn (B,T,Hq,hd), new_cache)."""
    starts = positions[:, 0]  # contiguous positions per batch
    T = q.shape[1]
    attn = None
    if "page_table" in new_cache:
        # paged int8 KV pool (engine paged mode) — decode steps only;
        # prefill runs on a contiguous scratch cache and is paginated by
        # the engine's ingest (engine/paged.py)
        if T != 1:
            raise ValueError("paged KV cache supports decode (T=1) steps only")
        if not cfg.kv_quant:
            raise ValueError("paged KV cache requires kv_quant=True (int8 pages)")
        return _paged_write_and_attend(new_cache, li, q, k, v, positions, cfg)
    if cfg.kv_quant:
        kq, ks = _kv_quantize(k)
        vq, vs = _kv_quantize(v)
        window = getattr(cfg, "sliding_window", None)
        softcap = getattr(cfg, "attn_logit_softcap", None)
        sm_scale = _sm_scale(cfg)
        if "pend_k" in new_cache:
            # deferred-write decode (same design as the paged pool):
            # stage this layer's token, attend over the one-step-stale
            # cache with the token folded in from registers, flush all
            # layers in 4xB DUS ops after the layer loop — per-layer
            # chains cost ~6 us per tiny op x 4 x B x L
            from ..ops.attention import decode_attention_int8_stacked

            _stage_pend(new_cache, li, kq, ks, vq, vs)
            attn = decode_attention_int8_stacked(
                q, new_cache["k"], new_cache["k_scale"],
                new_cache["v"], new_cache["v_scale"], li,
                lengths=positions[:, 0],
                new_kv=(kq[:, 0], ks[:, 0], vq[:, 0], vs[:, 0]),
                window=window, softcap=softcap, sm_scale=sm_scale,
                alibi_slopes=_alibi_slopes_local(cfg),
            )
            assert attn is not None  # init_pend is gated on tileability
            return attn, new_cache
        # K stored transposed (B,H,D,S): positions land on axis 2
        new_cache["k"] = _cache_write(
            new_cache["k"], li, kq.transpose(0, 2, 3, 1), starts, pos_axis=2
        )
        new_cache["v"] = _cache_write(
            new_cache["v"], li, vq.transpose(0, 2, 1, 3), starts, pos_axis=1
        )
        new_cache["k_scale"] = _cache_write(
            new_cache["k_scale"], li, ks.transpose(0, 2, 1), starts, pos_axis=1
        )
        new_cache["v_scale"] = _cache_write(
            new_cache["v_scale"], li, vs.transpose(0, 2, 1), starts, pos_axis=1
        )
        if T == 1 and _use_fused_decode_attn(cfg):
            from ..ops.attention import decode_attention_int8_stacked

            # decode mask (s <= q_pos) == "cache valid up to pos+1".
            # The layer-STACKED cache rides whole into the kernel with
            # li as a scalar-prefetch operand: slicing cache[li] as the
            # operand made XLA materialize the layer's full panes every
            # step (~2.2 GB/step over 32 layers at the 7B B=8 shape)
            attn = decode_attention_int8_stacked(
                q, new_cache["k"], new_cache["k_scale"],
                new_cache["v"], new_cache["v_scale"], li,
                lengths=positions[:, 0] + 1, window=window,
                softcap=softcap, sm_scale=sm_scale,
                alibi_slopes=_alibi_slopes_local(cfg),
            )
        elif T > 1 and _use_fused_decode_attn(cfg):
            from ..ops.attention import prefill_attention_int8_stacked

            # causal flash prefill over the just-written int8 cache —
            # layer-stacked with li scalar-prefetched (slicing cache[li]
            # materializes the layer's panes; chunked prefill would pay
            # that once per chunk per layer)
            attn = prefill_attention_int8_stacked(
                q, new_cache["k"], new_cache["k_scale"],
                new_cache["v"], new_cache["v_scale"], li,
                starts=starts, window=window,
                softcap=softcap, sm_scale=sm_scale,
                alibi_slopes=_alibi_slopes_local(cfg),
            )
        if attn is not None:
            return attn, new_cache
        # fallback: dequantize whole cache, kernel layouts -> seq-major
        k_full = _kv_dequantize(
            new_cache["k"][li].transpose(0, 1, 3, 2),
            new_cache["k_scale"][li], cfg.dtype,
        ).transpose(0, 2, 1, 3)
        v_full = _kv_dequantize(
            new_cache["v"][li], new_cache["v_scale"][li], cfg.dtype
        ).transpose(0, 2, 1, 3)
    else:
        new_cache["k"] = _cache_write(
            new_cache["k"], li, k.astype(cfg.dtype).transpose(0, 2, 1, 3),
            starts, pos_axis=1,
        )
        new_cache["v"] = _cache_write(
            new_cache["v"], li, v.astype(cfg.dtype).transpose(0, 2, 1, 3),
            starts, pos_axis=1,
        )
        k_full = new_cache["k"][li].transpose(0, 2, 1, 3)
        v_full = new_cache["v"][li].transpose(0, 2, 1, 3)
    bias = (
        _alibi_bias(cfg, positions, k_full.shape[1])
        if getattr(cfg, "alibi", False) else None
    )
    return _attention(q, k_full, v_full, mask, cfg.dtype,
                      sm_scale=_sm_scale(cfg),
                      softcap=getattr(cfg, "attn_logit_softcap", None),
                      bias=bias), new_cache


def llama_forward(
    params: Dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # (B, T)
    cache: Optional[Dict] = None,
    positions: Optional[jax.Array] = None,  # (B, T) absolute positions
    seq_lens: Optional[jax.Array] = None,  # unused: validity derives from positions (kept for API stability)
    psum_axis: Optional[str] = None,  # mesh axis for TP row-parallel reductions
    lora: Optional[list] = None,  # per-layer {proj_name: {A,B,scale}} adapters
    lora_ids: Optional[jax.Array] = None,  # (B,) per-sequence adapter ids (batched lora)
) -> Tuple[jax.Array, Optional[Dict]]:
    """Returns (logits (B, T, vocab), updated cache).

    Prefill: cache=None or positions starting at 0. Decode: T=1 with
    positions = current length. Static shapes throughout: the cache is
    (max_seq_len) and masking handles validity — jit-compatible
    continuous batching (SURVEY.md §7 step 7).
    """
    B, T = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    if seq_lens is None:
        seq_lens = jnp.zeros((B,), jnp.int32)

    x = jnp.take(params["embed"], tokens, axis=0).astype(cfg.dtype)  # (B,T,H)
    if getattr(cfg, "scale_embeddings", False):  # Gemma: x * sqrt(hidden)
        x = x * jnp.asarray(np.sqrt(cfg.hidden_size), cfg.dtype)
    norm_off = getattr(cfg, "norm_offset", False)
    ids_bt = (
        jnp.broadcast_to(lora_ids[:, None], (B, T)) if lora_ids is not None else None
    )

    use_cache = cache is not None
    S = cfg.max_seq_len if use_cache else T
    # causal-with-cache mask: query t may attend cache slot s iff
    # s < seq_lens + (t - first_new + 1) i.e. s_pos <= q_pos
    sw = getattr(cfg, "sliding_window", None)
    if use_cache:
        s_ids = jnp.arange(S)[None, None, :]  # (1,1,S)
        q_pos = positions[:, :, None]  # (B,T,1)
        mask = s_ids <= q_pos  # (B,T,S) absolute-position causal
        if sw is not None:
            mask = mask & (q_pos - s_ids < sw)  # Mistral window (t-w, t]
    else:
        mask = jnp.tril(jnp.ones((T, T), bool))[None]
        if sw is not None:
            q_ids = jnp.arange(T)[:, None]
            mask = mask & ((q_ids - jnp.arange(T)[None, :]) < sw)[None]
        mask = jnp.broadcast_to(mask, (B, T, T))

    # Gemma-2 alternating attention: even layers slide, odd are global.
    # Window selection is STATIC per layer (a replaced frozen config), so
    # kernels/masks specialize at trace time; the global-layer mask drops
    # the window term entirely.
    alternating = bool(getattr(cfg, "sliding_alternating", False)) and sw is not None
    if alternating:
        cfg_global = dataclasses.replace(cfg, sliding_window=None)
        if use_cache:
            mask_global = s_ids <= q_pos
        else:
            mask_global = jnp.broadcast_to(
                jnp.tril(jnp.ones((T, T), bool))[None], (B, T, T))
    sandwich = bool(getattr(cfg, "sandwich_norms", False))

    new_cache = dict(cache) if use_cache else None
    if use_cache:
        new_cache = maybe_init_pend(new_cache, cfg, T, positions)
    for li, layer in enumerate(params["layers"]):
        lcfg, lmask = cfg, mask
        if alternating and li % 2 == 1:
            lcfg, lmask = cfg_global, mask_global
        h = _rms_norm(x, layer["input_norm"], cfg.rms_eps, norm_off)
        q = apply_linear(h, layer["q_proj"], cfg, _lora_for(lora, li, "q_proj"), ids_bt)
        k = apply_linear(h, layer["k_proj"], cfg, _lora_for(lora, li, "k_proj"), ids_bt)
        v = apply_linear(h, layer["v_proj"], cfg, _lora_for(lora, li, "v_proj"), ids_bt)
        if "q_bias" in layer:  # Qwen2-style qkv biases
            q = q + layer["q_bias"].astype(q.dtype)
            k = k + layer["k_bias"].astype(k.dtype)
            v = v + layer["v_bias"].astype(v.dtype)
        q = q.reshape(B, T, cfg.num_heads, cfg.hd)
        k = k.reshape(B, T, cfg.num_kv_heads, cfg.hd)
        v = v.reshape(B, T, cfg.num_kv_heads, cfg.hd)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)

        if use_cache:
            attn, new_cache = write_and_attend(new_cache, li, q, k, v, positions, lmask, lcfg)
        else:
            attn = _attention(q, k, v, lmask, cfg.dtype,
                              sm_scale=_sm_scale(cfg),
                              softcap=getattr(cfg, "attn_logit_softcap", None))
        attn = attn.astype(cfg.dtype)
        attn = attn.reshape(B, T, cfg.num_heads * cfg.hd)
        o = apply_linear(attn, layer["o_proj"], cfg, _lora_for(lora, li, "o_proj"), ids_bt)
        if psum_axis is not None:  # row-parallel o_proj partial sums
            o = jax.lax.psum(o, psum_axis)
        if sandwich:  # Gemma-2: norm the attention OUTPUT pre-residual
            o = _rms_norm(o, layer["attn_out_norm"], cfg.rms_eps, norm_off)
        x = x + o

        h = _rms_norm(x, layer["post_attn_norm"], cfg.rms_eps, norm_off)
        if "experts" in layer:  # Mixtral MoE block (LoRA targets attention only)
            d = _moe_ffn(h, layer, cfg, psum_axis)
        else:
            gate = apply_linear(h, layer["gate_proj"], cfg, _lora_for(lora, li, "gate_proj"), ids_bt)
            up = apply_linear(h, layer["up_proj"], cfg, _lora_for(lora, li, "up_proj"), ids_bt)
            d = apply_linear(
                _mlp_act(cfg, gate.astype(jnp.float32)).astype(cfg.dtype) * up,
                layer["down_proj"], cfg, _lora_for(lora, li, "down_proj"), ids_bt,
            )
        if psum_axis is not None:  # row-parallel / expert-parallel partial sums
            d = jax.lax.psum(d, psum_axis)
        if sandwich:  # Gemma-2: norm the MLP OUTPUT pre-residual
            d = _rms_norm(d, layer["ffn_out_norm"], cfg.rms_eps, norm_off)
        x = x + d

    if use_cache and "pend_k" in new_cache:
        new_cache = flush_paged_writes(new_cache)
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps, norm_off)
    if cfg.tie_embeddings or "lm_head" not in params:
        logits = jnp.matmul(x, params["embed"].T.astype(cfg.dtype))
    else:
        logits = apply_linear(x, params["lm_head"], cfg)
    logits = logits.astype(jnp.float32)
    fcap = getattr(cfg, "final_logit_softcap", None)
    if fcap is not None:  # Gemma-2 final logit softcapping
        logits = fcap * jnp.tanh(logits / fcap)
    return logits, new_cache
