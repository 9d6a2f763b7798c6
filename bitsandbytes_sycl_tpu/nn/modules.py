"""Quantized Flax (linen) modules.

TPU-native redesign of the reference's torch nn layer
(python_src_quants/nn/modules.py). Key departures:

- No quantize-on-`.to(device)` side effects (reference Params4bit._quantize,
  nn/modules.py:291-305): quantization happens at parameter init or via the
  explicit pure function `quantize_linear_params`.
- Quantized weights live in the ``"quants"`` variable collection (like
  flax batch_stats), so optimizers see only the trainable ``"params"``
  collection — the functional analog of bnb freezing int8/4-bit weights.
- A whole forward (quantize stats + int8 dot + epilogue + outlier sidecar)
  is one jitted XLA computation instead of ~8 kernel launches
  (SURVEY.md §3.1).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import functional as F
from ..autograd import matmul_4bit as _matmul_4bit
from ..autograd import matmul_8bit_lt, matmul_8bit_train
from ..ops.common import safe_inv as _safe_inv_scalar
from ..types import QuantState

__all__ = [
    "Linear4bit",
    "LinearNF4",
    "LinearFP4",
    "Linear8bitLt",
    "Embedding",
    "StableEmbedding",
    "OutlierAwareLinear",
    "SwitchBackLinearBnb",
    "quantize_linear_params",
]

default_kernel_init = nn.initializers.lecun_normal()


class Linear4bit(nn.Module):
    """4-bit weight-only linear layer (reference nn/modules.py:346-477).

    Weight is stored packed (2 nibbles/byte) with per-block absmax in the
    ``"quants"`` collection; logical shape is (features, in_features) —
    bnb's (out, in) — so serialized checkpoints interoperate.
    """

    features: int
    use_bias: bool = True
    quant_type: str = "nf4"
    blocksize: int = 64
    compress_statistics: bool = False
    compute_dtype: Any = jnp.bfloat16
    quant_dtype: str = "bfloat16"  # dtype recorded in the quant state
    use_kernel: bool = True  # fused Pallas dequant-matmul (kernel layout)
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        use_kernel = self.use_kernel and in_features % (2 * self.blocksize) == 0

        def init_fn(rng):
            w = self.kernel_init(rng, (self.features, in_features), jnp.float32)
            if use_kernel:
                from ..ops import quantize_4bit_native

                return {"qweight": quantize_4bit_native(
                    w, blocksize=self.blocksize, quant_type=self.quant_type,
                    compress_statistics=self.compress_statistics,
                )}
            packed, qs = F.quantize_4bit(
                w.astype(self.quant_dtype),
                blocksize=self.blocksize,
                compress_statistics=self.compress_statistics,
                quant_type=self.quant_type,
            )
            return {"packed": packed, "quant_state": qs}

        qvar = self.variable("quants", "weight", init_fn, self.make_rng("params") if self.is_initializing() else None)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.compute_dtype)
            if self.use_bias
            else None
        )
        x = x.astype(self.compute_dtype)
        orig_shape = x.shape
        x2 = x.reshape(-1, in_features)
        if "qweight" in qvar.value:
            from ..autograd import matmul_4bit_kernel

            out = matmul_4bit_kernel(x2, qvar.value["qweight"], bias)
        else:
            out = _matmul_4bit(x2, qvar.value["packed"], qvar.value["quant_state"], bias)
        return out.reshape(*orig_shape[:-1], self.features)


class LinearNF4(Linear4bit):
    """(reference nn/modules.py:516)"""

    quant_type: str = "nf4"


class LinearFP4(Linear4bit):
    """(reference nn/modules.py:480)"""

    quant_type: str = "fp4"


class Linear8bitLt(nn.Module):
    """LLM.int8() linear layer (reference nn/modules.py:657-821).

    has_fp16_weights=True  -> trainable weight in "params"; the forward
        quantizes it on the fly (int8 surrogate) and gradients flow to it.
    has_fp16_weights=False -> frozen int8 weight CB + per-row scale SCB in
        "quants" (inference / memory-saving mode).

    Kernel dispatch note: threshold > 0 WITHOUT `outlier_idx` runs the
    dynamic per-call outlier path, which is XLA-only by measurement
    (functional.llm_int8_matmul: feeding top_k-dependent gathers into the
    fused Pallas kernel breaks its pipeline, 92us vs 37us pure-XLA at
    4096^2 M=8). To get the fused kernel with outlier decomposition, set
    `outlier_idx` (static column set, e.g. from utils.find_outlier_dims)
    — measured 29us vs the 48us bf16 matmul.
    """

    features: int
    use_bias: bool = True
    has_fp16_weights: bool = False
    threshold: float = 6.0
    compute_dtype: Any = jnp.bfloat16
    kernel_init: Callable = default_kernel_init
    # static outlier column indices (tuple of ints). When set, the layer
    # precomputes the outlier sidecar state once (the reference caches the
    # equivalent MatmulLtState.idx/subB after the first batch,
    # autograd/_functions.py:368-384) — measured 3x faster than per-call
    # outlier detection on TPU.
    outlier_idx: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.compute_dtype)
            if self.use_bias
            else None
        )
        x = x.astype(self.compute_dtype)
        orig_shape = x.shape
        x2 = x.reshape(-1, in_features)

        if self.has_fp16_weights:
            W = self.param(
                "weight", self.kernel_init, (self.features, in_features), self.compute_dtype
            )
            out = matmul_8bit_train(x2, W, self.threshold, bias)
        else:

            def init_fn(rng):
                w = self.kernel_init(rng, (self.features, in_features), jnp.float32)
                CB, SCB = F.int8_vectorwise_quant(w)
                q = {"CB": CB, "SCB": SCB}
                if self.outlier_idx is not None:
                    idx = jnp.asarray(self.outlier_idx, jnp.int32)
                    q["outliers"] = F.llm_int8_prepare_outliers(CB, SCB, idx)
                return q

            qvar = self.variable(
                "quants",
                "weight",
                init_fn,
                self.make_rng("params") if self.is_initializing() else None,
            )
            out = matmul_8bit_lt(
                x2,
                qvar.value["CB"],
                qvar.value["SCB"],
                self.threshold,
                bias,
                qvar.value.get("outliers"),
            )
        return out.reshape(*orig_shape[:-1], self.features)


class Embedding(nn.Module):
    """Plain embedding, kept for API parity (reference nn/modules.py:133)."""

    num_embeddings: int
    features: int
    dtype: Any = jnp.float32
    embedding_init: Callable = nn.initializers.normal(stddev=1.0)

    @nn.compact
    def __call__(self, ids):
        emb = self.param(
            "embedding", self.embedding_init, (self.num_embeddings, self.features), self.dtype
        )
        return jnp.take(emb, ids, axis=0)


class StableEmbedding(nn.Module):
    """Embedding + LayerNorm with xavier init; the companion optimizer
    override forces 32-bit optimizer states for this table
    (reference nn/modules.py:27-130, GlobalOptimManager usage :98).
    In this framework the override is expressed with
    optim.with_overrides / optim.stable_embedding_labels.
    """

    num_embeddings: int
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids):
        emb = self.param(
            "embedding",
            nn.initializers.xavier_uniform(),
            (self.num_embeddings, self.features),
            jnp.float32,  # reference keeps the table fp32 through the LN
        )
        out = jnp.take(emb, ids, axis=0)
        out = nn.LayerNorm(dtype=jnp.float32, name="norm")(out)
        return out.astype(self.dtype)


class OutlierAwareLinear(nn.Module):
    """Linear whose weight is int8-quantized EXCEPT the outlier input
    dims, which stay in compute precision.

    The reference class is abstract (nn/modules.py:824-848: forward
    resolves outlier dims via OutlierTracer and delegates to overridable
    quantize_weight / forward_with_outliers); the tracer's detection rule
    is utils.find_outlier_dims — the z-score of the per-dim std
    (utils.py:84-104, zscore=4.0 default). This is the concrete TPU
    subclass: same detection rule expressed as a jit-compatible mask,
    int8 row-wise weight quantization on the non-outlier columns, and an
    exact fp sidecar over the outlier columns.
    """

    features: int
    use_bias: bool = True
    zscore: float = 4.0  # find_outlier_dims default (utils.py:84)
    compute_dtype: Any = jnp.bfloat16
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        W = self.param("weight", self.kernel_init, (self.features, in_features), jnp.float32)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.compute_dtype)
            if self.use_bias
            else None
        )
        # find_outlier_dims rule (utils.py:94-101), as a static-shape mask:
        # z-score of the per-input-dim std over output rows
        std = jnp.std(W, axis=0)
        zstd = (std - jnp.mean(std)) * _safe_inv_scalar(jnp.std(std))
        outlier = zstd > self.zscore  # (in_features,) bool
        keep = (~outlier).astype(jnp.float32)

        # int8 row-wise quantization of the non-outlier part
        CB, SCB = F.int8_vectorwise_quant(W * keep[None, :])
        Wq = (CB.astype(jnp.float32) * (SCB[:, None] / 127.0)).astype(self.compute_dtype)

        x2 = x.reshape(-1, in_features).astype(self.compute_dtype)
        out = jnp.matmul(x2, Wq.T, preferred_element_type=jnp.float32).astype(
            self.compute_dtype
        )
        # exact sidecar over outlier dims (forward_with_outliers contract)
        om = outlier.astype(self.compute_dtype)
        out = out + jnp.matmul(
            x2 * om[None, :], (W.astype(self.compute_dtype) * om[None, :]).T,
            preferred_element_type=jnp.float32,
        ).astype(self.compute_dtype)
        if bias is not None:
            out = out + bias
        return out.reshape(*x.shape[:-1], self.features)


class SwitchBackLinearBnb(nn.Module):
    """Int8 forward with fp16 backward, SwitchBack style
    (reference nn/modules.py:851-884)."""

    features: int
    use_bias: bool = True
    threshold: float = 6.0
    compute_dtype: Any = jnp.bfloat16
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        W = self.param("weight", self.kernel_init, (self.features, in_features), self.compute_dtype)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.compute_dtype)
            if self.use_bias
            else None
        )
        x2 = x.reshape(-1, in_features).astype(self.compute_dtype)
        out = matmul_8bit_train(x2, W, self.threshold, bias)
        return out.reshape(*x.shape[:-1], self.features)


def quantize_linear_params(
    params,
    quant_type: str = "nf4",
    blocksize: int = 64,
    compress_statistics: bool = False,
    predicate: Optional[Callable[[tuple, jax.Array], bool]] = None,
):
    """Pure-pytree model surgery: replace every 2D "kernel"/"weight" leaf
    with its 4-bit quantized form — the functional analog of the
    reference's replace_linear (utils.py:124-166) + Params4bit device-move
    quantization.

    Returns (params_without_kernels, quants) where quants mirrors the tree
    with {"packed", "quant_state"} dicts.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    def default_pred(path, leaf):
        name = str(path[-1])
        return leaf.ndim == 2 and ("kernel" in name or "weight" in name)

    pred = predicate or default_pred
    new_leaves = []
    for path, leaf in flat:
        if hasattr(leaf, "ndim") and pred(path, leaf):
            packed, qs = F.quantize_4bit(
                leaf, blocksize=blocksize, compress_statistics=compress_statistics, quant_type=quant_type
            )
            new_leaves.append({"packed": packed, "quant_state": qs})
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
