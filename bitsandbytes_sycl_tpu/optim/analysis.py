"""AnalysisAdam — quantization-error diagnostic optimizer.

TPU-native equivalent of the reference's `AnalysisAdam`
(python_src_quants/optim/adam.py:214-579, duplicated in
optimizer_test.py): runs exact fp32 Adam, additionally simulates 8-bit
quantization of the Adam update, applies the QUANTIZED update, and
accumulates absolute/relative error statistics against the fp32 update.

Differences from the reference (deliberate, jit-friendly):
- stats are scalars accumulated in the optimizer state pytree (the
  reference scatters into 256x256 histogram tensors and writes them to
  `savedir` from inside step() — host I/O inside the hot loop);
- rank-0 torch.distributed guards (optimizer_test.py:565) are
  unnecessary: metrics live in a replicated pytree.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .. import functional as F

__all__ = ["analysis_adam", "AnalysisAdamState"]


class AnalysisAdamState(NamedTuple):
    count: jax.Array
    inner: Any  # per-leaf dict: exp_avg, exp_avg_sq, abserr, relerr, counts


def _quantize_update(u: jax.Array, analysis: str) -> jax.Array:
    """8-bit quantize/dequantize round-trip of the update tensor, by the
    reference's analysis modes (optim/adam.py:304-347)."""
    if analysis == "dynamic-blockwise":
        q, qs = F.quantize_blockwise(u, blocksize=2048)
        return F.dequantize_blockwise(q, qs)
    if analysis == "linear":
        q, qs = F.quantize_blockwise(u, blocksize=u.size, quant_type="linear")
        return F.dequantize_blockwise(q, qs)
    if analysis == "quantile":
        code = F.estimate_quantiles(u)
        q, qs = F.quantize_blockwise(u, code=code, blocksize=u.size)
        return F.dequantize_blockwise(q, qs)
    raise ValueError(f"unknown analysis {analysis!r}")


def analysis_adam(
    learning_rate: float = 1e-3,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    analysis: str = "dynamic-blockwise",
) -> optax.GradientTransformation:
    b1, b2 = betas

    def init_fn(params):
        def leaf(p):
            return {
                "exp_avg": jnp.zeros_like(p, jnp.float32),
                "exp_avg_sq": jnp.zeros_like(p, jnp.float32),
                "abserr": jnp.zeros((), jnp.float32),
                "relerr": jnp.zeros((), jnp.float32),
                "counts": jnp.zeros((), jnp.int32),
            }

        return AnalysisAdamState(jnp.zeros((), jnp.int32), jax.tree.map(leaf, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("analysis_adam is fused: pass params to update()")
        count = state.count + 1
        c1 = 1.0 - b1**count
        c2 = 1.0 - b2**count

        def leaf(g, p, s):
            gf = g.astype(jnp.float32)
            m = s["exp_avg"] * b1 + (1.0 - b1) * gf
            v = s["exp_avg_sq"] * b2 + (1.0 - b2) * gf * gf
            step_size = learning_rate / c1
            denom = jnp.sqrt(v / c2) + eps
            u = -step_size * (m / denom)  # exact fp32 Adam update
            uq = _quantize_update(u, analysis)  # 8-bit round-trip
            err = jnp.abs(uq - u)
            rel = err / (jnp.abs(u) + 1e-15)
            upd = uq
            if weight_decay > 0.0:
                upd = upd - learning_rate * weight_decay * p.astype(jnp.float32)
            return upd.astype(p.dtype), {
                "exp_avg": m,
                "exp_avg_sq": v,
                "abserr": s["abserr"] + jnp.sum(err),
                "relerr": s["relerr"] + jnp.sum(rel),
                "counts": s["counts"] + u.size,
            }

        g_leaves, treedef = jax.tree_util.tree_flatten(updates)
        p_leaves = treedef.flatten_up_to(params)
        s_leaves = treedef.flatten_up_to(state.inner)
        outs = [leaf(g, p, s) for g, p, s in zip(g_leaves, p_leaves, s_leaves)]
        new_updates = treedef.unflatten([o[0] for o in outs])
        new_inner = treedef.unflatten([o[1] for o in outs])
        return new_updates, AnalysisAdamState(count, new_inner)

    return optax.GradientTransformation(init_fn, update_fn)
