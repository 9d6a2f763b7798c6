"""Optax-style 8-bit / 32-bit blockwise optimizers.

TPU-native redesign of the reference optimizer stack
(python_src_quants/optim/optimizer.py): instead of a torch.optim.Optimizer
that mutates paged uint8 buffers through ctypes (Optimizer2State.update_step,
optim/optimizer.py:481-570) with a device synchronize after every parameter
(optim/optimizer.py:288-291 — a perf bug SURVEY.md §3.3 flags), each
optimizer is an `optax.GradientTransformation`: the whole step over all
parameters is ONE jitted computation, optimizer states are uint8+absmax
pytrees (shardable, checkpointable with orbax), and the quantize/decode
math is the fused functional kernel.

`is_paged` is accepted for API parity and ignored: CUDA unified-memory
paging (reference functional.py:111-245) has no TPU analog — HBM
oversubscription is handled by XLA/orbax instead.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import codebooks
from .. import functional as F
from ..types import blocks_for

__all__ = ["BnbOptimizerState", "make_optimizer", "GlobalOptimManager"]


class BnbOptimizerState(NamedTuple):
    count: jax.Array  # int32 step counter
    inner: Any  # per-leaf state pytree


_QMAP1 = codebooks.create_dynamic_map(signed=True)  # state1 (signed moments)
_QMAP2 = codebooks.create_dynamic_map(signed=False)  # state2 (nonneg 2nd moment)

_2STATE = ("adam", "lamb")


def _leaf_is_8bit(p, optim_bits: int, min_8bit_size: int) -> bool:
    """bnb keeps small tensors in 32-bit regardless (optim/optimizer.py:429-479)."""
    return optim_bits == 8 and p.size >= min_8bit_size


def _init_leaf(p, name, optim_bits, min_8bit_size, blocksize, percentile_clipping):
    n = p.size
    two_state = name in _2STATE
    leaf: dict = {}
    if _leaf_is_8bit(p, optim_bits, min_8bit_size):
        nb = blocks_for(n, blocksize)
        leaf["state1"] = jnp.zeros(p.shape, jnp.uint8)
        leaf["absmax1"] = jnp.zeros((nb,), jnp.float32)
        if two_state:
            leaf["state2"] = jnp.zeros(p.shape, jnp.uint8)
            leaf["absmax2"] = jnp.zeros((nb,), jnp.float32)
    else:
        leaf["state1"] = jnp.zeros(p.shape, jnp.float32)
        if two_state:
            leaf["state2"] = jnp.zeros(p.shape, jnp.float32)
    if percentile_clipping < 100:
        leaf["gnorm_vec"] = jnp.zeros((100,), jnp.float32)
    return leaf


def make_optimizer(
    name: str,
    learning_rate: float | Callable = 1e-3,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    optim_bits: int = 32,
    min_8bit_size: int = 4096,
    percentile_clipping: int = 100,
    block_wise: bool = True,
    max_unorm: float = 0.0,
    is_paged: bool = False,
    mesh=None,
    shard_axis: str = "data",
    stochastic_rounding: bool = False,
) -> optax.GradientTransformation:
    """Build a bnb-family optimizer as an optax GradientTransformation.

    `name` in {"adam", "lamb", "momentum", "lion", "rmsprop", "adagrad"}.
    Update math matches the reference kernels exactly
    (kernel_quant.cpp:1500-2032 for 32-bit, :2715-3213 for 8-bit blockwise).
    block_wise=False uses one block spanning the whole tensor — dynamic
    re-quantization each step, the TPU-friendly equivalent of the
    reference's global-max "static" 8-bit path (kernel_quant.cpp:2034-2652).
    With `mesh` the 8-bit update runs under shard_map over `shard_axis`
    for dp-sharded states (a pallas_call under plain pjit would gather
    them); leaves whose dim0/blocks don't divide the axis fall back to
    the unsharded call. stochastic_rounding=True requantizes the 8-bit
    states with unbiased stochastic rounding (functional docstring).
    """
    if name not in _2STATE and name not in F.OPTIMIZER_FUNCS_1STATE:
        raise NotImplementedError(f"optimizer {name!r} not implemented")
    beta1, beta2 = betas
    del is_paged  # no-op on TPU, see module docstring

    def init_fn(params):
        inner = jax.tree_util.tree_map(
            lambda p: _init_leaf(
                p, name, optim_bits, min_8bit_size,
                _blocksize_for(p, block_wise), percentile_clipping,
            ),
            params,
        )
        return BnbOptimizerState(count=jnp.zeros((), jnp.int32), inner=inner)

    def _blocksize_for(p, bw: bool = block_wise) -> int:
        return 2048 if bw else max(int(p.size), 1)

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("bnb optimizers are fused: pass params to update()")
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        g_leaves, treedef = jax.tree_util.tree_flatten(updates)
        p_leaves = treedef.flatten_up_to(params)
        s_leaves = treedef.flatten_up_to(state.inner)

        new_updates, new_inner = [], []
        for g, p, s in zip(g_leaves, p_leaves, s_leaves):
            gnorm_scale = 1.0
            s_new = dict(s)
            if percentile_clipping < 100:
                gnorm = jnp.linalg.norm(g.astype(jnp.float32))
                s_new["gnorm_vec"], gnorm_scale = F.percentile_clipping(
                    gnorm, s["gnorm_vec"], count, percentile_clipping
                )
            if s["state1"].dtype == jnp.uint8:
                bs = _blocksize_for(p)
                kw = dict(
                    weight_decay=weight_decay, gnorm_scale=gnorm_scale,
                    blocksize=bs,
                    # _QMAP1/_QMAP2 ARE the dynamic maps: use the arithmetic
                    # gather-free codec (ops/dynamic8.py)
                    codec="dynamic",
                    stochastic_rounding=stochastic_rounding,
                )
                n = int(np.prod(p.shape))
                if (
                    mesh is not None
                    and p.shape[0] % mesh.shape[shard_axis] == 0
                    and (n // mesh.shape[shard_axis]) % bs == 0
                ):
                    out = F.optimizer_update_8bit_blockwise_sharded(
                        name, g, p,
                        s["state1"], s["absmax1"],
                        s.get("state2"), s.get("absmax2"),
                        _QMAP1, _QMAP2 if name in _2STATE else None,
                        beta1, beta2, eps, count, lr,
                        mesh=mesh, axis=shard_axis, **kw,
                    )
                else:
                    out = F.optimizer_update_8bit_blockwise(
                        name, g, p,
                        s["state1"], s["absmax1"],
                        s.get("state2"), s.get("absmax2"),
                        _QMAP1, _QMAP2 if name in _2STATE else None,
                        beta1, beta2, eps, count, lr, **kw,
                    )
                new_p, s_new["state1"], s_new["absmax1"], st2, am2 = out
                if name in _2STATE:
                    s_new["state2"], s_new["absmax2"] = st2, am2
            else:
                new_p, s1, s2 = F.optimizer_update_32bit(
                    name, g, p,
                    s["state1"], s.get("state2"),
                    beta1, beta2, eps, count, lr,
                    weight_decay=weight_decay, gnorm_scale=gnorm_scale,
                    # reference trust-ratio semantics live inside the
                    # update (raw lr-less norm vs max_unorm * ||p||)
                    max_unorm=max_unorm,
                )
                s_new["state1"] = s1
                if name in _2STATE:
                    s_new["state2"] = s2
            delta = (new_p.astype(jnp.float32) - p.astype(jnp.float32))
            if max_unorm > 0.0 and s["state1"].dtype == jnp.uint8:
                # the reference's 8-bit BLOCKWISE kernels carry no unorm
                # machinery (it exists only in the 32-bit and 8-bit-static
                # paths, kernel_quant.cpp:1506,2034) — approximate with a
                # post-hoc clip of the realized update so LAMB-with-8bit
                # still bounds its step
                unorm = jnp.linalg.norm(delta)
                pnorm = jnp.linalg.norm(p.astype(jnp.float32))
                # +eps floor so zero-norm params (zero-init adapters) move
                limit = (max_unorm * pnorm + eps) * lr
                delta = delta * jnp.where(
                    unorm > limit, limit / jnp.maximum(unorm, 1e-12), 1.0
                )
            new_updates.append(delta.astype(p.dtype))
            new_inner.append(s_new)

        return (
            jax.tree_util.tree_unflatten(treedef, new_updates),
            BnbOptimizerState(count=count, inner=jax.tree_util.tree_unflatten(treedef, new_inner)),
        )

    return optax.GradientTransformation(init_fn, update_fn)


class GlobalOptimManager:
    """Per-parameter optimizer-config overrides — functional analog of the
    reference registry (optim/optimizer.py:20-108) that StableEmbedding
    uses to force 32-bit states (nn/modules.py:98).

    Register predicates over parameter paths; `build` produces an
    optax.multi_transform routing each parameter to the right transform.
    """

    _instance: Optional["GlobalOptimManager"] = None

    def __init__(self):
        self.overrides: list[tuple[Callable[[str], bool], dict]] = []

    @classmethod
    def get_instance(cls) -> "GlobalOptimManager":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def register_module_override(self, match: str | Callable[[str], bool], **config):
        if isinstance(match, str):
            needle = match
            match = lambda path: needle in path  # noqa: E731
        self.overrides.append((match, config))

    def override_config(self, match, **config):
        self.register_module_override(match, **config)

    def build(self, name: str, params, **default_kwargs) -> optax.GradientTransformation:
        paths = {
            "/".join(str(getattr(k, "key", k)) for k in path): i
            for i, (path, _l) in enumerate(jax.tree_util.tree_flatten_with_path(params)[0])
        }
        label_of: dict[str, int] = {}
        txs = {0: make_optimizer(name, **default_kwargs)}
        for path in paths:
            label = 0
            for j, (pred, cfg) in enumerate(self.overrides, start=1):
                if pred(path):
                    label = j
                    if j not in txs:
                        txs[j] = make_optimizer(name, **{**default_kwargs, **cfg})
            label_of[path] = label

        def labeler(params):
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            labels = [
                label_of["/".join(str(getattr(k, "key", k)) for k in path)] for path, _ in flat
            ]
            return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(params), labels)

        return optax.multi_transform(txs, labeler)
