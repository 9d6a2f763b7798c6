"""Numerical-safety utilities — the functional replacement for the
reference's (nonexistent) sanitizer story (SURVEY.md §5: correctness
there rests on SYCL barriers; host launchers std::exit(1) on error).

Under XLA's functional semantics there are no data races to detect; what
CAN go wrong is numerical: NaN/Inf gradients, quantization codes out of
range, absmax collapse. These helpers wrap jitted functions with
`jax.experimental.checkify` so such conditions surface as errors with
locations instead of silently propagating.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify

__all__ = ["nan_guard", "check_quant_state", "checked"]


def checked(fn: Callable, errors=checkify.float_checks) -> Callable:
    """Wrap a jittable function so float errors (NaN/Inf produced anywhere
    inside) raise with a traceback instead of propagating. Adds the cost
    of error tracking — a debug tool, not a production default."""

    cfn = checkify.checkify(fn, errors=errors)

    @functools.wraps(fn)
    def run(*args, **kw):
        err, out = cfn(*args, **kw)
        checkify.check_error(err)
        return out

    return run


def nan_guard(tree, name: str = "tree"):
    """checkify.check that every float leaf of a pytree is finite; call
    inside a checked/checkify'd function."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if jnp.issubdtype(jnp.result_type(leaf), jnp.inexact):
            checkify.check(
                jnp.all(jnp.isfinite(leaf)),
                f"non-finite values in {name}{jax.tree_util.keystr(path)}",
            )


def check_quant_state(packed, quant_state, name: str = "weight"):
    """Invariants of a quantized tensor: absmax finite and non-negative
    (an all-zero absmax block silently zeroes its weights)."""
    am = quant_state.dequant_absmax() if hasattr(quant_state, "dequant_absmax") else quant_state
    checkify.check(jnp.all(jnp.isfinite(am)), f"{name}: non-finite absmax")
    checkify.check(jnp.all(am >= 0), f"{name}: negative absmax")
