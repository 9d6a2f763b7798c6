"""Optimizer families — full parity with the reference's optim package
(python_src_quants/optim/: adam.py, adamw.py, sgd.py, lamb.py, lion.py,
rmsprop.py, adagrad.py — all thin wrappers over Optimizer1State/2State),
expressed as optax GradientTransformations.

Every family ships {base, 8bit, 32bit, paged_*} constructors like the
reference; `paged_*` is a TPU no-op alias (see base.py docstring).
Unlike the reference's optim/__init__.py:1 (which exports only Adam —
a quality caveat SURVEY.md §2 flags), everything is exported here.
"""

from __future__ import annotations

from functools import partial as _partial

import optax as _optax

from .base import BnbOptimizerState, GlobalOptimManager, make_optimizer


def _family(name, default_betas=(0.9, 0.999), default_eps=1e-8, **fixed):
    def ctor(
        learning_rate=1e-3,
        betas=default_betas,
        eps=default_eps,
        weight_decay=0.0,
        optim_bits=32,
        min_8bit_size=4096,
        percentile_clipping=100,
        block_wise=True,
        is_paged=False,
        **kw,
    ):
        return make_optimizer(
            name,
            learning_rate=learning_rate,
            betas=betas,
            eps=eps,
            weight_decay=weight_decay,
            optim_bits=optim_bits,
            min_8bit_size=min_8bit_size,
            percentile_clipping=percentile_clipping,
            block_wise=block_wise,
            is_paged=is_paged,
            **{**fixed, **kw},
        )

    return ctor


# --- Adam family (reference optim/adam.py:16-213) --------------------------
adam = _family("adam")
adam8bit = _partial(adam, optim_bits=8)
adam32bit = _partial(adam, optim_bits=32)
paged_adam = _partial(adam, is_paged=True)
paged_adam8bit = _partial(adam, optim_bits=8, is_paged=True)
paged_adam32bit = _partial(adam, optim_bits=32, is_paged=True)

# --- AdamW: Adam with decoupled weight decay, default 1e-2
# (reference optim/adamw.py; the decay is decoupled in the shared Adam
# kernel, kernel_quant.cpp:1730-1733) ---------------------------------------
def adamw(learning_rate=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-2, **kw):
    return adam(learning_rate, betas, eps, weight_decay=weight_decay, **kw)


adamw8bit = _partial(adamw, optim_bits=8)
adamw32bit = _partial(adamw, optim_bits=32)
paged_adamw = _partial(adamw, is_paged=True)
paged_adamw8bit = _partial(adamw, optim_bits=8, is_paged=True)
paged_adamw32bit = _partial(adamw, optim_bits=32, is_paged=True)

# --- SGD w/ momentum (reference optim/sgd.py) -------------------------------
def sgd(learning_rate=1e-3, momentum=0.9, weight_decay=0.0, **kw):
    kw.setdefault("betas", (momentum, 0.0))
    return make_optimizer("momentum", learning_rate=learning_rate, weight_decay=weight_decay, **kw)


sgd8bit = _partial(sgd, optim_bits=8)
sgd32bit = _partial(sgd, optim_bits=32)
momentum = sgd

# --- LARS: momentum + per-layer trust-ratio clipping (reference
# str2optimizer32bit["lars"] -> the momentum kernel with max_unorm,
# functional.py:79; upstream bitsandbytes LARS defaults max_unorm=0.02
# and requires momentum > 0) -------------------------------------------------
def lars(learning_rate=1e-3, momentum=0.9, weight_decay=0.0, max_unorm=0.02, **kw):
    if momentum == 0:
        raise ValueError("LARS without momentum is not supported")
    kw.setdefault("betas", (momentum, 0.0))
    return make_optimizer(
        "momentum", learning_rate=learning_rate, weight_decay=weight_decay,
        max_unorm=max_unorm, **kw,
    )


lars8bit = _partial(lars, optim_bits=8)
lars32bit = _partial(lars, optim_bits=32)

# --- LAMB: Adam + trust-ratio clipping (reference optim/lamb.py uses
# Optimizer2State(..., max_unorm=1.0)) ---------------------------------------
def lamb(learning_rate=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, max_unorm=1.0, **kw):
    return make_optimizer(
        "lamb", learning_rate=learning_rate, betas=betas, eps=eps,
        weight_decay=weight_decay, max_unorm=max_unorm, **kw,
    )


lamb8bit = _partial(lamb, optim_bits=8)
lamb32bit = _partial(lamb, optim_bits=32)

# --- Lion (reference optim/lion.py; kernel math kernel_quant.cpp:1972-1975) -
lion = _family("lion", default_betas=(0.9, 0.99))
lion8bit = _partial(lion, optim_bits=8)
lion32bit = _partial(lion, optim_bits=32)
paged_lion = _partial(lion, is_paged=True)
paged_lion8bit = _partial(lion, optim_bits=8, is_paged=True)
paged_lion32bit = _partial(lion, optim_bits=32, is_paged=True)

# --- RMSprop (reference optim/rmsprop.py) -----------------------------------
def rmsprop(learning_rate=1e-2, alpha=0.99, eps=1e-8, weight_decay=0.0, **kw):
    kw.setdefault("betas", (alpha, 0.0))
    return make_optimizer("rmsprop", learning_rate=learning_rate, eps=eps, weight_decay=weight_decay, **kw)


rmsprop8bit = _partial(rmsprop, optim_bits=8)
rmsprop32bit = _partial(rmsprop, optim_bits=32)

# --- Adagrad (reference optim/adagrad.py) -----------------------------------
def adagrad(learning_rate=1e-2, eps=1e-10, weight_decay=0.0, **kw):
    kw.setdefault("betas", (0.0, 0.0))
    return make_optimizer("adagrad", learning_rate=learning_rate, eps=eps, weight_decay=weight_decay, **kw)


adagrad8bit = _partial(adagrad, optim_bits=8)
adagrad32bit = _partial(adagrad, optim_bits=32)

# torch-style class-name aliases for drop-in discoverability
Adam, Adam8bit, Adam32bit = adam, adam8bit, adam32bit
PagedAdam, PagedAdam8bit, PagedAdam32bit = paged_adam, paged_adam8bit, paged_adam32bit
AdamW, AdamW8bit, AdamW32bit = adamw, adamw8bit, adamw32bit
PagedAdamW, PagedAdamW8bit, PagedAdamW32bit = paged_adamw, paged_adamw8bit, paged_adamw32bit
SGD, SGD8bit, SGD32bit = sgd, sgd8bit, sgd32bit
LARS, LARS8bit, LARS32bit = lars, lars8bit, lars32bit
LAMB, LAMB8bit, LAMB32bit = lamb, lamb8bit, lamb32bit
Lion, Lion8bit, Lion32bit = lion, lion8bit, lion32bit
PagedLion, PagedLion8bit, PagedLion32bit = paged_lion, paged_lion8bit, paged_lion32bit
RMSprop, RMSprop8bit, RMSprop32bit = rmsprop, rmsprop8bit, rmsprop32bit
Adagrad, Adagrad8bit, Adagrad32bit = adagrad, adagrad8bit, adagrad32bit

__all__ = [
    "BnbOptimizerState", "GlobalOptimManager", "make_optimizer",
    "adam", "adam8bit", "adam32bit", "paged_adam", "paged_adam8bit", "paged_adam32bit",
    "adamw", "adamw8bit", "adamw32bit", "paged_adamw", "paged_adamw8bit", "paged_adamw32bit",
    "sgd", "sgd8bit", "sgd32bit", "momentum",
    "lars", "lars8bit", "lars32bit",
    "lamb", "lamb8bit", "lamb32bit",
    "lion", "lion8bit", "lion32bit", "paged_lion", "paged_lion8bit", "paged_lion32bit",
    "rmsprop", "rmsprop8bit", "rmsprop32bit",
    "adagrad", "adagrad8bit", "adagrad32bit",
]

# --- AnalysisAdam: quantization-error diagnostic (reference optim/adam.py:214) 
from .analysis import AnalysisAdamState, analysis_adam  # noqa: E402,F401
