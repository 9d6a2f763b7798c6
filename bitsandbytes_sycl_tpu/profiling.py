"""Tracing, benchmarking, and roofline reporting.

The reference has NO profiling subsystem — only debug prints in hot paths
and a commented-out wall-clock bench (SURVEY.md §5, §6). This module is
the observability layer the BASELINE metrics require ("% of MXU
roofline", tokens/s/chip).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import logging
import timeit
from typing import Callable, Dict, Optional

import jax
import numpy as np
import jax.numpy as jnp

logger = logging.getLogger("bitsandbytes_sycl_tpu")

__all__ = ["trace", "device_time", "roofline_report", "ChipSpec", "CHIP_SPECS", "log_metrics"]


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float  # HBM bandwidth GB/s
    bf16_tflops: float  # MXU bf16 peak
    int8_tops: float  # MXU int8 peak
    vmem_mb: float = 128.0


CHIP_SPECS = {
    "TPU v5 lite": ChipSpec("v5e", hbm_gbps=819.0, bf16_tflops=197.0, int8_tops=394.0),
    "TPU v5e": ChipSpec("v5e", hbm_gbps=819.0, bf16_tflops=197.0, int8_tops=394.0),
    "TPU v4": ChipSpec("v4", hbm_gbps=1228.0, bf16_tflops=275.0, int8_tops=275.0),
    "TPU v5p": ChipSpec("v5p", hbm_gbps=2765.0, bf16_tflops=459.0, int8_tops=918.0),
    "TPU v6e": ChipSpec("v6e", hbm_gbps=1640.0, bf16_tflops=918.0, int8_tops=1836.0),
    "cpu": ChipSpec("cpu", hbm_gbps=50.0, bf16_tflops=1.0, int8_tops=2.0),
}


def current_chip() -> ChipSpec:
    kind = jax.devices()[0].device_kind
    for key, spec in CHIP_SPECS.items():
        if key.lower() in kind.lower():
            return spec
    return CHIP_SPECS["cpu"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/bnb_tpu_trace"):
    """jax.profiler trace context — view with TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_time(
    op: Callable,
    *args,
    lo_iters: int = 50,
    hi_iters: int = 350,
    reps: int = 5,
) -> float:
    """Robust per-call device time: chain `op` inside one jitted
    lax.fori_loop at two iteration counts and difference them — immune to
    dispatch overhead and (via min-of-reps) to shared-machine noise.
    `op` must map its first arg to a same-shaped output or a value the
    chain can fold back (we fold via the first arg)."""
    x0 = args[0]

    def runner(iters):
        @jax.jit
        def rr(x):
            def body(_, x):
                y = op(x, *args[1:])
                # fold any output back into the carried value
                folded = jnp.real(jnp.sum(y)).astype(x.dtype) * 1e-12
                return x + folded

            out = jax.lax.fori_loop(0, iters, body, x)
            # fold to a scalar so forcing completion moves 4 bytes, not
            # the whole array, over the tunnel
            return jnp.sum(out).astype(jnp.float32)

        # np.asarray forces completion; block_until_ready is a NO-OP on
        # the axon backend (CLAUDE.md measurement pitfalls)
        np.asarray(rr(x0))
        return min(
            timeit.timeit(lambda: np.asarray(rr(x0)), number=1)
            for _ in range(reps)
        )

    return (runner(hi_iters) - runner(lo_iters)) / (hi_iters - lo_iters)


def roofline_report(
    name: str,
    op: Callable,
    *args,
    flops: float = 0.0,
    bytes_accessed: float = 0.0,
    chip: Optional[ChipSpec] = None,
    **kw,
) -> Dict[str, float]:
    """Measure an op and report achieved TFLOPs / GB/s as fractions of the
    chip's roofline — the report the BASELINE "% of MXU roofline" metric
    asks for."""
    chip = chip or current_chip()
    t = device_time(op, *args, **kw)
    out = {
        "name": name,
        "chip": chip.name,
        "time_us": t * 1e6,
        "achieved_tflops": flops / t / 1e12 if flops else 0.0,
        "achieved_gbps": bytes_accessed / t / 1e9 if bytes_accessed else 0.0,
        "frac_mxu_roofline": (flops / t / 1e12) / chip.bf16_tflops if flops else 0.0,
        "frac_hbm_roofline": (bytes_accessed / t / 1e9) / chip.hbm_gbps if bytes_accessed else 0.0,
    }
    logger.info("roofline %s", json.dumps({k: round(v, 4) if isinstance(v, float) else v for k, v in out.items()}))
    return out


def log_metrics(step: int, **metrics) -> None:
    """Structured per-step metric logging (tokens/s/chip, scaling
    efficiency, loss, ...)."""
    logger.info(json.dumps({"step": step, **{k: float(v) for k, v in metrics.items()}}))
