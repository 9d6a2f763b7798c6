#!/usr/bin/env python
"""Headline benchmark: fused NF4 dequant-matmul decode throughput relative
to the bf16 matmul roofline on one chip (BASELINE.md target: >=90% of
fp16-matmul-roofline tokens/s for 4-bit decode).

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = bf16_matmul_time / nf4_decode_time for a 4096x4096 decode
               step at batch 8 (i.e. NF4 tokens/s as a fraction of the
               fp16-roofline tokens/s; 1.0 = parity, 3.56 = ideal 4-bit),
               for the FASTEST NF4 serving path: round 2's W4A8 kernel
               (int8 activations on the int8 MXU, ops/matmul_w4a8.py).
               The exact-decode (bf16 activations) path is reported in
               the extra "exact_path" field — it is VPU-bound at ~0.65x
               (docs/PERFORMANCE.md).
vs_baseline  = value / 0.90 (the north-star threshold).

Methodology (CLAUDE.md "Measuring on the axon TPU"):
- np.asarray on the output forces completion (block_until_ready is a
  no-op on the axon backend — the round-1 bench failure).
- Large arrays go through jit ARGUMENTS (captured constants serialize
  into the remote Mosaic compile request: HTTP 413).
- The weight is made loop-variant (absmax * (1 + 1e-30*i)) so XLA cannot
  hoist the dequant out of the timing loop; every output element is
  consumed via jnp.mean into the carry so nothing is DCE'd.
- The tunnel adds ~25-35 ms/dispatch: time as min-over-reps of
  (t(hi_iters) - t(lo_iters)) / (hi - lo), chained inside one jit.
- The whole run retries with backoff on transient TPU errors
  (FAILED_PRECONDITION when another process briefly held the chip), and
  degrades to a smaller shape rather than exiting non-zero.
- Each attempt runs in a SUBPROCESS with a hard timeout: the axon tunnel
  has been observed to HANG (not error) mid-dispatch, and a blocked C
  call cannot be interrupted in-process. The parent owns the JSON line.
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

M = 8  # decode batch


def _child(n: int) -> int:
    """Measure one shape and print the speed ratio; runs in a subprocess."""
    import timeit

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp
    import numpy as np

    from bitsandbytes_sycl_tpu.ops import (
        matmul_4bit_fused, matmul_4bit_w4a8, quantize_4bit_native,
    )

    def _measure(op, x, *arrs, lo=200, hi=1200, reps=4):
        def runner(iters):
            @jax.jit
            def rr(x, *arrs):
                def body(i, x):
                    return x + jnp.mean(op(x, i, *arrs)).astype(x.dtype) * 1e-6

                return jax.lax.fori_loop(0, iters, body, x)

            np.asarray(rr(x, *arrs))  # warm compile + force completion
            return min(
                timeit.timeit(lambda: np.asarray(rr(x, *arrs)), number=1)
                for _ in range(reps)
            )

        return (runner(hi) - runner(lo)) / (hi - lo)

    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(n, n)) * 0.02, jnp.float32)
    qw = quantize_4bit_native(W, blocksize=64, quant_type="nf4")
    Wb = W.astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(M, n)), jnp.bfloat16)

    t_bf16 = _measure(lambda x, i, w: x @ ((1.0 + 1e-30 * i) * w.T), x, Wb)
    t_nf4 = _measure(
        lambda x, i, pk, am: matmul_4bit_fused(
            x, dataclasses.replace(qw, packed=pk, absmax=am * (1.0 + 1e-30 * i))
        ),
        x, qw.packed, qw.absmax,
    )
    t_w4a8 = _measure(
        lambda x, i, pk, am: matmul_4bit_w4a8(
            x, dataclasses.replace(qw, packed=pk, absmax=am * (1.0 + 1e-30 * i))
        ),
        x, qw.packed, qw.absmax,
    )
    print(f"RATIO {t_bf16 / t_w4a8:.6f} EXACT {t_bf16 / t_nf4:.6f}", flush=True)
    return 0

def _attempt(n: int, timeout_s: int):
    """One subprocess attempt; returns (ratio or None, error string)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # child must see the TPU
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            capture_output=True, text=True, timeout=timeout_s, env=env,
        )
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout_s}s (tunnel hang)"
    for line in res.stdout.splitlines():
        if line.startswith("RATIO "):
            parts = line.split()
            return (float(parts[1]), float(parts[3])), ""
    tail = (res.stderr or "").strip().splitlines()
    return None, (tail[-1][:200] if tail else f"rc={res.returncode}, no output")


def main():
    last_err = "unknown"
    # (shape, attempts, per-attempt timeout): full shape first, degraded
    # shapes as fallbacks so a transient failure still yields a valid line.
    # 60 s backoff between failures: FAILED_PRECONDITION states have been
    # observed to persist for minutes before the backend resets.
    plan = ((4096, 2, 420), (2048, 2, 300), (1024, 1, 240))
    for n, attempts, timeout_s in plan:
        for a in range(attempts):
            value, err = _attempt(n, timeout_s)
            if value is not None:
                w4a8, exact = value
                rec = {
                    "metric": f"nf4_fused_decode_speed_vs_bf16_matmul_{n}",
                    "value": round(w4a8, 4),
                    "unit": "x (1.0=bf16 parity, 3.56=ideal 4-bit; W4A8 path)",
                    "vs_baseline": round(w4a8 / 0.90, 4),
                    "exact_path": round(exact, 4),
                }
                if n != 4096:
                    rec["degraded_from"] = 4096
                print(json.dumps(rec), flush=True)
                return 0
            last_err = err
            print(f"attempt n={n} #{a} failed: {err}", file=sys.stderr, flush=True)
            if (n, a) != (plan[-1][0], plan[-1][1] - 1):
                time.sleep(60)
    # never exit non-zero with no JSON: emit a sentinel record
    print(
        json.dumps(
            {
                "metric": "nf4_fused_decode_speed_vs_bf16_matmul_4096",
                "value": 0.0,
                "unit": "x (benchmark failed; see stderr)",
                "vs_baseline": 0.0,
                "error": last_err[:200],
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        sys.exit(_child(int(sys.argv[2])))
    sys.exit(main())
