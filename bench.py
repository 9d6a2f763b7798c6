#!/usr/bin/env python
"""Headline benchmark: fused NF4 dequant-matmul decode throughput relative
to the bf16 matmul roofline on one chip (BASELINE.md target: >=90% of
fp16-matmul-roofline tokens/s for 4-bit decode).

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

value        = geometric mean over the three 7B projection shapes
               (4096x4096, 11008x4096, 4096x11008) of
               bf16_matmul_time / nf4_decode_time at decode batch M=8,
               for the FASTEST NF4 serving path (W4A8, ops/matmul_w4a8.py).
               1.0 = parity with the bf16 matmul, 3.56 = ideal 4-bit.
extra fields = per-shape ratios, the exact-decode path (bf16 activations,
               VPU-bound), int4, and the prefill ratios at M=2048/4096
               (the W8A8 dequant-once-to-int8 default route plus the r3
               bf16 HBM-dequant route as nf4_dq).
vs_baseline  = value / 0.90 (the north-star threshold).

Loss-proof harness (VERDICT r4 ask #1 — BENCH_r04 was rc=124 with no
number recorded; that must be impossible to repeat):
- The child measures one POINT (shape x path -> raw seconds) at a time
  and prints an incremental `POINT {...}` line the moment it completes.
- The parent STREAMS child stdout (Popen line reader, not
  capture-at-exit, so a kill loses nothing already printed), persists
  every completed point to /tmp/bench_points_v5.json immediately, and
  NEVER re-measures a persisted point — across child attempts and
  across whole bench runs (entries expire after 24 h; the scratch file
  is keyed by a methodology version that changes whenever measurement
  code changes).
- The parent tracks a total deadline (env BENCH_DEADLINE_S, default a
  conservative 1450 s) and ALWAYS emits its best partial JSON before it
  can be killed; "partial": true + "missing" list when incomplete.
- Compile-warming is separated from measuring per point: the persistent
  XLA compile cache (/tmp/jax_bench_cache) means a child killed mid-
  compile still banks the compile, so the next attempt's same point is
  warm (CLAUDE.md: warm runs are seconds, fresh fori_loop compiles on
  axon can take 5-10 min).

Methodology (CLAUDE.md "Measuring on the axon TPU"):
- np.asarray on a SCALAR output forces completion (block_until_ready is
  a no-op on axon; returning the full carry ships MBs through the tunnel
  and its ~100 ms jitter drowns the signal).
- consumption: every output element folds back into the carry via
  pad+reshape+sum segments — jnp.mean-style reduce consumption lets XLA
  algebraically collapse reduce(dot) and time UNDER the roofline.
- weights are loop-variant (absmax * (1 + 1e-30*i)) so dequant cannot
  hoist; large arrays go through jit arguments (captured constants 413
  the remote Mosaic compile).
- the tunnel adds ~25-35 ms/dispatch: time as min-over-reps of
  (t(hi_iters) - t(lo_iters)) / (hi - lo), chained inside one jit.
- the tunnel HANGS outright at times: every attempt runs in a child
  process killed on stall; the parent owns the JSON line and never
  exits non-zero.
"""

import json
import os
import select
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

M = 8  # decode batch

# bump when measurement code changes — invalidates persisted points
_METH_VERSION = "v5.0"
_SCRATCH = "/tmp/bench_points_v5.json"
_MAX_AGE_S = 24 * 3600

_DECODE_SHAPES = ("4096x4096", "11008x4096", "4096x11008")

# measurement points in priority order: the headline geomean first, the
# W8A8 prefill evidence second, secondary paths last
_POINTS = []
for _s in _DECODE_SHAPES:
    _POINTS += [f"{_s}:bf16", f"{_s}:w4a8"]
_POINTS += [
    "prefill_2048:bf16", "prefill_2048:grouped",
    "prefill_4096:bf16", "prefill_4096:w8a8",
    "prefill_1024:bf16", "prefill_1024:grouped",
]
for _s in _DECODE_SHAPES:
    _POINTS += [f"{_s}:exact", f"{_s}:int4"]
_POINTS += ["prefill_2048:w8a8", "prefill_2048:nf4_dq"]


# ---------------------------------------------------------------------------
# child: measure the requested points, print `POINT {...}` after each
# ---------------------------------------------------------------------------


def _child(points_arg: str) -> int:
    import dataclasses
    import timeit

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp
    import numpy as np

    from bitsandbytes_sycl_tpu.ops import (
        matmul_4bit_fused, matmul_4bit_w4a8, matmul_4bit_w4a8_grouped,
        matmul_4bit_w8a8_prefill, quantize_4bit_native,
    )

    def _fold(y, K):
        """Consume EVERY element of y into a (M, K) update (pad+segment-sum;
        not a reduce XLA can fuse into the producing dot)."""
        N = y.shape[1]
        c = -(-N // K)
        yp = jnp.pad(y, ((0, 0), (0, c * K - N))) if c * K != N else y
        return yp.reshape(y.shape[0], c, K).sum(axis=1)

    def measure(op, x, *arrs, lo=100, hi=600, reps=6):
        K = x.shape[1]

        def runner(iters):
            @jax.jit
            def rr(x, *arrs):
                def body(i, x):
                    return x + _fold(op(x, i, *arrs).astype(jnp.float32), K).astype(x.dtype) * 1e-4

                return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32))

            np.asarray(rr(x, *arrs))  # warm compile + force completion
            return min(
                timeit.timeit(lambda: np.asarray(rr(x, *arrs)), number=1)
                for _ in range(reps)
            )

        return (runner(hi) - runner(lo)) / (hi - lo)

    import threading

    hb_stop = threading.Event()

    def _heartbeat():
        # lets the parent tell "long healthy compile / slow cold init"
        # from "dead child"; the parent still enforces per-point and
        # probe ceilings because a hung DISPATCH leaves this thread
        # running
        t0 = time.time()
        while not hb_stop.wait(45.0):
            print(f"HB {time.time() - t0:.0f}s", flush=True)

    threading.Thread(target=_heartbeat, daemon=True).start()

    # probe: catch a wedged tunnel cheaply before long compiles
    a = jnp.ones((128, 128), jnp.bfloat16)
    np.asarray(a @ a)
    print("PROBE ok", flush=True)

    cache = {}

    def shape_arrays(n, k, m):
        # inputs generated ON DEVICE: host->device of big numpy arrays
        # runs ~1 MB/s effective over the tunnel (CLAUDE.md)
        key = (n, k, m)
        if key not in cache:
            kw, kx = jax.random.split(jax.random.PRNGKey(n * 7 + k * 3 + m))
            W = jax.random.normal(kw, (n, k), jnp.float32) * 0.02
            qw = quantize_4bit_native(W, blocksize=64, quant_type="nf4")
            qw4 = quantize_4bit_native(W, blocksize=64, quant_type="int4")
            x = jax.random.normal(kx, (m, k), jnp.bfloat16)
            cache[key] = (W.astype(jnp.bfloat16), qw, qw4, x)
        return cache[key]

    def qvar(op, q):
        return lambda x, i, pk, am: op(
            x, dataclasses.replace(q, packed=pk, absmax=am * (1.0 + 1e-30 * i))
        )

    def run_point(key: str) -> float:
        shape, path = key.split(":")
        if shape.startswith("prefill"):
            m = int(shape.split("_")[1])
            n = k = 4096
            lo, hi = {1024: (60, 260), 2048: (30, 130)}.get(m, (15, 60))
        else:
            n, k = (int(v) for v in shape.split("x"))
            m = M
            lo, hi = 100, 600
        Wb, qw, qw4, x = shape_arrays(n, k, m)
        if path == "bf16":
            return measure(lambda x, i, w: x @ ((1.0 + 1e-30 * i) * w.T), x, Wb, lo=lo, hi=hi)
        op = {
            "w4a8": matmul_4bit_w4a8,
            "exact": matmul_4bit_fused,
            "nf4_dq": matmul_4bit_fused,
            "w8a8": matmul_4bit_w8a8_prefill,
            "grouped": matmul_4bit_w4a8_grouped,
        }.get(path)
        q = qw4 if path == "int4" else qw
        if path == "int4":
            op = matmul_4bit_fused
        return measure(qvar(op, q), x, q.packed, q.absmax, lo=lo, hi=hi)

    for key in points_arg.split(","):
        if not key:
            continue
        print(f"START {key}", flush=True)
        try:
            t0 = time.time()
            secs = run_point(key)
            print(
                "POINT " + json.dumps({"key": key, "seconds": secs,
                                       "wall": round(time.time() - t0, 1)}),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — report, keep going
            print(f"POINTFAIL {key}: {str(e)[:160]}", flush=True)
    hb_stop.set()
    print("CHILD done", flush=True)
    return 0


# ---------------------------------------------------------------------------
# parent: deadline-aware orchestration, persistence, final JSON
# ---------------------------------------------------------------------------


def _load_scratch():
    try:
        with open(_SCRATCH) as f:
            data = json.load(f)
        if data.get("version") != _METH_VERSION:
            return {}
        now = time.time()
        return {
            k: v for k, v in data.get("points", {}).items()
            if now - v.get("at", 0) < _MAX_AGE_S
        }
    except Exception:  # noqa: BLE001
        return {}


def _save_scratch(points):
    try:
        tmp = _SCRATCH + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": _METH_VERSION, "points": points}, f)
        os.replace(tmp, _SCRATCH)
    except Exception:  # noqa: BLE001
        pass


def _run_child(missing, deadline, points, fails, stall_s=180, point_max_s=950,
               probe_max_s=420):
    """One child attempt over `missing` points; ingest POINT lines live.

    stall_s: no output AT ALL for this long -> child is dead/frozen
    (the child heartbeats every 45 s from startup through healthy long
    compiles).
    point_max_s: one point taking longer than this -> hung DISPATCH
    (heartbeats keep flowing then) or a pathological compile; kill and
    let the next attempt retry it warm from the compile cache.
    probe_max_s: no `PROBE ok` within this long of launch -> the tunnel
    is wedged at init; kill and back off.
    Returns (n_new_points, last_err)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # child must see the TPU
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", ",".join(missing)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
        start_new_session=True,
    )
    new, err = 0, ""
    cur_key, cur_start = None, time.monotonic()
    launch = time.monotonic()
    probed = False
    try:
        last_line = time.monotonic()
        while True:
            now = time.monotonic()
            if now > deadline:
                err = "deadline"
                break
            if now - last_line > stall_s:
                err = f"stall >{stall_s}s (child frozen)"
                if cur_key:
                    fails[cur_key] = fails.get(cur_key, 0) + 1
                break
            if not probed and now - launch > probe_max_s:
                err = f"no probe within {probe_max_s}s (tunnel wedged at init)"
                break
            if cur_key and now - cur_start > point_max_s:
                err = f"point {cur_key} exceeded {point_max_s}s (tunnel hang?)"
                fails[cur_key] = fails.get(cur_key, 0) + 1
                break
            r, _, _ = select.select([proc.stdout], [], [], 5.0)
            if not r:
                if proc.poll() is not None:
                    break
                continue
            line = proc.stdout.readline()
            if line == "":
                break  # EOF
            line = line.strip()
            last_line = time.monotonic()
            if line.startswith("PROBE"):
                probed = True
            elif line.startswith("START "):
                cur_key, cur_start = line[len("START "):], time.monotonic()
            elif line.startswith("POINT "):
                try:
                    rec = json.loads(line[len("POINT "):])
                    points[rec["key"]] = {"seconds": rec["seconds"], "at": time.time()}
                    _save_scratch(points)
                    new += 1
                    cur_key = None
                    print(f"point {rec['key']} = {rec['seconds'] * 1e6:.1f} us "
                          f"({rec.get('wall', '?')}s wall)", file=sys.stderr, flush=True)
                except Exception:  # noqa: BLE001
                    pass
            elif line.startswith("POINTFAIL"):
                err = line[:200]
                if cur_key:
                    fails[cur_key] = fails.get(cur_key, 0) + 1
                    cur_key = None
                print(line, file=sys.stderr, flush=True)
    finally:
        if proc.poll() is None:
            try:
                os.killpg(os.getpgid(proc.pid), 15)
                time.sleep(5)  # give the compile-cache write a chance to finish
                os.killpg(os.getpgid(proc.pid), 9)
            except Exception:  # noqa: BLE001
                proc.kill()
        try:
            proc.wait(timeout=10)
        except Exception:  # noqa: BLE001
            pass
    return new, err


def _geomean(vals):
    import math

    vals = [v for v in vals if v and v > 0]
    if not vals:
        return 0.0
    return math.exp(sum(math.log(v) for v in vals) / len(vals))


def _emit(points, missing, last_err):
    def t(key):
        rec = points.get(key)
        return rec["seconds"] if rec else None

    def ratio(shape, path):
        tb, tp = t(f"{shape}:bf16"), t(f"{shape}:{path}")
        if tb and tp and tp > 0:
            return tb / tp
        return None

    per_shape = {}
    for s in _DECODE_SHAPES:
        rec = {p: round(r, 4) for p in ("w4a8", "exact", "int4")
               if (r := ratio(s, p)) is not None}
        if rec:
            per_shape[s] = rec
    pre = {}
    for s, paths in (
        ("prefill_1024", ("grouped",)),
        ("prefill_2048", ("grouped", "w8a8", "nf4_dq")),
        ("prefill_4096", ("w8a8",)),
    ):
        rec = {("nf4" if p == "w8a8" else p): round(r, 4) for p in paths
               if (r := ratio(s, p)) is not None}
        if rec:
            per_shape[s] = rec
            pre[s] = rec

    value = _geomean([per_shape.get(s, {}).get("w4a8") for s in _DECODE_SHAPES])
    rec = {
        "metric": "nf4_decode_speed_vs_bf16_matmul_geomean",
        "value": round(value, 4),
        "unit": "x (1.0=bf16 parity, 3.56=ideal 4-bit; W4A8 path, "
                "geomean over 7B projection shapes, M=8)",
        "vs_baseline": round(value / 0.90, 4),
        "exact_path": round(
            _geomean([per_shape.get(s, {}).get("exact") for s in _DECODE_SHAPES]), 4),
        "int4_path": round(
            _geomean([per_shape.get(s, {}).get("int4") for s in _DECODE_SHAPES]), 4),
        "per_shape": per_shape,
    }
    if missing:
        rec["partial"] = True
        rec["missing"] = sorted(missing)
    if value <= 0:
        rec["error"] = (last_err or "no decode points measured")[:200]
    print(json.dumps(rec), flush=True)


def main():
    budget = float(os.environ.get("BENCH_DEADLINE_S", "1450"))
    deadline = time.monotonic() + budget - 25.0  # reserve time to emit
    points = _load_scratch()
    fails = {}
    last_err = ""
    backoff = 20.0
    while True:
        # skip points that failed twice this run (persistent per-point
        # errors must not starve the rest)
        missing = [k for k in _POINTS if k not in points and fails.get(k, 0) < 2]
        if not missing:
            break
        remaining = deadline - time.monotonic()
        if remaining < 90:
            break
        new, err = _run_child(missing, deadline, points, fails)
        last_err = err or last_err
        missing = [k for k in _POINTS if k not in points and fails.get(k, 0) < 2]
        if not missing:
            break
        if new == 0:
            # nothing landed this attempt: back off (wedged-tunnel pattern)
            if deadline - time.monotonic() < backoff + 90:
                break
            print(f"attempt yielded nothing ({err}); backoff {backoff:.0f}s",
                  file=sys.stderr, flush=True)
            time.sleep(backoff)
            backoff = min(backoff * 2, 120.0)
    _emit(points, [k for k in _POINTS if k not in points], last_err)
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        sys.exit(_child(sys.argv[2]))
    sys.exit(main())
