#!/usr/bin/env python
"""Root-cause the ~14.5 GB HBM serving cliff (VERDICT r4 ask #3).

r4 observed: paged 7B serving degrades NONLINEARLY once total HBM
crosses ~14.5 GB (B=40 full repack 722 tok/s vs B=32 1176; B=48 partial
933 vs 1189 plain NF4). Hypothesis was "donation/copy pressure" —
never verified. This probe separates the candidate causes:

  base     — B=40 NF4, avg-512-live pool (~9.5 GB total): fast baseline
  ballast  — same + a DEAD int8 ballast array sized to push total HBM
             to ~13.5 / ~14.5 / ~15.2 GB. If ballast alone reproduces
             the cliff, the cause is TOTAL-BYTES (allocator/defrag or
             donation fallback under memory pressure), NOT anything
             about the repacked weights themselves.
  repack   — actual full int8 repack (+3.3 GB, ~12.9 GB total at this
             pool) for the like-for-like point.
  trace    — jax.profiler traces of 3 steps at one fast and one slow
             point; prints top op families by device time so the extra
             time is ATTRIBUTED (look for copy/copy-start/defrag
             families and donation fallbacks).

Step timing matches tools/experiments/paged7b_breakdown.py (donated
scan of 20-vs-5 steps, min over reps).

Usage: python hbm_cliff_probe.py [ballast_gb,...]   (default 0,4,5,5.7)
       python hbm_cliff_probe.py trace <ballast_gb>
"""

import faulthandler
import glob
import gzip
import json
import sys
import timeit
from collections import defaultdict
from functools import partial

faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bitsandbytes_sycl_tpu.models.llama as L
from bitsandbytes_sycl_tpu.engine.paged import init_page_pool

B, S, P = 40, 4096, 128
cfg = L.LlamaConfig(max_seq_len=S, quant="nf4", kv_quant=True,
                    dtype=jnp.bfloat16, a8_decode=True, blocksize=128)


def mem_gb():
    try:
        st = jax.devices()[0].memory_stats()
        return st.get("bytes_in_use", 0) / 1e9
    except Exception:  # noqa: BLE001
        return float("nan")


def build_cache(maxp_live):
    n_pages = B * maxp_live + 1
    pool = init_page_pool(cfg, n_pages, P)
    table = jnp.asarray(
        np.arange(1, B * maxp_live + 1, dtype=np.int32).reshape(B, maxp_live))
    return dict(pool, page_table=table,
                write_page=jnp.zeros((B,), jnp.int32),
                write_off=jnp.zeros((B,), jnp.int32))


def make_decode(params, use_cfg):
    @partial(jax.jit, donate_argnums=(1,), static_argnums=(4,))
    def decode_n(params, cache, toks, pos, n):
        def step(carry, _):
            cache, toks, pos = carry
            p = pos[:, 0]
            cache["write_page"] = jnp.take_along_axis(
                cache["page_table"], (p // P)[:, None], axis=1)[:, 0]
            cache["write_off"] = p % P
            logits, cache = L.llama_forward(params, use_cfg, toks, cache, p[:, None])
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return (cache, nxt.reshape(B, 1), pos + 1), ()

        (cache, toks, pos), _ = jax.lax.scan(
            step, (cache, toks, pos), jnp.zeros((n,)))
        return toks, cache

    return decode_n


def measure_steps(decode_n, params, cache, toks, pos0, trace_dir=None):
    def run(n):
        nonlocal cache
        out, cache = decode_n(params, cache, toks, pos0, n)
        np.asarray(out)
        ts = []
        for _ in range(3):
            t0 = timeit.default_timer()
            out, cache = decode_n(params, cache, toks, pos0, n)
            np.asarray(out)
            ts.append(timeit.default_timer() - t0)
        return min(ts)

    t = (run(20) - run(5)) / 15
    if trace_dir:
        # n=5 is ALREADY COMPILED (run(5) above): tracing a fresh static
        # arg retraces the whole model in Python inside the trace window
        # and its ~1M host events crowd the device track out of the
        # serialized json (first attempt had ZERO device X events)
        with jax.profiler.trace(trace_dir):
            out, cache = decode_n(params, cache, toks, pos0, 5)
            np.asarray(out)
    return t, cache


def top_ops(trace_dir, k=18):
    """Sum Perfetto 'X' event durations by op-name family, DEVICE track
    only (the host-python track has ~1000x the event count)."""
    fams = defaultdict(float)
    total = 0.0
    for path in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        dev_pids = {
            ev["pid"] for ev in data.get("traceEvents", [])
            if ev.get("ph") == "M" and ev.get("name") == "process_name"
            and "TPU" in str(ev.get("args", {}).get("name", ""))
        }
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
                continue
            dur = ev.get("dur", 0) / 1e3  # ms
            name = ev.get("name", "?")
            fam = name.split(".")[0].split("(")[0][:48]
            fams[fam] += dur
            total += dur
    print(f"  total device-event time {total:.1f} ms over trace")
    for name, ms in sorted(fams.items(), key=lambda kv: -kv[1])[:k]:
        print(f"    {ms:9.2f} ms  {name}", flush=True)


def main():
    mode = "sweep"
    args = sys.argv[1:]
    if args and args[0] == "trace":
        mode = "trace"
        ballasts = [float(args[1])]
    elif args and args[0] == "trace8":
        mode = "trace8"
        ballasts = []
    else:
        # baseline is ~11.6 GB (3.5 params + ~8.1 pool at 6 live pages
        # x40): ballasts walk total HBM up to and past the ~14.5 cliff
        ballasts = [float(v) for v in (args[0].split(",") if args else ["0", "2", "3", "3.8"])]

    params = L.init_params(cfg, jax.random.PRNGKey(0))
    np.asarray(params["final_norm"])
    print(f"params resident: {mem_gb():.2f} GB", flush=True)

    rng = np.random.default_rng(0)
    start = rng.integers(384, 640, size=(B,)).astype(np.int32)
    maxp_live = int(np.ceil((int(start.max()) + 25) / P))
    pos0 = jnp.asarray(start)[:, None]
    toks = jnp.ones((B, 1), jnp.int32)
    decode_n = make_decode(params, cfg)

    for gb in ballasts:
        ballast = None
        if gb > 0:
            ballast = jnp.zeros((int(gb * 1e9),), jnp.int8)
            np.asarray(ballast[:1])  # force allocation
        cache = build_cache(maxp_live)
        print(f"ballast {gb:.1f} GB -> resident {mem_gb():.2f} GB", flush=True)
        tdir = f"/tmp/cliff_trace_{gb:g}" if mode == "trace" else None
        t, cache = measure_steps(decode_n, params, cache, toks, pos0, trace_dir=tdir)
        print(f"ballast {gb:.1f} GB: {t*1e3:8.2f} ms/step  ({B/t:7.1f} tok/s)",
              flush=True)
        if tdir:
            top_ops(tdir)
        del cache, ballast

    if mode in ("sweep", "trace8"):
        # like-for-like repack point (real +3.3 GB of live int8 weights).
        # The ORIGINAL 4-bit tree must be freed before measuring — keeping
        # it live adds 3.5 GB and OOMs the chip (first sweep attempt did):
        # exactly the buffer-lifetime class of bug this probe hunts.
        params8, cfg8 = L.repack_params_int8(params, cfg)
        del params, decode_n
        np.asarray(jax.tree_util.tree_leaves(params8)[0].ravel()[:1])
        decode8 = make_decode(params8, cfg8)
        cache = build_cache(maxp_live)
        print(f"repack -> resident {mem_gb():.2f} GB", flush=True)
        tdir = "/tmp/cliff_trace_repack" if mode == "trace8" else None
        t, cache = measure_steps(decode8, params8, cache, toks, pos0,
                                 trace_dir=tdir)
        print(f"repack      : {t*1e3:8.2f} ms/step  ({B/t:7.1f} tok/s)", flush=True)
        if tdir:
            top_ops(tdir)


if __name__ == "__main__":
    main()
