#!/usr/bin/env python
"""Where does the B=48 paged 7B decode step spend its time? (real TPU)

benchmarks/run.py model7b_paged_decode:48 measured ~95 ms/step (502
tok/s) against a ~40-50 ms roofline estimate (weights ~3.8 GB + paged
attention reads ~6.4 GB + trivial writes). This probe times the same
jitted scan with pieces of _paged_write_and_attend knocked out:
  full      — the shipped step (cache-hits the bench's compile)
  no_write  — attend only, DUS pool writes skipped
  no_attend — writes only, attention output replaced by q
  neither   — linears/norms/logits only
The deltas attribute the step time to writes vs attend vs the rest.
"""

import faulthandler
import sys
import timeit

faulthandler.dump_traceback_later(240, repeat=True, file=sys.stderr)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np
from functools import partial

sys.path.insert(0, "/root/repo")
import bitsandbytes_sycl_tpu.models.llama as L
from bitsandbytes_sycl_tpu.engine.paged import init_page_pool
from bitsandbytes_sycl_tpu.ops.paged_attention import (
    paged_decode_attention_int8_stacked,
)

B, S, P = 48, 4096, 128
cfg = L.LlamaConfig(max_seq_len=S, quant="nf4", kv_quant=True,
                    dtype=jnp.bfloat16, a8_decode=True)

_orig = L._paged_write_and_attend


def _write_part(new_cache, li, kq, ks, vq, vs, pages, offs):
    new_cache["k"] = L._paged_cache_write(
        new_cache["k"], li, kq.transpose(0, 2, 3, 1), pages, offs, pos_axis=2)
    new_cache["v"] = L._paged_cache_write(
        new_cache["v"], li, vq.transpose(0, 2, 1, 3), pages, offs, pos_axis=1)
    new_cache["k_scale"] = L._paged_cache_write(
        new_cache["k_scale"], li, ks.transpose(0, 2, 1), pages, offs, pos_axis=1)
    new_cache["v_scale"] = L._paged_cache_write(
        new_cache["v_scale"], li, vs.transpose(0, 2, 1), pages, offs, pos_axis=1)
    return new_cache


def make_variant(write, attend):
    def fn(new_cache, li, q, k, v, positions, cfg):
        kq, ks = L._kv_quantize(k)
        vq, vs = L._kv_quantize(v)
        if write:
            new_cache = _write_part(
                new_cache, li, kq, ks, vq, vs,
                new_cache["write_page"], new_cache["write_off"])
        if attend:
            attn = paged_decode_attention_int8_stacked(
                q, new_cache["k"], new_cache["k_scale"],
                new_cache["v"], new_cache["v_scale"], li,
                new_cache["page_table"], positions[:, 0] + 1)
            assert attn is not None
        else:
            attn = q
        return attn, new_cache

    return fn


def main():
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    np.asarray(params["final_norm"])

    rng = np.random.default_rng(0)
    start = rng.integers(384, 640, size=(B,)).astype(np.int32)
    maxp = int(np.ceil((int(start.max()) + 25) / P))
    pos0 = jnp.asarray(start)[:, None]
    toks = jnp.ones((B, 1), jnp.int32)

    for name, write, attend in (
        ("full", True, True),
        ("no_write", False, True),
        ("no_attend", True, False),
        ("neither", False, False),
    ):
        L._paged_write_and_attend = _orig if name == "full" else make_variant(write, attend)
        # fresh pool + indirection arrays per variant: the whole cache
        # dict is donated, so every leaf is consumed by the prior variant
        pool = init_page_pool(cfg, B * maxp + 1, P)
        table = jnp.asarray(
            np.arange(1, B * maxp + 1, dtype=np.int32).reshape(B, maxp))
        cache = dict(pool, page_table=table,
                     write_page=jnp.zeros((B,), jnp.int32),
                     write_off=jnp.zeros((B,), jnp.int32))
        del pool

        @partial(jax.jit, donate_argnums=(1,))
        def decode_n(params, cache, toks, pos, arr):
            def step(carry, _):
                cache, toks, pos = carry
                p = pos[:, 0]
                cache["write_page"] = jnp.take_along_axis(
                    cache["page_table"], (p // P)[:, None], axis=1)[:, 0]
                cache["write_off"] = p % P
                logits, cache = L.llama_forward(params, cfg, toks, cache, pos)
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                return (cache, nxt.reshape(B, 1), pos + 1), ()

            (cache, toks, pos), _ = jax.lax.scan(step, (cache, toks, pos), arr)
            return toks, cache

        def run(n):
            nonlocal cache
            arr = jnp.zeros((n,))
            out, cache = decode_n(params, cache, toks, pos0, arr)
            np.asarray(out)
            ts = []
            for _ in range(3):
                t0 = timeit.default_timer()
                out, cache = decode_n(params, cache, toks, pos0, arr)
                np.asarray(out)
                ts.append(timeit.default_timer() - t0)
            return min(ts)

        t = (run(20) - run(5)) / 15
        print(f"{name:10} {t*1e3:8.2f} ms/step  ({B/t:7.1f} tok/s)", flush=True)
        del cache


if __name__ == "__main__":
    main()
