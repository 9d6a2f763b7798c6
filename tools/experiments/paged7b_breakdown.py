#!/usr/bin/env python
"""Where does the B=48 paged 7B decode step spend its time? (real TPU)

Round-3 history: the first probe attributed 36 ms of the 95.9 ms step
to per-layer DUS pool writes (full 95.9 / no_write 60.2); the deferred
layer-batched flush shipped and the step now measures ~75 ms (637
tok/s). This probe re-attributes the remaining time:
  full      — the shipped step (staging + new_kv attend + one flush)
  no_write  — attend only (init_pend no-op'd: no staging, no flush)
  no_attend — staging + flush, attention output replaced by q
  neither   — linears/norms/logits only
The deltas attribute the step to flush+staging vs attend vs the rest.
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
                    dtype=jnp.bfloat16, a8_decode=True, blocksize=128)

_orig = L._paged_write_and_attend


def make_variant(write, attend):
    def fn(new_cache, li, q, k, v, positions, cfg):
        kq, ks = L._kv_quantize(k)
        vq, vs = L._kv_quantize(v)
        if write:  # stage into pend (flush runs in llama_forward)
            new_cache["pend_k"] = jax.lax.dynamic_update_slice(
                new_cache["pend_k"], kq[None, :, 0], (li, 0, 0, 0))
            new_cache["pend_v"] = jax.lax.dynamic_update_slice(
                new_cache["pend_v"], vq[None, :, 0], (li, 0, 0, 0))
            new_cache["pend_ks"] = jax.lax.dynamic_update_slice(
                new_cache["pend_ks"], ks[None, :, 0], (li, 0, 0))
            new_cache["pend_vs"] = jax.lax.dynamic_update_slice(
                new_cache["pend_vs"], vs[None, :, 0], (li, 0, 0))
        if attend:
            attn = paged_decode_attention_int8_stacked(
                q, new_cache["k"], new_cache["k_scale"],
                new_cache["v"], new_cache["v_scale"], li,
                new_cache["page_table"], positions[:, 0],
                new_kv=(kq[:, 0], ks[:, 0], vq[:, 0], vs[:, 0]))
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

    _orig_init = L.init_pend
    for name, write, attend in (
        ("full", True, True),
        ("no_write", False, True),
        ("no_attend", True, False),
        ("neither", False, False),
    ):
        L._paged_write_and_attend = _orig if name == "full" else make_variant(write, attend)
        # no staging -> no pend keys -> llama_forward skips the flush
        L.init_pend = _orig_init if write or name == "full" else (
            lambda c, p=None: c)
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
