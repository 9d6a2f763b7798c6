#!/usr/bin/env python
"""MXU-assisted NF4 decode experiment (VERDICT r1 item 3).

Hypothesis under test: replace the per-element 16-entry select-tree decode
(4 bit-tests + 15 selects ~= 23 VPU ops/elem, the measured VPU floor) with
a one-hot contraction the MXU can absorb:

    x @ (LUT(c) * s)^T  ==  sum_j sum_i  (x_blk_j * v_i) @ ind_i  * s_j

where ind_i[k, n] = [code == i]. Stacking the 16 indicator planes along K
turns the inner sum into ONE wide bf16 dot per (sub-block, plane):
(TM, 16*64) @ (16*64, TN) — 16x the MXU flops, but at decode batch sizes
the MXU is ~0.1% utilized, so the dots are free. The question is purely
the VPU cost of BUILDING the indicators: 16 equality compares + 16
selects-to-bf16 per element = ~32 ops/elem, i.e. the op-count model says
this LOSES to the 23-op select tree before the dots even start. This
script measures it to pin the model down (see docs/PERFORMANCE.md).

Run on the real chip: JAX_PLATFORMS='' python tools/experiments/mxu_decode.py
"""

import functools
import sys
import timeit

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from bitsandbytes_sycl_tpu.ops import matmul_4bit_fused, quantize_4bit_native
from bitsandbytes_sycl_tpu.ops.common import interpret_mode

N = K = 4096
BS = 64
LO, HI = 100, 600


def _mxu_kernel(x_hi_ref, x_lo_ref, w_ref, s_ref, o_ref, acc_ref, *, code, nk, bs):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = w_ref[:].astype(jnp.int16)  # (TKB, TN) packed bytes
    tkb, tn = w_ref.shape
    nsub = tkb // bs
    tm = x_hi_ref.shape[0]
    acc = jnp.zeros((tm, tn), jnp.float32)
    for plane, (x_ref, shift) in enumerate(((x_hi_ref, 4), (x_lo_ref, 0))):
        # one-hot indicator stack (16 compares + 16 selects per element)
        inds = []
        bm = b & jnp.int16(0xF << shift)
        for i in range(16):
            # int16 compares only lower against ZERO (lut16's bit-test
            # pattern): xor to zero-test equality, swapped select
            ne = (bm ^ jnp.int16(i << shift)) != jnp.int16(0)
            inds.append(jnp.where(ne, jnp.bfloat16(0.0), jnp.bfloat16(1.0)))
        for j in range(nsub):
            # x sub-block replicated with the 16 codebook values folded in
            xj = x_ref[:, j * bs : (j + 1) * bs]  # (TM, bs) bf16
            xs = jnp.concatenate(
                [xj * jnp.bfloat16(code[i]) for i in range(16)], axis=1
            )  # (TM, 16*bs)
            indj = jnp.concatenate(
                [ind[j * bs : (j + 1) * bs, :] for ind in inds], axis=0
            )  # (16*bs, TN)
            d = jax.lax.dot_general(
                xs, indj, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            acc = acc + d * s_ref[plane, j, :][None, :]
    acc_ref[:] += acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("code", "tm", "tn", "tkb"))
def mxu_matmul(x, packed, absmax, code, tm, tn, tkb):
    M, Kx = x.shape
    half = Kx // 2
    nk = half // tkb
    Nn = packed.shape[1]
    kernel = functools.partial(_mxu_kernel, code=tuple(code), nk=nk, bs=BS)
    return pl.pallas_call(
        kernel,
        grid=(M // tm, Nn // tn, nk),
        in_specs=[
            pl.BlockSpec((tm, tkb), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tkb), lambda m, n, k, _h=nk: (m, k + _h), memory_space=pltpu.VMEM),
            pl.BlockSpec((tkb, tn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tkb // BS, tn), lambda m, n, k: (0, k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Nn), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        interpret=interpret_mode(),
    )(x, x, packed, absmax)


def main():
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(N, K)) * 0.02, jnp.float32)
    x = jnp.asarray(rng.normal(size=(8, K)), jnp.bfloat16)
    qw = quantize_4bit_native(W, blocksize=BS, quant_type="nf4")
    code = [float(v) for v in qw.code]

    y_mxu = mxu_matmul(x, qw.packed, qw.absmax, tuple(code), 8, 256, 512)
    y_ref = matmul_4bit_fused(x, qw)
    err = np.abs(np.asarray(y_mxu, np.float32) - np.asarray(y_ref, np.float32)).max()
    print(f"max |mxu - select-tree| = {err:.3e} (same codes, same scales)")

    def measure(op):
        def runner(iters):
            @jax.jit
            def rr(x):
                def body(i, x):
                    return op(x)[:, :K].astype(x.dtype) * 1e-3 + x

                return jax.lax.fori_loop(0, iters, body, x)

            np.asarray(rr(x))
            return min(timeit.timeit(lambda: np.asarray(rr(x)), number=1) for _ in range(6))

        return (runner(HI) - runner(LO)) / (HI - LO)

    t_tree = measure(lambda x: matmul_4bit_fused(x, qw))
    t_mxu = measure(lambda x: mxu_matmul(x, qw.packed, qw.absmax, tuple(code), 8, 256, 512))
    print(f"select-tree fused : {t_tree * 1e6:8.2f} us")
    print(f"one-hot MXU decode: {t_mxu * 1e6:8.2f} us  ({t_tree / t_mxu:.2f}x)")


if __name__ == "__main__":
    main()
