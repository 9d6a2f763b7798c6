#!/usr/bin/env python
"""Isolate the Mosaic failure in the bf16 decode tree."""
import sys
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

CASE = sys.argv[1] if len(sys.argv) > 1 else "tree"


def kern(w_ref, s_ref, o_ref, *, case):
    b = w_ref[:].astype(jnp.int16)
    nib = b & jnp.int16(0xF)
    if case == "where1":
        v = jnp.where(nib < jnp.int16(8), jnp.asarray(0.5, jnp.bfloat16), jnp.asarray(-0.5, jnp.bfloat16))
    elif case == "tree":
        bits = [(nib & jnp.int16(1 << i)) != jnp.int16(0) for i in range(4)]
        vals = [jnp.asarray(0.01 * i - 0.5, jnp.bfloat16) for i in range(16)]

        def level(vs, bb):
            if len(vs) == 1:
                return vs[0]
            half = len(vs) // 2
            return jnp.where(bits[bb], level(vs[half:], bb - 1), level(vs[:half], bb - 1))

        v = level(vals, 3)
    elif case == "tree16":
        bits = [(nib & jnp.int16(1 << i)) != jnp.int16(0) for i in range(4)]
        vals = [jnp.asarray(i * 100, jnp.int16) for i in range(16)]

        def level(vs, bb):
            if len(vs) == 1:
                return vs[0]
            half = len(vs) // 2
            return jnp.where(bits[bb], level(vs[half:], bb - 1), level(vs[:half], bb - 1))

        v = pltpu.bitcast(level(vals, 3), jnp.bfloat16)
    elif case == "repeat":
        v = jnp.repeat(s_ref[0].astype(jnp.bfloat16), 64, axis=0)
    else:
        raise ValueError(case)
    o_ref[:] = (v * jnp.asarray(1.0, jnp.bfloat16)).astype(jnp.bfloat16)


def main():
    TKB, TN = 512, 256
    w = jnp.ones((TKB, TN), jnp.uint8)
    s = jnp.ones((2, TKB // 64, TN), jnp.float32)
    out = pl.pallas_call(
        functools.partial(kern, case=CASE),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((TKB, TN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, TKB // 64, TN), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TKB, TN), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TKB, TN), jnp.bfloat16),
    )(w, s)
    print(CASE, "OK", np.asarray(out)[0, 0])


if __name__ == "__main__":
    main()
