#!/usr/bin/env python
"""Serve a quantized llama with continuous batching (+ optional TP and
speculative decoding).

Self-demo (tiny random model):        python examples/serve.py
Real checkpoint:                      python examples/serve.py /path/to/hf_llama_dir
Tensor parallel over all devices:     python examples/serve.py --tp
Speculative (int4 draft, greedy):     python examples/serve.py --spec
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from bitsandbytes_sycl_tpu.engine import EngineConfig, InferenceEngine, speculative_generate_jit
from bitsandbytes_sycl_tpu.models.llama import LlamaConfig, init_params, quantize_params


def get_model(args):
    ckpt = next((a for a in args if not a.startswith("-")), None)
    if ckpt:
        from bitsandbytes_sycl_tpu.checkpoints import load_llama_from_hf

        return load_llama_from_hf(ckpt)  # (cfg, params), NF4 by default
    cfg = LlamaConfig.tiny(quant="nf4", a8_decode=True)  # W4A8 decode routing
    return cfg, init_params(cfg, jax.random.PRNGKey(0))


def main(argv):
    cfg, params = get_model(argv)
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 5, 5, 5, 5]]

    if "--spec" in argv:
        # lossless speculative decoding: int4 quantization of the same
        # checkpoint drafts for the nf4 target, one fused dispatch
        import dataclasses

        cfg_d = dataclasses.replace(cfg, quant="int4")
        # NOTE: for a real checkpoint re-quantize from the fp weights;
        # the tiny demo just re-inits
        draft = init_params(cfg_d, jax.random.PRNGKey(0))
        toks = jnp.asarray([prompts[0]], jnp.int32)
        out, stats = speculative_generate_jit(params, cfg, draft, cfg_d, toks, 16)
        print("speculative:", np.asarray(out)[0].tolist(), stats)
        return

    mesh = None
    if "--tp" in argv:
        from bitsandbytes_sycl_tpu.parallel import make_mesh, shard_llama_params

        mesh = make_mesh({"model": len(jax.devices())})
        params = shard_llama_params(params, cfg, mesh)

    eng = InferenceEngine(cfg, params, EngineConfig(max_batch=4, max_new_tokens=12), mesh=mesh)
    outs = eng.generate(prompts)
    for p, o in zip(prompts, outs):
        print(p, "->", o)


if __name__ == "__main__":
    main(sys.argv[1:])
