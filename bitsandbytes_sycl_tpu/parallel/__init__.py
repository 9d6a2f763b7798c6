"""Sharding & collectives — the L5 the reference never had.

The reference is single-device only (SURVEY.md §2.3: the sole
torch.distributed mention is a logging guard in a diagnostic copy,
optimizer_test.py:565). Here quantized weights are first-class pjit
citizens: packed int4/int8 payloads and their absmax scales shard
congruently over a jax.sharding.Mesh, with XLA collectives (psum /
all_gather / ppermute) riding ICI.
"""

from .mesh import (
    initialize_distributed,
    make_mesh,
    qweight_pspec,
    qweight_sharding,
    shard_qweight,
)
from . import gptj_tp, llama_tp, opt_tp, pipeline, ring
from .gptj_tp import gptj_forward_tp, shard_gptj_params
from .opt_tp import opt_forward_tp, shard_opt_params
from .llama_tp import kv_cache_specs, llama_forward_tp, llama_param_specs, shard_llama_params
from .pipeline import (
    init_stage_kv_cache,
    llama_forward_pp,
    llama_forward_pp_decode,
    stack_stage_params,
)
from .ring import ring_attention
from .collectives import (
    tp_all_gather_matmul_4bit,
    tp_matmul_4bit_col,
    tp_matmul_4bit_row,
    tp_matmul_int8_col,
    tp_matmul_int8_row,
)

__all__ = [
    "gptj_tp", "llama_tp", "opt_tp", "pipeline", "ring",
    "gptj_forward_tp", "shard_gptj_params",
    "opt_forward_tp", "shard_opt_params",
    "kv_cache_specs", "llama_forward_tp", "llama_param_specs", "shard_llama_params",
    "llama_forward_pp", "llama_forward_pp_decode", "init_stage_kv_cache",
    "stack_stage_params", "ring_attention",
    "make_mesh",
    "initialize_distributed",
    "qweight_pspec",
    "qweight_sharding",
    "shard_qweight",
    "tp_matmul_4bit_col",
    "tp_matmul_4bit_row",
    "tp_all_gather_matmul_4bit",
    "tp_matmul_int8_col",
    "tp_matmul_int8_row",
]
