"""Model zoo: quantized transformer families (the serving layer the
reference lacks — its only models are an MLP test net and HF GPT-J via
hooks, tests_pvc/test_simple_nn.py, test_int8_hf.py)."""

from . import gptj, llama, lora
from .gptj import GPTJConfig, gptj_forward, init_gptj_kv_cache, init_gptj_params
from .llama import LlamaConfig, init_params, llama_forward, quantize_params
from .lora import init_lora, merge_lora, qlora_loss_fn

__all__ = [
    "llama", "gptj", "lora",
    "LlamaConfig", "init_params", "llama_forward", "quantize_params",
    "GPTJConfig", "gptj_forward", "init_gptj_kv_cache", "init_gptj_params",
    "init_lora", "merge_lora", "qlora_loss_fn",
]
