"""Model zoo: quantized transformer families (the serving layer the
reference lacks — its only models are an MLP test net and HF GPT-J via
hooks, tests_pvc/test_simple_nn.py, test_int8_hf.py)."""

from . import llama
from .llama import LlamaConfig, init_params, llama_forward, quantize_params

__all__ = ["llama", "LlamaConfig", "init_params", "llama_forward", "quantize_params"]
