"""Model zoo: quantized transformer families (the serving layer the
reference lacks — its only models are an MLP test net and HF GPT-J via
hooks, tests_pvc/test_simple_nn.py, test_int8_hf.py)."""

from . import (bloom, falcon, gemma, gpt2, gptj, llama, lora, mistral,
               mixtral, neox, opt, phi, qwen2)
from .bloom import BloomConfig, bloom_forward, load_bloom_from_hf
from .falcon import FalconConfig, falcon_forward, load_falcon_from_hf
from .gpt2 import GPT2Config, gpt2_forward, load_gpt2_from_hf
from .opt import OPTConfig, init_opt_params, load_opt_from_hf, opt_forward
from .gemma import (Gemma2Config, GemmaConfig, gemma2_forward,
                    gemma_forward, load_gemma2_from_hf, load_gemma_from_hf)
from .gptj import GPTJConfig, gptj_forward, init_gptj_kv_cache, init_gptj_params
from .llama import LlamaConfig, init_params, llama_forward, quantize_params
from .lora import init_lora, merge_lora, qlora_loss_fn
from .mistral import MistralConfig, load_mistral_from_hf, mistral_forward
from .mixtral import MixtralConfig, load_mixtral_from_hf, mixtral_forward
from .neox import NeoXConfig, load_neox_from_hf, neox_forward
from .phi import PhiConfig, load_phi_from_hf, phi_forward
from .qwen2 import Qwen2Config, load_qwen2_from_hf, qwen2_forward

__all__ = [
    "llama", "gptj", "lora", "mistral", "mixtral", "qwen2", "gemma", "phi", "neox",
    "falcon", "FalconConfig", "falcon_forward", "load_falcon_from_hf",
    "opt", "OPTConfig", "opt_forward", "init_opt_params", "load_opt_from_hf",
    "gpt2", "GPT2Config", "gpt2_forward", "load_gpt2_from_hf",
    "bloom", "BloomConfig", "bloom_forward", "load_bloom_from_hf",
    "LlamaConfig", "init_params", "llama_forward", "quantize_params",
    "GPTJConfig", "gptj_forward", "init_gptj_kv_cache", "init_gptj_params",
    "MistralConfig", "mistral_forward", "load_mistral_from_hf",
    "MixtralConfig", "mixtral_forward", "load_mixtral_from_hf",
    "Qwen2Config", "qwen2_forward", "load_qwen2_from_hf",
    "GemmaConfig", "gemma_forward", "load_gemma_from_hf",
    "Gemma2Config", "gemma2_forward", "load_gemma2_from_hf",
    "PhiConfig", "phi_forward", "load_phi_from_hf",
    "NeoXConfig", "neox_forward", "load_neox_from_hf",
    "init_lora", "merge_lora", "qlora_loss_fn",
]
