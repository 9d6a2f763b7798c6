"""Serving engine: continuous-batching decode over quantized weights with
an int8 KV cache — BASELINE.json configs[4]; no reference counterpart."""

from .engine import EngineConfig, InferenceEngine
from .paged import PageAllocator, PagedKVPool
from .speculative import speculative_generate, speculative_generate_jit

__all__ = [
    "EngineConfig", "InferenceEngine", "PageAllocator", "PagedKVPool",
    "speculative_generate", "speculative_generate_jit",
]
