"""bitsandbytes_sycl_tpu — a TPU-native k-bit quantization framework.

A from-scratch JAX / XLA / Pallas re-design of the capability surface of
bitsandbytes (reference: abhilash1910/bitsandbytes-SYCL): blockwise 8-bit /
NF4 / FP4 quantization, LLM.int8() matmul with outlier decomposition, fused
4-bit inference matmuls, 8-bit blockwise optimizers — plus the layers the
reference never had: mesh sharding, a quantized Llama model family, an
INT8-KV-cache serving engine, and multi-host scaling.

Typical use::

    import bitsandbytes_sycl_tpu as bnb

    packed, qs = bnb.quantize_nf4(w)
    y = bnb.matmul_4bit(x, packed, qs)
"""

from . import codebooks, functional, legacy, research
from .autograd import (
    MatmulLtState,
    bmm_cublas,
    matmul,
    matmul_4bit,
    matmul_cublas,
    mm_cublas,
)
from .functional import (
    dequantize_4bit,
    dequantize_blockwise,
    dequantize_fp4,
    dequantize_nf4,
    int8_double_quant,
    int8_linear_matmul,
    int8_mm_dequant,
    llm_int8_matmul,
    llm_int8_prepare_outliers,
    quantize_4bit,
    quantize_blockwise,
    quantize_fp4,
    quantize_nf4,
)
from .types import QTensor, QuantState

__version__ = "0.1.0"

__all__ = [
    "codebooks",
    "functional",
    "QuantState",
    "QTensor",
    "quantize_blockwise",
    "dequantize_blockwise",
    "quantize_4bit",
    "dequantize_4bit",
    "quantize_nf4",
    "dequantize_nf4",
    "quantize_fp4",
    "dequantize_fp4",
    "int8_double_quant",
    "int8_linear_matmul",
    "int8_mm_dequant",
    "llm_int8_matmul",
    "llm_int8_prepare_outliers",
    "matmul",
    "matmul_4bit",
    "matmul_cublas",
    "bmm_cublas",
    "mm_cublas",
    "MatmulLtState",
    "legacy",
]
