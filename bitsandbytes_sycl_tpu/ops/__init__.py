"""Pallas TPU kernels — the L0 of the stack. Each kernel fuses what the
reference runs as separate SYCL launches (SURVEY.md §3.1: 8 launches per
int8 linear collapse into one kernel here)."""

from .common import QLinearWeight, lut16, on_tpu, quantize_4bit_native, to_kernel_layout
from .matmul_4bit import matmul_4bit_fused
from .matmul_w4a8 import (
    dequantize_to_int8, matmul_4bit_w4a8, matmul_4bit_w4a8_grouped,
    matmul_4bit_w8a8_prefill,
)

__all__ = [
    "on_tpu",
    "lut16",
    "QLinearWeight",
    "quantize_4bit_native",
    "to_kernel_layout",
    "matmul_4bit_fused",
    "matmul_4bit_w4a8",
    "matmul_4bit_w8a8_prefill",
    "matmul_4bit_w4a8_grouped",
    "dequantize_to_int8",
]
