"""Native host library loader — the analog of the reference's
cextension.py (ctypes loader for libbitsandbytes_sycl.so,
cextension.py:67-128), minus its pitfalls: no hard-coded relative path,
build-on-demand from source, and a clean numpy fallback instead of a
warning-and-crash (SURVEY.md §7 quality caveats).

The library accelerates HOST-side work only (checkpoint conversion of
multi-GB weights); all device compute is XLA/Pallas.
"""

from __future__ import annotations

import ctypes as ct
import logging
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# csrc ships inside the package (wheel-friendly); the repo-root location
# is kept as a fallback for older checkouts
_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_CSRC = os.path.join(_PKG_DIR, "csrc")
if not os.path.exists(os.path.join(_CSRC, "quant_cpu.cpp")):
    _CSRC = os.path.join(os.path.dirname(_PKG_DIR), "csrc")
_LIB_NAME = "libquant_cpu.so"
_REQUIRED_VERSION = 2  # bump when csrc gains symbols (stale .so triggers rebuild)
_lib: Optional[ct.CDLL] = None
_tried = False


def _build(src: str, out: str) -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", out, "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception as e:  # noqa: BLE001
        logger.warning("native build failed (%s); using numpy fallback", e)
        return False


def get_native_library() -> Optional[ct.CDLL]:
    """Load (building if needed) the host quantization library; None if
    unavailable — callers must fall back to numpy/jnp."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_CSRC, "quant_cpu.cpp")
    # versioned tmp name: a stale v(N-1) tmp build can never shadow the
    # rebuild of a newer source
    tmp_name = f"bnb_tpu_v{_REQUIRED_VERSION}_" + _LIB_NAME
    candidates = [
        os.path.join(_CSRC, _LIB_NAME),
        os.path.join(tempfile.gettempdir(), tmp_name),
    ]
    for path in candidates:
        if not os.path.exists(path):
            if not (os.path.exists(src) and _build(src, path)):
                continue
        try:
            lib = ct.CDLL(path)
            lib.quant_cpu_version.restype = ct.c_int
            version = lib.quant_cpu_version()
            if version < _REQUIRED_VERSION and os.path.exists(src):
                # stale prebuilt .so: rebuild into the versioned tmp path
                tmp = os.path.join(tempfile.gettempdir(), tmp_name)
                if _build(src, tmp):
                    lib = ct.CDLL(tmp)
                    lib.quant_cpu_version.restype = ct.c_int
                    version = lib.quant_cpu_version()
            assert version >= 1
            _lib = lib
            return _lib
        except Exception as e:  # noqa: BLE001
            logger.warning("failed loading %s: %s", path, e)
    return None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ct.c_void_p)


def quantize_blockwise_np(
    A: np.ndarray, code_sorted: np.ndarray, blocksize: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host 8-bit blockwise quantize -> (codes uint8 like A, absmax)."""
    A = np.ascontiguousarray(A, np.float32)
    n = A.size
    nb = (n + blocksize - 1) // blocksize
    lib = get_native_library()
    out = np.empty(n, np.uint8)
    absmax = np.empty(nb, np.float32)
    if lib is not None:
        code_sorted = np.ascontiguousarray(code_sorted, np.float32)
        lib.quantize_blockwise_cpu_fp32(
            _ptr(code_sorted), _ptr(A.reshape(-1)), _ptr(absmax), _ptr(out),
            ct.c_int(blocksize), ct.c_long(n),
        )
        return out.reshape(A.shape), absmax
    # numpy fallback
    flat = A.reshape(-1)
    pad = nb * blocksize - n
    fp = np.pad(flat, (0, pad)).reshape(nb, blocksize)
    absmax[:] = np.abs(fp).max(1)
    inv = np.where(absmax > 0, 1.0 / np.where(absmax > 0, absmax, 1), 0.0)
    mids = (code_sorted[1:] + code_sorted[:-1]) / 2
    codes = np.searchsorted(mids, fp * inv[:, None], side="left").astype(np.uint8)
    return codes.reshape(-1)[:n].reshape(A.shape), absmax


def quantize_4bit_np(
    A: np.ndarray, code16: np.ndarray, blocksize: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host 4-bit blockwise quantize -> (bnb-paired packed bytes, absmax)."""
    A = np.ascontiguousarray(A, np.float32)
    n = A.size
    nb = (n + blocksize - 1) // blocksize
    lib = get_native_library()
    if lib is not None:
        out = np.empty((n + 1) // 2, np.uint8)
        absmax = np.empty(nb, np.float32)
        code16 = np.ascontiguousarray(code16, np.float32)
        lib.quantize_4bit_cpu_fp32(
            _ptr(code16), _ptr(A.reshape(-1)), _ptr(absmax), _ptr(out),
            ct.c_int(blocksize), ct.c_long(n),
        )
        return out, absmax
    order = np.argsort(code16, kind="stable")
    sorted_vals = code16[order]
    mids = (sorted_vals[1:] + sorted_vals[:-1]) / 2
    flat = A.reshape(-1)
    pad = nb * blocksize - n
    fp = np.pad(flat, (0, pad)).reshape(nb, blocksize)
    absmax = np.abs(fp).max(1).astype(np.float32)
    inv = np.where(absmax > 0, 1.0 / np.where(absmax > 0, absmax, 1), 0.0)
    codes = order[np.searchsorted(mids, fp * inv[:, None], side="left")].astype(np.uint8)
    codes = codes.reshape(-1)
    if n % 2:
        codes = np.pad(codes[:n], (0, 1))
    else:
        codes = codes[:n]
    pairs = codes.reshape(-1, 2)
    return (pairs[:, 0] << 4 | pairs[:, 1]).astype(np.uint8), absmax


def _has(name: str) -> bool:
    lib = get_native_library()
    return lib is not None and hasattr(lib, name)


def bf16_to_f32(raw_u16: np.ndarray) -> np.ndarray:
    """bf16 (as uint16 bit patterns) -> float32, multithreaded C++ with a
    numpy fallback — the converter behind the native safetensors reader
    (real HF checkpoints are bf16; numpy has no bf16 dtype)."""
    raw_u16 = np.ascontiguousarray(raw_u16, np.uint16)
    if _has("bf16_to_f32_cpu"):
        out = np.empty(raw_u16.size, np.float32)
        get_native_library().bf16_to_f32_cpu(
            _ptr(raw_u16), _ptr(out), ct.c_long(raw_u16.size)
        )
        return out.reshape(raw_u16.shape)
    return (raw_u16.astype(np.uint32) << 16).view(np.float32).reshape(raw_u16.shape)


def fp16_to_f32(raw_u16: np.ndarray) -> np.ndarray:
    raw_u16 = np.ascontiguousarray(raw_u16, np.uint16)
    if _has("fp16_to_f32_cpu"):
        out = np.empty(raw_u16.size, np.float32)
        get_native_library().fp16_to_f32_cpu(
            _ptr(raw_u16), _ptr(out), ct.c_long(raw_u16.size)
        )
        return out.reshape(raw_u16.shape)
    return raw_u16.view(np.float16).astype(np.float32).reshape(raw_u16.shape)
