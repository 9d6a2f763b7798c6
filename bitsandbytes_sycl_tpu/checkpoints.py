"""Checkpoint interop: bnb-format quant-state serialization, orbax
save/load, HF-Llama import with on-the-fly quantization.

The serialized key format matches bitsandbytes so checkpoints round-trip
with the torch ecosystem (reference QuantState.as_dict/from_dict,
functional.py:686-767; Params4bit.from_prequantized nn/modules.py:270-289;
key constants `quant_state.bitsandbytes__{nf4,fp4}`).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import functional as F
from .types import QuantState
from .utils import pack_dict_to_tensor, unpack_tensor_to_dict

__all__ = [
    "quant_state_as_dict",
    "quant_state_from_dict",
    "export_params4bit",
    "import_params4bit",
    "save_checkpoint",
    "load_checkpoint",
    "load_llama_from_hf",
    "load_gptj_from_hf",
    "read_safetensors",
]

_VALID_QS_KEYS = (
    "absmax",
    "quant_map",
    "nested_absmax",
    "nested_quant_map",
    "quant_state",
    "quant_type",
    "blocksize",
    "dtype",
    "shape",
    "nested_blocksize",
    "nested_dtype",
    "nested_offset",
)


def quant_state_as_dict(qs: QuantState, packed: bool = True) -> Dict[str, Any]:
    """Serialize a QuantState in the bitsandbytes state_dict layout
    (reference functional.py:737-767). With packed=True all non-tensor
    fields are JSON-packed into a uint8 array under
    'quant_state.bitsandbytes__<type>' for safetensors compatibility."""
    d: Dict[str, Any] = {
        "quant_type": qs.quant_type,
        "absmax": np.asarray(qs.absmax),
        "blocksize": qs.blocksize,
        "quant_map": np.asarray(qs.code),
        "dtype": qs.dtype,
        "shape": tuple(qs.shape),
    }
    if qs.nested:
        d.update(
            {
                "nested_absmax": np.asarray(qs.state2.absmax),
                "nested_blocksize": qs.state2.blocksize,
                "nested_quant_map": np.asarray(qs.state2.code),
                "nested_dtype": qs.state2.dtype,
                "nested_offset": float(np.asarray(qs.offset)),
            }
        )
    if not packed:
        return d
    tensors = {k: v for k, v in d.items() if isinstance(v, np.ndarray)}
    non_tensors = {k: v for k, v in d.items() if not isinstance(v, np.ndarray)}
    tensors[f"quant_state.bitsandbytes__{qs.quant_type}"] = pack_dict_to_tensor(non_tensors)
    return tensors


def quant_state_from_dict(d: Dict[str, Any]) -> QuantState:
    """Inverse of quant_state_as_dict; accepts packed or unpacked dicts
    with optional key prefixes (reference functional.py:686-735)."""
    d = dict(d)
    qs_key = [k for k in d if "quant_state" in k and hasattr(d[k], "__len__")]
    if qs_key:
        (key,) = qs_key
        d.update(unpack_tensor_to_dict(d.pop(key)))
    d = {k.split(".")[-1]: v for k, v in d.items()}
    unknown = set(d) - set(_VALID_QS_KEYS)
    if unknown:
        raise ValueError(f"unknown quant-state keys: {unknown}")

    state2 = offset = None
    if "nested_absmax" in d:
        state2 = QuantState(
            absmax=jnp.asarray(np.asarray(d["nested_absmax"])),
            code=jnp.asarray(np.asarray(d["nested_quant_map"])),
            blocksize=int(d["nested_blocksize"]),
            dtype=str(d["nested_dtype"]),
            # state2 describes the quantized top-level absmax vector
            shape=(int(np.asarray(d["absmax"]).size),),
            quant_type="dynamic",
        )
        offset = jnp.asarray(float(d["nested_offset"]), jnp.float32)
    return QuantState(
        absmax=jnp.asarray(np.asarray(d["absmax"])),
        code=jnp.asarray(np.asarray(d["quant_map"])),
        blocksize=int(d["blocksize"]),
        dtype=str(d["dtype"]),
        shape=tuple(int(s) for s in d["shape"]),
        quant_type=str(d["quant_type"]),
        offset=offset,
        state2=state2,
    )


def export_params4bit(packed_data: jax.Array, qs: QuantState, prefix: str = "weight") -> Dict[str, np.ndarray]:
    """Full bnb Linear4bit state-dict entry: '<prefix>' packed payload +
    '<prefix>.<qs keys>' (reference nn/modules.py:436-446)."""
    out = {prefix: np.asarray(packed_data).reshape(-1, 1)}  # bnb stores (n//2, 1)
    for k, v in quant_state_as_dict(qs, packed=True).items():
        out[f"{prefix}.{k}"] = v
    return out


def import_params4bit(state_dict: Dict[str, Any], prefix: str = "weight"):
    """Inverse of export_params4bit -> (packed uint8 flat, QuantState)."""
    qs_items = {
        k[len(prefix) + 1 :]: v
        for k, v in state_dict.items()
        if k.startswith(prefix + ".")
    }
    qs = quant_state_from_dict(qs_items)
    packed = jnp.asarray(np.asarray(state_dict[prefix]).reshape(-1), jnp.uint8)
    return packed, qs


# ---------------------------------------------------------------------------
# orbax pytree checkpoints (weights + optimizer states, sharding-aware)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, tree: Any) -> None:
    """Orbax save of any pytree (quantized params, optimizer states, KV
    caches). Replaces the reference's torch state_dict files — uint8
    payloads and scale pytrees round-trip exactly
    (tested like test_optimizer8bit.py:174-210)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(path, item=target)
    return ckptr.restore(path)


# ---------------------------------------------------------------------------
# HF Llama import (local files; quantize on load)
# ---------------------------------------------------------------------------

_HF_LAYER_MAP = {
    "q_proj": "self_attn.q_proj.weight",
    "k_proj": "self_attn.k_proj.weight",
    "v_proj": "self_attn.v_proj.weight",
    "o_proj": "self_attn.o_proj.weight",
    "gate_proj": "mlp.gate_proj.weight",
    "up_proj": "mlp.up_proj.weight",
    "down_proj": "mlp.down_proj.weight",
    "input_norm": "input_layernorm.weight",
    "post_attn_norm": "post_attention_layernorm.weight",
}

# Gemma-2 sandwich norms rename the roles: HF's post_attention_layernorm
# norms the attention OUTPUT (our attn_out_norm) and the pre-MLP norm is
# pre_feedforward_layernorm (our post_attn_norm slot)
_HF_LAYER_MAP_SANDWICH = {
    **{k: v for k, v in _HF_LAYER_MAP.items() if not k.endswith("_norm")},
    "input_norm": "input_layernorm.weight",
    "attn_out_norm": "post_attention_layernorm.weight",
    "post_attn_norm": "pre_feedforward_layernorm.weight",
    "ffn_out_norm": "post_feedforward_layernorm.weight",
}


def load_llama_from_hf(model_dir: str, cfg=None, use_native_quantizer: bool = True):
    """Load a HuggingFace-format Llama checkpoint directory (safetensors
    or torch .bin) and quantize into our param tree — the parity analog of
    the reference's HF integration test (tests_pvc/test_int8_hf.py) minus
    the torch hook machinery.

    Returns (cfg, params). Reads config.json for dimensions when cfg is
    None. Host-side quantization uses the C++ fast path when available
    (csrc/quant_cpu.cpp), else jnp.
    """
    import json

    from .models.llama import LlamaConfig, _quantize_linear

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    if cfg is None:
        cfg = LlamaConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
            max_seq_len=min(hf.get("max_position_embeddings", 2048), 4096),
            rope_theta=hf.get("rope_theta", 10000.0),
            rms_eps=hf.get("rms_norm_eps", 1e-5),
            tie_embeddings=hf.get("tie_word_embeddings", False),
        )

    tensors = _read_hf_tensors(model_dir)

    def get(name):
        return jnp.asarray(np.asarray(tensors[name], np.float32))

    layers = []
    lmap = (_HF_LAYER_MAP_SANDWICH
            if getattr(cfg, "sandwich_norms", False) else _HF_LAYER_MAP)
    for li in range(cfg.num_layers):
        pre = f"model.layers.{li}."
        layer = {}
        for ours, theirs in lmap.items():
            w = get(pre + theirs)
            layer[ours] = _quantize_linear(w, cfg) if ours.endswith("_proj") else w
        if getattr(cfg, "attn_bias", False):  # Qwen2-style qkv biases
            for b in ("q", "k", "v"):
                layer[f"{b}_bias"] = get(pre + f"self_attn.{b}_proj.bias")
        layers.append(layer)
    params = {
        "embed": get("model.embed_tokens.weight").astype(cfg.dtype),
        "layers": layers,
        "final_norm": get("model.norm.weight"),
    }
    if not cfg.tie_embeddings and "lm_head.weight" in tensors:
        params["lm_head"] = _quantize_linear(get("lm_head.weight"), cfg)
    return cfg, params


def read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Native safetensors reader: mmap the shard, parse the header
    (8-byte LE length + JSON), and return zero-copy views into the file
    pages. Unlike safetensors' numpy framework this handles BF16 (what
    real HF Llama checkpoints ship): BF16 stays a 2-byte ml_dtypes view
    (falling back to the multithreaded C++ converter in
    csrc/quant_cpu.cpp when ml_dtypes is absent), F16 stays numpy
    float16; downstream quantizers upcast one tensor at a time. Integer
    tensors keep their dtypes."""
    import json
    import struct

    def _bf16(b):
        # zero-conversion view when ml_dtypes is available (keeps the
        # loaded dict at 2 bytes/elem); else the C++/numpy converter
        try:
            import ml_dtypes

            return np.frombuffer(b, ml_dtypes.bfloat16)
        except ImportError:
            from .native import bf16_to_f32

            return bf16_to_f32(np.frombuffer(b, np.uint16))

    _CONVERT = {
        "F32": lambda b: np.frombuffer(b, np.float32),
        "F64": lambda b: np.frombuffer(b, np.float64).astype(np.float32),
        # F16 stays float16 (numpy-native) — materializing f32 here would
        # double host RAM for a whole checkpoint; downstream quantizers
        # upcast one tensor at a time
        "F16": lambda b: np.frombuffer(b, np.float16),
        "BF16": _bf16,
        "I64": lambda b: np.frombuffer(b, np.int64),
        "U64": lambda b: np.frombuffer(b, np.uint64),
        "I32": lambda b: np.frombuffer(b, np.int32),
        "U32": lambda b: np.frombuffer(b, np.uint32),
        "I16": lambda b: np.frombuffer(b, np.int16),
        "U16": lambda b: np.frombuffer(b, np.uint16),
        "I8": lambda b: np.frombuffer(b, np.int8),
        "U8": lambda b: np.frombuffer(b, np.uint8),
        "BOOL": lambda b: np.frombuffer(b, np.bool_),
    }
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
    data = np.memmap(path, np.uint8, mode="r", offset=8 + hlen)
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        lo, hi = meta["data_offsets"]
        # memmap slice: frombuffer keeps the array file-backed (zero-copy)
        arr = _CONVERT[meta["dtype"]](data[lo:hi])
        out[name] = arr.reshape(meta["shape"])
    return out


def _read_hf_tensors(model_dir: str) -> Dict[str, np.ndarray]:
    """Read all tensors from safetensors shards (preferred) or torch bins."""
    files = sorted(os.listdir(model_dir))
    st = [f for f in files if f.endswith(".safetensors")]
    out: Dict[str, np.ndarray] = {}
    if st:
        for fname in st:
            out.update(read_safetensors(os.path.join(model_dir, fname)))
        return out
    bins = [f for f in files if f.endswith(".bin")]
    if bins:
        import torch

        for fname in bins:
            sd = torch.load(os.path.join(model_dir, fname), map_location="cpu", weights_only=True)
            for k, v in sd.items():
                out[k] = v.float().numpy()
        return out
    raise FileNotFoundError(f"no safetensors/bin weights in {model_dir}")


def load_gptj_from_hf(model_dir: str, cfg=None, quant: str = "nf4"):
    """Load a HuggingFace GPT-J checkpoint directory and quantize into our
    param tree (the reference's integration test model,
    tests_pvc/test_int8_hf.py). Returns (cfg, params)."""
    import json

    from .models.gptj import GPTJConfig
    from .models.llama import _quantize_linear

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    if cfg is None:
        cfg = GPTJConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["n_embd"],
            num_layers=hf["n_layer"],
            num_heads=hf["n_head"],
            rotary_dim=hf.get("rotary_dim", 64),
            max_seq_len=min(hf.get("n_positions", 2048), 4096),
            ln_eps=hf.get("layer_norm_epsilon", 1e-5),
            quant=quant,
        )
    tensors = _read_hf_tensors(model_dir)

    def get(name):
        return jnp.asarray(np.asarray(tensors[name], np.float32))

    layers = []
    for li in range(cfg.num_layers):
        pre = f"transformer.h.{li}."
        layers.append({
            "ln_w": get(pre + "ln_1.weight"),
            "ln_b": get(pre + "ln_1.bias"),
            "q_proj": _quantize_linear(get(pre + "attn.q_proj.weight"), cfg),
            "k_proj": _quantize_linear(get(pre + "attn.k_proj.weight"), cfg),
            "v_proj": _quantize_linear(get(pre + "attn.v_proj.weight"), cfg),
            "out_proj": _quantize_linear(get(pre + "attn.out_proj.weight"), cfg),
            "fc_in": _quantize_linear(get(pre + "mlp.fc_in.weight"), cfg),
            "fc_in_b": get(pre + "mlp.fc_in.bias"),
            "fc_out": _quantize_linear(get(pre + "mlp.fc_out.weight"), cfg),
            "fc_out_b": get(pre + "mlp.fc_out.bias"),
        })
    params = {
        "wte": get("transformer.wte.weight").astype(cfg.dtype),
        "layers": layers,
        "ln_f_w": get("transformer.ln_f.weight"),
        "ln_f_b": get("transformer.ln_f.bias"),
        "lm_head": _quantize_linear(get("lm_head.weight"), cfg),
        "lm_head_b": (
            get("lm_head.bias")
            if "lm_head.bias" in tensors
            else jnp.zeros((cfg.vocab_size,), jnp.float32)
        ),
    }
    return cfg, params
