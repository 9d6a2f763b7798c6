"""Checkpoint interop, utils, and the native host quantizer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bitsandbytes_sycl_tpu as bnb
from bitsandbytes_sycl_tpu import checkpoints as C
from bitsandbytes_sycl_tpu import functional as F
from bitsandbytes_sycl_tpu import native, utils


def test_pack_unpack_dict():
    d = {"quant_type": "nf4", "blocksize": 64, "shape": [4, 8], "dtype": "bfloat16"}
    t = utils.pack_dict_to_tensor(d)
    assert t.dtype == np.uint8
    assert utils.unpack_tensor_to_dict(t) == d


@pytest.mark.parametrize("nested", [False, True])
def test_quant_state_roundtrip(nested):
    a = jnp.asarray(np.random.default_rng(0).normal(size=(64, 128)), jnp.float32)
    packed, qs = F.quantize_4bit(a, quant_type="nf4", compress_statistics=nested)
    d = C.quant_state_as_dict(qs, packed=True)
    assert f"quant_state.bitsandbytes__nf4" in d
    qs2 = C.quant_state_from_dict(d)
    assert qs2.blocksize == qs.blocksize and qs2.quant_type == "nf4"
    assert qs2.shape == qs.shape and qs2.nested == nested
    out1 = np.asarray(F.dequantize_4bit(packed, qs))
    out2 = np.asarray(F.dequantize_4bit(packed, qs2))
    np.testing.assert_allclose(out1, out2, atol=1e-6)


def test_params4bit_state_dict_roundtrip():
    """bnb Linear4bit state-dict key layout (nn/modules.py:436-446)."""
    a = jnp.asarray(np.random.default_rng(1).normal(size=(32, 64)), jnp.float32)
    packed, qs = F.quantize_4bit(a, quant_type="fp4")
    sd = C.export_params4bit(packed, qs, prefix="model.layer.weight")
    assert "model.layer.weight" in sd
    assert sd["model.layer.weight"].shape == (a.size // 2, 1)  # bnb (n//2,1)
    p2, qs2 = C.import_params4bit(sd, prefix="model.layer.weight")
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(p2))
    np.testing.assert_allclose(
        np.asarray(F.dequantize_4bit(packed, qs)), np.asarray(F.dequantize_4bit(p2, qs2)), atol=1e-6
    )


def test_orbax_checkpoint_roundtrip(tmp_path):
    tree = {
        "packed": jnp.arange(32, dtype=jnp.uint8),
        "absmax": jnp.ones((4,), jnp.float32),
        "nested": {"count": jnp.asarray(3)},
    }
    path = os.path.join(str(tmp_path), "ckpt")
    C.save_checkpoint(path, tree)
    back = C.load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(back["packed"]), np.asarray(tree["packed"]))
    np.testing.assert_array_equal(np.asarray(back["absmax"]), np.asarray(tree["absmax"]))


def test_native_library_builds():
    lib = native.get_native_library()
    assert lib is not None, "g++ build of csrc/quant_cpu.cpp failed"


def test_native_quantize_blockwise_matches_jnp():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(4096 + 17,)).astype(np.float32)
    code = np.asarray(bnb.codebooks.create_dynamic_map())
    codes_c, absmax_c = native.quantize_blockwise_np(a, code, 256)
    q_j, qs = F.quantize_blockwise(jnp.asarray(a), blocksize=256)
    np.testing.assert_array_equal(codes_c, np.asarray(q_j))
    np.testing.assert_allclose(absmax_c, np.asarray(qs.absmax), rtol=1e-6)


@pytest.mark.parametrize("qt", ["nf4", "fp4"])
def test_native_quantize_4bit_matches_jnp(qt):
    rng = np.random.default_rng(3)
    a = rng.normal(size=(128, 64)).astype(np.float32)
    code = bnb.codebooks.get_4bit_type(qt)
    packed_c, absmax_c = native.quantize_4bit_np(a, code, 64)
    packed_j, qs = F.quantize_4bit(jnp.asarray(a), blocksize=64, quant_type=qt)
    np.testing.assert_array_equal(packed_c, np.asarray(packed_j))
    np.testing.assert_allclose(absmax_c, np.asarray(qs.absmax), rtol=1e-6)


def test_find_outlier_dims():
    rng = np.random.default_rng(4)
    w = rng.normal(size=(64, 128)).astype(np.float32)
    w[:, 7] *= 50.0
    mask = np.asarray(utils.find_outlier_dims(jnp.asarray(w), zscore=4.0))
    assert mask[7] and mask.sum() == 1
    idx = np.asarray(utils.find_outlier_dims(jnp.asarray(w), topk=1))
    assert idx[0] == 7


def test_outlier_tracer():
    tracer = utils.OutlierTracer.get_instance()
    w = jnp.asarray(np.random.default_rng(5).normal(size=(32, 64)), jnp.float32)
    o1 = tracer.get_outliers(w)
    o2 = tracer.get_outliers(w)  # cached
    np.testing.assert_array_equal(o1, o2)


def test_replace_linear():
    params = {"dense": {"kernel": jnp.ones((64, 128))}, "norm": jnp.ones((64,))}
    q = utils.replace_linear(params, quant_type="nf4")
    assert "packed" in q["dense"]["kernel"]


def test_optimizer_resume_roundtrip_mid_training(tmp_path):
    """Reference test_optimizer8bit.py:174-210: save the full training
    state mid-run, restore, and verify continued training is bit-identical
    to the uninterrupted run (uint8 states + absmax survive the trip)."""
    import optax
    from bitsandbytes_sycl_tpu import optim as bnb_optim
    from bitsandbytes_sycl_tpu.checkpoints import load_checkpoint, save_checkpoint

    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(size=(8192,)) * 0.1, jnp.float32)}
    opt = bnb_optim.adam(optim_bits=8, learning_rate=1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        g = {"w": jnp.sin(p["w"])}
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s

    for _ in range(10):
        params, state = step(params, state)

    save_checkpoint(str(tmp_path / "ckpt"), {"params": params, "opt": state})
    restored = load_checkpoint(str(tmp_path / "ckpt"), {"params": params, "opt": state})

    p_cont, s_cont = params, state
    p_rest, s_rest = restored["params"], restored["opt"]
    # restored state arrays must be exactly what was saved
    assert np.array_equal(
        np.asarray(jax.tree.leaves(s_rest)[0]), np.asarray(jax.tree.leaves(s_cont)[0])
    )
    for _ in range(10):
        p_cont, s_cont = step(p_cont, s_cont)
        p_rest, s_rest = step(p_rest, s_rest)
    np.testing.assert_array_equal(np.asarray(p_cont["w"]), np.asarray(p_rest["w"]))
    u8 = [l for l in jax.tree.leaves(s_cont.inner) if l.dtype == jnp.uint8]
    u8r = [l for l in jax.tree.leaves(s_rest.inner) if l.dtype == jnp.uint8]
    for a, b in zip(u8, u8r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_debug_checked_catches_nan():
    from bitsandbytes_sycl_tpu.utils.debug import checked, nan_guard

    @checked
    def f(x):
        nan_guard({"x": x}, "inputs")
        return x * 2

    assert float(f(jnp.ones(4))[0]) == 2.0
    with pytest.raises(Exception):
        f(jnp.array([1.0, jnp.nan, 0.0, 0.0]))


def test_debug_check_quant_state():
    from jax.experimental import checkify
    from bitsandbytes_sycl_tpu.utils.debug import check_quant_state
    from bitsandbytes_sycl_tpu import functional as F

    packed, qs = F.quantize_nf4(jnp.ones((64, 64)))

    def f():
        check_quant_state(packed, qs)
        return jnp.zeros(())

    err, _ = checkify.checkify(f)()
    checkify.check_error(err)  # no error on a healthy state


def test_native_safetensors_reader_handles_bf16(tmp_path):
    """read_safetensors parses shards natively (mmap + C++ converters) —
    including BF16, which safetensors' numpy framework cannot load and
    which real HF Llama checkpoints ship."""
    import json
    import struct

    from bitsandbytes_sycl_tpu.checkpoints import read_safetensors

    rng = np.random.default_rng(0)
    f32 = rng.normal(size=(4, 8)).astype(np.float32)
    f16 = rng.normal(size=(3, 5)).astype(np.float16)
    bf_src = rng.normal(size=(2, 6)).astype(np.float32)
    bf16_bits = (bf_src.view(np.uint32) >> 16).astype(np.uint16)  # truncate
    i64 = np.arange(7, dtype=np.int64)

    bufs = {
        "a_f32": ("F32", f32.tobytes(), f32.shape),
        "b_f16": ("F16", f16.tobytes(), f16.shape),
        "c_bf16": ("BF16", bf16_bits.tobytes(), bf_src.shape),
        "d_i64": ("I64", i64.tobytes(), i64.shape),
    }
    header, blob, off = {}, b"", 0
    for name, (dt, raw, shape) in bufs.items():
        header[name] = {"dtype": dt, "shape": list(shape),
                        "data_offsets": [off, off + len(raw)]}
        blob += raw
        off += len(raw)
    hjson = json.dumps(header).encode()
    path = tmp_path / "model.safetensors"
    path.write_bytes(struct.pack("<Q", len(hjson)) + hjson + blob)

    out = read_safetensors(str(path))
    np.testing.assert_array_equal(out["a_f32"], f32)
    np.testing.assert_array_equal(out["b_f16"], f16.astype(np.float32))
    np.testing.assert_array_equal(
        out["c_bf16"], (bf16_bits.astype(np.uint32) << 16).view(np.float32)
    )
    np.testing.assert_array_equal(out["d_i64"], i64)
