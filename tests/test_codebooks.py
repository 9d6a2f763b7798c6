"""Codebook golden tests — values pinned against the reference's tables
(python_src_quants/functional.py:1020-1099, kernel_quant.cpp:547-756)."""

import numpy as np
import pytest

from bitsandbytes_sycl_tpu import codebooks


def test_nf4_constants():
    code = codebooks.get_4bit_type("nf4")
    assert code.shape == (16,)
    assert code[0] == -1.0 and code[15] == 1.0 and code[7] == 0.0
    # QLoRA paper constants (reference functional.py:1035-1052)
    np.testing.assert_allclose(code[12], 0.44070982933044434, rtol=0)
    np.testing.assert_allclose(code[1], -0.6961928009986877, rtol=0)
    assert np.all(np.diff(code) > 0)  # NF4 is monotone in code order


def test_nf4_matches_create_normal_map():
    """NF4's 16 values are the nonzero entries of the 256-entry normal map."""
    nm = codebooks.create_normal_map()
    nonzero = np.sort(np.unique(nm[np.abs(nm) > 0]))
    nf4 = np.sort(codebooks.get_4bit_type("nf4"))
    np.testing.assert_allclose(np.sort(np.concatenate([nonzero, [0.0]])), nf4, atol=1e-7)


def test_fp4_matches_dequant_tree():
    """FP4 code order must match dDequantizeFP4Tree (kernel_quant.cpp:520-545)."""
    code = codebooks.get_4bit_type("fp4")
    tree = {  # code -> value * 12 (the tree returns value/12 fractions)
        0b0000: 0.0,
        0b0001: 5.208333333e-03,
        0b0010: 0.66666667,
        0b0011: 1.0,
        0b0100: 0.33333333,
        0b0101: 0.5,
        0b0110: 0.16666667,
        0b0111: 0.25,
    }
    for c, v in tree.items():
        np.testing.assert_allclose(code[c], v, rtol=1e-6)
        np.testing.assert_allclose(code[c | 0b1000], -v, rtol=1e-6)


def test_dynamic_map_properties():
    code = codebooks.create_dynamic_map()
    assert code.shape == (256,)
    assert np.all(np.diff(code) >= 0)
    assert code[-1] == 1.0 and code[0] == -1.0 - 0.0 or code[0] < 0
    assert np.min(code) < -0.98
    assert 0.0 in code
    # 256 distinct-ish entries: signed dynamic map has 255 unique + one dup 0
    assert len(np.unique(code)) >= 255


def test_dynamic_map_unsigned():
    code = codebooks.create_dynamic_map(signed=False)
    assert code.shape == (256,)
    assert np.min(code) == 0.0 and np.max(code) == 1.0


def test_linear_map():
    code = codebooks.create_linear_map(signed=True)
    assert code.shape == (256,)
    assert code[0] == -1.0 and code[-1] == 1.0


def test_fp8_map():
    code = codebooks.create_fp8_map(signed=True, exponent_bits=5, precision_bits=2)
    assert code.shape == (256,)
    assert np.max(code) == 1.0 and np.min(code) == -1.0
    assert np.all(np.diff(code) >= 0)


def test_fp8_e4m3_sub_256():
    code = codebooks.create_fp8_map(signed=True, exponent_bits=4, precision_bits=3, total_bits=8)
    assert code.shape == (256,)


def test_af4():
    code = codebooks.get_4bit_type("af4")
    assert code.shape == (16,)
    assert code[0] == 1.0  # reversed paper order, like the reference
    with pytest.raises(NotImplementedError):
        codebooks.get_4bit_type("af4", blocksize=128)


def test_int4():
    code = codebooks.get_4bit_type("int4")
    np.testing.assert_allclose(code[0], 1.0)
    np.testing.assert_allclose(code[15], -1.0)


def test_midpoints_reproduce_nf4_tree_thresholds():
    """The searchsorted boundaries must equal the hard-coded thresholds in
    dQuantizeNF4 (kernel_quant.cpp:705-756)."""
    nf4 = codebooks.get_4bit_type("nf4")
    mids = codebooks.code_midpoints(np.sort(nf4))
    known = [
        0.03979014977812767,  # 0 vs 0.0795803
        0.3893125355243683,  # 0.33791524 vs 0.44070983
        0.8614784181118011,  # 0.72295684 vs 1.0
        -0.8480964004993439,  # -1.0 vs -0.6961928
    ]
    for t in known:
        assert np.min(np.abs(mids - t)) < 1e-7


def test_quantile_map():
    rng = np.random.default_rng(0)
    a = rng.normal(size=4096).astype(np.float32)
    code = codebooks.create_quantile_map(a)
    assert code.shape == (256,)
    assert np.abs(code).max() == 1.0
