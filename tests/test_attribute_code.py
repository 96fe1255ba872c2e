"""Round-trip tests for the attribute codec.

Port of the reference's only real unit test (reference:
DiffuseSG/utils/attribute_code.py:433-483): every (in_encoding, out_encoding)
pair among int/ddpm/one_hot/bits must round-trip exactly on random masked node
and adjacency tensors.
"""
import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from diffusesg_tpu.ops import (
    attribute_converter, dec2bin, bin2dec,
    reshape_node_attr_vec_to_mat, reshape_node_attr_mat_to_vec,
)

ENCODINGS = ["int", "ddpm", "one_hot", "bits"]


def _random_attrs(flag_adjs: bool, batch=32, n=16, k=51, seed=0):
    rs = np.random.RandomState(seed)
    shape = (batch, n, n) if flag_adjs else (batch, n)
    raw = rs.randint(0, k - 1, size=shape).astype(np.float32)
    flags = np.ones((batch, n), dtype=bool)
    for i in range(batch):
        flags[i, rs.randint(0, n):] = False
    mask = flags[:, :, None] & flags[:, None, :] if flag_adjs else flags
    raw = raw * mask
    return jnp.asarray(raw), jnp.asarray(flags)


@pytest.mark.parametrize("flag_adjs", [True, False])
@pytest.mark.parametrize("in_enc,out_enc", list(itertools.product(ENCODINGS, ENCODINGS)))
def test_roundtrip_all_pairs(flag_adjs, in_enc, out_enc):
    k = 51
    raw, flags = _random_attrs(flag_adjs)
    kind = dict(flag_adjs=flag_adjs, flag_nodes=not flag_adjs)

    in_attr = attribute_converter(raw, flags, "int", in_enc, k,
                                  flag_in_ddpm_range=False, flag_out_ddpm_range=True, **kind)
    out_attr = attribute_converter(in_attr, flags, in_enc, out_enc, k,
                                   flag_in_ddpm_range=True, flag_out_ddpm_range=True, **kind)
    back = attribute_converter(out_attr, flags, out_enc, in_enc, k,
                               flag_in_ddpm_range=True, flag_out_ddpm_range=True, **kind)
    np.testing.assert_array_equal(np.asarray(in_attr), np.asarray(back))


def test_dec2bin_bin2dec_inverse():
    vals = jnp.arange(64, dtype=jnp.int32).reshape(4, 16)
    bits = dec2bin(vals, 6)
    assert bits.shape == (4, 16, 6)
    back = bin2dec(bits, 6)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))


def test_ddpm_encoding_range():
    raw, flags = _random_attrs(flag_adjs=False, k=10)
    ddpm = attribute_converter(raw, flags, "int", "ddpm", 10,
                               flag_in_ddpm_range=False, flag_nodes=True)
    arr = np.asarray(ddpm)
    assert arr.min() >= -1.0 and arr.max() <= 1.0


def test_ddpm_quantization_matches_interval_rule():
    """Vectorized quantizer must agree with the reference per-interval loop."""
    k = 7
    x = jnp.asarray(np.linspace(-1.3, 1.3, 101, dtype=np.float32))[None, :]
    flags = jnp.ones((1, 101), dtype=bool)
    got = np.asarray(attribute_converter(x, flags, "ddpm", "int", k,
                                         flag_nodes=True))[0]
    # brute-force reference rule (attribute_code.py:132-158)
    delta = 2.0 / (k - 1)
    expect = np.zeros(101)
    for j, v in enumerate(np.asarray(x)[0]):
        for i in range(k):
            center = -1.0 + i * delta
            lo = -np.inf if i == 0 else center - 0.5 * delta
            hi = np.inf if i == k - 1 else center + 0.5 * delta
            if lo < v <= hi:
                expect[j] = i
                break
    np.testing.assert_array_equal(got, expect)


def test_reshape_vec_mat_roundtrip():
    rs = np.random.RandomState(0)
    b, n, m = 4, 30, 6  # n <= m*m
    vec = rs.randint(0, 9, size=(b, n)).astype(np.float32)
    flags = np.ones((b, n), dtype=bool)
    for i in range(b):
        flags[i, rs.randint(1, n):] = False
    vec = vec * flags
    mat, mat_flags = reshape_node_attr_vec_to_mat(jnp.asarray(vec), jnp.asarray(flags), m)
    assert mat.shape == (b, m, m)
    back, back_flags = reshape_node_attr_mat_to_vec(mat, mat_flags, n)
    np.testing.assert_array_equal(np.asarray(back), vec)
    np.testing.assert_array_equal(np.asarray(back_flags), flags)


def test_reshape_vec_mat_channels():
    rs = np.random.RandomState(1)
    b, n, c, m = 2, 10, 4, 4
    vec = rs.rand(b, n, c).astype(np.float32)
    flags = np.ones((b, n), dtype=bool)
    flags[:, 7:] = False
    vec = vec * flags[..., None]
    mat, mat_flags = reshape_node_attr_vec_to_mat(jnp.asarray(vec), jnp.asarray(flags), m)
    assert mat.shape == (b, m, m, c)
    back, _ = reshape_node_attr_mat_to_vec(mat, mat_flags, n)
    np.testing.assert_allclose(np.asarray(back), vec, atol=1e-6)
