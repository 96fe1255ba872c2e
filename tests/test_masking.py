"""Tests for ops.masking — mask/symmetry/noise primitives."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusesg_tpu.ops import (
    mask_adjs, mask_nodes, symmetrize, check_adjs_symmetry,
    get_sym_normal_noise, add_sym_normal_noise, pad_adjs, adj_mask_2d,
)


def _flags(b=4, n=8, seed=0):
    rs = np.random.RandomState(seed)
    flags = np.zeros((b, n), dtype=bool)
    for i in range(b):
        k = rs.randint(1, n + 1)
        flags[i, :k] = True
    return jnp.asarray(flags)


def test_mask_adjs_row_col():
    flags = _flags()
    adjs = jnp.ones((4, 8, 8))
    out = np.asarray(mask_adjs(adjs, flags))
    f = np.asarray(flags)
    expect = f[:, :, None] * f[:, None, :]
    np.testing.assert_allclose(out, expect)


def test_mask_adjs_channels_last():
    flags = _flags()
    adjs = jnp.ones((4, 8, 8, 3))
    out = np.asarray(mask_adjs(adjs, flags))
    f = np.asarray(flags)
    expect = np.broadcast_to((f[:, :, None] * f[:, None, :])[..., None], out.shape)
    np.testing.assert_allclose(out, expect)


def test_mask_adjs_value_fill():
    flags = _flags()
    adjs = jnp.ones((4, 8, 8))
    out = np.asarray(mask_adjs(adjs, flags, value=-5.0))
    f = np.asarray(flags)
    mask = (f[:, :, None] * f[:, None, :]).astype(bool)
    assert (out[mask] == 1.0).all()
    assert (out[~mask] == -5.0).all()


def test_mask_adjs_elementwise_flags():
    flags3 = jnp.asarray(np.random.RandomState(0).rand(4, 8, 8) > 0.5)
    adjs = jnp.ones((4, 8, 8))
    out = np.asarray(mask_adjs(adjs, flags3))
    np.testing.assert_allclose(out, np.asarray(flags3).astype(np.float32))


def test_mask_adjs_col_only():
    flags = _flags()
    adjs = jnp.ones((4, 8, 8))
    out = np.asarray(mask_adjs(adjs, flags, col_only=True))
    f = np.asarray(flags)
    expect = np.broadcast_to(f[:, None, :], out.shape)
    np.testing.assert_allclose(out, expect)


def test_mask_nodes_shapes():
    flags = _flags()
    f = np.asarray(flags)
    n2 = np.asarray(mask_nodes(jnp.ones((4, 8)), flags))
    np.testing.assert_allclose(n2, f)
    n3 = np.asarray(mask_nodes(jnp.ones((4, 8, 5)), flags))
    np.testing.assert_allclose(n3, np.broadcast_to(f[..., None], n3.shape))


def test_mask_nodes_noop_for_3d_flags():
    # node-only mode: [B, N, N] flags -> no-op (reference graph_utils.py:51-54)
    flags3 = jnp.ones((4, 8, 8))
    nodes = jnp.full((4, 8), 7.0)
    np.testing.assert_allclose(np.asarray(mask_nodes(nodes, flags3)), 7.0)


def test_mask_nodes_along_dim():
    flags = _flags()
    x = jnp.ones((4, 3, 8, 2))
    out = np.asarray(mask_nodes(x, flags, along_dim=2))
    f = np.asarray(flags)
    expect = np.broadcast_to(f[:, None, :, None], out.shape)
    np.testing.assert_allclose(out, expect)


def test_sym_noise_is_symmetric_zero_diag(rng):
    noise = np.asarray(get_sym_normal_noise(rng, (4, 8, 8)))
    np.testing.assert_allclose(noise, noise.transpose(0, 2, 1), atol=0)
    np.testing.assert_allclose(np.diagonal(noise, axis1=1, axis2=2), 0.0)
    # channels-last 4D
    noise4 = np.asarray(get_sym_normal_noise(rng, (2, 8, 8, 3)))
    np.testing.assert_allclose(noise4, noise4.transpose(0, 2, 1, 3), atol=0)


def test_add_sym_normal_noise_masked(rng):
    flags = _flags()
    adjs = jnp.zeros((4, 8, 8))
    sigmas = jnp.full((4,), 2.0)
    scales = jnp.ones((4,))
    out, noise = add_sym_normal_noise(rng, adjs, scales, sigmas, flags)
    assert bool(check_adjs_symmetry(out))
    f = np.asarray(flags)
    mask = ~(f[:, :, None] * f[:, None, :]).astype(bool)
    assert (np.asarray(out)[mask] == 0).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(noise))


def test_add_nonsym_noise_nodes(rng):
    flags = _flags()
    nodes = jnp.zeros((4, 8, 5))
    out, noise = add_sym_normal_noise(rng, nodes, jnp.ones((4,)), jnp.ones((4,)),
                                      flags, non_symmetric=True)
    f = np.asarray(flags)
    assert (np.asarray(out)[~f] == 0).all()


def test_symmetrize():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 4))
    s = symmetrize(x)
    assert bool(check_adjs_symmetry(s, tol=1e-5))


def test_pad_adjs():
    a = np.ones((3, 3))
    out = pad_adjs(a, 5)
    assert out.shape == (5, 5)
    assert out[:3, :3].sum() == 9 and out.sum() == 9
    with pytest.raises(ValueError):
        pad_adjs(np.ones((6, 6)), 5)


def test_adj_mask_2d():
    flags = _flags()
    m = np.asarray(adj_mask_2d(flags))
    f = np.asarray(flags)
    np.testing.assert_array_equal(m, f[:, :, None] & f[:, None, :])


def test_masking_zeroes_nan_inf_in_padded_entries():
    """masked_fill_ semantics (reference graph_utils.py:5-38): NaN/Inf in
    INVALID entries must come out as the fill value, not 0*NaN=NaN."""
    import jax.numpy as jnp
    from diffusesg_tpu.ops.masking import mask_adjs, mask_nodes

    flags = np.array([[True, True, False]])
    adjs = np.ones((1, 3, 3), np.float32)
    adjs[0, 2, 0] = np.nan
    adjs[0, 0, 2] = np.inf
    out = np.asarray(mask_adjs(jnp.asarray(adjs), jnp.asarray(flags)))
    assert np.isfinite(out).all()
    assert out[0, 2, 0] == 0.0 and out[0, 0, 2] == 0.0

    nodes = np.ones((1, 3, 2), np.float32)
    nodes[0, 2, :] = np.nan
    outn = np.asarray(mask_nodes(jnp.asarray(nodes), jnp.asarray(flags)))
    assert np.isfinite(outn).all() and (outn[0, 2] == 0.0).all()
