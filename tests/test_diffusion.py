"""Tests for EDM schedules, preconditioning, and the training objective.

Closed-form values validated against the reference formulas
(reference: DiffuseSG/runner/objectives/edm.py:111-179).
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffusesg_tpu.diffusion import (
    get_edm_params, get_vp_params, get_preconditioning_params,
    sample_training_sigmas_weights, NodeAdjEDMObjective,
)
from diffusesg_tpu.diffusion.edm import (
    edm_sigma_grid, vp_sigma_from_t, vp_t_from_sigma, vp_sigma_deriv_t,
)


def test_edm_preconditioning_closed_form():
    sigmas = jnp.asarray([0.002, 0.5, 80.0])
    c_skip, c_out, c_in, c_noise = get_preconditioning_params("edm", sigmas)
    sd = get_edm_params().sigma_data
    s = np.asarray(sigmas)
    np.testing.assert_allclose(np.asarray(c_skip), sd**2 / (s**2 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_out), s * sd / np.sqrt(s**2 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_in), 1 / np.sqrt(sd**2 + s**2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_noise), np.log(s) / 4, rtol=1e-5)


def test_vp_roundtrip():
    t = jnp.asarray([1e-3, 0.5, 1.0])
    sig = vp_sigma_from_t(t)
    back = vp_t_from_sigma(sig)
    np.testing.assert_allclose(np.asarray(back), np.asarray(t), rtol=1e-5)
    d = np.asarray(vp_sigma_deriv_t(t))
    # finite-difference check
    eps = 1e-4
    fd = (np.asarray(vp_sigma_from_t(t + eps)) - np.asarray(vp_sigma_from_t(t - eps))) / (2 * eps)
    np.testing.assert_allclose(d, fd, rtol=5e-3)


def test_training_sigma_distribution_stats(rng):
    p = get_edm_params()
    sigmas, weights = sample_training_sigmas_weights(rng, 100_000, "edm")
    logs = np.log(np.asarray(sigmas))
    assert abs(logs.mean() - p.P_mean) < 0.02
    assert abs(logs.std() - p.P_std) < 0.02
    s = np.asarray(sigmas)
    np.testing.assert_allclose(np.asarray(weights),
                               (s**2 + p.sigma_data**2) / (s * p.sigma_data)**2, rtol=1e-5)


def test_edm_sigma_grid_endpoints():
    grid = edm_sigma_grid(256, 0.002, 80.0, 7.0)
    assert grid.shape == (256,)
    np.testing.assert_allclose(grid[0], 80.0, rtol=1e-12)
    np.testing.assert_allclose(grid[-1], 0.002, rtol=1e-12)
    assert (np.diff(grid) < 0).all()


def test_objective_noising_masked(rng):
    obj = NodeAdjEDMObjective(symmetric_noise=False)
    b, n, c = 4, 8, 5
    rs = np.random.RandomState(0)
    flags = np.ones((b, n), dtype=bool)
    for i in range(b):
        flags[i, rs.randint(1, n):] = False
    adjs = jnp.asarray(rs.rand(b, n, n) * flags[:, :, None] * flags[:, None, :])
    nodes = jnp.asarray(rs.rand(b, n, c) * flags[:, :, None])
    batch = obj.get_input_output(rng, adjs, nodes, jnp.asarray(flags))
    f = flags
    pair_mask = ~(f[:, :, None] & f[:, None, :])
    assert (np.asarray(batch.net_input_a)[pair_mask] == 0).all()
    assert (np.asarray(batch.net_input_x)[~f] == 0).all()
    assert batch.sigmas.shape == (b,)
    # targets are the clean data (x0-prediction)
    np.testing.assert_array_equal(np.asarray(batch.net_target_a), np.asarray(adjs))
    np.testing.assert_array_equal(np.asarray(batch.net_target_x), np.asarray(nodes))


def test_objective_symmetric_mode(rng):
    obj = NodeAdjEDMObjective(symmetric_noise=True)
    b, n = 2, 6
    flags = jnp.ones((b, n), dtype=bool)
    adjs = jnp.zeros((b, n, n))
    nodes = jnp.zeros((b, n, 3))
    batch = obj.get_input_output(rng, adjs, nodes, flags)
    a = np.asarray(batch.net_input_a)
    np.testing.assert_allclose(a, a.transpose(0, 2, 1), atol=1e-6)
