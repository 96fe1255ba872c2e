"""Full-sampler reverse-ODE trajectory parity vs the PyTorch reference.

Runs the reference NodeAdjEDMSampler.sample (S_churn=0, deterministic linear
denoiser, fixed init noise; reference: DiffuseSG/runner/mcmc_sampler/edm.py:291-445)
against the scan sampler for 16 steps and asserts the trajectories (interim
snapshots + final) match at fp32 tolerance, for the edm / vp / ve
discretization families.  This closes the last unverified composition: the
per-step coefficient tables, churn gating, Heun reuse-x_hat quirk, self-cond
carry and masking all in one end-to-end check.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusesg_tpu.sampling.edm_sampler import NodeAdjEDMSampler

REF = "/root/reference/DiffuseSG"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_sampler_mod():
    sys.path.insert(0, REF)
    import importlib
    mod = importlib.import_module("runner.mcmc_sampler.edm")
    yield mod
    sys.path.remove(REF)


# deterministic "denoiser": linear in x, sigma and the self-cond inputs so a
# wiring mistake in any of them breaks parity
def _lin_denoise(adjs_in, nodes_in, sigmas, sc_a, sc_x, xp):
    sig_a = sigmas.reshape((-1, 1, 1))
    sig_x = sigmas.reshape((-1, 1, 1))
    D_a = 0.7 * adjs_in - 0.05 + 0.02 * sig_a / (1.0 + sig_a) + 0.1 * sc_a
    D_x = 0.6 * nodes_in + 0.03 - 0.01 * sig_x / (1.0 + sig_x) + 0.2 * sc_x
    return D_a, D_x


class _RefModel:
    """Duck-typed preconditioned model for the reference sampler (it only
    needs __call__ and round_sigma; sampling_utils-style wrapper)."""

    @staticmethod
    def round_sigma(sigma):
        return torch.as_tensor(sigma)

    def __call__(self, adjs_in, nodes_in, node_flags, sigmas, sc_a, sc_x):
        sc_a = torch.zeros_like(adjs_in) if sc_a is None else sc_a
        sc_x = torch.zeros_like(nodes_in) if sc_x is None else sc_x
        return _lin_denoise(adjs_in, nodes_in, sigmas.to(adjs_in.dtype), sc_a,
                            sc_x, torch)


CONFIGS = [
    # (discretization, schedule, scaling, atol) — the EDM paper's families.
    # The reference is run with flag_use_double=True (its fp64 path): our fp32
    # scan with fp64-precomputed coefficient tables tracks the fp64 ODE to the
    # tolerances below, whereas the reference's own fp32 vp run drifts ~2e-2
    # from its fp64 run (fp32 `exp(x)-1` cancellation in get_vp_sigma_from_t
    # at t ~ 1e-3, objectives/edm.py:66-68) — so fp64 is the meaningful
    # parity target.
    ("edm", "linear", "none", 2e-5),
    ("vp", "vp", "vp", 2e-4),
    ("ve", "ve", "none", 2e-5),
    ("iddpm", "linear", "none", 6e-4),
]


@pytest.mark.parametrize("disc,schedule,scaling,atol", CONFIGS)
@pytest.mark.parametrize("self_cond", [False, True])
def test_full_trajectory_parity(ref_sampler_mod, disc, schedule, scaling, atol, self_cond):
    num_steps = 16
    b, n = 2, 8
    rs = np.random.RandomState(0)
    flags_np = np.ones((b, n), bool)
    flags_np[0, 5:] = False
    flags_np[1, 7:] = False
    init_a = rs.randn(b, n, n).astype(np.float32) * flags_np[:, :, None] * flags_np[:, None, :]
    init_x = (rs.randn(b, n, 3).astype(np.float32) * flags_np[:, :, None])

    ref = ref_sampler_mod.NodeAdjEDMSampler(
        solver="heun", discretization=disc, schedule=schedule, scaling=scaling,
        num_steps=num_steps, S_churn=0.0, S_min=0.0, S_max=float("inf"), S_noise=1.0,
        clip_samples=False, clip_samples_min=None, clip_samples_max=None,
        clip_samples_scope="x_0", self_condition=self_cond, dev="cpu",
        objective="edm", symmetric_noise=False)
    with torch.no_grad():
        ref_a, ref_x, ref_tr_a, ref_tr_x = ref.sample(
            _RefModel(), torch.from_numpy(flags_np),
            init_adjs=torch.from_numpy(init_a), init_nodes=torch.from_numpy(init_x),
            flag_interim_adjs=True, max_num_interim_adjs=4, flag_use_double=True,
            flag_node_multi_channel=True, flag_adj_multi_channel=False,
            num_node_chan=3, num_edge_chan=1)

    ours = NodeAdjEDMSampler(
        solver="heun", discretization=disc, schedule=schedule, scaling=scaling,
        num_steps=num_steps, S_churn=0.0, S_min=0.0, S_max=float("inf"), S_noise=1.0,
        self_condition=self_cond, symmetric_noise=False)

    def denoiser(a, x, sigmas, sc_a, sc_x):
        return _lin_denoise(a, x, sigmas, sc_a, sc_x, jnp)

    out = jax.jit(lambda r, f: ours.sample(
        denoiser, r, f, 3, 1, init_adjs=jnp.asarray(init_a),
        init_nodes=jnp.asarray(init_x), num_interim=4))(
            jax.random.PRNGKey(0), jnp.asarray(flags_np))
    got_a, got_x, tr_a, tr_x = [np.asarray(t) for t in out]

    np.testing.assert_allclose(got_a, ref_a.numpy(), rtol=1e-4, atol=atol)
    np.testing.assert_allclose(got_x, ref_x.numpy(), rtol=1e-4, atol=atol)
    # interim snapshots: slot 0 = init, then steps linspace(0,16,4)->[0,5,10,15]
    assert tr_a.shape[0] == ref_tr_a.shape[0] == 5
    np.testing.assert_allclose(tr_a, ref_tr_a.numpy(), rtol=1e-4, atol=atol)
    np.testing.assert_allclose(tr_x, ref_tr_x.numpy(), rtol=1e-4, atol=atol)


@pytest.mark.parametrize("disc,schedule,scaling,_atol", CONFIGS)
def test_sigma_grid_parity(ref_sampler_mod, disc, schedule, scaling, _atol):
    """The float64 sigma grid + t grid match the reference for every
    discretization (extends the round-1 edm/iddpm grid checks to vp/ve)."""
    from diffusesg_tpu.sampling.edm_sampler import _np_schedules, _np_sigma_grid, \
        _DEFAULT_SIGMA_RANGES

    ref = ref_sampler_mod.NodeAdjEDMSampler(
        solver="heun", discretization=disc, schedule=schedule, scaling=scaling,
        num_steps=32, S_churn=0.0, S_min=0.0, S_max=float("inf"), S_noise=1.0,
        clip_samples=False, clip_samples_min=None, clip_samples_max=None,
        clip_samples_scope="x_0", self_condition=False, dev="cpu",
        objective="edm", symmetric_noise=False)

    smin, smax = _DEFAULT_SIGMA_RANGES[disc]
    if disc == "vp":
        sig_vp, _, _ = _np_schedules("vp")
        smin, smax = float(sig_vp(1e-3)), float(sig_vp(1.0))
    ours_sigma = _np_sigma_grid(disc, 32, smin, smax)
    # iddpm: the reference's alpha_bar multiplies an int64 torch.arange by a
    # python float, which promotes to float32 (edm.py:79-81) — its u-grid is
    # fp32-accurate only; ours stays float64, hence the looser tolerance.
    rtol = 1e-3 if disc == "iddpm" else 1e-9
    np.testing.assert_allclose(ours_sigma, ref.sigma_steps.numpy(), rtol=rtol)

    _, _, sigma_inv = _np_schedules(schedule)
    ours_t = sigma_inv(ours_sigma)
    np.testing.assert_allclose(ours_t, ref.sigma_inv(ref.sigma_steps).numpy(), rtol=rtol)


@pytest.fixture(scope="module")
def ref_precond_mod():
    sys.path.insert(0, REF)
    import importlib
    mod = importlib.import_module("model.precond.precond")
    yield mod
    sys.path.remove(REF)


def test_precond_self_cond_refresh_quirk_parity(ref_sampler_mod,
                                                ref_precond_mod, monkeypatch):
    """The reference's UNGATED precond-level stochastic self-conditioning at
    sampling time (precond.py:90-98 has no training check, and the eval path
    wraps with self_condition=True, learning_utils.py:71-75): per model call,
    with p=0.5 the sampler's self-cond carry is replaced by a refreshed
    estimate D(x, sc=D(x, sc=carry)).  Our sampler mirrors it behind
    ``precond_self_cond_refresh_p``; this pins the MECHANISM by forcing the
    Bernoulli to 1 on both sides (reference np.random.rand -> 0.0, ours
    p=1.0) and comparing full trajectories through a REAL reference
    NodeAdjPrecond around a linear raw model."""
    from diffusesg_tpu.models.precond import precond_forward

    num_steps = 12
    b, n, cx = 2, 8, 3
    rs = np.random.RandomState(3)
    flags_np = np.ones((b, n), bool)
    flags_np[0, 5:] = False
    init_a = rs.randn(b, n, n).astype(np.float32) * (
        flags_np[:, :, None] * flags_np[:, None, :])
    init_x = rs.randn(b, n, cx).astype(np.float32) * flags_np[:, :, None]

    class _RawTorch(torch.nn.Module):
        def forward(self, a_in, x_in, node_flags, c_noise, sc_a, sc_x, **kw):
            sc_a = torch.zeros_like(a_in) if sc_a is None else sc_a
            sc_x = torch.zeros_like(x_in) if sc_x is None else sc_x
            cn = c_noise.to(a_in.dtype)
            F_a = 0.5 * a_in + 0.1 * sc_a + 0.02 * cn.view(-1, 1, 1)
            F_x = 0.6 * x_in + 0.2 * sc_x - 0.01 * cn.view(-1, 1, 1)
            return F_a, F_x

    ref_model = ref_precond_mod.NodeAdjPrecond(
        precond="edm", model=_RawTorch(), self_condition=True,
        symmetric_noise=False)
    monkeypatch.setattr(ref_precond_mod.np.random, "rand", lambda *a: 0.0)

    ref = ref_sampler_mod.NodeAdjEDMSampler(
        solver="heun", discretization="edm", schedule="linear", scaling="none",
        num_steps=num_steps, S_churn=0.0, S_min=0.0, S_max=float("inf"),
        S_noise=1.0, clip_samples=False, clip_samples_min=None,
        clip_samples_max=None, clip_samples_scope="x_0", self_condition=True,
        dev="cpu", objective="edm", symmetric_noise=False)
    with torch.no_grad():
        ref_a, ref_x = ref.sample(
            ref_model, torch.from_numpy(flags_np),
            init_adjs=torch.from_numpy(init_a),
            init_nodes=torch.from_numpy(init_x), flag_use_double=True,
            flag_node_multi_channel=True, num_node_chan=cx, num_edge_chan=1)

    flags_j = jnp.asarray(flags_np)

    def denoiser(a, x, sigmas, sc_a, sc_x):
        def model_fn(aa, xx, f, cn, s_a, s_x):
            s_a = jnp.zeros_like(aa) if s_a is None else s_a
            s_x = jnp.zeros_like(xx) if s_x is None else s_x
            F_a = 0.5 * aa + 0.1 * s_a + 0.02 * cn[:, None, None]
            F_x = 0.6 * xx + 0.2 * s_x - 0.01 * cn[:, None, None]
            return F_a, F_x
        return precond_forward(model_fn, "edm", a, x, flags_j, sigmas,
                               sc_a, sc_x)

    ours = NodeAdjEDMSampler(
        solver="heun", discretization="edm", schedule="linear", scaling="none",
        num_steps=num_steps, S_churn=0.0, S_min=0.0, S_max=float("inf"),
        S_noise=1.0, self_condition=True, symmetric_noise=False,
        precond_self_cond_refresh_p=1.0)
    got_a, got_x = [np.asarray(t) for t in jax.jit(
        lambda r, f: ours.sample(denoiser, r, f, cx, 1,
                                 init_adjs=jnp.asarray(init_a),
                                 init_nodes=jnp.asarray(init_x)))(
        jax.random.PRNGKey(0), flags_j)]

    np.testing.assert_allclose(got_a, ref_a.numpy(), rtol=1e-4, atol=3e-5)
    np.testing.assert_allclose(got_x, ref_x.numpy(), rtol=1e-4, atol=3e-5)

    # and with the quirk OFF (reference rand -> 1.0 vs our default p=0) the
    # trajectories also agree — proving the flag isolates exactly this branch
    monkeypatch.setattr(ref_precond_mod.np.random, "rand", lambda *a: 1.0)
    with torch.no_grad():
        ref_a0, _ = ref.sample(
            ref_model, torch.from_numpy(flags_np),
            init_adjs=torch.from_numpy(init_a),
            init_nodes=torch.from_numpy(init_x), flag_use_double=True,
            flag_node_multi_channel=True, num_node_chan=cx, num_edge_chan=1)
    ours0 = NodeAdjEDMSampler(
        solver="heun", discretization="edm", schedule="linear", scaling="none",
        num_steps=num_steps, S_churn=0.0, S_min=0.0, S_max=float("inf"),
        S_noise=1.0, self_condition=True, symmetric_noise=False)
    got_a0, _ = [np.asarray(t) for t in jax.jit(
        lambda r, f: ours0.sample(denoiser, r, f, cx, 1,
                                  init_adjs=jnp.asarray(init_a),
                                  init_nodes=jnp.asarray(init_x)))(
        jax.random.PRNGKey(0), flags_j)]
    np.testing.assert_allclose(got_a0, ref_a0.numpy(), rtol=1e-4, atol=3e-5)
    # the two modes genuinely differ (the quirk changes the ODE trajectory)
    assert np.abs(got_a - got_a0).max() > 1e-3
