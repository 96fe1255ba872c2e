"""Adj-only (pure-graph) variants: precond wrapper + sampler.

Cross-validates the adj-only preconditioning (models/precond.py
precond_forward_adj / precond_forward_train_adj vs reference
DiffuseSG/model/precond/precond.py:9-57) and the adj-only sampler
(sampling/edm_sampler.py AdjEDMSampler path vs reference
runner/mcmc_sampler/edm.py:121-230) against the live reference code with a
deterministic duck-typed denoiser, plus the lobster-graph metric
(eval/graph_stats.py vs reference evaluation/stats.py:197-239) and the
eval_sample_batch debug helper (reference utils/sampling_utils.py:63-78).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/DiffuseSG"
pytestmark = [pytest.mark.slow,  # live-reference adj-only cross-validation
              pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")]

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "helpers"))
import ref_shims  # noqa: E402


@pytest.fixture(scope="module")
def ref_env():
    ref_shims.install_all()
    ref_shims.ref_on_path()
    import importlib
    mods = {
        "precond": importlib.import_module("model.precond.precond"),
        "sampler": importlib.import_module("runner.mcmc_sampler.edm"),
        "stats": importlib.import_module("evaluation.stats"),
    }
    yield mods
    sys.path.remove(REF)


def _sym(rs, b, n, flags):
    x = rs.randn(b, n, n).astype(np.float32)
    x = np.triu(x, 1)
    x = x + np.swapaxes(x, -1, -2)
    return x * flags[:, :, None] * flags[:, None, :]


def _flags(b, n):
    flags = np.ones((b, n), bool)
    flags[0, n - 3:] = False
    return flags


# deterministic adj-only "denoiser": linear in x, sigma and self-cond
def _lin(x, sigmas, sc, xp):
    sig = sigmas.reshape((-1, 1, 1))
    return 0.7 * x - 0.05 + 0.02 * sig / (1.0 + sig) + 0.1 * sc


class _RefRawModel(torch.nn.Module):
    def forward(self, x, node_flags, c_noise, self_cond, **kw):
        sc = torch.zeros_like(x) if self_cond is None else self_cond
        return _lin(x, c_noise.to(x.dtype), sc, torch)


class _RefPrecondModel:
    """Duck-typed PRECONDITIONED model for the reference adj-only sampler
    (it calls model(x_in, node_flags, sigmas, self_cond))."""

    @staticmethod
    def round_sigma(sigma):
        return torch.as_tensor(sigma)

    def __call__(self, x, node_flags, sigmas, self_cond):
        sc = torch.zeros_like(x) if self_cond is None else self_cond
        return _lin(x, sigmas.to(x.dtype), sc, torch)


# edm only: the reference adj-only Precond CRASHES for vp/ve (c_skip/c_in
# are python ints there, and _expand_tensor_shape raises NotImplementedError
# on non-tensors, precond.py:27-34 + objectives/edm.py:112-121) — vp/ve are
# dead code on that path, so there is no behavior to mirror
@pytest.mark.parametrize("precond_kind", ["edm"])
def test_adj_only_precond_parity(ref_env, precond_kind):
    from diffusesg_tpu.models.precond import precond_forward_adj

    b, n = 3, 8
    rs = np.random.RandomState(0)
    flags = _flags(b, n)
    x = _sym(rs, b, n, flags)
    sig = np.exp(rs.randn(b)).astype(np.float32)

    ref = ref_env["precond"].Precond(precond=precond_kind,
                                     model=_RefRawModel(),
                                     self_condition=False)
    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(flags),
                   torch.tensor(sig)).numpy()

    def denoiser(adjs, node_flags, c_noise, self_cond):
        sc = jnp.zeros_like(adjs) if self_cond is None else self_cond
        return _lin(adjs, c_noise, sc, jnp)

    got = np.asarray(precond_forward_adj(denoiser, precond_kind,
                                         jnp.asarray(x), jnp.asarray(flags),
                                         jnp.asarray(sig)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("take_sc", [False, True])
def test_adj_only_precond_self_cond_branch(ref_env, take_sc, monkeypatch):
    """The stochastic self-cond branch (precond.py:39-47): patched Bernoulli
    draws on both sides, including the reference quirk that caller-passed
    self_cond is discarded."""
    from diffusesg_tpu.models.precond import precond_forward_train_adj

    b, n = 3, 8
    rs = np.random.RandomState(1)
    flags = _flags(b, n)
    x = _sym(rs, b, n, flags)
    sig = np.exp(rs.randn(b)).astype(np.float32)

    ref = ref_env["precond"].Precond(precond="edm", model=_RefRawModel(),
                                     self_condition=True)
    monkeypatch.setattr(ref_env["precond"].np.random, "rand",
                        lambda *a: 0.0 if take_sc else 1.0)
    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(flags),
                   torch.tensor(sig)).numpy()

    def denoiser(adjs, node_flags, c_noise, self_cond):
        sc = jnp.zeros_like(adjs) if self_cond is None else self_cond
        return _lin(adjs, c_noise, sc, jnp)

    monkeypatch.setattr(jax.random, "bernoulli",
                        lambda rng, p=0.5, shape=None: jnp.asarray(take_sc))
    got = np.asarray(precond_forward_train_adj(
        denoiser, "edm", True, jax.random.PRNGKey(0),
        jnp.asarray(x), jnp.asarray(flags), jnp.asarray(sig)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("self_cond", [False, True])
def test_adj_only_sampler_trajectory_parity(ref_env, self_cond):
    """Full adj-only reverse-ODE trajectory vs the reference EDMSampler
    (S_churn=0, deterministic denoiser, fixed init; edm.py:121-230)."""
    from diffusesg_tpu.sampling.edm_sampler import NodeAdjEDMSampler

    num_steps = 16
    b, n = 2, 8
    rs = np.random.RandomState(0)
    flags = _flags(b, n)
    init = _sym(rs, b, n, flags)

    ref = ref_env["sampler"].EDMSampler(
        solver="heun", discretization="edm", schedule="linear",
        scaling="none", num_steps=num_steps, S_churn=0.0, S_min=0.0,
        S_max=float("inf"), S_noise=1.0, clip_samples=False,
        clip_samples_min=-1.0, clip_samples_max=1.0,
        clip_samples_scope="x_0", self_condition=self_cond,
        dev=torch.device("cpu"))
    with torch.no_grad():
        want, want_interim = ref.sample(
            _RefPrecondModel(), torch.tensor(flags),
            init_adjs=torch.tensor(init), flag_interim_adjs=True,
            flag_use_double=True)
    want = want.numpy()
    want_interim = want_interim.numpy()

    ours = NodeAdjEDMSampler(
        solver="heun", discretization="edm", schedule="linear",
        scaling="none", num_steps=num_steps, S_churn=0.0, S_min=0.0,
        S_max=float("inf"), S_noise=1.0, self_condition=self_cond,
        symmetric_noise=True)

    def denoiser(adjs, node_flags, sigmas, self_cond_a):
        return _lin(adjs, sigmas, self_cond_a, jnp)

    got, got_interim = ours.sample_adj(
        denoiser, jax.random.PRNGKey(0), jnp.asarray(flags),
        init_adjs=jnp.asarray(init), num_interim=num_steps)
    got = np.asarray(got)
    got_interim = np.asarray(got_interim)

    assert got_interim.shape == want_interim.shape
    np.testing.assert_allclose(got_interim, want_interim.astype(np.float32),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=1e-4, atol=2e-5)
    # symmetry contract the reference asserts every step (edm.py:213)
    np.testing.assert_allclose(got, np.swapaxes(got, -1, -2), atol=1e-6)


def test_folded_normal_init():
    """Adj-only init is folded (abs) symmetric normal with zero diagonal
    (edm.py:147 + GeneralSampler.gen_init_sample)."""
    from diffusesg_tpu.sampling.edm_sampler import NodeAdjEDMSampler

    s = NodeAdjEDMSampler(symmetric_noise=True)
    flags = jnp.asarray(np.ones((2, 8), bool))
    init = np.asarray(s.gen_init_sample_adj(jax.random.PRNGKey(0), flags))
    assert (init >= 0).all()
    np.testing.assert_allclose(init, np.swapaxes(init, -1, -2))
    np.testing.assert_allclose(np.diagonal(init, axis1=-2, axis2=-1), 0.0)


def _path_graph_adj(n, total=12):
    a = np.zeros((total, total), np.float32)
    for i in range(n - 1):
        a[i, i + 1] = a[i + 1, i] = 1.0
    return a


def test_lobster_check_matches_reference(ref_env):
    """Lobster classification parity on paths, stars, caterpillars, cycles
    and random trees (reference: stats.py:197-239)."""
    import networkx as nx

    from diffusesg_tpu.eval import (adjs_to_graphs, eval_acc_lobster_batch,
                                    is_lobster_graph)

    graphs = [
        nx.path_graph(6),
        nx.star_graph(5),
        nx.cycle_graph(5),                       # not a tree
        nx.complete_graph(4),                    # not a tree
        nx.random_labeled_tree(12, seed=1),
        nx.random_labeled_tree(12, seed=2),
        nx.random_labeled_tree(20, seed=3),
        nx.balanced_tree(2, 3),                  # binary tree, not a lobster
    ]
    # caterpillar: path + legs
    cat = nx.path_graph(5)
    cat.add_edges_from([(1, 10), (2, 11), (3, 12)])
    graphs.append(cat)
    # lobster: caterpillar + second-level leaves
    lob = cat.copy()
    lob.add_edges_from([(10, 20), (11, 21)])
    graphs.append(lob)

    for g in graphs:
        import copy
        want = ref_env["stats"].is_lobster_graph(copy.deepcopy(g))
        got = is_lobster_graph(g)
        assert got == want, f"{g}"

    adjs = np.stack([_path_graph_adj(4), _path_graph_adj(7), _cycle_adj(12)])
    # 2 lobsters (paths) out of 3
    assert eval_acc_lobster_batch(adjs) == pytest.approx(2.0 / 3.0)
    # and the graph construction itself matches the reference's
    ref_graphs = ref_env["stats"].adjs_to_graphs(adjs)
    our_graphs = adjs_to_graphs(adjs)
    for rg, og in zip(ref_graphs, our_graphs):
        assert nx.utils.graphs_equal(rg, og)


def _cycle_adj(total, n=5):
    a = np.zeros((total, total), np.float32)
    for i in range(n):
        a[i, (i + 1) % n] = a[(i + 1) % n, i] = 1.0
    return a


def test_eval_sample_batch_helper(tmp_path):
    """eval_sample_batch logs delta norms and writes the plot
    (sampling_utils.py:63-78)."""
    from diffusesg_tpu.sampling import eval_sample_batch

    rs = np.random.RandomState(0)
    gt = (rs.rand(4, 8, 8) > 0.7).astype(np.float32)
    gt = np.triu(gt, 1)
    gt = gt + np.swapaxes(gt, -1, -2)
    init = rs.rand(4, 8, 8).astype(np.float32)
    sample = gt + 0.01 * rs.randn(4, 8, 8).astype(np.float32)
    out = eval_sample_batch(sample, gt, init, str(tmp_path), title="dbg.png")
    assert out["delta"] < out["init_delta"]
    assert (tmp_path / "dbg.png").exists()
