"""Tests for the scan-compiled EDM sampler.

Includes the reference's GT-as-denoiser sanity-check trick
(reference: DiffuseSG/runner/mcmc_sampler/edm.py:375-377 wired from
trainer_node_adj.py:279-280): with a perfect denoiser the sampler must land
exactly on the ground truth, and decoding must reproduce the input ints.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusesg_tpu.sampling import NodeAdjEDMSampler, decode_samples
from diffusesg_tpu.ops import attribute_converter, mask_adjs, mask_nodes


def _sampler(num_steps=20, **kw):
    kw.setdefault("symmetric_noise", False)
    return NodeAdjEDMSampler(num_steps=num_steps, **kw)


def _flags(b=3, n=8, seed=0):
    rs = np.random.RandomState(seed)
    flags = np.zeros((b, n), dtype=bool)
    for i in range(b):
        flags[i, : rs.randint(2, n + 1)] = True
    return jnp.asarray(flags)


def test_coefficients_match_reference_grid():
    """Compare the precomputed t-grid/churn against the reference sampler's
    float64 computation (reference: edm.py:69-88, 354-356)."""
    ref_dir = "/root/reference/DiffuseSG"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, ref_dir)
    try:
        from runner.objectives.edm import get_edm_params  # noqa: F401
        num_steps, rho = 32, 7.0
        smin, smax = 0.002, 80.0
        idx = torch.arange(num_steps, dtype=torch.float64)
        ref_sigma = (smax ** (1 / rho) + idx / (num_steps - 1)
                     * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
        samp = _sampler(num_steps=num_steps)
        coefs = samp.step_coefficients()
        # column 7 is sigma_hat = sigma(t_cur) * (1 + gamma)
        S_churn, S_min, S_max = 40.0, 0.05, 50.0
        for i in range(num_steps):
            sig_cur = float(ref_sigma[i])
            gamma = min(S_churn / num_steps, np.sqrt(2) - 1) if S_min <= sig_cur <= S_max else 0.0
            np.testing.assert_allclose(coefs[i, 7], sig_cur * (1 + gamma), rtol=1e-5)
            h_ref = float(ref_sigma[i + 1] if i + 1 < num_steps else 0.0) - sig_cur * (1 + gamma)
            np.testing.assert_allclose(coefs[i, 2], h_ref, rtol=1e-5, atol=1e-8)
    finally:
        sys.path.remove(ref_dir)


@pytest.mark.parametrize("self_condition", [False, True])
def test_gt_denoiser_sanity_check(rng, self_condition):
    """With denoised == ground truth, samples converge exactly to the GT and
    decode back to the original integer scene graph."""
    b, n = 3, 8
    k_node, k_edge = 10, 5
    flags = _flags(b, n)
    rs = np.random.RandomState(1)
    node_int = jnp.asarray(rs.randint(0, k_node, (b, n)).astype(np.float32))
    adj_int = jnp.asarray(rs.randint(0, k_edge, (b, n, n)).astype(np.float32))
    adj_int = mask_adjs(adj_int, flags)
    node_int = mask_nodes(node_int, flags)
    # remove self-loops like the dataset guarantees (dataloader.py:130-133)
    adj_int = adj_int * (1 - jnp.eye(n))

    node_ddpm = attribute_converter(node_int, flags, "int", "ddpm", k_node,
                                    flag_nodes=True, flag_in_ddpm_range=False)
    adj_ddpm = attribute_converter(adj_int, flags, "int", "ddpm", k_edge,
                                   flag_adjs=True, flag_in_ddpm_range=False)
    bbox = jnp.asarray(rs.rand(b, n, 4).astype(np.float32))
    bbox = mask_nodes(bbox * 2 - 1, flags)  # [-1, 1] range like the pipeline
    nodes_gt = jnp.concatenate([node_ddpm[..., None], bbox], axis=-1)  # [B, N, 5]

    def gt_denoiser(adjs, nodes, sigmas, sc_a, sc_x):
        return adj_ddpm, nodes_gt

    samp = _sampler(num_steps=12, self_condition=self_condition)
    adjs, nodes = samp.sample(gt_denoiser, rng, flags,
                              num_node_chan=5, num_edge_chan=1)
    np.testing.assert_allclose(np.asarray(adjs), np.asarray(adj_ddpm), atol=1e-4)
    np.testing.assert_allclose(np.asarray(nodes), np.asarray(nodes_gt), atol=1e-4)

    dec = decode_samples(adjs, nodes, flags, "ddpm", "ddpm", k_node, k_edge)
    np.testing.assert_array_equal(np.asarray(dec.node_types), np.asarray(node_int))
    np.testing.assert_array_equal(np.asarray(dec.adj_types), np.asarray(adj_int))
    np.testing.assert_allclose(np.asarray(dec.bboxes),
                               np.asarray(mask_nodes((bbox + 1) / 2, flags)), atol=1e-4)


def test_sample_shapes_and_masking(rng):
    flags = _flags()
    samp = _sampler(num_steps=6)

    def zero_denoiser(adjs, nodes, sigmas, sc_a, sc_x):
        return jnp.zeros_like(adjs), jnp.zeros_like(nodes)

    adjs, nodes, ia, ix = samp.sample(zero_denoiser, rng, flags,
                                      num_node_chan=5, num_edge_chan=3, num_interim=4)
    assert adjs.shape == (3, 8, 8, 3)
    assert nodes.shape == (3, 8, 5)
    assert ia.shape == (5, 3, 8, 8, 3) and ix.shape == (5, 3, 8, 5)
    f = np.asarray(flags)
    pair = f[:, :, None] & f[:, None, :]
    assert (np.asarray(adjs)[~pair] == 0).all()
    assert (np.asarray(nodes)[~f] == 0).all()


def test_symmetric_mode_stays_symmetric(rng):
    flags = jnp.ones((2, 8), dtype=bool)
    samp = NodeAdjEDMSampler(num_steps=6, symmetric_noise=True)

    def sym_denoiser(adjs, nodes, sigmas, sc_a, sc_x):
        return 0.5 * (adjs + jnp.swapaxes(adjs, 1, 2)), nodes * 0.1

    adjs, _ = samp.sample(sym_denoiser, rng, flags, num_node_chan=2, num_edge_chan=1)
    a = np.asarray(adjs)
    np.testing.assert_allclose(a, a.transpose(0, 2, 1), atol=1e-5)


def test_euler_vs_heun_differ(rng):
    flags = jnp.ones((2, 8), dtype=bool)

    def denoiser(adjs, nodes, sigmas, sc_a, sc_x):
        return jnp.tanh(adjs), jnp.tanh(nodes)

    # corrected Heun (2nd eval at x', t') genuinely differs from Euler;
    # under the reference reuse-xhat quirk WITHOUT self-conditioning the
    # two solvers coincide analytically (see the collapse test below)
    heun = _sampler(num_steps=8, solver="heun", heun_reuse_xhat=False).sample(
        denoiser, rng, flags, num_node_chan=2, num_edge_chan=1)
    euler = _sampler(num_steps=8, solver="euler").sample(
        denoiser, rng, flags, num_node_chan=2, num_edge_chan=1)
    assert not np.allclose(np.asarray(heun[0]), np.asarray(euler[0]))


def test_heun_reuse_xhat_without_selfcond_collapses_to_euler(rng):
    """Reference-quirk consequence (edm.py:400-405): with the 2nd eval
    reusing x_hat/t_hat and NO self-conditioning, its inputs equal the
    Euler eval's, so den2 == den and (for the EDM linear/none schedule)
    d2 == d analytically — Heun IS Euler.  The sampler exploits this by
    skipping the 2nd network eval outright (halving evals/step for this
    config class), which this test pins down as EXACT equality."""
    flags = jnp.ones((2, 8), dtype=bool)

    def denoiser(adjs, nodes, sigmas, sc_a, sc_x):
        return jnp.tanh(adjs), jnp.tanh(nodes)

    heun = _sampler(num_steps=8, solver="heun", heun_reuse_xhat=True,
                    self_condition=False).sample(
        denoiser, rng, flags, num_node_chan=2, num_edge_chan=1)
    euler = _sampler(num_steps=8, solver="euler").sample(
        denoiser, rng, flags, num_node_chan=2, num_edge_chan=1)
    np.testing.assert_allclose(np.asarray(heun[0]), np.asarray(euler[0]),
                               rtol=1e-5, atol=1e-6)


def test_sampler_is_jittable(rng):
    flags = jnp.ones((2, 8), dtype=bool)
    samp = _sampler(num_steps=4)

    def denoiser(adjs, nodes, sigmas, sc_a, sc_x):
        return adjs * 0.5, nodes * 0.5

    jit_sample = jax.jit(lambda r, f: samp.sample(denoiser, r, f, 2, 1))
    adjs, nodes = jit_sample(rng, flags)
    assert adjs.shape == (2, 8, 8)


def test_conditional_completion_inpainting(rng):
    """Masked inpainting: known node/edge entries are carried through exactly,
    unknown entries still get denoised (BASELINE config 4)."""
    b, n = 2, 8
    flags = jnp.ones((b, n), dtype=bool)
    rs = np.random.RandomState(0)
    gt_adjs = jnp.asarray(rs.uniform(-1, 1, (b, n, n)).astype(np.float32))
    gt_nodes = jnp.asarray(rs.uniform(-1, 1, (b, n, 5)).astype(np.float32))
    mask_a = jnp.asarray((rs.rand(b, n, n) < 0.5))
    mask_x = jnp.asarray((rs.rand(b, n) < 0.5))

    def denoiser(a, x, sigmas, sc_a, sc_x):
        return jnp.tanh(a), jnp.tanh(x)

    samp = _sampler(num_steps=10)
    adjs, nodes = samp.sample(
        denoiser, rng, flags, num_node_chan=5, num_edge_chan=1,
        inpaint=dict(gt_adjs=gt_adjs, gt_nodes=gt_nodes,
                     mask_adjs=mask_a, mask_nodes=mask_x))
    ma = np.asarray(mask_a)
    mx = np.asarray(mask_x)
    np.testing.assert_allclose(np.asarray(adjs)[ma], np.asarray(gt_adjs)[ma], atol=1e-6)
    np.testing.assert_allclose(np.asarray(nodes)[mx], np.asarray(gt_nodes)[mx], atol=1e-6)
    # unknown entries come from the model, not the GT
    assert not np.allclose(np.asarray(adjs)[~ma], np.asarray(gt_adjs)[~ma])


def test_chunked_sampling_matches_monolithic(rng):
    """chunk_steps must be numerically identical to the single-scan path."""
    flags = jnp.ones((2, 8), dtype=bool)
    samp = _sampler(num_steps=12)

    def denoiser(a, x, sigmas, sc_a, sc_x):
        return jnp.tanh(a), jnp.tanh(x)

    mono = samp.sample(denoiser, rng, flags, num_node_chan=3, num_edge_chan=1)
    chunked = samp.sample(denoiser, rng, flags, num_node_chan=3, num_edge_chan=1,
                          chunk_steps=5)
    np.testing.assert_allclose(np.asarray(mono[0]), np.asarray(chunked[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mono[1]), np.asarray(chunked[1]), atol=1e-6)


def test_make_sample_fn_inpaint_wiring(rng):
    """orchestrator.make_sample_fn(inpaint=True) builds the conditional-
    completion sampler: (rng, flags, gt_a, gt_x, mask_a, mask_x), carried
    entries exact (round-4: used by scripts/eval_inpaint_quality_tpu.py)."""
    from diffusesg_tpu.sampling.orchestrator import make_sample_fn

    class _Stub:
        def apply(self, params, a, x, flags, c_noise, sc_a, sc_x):
            return jnp.tanh(a), jnp.tanh(x)

    b, n = 2, 8
    flags = jnp.ones((b, n), dtype=bool)
    rs = np.random.RandomState(3)
    gt_adjs = jnp.asarray(rs.uniform(-1, 1, (b, n, n)).astype(np.float32))
    gt_nodes = jnp.asarray(rs.uniform(-1, 1, (b, n, 5)).astype(np.float32))
    known = np.zeros((b, n), dtype=bool)
    known[:, : n // 2] = True
    mask_x = jnp.asarray(known)
    mask_a = jnp.asarray(known[:, :, None] & known[:, None, :])

    samp = _sampler(num_steps=6)
    fn = make_sample_fn(_Stub(), {}, samp, 5, 1, inpaint=True)
    adjs, nodes = fn(rng, flags, gt_adjs, gt_nodes, mask_a, mask_x)
    ma, mx = np.asarray(mask_a), np.asarray(mask_x)
    np.testing.assert_allclose(np.asarray(adjs)[ma], np.asarray(gt_adjs)[ma],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(nodes)[mx], np.asarray(gt_nodes)[mx],
                               atol=1e-6)
    assert not np.allclose(np.asarray(adjs)[~ma], np.asarray(gt_adjs)[~ma])


def test_make_sample_fn_reuses_compiled_program_across_params(rng):
    """Evaluating successive checkpoints (fresh EMA weights, same shapes) must
    NOT rebuild the sampler program: params are a call argument of one cached
    jitted fn, never closure constants baked into the HLO (which made every
    checkpoint eval recompile for minutes over the TPU tunnel)."""
    from diffusesg_tpu.sampling.orchestrator import make_sample_fn

    traces = {"n": 0}

    class _Stub:
        def apply(self, params, a, x, flags, c_noise, sc_a, sc_x):
            traces["n"] += 1
            return jnp.tanh(a) * params["w"], jnp.tanh(x) * params["w"]

    model = _Stub()
    samp = _sampler(num_steps=4)
    flags = jnp.ones((2, 8), dtype=bool)
    fn1 = make_sample_fn(model, {"w": jnp.asarray(0.5)}, samp, 3, 1)
    fn2 = make_sample_fn(model, {"w": jnp.asarray(0.25)}, samp, 3, 1)
    # same underlying jitted program, different bound params
    assert fn1.func is fn2.func
    a1, _ = fn1(rng, flags)
    n_after_first = traces["n"]
    a2, _ = fn2(rng, flags)
    assert traces["n"] == n_after_first, "second params value retraced"
    # and the params value genuinely flows through (not baked in)
    assert not np.allclose(np.asarray(a1), np.asarray(a2))


def test_mc_sampler_stochasticity_knobs():
    """mcmc.s_churn/s_min/s_max/s_noise config keys reach the sampler;
    defaults are the reference's EDM-ImageNet values (edm.py:25).  s_churn=0
    is the measured topology lever (BASELINE.md round-5 diagnostics)."""
    from diffusesg_tpu.config import load_config
    from diffusesg_tpu.sampling import get_mc_sampler

    cfg = load_config("configs/vg_small_test.yaml")
    s = get_mc_sampler(cfg)
    assert (s.S_churn, s.S_min, s.S_max, s.S_noise) == (40.0, 0.05, 50.0, 1.003)
    with cfg.unlocked():
        cfg.mcmc.s_churn = 0.0
        cfg.mcmc.s_noise = 1.0
    s2 = get_mc_sampler(cfg)
    assert s2.S_churn == 0.0 and s2.S_noise == 1.0
