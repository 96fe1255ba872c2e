"""Trained-weights full-pipeline cross-validation (round-2 VERDICT item 2).

Trains the REFERENCE (its own trainer code, CPU, tiny synthetic config) for a
few hundred steps, saves a reference-format ``.pth``, imports it through our
checkpoint importer, and proves model+sampler+decode+metrics compose on
TRAINED weights:

  (a) forward parity of the imported checkpoint vs the live trained torch
      model (extends tests/test_reference_parity.py beyond random init);
  (b) full sampling parity: both frameworks run the Heun sampler from the
      SAME init noise with S_churn=0 and the decoded integer scene graphs
      agree (reference: eval.py:43-77 -> sampler_node_adj.py:24-307);
  (c) both evaluation pipelines produce matching metrics on those samples.

The real VG/COCO archives are absent from the snapshot
(/root/reference/.MISSING_LARGE_BLOBS), so the reference trains on our
schema-compatible synthetic data — the closest achievable substitute for a
paper-metric reproduction.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/DiffuseSG"
pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
    pytest.mark.slow,  # trains the torch reference on CPU (~minutes)
]

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "helpers"))
import ref_shims  # noqa: E402

TRAIN_STEPS_TARGET = 150
BATCH = 16
LR = 1e-3
EMA_BETAS = [0.9, 0.999]


@pytest.fixture(scope="module")
def ref_env():
    ref_shims.install_all()
    ref_shims.ref_on_path()
    import importlib
    mods = {
        "trainer": importlib.import_module("runner.trainer.trainer_node_adj"),
        "trainer_utils": importlib.import_module("runner.trainer.trainer_utils"),
        "objectives": importlib.import_module("runner.objectives.edm"),
        "diffusesg": importlib.import_module("model.diffusesg.diffusesg"),
        "precond": importlib.import_module("model.precond.precond"),
        "rainbow": importlib.import_module("loss.rainbow_loss"),
        "sampler": importlib.import_module("runner.mcmc_sampler.edm"),
        "attribute_code": importlib.import_module("utils.attribute_code"),
        "bbox_metrics": importlib.import_module("evaluation.bbox_metrics"),
    }
    yield mods
    sys.path.remove(REF)


def _cfg():
    from diffusesg_tpu.config import load_config
    cfg = load_config("configs/vg_small_test.yaml")
    with cfg.unlocked():
        cfg.dataset.subset = 32
        cfg.train.batch_size = BATCH
    return cfg


class _Loader(list):
    batch_size = BATCH


@pytest.fixture(scope="module")
def trained(ref_env, tmp_path_factory):
    """Train the reference with ITS OWN trainer loop on synthetic data and
    save a reference-format checkpoint (trainer_utils.py:168-185)."""
    import ema_pytorch
    from ml_collections import config_dict

    from diffusesg_tpu.data import load_data
    from diffusesg_tpu.models.channels import get_node_adj_model_input_output_channels

    cfg = _cfg()
    bundle = load_data(cfg, data_root="/nonexistent")  # synthetic fallback
    in_chans, out_a, out_x = get_node_adj_model_input_output_channels(cfg)

    torch.manual_seed(0)
    dsg = ref_env["diffusesg"].DiffuseSG(
        img_size=cfg.dataset.max_node_num, patch_size=1, in_chans=in_chans,
        embed_dim=cfg.model.feature_dims[-1],
        depths=list(cfg.model.depths), num_heads=[3, 6],
        window_size=cfg.model.window_size, mlp_ratio=4.0,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
        out_chans_adj=out_a, out_chans_node=out_x,
        self_condition=True, symmetric_noise=False)
    model = ref_env["precond"].NodeAdjPrecond(
        precond="edm", model=dsg, self_condition=True, symmetric_noise=False)
    model.train()

    gen = ref_env["objectives"].NodeAdjEDMObjectiveGenerator(
        precond="edm", sigma_dist="edm",
        other_params=config_dict.ConfigDict(), dev=torch.device("cpu"),
        symmetric_noise=False)
    loss_func = ref_env["rainbow"].NodeAdjRainbowLoss(
        edge_loss_weight=1.0, node_loss_weight=1.0, objective="edm",
        flag_reweight=False)
    optimizer = torch.optim.Adam(model.parameters(), lr=LR,
                                 betas=(0.9, 0.999), eps=1e-8)
    ema_helper = [ema_pytorch.EMA(model, beta=b, update_every=1,
                                  update_after_step=0, inv_gamma=1, power=1)
                  for b in sorted(EMA_BETAS)]

    adjs = torch.tensor(np.asarray(bundle.train.adjs, np.float32))
    nodes = torch.tensor(np.asarray(bundle.train.nodes, np.float32))
    flags = torch.tensor(np.asarray(bundle.train.node_flags, bool))
    n_graphs = len(adjs)
    rs = np.random.RandomState(0)

    steps_per_epoch = n_graphs // BATCH
    epochs = TRAIN_STEPS_TARGET // steps_per_epoch
    first_loss = last_loss = None
    logger = None
    for epoch in range(epochs):
        perm = rs.permutation(n_graphs)
        batches = _Loader(
            (adjs[perm[i:i + BATCH]], nodes[perm[i:i + BATCH]],
             flags[perm[i:i + BATCH]])
            for i in range(0, steps_per_epoch * BATCH, BATCH))
        logger = ref_env["trainer_utils"].get_logger_per_epoch(
            epoch=epoch, flag_node_adj=True)
        ref_env["trainer"].node_adj_move_forward_one_epoch(
            model=model, optimizer=optimizer, ema_helper=ema_helper,
            dataloader=batches, train_obj_gen=gen, loss_func=loss_func,
            epoch_logger=logger, mode="train",
            dataset_name=cfg.dataset.name, node_encoding="ddpm",
            edge_encoding="ddpm", flag_sg=True, flag_node_only=False,
            flag_binary_edge=False, iou_loss_type="iou", iou_loss_weight=1.0)
        mean_loss = float(np.concatenate(logger["train"]["summed_loss"]).mean())
        if first_loss is None:
            first_loss = mean_loss
        last_loss = mean_loss
    # the checkpoint must come from a model that actually LEARNED (per-step
    # sigma draws are noisy, so compare epoch means loosely)
    assert last_loss < first_loss, (first_loss, last_loss)

    ckpt = ref_env["trainer_utils"].get_ckpt_data(
        model, ema_helper, epochs - 1, last_loss, last_loss, cfg,
        dist_helper=None)
    path = str(tmp_path_factory.mktemp("ref_ckpt") / "visual_genome_trained.pth")
    torch.save(ckpt, path)
    model.eval()
    return {"path": path, "cfg": cfg, "bundle": bundle, "model": model,
            "in_chans": in_chans, "out_a": out_a, "out_x": out_x}


@pytest.fixture(scope="module")
def imported(trained):
    from diffusesg_tpu.utils.torch_import import (import_reference_checkpoint,
                                                  load_reference_pth)
    ckpt_data = load_reference_pth(trained["path"])
    return import_reference_checkpoint(ckpt_data, trained["cfg"])


def _our_denoiser(trained, params):
    import jax.numpy as jnp

    from diffusesg_tpu.models import build_model
    from diffusesg_tpu.models.precond import precond_forward

    model = build_model(trained["cfg"])

    def denoiser(a, x, flags, sigmas, sc_a=None, sc_x=None):
        def model_fn(aa, xx, f, c_noise, s_a, s_x):
            return model.apply(params, aa, xx, f, c_noise, s_a, s_x)
        return precond_forward(model_fn, "edm", a, x, jnp.asarray(flags),
                               sigmas, sc_a, sc_x)

    return denoiser


def test_trained_import_forward_parity(trained, imported, monkeypatch, ref_env):
    """Imported trained weights: preconditioned forward parity at fp32."""
    import jax.numpy as jnp

    rs = np.random.RandomState(5)
    n = trained["cfg"].dataset.max_node_num
    b = 4
    flags = np.ones((b, n), bool)
    flags[0, 9:] = False
    m3 = (flags[:, :, None] & flags[:, None, :]).astype(np.float32)
    adjs = rs.uniform(-1, 1, (b, n, n)).astype(np.float32) * m3
    nodes = (rs.uniform(-1, 1, (b, n, trained["out_x"])).astype(np.float32)
             * flags[:, :, None])
    sig = np.exp(rs.randn(b) * 1.2 - 1.2).astype(np.float32)

    # disable the reference's ungated sampling-time self-cond randomness
    monkeypatch.setattr(ref_env["precond"].np.random, "rand", lambda *a: 1.0)
    with torch.no_grad():
        ref_a, ref_x = trained["model"](torch.tensor(adjs),
                                        torch.tensor(nodes),
                                        torch.tensor(flags),
                                        torch.tensor(sig))
    denoiser = _our_denoiser(trained, imported["params"])
    got_a, got_x = denoiser(jnp.asarray(adjs), jnp.asarray(nodes), flags,
                            jnp.asarray(sig))
    np.testing.assert_allclose(np.asarray(got_a), ref_a.numpy(),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_x), ref_x.numpy(),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(imported["ema_betas"]), EMA_BETAS,
                               rtol=1e-6)


@pytest.fixture(scope="module")
def sampled(trained, imported, ref_env):
    """Both frameworks sample from the SAME trained weights + init noise
    (S_churn=0 => deterministic); returns continuous outputs of each."""
    import jax
    import jax.numpy as jnp

    from diffusesg_tpu.sampling.edm_sampler import NodeAdjEDMSampler

    num_steps = 20
    n = trained["cfg"].dataset.max_node_num
    b = 8
    flags = np.asarray(trained["bundle"].test.node_flags[:b], bool)
    rs = np.random.RandomState(11)
    init_a = rs.randn(b, n, n).astype(np.float32) * (
        flags[:, :, None] & flags[:, None, :])
    init_x = (rs.randn(b, n, trained["out_x"]).astype(np.float32)
              * flags[:, :, None])

    # reference side: its own sampler + the trained NodeAdjPrecond in fp64
    # (flag_use_double feeds fp64 states into the model, so the weights must
    # be double too — this also makes the reference a proper fp64 oracle);
    # the ungated precond self-cond randomness is disabled via np.random so
    # the run is deterministic (see test_precond_self_cond_refresh_quirk_parity
    # for the quirk's own cross-validation)
    import copy

    import numpy.random as npr
    ref_model64 = copy.deepcopy(trained["model"]).double().eval()
    orig_rand = npr.rand
    npr.rand = lambda *a: 1.0
    try:
        ref_sampler = ref_env["sampler"].NodeAdjEDMSampler(
            solver="heun", discretization="edm", schedule="linear",
            scaling="none", num_steps=num_steps, S_churn=0.0, S_min=0.0,
            S_max=float("inf"), S_noise=1.0, clip_samples=False,
            clip_samples_min=None, clip_samples_max=None,
            clip_samples_scope="x_0", self_condition=True,
            dev=torch.device("cpu"), objective="edm", symmetric_noise=False)
        with torch.no_grad():
            ref_a, ref_x = ref_sampler.sample(
                ref_model64, torch.tensor(flags),
                init_adjs=torch.tensor(init_a),
                init_nodes=torch.tensor(init_x), flag_use_double=True,
                flag_node_multi_channel=True, num_node_chan=trained["out_x"],
                num_edge_chan=1)
    finally:
        npr.rand = orig_rand

    ours = NodeAdjEDMSampler(
        solver="heun", discretization="edm", schedule="linear",
        scaling="none", num_steps=num_steps, S_churn=0.0, S_min=0.0,
        S_max=float("inf"), S_noise=1.0, self_condition=True,
        symmetric_noise=False)
    denoiser = _our_denoiser(trained, imported["params"])

    def dn(a, x, sigmas, sc_a, sc_x):
        return denoiser(a, x, flags, sigmas, sc_a, sc_x)

    got_a, got_x = jax.jit(lambda r, f: ours.sample(
        dn, r, f, trained["out_x"], 1, init_adjs=jnp.asarray(init_a),
        init_nodes=jnp.asarray(init_x)))(jax.random.PRNGKey(0),
                                         jnp.asarray(flags))
    return {"flags": flags,
            "ref_a": ref_a.numpy().astype(np.float32),
            "ref_x": ref_x.numpy().astype(np.float32),
            "got_a": np.asarray(got_a), "got_x": np.asarray(got_x)}


def test_trained_sampling_parity(sampled):
    """Continuous sampler outputs track the reference's fp64 run at fp32
    accuracy through 20 Heun steps of a TRAINED network."""
    np.testing.assert_allclose(sampled["got_a"], sampled["ref_a"],
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(sampled["got_x"], sampled["ref_x"],
                               rtol=1e-3, atol=2e-3)


def test_trained_decode_agreement(sampled, trained, ref_env):
    """Decoded integer scene graphs agree across frameworks: our decode of
    our samples vs the REFERENCE's decode (attribute_converter interval
    quantizer, sampler_node_adj.py:221-293) of ITS samples."""
    from diffusesg_tpu.models.channels import get_node_adj_num_type
    from diffusesg_tpu.sampling.decode import decode_samples

    cfg = trained["cfg"]
    info = get_node_adj_num_type(cfg.dataset.name, True, "ddpm",
                                 edge_encoding="ddpm")
    raw_node, raw_adj = info["raw_num_node_type"], info["raw_num_adj_type"]
    flags = sampled["flags"]

    dec = decode_samples(sampled["got_a"], sampled["got_x"], flags,
                         node_encoding="ddpm", edge_encoding="ddpm",
                         num_node_type=raw_node, num_adj_type=raw_adj,
                         flag_bbox=True)

    ac = ref_env["attribute_code"]
    ref_nodes_t = torch.tensor(sampled["ref_x"][..., 0]).clamp(-1, 1)
    ref_q_node = ac.attribute_converter(
        in_attr=ref_nodes_t, attr_flags=torch.tensor(flags),
        in_encoding="ddpm", out_encoding="int", num_attr_type=raw_node,
        flag_nodes=True, flag_adjs=False,
        flag_in_ddpm_range=True, flag_out_ddpm_range=False).numpy()
    ref_q_adj = ac.attribute_converter(
        in_attr=torch.tensor(sampled["ref_a"]).clamp(-1, 1),
        attr_flags=torch.tensor(flags),
        in_encoding="ddpm", out_encoding="int", num_attr_type=raw_adj,
        flag_nodes=True, flag_adjs=False,
        flag_in_ddpm_range=True, flag_out_ddpm_range=False).numpy()
    n = flags.shape[1]
    ref_q_adj[:, np.eye(n, dtype=bool)] = 0  # reference self-loop removal

    # continuous values within fp32 drift of a quantization boundary can
    # legitimately decode to adjacent bins — require near-total agreement
    node_match = (np.asarray(dec.node_types) == ref_q_node).mean()
    adj_match = (np.asarray(dec.adj_types) == ref_q_adj).mean()
    assert node_match >= 0.995, node_match
    assert adj_match >= 0.995, adj_match


def test_trained_eval_metrics_parity(sampled, trained, ref_env):
    """Both evaluation pipelines agree to ~1e-6 on the SAME trained-model
    samples: node/edge/degree MMDs + triplet TV (reference:
    bbox_metrics.py:271-376 vs eval/sg_evaluator.py)."""
    from diffusesg_tpu.eval import SceneGraphEvaluator as OurEval
    from diffusesg_tpu.models.channels import get_node_adj_num_type
    from diffusesg_tpu.sampling.decode import decode_samples

    cfg = trained["cfg"]
    info = get_node_adj_num_type(cfg.dataset.name, True, "ddpm",
                                 edge_encoding="ddpm")
    raw_node, raw_adj = info["raw_num_node_type"], info["raw_num_adj_type"]
    flags = sampled["flags"]
    bundle = trained["bundle"]

    dec = decode_samples(sampled["got_a"], sampled["got_x"], flags,
                         node_encoding="ddpm", edge_encoding="ddpm",
                         num_node_type=raw_node, num_adj_type=raw_adj,
                         flag_bbox=True)
    gt = decode_samples(np.asarray(bundle.test.adjs[:8], np.float32),
                        np.asarray(bundle.test.nodes[:8], np.float32),
                        np.asarray(bundle.test.node_flags[:8], bool),
                        node_encoding="ddpm", edge_encoding="ddpm",
                        num_node_type=raw_node, num_adj_type=raw_adj,
                        flag_bbox=True)
    gt_flags = np.asarray(bundle.test.node_flags[:8], bool)

    gen_nt = np.asarray(dec.node_types)
    gen_et = np.asarray(dec.adj_types)
    gt_nt = np.asarray(gt.node_types)
    gt_et = np.asarray(gt.adj_types)

    RefEval = ref_env["bbox_metrics"].SceneGraphEvaluator
    t = torch.tensor

    got = OurEval.compute_node_type_mmd(gen_nt, gt_nt, flags, gt_flags,
                                        raw_node, ["gaussian", "gaussian_tv"])
    want = RefEval.compute_node_type_mmd(t(gen_nt), t(gt_nt), t(flags),
                                         t(gt_flags), raw_node,
                                         ["gaussian", "gaussian_tv"])
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-6, atol=1e-9)

    got = OurEval.compute_edge_type_mmd(gen_et, gt_et, flags, gt_flags,
                                        raw_adj, ["gaussian"])
    want = RefEval.compute_edge_type_mmd(t(gen_et), t(gt_et), t(flags),
                                         t(gt_flags), raw_adj, ["gaussian"])
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-6, atol=1e-9)

    got = OurEval.compute_node_degree_mmd(gen_et, gt_et, ["gaussian"])
    want = RefEval.compute_node_degree_mmd(t(gen_et.astype(np.float32)),
                                           t(gt_et.astype(np.float32)),
                                           ["gaussian"])
    np.testing.assert_allclose(got["gaussian"]["degree"],
                               want["gaussian"]["degree"],
                               rtol=1e-6, atol=1e-9)

    trip_dict = bundle.test_triplet_dict  # already the sorted freq dict
    got = OurEval.compute_triplet_tv_dist(gen_et, gen_nt, flags, trip_dict,
                                          list(trip_dict.keys()))
    want = RefEval.compute_triplet_tv_dist(t(gen_et), t(gen_nt), t(flags),
                                           trip_dict,
                                           list(trip_dict.keys()))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
