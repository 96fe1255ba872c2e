"""End-to-end pipeline integration tests on the CPU harness: tiny config ->
synthetic data -> train epochs -> sanity-check sampling -> metrics -> eval CLI.
This is the reference's sanity-check-with-GT-denoiser + subset-overfit recipe
turned into pytest (SURVEY §4)."""
import glob
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full train->sample->eval pipeline e2es

from diffusesg_tpu.config import load_config


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    cfg = load_config("configs/vg_small_test.yaml")
    with cfg.unlocked():
        cfg.exp_dir = str(tmp)
        cfg.dataset.max_node_num = 8
        cfg.dataset.subset = 8
        cfg.train.batch_size = 8
        cfg.train.max_epoch = 2
        cfg.train.save_interval = 2
        cfg.train.sample_interval = 1000  # no in-loop sampling here
        cfg.test.batch_size = 8
        cfg.test.eval_size = 8
        cfg.mcmc.num_steps = 8
    return cfg


@pytest.fixture(scope="module")
def trained(tiny_cfg):
    from diffusesg_tpu.data import load_data
    from diffusesg_tpu.models import build_model
    from diffusesg_tpu.models.factory import init_params
    from diffusesg_tpu.train import (
        create_train_state, go_training, make_eval_step, make_optimizer,
        make_train_step, train_step_config_from,
    )
    from diffusesg_tpu.utils import set_seed_and_logger

    cfg = tiny_cfg
    set_seed_and_logger(cfg, mode="train")
    bundle = load_data(cfg, data_root="/nonexistent")  # forces synthetic
    model = build_model(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    optimizer = make_optimizer(cfg.train.lr_init, cfg.train.lr_dacey, 1)
    state = create_train_state(params, list(cfg.train.ema_coef), optimizer)
    step_cfg = train_step_config_from(cfg)
    train_step = make_train_step(model.apply, optimizer, step_cfg)
    eval_step = make_eval_step(model.apply, step_cfg)
    state = go_training(model, state, train_step, eval_step, cfg, bundle,
                        mc_sampler=None, writer=None)
    return cfg, bundle, model, state


def test_training_produces_checkpoints(trained):
    cfg, bundle, model, state = trained
    assert int(jax.device_get(state.step)) == 2  # 2 epochs x 1 step
    ckpts = glob.glob(os.path.join(cfg.model_ckpt_dir, "*"))
    assert len(ckpts) >= 1
    assert os.path.isfile(os.path.join(cfg.logdir, "train_loss.log"))


def test_checkpoint_roundtrip(trained):
    from diffusesg_tpu.utils.checkpoint import restore_checkpoint, state_from_payload
    cfg, bundle, model, state = trained
    ckpt = sorted(glob.glob(os.path.join(cfg.model_ckpt_dir, "*")))[0]
    payload = restore_checkpoint(ckpt)
    restored = state_from_payload(payload)
    leaves_a = jax.tree.leaves(restored.params)
    leaves_b = jax.tree.leaves(jax.device_get(state.params))
    assert len(leaves_a) == len(leaves_b)
    assert payload["extra"]["epoch"] in (0, 1)


def test_sanity_check_sampling_reproduces_gt(trained):
    """GT-as-denoiser end-to-end: metrics must be perfect/near-zero
    (the reference's epoch-0 sanity check, trainer_node_adj.py:279-280)."""
    from diffusesg_tpu.sampling import get_mc_sampler
    from diffusesg_tpu.sampling.orchestrator import sg_go_sampling
    cfg, bundle, model, state = trained
    sampler = get_mc_sampler(cfg)
    metrics = sg_go_sampling(model, state.params, sampler, cfg, bundle,
                             epoch=0, sanity_check=True,
                             sampling_params={"model_nm": "sanity", "weight_kw": "1",
                                              "model_path": "none"})
    # GT-fed sampler must reproduce the dataset: type MMDs ~ 0
    assert metrics["node_type_mmd_gaussian"] < 1e-6
    assert metrics["edge_type_mmd_gaussian"] < 1e-6
    assert metrics["node_degree_mmd_gaussian"] < 1e-6
    # bbox f1 of identical sets: best match sits on the diagonal, at the
    # reference F1 semantics' self-match value (bbox_metrics.py:80-111:
    # recall = MEAN of the cumulative recall curve, so a class with n
    # duplicate instances self-matches at r=(n+1)/2n, F1=2r/(1+r) < 1 —
    # NOT 1.0 whenever a graph repeats a node type).
    mat = metrics["_mat_f1"]["vanilla"]
    assert np.allclose(mat.max(-1), np.diag(mat)), "self is not the best match"
    nodes = np.asarray(bundle.test.nodes)[..., 0]
    flags = np.asarray(bundle.test.node_flags).astype(bool)
    expected = []
    for b in range(nodes.shape[0]):
        _, counts = np.unique(nodes[b][flags[b]], return_counts=True)
        r = (counts + 1) / (2.0 * counts)
        expected.append((2 * r / (1 + r)).mean())
    assert np.allclose(np.diag(mat), expected, atol=1e-9), (
        f"diag {np.diag(mat)} != expected self-F1 {expected}")
    # artifacts written
    csv = os.path.join(cfg.logdir, "eval_results.csv")
    assert os.path.isfile(csv)
    npzs = glob.glob(os.path.join(cfg.logdir, "sampling_during_training", "*", "*.npz"))
    assert len(npzs) >= 2
    # interim snapshots saved (reference: max_num_interim_adjs=10,
    # sampler_node_adj.py:85-86,166-172) and plotted
    before = [p for p in npzs if p.endswith("before_eval.npz")][0]
    payload = np.load(before)
    assert "interim_a" in payload and payload["interim_a"].shape[1] == \
        min(10, cfg.mcmc.num_steps) + 1
    outdirs = glob.glob(os.path.join(cfg.logdir, "sampling_during_training",
                                     "*sanity_check*"))
    found = []
    for d in outdirs:
        found += os.listdir(d)
    assert any(f.startswith("interim_") for f in found), found
    # retrieval panels, one per F1 weighting (sampler_node_adj.py:554-573);
    # files carry the reference's "{i:02d}_" prefix (visual_utils.py naming)
    for name in ["vanilla", "area", "freq", "no_node_type"]:
        assert any(f"bbox_{name}_f1_" in f for f in found), (name, found)
    # full stats report emitted (sg_utils.py:9-345 counterpart)
    assert "sg_statistics.txt" in found and "node_freq.png" in found


def test_model_sampling_runs(trained):
    """Real model inference path (untrained weights): shapes + masking +
    metric pipeline all work."""
    from diffusesg_tpu.sampling import get_mc_sampler
    from diffusesg_tpu.sampling.orchestrator import sg_go_sampling
    from diffusesg_tpu.train.train_state import ema_slice
    cfg, bundle, model, state = trained
    sampler = get_mc_sampler(cfg)
    params = ema_slice(jax.device_get(state.ema_params), -1)
    metrics = sg_go_sampling(model, params, sampler, cfg, bundle,
                             epoch=1, sanity_check=False)
    assert np.isfinite(metrics["node_type_mmd_gaussian"])
    assert np.isfinite(metrics["triplet_tv_dist_full_val"])


def test_eval_samples_cli(trained, tmp_path):
    from diffusesg_tpu.cli import eval_samples
    cfg, bundle, model, state = trained
    npzs = sorted(glob.glob(os.path.join(
        cfg.logdir, "sampling_during_training", "*", "final_samples_array.npz")))
    assert npzs
    # write the tiny config for the CLI
    from diffusesg_tpu.config import save_config
    cfg_path = str(tmp_path / "cfg.yaml")
    save_config(cfg, cfg_path)
    out_path = str(tmp_path / "metrics.json")
    metrics = eval_samples.main(["--npz", npzs[0], "-c", cfg_path,
                                 "--data_root", "/nonexistent", "--out", out_path,
                                 "--train_set"])
    assert os.path.isfile(out_path)
    assert "node_type_mmd_gaussian" in metrics
    # --train_set scores the full training set's layouts as a BLT reference
    # (reference: eval_sg_samples.py:45-48)
    assert np.isfinite(metrics["full_gt_iou_percp_blt"])
    # the helper-plots directory next to the npz (reference: :263-265),
    # with the perceptual-IoU histogram, retrieval panels per F1 weighting,
    # and the eval_metrics.txt summary (:50-66, :345-360, :366-392)
    plot_dir = os.path.join(os.path.dirname(npzs[0]), "eval_sg_helper_plots")
    files = os.listdir(plot_dir)
    assert "blt_perceptual_iou_hist.png" in files
    assert "eval_metrics.txt" in files
    for name in ["vanilla", "area", "freq", "no_node_type"]:
        # panels carry the reference's "{i:02d}_" prefix (visual_utils.py
        # naming, reproduced in utils/visual.plot_scene_graph_bbox)
        assert any(f"bbox_{name}_" in f for f in files), (name, files)


def test_inpaint_frac_conditional_completion(trained):
    """Product-surface conditional completion (round-4 VERDICT item 6):
    sg_go_sampling(inpaint_frac=0.5) pins the first ceil(n/2) valid nodes
    (labels + boxes + edges among them) to GT; the carried parts must
    survive the full reverse diffusion + decode bit-exactly, and the usual
    metric/artifact surface must flow."""
    from diffusesg_tpu.sampling import get_mc_sampler
    from diffusesg_tpu.sampling.orchestrator import sg_go_sampling
    cfg, bundle, model, state = trained
    sampler = get_mc_sampler(cfg)
    metrics = sg_go_sampling(model, state.params, sampler, cfg, bundle,
                             epoch=7, inpaint_frac=0.5,
                             sampling_params={"model_nm": "inpaint",
                                              "weight_kw": "1",
                                              "model_path": "none"})
    assert np.isfinite(metrics["node_type_mmd_gaussian"])
    npzs = glob.glob(os.path.join(cfg.logdir, "sampling_during_training",
                                  "eval_epoch_00007_model_inference",
                                  "final_samples_array_before_eval.npz"))
    assert npzs, "inpaint eval wrote no npz"
    data = np.load(npzs[0], allow_pickle=True)
    flags = data["gt_node_flags"].astype(bool)
    known = (np.arange(flags.shape[1])[None, :]
             < np.ceil(flags.sum(1) * 0.5)[:, None]) & flags
    pair = known[:, :, None] & known[:, None, :]
    assert known.any() and (~known & flags).any()
    # exact carry: decoded labels / predicates / boxes equal GT on the
    # known entries, and at least something was actually sampled
    np.testing.assert_array_equal(data["samples_x"][known], data["gt_x"][known])
    np.testing.assert_array_equal(data["samples_a"][pair], data["gt_a"][pair])
    assert np.abs(data["samples_x_bbox"][known]
                  - data["gt_x_bbox"][known]).max() < 1e-5
    # invalid combinations are rejected loudly
    with pytest.raises(ValueError):
        sg_go_sampling(model, state.params, sampler, cfg, bundle,
                       inpaint_frac=0.5, sanity_check=True)
    with pytest.raises(ValueError):
        sg_go_sampling(model, state.params, sampler, cfg, bundle,
                       inpaint_frac=1.5)
