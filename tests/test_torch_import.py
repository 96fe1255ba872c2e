"""End-to-end reference checkpoint import (cli/import_ckpt.py).

Builds a live reference NodeAdjPrecond, saves a checkpoint in the exact
reference schema (trainer_utils.py:168-185: model + EMA-per-beta state
dicts with DDP 'module.' prefixes + embedded config + epoch), imports it
with the CLI, and checks the produced orbax run dir: discoverable by the
eval-side checkpoint search, correct betas/epoch, raw-weight forward
parity against the reference model, EMA slices carrying the EMA weights.
"""
import os
import sys

import numpy as np
import pytest
import yaml

REF = "/root/reference/DiffuseSG"
pytestmark = [pytest.mark.slow,  # reference ckpt import e2es
              pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")]

torch = pytest.importorskip("torch")

from test_reference_parity import _install_timm_shim  # noqa: E402


@pytest.fixture(scope="module")
def ref_mod():
    _install_timm_shim()
    sys.path.insert(0, REF)
    import importlib
    diffusesg = importlib.import_module("model.diffusesg.diffusesg")
    precond = importlib.import_module("model.precond.precond")
    yield diffusesg, precond
    sys.path.remove(REF)


@pytest.fixture()
def small_cfg(tmp_path):
    from diffusesg_tpu.config import load_config
    with open("configs/vg_small_test.yaml") as f:
        raw = yaml.safe_load(f)
    raw["train"]["ema_coef"] = [0.99, 0.999]
    path = tmp_path / "cfg.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(raw, f)
    return load_config(str(path))


def _make_reference_ckpt(ref_mod, cfg, tmp_path, module_prefix: bool):
    diffusesg, precond_mod = ref_mod
    from diffusesg_tpu.models.channels import get_node_adj_model_input_output_channels

    in_chans, out_adj, out_node = get_node_adj_model_input_output_channels(cfg)
    torch.manual_seed(0)
    net = diffusesg.DiffuseSG(
        img_size=cfg.dataset.max_node_num, patch_size=cfg.model.patch_size,
        in_chans=in_chans, embed_dim=cfg.model.feature_dims[-1],
        depths=list(cfg.model.depths), num_heads=[3, 6],
        window_size=cfg.model.window_size, drop_path_rate=0.0,
        out_chans_adj=out_adj, out_chans_node=out_node,
        self_condition=cfg.train.self_cond, symmetric_noise=not cfg.flag_sg).eval()
    wrapped = precond_mod.NodeAdjPrecond(
        precond="edm", model=net, self_condition=cfg.train.self_cond,
        symmetric_noise=not cfg.flag_sg).eval()

    sd = wrapped.state_dict()
    if module_prefix:  # DDP-saved checkpoints carry module. (sampling_utils.py:48-53)
        sd = {"module." + k: v for k, v in sd.items()}

    ckpt = {"model": sd, "config": cfg.to_dict(), "epoch": 7,
            "train_loss": 0.5, "test_loss": 0.6}
    for beta, shift in [(0.99, 0.01), (0.999, 0.02)]:
        ema_sd = {k: (v + shift if v.is_floating_point() else v)
                  for k, v in wrapped.state_dict().items()}
        ckpt[f"model_ema_beta_{beta:.4f}"] = ema_sd

    pth = str(tmp_path / "reference_ckpt.pth")
    torch.save(ckpt, pth)
    return net, pth


@pytest.mark.parametrize("module_prefix", [False, True])
def test_import_reference_ckpt_e2e(ref_mod, small_cfg, tmp_path, module_prefix):
    import jax.numpy as jnp
    from diffusesg_tpu.cli import import_ckpt
    from diffusesg_tpu.models import build_model
    from diffusesg_tpu.train.train_state import ema_slice
    from diffusesg_tpu.utils.checkpoint import restore_checkpoint, select_checkpoints
    from diffusesg_tpu.utils.torch_import import state_dict_to_flax

    net, pth = _make_reference_ckpt(ref_mod, small_cfg, tmp_path, module_prefix)
    out_dir = str(tmp_path / "imported")
    import_ckpt.main([pth, "-o", out_dir])

    # run-dir layout eval consumes: config.yaml + discoverable models_ckpt/7
    assert os.path.isfile(os.path.join(out_dir, "config.yaml"))
    ckpts = select_checkpoints(os.path.join(out_dir, "models_ckpt"))
    assert len(ckpts) == 1 and os.path.basename(ckpts[0]) == "7"

    payload = restore_checkpoint(ckpts[0])
    np.testing.assert_allclose(np.asarray(payload["ema_betas"]), [0.99, 0.999])
    assert payload["extra"]["epoch"] == 7
    assert payload["extra"]["test_loss"] == pytest.approx(0.6)

    # raw-weight forward parity vs the live reference denoiser
    cfg = small_cfg
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    b, n = 2, cfg.dataset.max_node_num
    c_a = 1
    adj = rs.randn(b, n, n).astype(np.float32)
    node = rs.randn(b, n, 5).astype(np.float32)
    flags = np.ones((b, n), dtype=bool)
    flags[0, 11:] = False
    noise = rs.rand(b).astype(np.float32)
    with torch.no_grad():
        ref_a, ref_x = net(torch.from_numpy(adj), torch.from_numpy(node),
                           torch.from_numpy(flags), torch.from_numpy(noise),
                           None, None)
    got_a, got_x = model.apply(payload["params"], jnp.asarray(adj),
                               jnp.asarray(node), jnp.asarray(flags),
                               jnp.asarray(noise), None, None)
    np.testing.assert_allclose(np.asarray(got_a), ref_a.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_x), ref_x.numpy(), atol=2e-4, rtol=1e-3)

    # EMA slices carry the (shifted) EMA weights, beta-ascending
    ema0 = ema_slice(payload["ema_params"], 0)
    expect = state_dict_to_flax(
        {k: v + 0.01 if v.is_floating_point() else v
         for k, v in net.state_dict().items()},
        list(cfg.model.depths), cfg.model.patch_size)
    got_leaf = np.asarray(ema0["params"]["map_layer0"]["kernel"])
    np.testing.assert_allclose(got_leaf, expect["params"]["map_layer0"]["kernel"],
                               rtol=1e-6)
    # and differ from the raw params by exactly the shift
    raw_leaf = np.asarray(payload["params"]["params"]["map_layer0"]["kernel"])
    np.testing.assert_allclose(got_leaf - raw_leaf, 0.01, rtol=1e-4)

    if not module_prefix:  # once is enough: the full eval CLI on the import
        from diffusesg_tpu.cli import eval as eval_cli
        eval_cli.main(["-p", out_dir, "--use_ema", "0.999",
                       "--eval_size", "4", "--batch_size", "4",
                       "--num_steps", "4", "--data_root", "/nonexistent",
                       "--override", "exp_dir=" + str(tmp_path / "eval_exp")])
        import glob
        csvs = glob.glob(str(tmp_path / "eval_exp" / "**" / "eval_results.csv"),
                         recursive=True)
        assert csvs, "eval CLI on the imported run dir produced no results csv"


def test_resume_training_from_imported_dir(ref_mod, small_cfg, tmp_path):
    """--resume <imported_run_dir> continues training from the converted
    weights (fresh optimizer, like the reference's weights-only resume)."""
    import glob
    from diffusesg_tpu.cli import import_ckpt
    from diffusesg_tpu.cli import train as train_cli

    _, pth = _make_reference_ckpt(ref_mod, small_cfg, tmp_path, False)
    out_dir = str(tmp_path / "imported")
    import_ckpt.main([pth, "-o", out_dir])

    train_cli.main(["-c", os.path.join(out_dir, "config.yaml"),
                    "--data_root", "/nonexistent", "--resume", out_dir,
                    "--max_epoch", "9", "--batch_size", "8", "--subset", "8",
                    "--save_interval", "1", "--sample_interval", "1000",
                    "--override", "exp_dir=" + str(tmp_path / "resume_exp"),
                    "--override", "mcmc.num_steps=4"])
    # epoch numbering continues past the imported epoch 7
    ckpts = glob.glob(str(tmp_path / "resume_exp" / "**" / "models_ckpt" / "*"),
                      recursive=True)
    epochs = sorted(int(os.path.basename(c)) for c in ckpts
                    if os.path.basename(c).isdigit())
    assert epochs and epochs[0] >= 8, epochs


def test_import_rejects_mismatched_model(ref_mod, small_cfg, tmp_path):
    """A checkpoint whose weights don't match the config's model raises a
    clear error instead of writing a broken run dir."""
    from diffusesg_tpu.utils.torch_import import (
        import_reference_checkpoint, load_reference_pth,
    )

    net, pth = _make_reference_ckpt(ref_mod, small_cfg, tmp_path, False)
    ckpt = load_reference_pth(pth)
    bad_cfg = small_cfg.copy()
    with bad_cfg.unlocked():
        bad_cfg.model.feature_dims = [96]  # embed dim mismatch
    with pytest.raises(ValueError, match="differ|match"):
        import_reference_checkpoint(ckpt, bad_cfg)
