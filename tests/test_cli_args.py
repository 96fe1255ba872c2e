"""Parser-level CLI parity tests (reference: DiffuseSG/utils/arg_parser.py).

These don't run training; they assert the flag surface and override
semantics a reference user relies on translate exactly.
"""
import os

import numpy as np
import pytest

from diffusesg_tpu.cli.common import (build_eval_parser, build_train_parser,
                                      config_from_args)
from diffusesg_tpu.cli.eval import select_ema_indices
from diffusesg_tpu.utils.checkpoint import select_checkpoints

CFG = "configs/vg_small_test.yaml"


def test_batch_size_overrides_train_and_test_sections():
    # reference applies a train-mode --batch_size to BOTH config.train and
    # config.test (arg_parser.py:216-224, 248-268)
    args = build_train_parser().parse_args(["-c", CFG, "--batch_size", "16"])
    cfg = config_from_args(args, "train")
    assert cfg.train.batch_size == 16
    assert cfg.test.batch_size == 16


def test_backbone_flags_override_model_section():
    # scalar flag replaces an int key or a single-element list key
    # (arg_parser.py:233-246)
    args = build_train_parser().parse_args(
        ["-c", CFG, "--feature_dims", "64", "--window_size", "4",
         "--patch_size", "2"])
    cfg = config_from_args(args, "train")
    assert cfg.model.feature_dims == [64]
    assert cfg.model.window_size == 4
    assert cfg.model.patch_size == 2


def test_ddp_flags_accepted_as_noops():
    args = build_train_parser().parse_args(
        ["-c", CFG, "--ddp", "--dp", "--ddp_gpu_ids", "0", "1",
         "--ddp_init_method", "env://"])
    cfg = config_from_args(args, "train")  # must not raise
    assert cfg.train.batch_size == 4  # untouched


def test_eval_parser_specify_epoch_takes_several():
    args = build_eval_parser().parse_args(
        ["-p", "/tmp/x", "--specify_epoch", "100", "200", "--search_weights"])
    assert args.specify_epoch == [100, 200]


def test_select_checkpoints_specify_epoch_list(tmp_path):
    for e in (100, 200, 300):
        os.makedirs(tmp_path / str(e))
    got = select_checkpoints(str(tmp_path), specify_epoch=[100, 300])
    assert [os.path.basename(p) for p in got] == ["100", "300"]
    got = select_checkpoints(str(tmp_path), specify_epoch=200)
    assert [os.path.basename(p) for p in got] == ["200"]


def test_resample_node_flags_matches_reference_semantics():
    # reference: sampler_node_adj.py:146-154 — counts drawn from the
    # empirical pool, slots filled front-to-back, masks never empty
    from diffusesg_tpu.sampling.orchestrator import resample_node_flags
    flags = np.zeros((16, 10), bool)
    flags[:, :3] = True
    pool = [2, 5, 7]
    out = resample_node_flags(flags, pool, seed=0)
    counts = out.sum(-1)
    assert set(counts.tolist()) <= set(pool)
    assert (counts > 0).all()
    # prefix property: every row is True up to its count then False
    for row, c in zip(out, counts):
        assert row[:c].all() and not row[c:].any()
    # deterministic in the seed
    assert (resample_node_flags(flags, pool, seed=0) == out).all()
    assert not (resample_node_flags(flags, pool, seed=1) == out).all()


class TestSelectEmaIndices:
    """Mirrors reference get_ema_weight_keywords (eval.py:15-40)."""
    BETAS = np.array([0.9, 0.99, 0.9999])

    def test_all_includes_raw_weights(self):
        # reference 'all' evaluates the raw 'model' key plus every EMA
        assert select_ema_indices(self.BETAS, "all") == [-1, 0, 1, 2]
        assert select_ema_indices(self.BETAS, ["all"]) == [-1, 0, 1, 2]

    def test_none_is_raw_only(self):
        assert select_ema_indices(self.BETAS, ["none"]) == [-1]
        assert select_ema_indices(self.BETAS, []) == [-1]

    def test_value_list_with_raw_sentinel(self):
        # 1.0 means the raw weights; other values must match a beta exactly
        assert select_ema_indices(self.BETAS, ["1.0", "0.9999"]) == [-1, 2]
        assert select_ema_indices(self.BETAS, ["0.99"]) == [1]

    def test_missing_beta_raises(self):
        with pytest.raises(ValueError, match="not found"):
            select_ema_indices(self.BETAS, ["0.5"])

    def test_ema_weights_alias(self):
        assert select_ema_indices(self.BETAS, "all", ema_weights=["0.9"]) == [0]


def test_checkpoint_discovery_skips_orbax_tmp_dirs(tmp_path):
    """An async save killed mid-write leaves <name>.orbax-checkpoint-tmp-*
    (already carrying _CHECKPOINT_METADATA); discovery must never pick it
    (resume/eval/serve would restore a partial checkpoint)."""
    import os
    import time

    from diffusesg_tpu.utils.checkpoint import (latest_checkpoint,
                                                list_checkpoints,
                                                select_checkpoints)

    ck = tmp_path / "models_ckpt"
    for name in ["00000", "00001"]:
        d = ck / name
        d.mkdir(parents=True)
        (d / "_CHECKPOINT_METADATA").write_text("{}")
        time.sleep(0.01)
    tmp = ck / "00002.orbax-checkpoint-tmp-1234"
    tmp.mkdir()
    (tmp / "_CHECKPOINT_METADATA").write_text("{}")  # newest mtime!

    listed = [os.path.basename(p) for p in list_checkpoints(str(ck))]
    assert listed == ["00000", "00001"]
    assert os.path.basename(latest_checkpoint(str(ck))) == "00001"
    sel = [os.path.basename(p) for p in select_checkpoints(str(ck))]
    assert "00002.orbax-checkpoint-tmp-1234" not in sel


def test_latest_checkpoint_prefers_newest_not_linspace(tmp_path):
    """serve -p <run_dir> must load the NEWEST checkpoint; num_ckpts=1
    select_checkpoints returns the OLDEST (evenly-spaced sweep semantics)."""
    import os
    import time

    from diffusesg_tpu.utils.checkpoint import (latest_checkpoint,
                                                select_checkpoints)

    ck = tmp_path / "models_ckpt"
    for name in ["00000", "00050", "00099"]:
        (ck / name).mkdir(parents=True)
        (ck / name / "_CHECKPOINT_METADATA").write_text("{}")
        time.sleep(0.01)
    assert os.path.basename(latest_checkpoint(str(ck))) == "00099"
    # documents why serve must NOT use num_ckpts=1 for "latest"
    only = select_checkpoints(str(ck), num_ckpts=1)
    assert os.path.basename(only[0]) == "00000"


def test_latest_checkpoint_epoch_order_survives_mtime_flattening(tmp_path):
    """A run dir restored by cp -r / rsync-without-times flattens directory
    mtimes (often reversing them via readdir order); 'latest' must still be
    the HIGHEST epoch, and a preempt save must only win while its mtime is
    genuinely newer."""
    import os
    import time

    from diffusesg_tpu.utils.checkpoint import latest_checkpoint

    ck = tmp_path / "models_ckpt"
    # epochs written newest-epoch-FIRST so mtime order contradicts epoch order
    for name in ["00099", "00050", "00000"]:
        (ck / name).mkdir(parents=True)
        (ck / name / "_CHECKPOINT_METADATA").write_text("{}")
        time.sleep(0.01)
    assert os.path.basename(latest_checkpoint(str(ck))) == "00099"

    # a stray non-checkpoint dir (no metadata) with the newest mtime is ignored
    (ck / "notes").mkdir()
    assert os.path.basename(latest_checkpoint(str(ck))) == "00099"

    # a preempt checkpoint saved after the last rolling save wins...
    time.sleep(0.01)
    pre = ck / "preempt"
    pre.mkdir()
    (pre / "_CHECKPOINT_METADATA").write_text("{}")
    assert os.path.basename(latest_checkpoint(str(ck))) == "preempt"
    # ...but loses the tie once mtimes are flattened to the same instant
    now = time.time()
    for name in ["00099", "00050", "00000", "preempt"]:
        os.utime(ck / name, (now, now))
    assert os.path.basename(latest_checkpoint(str(ck))) == "00099"
