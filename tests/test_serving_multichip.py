"""Multi-chip serving: batch-sharded sampling+decode over a device mesh.

The serving counterpart of the sharded eval sampling path
(tests/test_sharded_sampling.py; reference DDP eval sharding:
DiffuseSG/runner/sampler/sampler_node_adj.py:331-345).  On the 8-virtual-
device CPU mesh:

* the GSPMD variant must decode the SAME graphs as the single-device
  serving fn (the partitioner only re-lays-out the identical program);
* the shard_map variant (the Pallas-kernel multi-chip path) must match a
  host emulation of its per-shard rng fold;
* the SPMD artifact must round-trip through jax.export bit-exactly and
  refuse to load in an undersized process.
"""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # SPMD export compiles

from diffusesg_tpu.config import load_config
from diffusesg_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = load_config("configs/vg_small_test.yaml")
    with cfg.unlocked():
        cfg.dataset.max_node_num = 8
        cfg.mcmc.num_steps = 4
        cfg.test.batch_size = 8
    return cfg


@pytest.fixture(scope="module")
def built(tiny_cfg):
    from diffusesg_tpu.models import build_model
    from diffusesg_tpu.models.factory import init_params

    model = build_model(tiny_cfg)
    params = init_params(model, tiny_cfg, jax.random.PRNGKey(0))
    return model, params


def _flags(batch, n, counts):
    f = np.zeros((batch, n), bool)
    for i, c in enumerate(counts):
        f[i, :c] = True
    return f


def test_gspmd_sharded_serving_matches_single_device(tiny_cfg, built):
    from diffusesg_tpu.sampling import get_mc_sampler
    from diffusesg_tpu.serving.export import (make_serving_fn,
                                              make_sharded_serving_fn)

    model, params = built
    sampler = get_mc_sampler(tiny_cfg)
    n = tiny_cfg.dataset.max_node_num
    flags = _flags(8, n, [8, 7, 6, 5, 4, 3, 2, 1])

    single = jax.jit(make_serving_fn(model, params, sampler, tiny_cfg))
    sharded = make_sharded_serving_fn(model, params, sampler, tiny_cfg,
                                      make_mesh(8), "gspmd")
    ref = [np.asarray(v) for v in single(np.int32(5), flags)]
    got = [np.asarray(v) for v in sharded(np.int32(5), flags)]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)
    # really sharded: every device holds a 1/8 batch shard
    out = sharded(np.int32(5), flags)
    assert len(out[0].sharding.device_set) == 8


def test_shardmap_serving_matches_host_emulation(tiny_cfg, built):
    """The shard_map variant folds each shard's axis index into the key;
    emulate that fold shard-by-shard on one device and match exactly
    (same contract as tests/test_shardmap_dp.py)."""
    from diffusesg_tpu.sampling import get_mc_sampler
    from diffusesg_tpu.serving.export import (_serving_impl,
                                              make_sharded_serving_fn)

    model, params = built
    sampler = get_mc_sampler(tiny_cfg)
    n = tiny_cfg.dataset.max_node_num
    flags = _flags(8, n, [8, 7, 6, 5, 4, 3, 2, 1])

    sharded = make_sharded_serving_fn(model, params, sampler, tiny_cfg,
                                      make_mesh(8), "shard_map")
    got = [np.asarray(v) for v in sharded(np.int32(3), flags)]

    impl = jax.jit(_serving_impl(model, sampler, tiny_cfg))
    base = jax.random.PRNGKey(3)
    for shard in range(8):
        rng = jax.random.fold_in(base, shard)
        ref = impl(params, rng, flags[shard:shard + 1])
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), g[shard:shard + 1])

    # determinism + seed sensitivity at the sharded surface
    again = [np.asarray(v) for v in sharded(np.int32(3), flags)]
    other = [np.asarray(v) for v in sharded(np.int32(4), flags)]
    for g, a in zip(got, again):
        np.testing.assert_array_equal(g, a)
    assert any(not np.array_equal(g, o) for g, o in zip(got, other))


def test_gspmd_sharded_completion_matches_single_device(tiny_cfg, built):
    from diffusesg_tpu.sampling import get_mc_sampler
    from diffusesg_tpu.serving.export import (make_completion_fn,
                                              make_sharded_completion_fn)

    model, params = built
    sampler = get_mc_sampler(tiny_cfg)
    n = tiny_cfg.dataset.max_node_num
    B = 8
    flags = _flags(B, n, [6] * B)
    kn = np.zeros((B, n), np.int32)
    mn = np.zeros((B, n), bool)
    kb = np.full((B, n, 4), 0.5, np.float32)
    mb = np.zeros((B, n), bool)
    ka = np.zeros((B, n, n), np.int32)
    ma = np.zeros((B, n, n), bool)
    kn[:, 0] = 3
    mn[:, 0] = True
    kb[:, 0] = [0.25, 0.25, 0.1, 0.2]
    mb[:, 0] = True
    ka[:, 0, 1] = 2
    ma[:, 0, 1] = True
    args = (flags, kn, mn, kb, mb, ka, ma)

    single = jax.jit(make_completion_fn(model, params, sampler, tiny_cfg))
    sharded = make_sharded_completion_fn(model, params, sampler, tiny_cfg,
                                         make_mesh(8), "gspmd")
    ref = [np.asarray(v) for v in single(np.int32(9), *args)]
    got = [np.asarray(v) for v in sharded(np.int32(9), *args)]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)
    adj, node, bbox = got
    assert (node[:, 0] == 3).all() and (adj[:, 0, 1] == 2).all()
    np.testing.assert_allclose(bbox[:, 0], [[0.25, 0.25, 0.1, 0.2]] * B,
                               atol=1e-5)


def test_spmd_artifact_roundtrip(tiny_cfg, built, tmp_path):
    from diffusesg_tpu.sampling import get_mc_sampler
    from diffusesg_tpu.serving.export import (export_sampler, load_artifact,
                                              make_sharded_serving_fn,
                                              save_artifact)

    model, params = built
    sampler = get_mc_sampler(tiny_cfg)
    mesh = make_mesh(8)
    exported = export_sampler(model, params, sampler, tiny_cfg,
                              batch_size=8, mesh=mesh)
    assert exported.nr_devices == 8
    art = str(tmp_path / "spmd_artifact")
    save_artifact(art, exported, tiny_cfg, batch_size=8)
    loaded, meta = load_artifact(art)
    assert meta["num_devices"] == 8

    n = tiny_cfg.dataset.max_node_num
    flags = _flags(8, n, [8, 6, 4, 2, 8, 6, 4, 2])
    live = make_sharded_serving_fn(model, params, sampler, tiny_cfg,
                                   mesh, "gspmd")
    ref = [np.asarray(v) for v in live(np.int32(11), flags)]
    got = [np.asarray(v) for v in loaded(np.int32(11), flags)]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


def test_spmd_artifact_refuses_undersized_process(tiny_cfg, built, tmp_path):
    """A >N-device artifact must fail loudly in an N-device process."""
    import json
    import os

    from diffusesg_tpu.sampling import get_mc_sampler
    from diffusesg_tpu.serving.export import (export_sampler, load_artifact,
                                              save_artifact)

    model, params = built
    sampler = get_mc_sampler(tiny_cfg)
    exported = export_sampler(model, params, sampler, tiny_cfg,
                              batch_size=8, mesh=make_mesh(8))
    art = str(tmp_path / "art9")
    save_artifact(art, exported, tiny_cfg, batch_size=8)
    meta_path = os.path.join(art, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["num_devices"] = 9  # more than this process has
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(RuntimeError, match="SPMD program over 9 devices"):
        load_artifact(art)


def test_export_batch_must_divide_mesh(tiny_cfg, built):
    from diffusesg_tpu.sampling import get_mc_sampler
    from diffusesg_tpu.serving.export import export_sampler

    model, params = built
    sampler = get_mc_sampler(tiny_cfg)
    with pytest.raises(ValueError, match="must divide"):
        export_sampler(model, params, sampler, tiny_cfg, batch_size=6,
                       mesh=make_mesh(8))


def test_shardmap_completion_matches_host_emulation(tiny_cfg, built):
    from diffusesg_tpu.sampling import get_mc_sampler
    from diffusesg_tpu.serving.export import (_completion_impl,
                                              make_sharded_completion_fn)

    model, params = built
    sampler = get_mc_sampler(tiny_cfg)
    n = tiny_cfg.dataset.max_node_num
    B = 8
    flags = _flags(B, n, [6] * B)
    kn = np.zeros((B, n), np.int32)
    mn = np.zeros((B, n), bool)
    kb = np.full((B, n, 4), 0.5, np.float32)
    mb = np.zeros((B, n), bool)
    ka = np.zeros((B, n, n), np.int32)
    ma = np.zeros((B, n, n), bool)
    kn[:, 0] = 7
    mn[:, 0] = True
    ka[:, 0, 1] = 1
    ma[:, 0, 1] = True
    args = (flags, kn, mn, kb, mb, ka, ma)

    sharded = make_sharded_completion_fn(model, params, sampler, tiny_cfg,
                                         make_mesh(8), "shard_map")
    got = [np.asarray(v) for v in sharded(np.int32(6), *args)]
    assert (got[1][:, 0] == 7).all() and (got[0][:, 0, 1] == 1).all()

    impl = jax.jit(_completion_impl(model, sampler, tiny_cfg))
    base = jax.random.PRNGKey(6)
    for shard in range(8):
        rng = jax.random.fold_in(base, shard)
        sl = slice(shard, shard + 1)
        ref = impl(params, rng, *[a[sl] for a in args])
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), g[sl])


def test_spmd_artifact_roundtrip_shardmap(tiny_cfg, built, tmp_path):
    """shard_map programs (the Pallas multi-chip path) also export/reload."""
    from diffusesg_tpu.sampling import get_mc_sampler
    from diffusesg_tpu.serving.export import (export_sampler, load_artifact,
                                              make_sharded_serving_fn,
                                              save_artifact)

    model, params = built
    sampler = get_mc_sampler(tiny_cfg)
    mesh = make_mesh(8)
    exported = export_sampler(model, params, sampler, tiny_cfg,
                              batch_size=8, mesh=mesh, spmd_mode="shard_map")
    assert exported.nr_devices == 8
    art = str(tmp_path / "sm_artifact")
    save_artifact(art, exported, tiny_cfg, batch_size=8)
    loaded, meta = load_artifact(art)
    assert meta["num_devices"] == 8

    n = tiny_cfg.dataset.max_node_num
    flags = _flags(8, n, [8, 6, 4, 2, 8, 6, 4, 2])
    live = make_sharded_serving_fn(model, params, sampler, tiny_cfg,
                                   mesh, "shard_map")
    ref = [np.asarray(v) for v in live(np.int32(13), flags)]
    got = [np.asarray(v) for v in loaded(np.int32(13), flags)]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)
