"""Multi-device tests on the virtual 8-device CPU mesh: sharded train step,
ZeRO-1 state sharding, single- vs multi-device numerical equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 8-device sharded train/dryrun compiles

from diffusesg_tpu.parallel import (
    make_mesh, batch_sharding, zero1_sharding, shard_batch,
    shard_train_state, make_sharded_train_step, gather_to_host,
)
from diffusesg_tpu.train import (
    TrainStepConfig, create_train_state, make_optimizer, make_train_step,
)
from diffusesg_tpu.models import DiffuseSG


def _setup(rng_seed=0, b=8, n=8):
    model = DiffuseSG(img_size=n, patch_size=1, in_chans=11, embed_dim=48,
                      depths=(1,), num_heads=(3,), window_size=8,
                      out_chans_adj=1, out_chans_node=5,
                      self_condition=True, symmetric_noise=False)
    rs = np.random.RandomState(rng_seed)
    flags = np.ones((b, n), dtype=bool)
    adjs = rs.choice([-1, 0, 1], (b, n, n)).astype(np.float32)
    nodes = rs.uniform(-1, 1, (b, n, 5)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(adjs), jnp.asarray(nodes),
                        jnp.asarray(flags), jnp.zeros((b,)), None, None)
    opt = make_optimizer(1e-3, 1.0, 1)
    state = create_train_state(params, [0.9, 0.999], opt)
    cfg = TrainStepConfig(self_condition=True, iou_loss_weight=1.0)
    step = make_train_step(model.apply, opt, cfg)
    return model, state, step, (adjs, nodes, flags)


def test_mesh_creation(devices):
    mesh = make_mesh(8)
    assert mesh.size == 8
    assert mesh.axis_names == ("data",)
    mesh2 = make_mesh(4)
    assert mesh2.size == 4


def test_zero1_sharding_shards_large_leaves(devices):
    mesh = make_mesh(8)
    tree = {"big": jnp.zeros((16, 4)), "small": jnp.zeros((3,)), "scalar": jnp.zeros(())}
    sh = zero1_sharding(tree, mesh)
    assert sh["big"].spec == jax.sharding.PartitionSpec("data", None)
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert sh["scalar"].spec == jax.sharding.PartitionSpec()


def test_zero1_sharding_largest_axis_rule(devices):
    """Explicit rule: shard the LARGEST mesh-divisible axis (deterministic
    layouts for the stacked-[K, ...] EMA leaves regardless of K)."""
    mesh = make_mesh(8)
    tree = {
        # K=5 stack: K not divisible -> the 96 param axis wins
        "ema_kernel": jnp.zeros((5, 48, 96)),
        # both divisible: 384 > 96 -> axis 1
        "kernel": jnp.zeros((96, 384)),
        # K=8 divisible but 768 larger -> the param axis still wins
        "ema_big": jnp.zeros((8, 16, 768)),
    }
    sh = zero1_sharding(tree, mesh)
    P = jax.sharding.PartitionSpec
    assert sh["ema_kernel"].spec == P(None, None, "data")
    assert sh["kernel"].spec == P(None, "data")
    assert sh["ema_big"].spec == P(None, None, "data")


def test_sharded_train_step_runs(devices):
    mesh = make_mesh(8)
    model, state, step, (adjs, nodes, flags) = _setup()
    state = shard_train_state(state, mesh)
    batch = shard_batch((jnp.asarray(adjs), jnp.asarray(nodes), jnp.asarray(flags)), mesh)
    sharded = make_sharded_train_step(step, state, mesh)
    new_state, metrics = sharded(state, jax.random.PRNGKey(1), *batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(jax.device_get(new_state.step)) == 1
    # per-sample metrics stay sharded over the batch
    assert metrics["loss_adj_per_sample"].shape == (8,)


def test_single_vs_multi_device_loss_matches(devices):
    """The sharded step must compute the same loss as single-device jit
    (loss traces match, SURVEY build-order stage 7 validation)."""
    model, state, step, (adjs, nodes, flags) = _setup()
    rng = jax.random.PRNGKey(3)

    # single device
    s1, m1 = jax.jit(step)(state, rng, jnp.asarray(adjs), jnp.asarray(nodes),
                           jnp.asarray(flags))
    # 8-device mesh
    mesh = make_mesh(8)
    state8 = shard_train_state(state, mesh, zero1=True)
    batch = shard_batch((jnp.asarray(adjs), jnp.asarray(nodes), jnp.asarray(flags)), mesh)
    sharded = make_sharded_train_step(step, state8, mesh, donate=False)
    s8, m8 = sharded(state8, rng, *batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-5)
    # parameters after the update agree
    p1 = jax.tree.leaves(s1.params)[0]
    p8 = jax.tree.leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(jax.device_get(p8)),
                               rtol=1e-4, atol=1e-6)


def test_gather_to_host(devices):
    mesh = make_mesh(8)
    x = jnp.arange(16.0).reshape(16, 1)
    xs = jax.device_put(x, batch_sharding(mesh, 2))
    out = gather_to_host(xs)
    np.testing.assert_array_equal(out, np.arange(16.0).reshape(16, 1))


def test_graft_entry_dryrun(devices):
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[0] == 4


def test_fenced_jit_single_process_passthrough():
    """FencedJit is a zero-overhead passthrough when not multi-process: no
    AOT compile, no barrier, results identical (the fenced path itself is
    covered by the two-process training e2es in test_distributed.py)."""
    import jax
    import jax.numpy as jnp

    from diffusesg_tpu.parallel.distributed import FencedJit

    fj = FencedJit(jax.jit(lambda x: x * 2 + 1), "test_fence")
    assert float(fj(jnp.float32(3))) == 7.0
    assert fj._compiled is None and fj._fenced
    assert float(fj(jnp.float32(4))) == 9.0
