"""Tensor-parallel (2-D data x model mesh) tests on the virtual 8-device
CPU mesh: sharding-rule unit tests, real sharded placement, and numerical
equivalence of the TP train step vs single-device jit.

The reference has no model parallelism (DDP only,
DiffuseSG/utils/dist_training.py:62-85); this is the TPU-native extension
(parallel/tp.py).
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.slow  # 2-D mesh TP step compiles
from jax.sharding import PartitionSpec as P

from diffusesg_tpu.parallel import (
    make_mesh_2d, shard_batch, shard_train_state, make_sharded_train_step,
    tp_param_shardings, tp_state_shardings,
)

from test_parallel import _setup


def test_mesh_2d_shape(devices):
    mesh = make_mesh_2d(4, 2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_tp_param_sharding_rules(devices):
    mesh = make_mesh_2d(2, 4)
    tree = {
        "blk": {
            "qkv_kernel": jnp.zeros((96, 288)),    # col-parallel -> out axis
            "qkv_bias": jnp.zeros((288,)),
            "mlp_fc1_kernel": jnp.zeros((96, 384)),
            "proj_kernel": jnp.zeros((96, 96)),    # row-parallel -> in axis
            "mlp_fc2_kernel": jnp.zeros((384, 96)),
            "proj_bias": jnp.zeros((96,)),         # replicated
            "norm1_scale": jnp.zeros((96,)),       # replicated
            # indivisible by tp=4 -> falls back to replicated
            "odd": {"qkv_kernel": jnp.zeros((10, 6))},
        }
    }
    sh = tp_param_shardings(tree, mesh)
    assert sh["blk"]["qkv_kernel"].spec == P(None, "model")
    assert sh["blk"]["qkv_bias"].spec == P("model")
    assert sh["blk"]["mlp_fc1_kernel"].spec == P(None, "model")
    # trailing unsharded dims are normalized away: P("model", None) == P("model") semantically
    assert sh["blk"]["proj_kernel"].spec == P("model")
    assert sh["blk"]["mlp_fc2_kernel"].spec == P("model")
    assert sh["blk"]["proj_bias"].spec == P()
    assert sh["blk"]["norm1_scale"].spec == P()
    assert sh["blk"]["odd"]["qkv_kernel"].spec == P()


def test_tp_state_sharding_combines_zero1(devices):
    """Optimizer/EMA leaves: model axis on the TP axis, ZeRO-1 data axis on
    the largest remaining divisible axis."""
    mesh = make_mesh_2d(2, 4)
    tree = {
        # EMA stack [K=2, in=96, out=288]: out is TP; K=2 divisible by dp=2
        "ema": {"qkv_kernel": jnp.zeros((2, 96, 288))},
        # Adam moment, same shape as the param
        "mu": {"mlp_fc2_kernel": jnp.zeros((384, 96))},
        "scalar": jnp.zeros(()),
    }
    sh = tp_state_shardings(tree, mesh)
    # TP on last axis; zero1 picks 96 (largest remaining divisible) not K=2
    assert sh["ema"]["qkv_kernel"].spec == P(None, "data", "model")
    # TP on axis -2 (384); zero1 gets the 96 out axis
    assert sh["mu"]["mlp_fc2_kernel"].spec == P("model", "data")
    assert sh["scalar"].spec == P()


def test_tp_train_step_matches_single_device(devices):
    """One TP train step on a (2, 4) mesh reproduces single-device jit:
    same loss, same updated params (XLA inserts the row-parallel psums)."""
    model, state, step, (adjs, nodes, flags) = _setup()
    rng = jax.random.PRNGKey(3)

    s1, m1 = jax.jit(step)(state, rng, jnp.asarray(adjs), jnp.asarray(nodes),
                           jnp.asarray(flags))

    mesh = make_mesh_2d(2, 4)
    state_tp = shard_train_state(state, mesh, tp=True)
    # the qkv kernel really is split over the model axis
    qkv = state_tp.params["params"]["down_layers_0"]["SwinBlock_0"]["qkv_kernel"]
    assert qkv.sharding.spec == P(None, "model")
    shard_cols = {s.data.shape[-1] for s in qkv.addressable_shards}
    assert shard_cols == {qkv.shape[-1] // 4}

    batch = shard_batch((jnp.asarray(adjs), jnp.asarray(nodes),
                         jnp.asarray(flags)), mesh)
    sharded = make_sharded_train_step(step, state_tp, mesh, donate=False, tp=True)
    stp, mtp = sharded(state_tp, rng, *batch)

    np.testing.assert_allclose(float(m1["loss"]), float(mtp["loss"]), rtol=2e-5)
    p1 = jax.tree.leaves(s1.params)
    ptp = jax.tree.leaves(stp.params)
    for a, b in zip(p1, ptp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(jax.device_get(b)),
                                   rtol=1e-4, atol=1e-6)


def test_tp_multi_step_stays_in_sync(devices):
    """Three consecutive TP steps track single-device training (optimizer
    state sharded on both axes stays numerically consistent)."""
    model, state, step, (adjs, nodes, flags) = _setup()
    a, n, f = jnp.asarray(adjs), jnp.asarray(nodes), jnp.asarray(flags)

    s1 = state
    jstep = jax.jit(step)
    for i in range(3):
        s1, m1 = jstep(s1, jax.random.PRNGKey(i), a, n, f)

    mesh = make_mesh_2d(4, 2)
    stp = shard_train_state(state, mesh, tp=True)
    batch = shard_batch((a, n, f), mesh)
    sharded = make_sharded_train_step(step, stp, mesh, donate=False, tp=True)
    for i in range(3):
        stp, mtp = sharded(stp, jax.random.PRNGKey(i), *batch)

    np.testing.assert_allclose(float(m1["loss"]), float(mtp["loss"]), rtol=1e-4)
    e1 = jax.tree.leaves(s1.ema_params)[0]
    etp = jax.tree.leaves(stp.ema_params)[0]
    np.testing.assert_allclose(np.asarray(e1), np.asarray(jax.device_get(etp)),
                               rtol=1e-4, atol=1e-6)
