"""shard_map data-parallel path (parallel/shardmap_dp.py): exact parity
with a host-side emulation of the per-shard computation.

The shard_map path exists to carry the Pallas kernels to multi-chip
(GSPMD all-gathers around opaque tpu_custom_calls).  Its RNG contract is
explicit — shard i computes with fold_in(key, i) on its batch slice — so
these tests re-run that exact computation unsharded and require bitwise
or near-bitwise agreement.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.slow  # shard_map step compiles + emulation

from test_parallel import _setup

from diffusesg_tpu.parallel import make_mesh, replicate_tree, shard_batch
from diffusesg_tpu.parallel.shardmap_dp import (
    make_shardmap_eval_step, make_shardmap_sample_fn, make_shardmap_train_step,
)
from diffusesg_tpu.train import TrainStepConfig, make_optimizer
from diffusesg_tpu.train.train_step import make_loss_fn
from diffusesg_tpu.sampling.edm_sampler import NodeAdjEDMSampler
from diffusesg_tpu.sampling.orchestrator import make_sample_fn


def _emulate_shards(key, arrays, n_shards):
    """Yield (rng_i, slices_i) exactly as shard i sees them."""
    b = arrays[0].shape[0]
    per = b // n_shards
    for i in range(n_shards):
        sl = tuple(a[i * per:(i + 1) * per] for a in arrays)
        yield jax.random.fold_in(key, i), sl


def test_shardmap_train_step_matches_emulation(devices):
    model, state, step, (adjs, nodes, flags) = _setup()
    cfg = TrainStepConfig(self_condition=True, iou_loss_weight=1.0)
    opt = make_optimizer(1e-3, 1.0, 1)
    mesh = make_mesh(2)
    key = jax.random.PRNGKey(7)
    arrays = (jnp.asarray(adjs), jnp.asarray(nodes), jnp.asarray(flags))

    state_r = replicate_tree(state, mesh)
    batch = shard_batch(arrays, mesh)
    sm_step = make_shardmap_train_step(model.apply, opt, cfg, mesh, donate=False)
    new_state, metrics = sm_step(state_r, key, *batch)

    # host emulation: per-shard loss/grads with the folded keys, pmean'd
    loss_fn = make_loss_fn(model.apply, cfg)
    losses, grads_list = [], []
    for rng_i, (a_i, n_i, f_i) in _emulate_shards(key, arrays, 2):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, rng_i, a_i, n_i, f_i)
        losses.append(np.asarray(l))
        grads_list.append(g)
    mean_grads = jax.tree.map(lambda *g: sum(g) / len(g), *grads_list)
    updates, _ = opt.update(mean_grads, state.opt_state, state.params)
    want_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

    np.testing.assert_allclose(float(metrics["loss"]), np.mean(losses), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(want_params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(jax.device_get(b)),
                                   rtol=1e-5, atol=1e-7)
    # updated state is genuinely replicated across the mesh
    p0 = jax.tree.leaves(new_state.params)[0]
    shards = [np.asarray(s.data) for s in p0.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_shardmap_eval_step_matches_emulation(devices):
    model, state, step, (adjs, nodes, flags) = _setup()
    cfg = TrainStepConfig(self_condition=True, iou_loss_weight=1.0)
    mesh = make_mesh(2)
    key = jax.random.PRNGKey(11)
    arrays = (jnp.asarray(adjs), jnp.asarray(nodes), jnp.asarray(flags))

    params_r = replicate_tree(state.params, mesh)
    batch = shard_batch(arrays, mesh)
    ev = make_shardmap_eval_step(model.apply, cfg, mesh)
    metrics = ev(params_r, key, *batch)

    loss_fn = make_loss_fn(model.apply, cfg)
    losses = [np.asarray(loss_fn(state.params, rng_i, a_i, n_i, f_i)[0])
              for rng_i, (a_i, n_i, f_i) in _emulate_shards(key, arrays, 2)]
    np.testing.assert_allclose(float(metrics["loss"]), np.mean(losses), rtol=1e-6)


def test_shardmap_sampling_matches_emulation(devices):
    """Per-shard reverse diffusion == the same slices sampled unsharded
    with the folded keys (sampling has no cross-shard collectives)."""
    model, state, step, (adjs, nodes, flags) = _setup()
    mesh = make_mesh(2)
    key = jax.random.PRNGKey(5)
    sampler = NodeAdjEDMSampler(num_steps=4, self_condition=True,
                                symmetric_noise=False)

    sf = make_shardmap_sample_fn(model, state.params, sampler, 5, 1, mesh)
    a_sm, x_sm = sf(key, jnp.asarray(flags))
    a_sm, x_sm = np.asarray(a_sm), np.asarray(x_sm)

    plain = make_sample_fn(model, state.params, sampler, 5, 1)
    outs_a, outs_x = [], []
    for rng_i, (f_i,) in _emulate_shards(key, (jnp.asarray(flags),), 2):
        ai, xi = plain(rng_i, f_i)
        outs_a.append(np.asarray(ai))
        outs_x.append(np.asarray(xi))
    np.testing.assert_allclose(a_sm, np.concatenate(outs_a), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(x_sm, np.concatenate(outs_x), rtol=1e-5, atol=1e-6)


def test_shardmap_carries_pallas_kernel(devices):
    """THE point of the shard_map path: a Pallas kernel (interpret mode on
    CPU) executes per-shard on its local batch slice inside shard_map, and
    the batch-sharded result equals the unsharded run exactly."""
    from jax.sharding import PartitionSpec as P

    from diffusesg_tpu.ops import mlp_block_kernel as mlpk
    from diffusesg_tpu.ops import swin_block_v3 as v3
    from test_swin_full_block import _case

    b, h, w, c, nh, window = 4, 16, 16, 64, 4, 8
    args = _case(b, h, w, c, nh, window, shifted=False)
    x, ss, weights = args[0], args[1], args[2:]

    v3.INTERPRET = True
    mlpk.INTERPRET = True
    try:
        want = np.asarray(v3.fused_swin_block_v3(*args, nh, window))

        mesh = make_mesh(2)
        sm = jax.shard_map(
            lambda xx, sss: v3.fused_swin_block_v3(xx, sss, *weights, nh, window),
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
            check_vma=False)
        got = np.asarray(jax.jit(sm)(
            *shard_batch((x, ss), mesh)))
    finally:
        v3.INTERPRET = False
        mlpk.INTERPRET = False
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
