"""Extended quality run on TPU: train on synthetic VG until the sampling
metrics approach the dataset's own (GT-sanity) level.

Stronger evidence than scripts/train_eval_cycle_tpu.py (1.6k steps): trains
~12k steps with the reference hyperparameters (EMA 0.999/0.9999, exp decay,
self-cond, IoU aux) and evaluates the full metric suite at checkpoints,
printing one JSON line per eval so progress is machine-readable.

Run: python scripts/train_quality_tpu.py  (one TPU process at a time).
"""
import sys, os, time, json, logging
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.INFO)  # surface per-phase eval timings
import jax, jax.numpy as jnp, numpy as np
try:  # persistent compile cache: relaunches/resumes skip the multi-minute
    # remote XLA compiles (same knobs bench.py uses)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass
from diffusesg_tpu.data import load_data
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.factory import init_params
from diffusesg_tpu.sampling import get_mc_sampler
from diffusesg_tpu.sampling.orchestrator import sg_go_sampling
from diffusesg_tpu.train import (create_train_state, make_optimizer,
                                 make_train_step, train_step_config_from)
from diffusesg_tpu.train.train_state import ema_slice

OUT = os.environ.get("QUALITY_DIR", "/tmp/quality")
STEPS = int(os.environ.get("QUALITY_STEPS", 12000))
EVAL_EVERY = int(os.environ.get("QUALITY_EVAL_EVERY", 4000))

from quality_common import quality_config  # noqa: E402 — sys.path set above

cfg = quality_config(OUT)
os.makedirs(cfg.logdir, exist_ok=True)
bundle = load_data(cfg, data_root='/nonexistent')
model = build_model(cfg)
params = init_params(model, cfg, jax.random.PRNGKey(0))
# the reference's LR recipe verbatim: Adam(lr_init=2e-4) + per-epoch
# ExponentialLR(gamma=lr_dacey, which the shipped yamls pin to 1.0 = constant)
# (reference: learning_utils.py:137-141, config yamls train block).
# QUALITY_LR_SCALE retains the earlier 2x-no-decay shortcut for comparisons.
_lr_scale = float(os.environ.get('QUALITY_LR_SCALE', 1.0))
# steps/epoch from the ACTUAL train split (held-out-regime populations are
# sized by dataset.synthetic_num_train, not subset)
_steps_per_epoch = max(1, len(bundle.train) // cfg.train.batch_size)
opt = make_optimizer(cfg.train.lr_init * _lr_scale, cfg.train.lr_dacey,
                     _steps_per_epoch)
state = create_train_state(params, [0.999, 0.9999], opt)
raw_step = make_train_step(model.apply, opt, train_step_config_from(cfg))
# Device-resident dataset + on-device batch gather.  Streaming per-step host
# batches through the tunneled backend RETAINS each staged host buffer for
# the life of the process (~6.5 MB/step at N=64 even with a periodic host
# sync — the first two flagship attempts were oom-killed at ~130 GB RSS,
# steps ~26k and ~19k).  The whole synthetic train split is ~26 MB, so the
# TPU-native fix is one up-front transfer; per dispatch only a [K, B] int32
# index array crosses the host boundary (~1 KB).
dev_adjs = jnp.asarray(np.asarray(bundle.train.adjs))
dev_nodes = jnp.asarray(np.asarray(bundle.train.nodes))
dev_flags = jnp.asarray(np.asarray(bundle.train.node_flags))
step = jax.jit(lambda st, k, ix, da, dn, df: raw_step(st, k, da[ix], dn[ix], df[ix]),
               donate_argnums=(0,))
# QUALITY_FUSE_STEPS=K dispatches K steps as ONE lax.scan program: the
# tunneled backend costs ~40-100 ms of dispatch latency per program (N=16
# steps measure ~111 ms wall for ~10 ms of compute), so long-horizon runs
# (e.g. the 100k-step EMA-warmup validation) fuse an epoch per dispatch.
FUSE = int(os.environ.get("QUALITY_FUSE_STEPS", 1))
if FUSE > 1:
    # clamp to a divisor of the epoch and of every eval boundary instead of
    # failing the assertions below (the synthetic train split is 256 graphs
    # -> 4 steps/epoch at batch 64, so e.g. FUSE=8 cannot tile an epoch)
    from math import gcd
    # 200 is the backpressure-sync grid below: a FUSE not dividing it would
    # silently stretch the host-sync period to lcm(FUSE, 200)
    _fuse_ok = gcd(gcd(FUSE, len(bundle.train) // cfg.train.batch_size or 1),
                   gcd(gcd(EVAL_EVERY, 2000), 200))
    if _fuse_ok != FUSE:
        print(f"QUALITY_FUSE_STEPS={FUSE} does not tile the epoch/eval grid; "
              f"clamped to {_fuse_ok}", flush=True)
        FUSE = _fuse_ok
if FUSE > 1:
    def _multi(state, rng, idx_k, da, dn, df):  # idx_k: [K, B] int32
        def body(st, xs):
            k, ix = xs
            return raw_step(st, k, da[ix], dn[ix], df[ix])
        return jax.lax.scan(body, state,
                            (jax.random.split(rng, FUSE), idx_k))
    multi_step = jax.jit(_multi, donate_argnums=(0,))
sampler = get_mc_sampler(cfg)

# metric columns recorded per eval: distribution metrics + the bbox branch
# (grounded boxes are half the paper's contribution: F1 per
# sampler_node_adj.py:507-552, BLT IOA per :482-505)
KEEP = ('node_degree_mmd_gaussian', 'node_type_mmd_gaussian',
        'edge_type_mmd_gaussian', 'triplet_tv_dist_full_val',
        'triplet_tv_dist_rej_val',
        'vanilla_f1_avg_max', 'area_f1_avg_max', 'freq_f1_avg_max',
        'no_node_type_f1_avg_max',
        'pred_iou_blt', 'pred_iou_percp_blt', 'pred_overlap_blt',
        'pred_alignment_blt',
        'gt_iou_blt', 'gt_iou_percp_blt', 'gt_overlap_blt',
        'gt_alignment_blt')


def _eval(tag, p, epoch, sanity=False):
    m = sg_go_sampling(model, p, sampler, cfg, bundle, epoch=epoch,
                       sanity_check=sanity)
    row = {k: round(float(v), 4) for k, v in m.items() if k in KEEP}
    print(json.dumps({"tag": tag, **row}), flush=True)
    return row


# Preemption safety: the TPU tunnel (or the driving session) can die hours
# into a run, so every eval point also persists a resume checkpoint.  Eval
# points land on epoch boundaries (EVAL_EVERY and subset/batch are both
# powers-of-two multiples), so resume restarts cleanly at the next epoch.
from diffusesg_tpu.utils.checkpoint import (restore_checkpoint,
                                            save_checkpoint,
                                            state_from_payload)
RESUME = os.path.join(OUT, 'ckpt_resume')
start_done = 0
if os.path.isdir(RESUME):
    payload = restore_checkpoint(RESUME, state)
    state = state_from_payload(payload)
    start_done = int(payload["extra"]["done"])
    print(f'resumed from {RESUME} at step {start_done}', flush=True)
elif os.environ.get("QUALITY_SKIP_INITIAL_EVALS") != "1":
    # the dataset's own level: GT-as-denoiser sanity sampling (reference
    # trick, trainer_node_adj.py:279-280) = the floor metrics approach.
    # QUALITY_SKIP_INITIAL_EVALS=1 skips both rows for runs whose only
    # purpose is producing a checkpoint (e.g. the conditional-completion
    # eval trains its own alpha-correlated model and computes its own floor)
    _eval("sanity_gt", params, 0, sanity=True)
    _eval("untrained", params, 1)

_steps_per_epoch_int = len(bundle.train) // cfg.train.batch_size or 1
# resume may land mid-epoch (eval/ckpt points follow EVAL_EVERY, which need
# not divide steps/epoch for large populations — e.g. 8192 graphs -> 128
# steps/epoch vs EVAL_EVERY=8000): fast-forward the resumed epoch's index
# stream by the already-consumed dispatches (deterministic: the stream is
# seeded by epoch alone)
_skip_steps = start_done % _steps_per_epoch_int
if FUSE > 1:
    # fused chunks must tile the epoch and land exactly on eval points
    assert _steps_per_epoch_int % FUSE == 0, (_steps_per_epoch_int, FUSE)
    assert EVAL_EVERY % FUSE == 0 and 2000 % FUSE == 0, (EVAL_EVERY, FUSE)
    assert _skip_steps % FUSE == 0, (_skip_steps, FUSE)
rng = jax.random.fold_in(jax.random.PRNGKey(1), start_done)
t0 = time.time()
done = start_done
epoch = start_done // _steps_per_epoch_int


def _epoch_steps(epoch):
    """Yield (n_steps, idx) per dispatch: [B] index rows for single steps or
    [FUSE, B] stacks for fused chunks.  Index stream is
    data.loader.epoch_index_batches (seed=0): identical to Batches'
    shuffle + repeat-to-batch composition for the shipped geometries
    (tests/test_data.py parity test); the documented deviations — trailing
    partial batches dropped, tiny non-divisor datasets tiled to one full
    batch — only arise when len(train) % batch != 0."""
    from diffusesg_tpu.data.loader import epoch_index_batches
    for ix in epoch_index_batches(len(bundle.train), cfg.train.batch_size,
                                  epoch, seed=0, fuse=FUSE):
        yield (1 if ix.ndim == 1 else len(ix)), jnp.asarray(ix)


while done < STEPS:
    for n_fused, ixs in _epoch_steps(epoch):
        if _skip_steps:
            _skip_steps -= n_fused  # fast-forward a mid-epoch resume point
            continue
        rng, sub = jax.random.split(rng)
        run = step if n_fused == 1 else multi_step
        state, m = run(state, sub, ixs, dev_adjs, dev_nodes, dev_flags)
        if n_fused > 1:   # metrics stacked [K]; report the last step's
            m = jax.tree.map(lambda v: v[-1], m)
        done += n_fused
        if done % 200 == 0:
            # backpressure: bound the async dispatch queue through the
            # tunnel with a periodic scalar fetch.  (The sync alone did NOT
            # stop host-RSS growth when full batches were streamed per step
            # — staged transfer buffers outlive the dispatch on this
            # backend, hence the device-resident dataset above.)
            float(np.asarray(m["loss_adj"]))
        if done % 2000 == 0:
            print(f'step {done} loss_adj {float(m["loss_adj"]):.4f} '
                  f'loss_node {float(m["loss_node"]):.4f} '
                  f'({time.time()-t0:.0f}s)', flush=True)
        if done % EVAL_EVERY == 0:
            # eval BOTH EMA tracks at every checkpoint: the tunnel can hang
            # for hours mid-run, and intermediate 0.999 rows keep a killed
            # run reportable (the 0.9999 track lags inside its ~1/(1-beta)
            # warmup horizon on short runs)
            _eval(f"step{done}_ema0.999",
                  jax.device_get(ema_slice(state.ema_params, 0)), epoch + 2)
            _eval(f"step{done}_ema0.9999",
                  jax.device_get(ema_slice(state.ema_params, -1)), epoch + 3)
            save_checkpoint(RESUME, state, extra={"done": done})
            print(f'resume checkpoint at step {done}', flush=True)
        if done >= STEPS:
            break
    epoch += 1

print(f'trained {done} steps in {time.time()-t0:.0f}s', flush=True)
# persist the full trained state so downstream evals (e.g. the conditional-
# completion quality eval) can reuse these weights without retraining
from diffusesg_tpu.utils.checkpoint import save_checkpoint
save_checkpoint(os.path.join(OUT, 'ckpt_final'), state)
print(f'checkpoint saved to {os.path.join(OUT, "ckpt_final")}', flush=True)
_eval("final_ema0.999", jax.device_get(ema_slice(state.ema_params, 0)), epoch + 3)
_eval("final_ema0.9999", jax.device_get(ema_slice(state.ema_params, -1)), epoch + 4)
