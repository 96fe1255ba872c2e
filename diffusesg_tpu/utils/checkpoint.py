"""Orbax checkpointing of the full training state.

Replaces the reference's torch.save checkpoints
(reference: DiffuseSG/runner/trainer/trainer_utils.py:132-185): the reference
stores model + per-beta EMA weights but NOT optimizer/scheduler state (its
--resume restores weights only, learning_utils.py:95-98).  Here the complete
{params, ema_params (stacked K), opt_state, step, ema_betas} is saved, fixing
that resume gap, plus the config for eval-side reconstruction
(reference: utils/arg_parser.py:146-153 re-reads config.yaml next to the ckpt).

Layout on disk:
  <run_dir>/models_ckpt/<step>/...   rolling per-interval checkpoints
  <run_dir>/models/best/...          best-by-test-loss checkpoint
  <run_dir>/config.yaml              resolved config
"""
from __future__ import annotations

import os
from typing import Any

from typing import TYPE_CHECKING

import jax
import numpy as np
import orbax.checkpoint as ocp

if TYPE_CHECKING:  # avoid a utils <-> train circular import at runtime
    from ..train.train_state import TrainState


def _to_host(tree: Any) -> Any:
    # multi-host sharded leaves (ZeRO-1 moments/EMAs) gather COLLECTIVELY —
    # every process must reach this point
    from ..parallel.mesh import fetch_to_host
    return fetch_to_host(tree)


# one persistent checkpointer so async saves can finish in the background
# (orbax's StandardCheckpointer IS an AsyncCheckpointer; a throwaway
# instance forces a synchronous wait)
_CKPTR: "ocp.StandardCheckpointer | None" = None


def _checkpointer() -> "ocp.StandardCheckpointer":
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_async_saves() -> None:
    """Block until every async save_checkpoint has committed to disk."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(path: str, state: "TrainState", extra: dict | None = None,
                    asynchronous: bool = False) -> None:
    """Save a TrainState (+ optional metadata dict) to ``path``.

    Multi-host: call from EVERY process — both the sharded-leaf gather and
    orbax's internal save barriers are collectives; orbax writes the
    (replicated numpy) payload from the primary host only, giving the
    reference's rank-0 torch.save semantics (trainer_utils.py) without a
    hand-rolled gate.

    ``asynchronous=True`` returns as soon as the (already host-fetched)
    payload is staged: the disk write overlaps the next training epoch —
    orbax renames the directory into place atomically on commit, so readers
    never observe a partial checkpoint.  At most one save is in flight
    (a new save first drains the previous one); call
    ``wait_for_async_saves()`` before relying on the files.
    """
    path = os.path.abspath(path)
    payload = {
        "step": _to_host(state.step),
        "params": _to_host(state.params),
        "opt_state": _to_host(state.opt_state),
        "ema_params": _to_host(state.ema_params),
        "ema_betas": _to_host(state.ema_betas),
    }
    if extra:
        payload["extra"] = extra
    ckptr = _checkpointer()
    # orbax's AsyncCheckpointer.save drains any previous in-flight save
    # itself, so at most one write is in flight by its own contract
    ckptr.save(path, payload, force=True)
    if not asynchronous:
        ckptr.wait_until_finished()


def restore_checkpoint(path: str, template_state: "TrainState | None" = None) -> dict:
    """Restore a checkpoint; with a template the result is dtype/shape-checked."""
    wait_for_async_saves()  # the path may still be committing
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template_state is not None:
        template = {
            "step": _to_host(template_state.step),
            "params": _to_host(template_state.params),
            "opt_state": _to_host(template_state.opt_state),
            "ema_params": _to_host(template_state.ema_params),
            "ema_betas": _to_host(template_state.ema_betas),
        }
        try:
            return ckptr.restore(path, template)
        except BaseException:
            # The ckpt usually carries an 'extra' metadata dict the template
            # doesn't know about; a schema-free restore would return
            # opt_state as raw nested dicts (losing the optax NamedTuple
            # structure the optimizer needs).  Restore schema-free once to
            # learn 'extra''s exact structure, then re-restore structured.
            raw = ckptr.restore(path)
            if "extra" in raw:
                template["extra"] = raw["extra"]
                try:
                    return ckptr.restore(path, template)
                except BaseException:
                    pass
            # Still incompatible: most likely a checkpoint from an older
            # package version with different param names.  Surface that
            # clearly instead of letting model.apply/optimizer.update die
            # on a cryptic tree-structure error later.
            if (jax.tree_util.tree_structure(raw.get("params", {}))
                    != jax.tree_util.tree_structure(template["params"])):
                raise ValueError(
                    f"checkpoint at {path} does not match the current model "
                    "definition (param tree structure differs — saved by an "
                    "older diffusesg-tpu version?); re-save it with this "
                    "version or use matching code to load it")
            return raw
    return ckptr.restore(path)


def state_from_payload(payload: dict):
    import jax.numpy as jnp
    from ..train.train_state import TrainState
    return TrainState(step=jnp.asarray(payload["step"]),
                      params=payload["params"],
                      opt_state=payload["opt_state"],
                      ema_params=payload["ema_params"],
                      ema_betas=jnp.asarray(payload["ema_betas"]))


def list_checkpoints(ckpt_dir: str) -> list[str]:
    """Sorted step-named checkpoint directories under ``ckpt_dir``
    (eval-side search, reference: arg_parser.py:144-184).

    In-progress orbax staging dirs (``*.orbax-checkpoint-tmp*``) are
    excluded: an async save (or one cut short by a hard kill) stages there
    — and the staging dir carries _CHECKPOINT_METADATA from the first
    write, so it would otherwise be picked up as a (corrupt) checkpoint
    by resume/eval/serve discovery.
    """
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        full = os.path.join(ckpt_dir, name)
        if os.path.isdir(full) and "orbax-checkpoint-tmp" not in name:
            out.append(full)
    def _key(p):
        base = os.path.basename(p)
        return (0, int(base)) if base.isdigit() else (1, base)
    return sorted(out, key=_key)


def is_finalized_checkpoint(path: str) -> bool:
    """True iff ``path`` is a committed orbax checkpoint directory (not a
    run dir, notes dir, or aborted copy)."""
    return os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """The latest finalized checkpoint in ``ckpt_dir``, or None.  What
    serve/resume should load; select_checkpoints' num_ckpts semantics are
    evenly-spaced eval sweeps, not 'latest'.

    Selection rule: the HIGHEST numeric epoch wins — directory mtimes do
    not survive cp -r / object-store restores, so they cannot order epochs.
    A non-numeric checkpoint (e.g. the SIGTERM ``preempt`` save) wins only
    when its mtime is strictly newer than the best epoch's (it is written
    mid-training, after the last rolling save, so on an untouched run dir
    this picks it up; after an mtime-flattening copy the tie falls back to
    the highest epoch).  Only committed checkpoints are considered.
    """
    ckpts = [c for c in list_checkpoints(ckpt_dir) if is_finalized_checkpoint(c)]
    if not ckpts:
        return None
    numeric = [c for c in ckpts if os.path.basename(c).isdigit()]
    other = [c for c in ckpts if not os.path.basename(c).isdigit()]
    best_num = (max(numeric, key=lambda p: int(os.path.basename(p)))
                if numeric else None)
    best_other = max(other, key=os.path.getmtime) if other else None
    if best_num is None or (best_other is not None and
                            os.path.getmtime(best_other)
                            > os.path.getmtime(best_num)):
        return best_other
    return best_num


def select_checkpoints(ckpt_dir: str, min_epoch: int | None = None,
                       max_epoch: int | None = None,
                       specify_epoch: int | list[int] | None = None,
                       num_ckpts: int | None = None) -> list[str]:
    """Epoch-range / explicit-epoch / count-limited checkpoint selection
    (reference: arg_parser.py:144-184; --specify_epoch takes several epochs)."""
    ckpts = list_checkpoints(ckpt_dir)
    def _epoch(p):
        base = os.path.basename(p)
        return int(base) if base.isdigit() else -1
    if specify_epoch is not None:
        wanted = ([specify_epoch] if isinstance(specify_epoch, int)
                  else list(specify_epoch))
        return [p for p in ckpts if _epoch(p) in wanted]
    if min_epoch is not None:
        ckpts = [p for p in ckpts if _epoch(p) >= min_epoch]
    if max_epoch is not None:
        ckpts = [p for p in ckpts if _epoch(p) <= max_epoch]
    if num_ckpts is not None and len(ckpts) > num_ckpts:
        sel = np.linspace(0, len(ckpts) - 1, num_ckpts).astype(int)
        ckpts = [ckpts[i] for i in sel]
    return ckpts
