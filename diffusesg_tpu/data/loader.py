"""Batch iteration over packed arrays, with per-host sharding.

Replaces torch DataLoader + DistributedSampler
(reference: DiffuseSG/utils/dataloader.py:24-33): data already lives in
dense numpy arrays, so batching is pure indexing; under multi-host SPMD each
host iterates its own shard (process_index-strided), the TPU-native analogue
of DistributedSampler.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Iterator

import jax
import numpy as np

from .dataset import SceneGraphData


@dataclasses.dataclass
class Batches:
    """Epoch iterator yielding (adjs, nodes, node_flags, image_ids) numpy slabs.

    ``repeat_to_batch`` mirrors the reference's repeat-to-fill trick for small
    datasets (reference: trainer_node_adj.py:56-65): when the dataset is
    smaller than one batch and divides it, graphs are tiled to fill the batch.
    """
    data: SceneGraphData
    batch_size: int
    shuffle: bool = True
    seed: int = 0
    drop_remainder: bool = False
    repeat_to_batch: bool = True
    process_index: int = 0
    process_count: int = 1
    # assemble batches in the C++ worker-thread engine (data/native);
    # identical output, gathered ahead of consumption off the GIL.  None =
    # auto: on when the host has a spare core to overlap into (measured: on
    # a 1-core host the worker thread only steals consumer cycles, ~0.95x;
    # with spare cores the gather is fully hidden).  Falls back to the
    # numpy gather when the library is unavailable (DSG_NATIVE_LOADER=0
    # disables).
    native: bool | None = None

    def __post_init__(self):
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _host_indices(self) -> np.ndarray:
        n = len(self.data)
        idx = np.arange(n)
        if self.shuffle:
            rs = np.random.RandomState(self.seed + self._epoch)
            rs.shuffle(idx)
        if self.process_count > 1:
            # wrap-pad so every host gets the SAME shard length, like the
            # reference DistributedSampler (dataloader.py:26-29): unequal
            # shards would make hosts run different numbers of collective
            # train steps -> distributed hang
            total = -(-n // self.process_count) * self.process_count
            if total > n:
                idx = np.concatenate([idx, idx[: total - n]])
        # per-host strided shard
        return idx[self.process_index::self.process_count]

    def __iter__(self) -> Iterator[tuple]:
        idx = self._host_indices()
        n = len(idx)
        bs = self.batch_size
        if n < bs and self.repeat_to_batch and n > 0 and bs % n == 0:
            idx = np.tile(idx, bs // n)
            n = len(idx)
        use_native = self.native
        if use_native is None:
            # AVAILABLE cpus, not host cores: a cgroup-limited container on a
            # 64-core host must not enable the measured-slower 1-cpu path
            try:
                avail = len(os.sched_getaffinity(0))
            except AttributeError:  # non-Linux
                avail = os.cpu_count() or 1
            use_native = avail > 1
        if use_native:
            from .native import get_lib, iter_batches_native
            if get_lib() is not None:
                # same permutation through the C++ gather engine: batches are
                # identical to the numpy path by construction, assembled by
                # GIL-free worker threads a few batches ahead.  Host-side
                # contiguous conversion is cached: for the normal numpy
                # arrays it is a no-op view, but doing it per epoch would
                # re-fetch device-backed arrays every time
                if not hasattr(self, "_native_arrays"):
                    self._native_arrays = [
                        np.ascontiguousarray(np.asarray(a))
                        for a in (self.data.adjs, self.data.nodes,
                                  self.data.node_flags, self.data.image_ids)]
                arrays = self._native_arrays
                if self.drop_remainder:
                    idx = idx[: (n // bs) * bs]
                yield from iter_batches_native(arrays, idx, bs)
                return
        for start in range(0, n, bs):
            sel = idx[start:start + bs]
            if self.drop_remainder and len(sel) < bs:
                break
            yield (self.data.adjs[sel], self.data.nodes[sel],
                   self.data.node_flags[sel], self.data.image_ids[sel])

    def __len__(self):
        n = len(self._host_indices())
        if n < self.batch_size and self.repeat_to_batch and n > 0 and self.batch_size % n == 0:
            return 1
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)


def epoch_index_batches(n: int, batch_size: int, epoch: int, seed: int = 0,
                        fuse: int = 1) -> Iterator[np.ndarray]:
    """Index-only epoch stream matching ``Batches`` batch composition.

    Yields int32 arrays of shape [batch_size] (fuse=1) or [fuse, batch_size]
    (fused dispatch chunks).  The permutation is ``Batches._host_indices``
    verbatim (RandomState(seed + epoch).shuffle) and small datasets are
    tiled to fill one batch exactly like ``Batches.repeat_to_batch``
    (reference repeat-to-fill trick: trainer_node_adj.py:56-65), so a
    device-resident gather ``arr[idx]`` sees the same batches the
    host-streaming path would.  Trailing partial batches are dropped (the
    quality scripts train on full batches only).
    """
    if n <= 0:
        raise ValueError("empty dataset")
    idx = np.arange(n)
    rs = np.random.RandomState(seed + epoch)
    rs.shuffle(idx)
    if n < batch_size:
        if batch_size % n == 0:
            idx = np.tile(idx, batch_size // n)
        else:  # fill one batch; mirrors repeat_to_batch intent for odd sizes
            idx = np.tile(idx, -(-batch_size // n))[:batch_size]
    nb = len(idx) // batch_size
    idx = idx[: nb * batch_size].reshape(nb, batch_size).astype(np.int32)
    if fuse <= 1:
        yield from idx
    else:
        for i in range(0, nb - nb % fuse, fuse):
            yield idx[i:i + fuse]


def prefetch_to_device(iterator, put_fn, size: int = 2) -> Iterator:
    """Keep ``size`` batches in flight ahead of consumption.

    ``put_fn`` maps a host batch to device buffers (e.g. a sharded
    ``jax.device_put``); since device_put is async on TPU, issuing it one
    batch early overlaps the host->device copy with the previous step's
    compute.  This is the TPU-native analogue of the reference DataLoader's
    worker prefetching (reference: DiffuseSG/utils/dataloader.py:29-32).
    """
    import collections
    import itertools

    buf = collections.deque()
    it = iter(iterator)

    def _fill(n):
        for item in itertools.islice(it, n):
            buf.append(put_fn(item))

    _fill(size)
    while buf:
        out = buf.popleft()
        _fill(1)
        yield out


def shard_for_process(data: SceneGraphData, process_index: int,
                      process_count: int) -> SceneGraphData:
    """Per-process strided shard of a packed dataset (the eval-side
    DistributedSampler analogue, reference: utils/dataloader.py:26-29).

    Every process gets EXACTLY ceil(n / process_count) rows — shorter shards
    are wrap-padded at the END (so a post-gather trim can drop the pads,
    see orchestrator.trim_process_padding) — because the multi-host result
    allgather requires identical local shapes on every host.
    """
    if process_count <= 1:
        return data
    per = -(-len(data) // process_count)
    sel = np.arange(process_index, len(data), process_count)
    if len(sel) < per:  # wrap-pad (reference DistributedSampler semantics)
        sel = np.concatenate([sel, sel[: per - len(sel)]])
    return SceneGraphData(
        adjs=data.adjs[sel], nodes=data.nodes[sel],
        node_flags=data.node_flags[sel], image_ids=data.image_ids[sel],
        pkl_data=[data.pkl_data[i] for i in sel] if data.pkl_data else [],
        num_node_type=data.num_node_type, num_edge_type=data.num_edge_type)


def split_eval_set(data: SceneGraphData, total_samples: int, seed: int = 0) -> SceneGraphData:
    """Subset / repeat the test set to hit ``total_samples``
    (reference: runner/sampler/sampler_utils.py:8-41)."""
    n = len(data)
    if total_samples < n:
        rs = np.random.RandomState(seed)
        sel = rs.permutation(n)[:total_samples]
    elif total_samples == n:
        sel = np.arange(n)
    else:
        reps = -(-total_samples // n)
        sel = np.tile(np.arange(n), reps)[:total_samples]
    return SceneGraphData(
        adjs=data.adjs[sel], nodes=data.nodes[sel], node_flags=data.node_flags[sel],
        image_ids=data.image_ids[sel],
        pkl_data=[data.pkl_data[i % len(data.pkl_data)] for i in sel] if data.pkl_data else [],
        num_node_type=data.num_node_type, num_edge_type=data.num_edge_type)
