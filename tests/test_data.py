"""Tests for the data pipeline: synthetic schema, tensorization, batching."""
import jax
import numpy as np
import pytest

from diffusesg_tpu.config import load_config
from diffusesg_tpu.data import (
    Batches, build_tensors, load_data, split_eval_set,
    synthetic_scene_graphs, compute_stats_dicts,
)


def test_synthetic_schema():
    data = synthetic_scene_graphs(10, 8, 20, 5, seed=0)
    assert len(data) == 10
    for item in data:
        n = len(item["node_labels"])
        assert 2 <= n <= 8
        assert item["edge_map"].shape == (n, n)
        assert (np.diag(item["edge_map"]) == 0).all()
        assert item["edge_map"].max() <= 4
        bb = item["node_bboxes_xcyc"]
        assert bb.shape == (n, 4)
        assert (0 <= bb).all() and (bb <= 1).all()


def test_stats_dicts():
    data = synthetic_scene_graphs(20, 8, 20, 5, seed=0)
    stats = compute_stats_dicts(data, num_node_type=20)
    trip = stats["triplet_dict_sorted"]
    assert len(trip) > 0
    freqs = list(trip.values())
    assert freqs == sorted(freqs, reverse=True)
    assert abs(sum(freqs) - 1.0) < 1e-9  # normalized frequencies
    # weight dicts cover every class id (needed by F1 weight arrays)
    assert sorted(stats["node_dict_sorted"].keys()) == list(range(20))
    assert sorted(stats["node_bbox_area_avg_dict_sorted"].keys()) == list(range(20))


def test_synthetic_splits_share_population():
    """Regression for the round-3 quality diagnosis: train/test must be iid
    draws from ONE type distribution (shared pop_seed), like real dataset
    splits — per-split populations put an irreducible floor under the
    node-type metrics (BASELINE.md round-3 entry)."""
    from diffusesg_tpu.data.synthetic import synthetic_bundle_dicts

    def type_marginal(data, k):
        h = np.zeros(k)
        for item in data:
            np.add.at(h, item["node_labels"], 1)
        return h / h.sum()

    train, test, *_ = synthetic_bundle_dicts("visual_genome", 16, seed=0,
                                             num_train=512, num_test=256)
    k = 150
    tv_same = 0.5 * np.abs(type_marginal(train, k) - type_marginal(test, k)).sum()

    # the old (buggy) behavior: per-split populations
    other = synthetic_scene_graphs(256, 16, k, 51, seed=1, pop_seed=1)
    tv_diff = 0.5 * np.abs(type_marginal(train, k) - type_marginal(other, k)).sum()

    # same population: only sampling noise separates the splits; different
    # dirichlet draws with alpha=0.3 are far apart in TV
    assert tv_same < 0.25, tv_same
    assert tv_diff > 2 * tv_same, (tv_same, tv_diff)

    # pop_seed decoupling: the popularity stream must NOT replay the graph
    # stream's randomness (pop_seed == seed is the train-split default)
    a = synthetic_scene_graphs(8, 8, 20, 5, seed=3, pop_seed=3)
    b = synthetic_scene_graphs(8, 8, 20, 5, seed=4, pop_seed=3)
    assert any((x["node_labels"].shape != y["node_labels"].shape
                or (x["node_labels"] != y["node_labels"]).any())
               for x, y in zip(a, b)), "graph draws must differ across seeds"


def test_synthetic_per_graph_alpha_correlates_halves():
    """per_graph_alpha turns on WITHIN-graph clustering (types drawn from a
    per-graph Dirichlet) so the two halves of a graph become mutually
    informative — the property the conditional-completion quality eval
    needs (scripts/eval_inpaint_quality_tpu.py).  Default (None) must keep
    the streams bit-identical to the uncorrelated generator."""
    base = synthetic_scene_graphs(64, 16, 30, 5, seed=5, pop_seed=5)
    same = synthetic_scene_graphs(64, 16, 30, 5, seed=5, pop_seed=5,
                                  per_graph_alpha=None)
    for x, y in zip(base, same):
        np.testing.assert_array_equal(x["node_labels"], y["node_labels"])
        np.testing.assert_array_equal(x["edge_map"], y["edge_map"])
        np.testing.assert_array_equal(x["node_bboxes_xcyc"], y["node_bboxes_xcyc"])

    corr = synthetic_scene_graphs(512, 16, 30, 5, seed=5, pop_seed=5,
                                  per_graph_alpha=2.0)

    def half_hist_dist(data, k=30, paired=True):
        """Mean L1 between first-half and second-half type histograms —
        paired (same graph) vs shuffled (across graphs)."""
        hists = []
        for item in data:
            lab = item["node_labels"]
            n = len(lab)
            if n < 4:
                continue
            h1 = np.bincount(lab[: n // 2], minlength=k) / (n // 2)
            h2 = np.bincount(lab[n // 2:], minlength=k) / (n - n // 2)
            hists.append((h1, h2))
        firsts = np.array([h[0] for h in hists])
        seconds = np.array([h[1] for h in hists])
        if not paired:
            seconds = np.roll(seconds, 1, axis=0)  # mismatched graphs
        return np.abs(firsts - seconds).sum(-1).mean() / 2

    d_paired = half_hist_dist(corr, paired=True)
    d_shuf = half_hist_dist(corr, paired=False)
    # with clustering, a graph's own second half is much closer to its first
    # half than another graph's is
    assert d_paired < 0.8 * d_shuf, (d_paired, d_shuf)
    # uncorrelated generator: paired ~ shuffled (both draw from the global pop)
    d_paired0 = half_hist_dist(base, paired=True)
    d_shuf0 = half_hist_dist(base, paired=False)
    assert d_paired0 > 0.9 * d_shuf0, (d_paired0, d_shuf0)


def test_build_tensors_ddpm_bbox():
    data = synthetic_scene_graphs(12, 8, 20, 5, seed=1)
    ds = build_tensors(data, max_node_num=8, num_node_attr_type=20,
                       num_edge_attr_type=5, node_encoding="ddpm",
                       edge_encoding="ddpm")
    assert ds.adjs.shape == (12, 8, 8)
    assert ds.nodes.shape == (12, 8, 5)  # ddpm scalar + 4 bbox
    assert ds.node_flags.shape == (12, 8)
    # adj entries are ddpm-coded in [-1, 1]
    assert ds.adjs.min() >= -1 and ds.adjs.max() <= 1
    # padded entries are zero
    f = ds.node_flags
    pair = f[:, :, None] & f[:, None, :]
    assert (ds.adjs[~pair] == 0).all()
    assert (ds.nodes[~f] == 0).all()
    # bbox channels are in [-1, 1]
    assert ds.nodes[..., 1:].min() >= -1 and ds.nodes[..., 1:].max() <= 1


def test_build_tensors_bits_encoding():
    data = synthetic_scene_graphs(6, 8, 20, 5, seed=2)
    ds = build_tensors(data, max_node_num=8, num_node_attr_type=20,
                       num_edge_attr_type=5, node_encoding="bits",
                       edge_encoding="bits")
    assert ds.nodes.shape == (6, 8, 5 + 4)   # ceil(log2 20)=5 bits + bbox
    assert ds.adjs.shape == (6, 8, 8, 3)     # ceil(log2 5)=3 bits, channels-last


def test_build_tensors_binary_edge():
    data = synthetic_scene_graphs(6, 8, 20, 5, seed=3)
    ds = build_tensors(data, max_node_num=8, num_node_attr_type=20,
                       num_edge_attr_type=5, node_encoding="ddpm",
                       edge_encoding="ddpm", flag_binary_edge=True)
    assert set(np.unique(ds.adjs)) <= {-1.0, 0.0, 1.0}


def test_build_tensors_node_only():
    data = synthetic_scene_graphs(6, 4, 20, 5, seed=4)  # <= 16 nodes fit 4x4 grid
    ds = build_tensors(data, max_node_num=4, num_node_attr_type=20,
                       num_edge_attr_type=5, node_encoding="ddpm",
                       edge_encoding="ddpm", flag_node_only=True)
    assert ds.node_flags.shape == (6, 4, 4)  # grid flags
    assert ds.adjs.shape == (6, 4, 4, 5)     # 1 ddpm + 4 bbox channels


def test_load_data_synthetic_fallback(tmp_path):
    cfg = load_config("configs/vg_small_test.yaml")
    bundle = load_data(cfg, data_root=str(tmp_path))
    assert len(bundle.train) == 32  # subset
    assert bundle.test is bundle.train  # subset aliases test to train
    assert len(bundle.train_triplet_dict) > 0
    assert len(bundle.idx_to_word["ind_to_classes"]) == 150


def test_batches_iteration_and_sharding():
    data = synthetic_scene_graphs(13, 6, 10, 4, seed=5)
    ds = build_tensors(data, 6, 10, 4, "ddpm", "ddpm")
    batches = Batches(ds, batch_size=4, shuffle=True, seed=0)
    seen = 0
    for adjs, nodes, flags, ids in batches:
        assert adjs.shape[0] <= 4
        seen += adjs.shape[0]
    assert seen == 13
    # two-host sharding covers the whole dataset with equal shard lengths
    # (ceil(13/2)=7 each; ONE wrap-padded duplicate, DistributedSampler-style,
    # so both hosts run the same number of collective steps)
    b0 = Batches(ds, 4, shuffle=False, process_index=0, process_count=2)
    b1 = Batches(ds, 4, shuffle=False, process_index=1, process_count=2)
    ids0 = np.concatenate([t[3] for t in b0])
    ids1 = np.concatenate([t[3] for t in b1])
    assert len(ids0) == len(ids1) == 7
    assert set(ids0) | set(ids1) == set(ds.image_ids.tolist())
    assert len(set(ids0) & set(ids1)) == 1  # exactly the one wrap pad


def test_batches_repeat_to_fill():
    data = synthetic_scene_graphs(2, 6, 10, 4, seed=6)
    ds = build_tensors(data, 6, 10, 4, "ddpm", "ddpm")
    batches = Batches(ds, batch_size=8, shuffle=False)
    out = list(batches)
    assert len(out) == 1
    assert out[0][0].shape[0] == 8  # tiled 4x


def test_prefetch_to_device_preserves_order_and_values():
    from diffusesg_tpu.data import prefetch_to_device

    data = synthetic_scene_graphs(13, 6, 10, 4, seed=5)
    ds = build_tensors(data, 6, 10, 4, "ddpm", "ddpm")
    batches = Batches(ds, batch_size=4, shuffle=True, seed=3)
    direct = list(batches)
    put_calls = []

    def put(item):
        put_calls.append(len(put_calls))
        return jax.device_put(item)

    fetched = list(prefetch_to_device(batches, put, size=2))
    assert len(fetched) == len(direct)
    for d, f in zip(direct, fetched):
        for a, b in zip(d, f):
            np.testing.assert_array_equal(a, np.asarray(b))
    assert len(put_calls) == len(direct)


def test_split_eval_set():
    data = synthetic_scene_graphs(10, 6, 10, 4, seed=7)
    ds = build_tensors(data, 6, 10, 4, "ddpm", "ddpm")
    small = split_eval_set(ds, 4)
    assert len(small) == 4
    big = split_eval_set(ds, 25)
    assert len(big) == 25


def test_pickle_roundtrip_real_loader_path(tmp_path):
    """Materialized reference-schema pickles load through the REAL file path
    (not the synthetic fallback) and match the in-memory synthetic bundle —
    proves on-disk schema compatibility (reference: dataloader.py:55-61)."""
    import sys
    sys.path.insert(0, "scripts")
    from make_dataset_pickles import write_pickles

    from diffusesg_tpu.config import load_config
    from diffusesg_tpu.data import load_data

    cfg = load_config("configs/vg_small_test.yaml")
    with cfg.unlocked():
        cfg.dataset.max_node_num = 12
        cfg.dataset.subset = None
    written = write_pickles(str(tmp_path), "visual_genome", max_node_num=12,
                            num_train=24, num_test=12, seed=3)
    assert len(written) == 5
    bundle = load_data(cfg, data_root=str(tmp_path))

    assert len(bundle.train) == 24 and len(bundle.test) == 12
    assert bundle.idx_to_word["ind_to_classes"][0] == "obj_0"
    # tensors took the real pickle path: shapes/encodings/flags consistent
    assert bundle.train.adjs.shape == (24, 12, 12)
    assert bundle.train.nodes.shape == (24, 12, 5)  # ddpm type + 4 bbox chans
    assert bundle.train.node_flags.dtype == bool
    assert bundle.train.pkl_data and "node_labels" in bundle.train.pkl_data[0]
    # encoded ranges: ddpm types and bboxes live in [-1, 1] on valid slots
    f = bundle.train.node_flags
    assert np.abs(bundle.train.nodes[f]).max() <= 1.0 + 1e-6
    assert np.abs(bundle.train.adjs[f[:, :, None] & f[:, None, :]]).max() <= 1.0 + 1e-6


def test_batches_equal_shards_across_processes():
    """Wrap-padding gives every process the SAME number of batches even when
    the dataset doesn't divide (unequal counts would desync the hosts'
    collective train steps)."""
    from diffusesg_tpu.data.loader import Batches
    from diffusesg_tpu.data.synthetic import synthetic_scene_graphs
    from diffusesg_tpu.data.dataset import build_tensors

    data = build_tensors(synthetic_scene_graphs(65, 8, 10, 5, seed=0),
                         max_node_num=8, num_node_attr_type=10,
                         num_edge_attr_type=5, node_encoding="ddpm",
                         edge_encoding="ddpm")
    counts = []
    for pid in range(2):
        b = Batches(data, 32, shuffle=True, seed=1,
                    process_index=pid, process_count=2)
        batches = list(b)
        counts.append(len(batches))
        assert sum(len(x[0]) for x in batches) == 33  # ceil(65/2)
    assert counts[0] == counts[1]


def test_shard_for_process_equal_lengths():
    from diffusesg_tpu.data.loader import shard_for_process
    from diffusesg_tpu.data.synthetic import synthetic_scene_graphs
    from diffusesg_tpu.data.dataset import build_tensors

    data = build_tensors(synthetic_scene_graphs(13, 8, 10, 5, seed=0),
                         max_node_num=8, num_node_attr_type=10,
                         num_edge_attr_type=5, node_encoding="ddpm",
                         edge_encoding="ddpm")
    shards = [shard_for_process(data, p, 4) for p in range(4)]
    assert all(len(s) == 4 for s in shards)  # ceil(13/4), wrap-padded
    # the pads are WRAPS of the shard's own rows (appended at the end)
    got = np.concatenate([s.image_ids[: (13 // 4 + (1 if p < 13 % 4 else 0))]
                          for p, s in enumerate(shards)])
    assert sorted(got.tolist()) == sorted(data.image_ids.tolist())


def test_native_batcher_matches_numpy_path():
    """The C++ batch-assembly engine (data/native) must yield bit-identical
    batches to the numpy gather for the same seed/epoch/shard settings —
    including shuffling, per-host sharding, and a ragged final batch."""
    import pytest

    from diffusesg_tpu.data.native import get_lib
    if get_lib() is None:
        pytest.skip("native batcher unavailable (no g++)")
    from diffusesg_tpu.data.synthetic import synthetic_scene_graphs
    from diffusesg_tpu.data.dataset import build_tensors

    data = build_tensors(synthetic_scene_graphs(45, 9, 20, 5, seed=7),
                         max_node_num=9, num_node_attr_type=20,
                         num_edge_attr_type=5, node_encoding="ddpm",
                         edge_encoding="ddpm")
    for kw in [dict(), dict(process_index=1, process_count=2),
               dict(drop_remainder=True), dict(shuffle=False)]:
        nat = Batches(data, 8, seed=11, native=True, **kw)
        ref = Batches(data, 8, seed=11, native=False, **kw)
        for epoch in (0, 1):
            nat.set_epoch(epoch)
            ref.set_epoch(epoch)
            got, exp = list(nat), list(ref)
            assert len(got) == len(exp) and len(got) == len(nat)
            for gb, eb in zip(got, exp):
                for g, e in zip(gb, eb):
                    assert g.dtype == e.dtype
                    np.testing.assert_array_equal(np.asarray(g), np.asarray(e))


def test_epoch_index_batches_matches_batches_stream():
    """The device-resident gather in scripts/train_quality_tpu.py consumes
    loader.epoch_index_batches; its batch composition must equal what
    Batches(shuffle=True, seed=0) would stream (ADVICE r4: the claim was
    previously asserted only in a comment)."""
    from diffusesg_tpu.data.loader import epoch_index_batches

    data = synthetic_scene_graphs(40, 6, 10, 4, seed=9)
    ds = build_tensors(data, 6, 10, 4, "ddpm", "ddpm")
    batches = Batches(ds, batch_size=8, shuffle=True, seed=0,
                      drop_remainder=True, native=False)
    for epoch in (0, 1, 3):
        batches.set_epoch(epoch)
        streamed = [t[3] for t in batches]  # image_ids == graph index
        indexed = [ds.image_ids[ix] for ix in
                   epoch_index_batches(len(ds), 8, epoch, seed=0)]
        assert len(streamed) == len(indexed)
        for s, i in zip(streamed, indexed):
            np.testing.assert_array_equal(s, i)
    # fused chunks are the same rows stacked [FUSE, B]
    flat = list(epoch_index_batches(40, 8, 2, seed=0))
    fused = list(epoch_index_batches(40, 8, 2, seed=0, fuse=2))
    np.testing.assert_array_equal(np.concatenate([f.reshape(-1) for f in fused]),
                                  np.concatenate([f for f in flat[:4]]).reshape(-1))
    # tiny dataset tiles to one full batch (repeat_to_batch semantics)
    (only,) = epoch_index_batches(4, 8, 0, seed=0)
    assert only.shape == (8,) and set(only.tolist()) == {0, 1, 2, 3}


def test_synth_cache_roundtrip_equals_fresh(tmp_path, monkeypatch):
    """DSG_SYNTH_CACHE_DIR round-trip: a cached load must equal a fresh
    synthetic_bundle_dicts call bit-for-bit (ADVICE r4 medium)."""
    from diffusesg_tpu.data.synthetic import synthetic_bundle_dicts

    cfg = load_config("configs/vg_small_test.yaml")
    monkeypatch.setenv("DSG_SYNTH_CACHE_DIR", str(tmp_path / "cache"))
    b1 = load_data(cfg, data_root=str(tmp_path))   # generates + writes cache
    assert len(list((tmp_path / "cache").glob("synth_*.pkl"))) == 1
    b2 = load_data(cfg, data_root=str(tmp_path))   # loads from cache
    np.testing.assert_array_equal(b1.train.adjs, b2.train.adjs)
    np.testing.assert_array_equal(b1.train.nodes, b2.train.nodes)
    np.testing.assert_array_equal(b1.train.node_flags, b2.train.node_flags)
    assert b1.train_triplet_dict == b2.train_triplet_dict
    # and the cached data equals the direct generator call
    fresh = synthetic_bundle_dicts(cfg.dataset.name, cfg.dataset.max_node_num,
                                   seed=cfg.seed)
    for a, b in zip(fresh[0], b2.train.pkl_data):
        np.testing.assert_array_equal(a["node_labels"], b["node_labels"])
        np.testing.assert_array_equal(a["edge_map"], b["edge_map"])
    # a different population size must MISS this cache entry (key covers it)
    with cfg.unlocked():
        cfg.dataset.synthetic_num_train = 64
        cfg.dataset.synthetic_num_test = 16
        cfg.dataset.subset = None
    b3 = load_data(cfg, data_root=str(tmp_path))
    assert len(list((tmp_path / "cache").glob("synth_*.pkl"))) == 2
    assert len(b3.train) == 64 and len(b3.test) == 16


def test_heldout_population_knobs():
    """Generalization-regime plumbing: subset=None + synthetic_num_train/test
    gives a genuinely held-out test split from the same population."""
    cfg = load_config("configs/vg_small_test.yaml")
    with cfg.unlocked():
        cfg.dataset.subset = None
        cfg.dataset.synthetic_num_train = 96
        cfg.dataset.synthetic_num_test = 32
    bundle = load_data(cfg, data_root="/nonexistent")
    assert len(bundle.train) == 96 and len(bundle.test) == 32
    assert bundle.test is not bundle.train
    # disjoint draws: no train graph equals any test graph
    train_keys = {tuple(g["node_labels"].tolist()) + (g["edge_map"].sum(),)
                  for g in bundle.train.pkl_data}
    test_keys = {tuple(g["node_labels"].tolist()) + (g["edge_map"].sum(),)
                 for g in bundle.test.pkl_data}
    assert not (train_keys & test_keys)


def test_pop_concentration_knobs_concentrate_triplets():
    """Smaller node/edge Dirichlet alphas -> fewer effective triplets (the
    reusable-triplet regime that gives triplet TV a reachable iid floor)."""
    from diffusesg_tpu.data.synthetic import compute_stats_dicts

    wide = synthetic_scene_graphs(128, 16, 150, 51, seed=0, pop_seed=0)
    narrow = synthetic_scene_graphs(128, 16, 150, 51, seed=0, pop_seed=0,
                                    node_alpha=0.02, edge_alpha=0.05)

    def effective_triplets(data):
        td = compute_stats_dicts(data)["triplet_dict_sorted"]
        vals = np.asarray(list(td.values()))
        csum = np.cumsum(np.sort(vals)[::-1])
        return int(np.searchsorted(csum, 0.95) + 1)  # triplets carrying 95%

    assert effective_triplets(narrow) < effective_triplets(wide) / 3
    # defaults unchanged: explicit 0.3/0.5 reproduces the historical stream
    base = synthetic_scene_graphs(16, 8, 20, 5, seed=3, pop_seed=3)
    same = synthetic_scene_graphs(16, 8, 20, 5, seed=3, pop_seed=3,
                                  node_alpha=0.3, edge_alpha=0.5)
    for a, b in zip(base, same):
        np.testing.assert_array_equal(a["edge_map"], b["edge_map"])
