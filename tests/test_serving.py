"""Serving subsystem: AOT export round-trip + micro-batching server.

The reference has no serving path (inference = offline eval runs,
DiffuseSG/eval.py); these tests cover the TPU-native addition:
jax.export artifact round-trips bit-exactly and the batcher/HTTP layer
packs, splits, and seeds requests correctly.
"""
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from diffusesg_tpu.config import load_config


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = load_config("configs/vg_small_test.yaml")
    with cfg.unlocked():
        cfg.dataset.max_node_num = 8
        cfg.mcmc.num_steps = 4
        cfg.test.batch_size = 4
    return cfg


@pytest.fixture(scope="module")
def serving_fn(tiny_cfg):
    from diffusesg_tpu.models import build_model
    from diffusesg_tpu.models.factory import init_params
    from diffusesg_tpu.sampling import get_mc_sampler
    from diffusesg_tpu.serving.export import make_serving_fn

    model = build_model(tiny_cfg)
    params = init_params(model, tiny_cfg, jax.random.PRNGKey(0))
    sampler = get_mc_sampler(tiny_cfg)
    return make_serving_fn(model, params, sampler, tiny_cfg), model, params, sampler


def _flags(batch, n, counts):
    f = np.zeros((batch, n), bool)
    for i, c in enumerate(counts):
        f[i, :c] = True
    return f


def test_serving_fn_shapes_and_determinism(tiny_cfg, serving_fn):
    fn = jax.jit(serving_fn[0])
    n = tiny_cfg.dataset.max_node_num
    flags = _flags(4, n, [8, 5, 3, 1])
    adj, node, bbox = fn(np.int32(7), flags)
    assert adj.shape == (4, n, n) and adj.dtype == np.int32
    assert node.shape == (4, n) and node.dtype == np.int32
    assert bbox.shape == (4, n, 4)
    assert float(np.min(np.asarray(bbox))) >= 0.0
    assert float(np.max(np.asarray(bbox))) <= 1.0
    # padded slots decode to zeros; valid slots have labels in range
    assert np.all(np.asarray(node)[3, 1:] == 0)
    assert int(np.asarray(node).max()) < 150
    adj2, node2, _ = fn(np.int32(7), flags)
    np.testing.assert_array_equal(np.asarray(adj), np.asarray(adj2))
    np.testing.assert_array_equal(np.asarray(node), np.asarray(node2))
    adj3, _, _ = fn(np.int32(8), flags)
    assert not np.array_equal(np.asarray(adj), np.asarray(adj3))


def test_export_artifact_roundtrip(tiny_cfg, serving_fn, tmp_path):
    from diffusesg_tpu.serving.export import (export_sampler, load_artifact,
                                              save_artifact)
    fn, model, params, sampler = serving_fn
    exported = export_sampler(model, params, sampler, tiny_cfg, batch_size=2)
    art = str(tmp_path / "artifact")
    save_artifact(art, exported, tiny_cfg, batch_size=2)
    loaded, meta = load_artifact(art)
    assert meta["batch_size"] == 2
    assert meta["max_node_num"] == tiny_cfg.dataset.max_node_num
    assert meta["num_steps"] == 4

    n = tiny_cfg.dataset.max_node_num
    flags = _flags(2, n, [8, 4])
    ref = jax.jit(fn)(np.int32(3), flags)
    got = loaded(np.int32(3), flags)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_compiled_executable_roundtrip(tiny_cfg, serving_fn, tmp_path):
    """save_compiled/load_compiled (the BENCH_ARTIFACT fast path): the
    deserialized AOT executable reproduces the live-jitted serving fn
    bit-exactly and skips tracing/compilation at load."""
    from diffusesg_tpu.serving.export import load_compiled, save_compiled

    fn, model, params, sampler = serving_fn
    n = tiny_cfg.dataset.max_node_num
    flags = _flags(2, n, [8, 4])
    compiled = jax.jit(fn).lower(np.int32(0), flags).compile()
    art = str(tmp_path / "aot")
    save_compiled(art, compiled, {"k": 1})
    loaded, meta = load_compiled(art)
    assert meta == {"k": 1}
    ref = jax.jit(fn)(np.int32(3), flags)
    try:
        got = [np.asarray(g) for g in loaded(np.int32(3), flags)]
    except Exception as e:  # noqa: BLE001
        # this image's XLA:CPU AOT loader cannot reliably re-execute
        # deserialized executables (machine-feature mismatch warnings +
        # "Buffer Definition Event ... not found"); the path is exercised
        # for real on TPU by `BENCH_ARTIFACT=<dir> python bench.py`.
        # Skip ONLY on that known loader signature — anything else (wrong
        # in_tree/out_tree, bad device rebinding, ...) is a real regression
        # in load_compiled and must fail the test.
        msg = str(e)
        if ("Buffer Definition Event" in msg
                or "machine features" in msg.lower()):
            pytest.skip(f"XLA:CPU AOT loader unsupported here: {e}")
        raise
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), g)


def test_node_only_configs_are_rejected(tiny_cfg):
    from diffusesg_tpu.serving.export import make_serving_fn
    cfg = load_config("configs/vg_small_test.yaml")
    with cfg.unlocked():
        cfg.train.node_only = True
    with pytest.raises(NotImplementedError):
        make_serving_fn(None, None, None, cfg)


def test_serve_cli_export_and_artifact_load(tiny_cfg, serving_fn, tmp_path):
    """CLI surface: checkpoint -> --export_to artifact -> load_artifact."""
    import yaml
    from diffusesg_tpu.cli.serve import main as serve_main
    from diffusesg_tpu.serving.export import load_artifact
    from diffusesg_tpu.train.train_state import create_train_state, make_optimizer
    from diffusesg_tpu.utils.checkpoint import save_checkpoint

    _, model, params, sampler = serving_fn
    opt = make_optimizer(1e-4, 1.0, 10)
    state = create_train_state(params, [0.9, 0.999], opt)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, extra={"epoch": 0})

    cfg_file = str(tmp_path / "config.yaml")
    with open("configs/vg_small_test.yaml") as f:
        raw = yaml.safe_load(f)
    raw["dataset"]["max_node_num"] = 8
    raw["mcmc"]["num_steps"] = 4
    raw["test"]["batch_size"] = 4
    with open(cfg_file, "w") as f:
        yaml.safe_dump(raw, f)

    art = str(tmp_path / "art")
    serve_main(["-p", ckpt, "-c", cfg_file, "--export_to", art,
                "--batch_size", "2"])
    loaded, meta = load_artifact(art)
    assert meta["batch_size"] == 2
    flags = _flags(2, 8, [8, 3])
    adj, node, bbox = loaded(np.int32(1), flags)
    assert np.asarray(adj).shape == (2, 8, 8)
    assert np.all(np.asarray(node)[1, 3:] == 0)


# ------------------------------------------------------------------ batcher

def _fake_fn(seed, flags):
    """Deterministic stand-in for the compiled sampler: labels = seed, the
    adjacency marks every valid (i!=j) pair with predicate 1."""
    b, n = flags.shape
    f = np.asarray(flags)
    node = np.where(f, int(seed), 0).astype(np.int32)
    pair = f[:, :, None] & f[:, None, :] & ~np.eye(n, dtype=bool)[None]
    adj = pair.astype(np.int32)
    bbox = np.tile(f[..., None] * 0.5, (1, 1, 4)).astype(np.float32)
    return adj, node, bbox


def test_batcher_packs_and_splits():
    from diffusesg_tpu.serving.server import BatchingSampler
    b = BatchingSampler(_fake_fn, batch_size=8, max_node_num=6,
                        linger_ms=200.0)
    try:
        results = [None, None]

        def call(i, k, nn):
            results[i] = b.generate(k, nn)

        t0 = threading.Thread(target=call, args=(0, 3, 4))
        t1 = threading.Thread(target=call, args=(1, 2, [2, 6]))
        t0.start(); t1.start(); t0.join(10); t1.join(10)
        assert len(results[0]) == 3 and len(results[1]) == 2
        # both rode one batch (the linger window coalesced them)
        assert b.stats["batches"] == 1 and b.stats["requests"] == 2
        g = results[1][1]
        assert len(g["nodes"]) == 6
        assert len(g["edges"]) == 6 * 5  # full directed graph, no self-loops
        assert all(e[2] == 1 for e in g["edges"])
        g2 = results[1][0]
        assert len(g2["nodes"]) == 2 and len(g2["bboxes"]) == 2
    finally:
        b.close()


def test_batcher_seeded_requests_are_deterministic_and_isolated():
    from diffusesg_tpu.serving.server import BatchingSampler
    b = BatchingSampler(_fake_fn, batch_size=4, max_node_num=5, linger_ms=1.0)
    try:
        r1 = b.generate(1, 3, seed=42)
        r2 = b.generate(1, 3, seed=42)
        assert r1 == r2
        assert r1[0]["nodes"] == [42, 42, 42]  # fake fn: labels == seed
        r3 = b.generate(1, 3)  # unseeded uses the internal counter
        assert r3[0]["nodes"] != [42, 42, 42]
    finally:
        b.close()


def test_batcher_validates_inputs():
    from diffusesg_tpu.serving.server import BatchingSampler
    b = BatchingSampler(_fake_fn, batch_size=4, max_node_num=5, linger_ms=1.0)
    try:
        with pytest.raises(ValueError):
            b.generate(5, 3)         # over batch
        with pytest.raises(ValueError):
            b.generate(1, 9)         # over max nodes
        with pytest.raises(ValueError):
            b.generate(2, [1, 2, 3])  # count mismatch
    finally:
        b.close()


# ------------------------------------------------------------------ http

def test_http_server_end_to_end():
    from diffusesg_tpu.serving.server import BatchingSampler, serve
    b = BatchingSampler(_fake_fn, batch_size=4, max_node_num=5, linger_ms=1.0)
    idx_to_word = {"ind_to_classes": [f"cls{i}" for i in range(100)],
                   "ind_to_predicates": ["none", "on"]}
    httpd = serve(b, 0, idx_to_word)  # port 0: ephemeral
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            health = json.load(r)
        assert health["status"] == "ok" and health["batch_size"] == 4

        req = urllib.request.Request(
            base + "/v1/generate",
            data=json.dumps({"num_graphs": 2, "num_nodes": [3, 2],
                             "seed": 5}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            payload = json.load(r)
        graphs = payload["graphs"]
        assert len(graphs) == 2
        assert graphs[0]["nodes"] == [5, 5, 5]
        assert graphs[0]["node_names"] == ["cls5"] * 3
        assert all(e[2] == 1 for e in graphs[0]["edges"])
        assert graphs[0]["edge_names"] == ["on"] * len(graphs[0]["edges"])

        # malformed request -> 400
        bad = urllib.request.Request(
            base + "/v1/generate",
            data=json.dumps({"num_graphs": 99}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad, timeout=10)
        assert exc.value.code == 400

        with urllib.request.urlopen(base + "/v1/stats", timeout=10) as r:
            stats = json.load(r)
        assert stats["graphs"] >= 2 and "latency_ms_p50" in stats
    finally:
        httpd.shutdown()
        b.close()


# ------------------------------------------------------------------ completion

def test_completion_fn_pins_known_parts(tiny_cfg, serving_fn):
    """make_completion_fn: pinned types/edges/bboxes come back verbatim
    (RePaint inpainting, reference conditional mode edm.py:291-329);
    unpinned parts are sampled."""
    from diffusesg_tpu.serving.export import make_completion_fn

    _, model, params, sampler = serving_fn
    fn = jax.jit(make_completion_fn(model, params, sampler, tiny_cfg))
    B, N = 4, tiny_cfg.dataset.max_node_num
    flags = _flags(B, N, [6, 6, 6, 6])
    kn = np.zeros((B, N), np.int32)
    mn = np.zeros((B, N), bool)
    kb = np.full((B, N, 4), 0.5, np.float32)
    mb = np.zeros((B, N), bool)
    ka = np.zeros((B, N, N), np.int32)
    ma = np.zeros((B, N, N), bool)
    kn[:, 0] = 3; mn[:, 0] = True
    kb[:, 0] = [0.25, 0.25, 0.1, 0.2]; mb[:, 0] = True
    kn[:, 1] = 1; mn[:, 1] = True          # type pinned, bbox free
    ka[:, 0, 1] = 2; ma[:, 0, 1] = True

    adj, node, bbox = (np.asarray(v) for v in
                       fn(np.int32(7), flags, kn, mn, kb, mb, ka, ma))
    assert (node[:, 0] == 3).all() and (node[:, 1] == 1).all()
    assert (adj[:, 0, 1] == 2).all()
    np.testing.assert_allclose(bbox[:, 0], [[0.25, 0.25, 0.1, 0.2]] * B,
                               atol=1e-5)
    # determinism: same seed -> same completion
    adj2, node2, bbox2 = (np.asarray(v) for v in
                          fn(np.int32(7), flags, kn, mn, kb, mb, ka, ma))
    np.testing.assert_array_equal(node, node2)
    np.testing.assert_array_equal(adj, adj2)


def _fake_complete_fn(seed, flags, kn, mn, kb, mb, ka, ma):
    """Stand-in honoring the inpainting contract: pinned values verbatim,
    free values = seed."""
    adj, node, bbox = _fake_fn(seed, flags)
    node = np.where(mn, kn, node)
    bbox = np.where(mb[..., None], kb, bbox)
    adj = np.where(ma, ka, adj)
    return adj, node, bbox


def test_batcher_complete_and_http_route():
    from diffusesg_tpu.serving.server import BatchingSampler, serve
    b = BatchingSampler(_fake_fn, batch_size=4, max_node_num=5,
                        linger_ms=1.0, complete_fn=_fake_complete_fn)
    httpd = serve(b, 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        g = b.complete(4, known_nodes=[{"index": 0, "type": 9},
                                       {"index": 1, "bbox": [0.1, 0.2, 0.3, 0.4]}],
                       known_edges=[[0, 1, 7]], seed=5)
        assert g["nodes"][0] == 9 and g["nodes"][1] == 5  # 1: type free -> seed
        assert g["bboxes"][1] == [pytest.approx(v) for v in [0.1, 0.2, 0.3, 0.4]]
        assert [0, 1, 7] in g["edges"]

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/complete",
            data=json.dumps({"num_nodes": 3, "seed": 2,
                             "known_nodes": [{"index": 2, "type": 8}],
                             "known_edges": [[2, 0, 3]]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            payload = json.load(r)
        (g2,) = payload["graphs"]
        assert g2["nodes"] == [2, 2, 8]
        assert [2, 0, 3] in g2["edges"]

        # validation -> 400
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/complete",
            data=json.dumps({"num_nodes": 3,
                             "known_nodes": [{"index": 7, "type": 1}]}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad, timeout=10)
        assert exc.value.code == 400
    finally:
        httpd.shutdown()
        b.close()


def test_complete_unavailable_in_artifact_mode():
    from diffusesg_tpu.serving.server import BatchingSampler, serve
    b = BatchingSampler(_fake_fn, batch_size=4, max_node_num=5, linger_ms=1.0)
    httpd = serve(b, 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        with pytest.raises(RuntimeError, match="completion unavailable"):
            b.complete(3)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/complete",
            data=json.dumps({"num_nodes": 3}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=10)
        assert exc.value.code == 501
    finally:
        httpd.shutdown()
        b.close()


def test_complete_validates_label_bounds():
    from diffusesg_tpu.serving.server import BatchingSampler
    b = BatchingSampler(_fake_fn, batch_size=4, max_node_num=5, linger_ms=1.0,
                        complete_fn=_fake_complete_fn,
                        num_node_types=10, num_edge_types=5)
    try:
        with pytest.raises(ValueError, match="node type"):
            b.complete(3, known_nodes=[{"index": 0, "type": 10}])
        with pytest.raises(ValueError, match="predicate"):
            b.complete(3, known_edges=[[0, 1, 5]])
        with pytest.raises(ValueError, match="node type"):
            b.complete(3, known_nodes=[{"index": 0, "type": -1}])
        # p == 0 pins "no edge" and is allowed
        g = b.complete(3, known_edges=[[0, 1, 0]], seed=1)
        assert [0, 1, 0] not in g["edges"]  # no-edge stays absent
    finally:
        b.close()
