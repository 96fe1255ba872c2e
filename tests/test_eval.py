"""Tests for the evaluation suite, cross-validated against the reference
implementations (imported from /root/reference with pyemd stubbed)."""
import os
import sys
import types

import numpy as np
import pytest

from diffusesg_tpu.eval import (
    compute_mmd, gaussian, gaussian_tv, gaussian_emd,
    degree_histograms, degree_stats,
    get_average_iou, get_perceptual_iou, get_overlap_index, get_alignment_loss,
    compute_bbox_f1, SceneGraphEvaluator,
)

REF = "/root/reference/DiffuseSG"
HAS_REF = os.path.isdir(REF)


def _install_pyemd_stub():
    """pyemd is absent; stub it with the exact 1-D closed form so the
    reference modules import (only used with Toeplitz |i-j| distances)."""
    if "pyemd" in sys.modules:
        return
    stub = types.ModuleType("pyemd")

    def emd(x, y, dmat):
        # valid for Toeplitz(range) ground distance and equal-mass inputs
        return float(np.abs(np.cumsum(x - y)).sum()) * (dmat[0, 1] if dmat.shape[0] > 1 else 1.0)

    stub.emd = emd
    sys.modules["pyemd"] = stub


@pytest.fixture(scope="module")
def ref_eval():
    if not HAS_REF:
        pytest.skip("reference not mounted")
    _install_pyemd_stub()
    sys.path.insert(0, REF)
    import importlib
    mmd_mod = importlib.import_module("evaluation.mmd")
    blt_mod = importlib.import_module("evaluation.blt_utils")
    bbox_utils_mod = importlib.import_module("evaluation.bbox_utils")
    yield types.SimpleNamespace(mmd=mmd_mod, blt=blt_mod, bbox_utils=bbox_utils_mod)
    sys.path.remove(REF)


# ---------------------------------------------------------------- MMD kernels

def test_mmd_reference_selftest_values():
    """Values from the reference's own __main__ smoke test (mmd.py:164-185)."""
    s1 = [np.array([0.2, 0.8]), np.array([0.3, 0.7])]
    s2 = [np.array([0.25, 0.75]), np.array([0.35, 0.65])]
    s3 = [np.array([0.8, 0.2]), np.array([0.7, 0.3])]
    close = compute_mmd(s1, s2, kernel="gaussian")
    far = compute_mmd(s1, s3, kernel="gaussian")
    assert 0 <= close < far


def test_kernels_match_reference(ref_eval):
    rs = np.random.RandomState(0)
    for _ in range(10):
        x = rs.rand(rs.randint(2, 9))
        y = rs.rand(rs.randint(2, 9))
        np.testing.assert_allclose(gaussian(x, y), ref_eval.mmd.gaussian(x, y), rtol=1e-9)
        np.testing.assert_allclose(gaussian_tv(x, y), ref_eval.mmd.gaussian_tv(x, y), rtol=1e-9)


def test_compute_mmd_matches_reference(ref_eval):
    rs = np.random.RandomState(1)
    s1 = [rs.rand(rs.randint(2, 7)) for _ in range(5)]
    s2 = [rs.rand(rs.randint(2, 7)) for _ in range(4)]
    for kname, kfn in [("gaussian", ref_eval.mmd.gaussian),
                       ("gaussian_tv", ref_eval.mmd.gaussian_tv)]:
        ref = ref_eval.mmd.compute_mmd([s.copy() for s in s1], [s.copy() for s in s2],
                                       kernel=kfn, is_parallel=False)
        got = compute_mmd(s1, s2, kernel=kname)
        np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-12)


def test_emd_kernel_closed_form_vs_lp():
    """1-D EMD closed form vs a brute-force optimal transport LP."""
    from scipy.optimize import linprog
    rs = np.random.RandomState(2)
    for _ in range(5):
        n = 5
        x = rs.rand(n); x /= x.sum()
        y = rs.rand(n); y /= y.sum()
        # LP: min sum c_ij f_ij s.t. marginals
        c = np.abs(np.subtract.outer(np.arange(n), np.arange(n))).ravel().astype(float)
        a_eq, b_eq = [], []
        for i in range(n):
            row = np.zeros((n, n)); row[i, :] = 1
            a_eq.append(row.ravel()); b_eq.append(x[i])
        for j in range(n):
            row = np.zeros((n, n)); row[:, j] = 1
            a_eq.append(row.ravel()); b_eq.append(y[j])
        res = linprog(c, A_eq=np.asarray(a_eq), b_eq=np.asarray(b_eq), method="highs")
        lp_emd = res.fun
        closed = np.abs(np.cumsum(x - y)).sum()
        np.testing.assert_allclose(closed, lp_emd, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(gaussian_emd(x, y), np.exp(-closed**2 / 2), rtol=1e-9)


# ------------------------------------------------------------- degree MMD

def test_degree_histograms_match_networkx():
    import networkx as nx
    rs = np.random.RandomState(3)
    adjs = (rs.rand(6, 10, 10) < 0.2).astype(float)
    got = degree_histograms(adjs)
    for adj, hist in zip(adjs, got):
        g = nx.from_numpy_array(adj)
        g.remove_edges_from(list(nx.selfloop_edges(g)))
        g.remove_nodes_from(list(nx.isolates(g)))
        if g.number_of_nodes() < 1:
            g.add_node(1)
        expect = np.array(nx.degree_histogram(g), dtype=float)
        np.testing.assert_array_equal(hist, expect)


def test_degree_stats_runs():
    rs = np.random.RandomState(4)
    a = (rs.rand(5, 8, 8) < 0.3).astype(float)
    b = (rs.rand(5, 8, 8) < 0.3).astype(float)
    val = degree_stats(a, b, kernel="gaussian")
    same = degree_stats(a, a, kernel="gaussian")
    assert val >= 0 and same < 1e-9


# ------------------------------------------------------------- BLT metrics

def _random_layouts(rs, n):
    x1 = rs.rand(n) * 0.5
    y1 = rs.rand(n) * 0.5
    x2 = x1 + rs.rand(n) * 0.45
    y2 = y1 + rs.rand(n) * 0.45
    return np.stack([x1, y1, np.clip(x2, 0, 1), np.clip(y2, 0, 1)], -1)


@pytest.mark.parametrize("metric", ["iou", "overlap", "perceptual", "alignment"])
def test_blt_metrics_match_reference(ref_eval, metric):
    rs = np.random.RandomState(5)
    fns = {
        "iou": (get_average_iou, ref_eval.blt.get_average_iou),
        "overlap": (get_overlap_index, ref_eval.blt.get_overlap_index),
        "perceptual": (get_perceptual_iou, ref_eval.blt.get_perceptual_iou),
        "alignment": (get_alignment_loss, ref_eval.blt.get_alignment_loss),
    }
    mine, ref = fns[metric]
    for n in [1, 2, 3, 6, 10]:
        layout = _random_layouts(rs, n)
        got = mine(layout)
        expect = ref(layout.copy())
        if expect is None:
            assert got is None
        else:
            np.testing.assert_allclose(got, expect, rtol=1e-7, atol=1e-10)


# ------------------------------------------------------------- VOC F1

def _random_scene(rs, n, num_classes):
    flags = np.zeros(n, bool)
    flags[: rs.randint(1, n + 1)] = True
    types = rs.randint(0, num_classes, n)
    boxes = _random_layouts(rs, n)
    return boxes, types, flags


def _ref_f1_matrix(ref_eval, bg, tg, fg, br, tr, fr, weights):
    sys.path.insert(0, REF)
    try:
        import importlib
        bm = importlib.import_module("evaluation.bbox_metrics")
        gen_objs = bm.preprocess_bbox_batch_scenes(bg, tg, fg, is_gt=False)
        ref_objs = bm.preprocess_bbox_batch_scenes(br, tr, fr, is_gt=True)
        W = 1 if weights is None else len(weights)
        out = np.zeros((len(gen_objs), len(ref_objs), W))
        for i in range(len(gen_objs)):
            for j in range(len(ref_objs)):
                maf1, _ = bm.measure_two_sets_of_bboxes(gen_objs[i], ref_objs[j],
                                                        class_weight_ls=weights)
                out[i, j] = maf1
        return out
    finally:
        sys.path.remove(REF)


def test_bbox_f1_matches_reference(ref_eval):
    rs = np.random.RandomState(6)
    num_classes, n = 6, 8
    bg, tg, fg = zip(*[_random_scene(rs, n, num_classes) for _ in range(4)])
    br, tr, fr = zip(*[_random_scene(rs, n, num_classes) for _ in range(3)])
    bg, tg, fg = map(np.stack, (bg, tg, fg))
    br, tr, fr = map(np.stack, (br, tr, fr))

    for weights in [None, [np.ones(num_classes), rs.rand(num_classes) + 0.1]]:
        got = compute_bbox_f1(bg, tg, fg, br, tr, fr, class_weight_ls=weights)
        expect = _ref_f1_matrix(ref_eval, bg, tg, fg, br, tr, fr, weights)
        np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-9)


def test_bbox_f1_perfect_match_is_high():
    rs = np.random.RandomState(7)
    b, t, f = zip(*[_random_scene(rs, 6, 4) for _ in range(3)])
    b, t, f = map(np.stack, (b, t, f))
    mat = compute_bbox_f1(b, t, f, b, t, f)
    diag = np.diagonal(mat[..., 0])
    assert (diag > 0.9).all(), diag


# ------------------------------------------------------- evaluator histograms

def test_node_type_hist():
    types = np.array([[0, 1, 1, 2], [2, 2, 0, 0]])
    flags = np.array([[1, 1, 1, 0], [1, 1, 0, 0]], bool)
    hists = SceneGraphEvaluator._get_node_type_hist(types, flags, 3)
    np.testing.assert_array_equal(hists[0], [1, 2, 0])
    np.testing.assert_array_equal(hists[1], [0, 0, 2])


def test_edge_type_hist_drops_type0_and_empty():
    adj = np.zeros((2, 3, 3))
    adj[0, 0, 1] = 2
    adj[0, 1, 0] = 1
    flags = np.ones((2, 3), bool)
    hists = SceneGraphEvaluator._get_edge_type_hist(adj, flags, 3)
    assert len(hists) == 1  # second graph has no edges
    np.testing.assert_array_equal(hists[0], [1, 1])  # types 1 and 2


def test_triplet_tv_dist():
    adj = np.zeros((1, 3, 3))
    adj[0, 0, 1] = 1
    adj[0, 1, 2] = 2
    types = np.array([[5, 6, 7]])
    flags = np.ones((1, 3), bool)
    tdict = {(5, 6, 1): 0.5, (6, 7, 2): 0.3, (7, 5, 1): 0.2}
    rej, all_, full, novelty = SceneGraphEvaluator.compute_triplet_tv_dist(
        adj, types, flags, tdict, tdict)
    # generated: {(5,6,1):1, (6,7,2):1} -> normalized [0.5, 0.5, 0]
    np.testing.assert_allclose(rej, abs(0.5 - 0.5) + abs(0.3 - 0.5) + abs(0.2 - 0))
    np.testing.assert_allclose(all_, rej)
    np.testing.assert_allclose(novelty, 0.0)


def test_triplet_novelty_counted():
    adj = np.zeros((1, 2, 2))
    adj[0, 0, 1] = 3
    types = np.array([[1, 2]])
    flags = np.ones((1, 2), bool)
    tdict = {(9, 9, 1): 1.0}
    rej, all_, full, novelty = SceneGraphEvaluator.compute_triplet_tv_dist(
        adj, types, flags, tdict, tdict)
    np.testing.assert_allclose(novelty, 1.0)  # all generated mass is novel


# ------------------------------------------------------------- native engine

def test_native_f1_matches_numpy():
    """The C++ VOC-F1 engine must agree exactly with the (reference-verified)
    numpy implementation."""
    from diffusesg_tpu.eval.native import compute_bbox_f1_native, get_lib
    if get_lib() is None:
        pytest.skip("native build unavailable")
    rs = np.random.RandomState(11)
    num_classes, n = 8, 10
    bg, tg, fg = zip(*[_random_scene(rs, n, num_classes) for _ in range(6)])
    br, tr, fr = zip(*[_random_scene(rs, n, num_classes) for _ in range(5)])
    bg, tg, fg = map(np.stack, (bg, tg, fg))
    br, tr, fr = map(np.stack, (br, tr, fr))
    for weights in [None, [np.ones(num_classes), rs.rand(num_classes) + 0.1]]:
        ref = compute_bbox_f1(bg, tg, fg, br, tr, fr, class_weight_ls=weights)
        nat = compute_bbox_f1_native(bg, tg, fg, br, tr, fr, class_weight_ls=weights)
        np.testing.assert_allclose(nat, ref, rtol=1e-12, atol=1e-12)


def test_native_f1_speed_smoke():
    from diffusesg_tpu.eval.native import compute_bbox_f1_native, get_lib
    if get_lib() is None:
        pytest.skip("native build unavailable")
    import time
    rs = np.random.RandomState(12)
    num_classes, n, B = 20, 16, 64
    b, t, f = zip(*[_random_scene(rs, n, num_classes) for _ in range(B)])
    b, t, f = map(np.stack, (b, t, f))
    t0 = time.time()
    out = compute_bbox_f1_native(b, t, f, b, t, f)
    dt = time.time() - t0
    assert out.shape == (B, B, 1)
    assert dt < 5.0  # 4096 pairs well under a second natively
