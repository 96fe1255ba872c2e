"""Plotters smoke tests (reference: utils/visual_utils.py, nx_multi_edge.py)."""
import os

import matplotlib
import numpy as np

matplotlib.use("Agg")

from diffusesg_tpu.utils.visual import (
    draw_curved_edge_labels, plot_graphs_adj, plot_scene_graph,
    plot_scene_graph_bbox,
)

IDX = {"ind_to_classes": ["bg", "man", "dog", "tree"],
       "ind_to_predicates": ["none", "on", "near"]}


def test_plot_scene_graph_bidirectional_labels(tmp_path):
    # 3 valid nodes with a bidirectional edge pair (1<->2): the curved-label
    # path must place the two predicate labels at DIFFERENT positions
    adjs = np.zeros((1, 4, 4), np.int64)
    adjs[0, 1, 2] = 1
    adjs[0, 2, 1] = 2
    node_types = np.array([[1, 2, 3, 0]])
    flags = np.array([[True, True, True, False]])
    plot_scene_graph(node_types, adjs, flags, IDX, save_dir=str(tmp_path),
                     title="sg.png")
    assert os.path.exists(tmp_path / "sg.png")


def test_curved_edge_labels_separate_directions():
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    pos = {0: (0.0, 0.0), 1: (1.0, 0.0)}
    draw_curved_edge_labels(pos, {(0, 1): "on", (1, 0): "near"}, ax, rad=0.1)
    texts = [t for t in ax.texts]
    assert len(texts) == 2
    p0, p1 = texts[0].get_position(), texts[1].get_position()
    assert abs(p0[1] - p1[1]) > 0.05  # opposite sides of the chord
    plt.close(fig)


def test_plot_graphs_adj_and_bbox_retrieval(tmp_path):
    adjs = (np.random.RandomState(0).rand(2, 4, 4) > 0.5).astype(float)
    flags = np.ones((2, 4), bool)
    plot_graphs_adj(adjs, flags, save_dir=str(tmp_path), title="adj.png")
    assert os.path.exists(tmp_path / "adj.png")

    rs = np.random.RandomState(1)
    bboxes = np.clip(rs.rand(2, 4, 4), 0.1, 0.9)
    types = rs.randint(0, 4, (2, 4))
    mat_f1 = rs.rand(2, 2)
    plot_scene_graph_bbox(types, bboxes, adjs, types, bboxes, adjs, mat_f1,
                          flags, flags, IDX, save_dir=str(tmp_path),
                          title="bbox.png", num_plots=2)
    assert os.path.exists(tmp_path / "bbox.png")
