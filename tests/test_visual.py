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
    # reference artifact naming: one '{i:02d}_<title>' panel file per pair of
    # scene graphs + the shared F1 histogram (visual_utils.py:386-398);
    # with only 2 graphs, plot file 1 (needing graphs 2-3) is skipped
    assert os.path.exists(tmp_path / "00_bbox.png")
    assert not os.path.exists(tmp_path / "01_bbox.png")
    assert os.path.exists(tmp_path / "f1_score_distribution.png")


def test_bbox_canvas_reference_structure():
    """The PIL canvas structurally matches a reference render on the same
    inputs (visual_utils.py:300-320): white 400x400, a colored outline on the
    box border, a filled label chip at the box's top-left corner."""
    from diffusesg_tpu.utils.visual import bbox_canvas
    types = np.array([1, 2])
    # two crisp boxes: (cx=.5, cy=.5, w=.5, h=.5) and (cx=.25, cy=.25, ...)
    boxes = np.array([[0.5, 0.5, 0.5, 0.5], [0.25, 0.25, 0.2, 0.2]])
    canvas = bbox_canvas(types, boxes, 2, IDX["ind_to_classes"])
    assert canvas.size == (400, 400)
    px = np.asarray(canvas)
    assert px.shape == (400, 400, 3)
    # background is white
    assert (px[390, 390] == 255).all()
    # box 0 spans x,y in [100, 300]: its bottom edge (y=299/300) is a colored
    # (non-white) outline
    assert (px[299:301, 200] < 255).any()
    # the 50x10 label chip at the box's top-left corner is filled (non-white)
    chip = px[101:109, 105:145]
    assert (chip < 250).any(axis=-1).mean() > 0.9
    # degenerate boxes are skipped, like the reference's x2>x1,y2>y1 guard
    canvas2 = bbox_canvas(np.array([1]), np.array([[0.0, 0.0, 0.0, 0.0]]), 1,
                          IDX["ind_to_classes"])
    assert (np.asarray(canvas2) == 255).all()
