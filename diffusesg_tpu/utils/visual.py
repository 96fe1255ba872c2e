"""Scene-graph and layout visualization.

Counterpart of the reference visual layer (reference:
DiffuseSG/utils/visual_utils.py: plot_graphs_adj :35-126, plot_scene_graph
:129-224, plot_scene_graph_bbox :227-398).  Uses matplotlib's Agg backend;
all functions are safe to call headless and never raise into the caller.
"""
from __future__ import annotations

import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def plot_graphs_adj(adjs, node_flags=None, save_dir=".", title="graphs.png",
                    num_plots: int = 8):
    """Grid of adjacency heatmaps (reference: visual_utils.py:35-126)."""
    adjs = np.asarray(adjs)
    k = min(num_plots, len(adjs))
    cols = min(4, k)
    rows = -(-k // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows), squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i < k:
            ax.imshow(adjs[i], cmap="viridis")
            if node_flags is not None:
                n = int(np.asarray(node_flags[i]).astype(bool).sum())
                ax.set_title(f"n={n}", fontsize=8)
    os.makedirs(save_dir, exist_ok=True)
    fig.savefig(os.path.join(save_dir, title), dpi=100, bbox_inches="tight")
    plt.close(fig)


def draw_curved_edge_labels(pos, edge_labels, ax, rad: float = 0.1,
                            font_size: int = 5):
    """Place edge labels on the arc3 curve the edges are drawn with.

    Straight-midpoint labels (networkx default) collapse onto each other for
    bidirectional pairs (u->v and v->u); evaluating the quadratic Bezier the
    FancyArrowPatch actually draws at t=0.5 separates the two directions,
    the role of the reference's vendored helper
    (reference: utils/nx_multi_edge.py draw_networkx_multi_edge_labels).
    """
    for (u, v), label in edge_labels.items():
        (x1, y1), (x2, y2) = pos[u], pos[v]
        # matplotlib arc3: control point sits rad*|P2-P0| perpendicular to
        # the chord at its midpoint; Bezier(t=0.5) = midpoint + rad/2 * perp
        mx, my = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        dx, dy = x2 - x1, y2 - y1
        lx, ly = mx + rad * 0.5 * dy, my - rad * 0.5 * dx
        ax.text(lx, ly, label, fontsize=font_size, ha="center", va="center",
                bbox=dict(boxstyle="round,pad=0.1", fc="white", ec="none",
                          alpha=0.7), zorder=3)


def plot_scene_graph(node_types, adjs, node_flags, idx_to_word, save_dir=".",
                     title="scene_graphs.png", flag_bin_edge: bool = False,
                     num_plots: int = 8):
    """Grid of directed scene graphs with word labels
    (reference: visual_utils.py:129-224)."""
    import networkx as nx
    node_types = np.asarray(node_types)
    adjs = np.asarray(adjs)
    flags = np.asarray(node_flags).astype(bool)
    classes = idx_to_word.get("ind_to_classes", [])
    preds = idx_to_word.get("ind_to_predicates", [])

    k = min(num_plots, len(adjs))
    cols = min(4, k)
    rows = -(-k // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 5 * rows), squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i >= k:
            continue
        n = int(flags[i].sum())
        g = nx.DiGraph()
        for v in range(n):
            t = int(node_types[i, v])
            name = classes[t] if t < len(classes) else str(t)
            g.add_node(v, label=f"{name}.{v}")
        edge_labels = {}
        for u in range(n):
            for v in range(n):
                e = int(adjs[i, u, v])
                if e > 0 and u != v:
                    g.add_edge(u, v)
                    lab = "edge" if flag_bin_edge else (
                        preds[e] if e < len(preds) else str(e))
                    edge_labels[(u, v)] = lab
        if g.number_of_nodes() == 0:
            continue
        pos = nx.spring_layout(g, seed=0)
        nx.draw_networkx_nodes(g, pos, ax=ax, node_size=300, node_color="#9fc5e8")
        nx.draw_networkx_labels(g, pos, labels=nx.get_node_attributes(g, "label"),
                                ax=ax, font_size=6)
        nx.draw_networkx_edges(g, pos, ax=ax, arrows=True,
                               connectionstyle="arc3,rad=0.1")
        draw_curved_edge_labels(pos, edge_labels, ax, rad=0.1, font_size=5)
    os.makedirs(save_dir, exist_ok=True)
    fig.savefig(os.path.join(save_dir, title), dpi=100, bbox_inches="tight")
    plt.close(fig)


def plot_scene_graph_bbox(node_types, bboxes, adjs, node_types_gt, bboxes_gt,
                          adjs_gt, mat_f1, node_flags, node_flags_gt, idx_to_word,
                          save_dir=".", title="bbox.png", num_plots: int = 8):
    """Generated layouts next to their best-F1 retrieved GT layouts
    (reference: visual_utils.py:227-398)."""
    node_types = np.asarray(node_types)
    bboxes = np.asarray(bboxes)
    flags = np.asarray(node_flags).astype(bool)
    flags_gt = np.asarray(node_flags_gt).astype(bool)
    classes = idx_to_word.get("ind_to_classes", [])
    mat_f1 = np.asarray(mat_f1)

    k = min(num_plots, len(bboxes))
    fig, axes = plt.subplots(2, k, figsize=(3 * k, 6.5), squeeze=False)

    def _draw(ax, types_row, bbox_row, valid, label):
        ax.set_xlim(0, 1)
        ax.set_ylim(1, 0)
        ax.set_title(label, fontsize=7)
        ax.set_xticks([])
        ax.set_yticks([])
        cmap = plt.get_cmap("tab20")
        for j in np.nonzero(valid)[0]:
            cx, cy, w, h = bbox_row[j]
            t = int(types_row[j])
            name = classes[t] if t < len(classes) else str(t)
            rect = plt.Rectangle((cx - w / 2, cy - h / 2), w, h, fill=False,
                                 edgecolor=cmap(t % 20), linewidth=1.2)
            ax.add_patch(rect)
            ax.text(cx - w / 2, cy - h / 2, name, fontsize=5, color=cmap(t % 20))

    for i in range(k):
        best = int(np.argmax(mat_f1[i])) if mat_f1.size else 0
        _draw(axes[0][i], node_types[i], bboxes[i], flags[i], f"gen {i}")
        _draw(axes[1][i], np.asarray(node_types_gt)[best], np.asarray(bboxes_gt)[best],
              flags_gt[best], f"retrieved gt {best} (f1={mat_f1[i, best]:.2f})")
    os.makedirs(save_dir, exist_ok=True)
    fig.savefig(os.path.join(save_dir, title), dpi=100, bbox_inches="tight")
    plt.close(fig)
