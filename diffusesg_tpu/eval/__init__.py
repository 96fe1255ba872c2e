from .mmd import (
    compute_mmd, gaussian, gaussian_tv, gaussian_emd,
    gaussian_kernel_matrix, gaussian_tv_kernel_matrix, gaussian_emd_kernel_matrix,
    retrieve_kernels, KERNEL_NAME_TO_FUNC,
)
from .graph_stats import (
    degree_histograms, degree_stats, clustering_stats, spectral_stats,
    eval_graph_batch, adjs_to_graphs, is_lobster_graph,
    eval_acc_lobster_graph, eval_acc_lobster_batch,
)
from .blt import (
    get_average_iou, get_perceptual_iou, get_overlap_index, get_alignment_loss,
    compute_bbox_ioa,
)
from .voc_f1 import compute_bbox_f1
from .sg_evaluator import SceneGraphEvaluator
from .sg_statistics import compute_sg_statistics
