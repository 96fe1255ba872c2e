from .dataset import SceneGraphData, SceneGraphBundle, build_tensors, load_data
from .synthetic import synthetic_scene_graphs, synthetic_bundle_dicts, compute_stats_dicts
from .loader import Batches, prefetch_to_device, split_eval_set
