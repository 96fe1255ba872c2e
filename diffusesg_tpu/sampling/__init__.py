from .edm_sampler import NodeAdjEDMSampler
from .decode import decode_samples, decode_node, decode_adj, split_bbox_nodes, DecodedSamples
from .factory import get_mc_sampler
from .debug import eval_sample_batch
