from .diffusesg import DiffuseSG
from .precond import precond_forward, precond_forward_train, round_sigma
from .channels import (
    get_node_adj_num_type,
    get_node_adj_model_input_output_channels,
    dataset_constants,
)
from .factory import build_model, count_params
