from .mesh import (
    make_mesh, replicated, batch_sharding, zero1_sharding, replicate_tree,
    shard_batch, gather_to_host, fetch_to_host, sync_hosts, is_main_process,
)
from .sharded_step import make_sharded_train_step, shard_train_state
from .tp import make_mesh_2d, tp_param_shardings, tp_state_shardings
from .shardmap_dp import (
    make_shardmap_eval_step, make_shardmap_sample_fn, make_shardmap_train_step,
)
