from .loss import NodeAdjRainbowLoss, bbox_iou_aux_loss
from .train_state import (
    TrainState, make_optimizer, create_train_state, update_emas, ema_slice,
)
from .train_step import (
    TrainStepConfig, make_train_step, make_eval_step, make_loss_fn,
    train_step_config_from, encode_one_hot_batch,
)
from .trainer import go_training
