from .checkpoint import (
    save_checkpoint, restore_checkpoint, state_from_payload,
    list_checkpoints, select_checkpoints, latest_checkpoint,
    wait_for_async_saves,
)
from .logging_utils import set_seed_and_logger, backup_code, ScalarWriter, LossTxtLogger
