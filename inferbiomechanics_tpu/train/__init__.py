from inferbiomechanics_tpu.train.optimizers import make_optimizer, OPT_TYPES
from inferbiomechanics_tpu.train.state import TrainState, create_train_state, num_params
from inferbiomechanics_tpu.train.step import make_train_step, make_eval_step
from inferbiomechanics_tpu.train.checkpoint import (
    AsyncCheckpointer, save_checkpoint, load_latest_checkpoint,
    list_checkpoints, checkpoint_name,
)

__all__ = [
    'make_optimizer', 'OPT_TYPES',
    'TrainState', 'create_train_state', 'num_params',
    'make_train_step', 'make_eval_step',
    'AsyncCheckpointer',
    'save_checkpoint', 'load_latest_checkpoint', 'list_checkpoints', 'checkpoint_name',
]
