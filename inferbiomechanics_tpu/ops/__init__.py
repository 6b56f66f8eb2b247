from inferbiomechanics_tpu.ops.losses import (
    squared_diff_mean_vector,
    mask_by_threes,
    mean_norm_error,
    com_acc_error,
)

__all__ = [
    'squared_diff_mean_vector',
    'mask_by_threes',
    'mean_norm_error',
    'com_acc_error',
]
