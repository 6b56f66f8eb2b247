from inferbiomechanics_tpu.loss.evaluator import (
    RegressionLossEvaluator,
    LossConfig,
    loss_and_metrics,
)

__all__ = ['RegressionLossEvaluator', 'LossConfig', 'loss_and_metrics']
