"""Regression loss + metric engine.

Capability parity: reference ``src/loss/RegressionLossEvaluator.py`` —
same four loss vectors (force / moment / wrench MSE; CoP MSE masked to
frames with ≥10 N contact force, ref :203-214), same user-selectable
component sum as the scalar training loss (ref :215-221), same reported
metrics (last-frame mean-norm errors, the averaged wrench-moment pair,
the summed-force COM-acc proxy, ref :230-263), and the same wandb key
schema (ref :342-366) — with the reference's two wiring bugs fixed
(CoP/COM-acc reports were logged under the wrong guards with swapped
labels, ref :355-362; SURVEY.md §2.11).

TPU-first split: the math lives in :func:`loss_and_metrics`, a pure
function designed to be closed over by the jitted train/eval step so
loss AND all reported metrics come out of one fused XLA computation per
batch (the reference recomputes each metric in eager torch). The
``RegressionLossEvaluator`` class is a thin host-side accumulator that
matches the reference's call surface for the CLI workflows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from inferbiomechanics_tpu.data.keys import OutputDataKeys
from inferbiomechanics_tpu.ops.losses import (
    com_acc_error, mask_by_threes, mean_norm_error, squared_diff_mean_vector,
)

# Component name tables (ref :11-32).
COMPONENTS = ['left-x', 'left-y', 'left-z', 'right-x', 'right-y', 'right-z']
WRENCH_COMPONENTS = [
    'left-moment-x', 'left-moment-y', 'left-moment-z',
    'left-force-x', 'left-force-y', 'left-force-z',
    'right-moment-x', 'right-moment-y', 'right-moment-z',
    'right-force-x', 'right-force-y', 'right-force-z',
]


@dataclass(frozen=True)
class LossConfig:
    """Which components of each loss vector feed the scalar training loss.

    Defaults mirror ``train.py`` (all force components; analyze.py instead
    defaults to the vertical force only — set per entry point).
    """
    predict_grf_components: Tuple[int, ...] = (0, 1, 2, 3, 4, 5)
    predict_cop_components: Tuple[int, ...] = ()
    predict_moment_components: Tuple[int, ...] = ()
    predict_wrench_components: Tuple[int, ...] = ()
    cop_force_threshold_newtons: float = 10.0
    # auxiliary-head weights (models that predict tau / COM-acc / contact,
    # e.g. the transformer — BASELINE config #3 "GRF + joint torques").
    # Applied only when the model's outputs contain the key.
    aux_tau_weight: float = 0.0
    aux_com_acc_weight: float = 0.0
    aux_contact_weight: float = 0.0


def loss_and_metrics(outputs: Dict[str, jax.Array],
                     labels: Dict[str, jax.Array],
                     config: LossConfig) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Pure, jit-friendly loss + metric computation for one batch.

    Returns ``(scalar_loss, metrics)`` where metrics holds the four loss
    vectors and all scalar reported metrics.
    """
    force_out = outputs[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME]
    force_lab = labels[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME]
    moment_out = outputs[OutputDataKeys.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME]
    moment_lab = labels[OutputDataKeys.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME]
    wrench_out = outputs[OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME]
    wrench_lab = labels[OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME]
    cop_out = outputs[OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME]
    cop_lab = labels[OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME]

    force_loss = squared_diff_mean_vector(force_out, force_lab)
    moment_loss = squared_diff_mean_vector(moment_out, moment_lab)
    wrench_loss = squared_diff_mean_vector(wrench_out, wrench_lab)
    # CoP is meaningless without contact: mask to frames with >=10 N force
    # on that foot (mass-normalized labels make the threshold N/kg in
    # practice — matching the reference exactly, ref :203-214).
    cop_mask = mask_by_threes(force_lab, threshold=config.cop_force_threshold_newtons)
    cop_loss = squared_diff_mean_vector(cop_out * cop_mask, cop_lab * cop_mask)

    sel = lambda vec, idx: (jnp.sum(vec[jnp.asarray(idx, jnp.int32)])
                            if len(idx) else jnp.asarray(0.0, vec.dtype))
    loss = (sel(force_loss, config.predict_grf_components) +
            sel(cop_loss, config.predict_cop_components) +
            sel(moment_loss, config.predict_moment_components) +
            sel(wrench_loss, config.predict_wrench_components))

    # auxiliary heads: supervise tau / COM-acc / contact when the model
    # emits them and the corresponding weight is non-zero
    if config.aux_tau_weight > 0 and OutputDataKeys.TAU in outputs:
        loss = loss + config.aux_tau_weight * jnp.mean(
            (outputs[OutputDataKeys.TAU] - labels[OutputDataKeys.TAU]) ** 2)
    if (config.aux_com_acc_weight > 0
            and OutputDataKeys.COM_ACC_IN_ROOT_FRAME in outputs):
        loss = loss + config.aux_com_acc_weight * jnp.mean(
            (outputs[OutputDataKeys.COM_ACC_IN_ROOT_FRAME]
             - labels[OutputDataKeys.COM_ACC_IN_ROOT_FRAME]) ** 2)
    if config.aux_contact_weight > 0 and OutputDataKeys.CONTACT in outputs:
        logits = outputs[OutputDataKeys.CONTACT]
        target = labels[OutputDataKeys.CONTACT]
        bce = jnp.maximum(logits, 0) - logits * target + \
            jnp.log1p(jnp.exp(-jnp.abs(logits)))
        loss = loss + config.aux_contact_weight * jnp.mean(bce)

    # Reported metrics (no grad needed; everything is already inside the
    # same XLA program and will be fused).
    wrench_halves = (mean_norm_error(wrench_out[:, :, :3], wrench_lab[:, :, :3]) +
                     mean_norm_error(wrench_out[:, :, 6:9], wrench_lab[:, :, 6:9])) / 2.0
    metrics = {
        'force_loss': force_loss,
        'moment_loss': moment_loss,
        'wrench_loss': wrench_loss,
        'cop_loss': cop_loss,
        'loss': loss,
        'force_avg_err': mean_norm_error(force_out, force_lab),
        'moment_avg_err': mean_norm_error(moment_out, moment_lab),
        'cop_avg_err': mean_norm_error(cop_out * cop_mask, cop_lab * cop_mask),
        'wrench_moment_avg_err': wrench_halves,
        'wrench_avg_err': mean_norm_error(wrench_out, wrench_lab, vec_size=6),
        'com_acc_avg_err': com_acc_error(force_out, force_lab),
    }
    return loss, jax.lax.stop_gradient(metrics)


class RegressionLossEvaluator:
    """Host-side per-split accumulator and report printer/logger.

    Mirrors the reference's surface: ``__call__`` per batch,
    ``print_report`` at epoch boundaries (ref :160,368). The optional
    ``tau_fn`` hook computes the inverse-dynamics joint-torque report
    (ref :265-286) — supplied by the skeleton ops once a skeleton is
    available.
    """

    def __init__(self, split: str, config: LossConfig = LossConfig(),
                 tau_fn: Optional[Callable] = None,
                 wandb_logger=None):
        self.split = split
        self.config = config
        self.tau_fn = tau_fn
        self.wandb_logger = wandb_logger
        self._jit_core = jax.jit(lambda o, l: loss_and_metrics(o, l, config))
        self.reset()

    def reset(self) -> None:
        self.metric_history: Dict[str, List[np.ndarray]] = {}
        self.tau_reported_metrics: List[float] = []

    def compute_metrics(self, outputs: Dict[str, jax.Array],
                        labels: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Jit-compiled loss+metric computation without accumulation."""
        _, metrics = self._jit_core(outputs, labels)
        return metrics

    def _accumulate(self, metrics: Dict[str, jax.Array]) -> None:
        # keep device arrays — no host sync per batch; conversion happens
        # lazily at report time (the reference syncs eagerly every batch)
        for k, v in metrics.items():
            self.metric_history.setdefault(k, []).append(v)

    def __call__(self,
                 inputs,
                 outputs: Dict[str, jax.Array],
                 labels: Dict[str, jax.Array],
                 batch_subject_indices=None,
                 batch_trial_indices=None,
                 compute_report: bool = False,
                 log_reports_to_wandb: bool = False,
                 precomputed_metrics: Optional[Dict[str, jax.Array]] = None):
        """Evaluate one batch. If the train step already computed metrics in
        its fused program, pass them via ``precomputed_metrics`` to avoid a
        second device round-trip."""
        if precomputed_metrics is None:
            _, metrics = self._jit_core(outputs, labels)
        else:
            metrics = precomputed_metrics
        self._accumulate(metrics)

        tau_metric = None
        if compute_report and self.tau_fn is not None:
            tau_metric = float(self.tau_fn(inputs, outputs, labels,
                                           batch_subject_indices))
            self.tau_reported_metrics.append(tau_metric)

        if log_reports_to_wandb and self.wandb_logger is not None:
            self.wandb_logger.log(self._wandb_report(metrics, tau_metric))
        return metrics['loss']

    def _wandb_report(self, m: Dict[str, np.ndarray],
                      tau_metric: Optional[float]) -> Dict[str, float]:
        """Reference key schema (ref :342-366), with the guard/label bugs
        fixed: each report key is logged iff its own metric exists."""
        c = self.config
        arr = lambda k: np.asarray(m[k])
        report: Dict[str, float] = {
            **{f'{self.split}/force_rmse/{COMPONENTS[i]}': float(arr('force_loss')[i]) ** 0.5
               for i in c.predict_grf_components},
            **{f'{self.split}/cop_rmse/{COMPONENTS[i]}': float(arr('cop_loss')[i]) ** 0.5
               for i in c.predict_cop_components},
            **{f'{self.split}/moment_rmse/{COMPONENTS[i]}': float(arr('moment_loss')[i]) ** 0.5
               for i in c.predict_moment_components},
            **{f'{self.split}/wrench_loss/{WRENCH_COMPONENTS[i]}': float(arr('wrench_loss')[i]) ** 0.5
               for i in c.predict_wrench_components},
            f'{self.split}/loss': float(arr('loss')),
            f'{self.split}/reports/Force Avg Err (N per kg)': float(arr('force_avg_err')),
            f'{self.split}/reports/CoP Avg Err (m)': float(arr('cop_avg_err')),
            f'{self.split}/reports/Moment Avg Err (Nm per kg)': float(arr('moment_avg_err')),
            f'{self.split}/reports/COM Acc Avg Err (m per s^2)': float(arr('com_acc_avg_err')),
            f'{self.split}/reports/Wrench Avg Err (N+Nm per kg)': float(arr('wrench_avg_err')),
        }
        if tau_metric is not None:
            report[f'{self.split}/reports/Non-root Joint Torques (Inverse Dynamics) '
                   f'Avg Err (Nm per kg)'] = tau_metric
        return report

    def plot_errors(self, outputs: Dict[str, jax.Array],
                    labels: Dict[str, jax.Array],
                    plot_path_root: str = 'outputs/plots',
                    tag: str = 'batch') -> List[str]:
        """Per-component squared-error PNGs for the selected GRF components
        (parity: ref ``analyze=True`` path, RegressionLossEvaluator.py:314-321)."""
        import os
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        os.makedirs(plot_path_root, exist_ok=True)
        k = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
        err = np.asarray(outputs[k] - labels[k]) ** 2
        err = err[:, -1, :].reshape(-1, err.shape[-1])
        written = []
        for i in self.config.predict_grf_components:
            plt.clf()
            plt.plot(err[:, i])
            plt.ylabel(f'squared error {COMPONENTS[i]}')
            path = os.path.join(plot_path_root,
                                f'{tag}_grferror{COMPONENTS[i]}.png')
            plt.savefig(path)
            written.append(path)
        plt.close('all')
        return written

    def mean_metric(self, key: str) -> Optional[float]:
        hist = self.metric_history.get(key)
        return float(np.mean([np.asarray(h) for h in hist])) if hist else None

    def print_report(self, reset: bool = True, log_to_wandb: bool = False) -> Dict[str, float]:
        means = {k: np.mean(np.stack([np.asarray(x) for x in v]), axis=0)
                 for k, v in self.metric_history.items()}
        tau = (float(np.mean(self.tau_reported_metrics))
               if self.tau_reported_metrics else None)
        summary: Dict[str, float] = {}
        if means:
            summary = {
                'force_avg_err': float(means['force_avg_err']),
                'com_acc_avg_err': float(means['com_acc_avg_err']),
                'cop_avg_err': float(means['cop_avg_err']),
                'moment_avg_err': float(means['moment_avg_err']),
                'wrench_avg_err': float(means['wrench_avg_err']),
                'wrench_moment_avg_err': float(means['wrench_moment_avg_err']),
                'loss': float(means['loss']),
            }
            if tau is not None:
                summary['tau_avg_err'] = tau
            print(f'\tForce Avg Err: {summary["force_avg_err"]} N / kg')
            print(f'\tCOM Acc Avg Err: {summary["com_acc_avg_err"]} m / s^2')
            print(f'\tCoP Avg Err: {summary["cop_avg_err"]} m')
            print(f'\tMoment Avg Err: {summary["moment_avg_err"]} Nm / kg')
            print(f'\tWrench Avg Err: {summary["wrench_avg_err"]} N+Nm / kg')
            print(f'\tWrench Moment Avg Err: {summary["wrench_moment_avg_err"]} Nm / kg')
            if tau is not None:
                # only printed when a tau (inverse dynamics) report ran,
                # matching the reference (RegressionLossEvaluator.py:401-409)
                print(f'\tNon-root Joint Torques (Inverse Dynamics) Avg Err: {tau} Nm / kg')
            if log_to_wandb and self.wandb_logger is not None:
                self.wandb_logger.log(self._wandb_report(means, tau))
        if reset:
            self.reset()
        return summary
