"""Batched sliding-window inference over a subject file.

Capability parity: the featurize/predict pair duplicated across the
reference's ``visualize_file.py:58-116``, ``save_prediction_csv.py:55-113``
and ``review_file.py:150-236`` — centralized once here, and vectorized:
instead of one forward pass per tick/frame, all windows of a trial are
assembled with the dataset's packed gather and predicted in large batches
on the TPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from inferbiomechanics_tpu.config import Config
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.keys import OutputDataKeys
from inferbiomechanics_tpu.loss import loss_and_metrics
from inferbiomechanics_tpu.train import (
    create_train_state, load_latest_checkpoint, make_optimizer,
)
from inferbiomechanics_tpu.train.loop import build_model_for_dataset, loss_config_from


@dataclass
class TrialPredictions:
    """Per-window predictions for one trial, aligned to window start frames."""
    window_starts: np.ndarray               # [N] raw-frame index of window start
    last_frame: np.ndarray                  # [N] raw-frame index of the predicted frame
    outputs: Dict[str, np.ndarray]          # each [N, out_frames, C]
    labels: Dict[str, np.ndarray]           # each [N, out_frames, C]
    per_window_loss: np.ndarray             # [N] scalar loss per window


class Predictor:
    """Loads a checkpointed model and predicts whole trials at once."""

    def __init__(self, config: Config, checkpoint_dir: str,
                 dataset: WindowDataset, tta_mirror: bool = False):
        self.config = config
        self.ds = dataset
        self.model = build_model_for_dataset(config, dataset)
        sample = dataset.gather(np.arange(min(8, max(1, len(dataset)))))
        self.state = create_train_state(
            self.model, jax.random.PRNGKey(0), jnp.asarray(sample.inputs),
            make_optimizer(config.opt_type, config.learning_rate))
        from inferbiomechanics_tpu.train.run_config import (
            warn_on_architecture_mismatch,
        )
        warn_on_architecture_mismatch(config, checkpoint_dir, 'predict')
        self.state, self.epoch, self.batch = load_latest_checkpoint(
            self.state, checkpoint_dir)
        lc = loss_config_from(config)

        batch_stats = self.state.batch_stats

        # fused Pallas encoder for vpu-trained transformer checkpoints
        # (~4% full-model serving win on TPU, BENCH_NOTES.md serving
        # table); opt-in because numerics differ at bf16-residual level
        use_fused = bool(getattr(config, 'fused_inference', False))
        if use_fused:
            from inferbiomechanics_tpu.models.transformer import (
                TransformerRegressor, fused_transformer_forward,
            )
            if not (isinstance(self.model, TransformerRegressor)
                    and self.model.attn_impl == 'vpu'
                    and self.model.d_model % 128 == 0):
                import logging
                logging.getLogger(__name__).warning(
                    '--fused-inference ignored: needs a vpu transformer '
                    'with d_model a multiple of 128')
                use_fused = False

        def model_fwd(params, x):
            if use_fused:
                return fused_transformer_forward(self.model, params, x)
            variables = {'params': params}
            if batch_stats:
                variables['batch_stats'] = batch_stats
            return self.model.apply(variables, x, train=False)

        # mirror test-time augmentation: symmetrize every prediction by
        # averaging with the un-mirrored prediction of the sagittally
        # mirrored window (same mechanics as analyze/serve --tta-mirror)
        if tta_mirror:
            from inferbiomechanics_tpu.train.augment import (
                spec_from_dataset, tta_average,
            )
            model_fwd = tta_average(
                spec_from_dataset(dataset,
                                  lateral_axis=getattr(
                                      config, 'mirror_lateral_axis', 2)),
                dataset.lab_offsets, model_fwd)

        def fwd(params, x, y_packed):
            out = model_fwd(params, x)
            labels = self.ds.unpack_labels(y_packed)
            # per-window loss: vmap the loss core over the batch dim
            def one(o, l):
                loss, _ = loss_and_metrics(
                    {k: v[None] for k, v in o.items()},
                    {k: v[None] for k, v in l.items()}, lc)
                return loss
            per_window = jax.vmap(one)(out, labels)
            return out, labels, per_window

        self._fwd = jax.jit(fwd)

    def predict_windows(self, idx: np.ndarray):
        """Forward pass on specific window indices (the live viewer's
        model-in-the-loop tick, parity visualize.py:157-180).
        Returns (outputs, labels, per_window_loss) as host arrays."""
        batch = self.ds.gather(np.asarray(idx))
        o, l, pw = self._fwd(self.state.params,
                             jnp.asarray(batch.inputs),
                             jnp.asarray(batch.labels))
        return jax.device_get(o), jax.device_get(l), np.asarray(pw)

    def predict_trial(self, subject_index: int, trial_index: int,
                      batch_size: int = 512) -> Optional[TrialPredictions]:
        """Predict every enumerated window of one trial."""
        ds = self.ds
        mask = ((ds.win_subject == subject_index) & (ds.win_trial == trial_index))
        idx = np.nonzero(mask)[0]
        if idx.size == 0:
            return None
        outs, labs, losses = [], [], []
        for i in range(0, idx.size, batch_size):
            batch = ds.gather(idx[i:i + batch_size])
            o, l, pw = self._fwd(self.state.params,
                                 jnp.asarray(batch.inputs),
                                 jnp.asarray(batch.labels))
            outs.append(jax.device_get(o))
            labs.append(jax.device_get(l))
            losses.append(np.asarray(pw))
        outputs = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
        labels = {k: np.concatenate([l[k] for l in labs]) for k in labs[0]}
        starts = ds.win_start[idx]
        last = starts + (ds.num_model_frames - 1) * ds.stride
        return TrialPredictions(
            window_starts=starts, last_frame=last, outputs=outputs,
            labels=labels, per_window_loss=np.concatenate(losses))

    def predict_forces_at_frames(self, pred: TrialPredictions):
        """(forces [N,3nb], cops [N,3nb]) at each window's last output frame,
        with the <30% force-share zeroing rule of visualize_file.py:267-277."""
        f = pred.outputs[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME][:, -1, :]
        c = pred.outputs[OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME][:, -1, :]
        nb = f.shape[-1] // 3
        fv = f.reshape(-1, nb, 3)
        mags = np.linalg.norm(fv, axis=-1)
        total = mags.sum(axis=1, keepdims=True) + 1e-9
        share = mags / total
        fv = np.where((share > 0.3)[..., None], fv, 0.0)
        return fv.reshape(f.shape), c
