"""A/B attribution probe for the COM-acc gap seen in scripts/parity_rmse.py:
isolates (a) rmsprop decay (torch alpha=0.99 vs optax default 0.9) and
(b) bf16 vs f32 compute, on one seed. See PARITY_RMSE.md for conclusions."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
os.environ.setdefault('IB_PLATFORM', 'cpu')

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from parity_rmse import (  # noqa: E402
    BATCH, LR, STRIDE, WINDOW, batch_schedule, dev_metrics, label_slices,
    slice_labels)
from inferbiomechanics_tpu.data import keys as K  # noqa: E402
from inferbiomechanics_tpu.data.dataset import WindowDataset  # noqa: E402
from inferbiomechanics_tpu.loss import LossConfig  # noqa: E402
from inferbiomechanics_tpu.models.feedforward import FeedForwardBaseline  # noqa: E402
from inferbiomechanics_tpu.train import (  # noqa: E402
    create_train_state, make_eval_step, make_train_step)

EPOCHS, SEED = 10, 0


def run(ds, x_tr, y_tr, x_dev, lab_dev, decay, dtype):
    model = FeedForwardBaseline(
        num_dofs=ds.num_dofs, num_contact_bodies=ds.num_contact_bodies,
        history_len=WINDOW, stride=STRIDE,
        root_history_len=ds.root_history_len,
        hidden_dims=(512, 512), activation='sigmoid', compute_dtype=dtype)
    cfg = LossConfig(predict_grf_components=tuple(range(6)),
                     predict_cop_components=tuple(range(6)),
                     predict_moment_components=tuple(range(6)),
                     predict_wrench_components=tuple(range(12)))
    tx = optax.rmsprop(LR, decay=decay)
    state = create_train_state(model, jax.random.PRNGKey(SEED),
                               jnp.asarray(x_tr[:2]), tx)
    step = make_train_step(model, ds.lab_offsets, cfg, donate=False)
    eval_step = make_eval_step(model, ds.lab_offsets, cfg)
    x, y, xd = jnp.asarray(x_tr), jnp.asarray(y_tr), jnp.asarray(x_dev)
    yd = jnp.zeros((x_dev.shape[0],) + y_tr.shape[1:], y.dtype)
    rng = jax.random.PRNGKey(SEED + 1000)
    schedule = batch_schedule(x_tr.shape[0], SEED, EPOCHS)
    short = {'cops': K.OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME,
             'forces': K.OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME,
             'torques': K.OutputDataKeys.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME,
             'wrenches': K.OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME}
    it = 0
    curve = []
    for ep in range(EPOCHS):
        for idx in schedule[ep]:
            bi = jnp.asarray(idx.astype(np.int32))
            state, _ = step(state, x[bi], y[bi], jax.random.fold_in(rng, it))
            it += 1
        preds = []
        for i in range(0, x_dev.shape[0], 512):
            outputs, _ = eval_step(state, xd[i:i + 512], yd[i:i + 512])
            preds.append({k: np.asarray(outputs[f], np.float32)
                          for k, f in short.items()})
        pred = {k: np.concatenate([p[k] for p in preds]) for k in short}
        curve.append(dev_metrics(pred, lab_dev))
    return curve


def main():
    data = '/tmp/ib_parity_data'
    ds_tr = WindowDataset(os.path.join(data, 'train'), window_size=WINDOW,
                          stride=STRIDE)
    ds_dev = WindowDataset(os.path.join(data, 'dev'), window_size=WINDOW,
                           stride=STRIDE)
    b_tr = ds_tr.gather(np.arange(len(ds_tr)))
    b_dev = ds_dev.gather(np.arange(len(ds_dev)))
    x_tr = np.asarray(b_tr.inputs, np.float32)
    y_tr = np.asarray(b_tr.labels, np.float32)
    x_dev = np.asarray(b_dev.inputs, np.float32)
    lab_dev = slice_labels(np.asarray(b_dev.labels, np.float32),
                           label_slices(ds_tr.lab_offsets))

    for name, decay, dtype in (
            ('baseline (decay .9, bf16)', 0.9, jnp.bfloat16),
            ('decay .99, bf16', 0.99, jnp.bfloat16),
            ('decay .9, f32', 0.9, jnp.float32),
            ('decay .99, f32', 0.99, jnp.float32)):
        curve = run(ds_tr, x_tr, y_tr, x_dev, lab_dev, decay, dtype)
        best_com = min(c['com_acc_avg_err'] for c in curve)
        best_f = min(c['force_avg_err'] for c in curve)
        last = curve[-1]
        print(f'{name}: best force {best_f:.3f} best com {best_com:.3f} | '
              f'final force {last["force_avg_err"]:.3f} '
              f'com {last["com_acc_avg_err"]:.3f} '
              f'cop {last["cop_avg_err"]:.4f}', flush=True)


if __name__ == '__main__':
    main()


# -- init-attribution variant: torch-default Linear init in flax ----------

def run_torch_init(ds, x_tr, y_tr, x_dev, lab_dev):
    """Same MLP, but torch's default Linear init (U(-k,k), k=1/sqrt(fan_in)
    for both kernel and bias) instead of flax lecun_normal/zeros."""
    import flax.linen as nn
    from inferbiomechanics_tpu.models.common import (
        output_head_size, pack_inputs, slice_output_heads)

    kinit = nn.initializers.variance_scaling(1. / 3., 'fan_in', 'uniform')

    class TorchInitMLP(nn.Module):
        @nn.compact
        def __call__(self, inputs, *, train=False):
            x = pack_inputs(inputs)
            b = x.shape[0]
            x = x.reshape(b, -1)
            dims = [512, 512, output_head_size(ds.num_contact_bodies, 1)]
            for i, h in enumerate(dims):
                fan_in = x.shape[-1]
                k = 1.0 / np.sqrt(fan_in)
                binit = nn.initializers.uniform(scale=2 * k)
                x = nn.Dense(h, kernel_init=kinit,
                             bias_init=lambda key, shape, dtype=jnp.float32:
                                 binit(key, shape, dtype) - k)(x)
                if i < len(dims) - 1:
                    x = nn.sigmoid(x)
            return slice_output_heads(x, ds.num_contact_bodies, 1)

    cfg = LossConfig(predict_grf_components=tuple(range(6)),
                     predict_cop_components=tuple(range(6)),
                     predict_moment_components=tuple(range(6)),
                     predict_wrench_components=tuple(range(12)))
    model = TorchInitMLP()
    tx = optax.rmsprop(LR, decay=0.99, eps=1e-8, eps_in_sqrt=False)
    state = create_train_state(model, jax.random.PRNGKey(SEED),
                               jnp.asarray(x_tr[:2]), tx)
    step = make_train_step(model, ds.lab_offsets, cfg, donate=False)
    eval_step = make_eval_step(model, ds.lab_offsets, cfg)
    x, y, xd = jnp.asarray(x_tr), jnp.asarray(y_tr), jnp.asarray(x_dev)
    yd = jnp.zeros((x_dev.shape[0],) + y_tr.shape[1:], y.dtype)
    rng = jax.random.PRNGKey(SEED + 1000)
    schedule = batch_schedule(x_tr.shape[0], SEED, EPOCHS)
    from inferbiomechanics_tpu.data import keys as K2
    short = {'cops': K2.OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME,
             'forces': K2.OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME,
             'torques': K2.OutputDataKeys.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME,
             'wrenches': K2.OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME}
    it = 0
    curve = []
    for ep in range(EPOCHS):
        for idx in schedule[ep]:
            bi = jnp.asarray(idx.astype(np.int32))
            state, _ = step(state, x[bi], y[bi], jax.random.fold_in(rng, it))
            it += 1
        preds = []
        for i in range(0, x_dev.shape[0], 512):
            outputs, _ = eval_step(state, xd[i:i + 512], yd[i:i + 512])
            preds.append({k: np.asarray(outputs[f], np.float32)
                          for k, f in short.items()})
        pred = {k: np.concatenate([p[k] for p in preds]) for k in short}
        curve.append(dev_metrics(pred, lab_dev))
    best = {m: min(c[m] for c in curve) for m in curve[0]}
    print(f'torch-init flax: best force {best["force_avg_err"]:.3f} '
          f'cop {best["cop_avg_err"]:.4f} com {best["com_acc_avg_err"]:.3f} | '
          f'final cop {curve[-1]["cop_avg_err"]:.4f}', flush=True)
