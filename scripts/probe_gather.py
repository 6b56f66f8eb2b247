"""Probe: is the window gather a cost in the feedforward epoch runner?

The headline step (train/device_data.py::make_device_epoch_step) gathers
B windows as [B,10] strided row indices -> jnp.take of B*10 rows of
C_in=177 bf16 channels (354 B each). Hypothesis: a window-major packed
layout ([num_windows, 10*C_in], one contiguous 3.5 KB row per window)
gathers the same bytes with 10x fewer, 10x larger rows and should be
closer to HBM speed-of-light. Cost: ~window/stride x the resident HBM
(frames are shared between overlapping windows), so it can only be an
opt-in tier for datasets that fit.

Three chained runners, identical train math (fwd+loss+bwd+rmsprop at
B=4096), differing ONLY in how the batch is produced:
  a. baseline  — strided gather (the current headline path)
  b. nogather  — a fixed resident [B,10,C] batch (zero gather cost bound)
  c. packed    — one take from the pre-packed window-major matrix

Measurement rules (BENCH_NOTES.md): chained scan programs, scalar
readback sync, best-of-3 groups. Run foreground on the real chip.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')

from bench import _make_dataset, _make_state, TPU_BATCH  # noqa: E402
from inferbiomechanics_tpu.data.dataset import unpack  # noqa: E402
from inferbiomechanics_tpu.loss import LossConfig  # noqa: E402
from inferbiomechanics_tpu.loss.evaluator import loss_and_metrics  # noqa: E402
from inferbiomechanics_tpu.train.device_data import TiledDeviceData  # noqa: E402

STEPS_PER_CALL = 32


def make_runner(model, data, batch, mode: str):
    """Chained scan runner; `mode` picks the batch-producing path."""
    loss_config = LossConfig()
    t_frames = data.num_model_frames
    offs = jnp.arange(t_frames, dtype=jnp.int32) * data.stride
    if mode == 'packed':
        # packed ON DEVICE by _pack_windows (pack_windows=True in main)
        # — a host repack here would round-trip the feature matrix over
        # the slow axon tunnel before measuring anything
        packed = data.features_packed                            # [N,10*C]
        c_in = data.features_all.shape[1]
    if mode == 'nogather':
        fixed_idx = jnp.arange(batch, dtype=jnp.int32) % data.num_windows
        base = data.win_base[fixed_idx]
        fixed_inputs = jnp.take(data.features_all,
                                base[:, None] + offs[None, :], axis=0)

    def one(carry, _):
        state, rng = carry
        rng, sub, ridx = jax.random.split(rng, 3)
        idx = jax.random.randint(ridx, (batch,), 0, data.num_windows,
                                 dtype=jnp.int32)
        base = data.win_base[idx]
        if mode == 'baseline':
            batch_inputs = jnp.take(data.features_all,
                                    base[:, None] + offs[None, :], axis=0)
        elif mode == 'packed':
            batch_inputs = packed[idx].reshape(batch, t_frames, c_in)
        else:
            batch_inputs = fixed_inputs
        last = base + (data.num_model_frames - 1) * data.stride
        batch_labels = jnp.take(data.labels_all, last[:, None], axis=0)
        labels = unpack(batch_labels, data.lab_offsets)

        def loss_fn(params):
            outputs = model.apply({'params': params}, batch_inputs,
                                  train=True, rngs={'dropout': sub})
            loss, metrics = loss_and_metrics(outputs, labels, loss_config)
            return loss, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return (state, rng), metrics

    def run(state, rng):
        (state, _), m = jax.lax.scan(one, (state, rng), None,
                                     length=STEPS_PER_CALL)
        return state, jax.tree_util.tree_map(lambda x: x.mean(0), m)

    return jax.jit(run, donate_argnums=(0,))


def main():
    ds = _make_dataset()
    data = TiledDeviceData(ds, pack_windows=True)
    float(np.asarray(data.win_base[0]))
    batch = TPU_BATCH
    for mode in ('baseline', 'nogather', 'packed'):
        model, state = _make_state(ds, batch)
        run = make_runner(model, data, batch, mode)
        rng = jax.random.PRNGKey(1)
        t0 = time.time()
        state, m = run(state, rng)            # compile + warm
        loss = float(m['loss'])
        compile_s = time.time() - t0
        best = 0.0
        for g in range(3):
            t0 = time.time()
            for c in range(6):
                state, m = run(state, jax.random.fold_in(rng, g * 100 + c))
            loss = float(m['loss'])           # readback sync
            assert np.isfinite(loss)
            best = max(best, 6 * STEPS_PER_CALL * batch / (time.time() - t0))
        ms_step = batch / best * 1000
        print(f'{mode:9s}: {best/1e6:.2f}M w/s  {ms_step:.3f} ms/step  '
              f'(compile {compile_s:.0f}s)', flush=True)


if __name__ == '__main__':
    main()
