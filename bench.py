"""Benchmark: end-to-end training throughput on the current accelerator.

Prints ONE JSON line:
  {"metric": "train_windows_per_sec", "value": N, "unit": "windows/sec",
   "vs_baseline": R}

Measured quantity: full training pipeline windows/sec on the feedforward
baseline over a real (synthetic-subject) dataset — per-epoch shuffled
window indices, on-device window gather (train/device_data.py), forward
+ loss + metrics + backward + optimizer update, bf16 on the MXU.

The baseline is the PyTorch reference's equivalent training throughput
measured on this machine (BASELINE.md: the reference publishes no
numbers, so the build measures its own anchor). Because nimblephysics is
unavailable here, the torch baseline is the reference's *model compute
path only* (same MLP, same batch size 64 — train.py:56, same optimizer)
fwd+loss+bwd+step on CPU — an upper bound on the reference's real
throughput, which was additionally data-bound by per-window protobuf
decodes (SURVEY.md §3.5). Beating the generous bound understates the
true speedup.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

WINDOW, STRIDE, NUM_DOFS, RH, NB = 50, 5, 23, 10, 2
TPU_BATCH = 4096
SCAN_STEPS = 8            # train steps fused per dispatch
TORCH_BATCH = 64          # reference default (train.py:56-57)


def _make_dataset(tmp='/tmp/ib_bench_data'):
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    os.makedirs(tmp, exist_ok=True)
    for i in range(4):
        p = os.path.join(tmp, f's{i}.b3d')
        if not os.path.exists(p):
            write_synthetic_subject(p, num_trials=4, trial_length=4000, seed=i)
    return WindowDataset(tmp, window_size=WINDOW, stride=STRIDE,
                         skip_loading_skeletons=True)


def bench_jax(ds) -> float:
    import jax
    import jax.numpy as jnp
    from inferbiomechanics_tpu.loss import LossConfig
    from inferbiomechanics_tpu.models import get_model
    from inferbiomechanics_tpu.train import create_train_state, make_optimizer
    from inferbiomechanics_tpu.train.device_data import (
        DeviceResidentData, make_device_epoch_runner,
    )

    model = get_model('feedforward', num_dofs=NUM_DOFS, num_contact_bodies=NB,
                      history_len=WINDOW, stride=STRIDE, root_history_len=RH)
    sample = ds.gather(np.arange(TPU_BATCH))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(sample.inputs),
                               make_optimizer('rmsprop', 1e-4))
    data = DeviceResidentData(ds)
    run_epoch = make_device_epoch_runner(model, data, LossConfig(), TPU_BATCH)
    rng = jax.random.PRNGKey(1)
    n_steps = len(ds) // TPU_BATCH
    windows_per_epoch = n_steps * TPU_BATCH

    # warmup / compile. NOTE: a scalar readback (float()) is the only
    # reliable completion sync on the axon runtime — block_until_ready has
    # been observed to return before execution finishes, yielding
    # physically impossible timings (BENCH_NOTES.md "measurement rules").
    state, m = run_epoch(state, rng)
    float(m['loss'])

    epochs = 10
    t0 = time.time()
    for epoch in range(epochs):
        state, m = run_epoch(state, jax.random.fold_in(rng, epoch))
    float(m['loss'])
    return epochs * windows_per_epoch / (time.time() - t0)


def bench_torch_reference(ds) -> float:
    """Reference-equivalent MLP train throughput in torch on CPU."""
    import torch
    torch.manual_seed(0)
    c_in = ds.num_input_channels * (WINDOW // STRIDE)
    out_size = NB * 15
    model = torch.nn.Sequential(
        torch.nn.Linear(c_in, 512), torch.nn.Sigmoid(),
        torch.nn.Linear(512, 512), torch.nn.Sigmoid(),
        torch.nn.Linear(512, out_size))
    opt = torch.optim.RMSprop(model.parameters(), lr=1e-4)
    batch = ds.gather(np.arange(TORCH_BATCH))
    x = torch.tensor(batch.inputs.reshape(TORCH_BATCH, -1))
    y = torch.tensor(batch.labels[:, -1, :out_size])
    steps = 20
    for _ in range(3):
        opt.zero_grad(); loss = ((model(x) - y) ** 2).mean(); loss.backward(); opt.step()
    t0 = time.time()
    for _ in range(steps):
        opt.zero_grad()
        loss = ((model(x) - y) ** 2).mean()
        loss.backward()
        opt.step()
    dt = time.time() - t0
    return steps * TORCH_BATCH / dt


def main():
    # watchdog: the (experimental) axon TPU backend has been observed to
    # hang compiles for hours; rather than hang the driver, emit a
    # parseable failure line if the measurement doesn't finish in time.
    import threading
    deadline_s = int(os.environ.get('IB_BENCH_DEADLINE_S', '540'))
    result_box = {}

    def measure():
        ds = _make_dataset()
        result_box['jax'] = bench_jax(ds)
        try:
            result_box['torch'] = bench_torch_reference(ds)
        except Exception as e:
            print(f'torch baseline failed: {e}', file=sys.stderr)
            result_box['torch'] = None

    t = threading.Thread(target=measure, daemon=True)
    t.start()
    t.join(deadline_s)
    if 'jax' not in result_box:
        print(json.dumps({
            'metric': 'train_windows_per_sec', 'value': None,
            'unit': 'windows/sec', 'vs_baseline': None,
            'error': f'TPU backend unresponsive (> {deadline_s}s); '
                     f'see BENCH_NOTES.md for last good measurements',
        }))
        os._exit(1)
    jax_wps = result_box['jax']
    torch_wps = result_box.get('torch')
    result = {
        'metric': 'train_windows_per_sec',
        'value': round(jax_wps, 1),
        'unit': 'windows/sec',
        'vs_baseline': round(jax_wps / torch_wps, 2) if torch_wps else None,
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
