"""Probe: what does on-device augmentation cost the headline train step?

train/augment.py compiles mirroring (one channel gather + sign multiply
+ per-sample select) and relative Gaussian noise into the train step.
Claim to verify on the real chip: the cost is launch-free (fused into
the existing program) and therefore a small fraction of the
launch-tax-bound step.

Three chained epoch runners, identical except the augmenter:
  a. baseline       — make_device_epoch_step(augment=None)
  b. mirror         — Augmenter(mirror=spec)
  c. mirror+noise   — Augmenter(mirror=spec, noise_std=0.02)

Measurement rules (BENCH_NOTES.md): chained scan programs, scalar
readback sync, best-of-3 groups. Run foreground on the real chip.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

from bench import _make_dataset, _make_state, TPU_BATCH  # noqa: E402
from inferbiomechanics_tpu.loss import LossConfig  # noqa: E402
from inferbiomechanics_tpu.train.augment import (Augmenter,  # noqa: E402
                                                 spec_from_dataset)
from inferbiomechanics_tpu.train.device_data import (  # noqa: E402
    TiledDeviceData, make_device_epoch_step,
)

STEPS_PER_CALL = 32
GROUPS = 3
CALLS_PER_GROUP = 4


def measure(run, state, seed):
    best = float('inf')
    for g in range(GROUPS):
        rng = jax.random.PRNGKey(seed + g)
        t0 = time.time()
        m = None
        for c in range(CALLS_PER_GROUP):
            state, m = run(state, jax.random.fold_in(rng, c))
        _ = float(m['loss'])                      # scalar readback sync
        dt = time.time() - t0
        best = min(best, dt / (CALLS_PER_GROUP * STEPS_PER_CALL))
    return best, state


def main():
    ds = _make_dataset()
    spec = spec_from_dataset(ds)
    data = TiledDeviceData(ds)
    variants = [
        ('baseline', None),
        ('mirror', Augmenter(mirror=spec)),
        ('mirror+noise', Augmenter(mirror=spec, noise_std=0.02)),
    ]
    results = {}
    for name, aug in variants:
        # fresh state per variant: the runner donates its state argument
        model, state0 = _make_state(ds, TPU_BATCH)
        run = make_device_epoch_step(model, data, LossConfig(), TPU_BATCH,
                                     steps_per_call=STEPS_PER_CALL,
                                     sample_windows=True, augment=aug)
        t0 = time.time()
        state, m = run(state0, jax.random.PRNGKey(0))
        _ = float(m['loss'])
        print(f'{name}: compile+first {time.time() - t0:.1f}s', flush=True)
        step_s, _ = measure(run, state, seed=7)
        wps = TPU_BATCH / step_s
        results[name] = (step_s, wps)
        print(f'{name}: {step_s * 1e3:.3f} ms/step = {wps / 1e6:.2f}M w/s',
              flush=True)
    base = results['baseline'][0]
    for name, (s, _) in results.items():
        print(f'{name}: {s / base:.3f}x baseline')


if __name__ == '__main__':
    main()
