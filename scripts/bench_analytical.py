"""Measure the analytical baseline and the inverse-dynamics tau report
on the real chip — the two rigid-body hot paths that replace the
reference's per-(batch,timestep) C++ loops (AnalyticalBaseline.py:49-53,
RegressionLossEvaluator.py:270-285).

Timing rule (BENCH_NOTES): chained dispatch where state permits; every
number synced by a scalar readback.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject

BATCH = int(os.environ.get('IB_PROBE_BATCH', '1024'))
REPS = int(os.environ.get('IB_PROBE_REPS', '20'))


def main():
    tmp = '/tmp/ib_analytical_probe'
    os.makedirs(tmp, exist_ok=True)
    p = os.path.join(tmp, 's0.b3d')
    if not os.path.exists(p):
        write_synthetic_subject(p, num_trials=2, trial_length=2000, seed=0)
    ds = WindowDataset(tmp, window_size=50, stride=5)
    b = ds.gather(np.arange(BATCH) % len(ds))
    x = jnp.asarray(np.asarray(b.inputs, np.float32))

    # -- analytical baseline forward ------------------------------------
    from inferbiomechanics_tpu.models.analytical import make_analytical_fn
    predict = make_analytical_fn(ds)
    out = predict(x, b.subject_indices)
    k0 = next(iter(out))
    float(jnp.asarray(out[k0]).sum())          # compile + sync
    t = time.time()
    acc = 0.0
    for i in range(REPS):
        # chain via a data dependency: perturb inputs by the last scalar
        out = predict(x + acc * 1e-12, b.subject_indices)
        acc = float(jnp.asarray(
            out['groundContactForceInRootFrame']).sum())
    dt = (time.time() - t) / REPS
    wps = BATCH / dt
    print(f'analytical baseline forward: {dt*1e3:.2f} ms/batch({BATCH}) '
          f'= {wps/1e3:.0f}k windows/s', flush=True)

    # -- tau report (Lagrangian autodiff inverse dynamics) ---------------
    from inferbiomechanics_tpu.loss.tau_report import make_tau_report_fn
    tau_fn = make_tau_report_fn(ds)
    labels = ds.unpack_labels(jnp.asarray(np.asarray(b.labels, np.float32)))
    outputs = {k: jnp.asarray(v) for k, v in labels.items()}
    v = tau_fn(x, outputs, labels, b.subject_indices)   # compile + sync
    t = time.time()
    acc = 0.0
    for i in range(REPS):
        acc = tau_fn(x + acc * 1e-12, outputs, labels, b.subject_indices)
    dt = (time.time() - t) / REPS
    print(f'tau report (batched Lagrangian ID): {dt*1e3:.2f} ms/'
          f'batch({BATCH}) = {BATCH/dt/1e3:.0f}k windows/s '
          f'(value {acc:.4f})', flush=True)


if __name__ == '__main__':
    sys.exit(main())
