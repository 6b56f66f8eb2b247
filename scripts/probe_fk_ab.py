"""A/B the vectorized vs unrolled FK on the analytical forward, same
process, same chip, same day — immune to axon backend variance (which
can swing absolute numbers 2x between captures; BENCH_NOTES).

Timing rule: chained dispatch, every number synced by a scalar readback.
"""

from __future__ import annotations

import copy
import os
import sys
import time

import numpy as np

import jax

if os.environ.get('IB_PLATFORM'):   # same pin as main.py (axon plugins
    jax.config.update('jax_platforms', os.environ['IB_PLATFORM'])
import jax.numpy as jnp

BATCH = int(os.environ.get('IB_PROBE_BATCH', '1024'))
REPS = int(os.environ.get('IB_PROBE_REPS', '20'))


def bench(predict, x, sidx):
    out = predict(x, sidx)
    k = 'groundContactForceInRootFrame'
    float(jnp.asarray(out[k]).sum())          # compile + sync
    t = time.time()
    acc = 0.0
    for _ in range(REPS):
        out = predict(x + acc * 1e-12, sidx)
        acc = float(jnp.asarray(out[k]).sum())
    return (time.time() - t) / REPS


def main():
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.models import analytical as A

    tmp = '/tmp/ib_analytical_probe'
    os.makedirs(tmp, exist_ok=True)
    p = os.path.join(tmp, 's0.b3d')
    if not os.path.exists(p):
        write_synthetic_subject(p, num_trials=2, trial_length=2000, seed=0)
    ds = WindowDataset(tmp, window_size=50, stride=5)
    b = ds.gather(np.arange(BATCH) % len(ds))
    x = jnp.asarray(np.asarray(b.inputs, np.float32))

    for label, fast in (('vectorized', True), ('unrolled', False)):
        orig_compile = A.compile_skeleton

        def patched(spec, _fast=fast, _orig=orig_compile):
            sk = copy.copy(_orig(spec))
            if _fast and not sk._can_vectorize:
                raise SystemExit('skeleton has couplings: no vectorized path')
            sk._fast_fk = _fast
            return sk

        A.compile_skeleton = patched
        try:
            predict = A.make_analytical_fn(ds)
            dt = bench(predict, x, b.subject_indices)
        finally:
            A.compile_skeleton = orig_compile
        print(f'{label}: {dt*1e3:.2f} ms/batch({BATCH}) '
              f'= {BATCH/dt/1e3:.0f}k windows/s', flush=True)


if __name__ == '__main__':
    sys.exit(main())
