"""Packed-gather epoch-runner batch scaling on the real chip.

Round 3 pinned the headline batch at 4096 partly because the bench
dataset (8.2k windows) cannot permute a 16k batch; sampling WITH
replacement has identical per-step work, so this probe scans B well
past the table size. Chained scan + scalar readback (BENCH_NOTES rules).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    ds = bench._make_dataset()
    from inferbiomechanics_tpu.loss import LossConfig
    from inferbiomechanics_tpu.train.device_data import (
        TiledDeviceData, make_device_train_step,
    )
    data = TiledDeviceData(ds, seed_rows=256, pack_windows=True)
    float(np.asarray(data.win_base[0]))
    n = data.num_windows

    for batch in (2048, 4096, 8192, 16384, 32768):
        model, state = bench._make_state(ds, min(batch, len(ds)))
        step = make_device_train_step(model, data, LossConfig(),
                                      donate=False)
        steps = max(8, (1 << 22) // batch)     # ~4M windows per timing
        rng = jax.random.PRNGKey(0)

        def run(state):
            def body(carry, i):
                st, key = carry
                key, k1, k2 = jax.random.split(key, 3)
                idx = jax.random.randint(k1, (batch,), 0, n, jnp.int32)
                st, m = step.__wrapped__(st, idx, k2) \
                    if hasattr(step, '__wrapped__') else step(st, idx, k2)
                return (st, key), m['loss']
            (st, _), losses = jax.lax.scan(body, (state, rng),
                                           jnp.arange(steps))
            return st, losses

        run_j = jax.jit(run)
        st, losses = run_j(state)       # compile
        float(losses[-1])
        t = time.time()
        st, losses = run_j(st)
        v = float(losses[-1])
        dt = time.time() - t
        print(f'B={batch}: {dt/steps*1e3:.3f} ms/step = '
              f'{steps*batch/dt/1e6:.2f}M windows/s ({steps} steps, '
              f'loss {v:.3f})', flush=True)


if __name__ == '__main__':
    sys.exit(main())
