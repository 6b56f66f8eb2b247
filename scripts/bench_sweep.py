"""TPU micro-benchmark: vmapped sweep cost vs sequential runs.

The pitch behind `main.py sweep` (train/sweep.py): the feedforward step
is launch/gather-bound, not FLOP-bound (BENCH_NOTES.md: 0.39 ms/step at
B=4096 vs a ~0.21 ms FLOP floor), so training K configs inside one
vmapped program should cost far less than K sequential runs — the
per-kernel launch tax and the batch gather are paid once for all K.

Measures the chained device-resident sweep epoch runner
(`make_sweep_device_epoch_step`, scan of 32 steps/program, on-device
index sampling, scalar readback) for K in {1, 2, 4, 8, 16} at B=4096
and reports ms/step, aggregate windows/s, and the speedup vs K
sequential K=1 runs.

Run foreground on the TPU:  python scripts/bench_sweep.py [B] [K,K,...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# Honor IB_PLATFORM=cpu|tpu before any jax use (same contract as main.py)
if os.environ.get('IB_PLATFORM'):
    import jax
    jax.config.update('jax_platforms', os.environ['IB_PLATFORM'])


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    ks = ([int(k) for k in sys.argv[2].split(',')] if len(sys.argv) > 2
          else [1, 2, 4, 8, 16])
    steps_per_call = 32
    calls = 4

    import jax
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.loss import LossConfig
    from inferbiomechanics_tpu.models import get_model
    from inferbiomechanics_tpu.train import make_optimizer
    from inferbiomechanics_tpu.train.device_data import TiledDeviceData
    from inferbiomechanics_tpu.train.sweep import (
        init_sweep_states, make_sweep_device_epoch_step,
    )

    tmp = '/tmp/ib_bench_sweep'
    os.makedirs(tmp, exist_ok=True)
    for i in range(2):
        p = os.path.join(tmp, f's{i}.b3d')
        if not os.path.exists(p):
            write_synthetic_subject(p, num_trials=2, trial_length=2100, seed=i)
    ds = WindowDataset(tmp, window_size=50, stride=5,
                       skip_loading_skeletons=True)
    t0 = time.time()
    data = TiledDeviceData(ds, seed_rows=256, pack_windows=True)
    float(np.asarray(data.win_base[0]))
    print(f'upload {data.upload_bytes/1e6:.1f} MB in {time.time()-t0:.0f}s',
          flush=True)

    model = get_model('feedforward', num_dofs=23, num_contact_bodies=2,
                      history_len=50, stride=5, root_history_len=10)
    tx = make_optimizer('rmsprop', 1.0)
    lc = LossConfig()
    sample = ds.gather(np.arange(min(B, 256)))
    import jax.numpy as jnp
    sample_inputs = jnp.asarray(
        np.tile(sample.inputs, (-(-B // sample.inputs.shape[0]), 1, 1))[:B])

    base_ms = None
    for k in ks:
        lrs = list(np.geomspace(1e-5, 1e-3, k))
        seeds = list(range(k))
        state = init_sweep_states(model, tx, sample_inputs, seeds)
        run = make_sweep_device_epoch_step(model, tx, data, lc, lrs, B,
                                           steps_per_call=steps_per_call)
        rng = jax.random.PRNGKey(0)
        t0 = time.time()
        # compile + TWO warm calls: the first executed program after a
        # fresh process start measures ~8x slow on this backend (observed
        # 4.0 vs 0.51 ms/step for identical K=1 programs back to back)
        state, m = run(state, rng)
        float(np.asarray(m['loss']).sum())
        state, m = run(state, jax.random.fold_in(rng, 99))
        float(np.asarray(m['loss']).sum())
        compile_s = time.time() - t0
        t0 = time.time()
        for c in range(calls):
            state, m = run(state, jax.random.fold_in(rng, c))
        loss = np.asarray(m['loss'])                  # readback = sync
        assert np.isfinite(loss).all()
        dt = time.time() - t0
        ms = dt / (calls * steps_per_call) * 1e3
        agg = calls * steps_per_call * B * k / dt
        if k == 1:
            base_ms = ms
        speedup = (k * base_ms / ms) if base_ms else float('nan')
        print(f'K={k:3d}: {ms:7.3f} ms/step  {agg/1e6:8.2f}M windows/s '
              f'aggregate  {speedup:5.2f}x vs {k} sequential runs '
              f'(compile {compile_s:.0f}s)', flush=True)


if __name__ == '__main__':
    main()
