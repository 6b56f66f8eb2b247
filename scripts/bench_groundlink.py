"""TPU micro-benchmark: GroundLink conv lowerings, end-to-end train step.

Times `make_device_train_step` (gather + fwd + loss + bwd + update,
donated-state chain + scalar readback) for conv_impl in {banded, xla}.
Addresses the round-2 finding that GroundLink ran at 5.73 ms/step
(B=4096) vs a ~0.9 ms FLOP floor (BENCH_NOTES.md): the banded lowering
turns each k=7/T=10 temporal conv into ONE dense MXU matmul.

Run foreground on the TPU:  python scripts/bench_groundlink.py [B] [impls]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    impls = sys.argv[2].split(',') if len(sys.argv) > 2 else ['banded', 'xla']

    import jax
    import jax.numpy as jnp
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.loss import LossConfig
    from inferbiomechanics_tpu.models import get_model
    from inferbiomechanics_tpu.train import create_train_state, make_optimizer
    from inferbiomechanics_tpu.train.device_data import (
        TiledDeviceData, make_device_train_step,
    )

    # small dataset: the axon tunnel uploads at ~10 MB/s on a GOOD day
    tmp = '/tmp/ib_bench_gl'
    os.makedirs(tmp, exist_ok=True)
    for i in range(2):
        p = os.path.join(tmp, f's{i}.b3d')
        if not os.path.exists(p):
            write_synthetic_subject(p, num_trials=2, trial_length=2100, seed=i)
    ds = WindowDataset(tmp, window_size=50, stride=5,
                       skip_loading_skeletons=True)
    t0 = time.time()
    # IB_PACK=1: window-major packed gather (same knob as --pack-windows)
    data = TiledDeviceData(ds, pack_windows=os.environ.get('IB_PACK') == '1')
    float(np.asarray(data.win_base[0]))
    print(f'upload {data.upload_bytes/1e6:.1f} MB in {time.time()-t0:.0f}s',
          flush=True)
    idx = jnp.asarray(np.random.default_rng(0).integers(
        0, data.num_windows, size=B), jnp.int32)
    rng = jax.random.PRNGKey(0)
    sample = ds.gather(np.arange(min(B, 256)))

    for impl in impls:
        model = get_model('groundlink', num_dofs=23, num_contact_bodies=2,
                          history_len=50, stride=5, root_history_len=10,
                          conv_impl=impl)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.asarray(sample.inputs),
                                   make_optimizer('adam', 1e-4))
        step = make_device_train_step(model, data, LossConfig())
        t0 = time.time()
        state, m = step(state, idx, rng)
        _ = float(m['loss'])   # scalar readback: the ONLY reliable sync on axon
        compile_s = time.time() - t0
        n = 50
        t0 = time.time()
        for _ in range(n):
            state, m = step(state, idx, rng)
        _ = float(m['loss'])
        dt = (time.time() - t0) / n
        print(f'{impl:8s} B={B}: {dt*1e3:8.2f} ms/step '
              f'({B/dt/1e3:9.1f}k windows/s)  compile {compile_s:.0f}s',
              flush=True)


if __name__ == '__main__':
    main()
