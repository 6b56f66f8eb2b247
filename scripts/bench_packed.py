"""TPU A/B: standard ~100-leaf TrainState step vs packed flat-buffer step.

Tests the round-2 hypothesis (BENCH_NOTES.md bisection) that per-output-
buffer overhead on the axon runtime accounts for most of the transformer
step's gap over its encoder fwd+bwd cost.

Run foreground on TPU:  python scripts/bench_packed.py [B]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    import jax
    import jax.numpy as jnp
    import os
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.loss import LossConfig
    from inferbiomechanics_tpu.models import get_model
    from inferbiomechanics_tpu.train import create_train_state, make_optimizer
    from inferbiomechanics_tpu.train.device_data import (
        DeviceResidentData, make_device_train_step,
    )
    from inferbiomechanics_tpu.train.packed import make_packed_device_train_step

    tmp = '/tmp/ib_bench_tf'
    os.makedirs(tmp, exist_ok=True)
    p = os.path.join(tmp, 's.b3d')
    if not os.path.exists(p):
        write_synthetic_subject(p, num_trials=4, trial_length=4000, seed=0)
    ds = WindowDataset(tmp, window_size=50, stride=5,
                       skip_loading_skeletons=True)
    data = DeviceResidentData(ds)
    idx = jnp.asarray(np.random.default_rng(0).integers(
        0, data.num_windows, B), jnp.int32)
    rng = jax.random.PRNGKey(0)
    sample = ds.gather(np.arange(256))
    model = get_model('transformer', num_dofs=23, num_contact_bodies=2,
                      history_len=50, stride=5, root_history_len=10)
    lc = LossConfig()

    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(sample.inputs),
                               make_optimizer('adam', 1e-4))
    n_leaves = len(jax.tree_util.tree_leaves(state.params)) + \
        len(jax.tree_util.tree_leaves(state.opt_state))
    print(f'state leaves: {n_leaves}')

    step = make_device_train_step(model, data, lc)
    t0 = time.time(); state, m = step(state, idx, rng); _ = float(m['loss'])
    c = time.time() - t0
    n = 30
    t0 = time.time()
    for _ in range(n):
        state, m = step(state, idx, rng)
    _ = float(m['loss'])
    print(f'standard step: {(time.time()-t0)/n*1e3:7.2f} ms (compile {c:.0f}s)',
          flush=True)

    template = create_train_state(model, jax.random.PRNGKey(0),
                                  jnp.asarray(sample.inputs),
                                  make_optimizer('adam', 1e-4))
    pack_state, pstep, _unpack = make_packed_device_train_step(
        model, data, lc, template)
    packed = pack_state(template)
    t0 = time.time(); packed, m = pstep(packed, idx, rng); _ = float(m['loss'])
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        packed, m = pstep(packed, idx, rng)
    _ = float(m['loss'])
    print(f'packed step  : {(time.time()-t0)/n*1e3:7.2f} ms (compile {c:.0f}s)')


if __name__ == '__main__':
    main()
