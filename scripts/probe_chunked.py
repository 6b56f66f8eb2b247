"""Measure chunked host dispatch (--host-chunk-steps) on the real chip.

The host-loader tier pays per step: one host->device upload + one
program dispatch over the axon tunnel (~100 ms RTT, 0.002-10 MB/s
observed). Chunking K batches into one upload + one K-step scan
amortizes the RTT by K; uploading INPUTS as bf16 halves the bytes
(numerically free: the model casts inputs to compute_dtype=bf16 anyway
— labels stay f32 because the loss consumes them at f32).

Timing rule (BENCH_NOTES): every measurement closed by a scalar
readback of metrics chained through the train state.
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
from inferbiomechanics_tpu.loss import LossConfig
from inferbiomechanics_tpu.models import get_model
from inferbiomechanics_tpu.train import (
    create_train_state, make_optimizer, make_train_step)
from inferbiomechanics_tpu.train.step import make_chunked_train_step

BATCH = int(os.environ.get('IB_PROBE_BATCH', '512'))
K = int(os.environ.get('IB_PROBE_CHUNK', '8'))
STEPS = int(os.environ.get('IB_PROBE_STEPS', '24'))   # multiple of K


def main():
    tmp = '/tmp/ib_chunk_probe'
    os.makedirs(tmp, exist_ok=True)
    p = os.path.join(tmp, 's0.b3d')
    if not os.path.exists(p):
        write_synthetic_subject(p, num_trials=2, trial_length=3000, seed=0)
    ds = WindowDataset(tmp, window_size=50, stride=5)
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=50, stride=5,
                      root_history_len=ds.root_history_len)
    rng = np.random.default_rng(0)
    batches = []
    for i in range(STEPS):
        idx = rng.integers(0, len(ds), BATCH)
        b = ds.gather(idx)
        batches.append((np.asarray(b.inputs, np.float32),
                        np.asarray(b.labels, np.float32)))
    state0 = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.asarray(batches[0][0][:2]),
                                make_optimizer('rmsprop', 1e-4))
    step = make_train_step(model, ds.lab_offsets, LossConfig(), donate=False)
    chunk = make_chunked_train_step(model, ds.lab_offsets, LossConfig(), K,
                                    donate=False)
    base = jax.random.PRNGKey(1)

    def run_per_step(in_dtype):
        state = state0
        # warm (compile) out of the timed region
        state, m = step(state, jnp.asarray(batches[0][0].astype(in_dtype)),
                        jnp.asarray(batches[0][1]), base)
        float(m['loss'])
        t = time.time()
        for i, (x, y) in enumerate(batches):
            state, m = step(state, jnp.asarray(x.astype(in_dtype)),
                            jnp.asarray(y), jax.random.fold_in(base, i))
        loss = float(m['loss'])          # chained scalar readback
        dt = time.time() - t
        return STEPS * BATCH / dt, loss

    def run_chunked(in_dtype):
        state = state0
        xs0 = np.stack([b[0] for b in batches[:K]]).astype(in_dtype)
        ys0 = np.stack([b[1] for b in batches[:K]])
        rngs = jnp.stack([jax.random.fold_in(base, i) for i in range(K)])
        state, ms = chunk(state, jnp.asarray(xs0), jnp.asarray(ys0), rngs)
        float(ms['loss'][-1])
        t = time.time()
        for c in range(STEPS // K):
            xs = np.stack([b[0] for b in batches[c * K:(c + 1) * K]]
                          ).astype(in_dtype)
            ys = np.stack([b[1] for b in batches[c * K:(c + 1) * K]])
            state, ms = chunk(state, jnp.asarray(xs), jnp.asarray(ys), rngs)
        loss = float(ms['loss'][-1])
        dt = time.time() - t
        return STEPS * BATCH / dt, loss

    for name, fn, dt_ in (
            ('per-step f32 upload', run_per_step, np.float32),
            ('per-step bf16-input upload', run_per_step, jnp.bfloat16),
            (f'chunked K={K} f32 upload', run_chunked, np.float32),
            (f'chunked K={K} bf16-input upload', run_chunked, jnp.bfloat16)):
        wps, loss = fn(dt_)
        print(f'{name}: {wps / 1e3:.1f}k windows/s (loss {loss:.4f})',
              flush=True)


if __name__ == '__main__':
    sys.exit(main())


def run_chunked_async(batches, chunk, base, in_dtype, state0, K, STEPS,
                      BATCH):
    """Per-batch ASYNC device_put (preserves upload/compute overlap) +
    one on-device stack + one K-step dispatch."""
    state = state0
    rngs = jnp.stack([jax.random.fold_in(base, i) for i in range(K)])

    def put(c):
        xs = [jax.device_put(b[0].astype(in_dtype))
              for b in batches[c * K:(c + 1) * K]]
        ys = [jax.device_put(b[1]) for b in batches[c * K:(c + 1) * K]]
        return jnp.stack(xs), jnp.stack(ys)

    xs0, ys0 = put(0)
    state, ms = chunk(state, xs0, ys0, rngs)
    float(ms['loss'][-1])
    t = time.time()
    for c in range(STEPS // K):
        xs, ys = put(c)
        state, ms = chunk(state, xs, ys, rngs)
    loss = float(ms['loss'][-1])
    dt = time.time() - t
    return STEPS * BATCH / dt, loss
