"""Attribute the analytical-baseline cost on chip: full forward vs its
pieces (fk only, com-acceleration only) across batch sizes — separates
per-dispatch overhead (flat across B) from per-frame compute (linear in
B). Timing rule: chained dispatch, scalar-readback sync (BENCH_NOTES).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REPS = int(os.environ.get('IB_PROBE_REPS', '10'))


def timed(fn, *args):
    r = fn(*args)
    float(jnp.asarray(r).sum())        # compile + sync
    t = time.time()
    acc = 0.0
    for _ in range(REPS):
        r = fn(*(a + acc * 1e-12 if i == 0 else a
                 for i, a in enumerate(args)))
        acc = float(jnp.asarray(r).sum())
    return (time.time() - t) / REPS


def main():
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.models.analytical import make_analytical_fn

    tmp = '/tmp/ib_analytical_probe'
    os.makedirs(tmp, exist_ok=True)
    p = os.path.join(tmp, 's0.b3d')
    if not os.path.exists(p):
        write_synthetic_subject(p, num_trials=2, trial_length=2000, seed=0)
    ds = WindowDataset(tmp, window_size=50, stride=5)

    from inferbiomechanics_tpu.data import keys as K
    from inferbiomechanics_tpu.ops.skeleton import compile_skeleton
    from inferbiomechanics_tpu.data.synthetic import standard_skeleton
    skel = compile_skeleton(standard_skeleton())
    o_pos, w = ds.in_offsets[K.InputDataKeys.POS]
    o_vel, _ = ds.in_offsets[K.InputDataKeys.VEL]
    o_acc, _ = ds.in_offsets[K.InputDataKeys.ACC]

    fk_flat = jax.jit(lambda q: jax.vmap(skel.fk)(q)[1])
    acc_flat = jax.jit(lambda q, dq, ddq:
                       jax.vmap(skel.com_acceleration)(q, dq, ddq))

    for B in (1024, 4096):
        b = ds.gather(np.arange(B) % len(ds))
        x = jnp.asarray(np.asarray(b.inputs, np.float32))
        F = B * x.shape[1]
        q = x[..., o_pos:o_pos + w].reshape(F, w)
        dq = x[..., o_vel:o_vel + w].reshape(F, w)
        ddq = x[..., o_acc:o_acc + w].reshape(F, w)

        predict = make_analytical_fn(ds)
        key = K.OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
        full = timed(lambda xx: predict(xx, b.subject_indices)[key], x)
        fk_t = timed(fk_flat, q)
        acc_t = timed(acc_flat, q, dq, ddq)
        print(f'B={B}: full {full*1e3:.2f} ms ({B/full/1e3:.0f}k w/s) | '
              f'fk {fk_t*1e3:.2f} ms | com_acc {acc_t*1e3:.2f} ms',
              flush=True)


if __name__ == '__main__':
    sys.exit(main())
