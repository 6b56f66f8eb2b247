"""DDIM sampling throughput: vpu denoiser vs fused Pallas encoder.

Chained + scalar readback per the repo measurement rules (BENCH_NOTES.md):
each sampling call's rng is folded with a scalar read from the previous
call's output IN-JIT, so calls serialize on device; timing ends in a
float() readback.

Run foreground on TPU:  python scripts/bench_diffusion_sampling.py [B] [STEPS]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    import jax
    import jax.numpy as jnp
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.models.diffusion import (
        DDPMSchedule, DiffusionDenoiser, make_sampler,
    )
    from inferbiomechanics_tpu.data.keys import OutputDataKeys as O

    tmp = '/tmp/ib_bench_diff'
    os.makedirs(tmp, exist_ok=True)
    p = os.path.join(tmp, 's.b3d')
    if not os.path.exists(p):
        write_synthetic_subject(p, num_trials=2, trial_length=2000, seed=0)
    ds = WindowDataset(tmp, window_size=50, stride=5,
                       output_data_format='all_frames',
                       skip_loading_skeletons=True)
    batch = ds.gather(np.arange(B) % len(ds))
    cond = jnp.asarray(batch.inputs)

    model = DiffusionDenoiser(num_dofs=ds.num_dofs,
                              num_contact_bodies=ds.num_contact_bodies,
                              history_len=50, stride=5, d_model=256,
                              num_layers=4, num_heads=8, timesteps=1000)
    x0 = jnp.zeros((B, 10, model.target_channels))
    t0 = jnp.zeros((B,), jnp.int32)
    params = model.init({'params': jax.random.PRNGKey(0)}, x0, t0,
                        cond)['params']
    sched = DDPMSchedule(1000)

    for name, fused in (('vpu sampler', False), ('fused sampler', True)):
        sampler = make_sampler(model, sched, num_steps=steps,
                               fused_inference=fused)

        @jax.jit
        def g(seed):
            out = sampler(params, cond, jax.random.PRNGKey(0x9e37 + seed))
            f = out[O.GROUND_CONTACT_FORCES_IN_ROOT_FRAME]
            # fold a scalar of the output into the next seed: chains calls
            return seed + (jnp.abs(f[0, 0, 0]) * 1e-12).astype(jnp.int32) + 1

        tic = time.time()
        s = g(jnp.asarray(0, jnp.int32))
        _ = int(s)
        compile_s = time.time() - tic
        n = 5
        tic = time.time()
        for _ in range(n):
            s = g(s)
        _ = int(s)   # scalar readback = the only trustworthy sync on axon
        dt = (time.time() - tic) / n
        print(f'{name:14s}: {dt*1e3:8.1f} ms / {steps}-step sample '
              f'({B/dt/1e3:7.2f}k w/s) compile {compile_s:.0f}s', flush=True)


if __name__ == '__main__':
    main()
