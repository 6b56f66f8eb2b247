"""TPU measurement: partial-denoising speedup on DDIM sampling.

Compares the full 50-step chain against partial_frac chains seeded by
an all-frames feedforward proposal (models/diffusion.py make_sampler
partial_frac; the proposal forward is included in the partial timing).
Timing rule (CLAUDE.md): chained programs, scalar readback closes every
measurement.

Run:  python scripts/bench_partial_denoise.py   (TPU; IB_PLATFORM=cpu ok)
"""

from __future__ import annotations

import os
import time

import numpy as np

if os.environ.get('IB_PLATFORM') == 'cpu':
    import jax
    jax.config.update('jax_platforms', 'cpu')

import jax
import jax.numpy as jnp

from inferbiomechanics_tpu.config import Config
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.models import get_model
from inferbiomechanics_tpu.models.diffusion import (
    DDPMSchedule, diffusion_targets_from_outputs, make_sampler,
)
from inferbiomechanics_tpu.train import create_train_state, make_optimizer
from inferbiomechanics_tpu.train.state import TrainState

B, WINDOW, STRIDE, STEPS, REPS = 1024, 50, 5, 50, 5


def main():
    d = '/tmp/ib_bench_partial'
    os.makedirs(os.path.join(d, 'dev'), exist_ok=True)
    p = os.path.join(d, 'dev', 's0.b3d')
    if not os.path.exists(p):
        write_synthetic_subject(p, num_trials=2, trial_length=3000, seed=7)
    ds = WindowDataset(os.path.join(d, 'dev'), WINDOW, stride=STRIDE,
                       output_data_format='all_frames',
                       skip_loading_skeletons=True)
    idx = np.arange(B) % len(ds)
    x = jnp.asarray(np.asarray(ds.gather(idx).inputs, np.float32))

    cfg = Config(window_size=WINDOW, stride=STRIDE)
    model = get_model('diffusion', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=WINDOW, stride=STRIDE,
                      root_history_len=ds.root_history_len,
                      output_data_format='all_frames',
                      d_model=cfg.d_model, num_layers=cfg.num_layers,
                      num_heads=cfg.num_heads)
    x0 = jnp.zeros((8, x.shape[1], model.target_channels))
    t0 = jnp.zeros((8,), jnp.int32)
    variables = model.init({'params': jax.random.PRNGKey(0)}, x0, t0, x[:8])
    tx = make_optimizer('adam', 1e-3)
    state = TrainState(step=jnp.asarray(0, jnp.int32),
                       params=variables['params'],
                       opt_state=tx.init(variables['params']),
                       batch_stats={}, tx=tx, apply_fn=model.apply)

    prop = get_model('feedforward', num_dofs=ds.num_dofs,
                     num_contact_bodies=ds.num_contact_bodies,
                     history_len=WINDOW, stride=STRIDE,
                     root_history_len=ds.root_history_len,
                     output_data_format='all_frames')
    pstate = create_train_state(prop, jax.random.PRNGKey(1), x[:8],
                                make_optimizer('adam', 1e-3))

    def timed(call):
        """call(seed) -> outputs dict. Reps chain through the rng seed
        (a scalar of each output folds into the next seed, same pattern
        as bench_diffusion_sampling.py) so the axon backend cannot
        overlap or defer reps; ONE scalar readback closes the chain."""
        def g(seed):
            out = call(seed)
            k = next(iter(out))
            return seed + (jnp.abs(out[k][0, 0, 0]) * 1e-12).astype(
                jnp.int32) + 1
        seed = g(jnp.asarray(0, jnp.int32))
        float(seed)   # compile + sync
        t = time.time()
        for _ in range(REPS):
            seed = g(seed)
        s = float(seed)   # scalar readback = real sync
        return (time.time() - t) / REPS, s

    full = make_sampler(model, DDPMSchedule(model.timesteps),
                        num_steps=STEPS)
    t_full, _ = timed(lambda seed: full(
        state.params, x, jax.random.PRNGKey(0x9E37 + seed)))
    print(f'full {STEPS}-step chain: {t_full*1e3:.1f} ms/batch '
          f'({B/t_full:.0f} windows/s)', flush=True)

    for frac in (0.5, 0.3, 0.1):
        part = make_sampler(model, DDPMSchedule(model.timesteps),
                            num_steps=STEPS, partial_frac=frac)

        @jax.jit
        def run(pp, dp, xx, seed, _part=part):
            # proposal fused into the sampling program — same single
            # dispatch the serve path compiles
            init = diffusion_targets_from_outputs(
                prop.apply({'params': pp}, xx, train=False))
            return _part(dp, xx, jax.random.PRNGKey(0x9E37 + seed), init)

        t_p, _ = timed(lambda seed: run(pstate.params, state.params, x,
                                        seed))
        print(f'partial frac={frac} ({max(1, round(STEPS*frac))} steps '
              f'+ proposal fwd): {t_p*1e3:.1f} ms/batch '
              f'({B/t_p:.0f} windows/s, {t_full/t_p:.2f}x)', flush=True)


if __name__ == '__main__':
    main()
