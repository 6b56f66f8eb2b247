"""Learning-quality anchors for the transformer and diffusion families.

Round-5 closure of the last unanchored model families. Feedforward and
GroundLink have head-to-head torch-vs-jax parity numbers
(scripts/parity_rmse.py, PARITY_RMSE.md); the transformer and diffusion
families CANNOT have a torch side — the reference's TransformerBaseline
is dead code written against a long-dead key schema
(/root/reference/src/models/TransformerBaseline.py:79-102, unreachable
from its model factory) and the diffusion denoiser only exists as a
gitignored launch-script name (SURVEY.md §7.6). So this study anchors
them against the MEASURED feedforward numbers on the SAME synthetic
split with the same shared numpy scoring (parity_rmse.dev_metrics):
trained to convergence with the framework's shipped defaults, both
families must land within ~1.2x the feedforward best-dev force error
(4.67 N/kg), or the gap must be attributed.

Transformer (BASELINE.json config #3): shipped defaults — d_model 256,
4 layers, 8 heads, vpu attention, aux tau/COM-acc/contact heads,
all_frames output — trained with the same rmsprop lr 1e-4 batch 64
protocol as the other anchors.

Diffusion (BASELINE.json config #4): shipped defaults — transformer
backbone (same dims), cosine DDPM schedule, 1000 timesteps — trained
with adam + EMA (--ema-decay 0.999) and classifier-free-guidance
dropout (--cond-dropout 0.1), then evaluated through the SHIPPED
sampling surfaces: 50-step DDIM (train/diffusion_loop.py
EVAL_SAMPLE_STEPS / cli/analyze_cmd.py:247), raw vs EMA params,
guidance scale 1 vs 2, mean-of-K uncertainty sampling
(analyze --diffusion-samples), and partial denoising from an
all-frames feedforward proposal (analyze --diffusion-partial).

Run on CPU:  IB_PLATFORM=cpu python scripts/anchor_quality.py \
                 --family transformer --seeds 0 1 2 --out /tmp/anchor_tf.json
             IB_PLATFORM=cpu python scripts/anchor_quality.py \
                 --family diffusion --seeds 0 1 2 --out /tmp/anchor_diff.json

Results land in PARITY_RMSE.md + BASELINE.json "measured".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import parity_rmse as P  # noqa: E402  (shared split + scoring)

DIFF_LR = 3e-4           # adam; standard diffusion practice (no ref config)
EMA_DECAY = 0.999
COND_DROPOUT = 0.1
GUIDANCE = 2.0
DDIM_STEPS = 50          # the shipped eval setting (diffusion_loop.py:37)
PARTIAL_FRAC = 0.3
MEAN_K = 8


def short_keys():
    from inferbiomechanics_tpu.data import keys as K
    return {'cops': K.OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME,
            'forces': K.OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME,
            'torques': K.OutputDataKeys.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME,
            'wrenches': K.OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME}


# ---------------------------------------------------------------------------
# Diffusion anchor
# ---------------------------------------------------------------------------

def train_proposal(ds, x_tr, y_tr, seed, epochs, schedule):
    """All-frames feedforward proposal for partial denoising (the model
    `analyze --diffusion-partial --init-checkpoint` loads)."""
    import jax
    import jax.numpy as jnp
    from inferbiomechanics_tpu.loss import LossConfig
    from inferbiomechanics_tpu.models import get_model
    from inferbiomechanics_tpu.train import (
        create_train_state, make_optimizer, make_train_step)

    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=P.WINDOW, stride=P.STRIDE,
                      root_history_len=ds.root_history_len,
                      hidden_dims=list(P.HIDDEN), activation='sigmoid',
                      output_data_format='all_frames')
    cfg = LossConfig(predict_grf_components=tuple(range(6)),
                     predict_cop_components=tuple(range(6)),
                     predict_moment_components=tuple(range(6)),
                     predict_wrench_components=tuple(range(12)))
    state = create_train_state(model, jax.random.PRNGKey(seed),
                               jnp.asarray(x_tr[:2]),
                               make_optimizer('rmsprop', P.LR))
    step = make_train_step(model, ds.lab_offsets, cfg, donate=False)
    x = jnp.asarray(x_tr)
    y = jnp.asarray(y_tr)
    rng = jax.random.PRNGKey(seed + 2000)
    it = 0
    for ep in range(epochs):
        for idx in schedule[ep % len(schedule)]:
            bi = jnp.asarray(idx.astype(np.int32))
            state, _ = step(state, x[bi], y[bi], jax.random.fold_in(rng, it))
            it += 1
    return model, jax.device_get(state.params)


def run_diffusion(ds, x_tr, y_tr, x_dev, lab_dev, seed, epochs, schedule,
                  eval_every, eval_subset, log=print):
    import jax
    import jax.numpy as jnp
    from inferbiomechanics_tpu.models import get_model
    from inferbiomechanics_tpu.models.diffusion import (
        DDPMSchedule, diffusion_targets_from_outputs,
        make_diffusion_train_step, make_sampler)
    from inferbiomechanics_tpu.train import create_train_state, make_optimizer

    model = get_model('diffusion', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=P.WINDOW, stride=P.STRIDE,
                      root_history_len=ds.root_history_len)
    sched = DDPMSchedule(model.timesteps)
    step = make_diffusion_train_step(model, ds.lab_offsets, sched,
                                     donate=False,
                                     cond_dropout=COND_DROPOUT)
    # init exactly as train/diffusion_loop.py does
    x0 = jnp.zeros((2, x_tr.shape[1], model.target_channels))
    t0 = jnp.zeros((2,), jnp.int32)
    variables = model.init({'params': jax.random.PRNGKey(seed)},
                           x0, t0, jnp.asarray(x_tr[:2]), train=False)
    tx = make_optimizer('adam', DIFF_LR)
    from inferbiomechanics_tpu.train.state import TrainState
    state = TrainState(step=jnp.asarray(0, jnp.int32),
                       params=variables['params'],
                       opt_state=tx.init(variables['params']),
                       batch_stats={}, tx=tx, apply_fn=model.apply)
    d = EMA_DECAY
    ema = jax.tree_util.tree_map(lambda a: a, state.params)
    ema_update = jax.jit(lambda e, p: jax.tree_util.tree_map(
        lambda a, b: a * d + b * (1.0 - d), e, p), donate_argnums=(0,))

    sampler = make_sampler(model, sched, num_steps=DDIM_STEPS)
    shorts = short_keys()

    def sample_metrics(params, xs, labs, rng, sampler_fn=None, init=None):
        fn = sampler_fn or sampler
        preds = []
        bs = 512
        for i in range(0, xs.shape[0], bs):
            args = [params, jnp.asarray(xs[i:i + bs]),
                    jax.random.fold_in(rng, i)]
            if init is not None:
                args.append(jnp.asarray(init[i:i + bs]))
            out = fn(*args)
            preds.append({k: np.asarray(out[full], np.float32)
                          for k, full in shorts.items()})
        pred = {k: np.concatenate([p[k] for p in preds]) for k in shorts}
        return P.dev_metrics(pred, labs)

    x = jnp.asarray(x_tr)
    y = jnp.asarray(y_tr)
    rng = jax.random.PRNGKey(seed + 1000)
    eval_rng = jax.random.PRNGKey(seed + 3000)
    sub = slice(0, eval_subset)
    lab_sub = {k: v[sub] for k, v in lab_dev.items()}

    best = {'force': float('inf'), 'epoch': -1, 'params': None, 'ema': None}
    curve = []
    it = 0
    t_start = time.time()
    for ep in range(epochs):
        for idx in schedule[ep % len(schedule)]:
            bi = jnp.asarray(idx.astype(np.int32))
            state, m = step(state, x[bi], y[bi], jax.random.fold_in(rng, it))
            ema = ema_update(ema, state.params)
            it += 1
        if (ep + 1) % eval_every == 0 or ep == epochs - 1:
            dm = sample_metrics(ema, x_dev[sub], lab_sub, eval_rng)
            dm['epoch'] = ep
            dm['train_loss'] = float(m['loss'])
            curve.append(dm)
            log(f'  ep {ep+1}/{epochs} loss {float(m["loss"]):.4f} '
                f'sub-dev force {dm["force_avg_err"]:.3f} '
                f'cop {dm["cop_avg_err"]:.4f} '
                f'({time.time()-t_start:.0f}s)', flush=True)
            if dm['force_avg_err'] < best['force']:
                best.update(force=dm['force_avg_err'], epoch=ep,
                            params=jax.device_get(state.params),
                            ema=jax.device_get(ema))
    out = {'curve': curve, 'best_epoch': best['epoch']}

    # final full-dev evaluation of every shipped sampling surface, on the
    # best-subset-dev snapshot (what --keep-best retains)
    bp, be = best['params'], best['ema']
    log('  final full-dev evals (best snapshot, epoch '
        f'{best["epoch"]+1})', flush=True)
    out['final'] = {}
    out['final']['raw_g1'] = sample_metrics(bp, x_dev, lab_dev, eval_rng)
    out['final']['ema_g1'] = sample_metrics(be, x_dev, lab_dev, eval_rng)
    cfg_sampler = make_sampler(model, sched, num_steps=DDIM_STEPS,
                               guidance_scale=GUIDANCE)
    out['final'][f'ema_g{GUIDANCE:g}'] = sample_metrics(
        be, x_dev, lab_dev, eval_rng, sampler_fn=cfg_sampler)

    # mean-of-K (analyze --diffusion-samples K): average K chains
    import jax
    vs = jax.jit(lambda p, c, r: jax.tree_util.tree_map(
        lambda *a: jnp.stack(a).mean(0),
        *[sampler(p, c, jax.random.fold_in(r, k)) for k in range(MEAN_K)]))
    out['final'][f'ema_mean{MEAN_K}'] = sample_metrics(
        be, x_dev, lab_dev, eval_rng, sampler_fn=vs)

    # partial denoising (analyze --diffusion-partial) from an all-frames
    # feedforward proposal trained on the same split/schedule
    prop_model, prop_params = train_proposal(ds, x_tr, y_tr, seed, 10,
                                             schedule)

    @jax.jit
    def propose(xb):
        return diffusion_targets_from_outputs(
            prop_model.apply({'params': prop_params}, xb, train=False))

    part_sampler = make_sampler(model, sched, num_steps=DDIM_STEPS,
                                partial_frac=PARTIAL_FRAC)
    init_full = np.concatenate(
        [np.asarray(propose(jnp.asarray(x_dev[i:i + 512])), np.float32)
         for i in range(0, x_dev.shape[0], 512)])
    out['final'][f'ema_partial{PARTIAL_FRAC:g}'] = sample_metrics(
        be, x_dev, lab_dev, eval_rng, sampler_fn=part_sampler,
        init=init_full)
    # the proposal itself, scored directly (context for the partial
    # row); init_full is in the NORMALIZED diffusion space, so scale
    # back to raw units for scoring
    from inferbiomechanics_tpu.models.diffusion import target_scales
    init_raw = init_full * np.asarray(target_scales(ds.num_contact_bodies))
    pred = {k: init_raw[..., o:o + w]
            for k, (o, w) in _target_slices(ds).items()}
    out['final']['proposal_ff'] = P.dev_metrics(pred, lab_dev)
    return out


def _target_slices(ds):
    """Head-slice order of diffusion_targets_from_labels: cops, forces,
    torques, wrenches — offsets within the packed target tensor."""
    sl, off = {}, 0
    nb = ds.num_contact_bodies
    widths = {'cops': 3 * nb, 'forces': 3 * nb, 'torques': 3 * nb,
              'wrenches': 6 * nb}
    for name in ('cops', 'forces', 'torques', 'wrenches'):
        sl[name] = (off, widths[name])
        off += widths[name]
    return sl


# ---------------------------------------------------------------------------

def main():
    if os.environ.get('IB_PLATFORM', 'cpu') == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')
    ap = argparse.ArgumentParser()
    ap.add_argument('--family', choices=('transformer', 'diffusion'),
                    required=True)
    ap.add_argument('--epochs', type=int, default=None,
                    help='default: 10 transformer / 40 diffusion')
    ap.add_argument('--seeds', type=int, nargs='+', default=[0, 1, 2])
    ap.add_argument('--eval-every', type=int, default=5)
    ap.add_argument('--eval-subset', type=int, default=512)
    ap.add_argument('--out', default='/tmp/anchor_quality.json')
    ap.add_argument('--data', default='/tmp/ib_parity_data_af')
    ap.add_argument('--trial-length', type=int, default=1500)
    args = ap.parse_args()
    epochs = args.epochs or (10 if args.family == 'transformer' else 40)

    ds_tr, ds_dev, x_tr, y_tr, x_dev, lab_dev, sl = P.build_study_data(
        args.data, args.trial_length, 'all_frames')
    print(f'train windows {len(ds_tr)}  dev windows {len(ds_dev)}  '
          f'input [{x_tr.shape[1]}x{x_tr.shape[2]}]', flush=True)

    results = {'config': {'family': args.family, 'window': P.WINDOW,
                          'stride': P.STRIDE, 'batch': P.BATCH,
                          'epochs': epochs, 'seeds': args.seeds,
                          'n_train': len(ds_tr), 'n_dev': len(ds_dev),
                          'trial_length': args.trial_length},
               'anchor_feedforward_best_force': 4.675,
               'runs': {}}
    if args.family == 'diffusion':
        results['config'].update(
            lr=DIFF_LR, opt='adam', ema_decay=EMA_DECAY,
            cond_dropout=COND_DROPOUT, guidance=GUIDANCE,
            ddim_steps=DDIM_STEPS, partial_frac=PARTIAL_FRAC,
            mean_k=MEAN_K)
    else:
        results['config'].update(lr=P.LR, opt='rmsprop')

    for seed in args.seeds:
        schedule = P.batch_schedule(len(ds_tr), seed, epochs)
        t0 = time.time()
        if args.family == 'transformer':
            curve = P.run_jax(ds_tr, x_tr, y_tr, x_dev, lab_dev, sl, seed,
                              epochs, schedule, model_type='transformer')
            best = min(curve, key=lambda c: c['force_avg_err'])
            results['runs'][str(seed)] = {'curve': curve,
                                          'best': best,
                                          'final': curve[-1]}
            print(f'seed {seed}: {time.time()-t0:.0f}s  best force '
                  f'{best["force_avg_err"]:.3f} cop {best["cop_avg_err"]:.4f} '
                  f'com {best["com_acc_avg_err"]:.3f}', flush=True)
        else:
            r = run_diffusion(ds_tr, x_tr, y_tr, x_dev, lab_dev, seed,
                              epochs, schedule, args.eval_every,
                              args.eval_subset)
            results['runs'][str(seed)] = r
            print(f'seed {seed}: {time.time()-t0:.0f}s  '
                  + '  '.join(f'{k}: force {v["force_avg_err"]:.3f}'
                              for k, v in r['final'].items()), flush=True)
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=1)
    print(f'wrote {args.out}')

    # cross-seed summary
    if args.family == 'transformer':
        for m in ('force_avg_err', 'cop_avg_err', 'com_acc_avg_err'):
            bv = [results['runs'][str(s)]['best'][m] for s in args.seeds]
            print(f'best {m}: mean {np.mean(bv):.4f} '
                  f'(range {min(bv):.4f}-{max(bv):.4f})')
    else:
        variants = results['runs'][str(args.seeds[0])]['final'].keys()
        for v in variants:
            for m in ('force_avg_err', 'cop_avg_err', 'com_acc_avg_err'):
                vals = [results['runs'][str(s)]['final'][v][m]
                        for s in args.seeds]
                print(f'{v} {m}: mean {np.mean(vals):.4f} '
                      f'(range {min(vals):.4f}-{max(vals):.4f})')


if __name__ == '__main__':
    sys.exit(main())
