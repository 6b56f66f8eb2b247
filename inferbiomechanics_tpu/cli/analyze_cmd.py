"""``analyze`` subcommand.

Capability parity: reference ``src/cli/analyze.py`` — evaluate the latest
checkpoint (or the analytical baseline) over the dev split then the train
split, append per-window rows to ``{checkpoint_dir}/dev_analysis.csv`` /
``train_analysis.csv`` (subject, trial, per-batch metrics), print + log
the aggregate report every 1000 batches and at the end (ref :112-240).
Defaults mirror analyze.py:44-47: GRF loss on the vertical component
only, everything else off.

TPU note: the reference fixes batch_size=1; here ``--batch-size``
defaults to 1 for row-level parity but any size works — rows are then
written per batch.
"""

from __future__ import annotations

import argparse
import csv
import logging
import os

import jax
import numpy as np

from inferbiomechanics_tpu.config import add_config_flags, config_from_args, Config
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.loss import RegressionLossEvaluator
from inferbiomechanics_tpu.train import (
    create_train_state, load_latest_checkpoint, make_eval_step, make_optimizer,
)
from inferbiomechanics_tpu.train.loop import build_model_for_dataset, loss_config_from
from inferbiomechanics_tpu.utils.wandb_compat import MetricLogger


class AnalyzeCommand:
    name = 'analyze'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'analyze', help='Evaluate a model checkpoint over dev and train splits')
        defaults = Config(predict_grf_components=[1],
                          predict_cop_components=[],
                          predict_moment_components=[],
                          predict_wrench_components=[],
                          batch_size=1)
        add_config_flags(parser, defaults)
        from inferbiomechanics_tpu.train.run_config import add_run_config_flag
        add_run_config_flag(parser)
        parser.add_argument('--plot-errors', action='store_true',
                            help='Write per-component GRF error PNGs '
                                 '(ref analyze=True path)')
        parser.add_argument('--plot-path-root', type=str, default='outputs/plots')
        parser.add_argument('--checkpoint-file', type=str, default=None,
                            help='Evaluate this specific checkpoint (e.g. '
                                 'the --keep-best best.ckpt) instead of the '
                                 'latest epoch_* one')
        parser.add_argument('--quantize', type=str, default=None,
                            choices=['int8'],
                            help='Evaluate the int8-quantized forward '
                                 '(feedforward; ops/quant.py) — quantifies '
                                 'the accuracy cost of serve --quantize on '
                                 'the standard metrics')
        parser.add_argument('--use-ema', action='store_true',
                            help='Diffusion: evaluate the checkpoint\'s EMA '
                                 'parameter tree (written by train '
                                 '--ema-decay) instead of the raw params')
        parser.add_argument('--ensemble', type=str, nargs='+', default=None,
                            metavar='CKPT',
                            help='Evaluate the MEAN of several checkpoints '
                                 '(dirs or .ckpt files, e.g. a seed sweep\'s '
                                 'outputs) — quantifies what ensembling '
                                 'buys on the dev metrics')
        parser.add_argument('--tta-mirror', action='store_true',
                            help='Mirror test-time augmentation: average '
                                 'each prediction with the un-mirrored '
                                 'prediction of the sagittally-mirrored '
                                 'window (one extra forward in the same '
                                 'compiled program)')
        parser.add_argument('--diffusion-partial', type=float, default=None,
                            help='Partial denoising: start each DDIM '
                                 'chain at FRAC of the schedule from a '
                                 'proposal model prediction instead of '
                                 'pure noise (Falcon-style warm start; '
                                 'needs --init-checkpoint)')
        parser.add_argument('--init-checkpoint', type=str, default=None,
                            help='Checkpoint dir of an ALL-FRAMES '
                                 'feedforward proposal model used to '
                                 'seed --diffusion-partial chains')
        parser.add_argument('--eval-chunk-steps', type=int, default=64,
                            help='Evaluate K batches per device dispatch '
                                 '(one lax.scan program; metrics drain in '
                                 'one transfer). The reference dispatches '
                                 'one forward per window at its fixed '
                                 'batch_size=1. 1 = per-batch dispatch. '
                                 'Applies to the learned-model eval path '
                                 'and to --model-type analytical (where '
                                 'it also chunks the --compute-report '
                                 'tau core); ignored on the diffusion/'
                                 'quantized/ensemble/--plot-errors paths '
                                 'and on learned --compute-report')
        parser.add_argument('--bootstrap', type=int, default=0,
                            help='Resample the per-window rows N times and '
                                 'print 95%% confidence intervals on the '
                                 'mean loss / force / COM-acc errors '
                                 '(exact at --batch-size 1)')
        parser.add_argument('--group-by', type=str, default=None,
                            choices=['trial', 'subject', 'activity'],
                            help='Also write {split}_summary_{group}.csv: '
                                 'per-group window counts and mean loss / '
                                 'force / COM-acc errors, worst first '
                                 '(activity = make-plots keyword classes). '
                                 'Exact at --batch-size 1; larger batches '
                                 'attribute each window its batch mean.')

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'analyze':
            return False
        from inferbiomechanics_tpu.train.run_config import (
            use_run_config_if_requested,
        )
        config = use_run_config_if_requested(config_from_args(args), args)
        if getattr(args, 'ensemble', None) and config.model_type in (
                'analytical', 'diffusion'):
            raise SystemExit(f'analyze --ensemble supports learned '
                             f'regression models; --model-type '
                             f'{config.model_type} has its own evaluation '
                             f'path and would silently ignore the ensemble')
        if (getattr(args, 'use_ema', False)
                and config.model_type != 'diffusion'):
            raise SystemExit('analyze --use-ema applies to diffusion '
                             'checkpoints (train --ema-decay); '
                             f'--model-type {config.model_type} would '
                             'silently evaluate the raw params')
        if (getattr(args, 'quantize', None)
                and config.model_type != 'feedforward'):
            raise SystemExit('analyze --quantize int8 currently supports '
                             'the feedforward family only (like serve '
                             'and export)')
        if (getattr(args, 'diffusion_partial', None) is not None
                and config.model_type != 'diffusion'):
            raise SystemExit('analyze --diffusion-partial applies to '
                             f'--model-type diffusion; --model-type '
                             f'{config.model_type} would silently evaluate '
                             'without the warm start')
        if (getattr(args, 'init_checkpoint', None)
                and getattr(args, 'diffusion_partial', None) is None):
            raise SystemExit('analyze --init-checkpoint only does something '
                             'with --diffusion-partial (it seeds the '
                             'truncated DDIM chains)')
        checkpoint_dir = os.path.join(os.path.abspath(config.checkpoint_dir),
                                      config.model_type)
        from inferbiomechanics_tpu.train.run_config import (
            warn_on_architecture_mismatch,
        )
        warn_on_architecture_mismatch(config, checkpoint_dir, 'analyze')

        ml = MetricLogger(config=vars(args), enabled=not config.no_wandb)
        lc = loss_config_from(config)

        for split in ('dev', 'train'):
            ds = WindowDataset(os.path.join(config.dataset_home, split),
                               window_size=config.window_size,
                               stride=config.stride,
                               output_data_format=config.output_data_format,
                               testing_with_short_dataset=config.short,
                               trial_filter=config.trial_filter,
                               skip_loading_skeletons=(
                                   config.model_type != 'analytical'
                                   and not config.compute_report))
            if len(ds) == 0:
                print(f'{split}: no windows, skipping')
                continue
            # surface skeleton approximations ONCE per run wherever they
            # could bias the reported numbers (tau report / analytical
            # FK) — a wrong knee kinematic must never be silent
            needs_skels = (config.compute_report
                           or config.model_type == 'analytical')
            if needs_skels:
                approx = sorted({w for sk in getattr(ds, 'skeletons', [])
                                 if sk is not None
                                 for w in sk.fidelity_warnings})
                for w in approx:
                    logging.warning(
                        'skeleton approximation (may bias the tau report / '
                        'analytical baseline): %s', w)
            tau_fn = None
            if config.compute_report:
                from inferbiomechanics_tpu.loss.tau_report import make_tau_report_fn
                tau_fn = make_tau_report_fn(ds)
            evaluator = RegressionLossEvaluator(split, lc, tau_fn=tau_fn,
                                                wandb_logger=ml)

            if config.model_type == 'analytical':
                from inferbiomechanics_tpu.models.analytical import make_analytical_fn
                predict = make_analytical_fn(ds)
                eval_fn = None
            elif config.model_type == 'diffusion':
                # evaluate by SAMPLING the denoiser and scoring with the
                # standard regression metrics (see train/diffusion_loop.py)
                import jax.numpy as jnp
                from inferbiomechanics_tpu.models.diffusion import (
                    DDPMSchedule, DiffusionDenoiser, make_sampler,
                )
                from inferbiomechanics_tpu.train.state import TrainState
                if config.output_data_format != 'all_frames':
                    raise ValueError('analyze --model-type diffusion requires '
                                     '--output-data-format all_frames')
                model = DiffusionDenoiser(
                    num_dofs=ds.num_dofs,
                    num_contact_bodies=ds.num_contact_bodies,
                    history_len=config.window_size, stride=config.stride,
                    d_model=config.d_model, num_layers=config.num_layers,
                    num_heads=config.num_heads,
                    timesteps=config.diffusion_timesteps,
                    attn_impl=config.attn_impl)
                sample_b = ds.gather(np.arange(min(config.batch_size, len(ds))))
                x_cond = jax.numpy.asarray(sample_b.inputs)
                x0 = jnp.zeros((x_cond.shape[0], x_cond.shape[1],
                                model.target_channels))
                t0 = jnp.zeros((x_cond.shape[0],), jnp.int32)
                variables = model.init({'params': jax.random.PRNGKey(0)},
                                       x0, t0, x_cond)
                tx = make_optimizer(config.opt_type, config.learning_rate)
                state = TrainState(step=jnp.asarray(0, jnp.int32),
                                   params=variables['params'],
                                   opt_state=tx.init(variables['params']),
                                   batch_stats={}, tx=tx, apply_fn=model.apply)
                if getattr(args, 'checkpoint_file', None):
                    from inferbiomechanics_tpu.train.checkpoint import load_checkpoint_file
                    state, epoch, _b = load_checkpoint_file(state, args.checkpoint_file)
                else:
                    state, epoch, _b = load_latest_checkpoint(state, checkpoint_dir)
                    if epoch < 0:
                        print(f'WARNING: no checkpoint found in {checkpoint_dir}')
                if getattr(args, 'use_ema', False):
                    from inferbiomechanics_tpu.train.checkpoint import (
                        require_ema_params, resolve_checkpoint_path,
                    )
                    path = (args.checkpoint_file
                            or resolve_checkpoint_path(checkpoint_dir))
                    try:
                        ema = require_ema_params(path, state.params)
                    except ValueError as e:
                        raise SystemExit(str(e))
                    state = state.replace(params=ema)
                    print('evaluating EMA parameters')
                partial = getattr(args, 'diffusion_partial', None)
                from inferbiomechanics_tpu.models.diffusion import (
                    checkpoint_target_space,
                )
                tspace = checkpoint_target_space(checkpoint_dir)
                sampler = make_sampler(model, DDPMSchedule(config.diffusion_timesteps),
                                       num_steps=50,
                                       fused_inference=config.fused_inference,
                                       guidance_scale=config.guidance_scale,
                                       partial_frac=partial,
                                       target_space=tspace)
                if config.guidance_scale != 1.0:
                    print(f'classifier-free guidance scale '
                          f'{config.guidance_scale}')
                if partial is not None:
                    # partial denoising: seed every chain with an
                    # all-frames feedforward proposal (models/diffusion.py
                    # make_sampler partial_frac)
                    from inferbiomechanics_tpu.models.diffusion import (
                        make_partial_proposal_fn,
                    )
                    try:
                        propose = make_partial_proposal_fn(
                            config, ds, getattr(args, 'init_checkpoint',
                                                None), sample_b.inputs,
                            target_space=tspace)
                    except ValueError as e:
                        raise SystemExit(str(e))

                    # ONE jitted program per batch: the proposal forward
                    # fuses into the sampling chain (analyze defaults to
                    # --batch-size 1, so per-launch tax dominates here)
                    @jax.jit
                    def _predict_partial(x):
                        return sampler(state.params, x,
                                       jax.random.PRNGKey(7), propose(x))

                    print(f'partial denoising from {args.init_checkpoint} '
                          f'at frac {partial}')
                    predict = lambda x, _s: _predict_partial(x)
                else:
                    predict = lambda x, _s: sampler(state.params, x,
                                                    jax.random.PRNGKey(7))
                eval_fn = None
            elif getattr(args, 'ensemble', None):
                # ensemble mean via the serving path's vmapped forward
                # (serve.py): one compiled forward evaluates every member
                from inferbiomechanics_tpu.serve import InferenceService
                svc = InferenceService(config, checkpoint_dir, ds,
                                       max_batch=max(config.batch_size, 1),
                                       ensemble=args.ensemble,
                                       tta_mirror=getattr(args, 'tta_mirror',
                                                          False))
                print(f'ensemble of {len(svc.members)}: '
                      + ', '.join(m['path'] for m in svc.members))
                if svc.tta_mirror:
                    print('mirror test-time augmentation enabled '
                          '(per ensemble member)')
                predict = lambda x, _s: svc.predict_packed(np.asarray(x))
                eval_fn = None
            else:
                model = build_model_for_dataset(config, ds)
                sample = ds.gather(np.arange(min(config.batch_size, len(ds))))
                state = create_train_state(
                    model, jax.random.PRNGKey(0),
                    jax.numpy.asarray(sample.inputs),
                    make_optimizer(config.opt_type, config.learning_rate))
                if getattr(args, 'checkpoint_file', None):
                    from inferbiomechanics_tpu.train.checkpoint import load_checkpoint_file
                    state, epoch, batch = load_checkpoint_file(state, args.checkpoint_file)
                else:
                    state, epoch, batch = load_latest_checkpoint(state, checkpoint_dir)
                    if epoch < 0:
                        print(f'WARNING: no checkpoint found in {checkpoint_dir}; '
                              f'evaluating a fresh model')
                if getattr(args, 'quantize', None):
                    from inferbiomechanics_tpu.ops.quant import (
                        quantized_feedforward_forward,
                    )
                    qfwd = jax.jit(quantized_feedforward_forward(
                        model, jax.device_get(state.params)))
                    predict = lambda x, _s: qfwd(x)
                    eval_fn = None
                    print('evaluating int8-quantized forward')
                else:
                    eval_fn = make_eval_step(model, ds.lab_offsets, lc)

            if getattr(args, 'tta_mirror', False) and not getattr(
                    args, 'ensemble', None):
                if eval_fn is None:
                    raise SystemExit('--tta-mirror supports the learned-'
                                     'model eval paths (not '
                                     'analytical/diffusion/quantized)')
                from inferbiomechanics_tpu.train.augment import (
                    make_tta_eval_step, spec_from_dataset,
                )
                spec = spec_from_dataset(
                    ds, lateral_axis=config.mirror_lateral_axis)
                eval_fn = make_tta_eval_step(model, ds.lab_offsets, lc, spec)
                print('mirror test-time augmentation enabled')

            csv_path = os.path.join(checkpoint_dir, f'{split}_analysis.csv')
            os.makedirs(checkpoint_dir, exist_ok=True)
            group_by = getattr(args, 'group_by', None)
            groups = {}      # key -> [n, sum_loss, sum_force, sum_com_acc]
            n_boot = int(getattr(args, 'bootstrap', 0) or 0)
            boot_rows = []   # per-window [loss, force, com_acc] rows
            # chunked eval (parity note: the reference fixes batch_size=1
            # and dispatches one forward per window, analyze.py:112-240 —
            # per-dispatch latency dominates; here K batches run as ONE
            # lax.scan program and their metrics drain in one device_get,
            # exactly the train-side --device-chunk-steps treatment)
            eval_chunk = max(1, int(getattr(args, 'eval_chunk_steps', 1)
                                    or 1))
            # the analytical baseline chunks too (round 5): predict and
            # the tau report both have traceable cores, so K batches of
            # 12-joint FK + nested-jvp ID run as ONE scan program — the
            # per-dispatch tax (~40-90 ms on the axon tunnel) dominated
            # this path (scripts/probe_analytical_floor.py: 4x batch =
            # +15% wall)
            ana_chunks = (eval_chunk > 1 and config.model_type == 'analytical'
                          and not getattr(args, 'plot_errors', False))
            use_chunks = ana_chunks or (
                eval_chunk > 1 and eval_fn is not None
                and not config.compute_report
                and not getattr(args, 'plot_errors', False))

            with open(csv_path, 'a', newline='') as f:
                writer = csv.writer(f)

                def emit_rows(i, batch, metrics):
                    """Per-batch bookkeeping: CSV rows, bootstrap rows,
                    group sums, progress reports. `metrics` may be device
                    or host arrays."""
                    for b in range(batch.inputs.shape[0]):
                        s_idx = int(batch.subject_indices[b])
                        subj = os.path.basename(ds.subject_paths[s_idx])
                        trial = ds.subjects[s_idx].getTrialName(
                            int(batch.trial_indices[b]))
                        row = [float(metrics['loss']),
                               float(metrics['force_avg_err']),
                               float(metrics['com_acc_avg_err'])]
                        writer.writerow([subj, trial] + row)
                        if n_boot:
                            boot_rows.append(row)
                        if group_by:
                            if group_by == 'trial':
                                key = f'{subj}/{trial}'
                            elif group_by == 'subject':
                                key = subj
                            else:
                                from inferbiomechanics_tpu.cli.make_plots_cmd import (
                                    classify_motion,
                                )
                                key = classify_motion(trial)
                            g = groups.setdefault(key, [0, 0.0, 0.0, 0.0])
                            g[0] += 1
                            for j, v in enumerate(row):
                                g[1 + j] += v
                    if i > 0 and i % 1000 == 0:
                        print(f'[{split}] batch {i}:')
                        evaluator.print_report(reset=False, log_to_wandb=True)

                if use_chunks:
                    import jax.numpy as jnp
                    from jax import lax

                    if ana_chunks:
                        last_frame = config.output_data_format != 'all_frames'
                        do_tau = config.compute_report and tau_fn is not None

                        @jax.jit
                        def ana_chunk_fn(xs, ys, ss):
                            def body(carry, xys):
                                x, y, s = xys
                                out = predict(x, s)
                                if last_frame:
                                    out = {k: v[:, -1:, :]
                                           for k, v in out.items()}
                                labels = ds.unpack_labels(y)
                                m = dict(evaluator.compute_metrics(out,
                                                                   labels))
                                if do_tau:
                                    m['tau_report'] = tau_fn.traceable(
                                        x, out, labels, s)
                                return carry, m
                            _, ms = lax.scan(body, None, (xs, ys, ss))
                            return ms
                    else:
                        @jax.jit
                        def eval_chunk_fn(st, xs, ys):
                            def body(carry, xy):
                                _, m = eval_fn(st, xy[0], xy[1])
                                return carry, m
                            _, ms = lax.scan(body, None, (xs, ys))
                            return ms

                    pend = []   # [(i, batch)] — same-shape batches only

                    def flush():
                        if not pend:
                            return
                        xs = jnp.asarray(np.stack(
                            [b.inputs for _, b in pend]))
                        ys = jnp.asarray(np.stack(
                            [b.labels for _, b in pend]))
                        if ana_chunks:
                            ss = jnp.asarray(np.stack(
                                [np.asarray(b.subject_indices, np.int32)
                                 for _, b in pend]))
                            ms = jax.device_get(ana_chunk_fn(xs, ys, ss))
                        else:
                            ms = jax.device_get(eval_chunk_fn(state, xs, ys))
                        for k, (bi, b) in enumerate(pend):
                            mk = {key: v[k] for key, v in ms.items()}
                            tau_v = mk.pop('tau_report', None)
                            if tau_v is not None:
                                evaluator.tau_reported_metrics.append(
                                    float(tau_v))
                            evaluator(None, None, None,
                                      precomputed_metrics=mk)
                            emit_rows(bi, b, mk)
                        pend.clear()

                    for i, batch in enumerate(ds.batches(
                            config.batch_size, shuffle=False,
                            drop_last=False)):
                        if pend and (batch.inputs.shape
                                     != pend[0][1].inputs.shape):
                            flush()   # the trailing short batch
                        pend.append((i, batch))
                        if len(pend) >= eval_chunk:
                            flush()
                    flush()
                else:
                    for i, batch in enumerate(ds.batches(
                            config.batch_size, shuffle=False,
                            drop_last=False)):
                        x = jax.numpy.asarray(batch.inputs)
                        y = jax.numpy.asarray(batch.labels)
                        if eval_fn is not None:
                            outputs, metrics = eval_fn(state, x, y)
                        else:
                            outputs = predict(x, batch.subject_indices)
                            if config.output_data_format != 'all_frames':
                                # analytical predicts every window frame;
                                # compare on the label frame(s) only
                                outputs = {k: v[:, -1:, :]
                                           for k, v in outputs.items()}
                            metrics = evaluator.compute_metrics(
                                outputs, ds.unpack_labels(y))
                        evaluator(x, outputs, ds.unpack_labels(y),
                                  batch.subject_indices,
                                  compute_report=config.compute_report,
                                  precomputed_metrics=metrics)
                        if getattr(args, 'plot_errors', False) and i == 0:
                            for p in evaluator.plot_errors(
                                    outputs, ds.unpack_labels(y),
                                    args.plot_path_root, tag=split):
                                print(f'wrote {p}')
                        emit_rows(i, batch, metrics)
            print(f'[{split}] final report:')
            evaluator.print_report(log_to_wandb=True)
            print(f'wrote {csv_path}')
            if n_boot and boot_rows:
                # 95% percentile bootstrap over the per-window rows,
                # chunked: materializing all (n_boot, W) resample indices
                # at once is O(n_boot*W) host RAM — 14 GB for 2000x300k
                rows_np = np.asarray(boot_rows)          # [W, 3]
                rng = np.random.default_rng(0)
                w = rows_np.shape[0]
                chunks = []
                chunk = max(1, min(n_boot, 64_000_000 // max(w, 1)))
                for lo_i in range(0, n_boot, chunk):
                    k = min(chunk, n_boot - lo_i)
                    idx = rng.integers(0, w, (k, w))
                    chunks.append(rows_np[idx].mean(axis=1))
                means = np.concatenate(chunks)           # [N, 3]
                lo = np.percentile(means, 2.5, axis=0)
                hi = np.percentile(means, 97.5, axis=0)
                mid = rows_np.mean(axis=0)
                names = ['loss', 'force_avg_err (N/kg)',
                         'com_acc_avg_err (m/s^2)']
                print(f'[{split}] bootstrap 95% CIs '
                      f'({rows_np.shape[0]} windows, {n_boot} resamples):')
                for j, name in enumerate(names):
                    print(f'  {name}: {mid[j]:.4f} '
                          f'[{lo[j]:.4f}, {hi[j]:.4f}]')
            if group_by and groups:
                spath = os.path.join(checkpoint_dir,
                                     f'{split}_summary_{group_by}.csv')
                with open(spath, 'w', newline='') as f:
                    w = csv.writer(f)
                    w.writerow([group_by, 'windows', 'loss',
                                'force_avg_err', 'com_acc_avg_err'])
                    ranked = sorted(groups.items(),
                                    key=lambda kv: kv[1][2] / kv[1][0],
                                    reverse=True)   # worst force err first
                    for key, (n, sl, sf, sc) in ranked:
                        w.writerow([key, n, sl / n, sf / n, sc / n])
                print(f'wrote {spath}')
        ml.finish()
        return True
