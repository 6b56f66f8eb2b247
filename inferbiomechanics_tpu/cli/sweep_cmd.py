"""``sweep`` subcommand: vmapped hyperparameter sweep on one program.

Capability parity+: the reference sweeps hyperparameters as nested bash
loops launching one sbatch training job per (hidden_size, learning_rate)
point (reference ``src/slurm/slurm_loop.sh:13-22``). Here the lr x seed
grid trains SIMULTANEOUSLY in one compiled program per model shape
(``train/sweep.py``); shape-changing axes (``--hidden-dims-grid``)
run as an outer sequential loop, matching the reference's hidden-size
axis.

Outputs ``sweep_results.json`` (per-config final dev/train loss and
checkpoint path, ranked) under the checkpoint dir and prints the winner.
"""

from __future__ import annotations

import argparse
import json
import logging
import os

from inferbiomechanics_tpu.config import add_config_flags, config_from_args
from inferbiomechanics_tpu.data.dataset import WindowDataset

logger = logging.getLogger(__name__)


class SweepCommand:
    name = 'sweep'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'sweep', help='Train a hyperparameter grid simultaneously '
                          '(vmapped lr x seed; sequential hidden-dims axis)')
        add_config_flags(parser)
        parser.add_argument('--lrs', type=float, nargs='+', default=None,
                            help='learning-rate axis (default: the single '
                                 '--learning-rate value)')
        parser.add_argument('--seeds', type=int, nargs='+', default=None,
                            help='init/dropout seed axis (default: the '
                                 'single --seed value)')
        parser.add_argument('--hidden-dims-grid', type=str, nargs='+',
                            default=None, metavar='DIMS',
                            help='optional model-shape axis, each spec a '
                                 'comma-separated hidden-dims list (e.g. '
                                 '"512,512" "256,256"); shapes train '
                                 'sequentially, the lr x seed grid vmaps '
                                 'inside each (ref slurm_loop.sh hidden '
                                 'sizes)')
        parser.add_argument('--shard-configs', action='store_true',
                            help='shard the config axis across the device '
                                 'mesh (zero per-step collectives) instead '
                                 'of replicating it')
        parser.add_argument('--max-batches-per-epoch', type=int, default=None,
                            help='clamp epochs for smoke runs')
        parser.add_argument('--pbt-every', type=int, default=0,
                            help='population-based training: every N dev '
                                 'evals the worst quartile of configs '
                                 'copies the best quartile\'s weights and '
                                 'adopts its lr x0.8/x1.25 (0 = plain '
                                 'grid)')

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'sweep':
            return False
        config = config_from_args(args)
        if config.model_type == 'analytical':
            print('The analytical baseline has no trainable parameters; '
                  'nothing to sweep.')
            return True

        from inferbiomechanics_tpu.train.sweep import run_sweep
        from inferbiomechanics_tpu.utils.wandb_compat import MetricLogger

        ml = MetricLogger(config=vars(args),
                          group=os.environ.get('WANDB_RUN_GROUP'),
                          enabled=not config.no_wandb)

        lrs = args.lrs or [config.learning_rate]
        seeds = args.seeds if args.seeds is not None else [config.seed]
        shapes = args.hidden_dims_grid or [None]

        root = os.path.join(os.path.abspath(config.checkpoint_dir), 'sweep',
                            config.model_type)

        train_ds = WindowDataset(
            os.path.join(config.dataset_home, 'train'),
            window_size=config.window_size, stride=config.stride,
            output_data_format=config.output_data_format,
            testing_with_short_dataset=config.short,
            trial_filter=config.trial_filter,
            skip_loading_skeletons=True)
        try:
            dev_ds = WindowDataset(
                os.path.join(config.dataset_home, 'dev'),
                window_size=config.window_size, stride=config.stride,
                output_data_format=config.output_data_format,
                testing_with_short_dataset=config.short,
                trial_filter=config.trial_filter,
                skip_loading_skeletons=True)
        except (FileNotFoundError, ValueError):
            dev_ds = None

        all_points = []
        all_events = []
        best = None
        for spec in shapes:
            if spec is not None:
                config.hidden_dims = [int(x) for x in spec.split(',') if x]
            shape_tag = ('hid' + 'x'.join(map(str, config.hidden_dims))
                         if spec is not None else 'base')
            config.checkpoint_dir = os.path.join(root, shape_tag)
            result = run_sweep(config, train_ds, dev_ds, lrs, seeds,
                               max_batches_per_epoch=args.max_batches_per_epoch,
                               shard_configs=args.shard_configs,
                               pbt_every=args.pbt_every,
                               metric_logger=ml,
                               metric_prefix=(f'{shape_tag}/'
                                              if len(shapes) > 1 else ''))
            if result.pbt_events:
                all_events.extend({**e, 'hidden_dims': list(config.hidden_dims)}
                                  for e in result.pbt_events)
                print(f'[sweep] {len(result.pbt_events)} PBT '
                      f'exploit/explore events (see sweep_results.json)')
            for p in result.points:
                row = {**vars(p), 'hidden_dims': list(config.hidden_dims)}
                all_points.append(row)
                score = (row['best_dev_loss']
                         if row.get('best_dev_loss') is not None
                         else row['final_train_loss'])
                if score is not None and (best is None or score < best[0]):
                    best = (score, row)
            import math
            b = result.best
            lr_moved = (b.final_learning_rate is not None
                        and not math.isclose(b.final_learning_rate,
                                             b.learning_rate, rel_tol=1e-6))
            lr_tag = (f'slot lr={b.learning_rate:g} (PBT final '
                      f'{b.final_learning_rate:g})' if lr_moved
                      else f'lr={b.learning_rate:g}')
            print(f'[sweep {shape_tag}] {len(result.points)} configs, '
                  f'{result.windows_per_sec:,.0f} windows/sec aggregate; '
                  f'best: {lr_tag} seed={b.seed}')

        os.makedirs(root, exist_ok=True)
        out = os.path.join(root, 'sweep_results.json')
        with open(out, 'w') as f:
            json.dump({'points': all_points,
                       'best': best[1] if best else None,
                       'pbt_events': all_events}, f, indent=2)
        if best:
            b = best[1]
            import math
            flr = b.get('final_learning_rate')
            pbt_tag = (f' (PBT final lr {flr:g})'
                       if flr is not None and not math.isclose(
                           flr, b['learning_rate'], rel_tol=1e-6) else '')
            print(f'sweep winner: lr={b["learning_rate"]:g}{pbt_tag} '
                  f'seed={b["seed"]} hidden_dims={b["hidden_dims"]} '
                  f'loss={best[0]:.6f}\nresults -> {out}')
        ml.finish()
        return True
