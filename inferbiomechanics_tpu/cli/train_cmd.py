"""``train`` subcommand.

Capability parity: reference ``src/cli/train.py`` — same flags, same
workflow (git-provenance warning, wandb init, train/dev datasets,
model factory, resume, epoch loop). Distributed setup is implicit: the
device mesh replaces NCCL process groups (SURVEY.md §2.10).
"""

from __future__ import annotations

import argparse
import logging
import os

from inferbiomechanics_tpu.config import add_config_flags, config_from_args
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.train.loop import train
from inferbiomechanics_tpu.utils.gitinfo import get_git_hash, has_uncommitted_changes
from inferbiomechanics_tpu.utils.wandb_compat import MetricLogger

logger = logging.getLogger(__name__)


class TrainCommand:
    name = 'train'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'train', help='Train a model on the AddBiomechanics dataset')
        add_config_flags(parser)
        parser.add_argument('--use-pickled', action='store_true',
                            help='Load pre-materialized {split}_pickled/ '
                                 'blocks (pickle-data output) instead of '
                                 'featurizing .b3d files — the capability '
                                 'the reference left unwired (SURVEY §2.4)')

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'train':
            return False
        config = config_from_args(args)

        if os.environ.get('IB_MULTIHOST'):
            # multi-host pod slice: discover topology from the TPU runtime
            # (replaces the reference's torchrun/NCCL process groups)
            import jax
            jax.distributed.initialize()

        if has_uncommitted_changes():
            logger.warning('ALERT: You have uncommitted changes — runs may '
                           'not be reproducible from the recorded git hash.')

        checkpoint_dir = os.path.join(os.path.abspath(config.checkpoint_dir),
                                      config.model_type)
        config.checkpoint_dir = checkpoint_dir

        from inferbiomechanics_tpu.utils.geometry import ensure_geometry
        config.geometry_folder = ensure_geometry(config.geometry_folder)

        ml = MetricLogger(
            config={**vars(args), 'git_hash': get_git_hash()},
            group=os.environ.get('WANDB_RUN_GROUP'),
            enabled=not config.no_wandb)

        if getattr(args, 'use_pickled', False):
            from inferbiomechanics_tpu.data.pickled import PickledDataset
            train_ds = PickledDataset(os.path.join(config.dataset_home,
                                                   'train_pickled'))
            try:
                dev_ds = PickledDataset(os.path.join(config.dataset_home,
                                                     'dev_pickled'))
            except FileNotFoundError:
                dev_ds = None
            config.window_size = train_ds.window_size
            config.stride = train_ds.stride
        else:
            train_ds = WindowDataset(
                os.path.join(config.dataset_home, 'train'),
                window_size=config.window_size, stride=config.stride,
                output_data_format=config.output_data_format,
                testing_with_short_dataset=config.short,
                trial_filter=config.trial_filter,
                skip_loading_skeletons=not config.compute_report,
                materialize_features=config.materialize_features)
            dev_ds = WindowDataset(
                os.path.join(config.dataset_home, 'dev'),
                window_size=config.window_size, stride=config.stride,
                output_data_format=config.output_data_format,
                testing_with_short_dataset=config.short,
                trial_filter=config.trial_filter,
                skip_loading_skeletons=not config.compute_report,
                materialize_features=config.materialize_features)

        if config.model_type == 'analytical':
            print('The analytical baseline has no trainable parameters; '
                  'use `analyze` to evaluate it.')
            return True

        if config.model_type == 'diffusion':
            from inferbiomechanics_tpu.train.diffusion_loop import train_diffusion
            result = train_diffusion(config, train_ds, dev_ds, metric_logger=ml)
        else:
            result = train(config, train_ds, dev_ds, metric_logger=ml)
        print(f'Training done: {result.epochs_run} epochs, '
              f'{result.windows_per_sec:,.0f} windows/sec')
        ml.finish()
        return True
