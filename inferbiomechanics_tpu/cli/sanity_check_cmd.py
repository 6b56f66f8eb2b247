"""``sanity-check`` subcommand.

Capability parity: reference ``src/cli/sanity_check.py`` — a
window_size=1 pass over the train set computing running mean / variance /
min / max per input and label key (ref :27-77), here vectorized over the
packed feature/label matrices instead of per-sample iteration (and
without the reference's stale 3-of-4 tuple unpack bug, SURVEY.md §2.14).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


class SanityCheckCommand:
    name = 'sanity-check'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'sanity-check', help='Print per-key data statistics for the train split')
        parser.add_argument('--dataset-home', type=str, default='../data')
        parser.add_argument('--geometry-folder', type=str, default='')
        parser.add_argument('--short', action='store_true')

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'sanity-check':
            return False
        from inferbiomechanics_tpu.data.dataset import WindowDataset

        ds = WindowDataset(os.path.join(args.dataset_home, 'train'),
                           window_size=1, stride=1,
                           testing_with_short_dataset=args.short,
                           skip_loading_skeletons=True)
        print(f'{len(ds)} windows over {len(ds.subject_paths)} subjects')

        def report(name, mat, offsets):
            print(f'--- {name} ---')
            for key, (o, w) in offsets.items():
                cols = mat[:, o:o + w]
                print(f'{key}: mean={cols.mean():.4f} var={cols.var():.4f} '
                      f'min={cols.min():.4f} max={cols.max():.4f}')
                if not np.isfinite(cols).all():
                    print(f'  WARNING: {key} contains non-finite values!')

        report('inputs', ds.features_all, ds.in_offsets)
        report('labels', ds.labels_all, ds.lab_offsets)
        return True
