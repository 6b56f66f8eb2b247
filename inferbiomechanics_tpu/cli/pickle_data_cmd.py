"""``pickle-data`` subcommand.

Capability parity: reference ``src/cli/pickle_data.py`` — materialize
every window of the train/dev datasets into reusable blocks on disk
(ref :52-79). TPU-native: instead of torch.save pickles of per-window
tuples, each split's fully-featurized packed matrices (features, labels,
window table) are saved as one ``.npz`` block per 100k windows — the
exact arrays the training gather runs on, so reloading skips
featurization entirely.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

BLOCK = 100_000


class PickleDataCommand:
    name = 'pickle-data'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'pickle-data', help='Materialize featurized windows to .npz blocks')
        parser.add_argument('--dataset-home', type=str, default='../data')
        parser.add_argument('--history-len', type=int, default=50)
        parser.add_argument('--stride', type=int, default=5)
        parser.add_argument('--geometry-folder', type=str, default='')

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'pickle-data':
            return False
        from inferbiomechanics_tpu.data.dataset import WindowDataset

        for split in ('train', 'dev'):
            src = os.path.join(args.dataset_home, split)
            if not os.path.isdir(src):
                print(f'{split}: {src} missing, skipping')
                continue
            ds = WindowDataset(src, window_size=args.history_len,
                               stride=args.stride, skip_loading_skeletons=True)
            out_dir = os.path.join(args.dataset_home, f'{split}_pickled')
            os.makedirs(out_dir, exist_ok=True)
            n = len(ds)
            for block_i, start in enumerate(range(0, max(n, 1), BLOCK)):
                idx = np.arange(start, min(start + BLOCK, n))
                path = os.path.join(out_dir, f'{split}_{block_i}.npz')
                arrays = dict(
                    trial_row_offset=ds.trial_row_offset,
                    win_ft=ds.win_ft[idx], win_subject=ds.win_subject[idx],
                    win_trial=ds.win_trial[idx], win_start=ds.win_start[idx],
                    window_size=args.history_len, stride=args.stride,
                    num_dofs=ds.num_dofs,
                    root_history_len=ds.root_history_len,
                    num_contact_bodies=len(ds.contact_bodies),
                    output_data_format=ds.output_data_format)
                if block_i == 0:
                    # the full packed matrices go in block 0 only; later
                    # blocks carry just their window-table slice (the
                    # round-1 writer re-stored the matrices per block,
                    # multiplying disk cost by block count for no reader)
                    arrays['features_all'] = ds.features_all
                    arrays['labels_all'] = ds.labels_all
                np.savez_compressed(path, **arrays)
                print(f'wrote {path} ({idx.size} windows)')
        return True
