"""``save-prediction-csv`` subcommand.

Capability parity: reference ``src/cli/save_prediction_csv.py`` — run the
model over chosen trials and write ``predicted_forces.csv`` rows
``t, cop_r, cop_r + 0.001*F_r*mass, cop_l, cop_l + 0.001*F_l*mass`` in
Blender's coordinate system via the fixed rotation
[[1,0,0],[0,0,-1],[0,1,0]] (ref :178-240), including the <0.3
force-share zeroing (ref :227-228).
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np

from inferbiomechanics_tpu.config import add_config_flags, config_from_args
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.inference import Predictor

# world -> Blender coordinate rotation (ref save_prediction_csv.py:188)
BLENDER_ROT = np.array([[1.0, 0.0, 0.0],
                        [0.0, 0.0, -1.0],
                        [0.0, 1.0, 0.0]])


class SavePredictionCsvCommand:
    name = 'save-prediction-csv'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'save-prediction-csv', help='Export per-frame predicted forces to CSV')
        parser.add_argument('--file', type=str, required=True)
        parser.add_argument('--trial', type=int, default=0)
        parser.add_argument('--out', type=str, default='predicted_forces.csv')
        parser.add_argument('--tta-mirror', action='store_true',
                            help='Mirror test-time augmentation: '
                                 'average each prediction with the '
                                 'un-mirrored prediction of the '
                                 'sagittally mirrored window')
        add_config_flags(parser)
        from inferbiomechanics_tpu.train.run_config import add_run_config_flag
        add_run_config_flag(parser)

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'save-prediction-csv':
            return False
        from inferbiomechanics_tpu.train.run_config import (
            use_run_config_if_requested,
        )
        config = use_run_config_if_requested(config_from_args(args), args)
        ds = WindowDataset(args.file, window_size=config.window_size,
                           stride=config.stride, skip_loading_skeletons=True)
        checkpoint_dir = os.path.join(os.path.abspath(config.checkpoint_dir),
                                      config.model_type)
        predictor = Predictor(config, checkpoint_dir, ds,
                              tta_mirror=args.tta_mirror)
        pred = predictor.predict_trial(0, args.trial)
        if pred is None:
            print(f'trial {args.trial}: no valid windows')
            return True
        forces, cops = predictor.predict_forces_at_frames(pred)
        mass = ds.subjects[0].getMassKg()
        nb = forces.shape[-1] // 3
        forces = forces.reshape(-1, nb, 3)
        cops = cops.reshape(-1, nb, 3)

        with open(args.out, 'w', newline='') as f:
            writer = csv.writer(f)
            header = ['t']
            for b in range(nb):
                header += [f'cop{b}_{a}' for a in 'xyz']
                header += [f'cop_plus_f{b}_{a}' for a in 'xyz']
            writer.writerow(header)
            for i, frame in enumerate(pred.last_frame):
                row = [int(frame)]
                for b in range(nb):
                    cop_bl = BLENDER_ROT @ cops[i, b]
                    # arrow tip: CoP + 0.001 * F * mass (ref :214-226)
                    tip_bl = BLENDER_ROT @ (cops[i, b] + 0.001 * forces[i, b] * mass)
                    row += [f'{v:.6f}' for v in cop_bl]
                    row += [f'{v:.6f}' for v in tip_bl]
                writer.writerow(row)
        print(f'wrote {args.out} ({pred.last_frame.size} rows)')
        return True
