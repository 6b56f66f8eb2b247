"""``visualize`` subcommand.

Capability parity: reference ``src/cli/visualize.py`` — loads the dev
split and the latest checkpoint, then plays windows with label (red) vs
predicted (blue) forces and joint-center markers, served on port 8888
(ref :123-263). Like the reference, the DEFAULT is the interactive
live viewer (model in the loop per tick); ``--static`` exports a
batched, self-contained HTML snapshot instead — a capability the
reference lacks. The live server is a stdlib WebSocket stack
(viz/live_model.py) replacing the NimbleGUI C++ server.
"""

from __future__ import annotations

import argparse
import os

from inferbiomechanics_tpu.config import add_config_flags, config_from_args
from inferbiomechanics_tpu.cli.visualize_file_cmd import build_viz_payload
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.inference import Predictor
from inferbiomechanics_tpu.viz.viewer import export_html, serve_file


class VisualizeCommand:
    name = 'visualize'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'visualize', help='Visualize model predictions on the dev split')
        parser.add_argument('--subject', type=int, default=0)
        parser.add_argument('--trial', type=int, default=0)
        parser.add_argument('--out', type=str, default=None,
                            help='Static-export output path (implies '
                                 '--static); default outputs/visualize.html')
        parser.add_argument('--serve', action='store_true',
                            help='With --static: serve the exported HTML '
                                 '(implies --static)')
        parser.add_argument('--static', action='store_true',
                            help='Export a batched HTML snapshot instead of '
                                 'serving the live viewer')
        parser.add_argument('--live', action='store_true',
                            help=argparse.SUPPRESS)  # legacy: live is now the default
        parser.add_argument('--tta-mirror', action='store_true',
                            help='Mirror test-time augmentation: '
                                 'average each prediction with the '
                                 'un-mirrored prediction of the '
                                 'sagittally mirrored window')
        parser.add_argument('--port', type=int, default=8888)
        parser.add_argument('--host', type=str, default='127.0.0.1',
                            help='Bind address (default loopback; use '
                                 '0.0.0.0 to allow remote access)')
        add_config_flags(parser)
        from inferbiomechanics_tpu.train.run_config import add_run_config_flag
        add_run_config_flag(parser)

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'visualize':
            return False
        from inferbiomechanics_tpu.train.run_config import (
            use_run_config_if_requested,
        )
        config = use_run_config_if_requested(config_from_args(args), args)
        ds = WindowDataset(os.path.join(config.dataset_home, 'dev'),
                           window_size=config.window_size, stride=config.stride,
                           testing_with_short_dataset=config.short,
                           skip_loading_skeletons=True)
        predictor = None
        if config.model_type != 'analytical':
            checkpoint_dir = os.path.join(os.path.abspath(config.checkpoint_dir),
                                          config.model_type)
            predictor = Predictor(config, checkpoint_dir, ds,
                                  tta_mirror=args.tta_mirror)
        # --out / --serve only make sense for the static export; honor
        # them rather than silently dropping them in the live default
        static = args.static or args.serve or args.out is not None
        if not static:
            # interactive viewer is the default, matching the reference
            # (visualize.py:123-130 IS the live GUI)
            from inferbiomechanics_tpu.loss.evaluator import (
                RegressionLossEvaluator,
            )
            from inferbiomechanics_tpu.train.loop import loss_config_from
            from inferbiomechanics_tpu.utils.geometry import ensure_geometry
            from inferbiomechanics_tpu.viz.live_model import serve_live
            evaluator = RegressionLossEvaluator(
                'dev', loss_config_from(config)) if predictor else None
            serve_live(ds, predictor, evaluator,
                       geometry_folder=ensure_geometry(config.geometry_folder),
                       title='dev split (live)', port=args.port,
                       host=args.host)
            return True
        from inferbiomechanics_tpu.utils.geometry import ensure_geometry
        payload = build_viz_payload(ds, args.subject, args.trial, predictor,
                                    geometry_folder=ensure_geometry(
                                        config.geometry_folder))
        out = args.out or 'outputs/visualize.html'
        path = export_html(out, payload, title=f'dev subject {args.subject} '
                                               f'trial {args.trial}')
        print(f'wrote viewer: {path}')
        if args.serve:
            serve_file(path, args.port, host=args.host)
        return True
