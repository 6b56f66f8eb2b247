"""``convert-b3d`` subcommand.

Beyond-parity utility: batch-convert legacy AddBiomechanics protobuf
``.b3d`` subjects to B3D-TPU (the one-time decode that makes every later
training window a zero-decode mmap slice — data/b3d.py docstring). The
reference had no converter because nimblephysics decoded per window at
train time (SURVEY.md §3.5, the pipeline bottleneck this framework
removes); ``WindowDataset`` also auto-converts on first touch, so running
this explicitly is only needed to pre-warm a dataset or control output
placement.
"""

from __future__ import annotations

import argparse
import os
import time


class ConvertB3dCommand:
    name = 'convert-b3d'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'convert-b3d',
            help='Convert legacy protobuf .b3d subjects to B3D-TPU')
        parser.add_argument('input', type=str,
                            help='A legacy .b3d file or a directory tree')
        parser.add_argument('--out-dir', type=str, default='',
                            help='Output directory (default: beside sources, '
                                 'suffix .b3dtpu)')
        parser.add_argument('--force', action='store_true',
                            help='Reconvert even if an up-to-date output exists')
        parser.add_argument('--verify', action='store_true',
                            help='Strict-decode diagnosis instead of '
                                 'converting: unknown-field census, framing '
                                 'reconciliation, channel-width checks; '
                                 'non-zero exit on any problem')
        parser.add_argument('--verify-frames', type=int, default=None,
                            help='With --verify: cap frames checked per trial')
        parser.add_argument('--infer-schema', action='store_true',
                            help='Table-free wire analysis: propose the '
                                 'file\'s own field-number tables from '
                                 'structural invariants and diff them '
                                 'against the built-in reconstruction '
                                 '(the tool to run FIRST when a real '
                                 'nimble-written file mis-parses)')

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'convert-b3d':
            return False
        from inferbiomechanics_tpu.data.b3d_legacy import (
            convert_to_tpu, is_legacy_b3d,
        )

        paths = []
        if os.path.isdir(args.input):
            for root, _dirs, files in os.walk(args.input):
                for f in sorted(files):
                    if f.endswith('.b3d'):
                        paths.append(os.path.join(root, f))
        else:
            paths.append(args.input)

        if args.infer_schema:
            import sys
            from inferbiomechanics_tpu.data.b3d_infer import (
                format_infer_report, infer_legacy_schema,
            )
            disagree = 0
            for path in paths:
                if not is_legacy_b3d(path):
                    print(f'skip (already B3D-TPU): {path}')
                    continue
                report = infer_legacy_schema(path)
                print(format_infer_report(report))
                disagree += 1 if report['builtin_diff'] else 0
            if disagree:
                print(f'SCHEMA DISAGREEMENT in {disagree} of {len(paths)} '
                      f'files — edit the b3d_legacy.py tables as printed')
                sys.exit(1)
            return True

        if args.verify:
            from inferbiomechanics_tpu.data.b3d_legacy import (
                format_verify_report, verify_legacy,
            )
            import sys
            failed = 0
            for path in paths:
                if not is_legacy_b3d(path):
                    print(f'skip (already B3D-TPU): {path}')
                    continue
                report = verify_legacy(
                    path, max_frames_per_trial=args.verify_frames)
                print(format_verify_report(report))
                failed += 0 if report['ok'] else 1
            if failed:
                print(f'VERIFY FAILED for {failed} of {len(paths)} files')
                sys.exit(1)
            return True

        converted = skipped = 0
        for path in paths:
            if not is_legacy_b3d(path):
                print(f'skip (already B3D-TPU): {path}')
                skipped += 1
                continue
            if args.out_dir:
                rel = os.path.relpath(path, args.input) \
                    if os.path.isdir(args.input) else os.path.basename(path)
                out = os.path.join(args.out_dir, rel)
                os.makedirs(os.path.dirname(out) or '.', exist_ok=True)
            else:
                out = path + 'tpu'
            from inferbiomechanics_tpu.data.b3d import is_current_b3dt
            if (not args.force and os.path.exists(out)
                    and os.path.getmtime(out) >= os.path.getmtime(path)
                    and is_current_b3dt(out)):
                print(f'skip (up to date): {out}')
                skipped += 1
                continue
            t0 = time.time()
            convert_to_tpu(path, out)
            print(f'converted {path} -> {out} '
                  f'({os.path.getsize(out) / 1e6:.1f} MB, {time.time() - t0:.1f}s)')
            converted += 1
        print(f'{converted} converted, {skipped} skipped')
        return True
