"""``convert-checkpoint`` subcommand — reference ``.pt`` → this format.

Beyond reference parity: lets a reference user carry trained feedforward
weights across instead of retraining (torch_compat.py documents the
layout mapping). The output lands under ``--out-dir`` with the same
``epoch_{e}_batch_{b}`` name, so ``train``/``analyze``/``visualize``
resume from it directly.
"""

from __future__ import annotations

import argparse
import glob
import os


class ConvertCheckpointCommand:
    name = 'convert-checkpoint'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'convert-checkpoint',
            help='Convert reference PyTorch .pt checkpoints (feedforward) '
                 'into this framework\'s format')
        parser.add_argument('paths', nargs='+',
                            help='.pt files or directories containing them')
        parser.add_argument('--out-dir', type=str, default=None,
                            help='Destination checkpoint dir (point '
                                 '--checkpoint-dir/<model-type> here later); '
                                 'required except with --soup')
        parser.add_argument('--opt-type', type=str, default='rmsprop',
                            help='Optimizer whose fresh state to embed '
                                 '(torch optimizer state is not portable)')
        parser.add_argument('--learning-rate', type=float, default=1e-4)
        parser.add_argument('--to-torch', action='store_true',
                            help='Reverse direction: convert this '
                                 'framework\'s .ckpt files into reference-'
                                 'format .pt blobs (paths then name .ckpt '
                                 'files or dirs containing them)')
        parser.add_argument('--dropout', action='store_true',
                            help='--to-torch only: the reference model was '
                                 'built with --dropout (shifts its '
                                 'Sequential layer indices)')
        parser.add_argument('--soup', type=str, default=None, metavar='OUT',
                            help='Merge the given native .ckpt files into '
                                 'ONE checkpoint by uniform parameter '
                                 'averaging (a "model soup": ensemble-'
                                 'flavored accuracy at single-model '
                                 'serving cost); paths name same-'
                                 'architecture .ckpt files or dirs')

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'convert-checkpoint':
            return False
        from inferbiomechanics_tpu.torch_compat import (
            convert_torch_checkpoint, export_torch_checkpoint,
        )

        ext = '*.ckpt' if (args.to_torch or args.soup) else '*.pt'
        files = []
        for p in args.paths:
            if os.path.isdir(p):
                files.extend(sorted(glob.glob(os.path.join(p, ext))))
            else:
                files.append(p)
        if not files:
            print(f'no {ext} checkpoints found')
            return True
        if args.soup:
            from inferbiomechanics_tpu.train.checkpoint import soup_checkpoints
            out = soup_checkpoints(files, args.soup)
            print(f'souped {len(files)} checkpoints -> {out}')
            return True
        if not args.out_dir:
            import sys
            print('convert-checkpoint: --out-dir is required (except with '
                  '--soup)', file=sys.stderr)
            sys.exit(2)
        for f in files:
            if args.to_torch:
                out = export_torch_checkpoint(f, args.out_dir,
                                              dropout=args.dropout)
            else:
                out = convert_torch_checkpoint(f, args.out_dir,
                                               opt_type=args.opt_type,
                                               learning_rate=args.learning_rate)
            print(f'{f} -> {out}')
        return True
