"""Command-line dispatcher.

Capability parity: reference ``src/main.py`` — registers every
subcommand, dispatches on the argparse subcommand name, and runs the
first command that accepts the args (ref :16-44). Root logging goes to
the ``log`` file plus stderr at INFO (ref :48-58).
"""

import argparse
import logging
import os
import sys

# Honor IB_PLATFORM=cpu|tpu before any jax use (some TPU plugins ignore the
# JAX_PLATFORMS environment variable, so pin through jax.config instead).
if os.environ.get('IB_PLATFORM'):
    import jax

    jax.config.update('jax_platforms', os.environ['IB_PLATFORM'])


def build_commands():
    from inferbiomechanics_tpu.cli.train_cmd import TrainCommand
    from inferbiomechanics_tpu.cli.analyze_cmd import AnalyzeCommand
    from inferbiomechanics_tpu.cli.create_splits_cmd import CreateSplitsCommand
    from inferbiomechanics_tpu.cli.sanity_check_cmd import SanityCheckCommand
    from inferbiomechanics_tpu.cli.pickle_data_cmd import PickleDataCommand
    from inferbiomechanics_tpu.cli.make_plots_cmd import MakePlotsCommand
    from inferbiomechanics_tpu.cli.visualize_cmd import VisualizeCommand
    from inferbiomechanics_tpu.cli.visualize_file_cmd import VisualizeFileCommand
    from inferbiomechanics_tpu.cli.review_file_cmd import ReviewFileCommand
    from inferbiomechanics_tpu.cli.save_prediction_csv_cmd import SavePredictionCsvCommand
    from inferbiomechanics_tpu.cli.convert_b3d_cmd import ConvertB3dCommand
    from inferbiomechanics_tpu.cli.serve_cmd import ServeCommand
    from inferbiomechanics_tpu.cli.convert_checkpoint_cmd import (
        ConvertCheckpointCommand,
    )
    from inferbiomechanics_tpu.cli.sweep_cmd import SweepCommand
    from inferbiomechanics_tpu.cli.doctor_cmd import DoctorCommand
    from inferbiomechanics_tpu.cli.export_cmd import ExportCommand
    from inferbiomechanics_tpu.cli.plot_training_cmd import PlotTrainingCommand
    return [
        TrainCommand(),
        VisualizeCommand(),
        VisualizeFileCommand(),
        CreateSplitsCommand(),
        AnalyzeCommand(),
        SanityCheckCommand(),
        MakePlotsCommand(),
        ReviewFileCommand(),
        PickleDataCommand(),
        SavePredictionCsvCommand(),
        ConvertB3dCommand(),
        ServeCommand(),
        ConvertCheckpointCommand(),
        SweepCommand(),
        DoctorCommand(),
        ExportCommand(),
        PlotTrainingCommand(),
    ]


def main(argv=None) -> int:
    commands = build_commands()
    parser = argparse.ArgumentParser(prog='main.py',
                                     description='InferBiomechanics (TPU-native)')
    subparsers = parser.add_subparsers(dest='command')
    for command in commands:
        command.register_subcommand(subparsers)
    args = parser.parse_args(argv)
    if args.command is None:
        parser.print_help()
        return 1
    # reference-compat --device: 'cpu' pins the CPU backend (same effect
    # as IB_PLATFORM=cpu); cuda/tpu values are accepted and ignored since
    # device placement is automatic here (ref train.py:99-102 picks a GPU)
    device = getattr(args, 'device', None)
    if device:
        if device.split(':')[0] == 'cpu':
            import jax
            jax.config.update('jax_platforms', 'cpu')
        else:
            logging.getLogger(__name__).info(
                '--device %r accepted for reference compatibility; device '
                'placement is automatic (use IB_PLATFORM to pin a backend)',
                device)
    for command in commands:
        if command.run(args):
            return 0
    print(f'no command accepted {args.command!r}', file=sys.stderr)
    return 1


if __name__ == '__main__':
    logging.basicConfig(
        level=logging.INFO,
        handlers=[logging.FileHandler('log'), logging.StreamHandler()],
        format='%(asctime)s %(levelname)s %(name)s: %(message)s')
    sys.exit(main())
