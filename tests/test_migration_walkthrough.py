"""End-to-end reference-user migration walkthrough (MIGRATION.md).

One chained scenario through REAL subprocess CLI invocations: legacy
nimble-format `.b3d` files -> create-splits -> train (with the QoL flags
a migrating user would reach for) -> analyze the best checkpoint ->
save-prediction-csv. Each command is unit-tested elsewhere; this test
catches interface drift BETWEEN them — the actual switching experience.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

MAIN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    'main.py')


def run_cmd(args, timeout=420):
    env = dict(os.environ, IB_PLATFORM='cpu')
    out = subprocess.run([sys.executable, MAIN, *args],
                         capture_output=True, text=True, env=env,
                         timeout=timeout)
    assert out.returncode == 0, f'{args[0]} failed:\n{out.stderr[-3000:]}'
    return out


@pytest.mark.slow
def test_reference_user_walkthrough(tmp_path):
    from inferbiomechanics_tpu.data.synthetic import (
        write_synthetic_legacy_subject,
    )

    # 1. the user's existing data: LEGACY protobuf .b3d files laid out
    #    the way update_dataset.sh leaves them
    root = tmp_path / 'addb'
    processed = root / 'processed' / 'MyStudy2024' / 'subjects'
    processed.mkdir(parents=True)
    for i in range(4):
        write_synthetic_legacy_subject(str(processed / f'P{i:02d}.b3d'),
                                       num_trials=1, trial_length=120,
                                       seed=i)

    # 2. verify one file decodes cleanly with the built-in codec
    out = run_cmd(['convert-b3d', '--verify', str(processed / 'P00.b3d')])
    assert 'OK' in out.stdout

    # 3. reference-style splits (2 dev / 2 train for a 4-file dataset)
    run_cmd(['create-splits', '--data-folder', str(root)])
    assert len(os.listdir(root / 'dev')) == 2
    assert len(os.listdir(root / 'train')) == 2

    # 4. train with the migration-guide QoL flags; legacy files
    #    auto-convert on first touch
    ckpt = tmp_path / 'ck'
    out = run_cmd(['train', '--dataset-home', str(root),
                   '--checkpoint-dir', str(ckpt), '--no-wandb',
                   '--device', 'cpu',            # reference-compat spelling
                   '--history-len', '20', '--stride', '5',
                   '--epochs', '2', '--batch-size', '16',
                   '--seed', '3', '--keep-best',
                   '--lr-schedule', 'cosine', '--lr-decay-steps', '50'])
    best = ckpt / 'feedforward' / 'best.ckpt'
    assert best.exists()
    assert 'Training done: 2 epochs' in out.stdout

    # 5. evaluate the best checkpoint explicitly
    out = run_cmd(['analyze', '--dataset-home', str(root),
                   '--checkpoint-dir', str(ckpt), '--no-wandb',
                   '--history-len', '20', '--stride', '5',
                   '--batch-size', '16', '--checkpoint-file', str(best)])
    assert 'Force Avg Err' in out.stdout
    assert (ckpt / 'feedforward' / 'dev_analysis.csv').exists()

    # 6. export predictions for one trial (Blender CSV, ref parity)
    dev_file = os.path.join(root, 'dev', sorted(os.listdir(root / 'dev'))[0])
    csv_out = str(tmp_path / 'pred.csv')
    run_cmd(['save-prediction-csv', '--file', dev_file, '--trial', '0',
             '--out', csv_out, '--dataset-home', str(root),
             '--checkpoint-dir', str(ckpt),
             '--history-len', '20', '--stride', '5'])
    rows = open(csv_out).read().strip().splitlines()
    assert len(rows) > 1
