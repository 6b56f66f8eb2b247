"""plot-training: curves from the offline metric JSONL fallback.

Beyond parity — the reference's only view of training curves is the
wandb web UI (train.py:117-132); offline runs here log to JSONL
(utils/wandb_compat.py) and this command renders them.
"""

import json
import os

import pytest

from inferbiomechanics_tpu.cli.plot_training_cmd import (
    group_key, newest_log, plot_training, read_metrics,
)


def _write_log(path, records, config=None):
    with open(path, 'w') as f:
        if config is not None:
            f.write(json.dumps({'_config': config}) + '\n')
        for r in records:
            f.write(json.dumps(r) + '\n')


def test_read_metrics_and_grouping(tmp_path):
    p = str(tmp_path / 'metrics_1.jsonl')
    _write_log(p, [
        {'train/loss': 1.0, 'epoch': 0, 'batch': 0},
        {'train/loss': 0.5, 'epoch': 0, 'batch': 100},
        {'dev/force_rmse/left-x': 2.0, 'dev/force_rmse/left-y': 3.0},
        {'note': 'strings are skipped', 'flag': True},
    ], config={'model_type': 'feedforward'})
    config, series = read_metrics(p)
    assert config['model_type'] == 'feedforward'
    assert [v for _i, v in series['train/loss']] == [1.0, 0.5]
    assert 'note' not in series and 'flag' not in series
    # per-component keys share a panel; plain keys stand alone
    assert group_key('dev/force_rmse/left-x') == 'dev/force_rmse'
    assert group_key('train/loss') == 'train/loss'


def test_plot_training_renders_png(tmp_path):
    p = str(tmp_path / 'metrics_2.jsonl')
    _write_log(p, [{'train/loss': 1.0 / (i + 1),
                    'dev/force_rmse/left-x': 2.0 - 0.1 * i,
                    'dev/force_rmse/left-y': 1.5 - 0.1 * i,
                    'epoch': 0, 'batch': i} for i in range(10)])
    out = str(tmp_path / 'plots' / 'curves.png')
    finals = plot_training(p, out, smooth=4)
    assert os.path.exists(out) and os.path.getsize(out) > 1000
    assert finals['train/loss'] == pytest.approx(0.1)
    assert 'epoch' not in finals and 'batch' not in finals


def test_plot_training_torn_line_and_missing_key(tmp_path):
    p = str(tmp_path / 'metrics_3.jsonl')
    _write_log(p, [{'train/loss': 1.0}])
    with open(p, 'a') as f:
        f.write('{"train/loss": 0.5')     # live run: torn final line
    out = str(tmp_path / 'x.png')
    finals = plot_training(p, out)
    assert finals == {'train/loss': 1.0}
    with pytest.raises(ValueError, match='not in'):
        plot_training(p, out, keys=['nope/loss'])


def test_newest_log_selection(tmp_path):
    _write_log(str(tmp_path / 'metrics_1.jsonl'), [{'a': 1}])
    _write_log(str(tmp_path / 'metrics_2.jsonl'), [{'a': 2}])
    os.utime(str(tmp_path / 'metrics_1.jsonl'), (1, 1))
    assert newest_log(str(tmp_path)).endswith('metrics_2.jsonl')
    with pytest.raises(FileNotFoundError, match='no metrics'):
        newest_log(str(tmp_path / 'empty'))


def test_cli_end_to_end(tmp_path):
    """A real (offline) train run's JSONL renders through main.py."""
    import subprocess
    import sys
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    root = tmp_path / 'data'
    os.makedirs(root / 'train')
    os.makedirs(root / 'dev')
    write_synthetic_subject(str(root / 'train' / 's.b3d'), num_trials=1,
                            trial_length=120, seed=0)
    write_synthetic_subject(str(root / 'dev' / 'd.b3d'), num_trials=1,
                            trial_length=80, seed=1)
    env = dict(os.environ, IB_PLATFORM='cpu')
    main_py = os.path.join(os.path.dirname(__file__), '..', 'main.py')
    r = subprocess.run(
        [sys.executable, main_py, 'train', '--dataset-home', str(root),
         '--checkpoint-dir', str(tmp_path / 'ck'), '--model-type',
         'feedforward', '--history-len', '20', '--stride', '5',
         '--hidden-dims', '16', '--batch-size', '16', '--epochs', '2'],
        cwd=str(tmp_path), env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    logs = os.path.join(str(tmp_path), 'outputs', 'logs')
    assert os.path.isdir(logs), 'offline fallback JSONL expected'
    r = subprocess.run(
        [sys.executable, main_py, 'plot-training', '--log-dir', logs,
         '--out', str(tmp_path / 'curves.png')],
        cwd=str(tmp_path), env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(tmp_path / 'curves.png')
    assert 'train/loss' in r.stdout


def test_compare_overlays_runs(tmp_path):
    import json
    for r, base in (('a', 2.0), ('b', 1.0)):
        with open(tmp_path / f'metrics_{r}.jsonl', 'w') as f:
            f.write(json.dumps({'_config': {'model_type': 'feedforward'}})
                    + '\n')
            for i in range(12):
                f.write(json.dumps({'train/loss': base / (i + 1),
                                    'epoch': i}) + '\n')
    out = tmp_path / 'cmp.png'
    from inferbiomechanics_tpu.cli.plot_training_cmd import (
        plot_training_compare,
    )
    finals = plot_training_compare(
        [str(tmp_path / 'metrics_a.jsonl'), str(tmp_path / 'metrics_b.jsonl')],
        str(out), labels=['runA', 'runB'])
    assert out.exists() and out.stat().st_size > 1000
    assert finals['runA']['train/loss'] == 2.0 / 12
    assert finals['runB']['train/loss'] == 1.0 / 12


def test_compare_rejects_disjoint_keys(tmp_path):
    import json
    import pytest
    (tmp_path / 'metrics_a.jsonl').write_text(
        json.dumps({'only_a': 1.0}) + '\n')
    (tmp_path / 'metrics_b.jsonl').write_text(
        json.dumps({'only_b': 1.0}) + '\n')
    from inferbiomechanics_tpu.cli.plot_training_cmd import (
        plot_training_compare,
    )
    with pytest.raises(ValueError, match='no numeric metric keys'):
        plot_training_compare(
            [str(tmp_path / 'metrics_a.jsonl'),
             str(tmp_path / 'metrics_b.jsonl')], str(tmp_path / 'x.png'))
