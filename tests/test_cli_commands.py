"""End-to-end subprocess tests of the CLI command surface.

One real `main.py <cmd>` run per command that previously had only manual
verify-drive coverage (reference surface: src/main.py + src/cli/*,
SURVEY.md §2.12-2.19). Kept small (tiny synthetic data, --short, 1 epoch)
so the whole module stays under a couple of minutes on the CPU mesh.
"""

import csv
import os
import subprocess
import sys

import pytest

from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject

MAIN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    'main.py')


def run_cmd(args, timeout=420):
    env = dict(os.environ, IB_PLATFORM='cpu')
    out = subprocess.run([sys.executable, MAIN, *args],
                         capture_output=True, text=True, env=env,
                         timeout=timeout)
    assert out.returncode == 0, f'{args[0]} failed:\n{out.stderr[-3000:]}'
    return out


@pytest.fixture(scope='module')
def workspace(tmp_path_factory):
    """data/{train,dev} + a trained feedforward checkpoint (1 short epoch)."""
    root = tmp_path_factory.mktemp('cli')
    data = root / 'data'
    for split in ('train', 'dev'):
        os.makedirs(data / split)
        write_synthetic_subject(str(data / split / 's0.b3d'), num_trials=1,
                                trial_length=150, seed=0)
    ckpt = root / 'checkpoints'
    run_cmd(['train', '--dataset-home', str(data), '--checkpoint-dir',
             str(ckpt), '--no-wandb', '--epochs', '1', '--batch-size', '32',
             '--short'])
    assert (ckpt / 'feedforward').is_dir()
    return {'root': root, 'data': str(data), 'ckpt': str(ckpt)}


def test_analyze_runs(workspace):
    out = run_cmd(['analyze', '--dataset-home', workspace['data'],
                   '--checkpoint-dir', workspace['ckpt'], '--no-wandb',
                   '--short'])
    assert 'loss' in out.stdout.lower() or 'err' in out.stdout.lower()


def test_analyze_group_by_trial_summary(workspace):
    run_cmd(['analyze', '--dataset-home', workspace['data'],
             '--checkpoint-dir', workspace['ckpt'], '--no-wandb',
             '--short', '--group-by', 'trial'])
    spath = os.path.join(workspace['ckpt'], 'feedforward',
                         'dev_summary_trial.csv')
    rows = list(csv.reader(open(spath)))
    assert rows[0] == ['trial', 'windows', 'loss', 'force_avg_err',
                       'com_acc_avg_err']
    assert len(rows) > 1
    # every group row aggregates at least one window with finite means
    for key, n, loss, ferr, cerr in rows[1:]:
        assert '/' in key and int(n) >= 1
        assert all(abs(float(v)) < 1e9 for v in (loss, ferr, cerr))
    # ranked worst-first by force error
    ferrs = [float(r[3]) for r in rows[1:]]
    assert ferrs == sorted(ferrs, reverse=True)


def test_create_splits(workspace, tmp_path):
    src = tmp_path / 'root'
    processed = src / 'processed'
    processed.mkdir(parents=True)
    for i in range(4):
        write_synthetic_subject(str(processed / f's{i}.b3d'), num_trials=1,
                                trial_length=60, seed=i)
    run_cmd(['create-splits', '--data-path', str(src)])
    train = list((src / 'train').rglob('*.b3d'))
    dev = list((src / 'dev').rglob('*.b3d'))
    assert train and dev
    assert len(train) + len(dev) == 4


def test_review_file_writes_review_csv(workspace, tmp_path):
    subject = os.path.join(workspace['data'], 'dev', 's0.b3d')
    out_csv = str(tmp_path / 'review.csv')
    run_cmd(['review-file', '--file', subject, '--checkpoint-dir',
             workspace['ckpt'], '--no-wandb', '--out-csv', out_csv])
    rows = list(csv.reader(open(out_csv)))
    assert rows and rows[0]  # header + (possibly zero) segment rows


def test_save_prediction_csv(workspace, tmp_path):
    subject = os.path.join(workspace['data'], 'dev', 's0.b3d')
    out_csv = str(tmp_path / 'pred.csv')
    run_cmd(['save-prediction-csv', '--file', subject, '--checkpoint-dir',
             workspace['ckpt'], '--no-wandb', '--out', out_csv])
    rows = list(csv.reader(open(out_csv)))
    assert len(rows) > 1


def test_pickle_data_and_train_from_pickled(workspace):
    run_cmd(['pickle-data', '--dataset-home', workspace['data']])
    pickled = os.path.join(workspace['data'], 'train_pickled')
    assert os.path.isdir(pickled) and os.listdir(pickled)
    from inferbiomechanics_tpu.data.pickled import PickledDataset
    ds = PickledDataset(pickled)   # metadata adopted from blocks
    assert len(ds) > 0 and ds.num_dofs == 23


def test_visualize_exports_html(workspace, tmp_path):
    out_html = str(tmp_path / 'v.html')
    run_cmd(['visualize', '--static', '--dataset-home', workspace['data'],
             '--checkpoint-dir', workspace['ckpt'], '--no-wandb',
             '--out', out_html, '--short'])
    html = open(out_html).read()
    assert 'DATA' in html and 'canvas' in html


def test_visualize_out_implies_static(workspace, tmp_path):
    """--out without --static still exports HTML instead of being
    silently dropped by the live-viewer default branch."""
    out_html = str(tmp_path / 'v2.html')
    run_cmd(['visualize', '--dataset-home', workspace['data'],
             '--checkpoint-dir', workspace['ckpt'], '--no-wandb',
             '--out', out_html, '--short'])
    assert os.path.exists(out_html)


@pytest.mark.slow
def test_train_sharded_device_data(tmp_path):
    """--device-data sharded: trials split across the 8-device CPU mesh
    (train/sharded_data.py), full CLI train end-to-end."""
    data = tmp_path / 'data'
    for split in ('train', 'dev'):
        os.makedirs(data / split)
        write_synthetic_subject(str(data / split / 's0.b3d'), num_trials=8,
                                trial_length=150, seed=1)
    ckpt = tmp_path / 'ck'
    out = run_cmd(['train', '--dataset-home', str(data), '--checkpoint-dir',
                   str(ckpt), '--no-wandb', '--epochs', '1', '--batch-size',
                   '16', '--device-data', 'sharded'])
    assert 'pod-sharded device data: 8 shards' in out.stderr
    assert (ckpt / 'feedforward').is_dir()


@pytest.mark.slow
def test_train_sharded_lazy_features(tmp_path):
    """--no-materialize-features + --device-data sharded: the host-RAM-
    scaling combination — features stay on disk and the sharded tier
    featurizes per trial during block construction."""
    data = tmp_path / 'data'
    for split in ('train', 'dev'):
        os.makedirs(data / split)
        write_synthetic_subject(str(data / split / 's0.b3d'), num_trials=8,
                                trial_length=150, seed=1)
    ckpt = tmp_path / 'ck'
    out = run_cmd(['train', '--dataset-home', str(data), '--checkpoint-dir',
                   str(ckpt), '--no-wandb', '--epochs', '1', '--batch-size',
                   '16', '--device-data', 'sharded',
                   '--no-materialize-features'])
    assert 'pod-sharded device data: 8 shards' in out.stderr
    assert (ckpt / 'feedforward').is_dir()


def test_train_from_pickled_blocks(workspace):
    """--use-pickled trains from the .npz blocks end-to-end (capability the
    reference left dangling, SURVEY.md 2.4)."""
    if not os.path.isdir(os.path.join(workspace['data'], 'train_pickled')):
        run_cmd(['pickle-data', '--dataset-home', workspace['data']])
    out = run_cmd(['train', '--dataset-home', workspace['data'],
                   '--checkpoint-dir', os.path.join(str(workspace['root']),
                                                    'pickled_ckpt'),
                   '--no-wandb', '--epochs', '1', '--batch-size', '32',
                   '--use-pickled'])
    assert 'Training done' in out.stdout


@pytest.mark.slow
def test_analyze_ensemble(workspace, tmp_path):
    """analyze --ensemble evaluates the vmapped mean of two checkpoints."""
    ckpt2 = tmp_path / 'ck2'
    run_cmd(['train', '--dataset-home', workspace['data'],
             '--checkpoint-dir', str(ckpt2), '--no-wandb', '--epochs', '1',
             '--batch-size', '32', '--short', '--seed', '1'])
    out = run_cmd(['analyze', '--dataset-home', workspace['data'],
                   '--checkpoint-dir', workspace['ckpt'], '--no-wandb',
                   '--batch-size', '8', '--short',
                   '--ensemble',
                   os.path.join(workspace['ckpt'], 'feedforward'),
                   os.path.join(str(ckpt2), 'feedforward')])
    assert 'ensemble of 2' in out.stdout
    assert 'final report' in out.stdout
    # TTA composes with the ensemble (each member symmetrized before
    # the across-member mean)
    out = run_cmd(['analyze', '--dataset-home', workspace['data'],
                   '--checkpoint-dir', workspace['ckpt'], '--no-wandb',
                   '--batch-size', '8', '--short', '--tta-mirror',
                   '--ensemble',
                   os.path.join(workspace['ckpt'], 'feedforward'),
                   os.path.join(str(ckpt2), 'feedforward')])
    assert 'mirror test-time augmentation enabled' in out.stdout
    assert 'final report' in out.stdout


def test_doctor(workspace):
    out = run_cmd(['doctor', '--dataset-home', workspace['data'],
                   '--transfer-mb', '0.5'])
    assert 'compile probe' in out.stdout
    assert 'host->device' in out.stdout
    assert 'subjects' in out.stdout
    assert 'DOCTOR: healthy' in out.stdout


@pytest.mark.slow
def test_sigterm_preemption_checkpoint(tmp_path):
    """SIGTERM mid-training writes a mid-epoch checkpoint and exits 0;
    the same command resumes from it (TPU-preemption safety)."""
    import signal
    import time as _time
    data = tmp_path / 'data'
    os.makedirs(data / 'train')
    os.makedirs(data / 'dev')
    write_synthetic_subject(str(data / 'train' / 's0.b3d'), num_trials=2,
                            trial_length=1500, seed=0)
    write_synthetic_subject(str(data / 'dev' / 's0.b3d'), num_trials=1,
                            trial_length=150, seed=1)
    ckpt = tmp_path / 'ck'
    env = dict(os.environ, IB_PLATFORM='cpu')
    args = [sys.executable, MAIN, 'train', '--dataset-home', str(data),
            '--checkpoint-dir', str(ckpt), '--no-wandb', '--epochs', '500',
            '--batch-size', '16', '--device-data', 'off']
    proc = subprocess.Popen(args, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    # let it get past compile and into the step loop, then preempt
    deadline = _time.time() + 240
    ckdir = ckpt / 'feedforward'
    _time.sleep(30)
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=max(10.0, deadline - _time.time()))
    assert proc.returncode == 0, out[-3000:]
    assert 'preempted' in out
    assert 'preemption checkpoint written' in out, out[-2000:]
    from inferbiomechanics_tpu.train.checkpoint import list_checkpoints
    cks = list_checkpoints(str(ckdir))
    assert cks, out[-2000:]
    epoch, batch, _path = cks[-1]
    # resume completes (clamped to a quick finish)
    out2 = run_cmd(['train', '--dataset-home', str(data),
                    '--checkpoint-dir', str(ckpt), '--no-wandb',
                    '--epochs', str(epoch + 1), '--batch-size', '16',
                    '--device-data', 'off'])
    assert 'Training done' in out2.stdout


@pytest.mark.slow
def test_train_grad_accum(workspace, tmp_path):
    """--grad-accum-steps trains end-to-end (beyond parity: effective
    batches past activation-memory fit); indivisible splits fail fast."""
    ckpt = tmp_path / 'ck_ga'
    run_cmd(['train', '--dataset-home', workspace['data'],
             '--checkpoint-dir', str(ckpt), '--no-wandb', '--epochs', '1',
             '--batch-size', '32', '--grad-accum-steps', '2', '--short'])
    assert (ckpt / 'feedforward').is_dir()
    env = dict(os.environ, IB_PLATFORM='cpu')
    bad = subprocess.run(
        [sys.executable, MAIN, 'train', '--dataset-home', workspace['data'],
         '--checkpoint-dir', str(tmp_path / 'ck_bad'), '--no-wandb',
         '--epochs', '1', '--batch-size', '32', '--grad-accum-steps', '8',
         '--short'],
        capture_output=True, text=True, env=env, timeout=300)
    assert bad.returncode != 0
    assert 'grad-accum-steps' in (bad.stderr + bad.stdout)


def test_train_bf16_grad_allreduce(workspace, tmp_path):
    """--grad-allreduce-dtype bf16 trains end-to-end on an 8-device mesh
    (explicit shard_map psum path)."""
    ckpt = tmp_path / 'ck_bf16ar'
    env = dict(os.environ, IB_PLATFORM='cpu',
               XLA_FLAGS=(os.environ.get('XLA_FLAGS', '')
                          + ' --xla_force_host_platform_device_count=8').strip())
    out = subprocess.run(
        [sys.executable, MAIN, 'train', '--dataset-home', workspace['data'],
         '--checkpoint-dir', str(ckpt), '--no-wandb', '--epochs', '1',
         '--batch-size', '32', '--grad-allreduce-dtype', 'bf16', '--short'],
        capture_output=True, text=True, env=env, timeout=420)
    assert out.returncode == 0, out.stderr[-3000:]
    assert (ckpt / 'feedforward').is_dir()


def test_analyze_bootstrap_cis(workspace):
    out = run_cmd(['analyze', '--dataset-home', workspace['data'],
                   '--checkpoint-dir', workspace['ckpt'], '--no-wandb',
                   '--short', '--bootstrap', '200'])
    assert 'bootstrap 95% CIs' in out.stdout
    # every CI line is "name: mid [lo, hi]" with lo <= mid <= hi
    import re
    lines = [l for l in out.stdout.splitlines() if re.search(r'\[.*,.*\]', l)
             and 'avg_err' in l]
    assert lines
    for l in lines:
        m = re.search(r': ([-\d.]+) \[([-\d.]+), ([-\d.]+)\]', l)
        assert m, l
        mid, lo, hi = map(float, m.groups())
        assert lo <= mid <= hi


@pytest.mark.slow
def test_sweep_sigterm_preemption_and_resume(tmp_path):
    """SIGTERM mid-sweep saves the stacked grid state at the epoch
    boundary and exits 0; rerunning the same sweep resumes it."""
    import signal
    import time as _time
    data = tmp_path / 'data'
    os.makedirs(data / 'train')
    os.makedirs(data / 'dev')
    write_synthetic_subject(str(data / 'train' / 's0.b3d'), num_trials=2,
                            trial_length=900, seed=0)
    write_synthetic_subject(str(data / 'dev' / 's0.b3d'), num_trials=1,
                            trial_length=150, seed=1)
    ckpt = tmp_path / 'ck'
    env = dict(os.environ, IB_PLATFORM='cpu')
    args = [sys.executable, MAIN, 'sweep', '--dataset-home', str(data),
            '--checkpoint-dir', str(ckpt), '--no-wandb', '--epochs', '500',
            '--batch-size', '16', '--lrs', '1e-3', '1e-2', '--seeds', '0']
    proc = subprocess.Popen(args, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    _time.sleep(45)     # past compile, into the epoch loop
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, out[-3000:]
    assert 'sweep preempted' in out, out[-2000:]
    from inferbiomechanics_tpu.train.checkpoint import list_checkpoints
    # sweep roots its checkpoints at {dir}/sweep/{model}/{shape_tag}
    grids = list((ckpt / 'sweep').rglob('_grid'))
    assert grids, out[-2000:]
    grid_dir = grids[0]
    cks = list_checkpoints(str(grid_dir))
    assert cks and (grid_dir / 'sweep_state.json').exists(), out[-2000:]
    epoch = cks[-1][0]
    # resume to a quick finish
    out2 = run_cmd(['sweep', '--dataset-home', str(data),
                    '--checkpoint-dir', str(ckpt), '--no-wandb',
                    '--epochs', str(epoch + 2), '--batch-size', '16',
                    '--lrs', '1e-3', '1e-2', '--seeds', '0'], timeout=600)
    assert 'sweep resume: grid state restored' in out2.stdout + out2.stderr


@pytest.mark.slow
def test_analyze_chunked_eval_matches_per_batch(workspace, tmp_path):
    """--eval-chunk-steps K (default 64) scans K batches per dispatch;
    its per-window CSV rows must match per-batch dispatch, including
    across the trailing short batch that gets its own chunk shape."""
    base = ['analyze', '--dataset-home', workspace['data'],
            '--checkpoint-dir', workspace['ckpt'], '--no-wandb',
            '--short', '--batch-size', '4']
    csv_path = os.path.join(workspace['ckpt'], 'feedforward',
                            'dev_analysis.csv')

    def rows_after(args):
        if os.path.exists(csv_path):
            os.remove(csv_path)
        run_cmd(args)
        return list(csv.reader(open(csv_path)))

    per_batch = rows_after(base + ['--eval-chunk-steps', '1'])
    chunked = rows_after(base + ['--eval-chunk-steps', '3'])
    os.remove(csv_path)
    assert len(per_batch) == len(chunked) > 1
    for r1, r2 in zip(per_batch, chunked):
        assert r1[:2] == r2[:2]
        for v1, v2 in zip(r1[2:], r2[2:]):
            assert abs(float(v1) - float(v2)) <= 1e-5 * max(
                1.0, abs(float(v1))), (r1, r2)


@pytest.mark.slow
def test_analyze_analytical_chunked_matches_per_batch(workspace):
    """The analytical baseline's chunked scan dispatch (round 5) must
    reproduce per-batch dispatch exactly — per-window CSV rows AND the
    inverse-dynamics tau report, whose traceable core runs inside the
    scan (the per-dispatch tunnel tax dominated this path; see
    scripts/probe_analytical_floor.py)."""
    base = ['analyze', '--dataset-home', workspace['data'],
            '--checkpoint-dir', workspace['ckpt'], '--no-wandb',
            '--short', '--batch-size', '4', '--model-type', 'analytical',
            '--compute-report']
    csv_path = os.path.join(workspace['ckpt'], 'analytical',
                            'dev_analysis.csv')

    def run_variant(args):
        if os.path.exists(csv_path):
            os.remove(csv_path)
        out = run_cmd(args)
        text = out.stdout + out.stderr
        tau = [ln.strip() for ln in text.splitlines()
               if 'Inverse Dynamics' in ln]
        return list(csv.reader(open(csv_path))), tau

    per_batch, tau1 = run_variant(base + ['--eval-chunk-steps', '1'])
    chunked, tau2 = run_variant(base + ['--eval-chunk-steps', '3'])
    os.remove(csv_path)
    assert len(per_batch) == len(chunked) > 1
    for r1, r2 in zip(per_batch, chunked):
        assert r1[:2] == r2[:2]
        for v1, v2 in zip(r1[2:], r2[2:]):
            assert abs(float(v1) - float(v2)) <= 1e-4 * max(
                1.0, abs(float(v1))), (r1, r2)
    assert tau1 and tau2 and tau1 == tau2, (tau1, tau2)
