"""Infrastructure tests: loader, inference engine, viewer, logger, CLI."""

import json
import os
import re
import subprocess
import sys

import jax
import numpy as np
import pytest

from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.loader import PrefetchLoader
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject


@pytest.fixture(scope='module')
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('infra')
    for split in ('train', 'dev'):
        os.makedirs(d / split, exist_ok=True)
        write_synthetic_subject(str(d / split / 's0.b3d'), num_trials=2,
                                trial_length=200, seed=0)
    return str(d)


@pytest.fixture(scope='module')
def ds(data_dir):
    return WindowDataset(os.path.join(data_dir, 'train'), window_size=20,
                         stride=5, skip_loading_skeletons=True)


def test_prefetch_loader_full_epoch(ds):
    loader = PrefetchLoader(ds, batch_size=32)
    batches = list(loader.epoch(seed=0))
    assert len(batches) == len(ds) // 32
    for b in batches:
        assert b.inputs.shape == (32, 4, ds.num_input_channels)
        # device-resident
        assert isinstance(b.inputs, jax.Array)


def test_prefetch_loader_early_stop_cleanup(ds):
    loader = PrefetchLoader(ds, batch_size=32)
    it = loader.epoch(seed=0)
    next(it)
    it.close()   # generator close must not deadlock the producer thread


def test_trial_filter(data_dir):
    all_ds = WindowDataset(os.path.join(data_dir, 'train'), window_size=20,
                           stride=5, skip_loading_skeletons=True)
    f_ds = WindowDataset(os.path.join(data_dir, 'train'), window_size=20,
                         stride=5, skip_loading_skeletons=True,
                         trial_filter='trial_0')
    assert 0 < len(f_ds) < len(all_ds)
    assert set(np.unique(f_ds.win_trial)) == {0}


def test_inspect_dof_indices(ds, capsys):
    ds.inspect_dof_indices()   # must not raise on the standard skeleton


def test_predictor_trial_predictions(data_dir):
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.inference import Predictor
    ds = WindowDataset(os.path.join(data_dir, 'dev'), window_size=20, stride=5,
                       skip_loading_skeletons=True)
    cfg = Config(window_size=20, stride=5, model_type='feedforward')
    pred = Predictor(cfg, '/nonexistent_ckpts', ds)   # untrained fallback
    out = pred.predict_trial(0, 0)
    assert out is not None
    assert out.window_starts.shape == out.per_window_loss.shape
    assert np.isfinite(out.per_window_loss).all()
    forces, cops = pred.predict_forces_at_frames(out)
    # force-share <0.3 zeroing: each row has 0 or full vectors per foot
    fv = forces.reshape(-1, 2, 3)
    mags = np.linalg.norm(fv, axis=2)
    total = mags.sum(axis=1)
    share = mags / np.maximum(total[:, None], 1e-9)
    assert ((share > 0.3) | (mags == 0)).all()


def test_predictor_tta_mirror(data_dir):
    """Predictor(tta_mirror=True) outputs equal the half-sum of the plain
    prediction and the un-mirrored prediction of the mirrored window —
    the same semantics as analyze/serve --tta-mirror, now on the
    visualize-file/save-prediction-csv/review-file path."""
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.inference import Predictor
    from inferbiomechanics_tpu.train.augment import (
        mirror_outputs, spec_from_dataset,
    )
    import jax.numpy as jnp
    ds = WindowDataset(os.path.join(data_dir, 'dev'), window_size=20, stride=5,
                       skip_loading_skeletons=True)
    cfg = Config(window_size=20, stride=5, model_type='feedforward')
    plain = Predictor(cfg, '/nonexistent_ckpts', ds)
    tta = Predictor(cfg, '/nonexistent_ckpts', ds, tta_mirror=True)
    idx = np.arange(4)
    o_tta, _, _ = tta.predict_windows(idx)

    o1, _, _ = plain.predict_windows(idx)
    spec = spec_from_dataset(ds)
    x = np.asarray(ds.gather(idx).inputs)
    o2 = plain._fwd(plain.state.params,
                    jnp.asarray(spec.mirror_inputs(jnp.asarray(x))),
                    jnp.asarray(ds.gather(idx).labels))[0]
    o2 = mirror_outputs(spec, ds.lab_offsets, o2)
    for k in o1:
        np.testing.assert_allclose(
            np.asarray(o_tta[k]),
            0.5 * (np.asarray(o1[k]) + np.asarray(o2[k])), atol=2e-3)


def test_viewer_payload_and_export(data_dir, tmp_path):
    from inferbiomechanics_tpu.cli.visualize_file_cmd import build_viz_payload
    from inferbiomechanics_tpu.viz.viewer import export_html
    ds = WindowDataset(os.path.join(data_dir, 'dev'), window_size=20, stride=5,
                       skip_loading_skeletons=True)
    payload = build_viz_payload(ds, 0, 0, predictor=None)
    assert len(payload['frames']) == 200
    f0 = payload['frames'][0]
    assert len(f0['joints']) == 12
    assert len(f0['label_forces']) == 2
    path = export_html(str(tmp_path / 'v.html'), payload, 'test')
    html = open(path).read()
    m = re.search(r'const DATA = (\{.*?\});\n', html, re.S)
    assert m and json.loads(m.group(1))['dt'] == payload['dt']


def test_metric_logger_jsonl_fallback(tmp_path):
    from inferbiomechanics_tpu.utils.wandb_compat import MetricLogger
    # no WANDB_API_KEY + offline wandb may still import; force the file path
    ml = MetricLogger(enabled=True, log_dir=str(tmp_path))
    ml.log({'train/loss': 1.5})
    ml.finish()
    # either wandb offline accepted it, or a jsonl exists
    assert ml.backend in ('wandb', 'jsonl')
    files = os.listdir(tmp_path)
    if files:
        line = open(os.path.join(tmp_path, files[0])).readlines()[-1]
        assert json.loads(line)['train/loss'] == 1.5


def test_metric_logger_fallback_is_observable(tmp_path, monkeypatch, caplog):
    """A wandb failure must WARN with the reason and stamp the run config
    with logger='jsonl' (round-4 VERDICT #9)."""
    import builtins
    import logging as _logging
    from inferbiomechanics_tpu.utils.wandb_compat import MetricLogger

    real_import = builtins.__import__

    def no_wandb(name, *a, **k):
        if name == 'wandb':
            raise ImportError('wandb disabled for test')
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, '__import__', no_wandb)
    with caplog.at_level(_logging.WARNING,
                         logger='inferbiomechanics_tpu.utils.wandb_compat'):
        ml = MetricLogger(enabled=True, config={'lr': 0.1},
                          log_dir=str(tmp_path))
    assert ml.backend == 'jsonl'
    assert any('wandb unavailable' in r.message for r in caplog.records)
    ml.log({'x': 1.0})
    ml.finish()
    lines = [json.loads(l) for f in os.listdir(tmp_path)
             for l in open(os.path.join(tmp_path, f))]
    cfg = next(l['_config'] for l in lines if '_config' in l)
    assert cfg['logger'] == 'jsonl' and cfg['lr'] == 0.1


def test_cli_sanity_check_subprocess(data_dir):
    env = dict(os.environ, IB_PLATFORM='cpu')
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'main.py'),
         'sanity-check', '--dataset-home', data_dir],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'windows over' in out.stdout
    assert 'WARNING' not in out.stdout  # no non-finite values


def test_sharding_rules_tp_partition():
    import jax.numpy as jnp
    from inferbiomechanics_tpu.models import get_model
    from inferbiomechanics_tpu.parallel import make_mesh
    from inferbiomechanics_tpu.parallel.sharding_rules import shard_params_for_mesh
    from inferbiomechanics_tpu.train import create_train_state, make_optimizer

    mesh = make_mesh(model_parallel=2)
    model = get_model('transformer', num_dofs=23, num_contact_bodies=2,
                      history_len=20, stride=5, root_history_len=10,
                      d_model=128, num_layers=1)
    x = jnp.zeros((8, 4, 177))
    state = create_train_state(model, jax.random.PRNGKey(0), x,
                               make_optimizer('adam', 1e-3))
    sharded = shard_params_for_mesh(mesh, state)
    specs = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(sharded.params)[0]:
        name = '/'.join(str(getattr(k, 'key', k)) for k in path)
        specs[name] = leaf.sharding.spec
    # at least one wide kernel is model-sharded; biases replicated
    assert any('model' in str(s) for s in specs.values()), specs
    bias_specs = [s for n, s in specs.items() if n.endswith('bias')]
    assert all('model' not in str(s) for s in bias_specs)


def test_all_ten_commands_registered():
    """The reference's full command surface exists (main.py:16-26 parity)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'ib_main', os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'main.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = {c.name for c in mod.build_commands()}
    # the reference's 10 commands, plus the beyond-parity legacy
    # converter, inference server, torch-checkpoint converter, the
    # vmapped hyperparameter sweep, and environment diagnostics
    assert names == {'train', 'visualize', 'visualize-file', 'create-splits',
                     'analyze', 'sanity-check', 'make-plots', 'review-file',
                     'pickle-data', 'save-prediction-csv', 'convert-b3d',
                     'serve', 'convert-checkpoint', 'sweep', 'doctor',
                     'export', 'plot-training'}


def test_reference_flag_spellings_parse():
    """Drop-in compat: the reference's exact flag spellings parse —
    --device (train.py:33), --raw-data (make_plots.py:47),
    --data-folder (create_splits.py:17) — even where this framework
    renamed or automated the underlying knob."""
    import argparse
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'ib_main2', os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'main.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    parser = argparse.ArgumentParser()
    subparsers = parser.add_subparsers(dest='command')
    for command in mod.build_commands():
        command.register_subcommand(subparsers)
    args = parser.parse_args(['train', '--device', 'cuda:0'])
    assert args.device == 'cuda:0'
    args = parser.parse_args(['make-plots', '--raw-data',
                              '--out-path', '/tmp/x'])
    assert args.raw and args.out_dir == '/tmp/x'
    args = parser.parse_args(['create-splits', '--data-folder', '/tmp/y'])
    assert args.data_path == '/tmp/y'


def test_every_cli_exposed_config_field_reaches_config():
    """config_from_args copies via an explicit field map — a recurring
    field-drop hazard (round 4: three new flags parsed fine but were
    silently ignored). Reflectively mutate every args attribute that
    names a Config field and assert the change lands in the Config."""
    import argparse
    import dataclasses
    from inferbiomechanics_tpu.config import (Config, add_config_flags,
                                              config_from_args)
    parser = argparse.ArgumentParser()
    add_config_flags(parser)
    args = parser.parse_args([])
    alias = {'window_size': 'history_len'}   # config field -> args attr
    missing = []
    for f in dataclasses.fields(Config):
        attr = alias.get(f.name, f.name)
        if not hasattr(args, attr):
            continue   # not CLI-exposed (programmatic-only field)
        default = getattr(args, attr)
        if isinstance(default, bool):
            sentinel = not default
        elif isinstance(default, int):
            sentinel = (default or 0) + 7
        elif isinstance(default, float):
            sentinel = (default or 0.0) + 0.5
        elif isinstance(default, str) or default is None:
            sentinel = 'zz_sentinel'
        elif isinstance(default, list):
            sentinel = list(default) + [99]
        else:
            continue
        setattr(args, attr, sentinel)
        got = getattr(config_from_args(args), f.name)
        if got != sentinel:
            missing.append(f.name)
        setattr(args, attr, default)
    assert not missing, (f'CLI flags parsed but dropped by '
                         f'config_from_args: {missing}')
