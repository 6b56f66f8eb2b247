"""run_config.json sidecar: provenance written by training, consumed by
analyze/serve/export warnings and the partial-denoise proposal loader.

The reference saves bare state_dicts (train.py:270-278), so a user must
re-spell every architecture flag at analyze time and a typo surfaces as
an opaque torch size-mismatch; here the checkpoint dir records its own
architecture (train/run_config.py).
"""

import json
import logging
import os
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.config import Config
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.train.run_config import (
    RUN_CONFIG_NAME, apply_architecture, architecture_mismatches,
    load_run_config, save_run_config, warn_on_architecture_mismatch,
)


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp('rcdata')
    write_synthetic_subject(str(d / 's0.b3d'), num_trials=2,
                            trial_length=200, seed=0)
    return WindowDataset(str(d), window_size=20, stride=5)


@pytest.fixture(scope='module')
def ds_af(tmp_path_factory):
    d = tmp_path_factory.mktemp('rcdata_af')
    write_synthetic_subject(str(d / 's0.b3d'), num_trials=2,
                            trial_length=200, seed=0)
    return WindowDataset(str(d), window_size=20, stride=5,
                         output_data_format='all_frames')


def _cfg(ckpt: str, **kw) -> Config:
    base = dict(window_size=20, stride=5, model_type='feedforward',
                checkpoint_dir=ckpt, epochs=1, batch_size=16,
                opt_type='adam', learning_rate=1e-3, device_data='off',
                checkpoint_every_batches=1000, log_every_batches=1000,
                no_wandb=True)
    base.update(kw)
    return Config(**base)


def test_save_load_roundtrip(tmp_path):
    cfg = _cfg(str(tmp_path), hidden_dims=[8, 4], activation='relu')
    path = save_run_config(str(tmp_path), cfg)
    assert path and os.path.exists(path)
    sc = load_run_config(str(tmp_path))
    assert sc['hidden_dims'] == [8, 4]
    assert sc['activation'] == 'relu'
    assert sc['model_type'] == 'feedforward'
    assert sc['schema_version'] == 1
    # loading via a checkpoint FILE path inside the dir also works
    assert load_run_config(os.path.join(str(tmp_path),
                                        'epoch_0_batch_0.ckpt')) is not None


def test_load_missing_and_corrupt(tmp_path, caplog):
    assert load_run_config(str(tmp_path / 'nope')) is None
    bad = tmp_path / 'bad'
    bad.mkdir()
    (bad / RUN_CONFIG_NAME).write_text('{not json')
    with caplog.at_level(logging.WARNING):
        assert load_run_config(str(bad)) is None
    assert 'unreadable' in caplog.text


def test_apply_and_mismatches(tmp_path):
    trained = _cfg(str(tmp_path), hidden_dims=[8, 4], activation='relu',
                   batchnorm=True)
    save_run_config(str(tmp_path), trained)
    sc = load_run_config(str(tmp_path))

    cli = _cfg(str(tmp_path))   # defaults: [512, 512] sigmoid, no bn
    lines = architecture_mismatches(cli, sc)
    assert any(l.startswith('hidden_dims') for l in lines)
    assert any(l.startswith('activation') for l in lines)
    assert any(l.startswith('batchnorm') for l in lines)

    filled = apply_architecture(cli, sc)
    assert filled.hidden_dims == [8, 4]
    assert filled.activation == 'relu'
    assert filled.batchnorm is True
    assert architecture_mismatches(filled, sc) == []
    # non-architecture fields untouched
    assert filled.checkpoint_dir == cli.checkpoint_dir


def test_warn_on_mismatch_logs(tmp_path, caplog):
    save_run_config(str(tmp_path), _cfg(str(tmp_path), hidden_dims=[8]))
    with caplog.at_level(logging.WARNING):
        lines = warn_on_architecture_mismatch(_cfg(str(tmp_path)),
                                              str(tmp_path), 'test')
    assert lines and 'hidden_dims' in caplog.text
    # clean configs and sidecar-less dirs stay silent
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        assert warn_on_architecture_mismatch(
            _cfg(str(tmp_path), hidden_dims=[8]), str(tmp_path)) == []
        assert warn_on_architecture_mismatch(
            _cfg(str(tmp_path)), str(tmp_path / 'no_sidecar')) == []
    assert caplog.text == ''


def test_train_writes_sidecar(ds, tmp_path):
    from inferbiomechanics_tpu.train.loop import train
    cfg = _cfg(str(tmp_path / 'run'), hidden_dims=[8], activation='relu')
    train(cfg, ds, None, max_batches_per_epoch=2)
    sc = load_run_config(str(tmp_path / 'run'))
    assert sc is not None
    assert sc['hidden_dims'] == [8]
    assert sc['activation'] == 'relu'
    assert sc['model_type'] == 'feedforward'


def test_diffusion_train_writes_sidecar(ds_af, tmp_path):
    from inferbiomechanics_tpu.train.diffusion_loop import train_diffusion
    cfg = _cfg(str(tmp_path / 'dr'), model_type='diffusion',
               output_data_format='all_frames', d_model=16, num_layers=1,
               num_heads=2, diffusion_timesteps=8)
    train_diffusion(cfg, ds_af, None, max_batches_per_epoch=2)
    sc = load_run_config(str(tmp_path / 'dr'))
    assert sc is not None
    assert sc['model_type'] == 'diffusion'
    assert sc['d_model'] == 16
    assert sc['diffusion_timesteps'] == 8


def test_proposal_autoconfigures_from_sidecar(ds_af, tmp_path):
    """make_partial_proposal_fn rebuilds the proposal from the
    checkpoint dir's sidecar: the analyze-side CLI config carries the
    DEFAULT hidden dims, the proposal was trained with different ones,
    and the load still succeeds (shape error on old behavior)."""
    from inferbiomechanics_tpu.models.diffusion import (
        make_partial_proposal_fn,
    )
    from inferbiomechanics_tpu.train.loop import train

    prop_dir = str(tmp_path / 'prop')
    train(_cfg(prop_dir, output_data_format='all_frames',
               hidden_dims=[8], activation='relu'),
          ds_af, None, max_batches_per_epoch=2)
    assert load_run_config(prop_dir) is not None

    # the diffusion-side config: default [512, 512] sigmoid
    cli = _cfg(str(tmp_path / 'diff'), model_type='diffusion',
               output_data_format='all_frames')
    sample = ds_af.gather(np.arange(4))
    propose = make_partial_proposal_fn(cli, ds_af, prop_dir, sample.inputs)
    out = propose(jnp.asarray(sample.inputs))
    assert out.shape[0] == 4 and out.ndim == 3
    assert np.isfinite(np.asarray(out)).all()


def test_proposal_sidecar_rejects_bad_proposals(ds_af, tmp_path):
    from inferbiomechanics_tpu.models.diffusion import (
        make_partial_proposal_fn,
    )
    sample = ds_af.gather(np.arange(4))
    cli = _cfg(str(tmp_path / 'd'), model_type='diffusion',
               output_data_format='all_frames')

    # a last_frame proposal cannot seed whole-window chains
    lf = tmp_path / 'lf'
    lf.mkdir()
    save_run_config(str(lf), _cfg(str(lf), output_data_format='last_frame'))
    with pytest.raises(ValueError, match='all_frames'):
        make_partial_proposal_fn(cli, ds_af, str(lf), sample.inputs)

    # a diffusion checkpoint is not a proposal
    dd = tmp_path / 'dd'
    dd.mkdir()
    save_run_config(str(dd), _cfg(str(dd), model_type='diffusion',
                                  output_data_format='all_frames'))
    with pytest.raises(ValueError, match='regression'):
        make_partial_proposal_fn(cli, ds_af, str(dd), sample.inputs)

    # window/stride drift breaks the shared-window contract
    ws = tmp_path / 'ws'
    ws.mkdir()
    save_run_config(str(ws), _cfg(str(ws), output_data_format='all_frames',
                                  window_size=40))
    with pytest.raises(ValueError, match='window/stride'):
        make_partial_proposal_fn(cli, ds_af, str(ws), sample.inputs)


def test_sweep_writes_per_config_sidecars(ds, tmp_path):
    from inferbiomechanics_tpu.train.sweep import run_sweep
    cfg = _cfg(str(tmp_path / 'sw'), hidden_dims=[8], epochs=1)
    run_sweep(cfg, ds, None, lrs=[1e-3, 1e-2], seeds=[0],
              max_batches_per_epoch=2)
    for lr in ('lr0.001', 'lr0.01'):
        sc = load_run_config(str(tmp_path / 'sw' / f'{lr}_seed0'))
        assert sc is not None, lr
        assert sc['hidden_dims'] == [8]
    assert load_run_config(
        str(tmp_path / 'sw' / 'lr0.01_seed0'))['learning_rate'] == 1e-2


class _Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def test_use_run_config_if_requested(tmp_path):
    from inferbiomechanics_tpu.train.run_config import (
        use_run_config_if_requested,
    )
    trained = _cfg(str(tmp_path / 'feedforward'), hidden_dims=[8],
                   activation='relu', window_size=20)
    save_run_config(str(tmp_path / 'feedforward'), trained)

    cli = _cfg(str(tmp_path))   # checkpoint_dir root; subdir by model_type
    # off: untouched
    assert use_run_config_if_requested(
        cli, _Args(use_run_config=False)).hidden_dims == [512, 512]
    # on: architecture (incl. window geometry) from the sidecar
    filled = use_run_config_if_requested(cli, _Args(use_run_config=True))
    assert filled.hidden_dims == [8]
    assert filled.activation == 'relu'
    assert filled.window_size == 20
    # on + no sidecar: clear SystemExit naming the dir
    with pytest.raises(SystemExit, match='no run_config.json'):
        use_run_config_if_requested(
            _cfg(str(tmp_path / 'empty')), _Args(use_run_config=True))


def test_cli_analyze_use_run_config(tmp_path):
    """End-to-end: train with a NON-default architecture + window
    geometry, then analyze with --use-run-config and zero architecture
    flags (would die with a shape/window mismatch without the sidecar)."""
    import subprocess
    import sys
    main = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'main.py')

    def run_cmd(args):
        env = dict(os.environ, IB_PLATFORM='cpu')
        out = subprocess.run([sys.executable, main, *args],
                             capture_output=True, text=True, env=env,
                             timeout=420)
        assert out.returncode == 0, f'{args[0]} failed:\n{out.stderr[-3000:]}'
        return out

    data = tmp_path / 'data'
    for split in ('train', 'dev'):
        os.makedirs(data / split)
        write_synthetic_subject(str(data / split / 's0.b3d'), num_trials=1,
                                trial_length=150, seed=0)
    ckpt = tmp_path / 'ck'
    run_cmd(['train', '--dataset-home', str(data), '--checkpoint-dir',
             str(ckpt), '--no-wandb', '--epochs', '1', '--batch-size', '32',
             '--history-len', '20', '--hidden-dims', '8',
             '--activation', 'relu'])
    out = run_cmd(['analyze', '--dataset-home', str(data),
                   '--checkpoint-dir', str(ckpt), '--no-wandb',
                   '--use-run-config'])
    assert 'Force Avg Err' in out.stdout


def test_resume_architecture_drift_is_an_error(ds, tmp_path, caplog):
    """Resuming training with shape-critical flag drift HARD-FAILS:
    flax restores params by name and Dense takes its width from the
    param shape, so without the gate the run would silently keep
    training the checkpoint's old architecture under the new flags."""
    from inferbiomechanics_tpu.train.loop import train
    d = str(tmp_path / 'r')
    train(_cfg(d, hidden_dims=[8]), ds, None, max_batches_per_epoch=2)
    with pytest.raises(ValueError, match='hidden_dims'):
        train(_cfg(d, hidden_dims=[16]), ds, None, max_batches_per_epoch=2)
    # non-critical drift (activation carries no params) only warns
    with caplog.at_level(logging.WARNING):
        train(_cfg(d, hidden_dims=[8], activation='relu'), ds, None,
              max_batches_per_epoch=2)
    assert 'activation' in caplog.text and 'resume' in caplog.text


def test_convert_checkpoint_writes_partial_sidecar(tmp_path):
    """convert-checkpoint infers what a torch state dict reveals
    (family, hidden dims, batchnorm) into a partial sidecar; the
    partial flag keeps consumers honest about unrecorded fields."""
    torch = pytest.importorskip('torch')
    from inferbiomechanics_tpu.train.run_config import (
        apply_architecture, architecture_mismatches,
    )
    from inferbiomechanics_tpu.torch_compat import convert_torch_checkpoint

    net = torch.nn.Sequential(
        torch.nn.Linear(30, 8), torch.nn.Sigmoid(),
        torch.nn.Linear(8, 4), torch.nn.Sigmoid(),
        torch.nn.Linear(4, 30))   # 30 = _PER_FRAME * 1 output frame
    model = torch.nn.Module()
    model.net = net
    pt = tmp_path / 'epoch_3_batch_0.pt'
    torch.save({'model_state_dict': model.state_dict()}, str(pt))

    out_dir = str(tmp_path / 'conv')
    convert_torch_checkpoint(str(pt), out_dir)
    sc = load_run_config(out_dir)
    assert sc is not None and sc['partial'] is True
    assert sc['model_type'] == 'feedforward'
    assert sc['hidden_dims'] == [8, 4]
    assert sc['batchnorm'] is False
    assert 'activation' not in sc          # not inferable
    assert 'output_data_format' not in sc  # 1 frame is ambiguous

    # partial sidecars only auto-fill / warn on fields they record
    cli = _cfg(out_dir)
    filled = apply_architecture(cli, sc)
    assert filled.hidden_dims == [8, 4]
    assert filled.window_size == cli.window_size
    assert all(not l.startswith('activation')
               for l in architecture_mismatches(cli, sc))
