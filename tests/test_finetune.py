"""Transfer learning: --init-from-checkpoint warm start + --freeze-params.

Beyond parity — the reference can only resume whole runs in place
(abstract_command.py:86-120); it has no warm-start or layer-freezing
story. These test the full train() wiring on the host and
device-resident tiers plus the diffusion loop's EMA seeding.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.config import Config
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.train.checkpoint import (
    list_checkpoints, resolve_checkpoint_path,
)
from inferbiomechanics_tpu.train.loop import build_model_for_dataset, train
from inferbiomechanics_tpu.train.optimizers import make_optimizer
from inferbiomechanics_tpu.train.state import create_train_state


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp('ftdata')
    write_synthetic_subject(str(d / 's0.b3d'), num_trials=2,
                            trial_length=200, seed=0)
    return WindowDataset(str(d), window_size=20, stride=5)


def _params_of(cfg: Config, ds, path: str):
    """Load a checkpoint file's params structured like cfg's model."""
    from inferbiomechanics_tpu.train.checkpoint import load_checkpoint_file
    model = build_model_for_dataset(cfg, ds)
    sample = ds.gather(np.arange(8))
    st = create_train_state(model, jax.random.PRNGKey(7),
                            jnp.asarray(sample.inputs),
                            make_optimizer('sgd', 0.0))
    st, _e, _b = load_checkpoint_file(st, path)
    return jax.device_get(st.params)


def _cfg(ckpt: str, **kw) -> Config:
    base = dict(window_size=20, stride=5, model_type='feedforward',
                checkpoint_dir=ckpt, epochs=1, batch_size=16,
                opt_type='adam', learning_rate=1e-3, device_data='off',
                checkpoint_every_batches=1000, log_every_batches=1000,
                no_wandb=True)
    base.update(kw)
    return Config(**base)


def test_warm_start_and_freeze(ds, tmp_path):
    """Stage 1 trains from scratch; stage 2 warm-starts from stage 1's
    checkpoint with Dense_0 frozen: the frozen subtree stays bitwise at
    the source values while the rest moves."""
    src_dir = str(tmp_path / 'src')
    cfg1 = _cfg(src_dir)
    train(cfg1, ds, None, max_batches_per_epoch=4)
    src_path = resolve_checkpoint_path(src_dir)
    src = _params_of(cfg1, ds, src_path)

    ft_dir = str(tmp_path / 'ft')
    cfg2 = _cfg(ft_dir, init_from_checkpoint=src_path,
                freeze_params=['Dense_0'])
    train(cfg2, ds, None, max_batches_per_epoch=4)
    ft = _params_of(cfg2, ds, resolve_checkpoint_path(ft_dir))

    np.testing.assert_array_equal(np.asarray(ft['Dense_0']['kernel']),
                                  np.asarray(src['Dense_0']['kernel']))
    np.testing.assert_array_equal(np.asarray(ft['Dense_0']['bias']),
                                  np.asarray(src['Dense_0']['bias']))
    assert not np.array_equal(np.asarray(ft['Dense_1']['kernel']),
                              np.asarray(src['Dense_1']['kernel']))


def test_freeze_on_device_resident_tier(ds, tmp_path):
    """The freeze mask lives inside tx, so the device-resident epoch
    runner (whole-epoch scan, state.apply_gradients) honors it too."""
    ckpt = str(tmp_path / 'dev_tier')
    cfg = _cfg(ckpt, device_data='on', freeze_params=[r'Dense_0/kernel'])
    model = build_model_for_dataset(cfg, ds)
    sample = ds.gather(np.arange(16))
    init_state = create_train_state(model, jax.random.PRNGKey(cfg.seed),
                                    jnp.asarray(sample.inputs),
                                    make_optimizer('sgd', 0.0))
    init = jax.device_get(init_state.params)
    train(cfg, ds, None)
    out = _params_of(cfg, ds, resolve_checkpoint_path(ckpt))
    np.testing.assert_array_equal(np.asarray(out['Dense_0']['kernel']),
                                  np.asarray(init['Dense_0']['kernel']))
    assert not np.array_equal(np.asarray(out['Dense_0']['bias']),
                              np.asarray(init['Dense_0']['bias']))


def test_freeze_typo_raises(ds, tmp_path):
    cfg = _cfg(str(tmp_path / 'typo'), freeze_params=['NoSuchLayer'])
    with pytest.raises(ValueError, match='match no parameter'):
        train(cfg, ds, None, max_batches_per_epoch=1)


def test_resume_beats_warm_start(ds, tmp_path, caplog):
    """A checkpoint dir with resume checkpoints wins over
    --init-from-checkpoint: the interrupted run's progress is preserved
    and the warm start is ignored with a warning."""
    src_dir = str(tmp_path / 'src2')
    train(_cfg(src_dir), ds, None, max_batches_per_epoch=2)
    src_path = resolve_checkpoint_path(src_dir)

    run_dir = str(tmp_path / 'run')
    train(_cfg(run_dir, epochs=1), ds, None, max_batches_per_epoch=2)
    assert list_checkpoints(run_dir)
    import logging
    with caplog.at_level(logging.WARNING):
        result = train(_cfg(run_dir, epochs=2,
                            init_from_checkpoint=src_path),
                       ds, None, max_batches_per_epoch=2)
    assert result.epochs_run == 1          # resumed at epoch 1 of 2
    assert any('ignored' in r.message for r in caplog.records)


def test_diffusion_warm_start_seeds_ema(tmp_path):
    """Diffusion warm start: params come from the source checkpoint and
    --ema-decay seeds the EMA tree from the source's ema_params."""
    from flax import serialization
    from inferbiomechanics_tpu.train.diffusion_loop import train_diffusion

    root = tmp_path / 'data'
    os.makedirs(root / 'train')
    write_synthetic_subject(str(root / 'train' / 's.b3d'), num_trials=1,
                            trial_length=120, seed=0)
    dds = WindowDataset(str(root / 'train'), window_size=20, stride=5,
                        output_data_format='all_frames',
                        skip_loading_skeletons=True)
    common = dict(model_type='diffusion', window_size=20, stride=5,
                  output_data_format='all_frames', d_model=16, num_layers=1,
                  num_heads=2, diffusion_timesteps=8, batch_size=16,
                  epochs=1, no_wandb=True, ema_decay=0.9)
    src_dir = str(tmp_path / 'dsrc')
    train_diffusion(Config(checkpoint_dir=src_dir, **common), dds, None)
    src_path = resolve_checkpoint_path(src_dir)
    src_raw = serialization.msgpack_restore(open(src_path, 'rb').read())
    assert 'ema_params' in src_raw

    ft_dir = str(tmp_path / 'dft')
    # freeze everything + lr 0: the fine-tune run's first EMA update
    # starts from the SOURCE ema, so it cannot equal a params-seeded EMA
    result = train_diffusion(
        Config(checkpoint_dir=ft_dir, init_from_checkpoint=src_path,
               learning_rate=0.0, opt_type='sgd', **common), dds, None)
    assert result.epochs_run == 1
    ft_raw = serialization.msgpack_restore(
        open(resolve_checkpoint_path(ft_dir), 'rb').read())
    # params were warm-started and trained at lr=0 -> bitwise source
    for a, b in zip(jax.tree_util.tree_leaves(ft_raw['params']),
                    jax.tree_util.tree_leaves(src_raw['params'])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the EMA decayed from the SOURCE ema toward the (static) params:
    # ema' = 0.9*ema_src + 0.1*params, per step
    for e1, e0, p in zip(jax.tree_util.tree_leaves(ft_raw['ema_params']),
                         jax.tree_util.tree_leaves(src_raw['ema_params']),
                         jax.tree_util.tree_leaves(src_raw['params'])):
        e1, e0, p = (np.asarray(e1, np.float64), np.asarray(e0, np.float64),
                     np.asarray(p, np.float64))
        # after n steps: ema' = d^n*ema0 + (1-d^n)*p for static params
        denom = e0 - p
        mask = np.abs(denom) > 1e-4     # f32 noise swamps tiny denominators
        if mask.sum() == 0:
            continue
        ratio = (e1 - p)[mask] / denom[mask]
        assert np.all(ratio < 1.0 + 1e-6) and np.all(ratio > 0.0)
        np.testing.assert_allclose(ratio, np.median(ratio), rtol=2e-2)


def test_cli_flags_parse(ds):
    """--init-from-checkpoint / --freeze-params land in Config."""
    import argparse
    from inferbiomechanics_tpu.config import add_config_flags, config_from_args
    p = argparse.ArgumentParser()
    add_config_flags(p)
    args = p.parse_args(['--init-from-checkpoint', '/x/best.ckpt',
                         '--freeze-params', 'Dense_0', 'encoder/.*'])
    cfg = config_from_args(args)
    assert cfg.init_from_checkpoint == '/x/best.ckpt'
    assert cfg.freeze_params == ['Dense_0', 'encoder/.*']
