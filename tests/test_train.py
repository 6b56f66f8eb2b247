"""Train-step, optimizer, checkpoint, and multi-device sharding tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.loss import LossConfig
from inferbiomechanics_tpu.models import get_model
from inferbiomechanics_tpu.parallel import make_mesh, shard_batch, replicate
from inferbiomechanics_tpu.train import (
    OPT_TYPES, create_train_state, load_latest_checkpoint, make_eval_step,
    make_optimizer, make_train_step, save_checkpoint,
)


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp('traindata')
    write_synthetic_subject(str(d / 's0.b3d'), num_trials=2, trial_length=200, seed=0)
    return WindowDataset(str(d), window_size=20, stride=5)


def _setup(ds, model_type='feedforward', **kw):
    model = get_model(model_type, num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len, **kw)
    batch = ds.gather(np.arange(8))
    tx = make_optimizer('adam', 1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(batch.inputs), tx)
    return model, state, batch


def test_train_step_reduces_loss(ds):
    model, state, batch = _setup(ds)
    step = make_train_step(model, ds.lab_offsets, LossConfig(), donate=False)
    x = jnp.asarray(batch.inputs)
    y = jnp.asarray(batch.labels)
    rng = jax.random.PRNGKey(0)
    _, m0 = step(state, x, y, rng)
    for i in range(60):
        state, m = step(state, x, y, jax.random.fold_in(rng, i))
    assert float(m['loss']) < float(m0['loss'])
    assert float(m['loss']) < 0.5 * float(m0['loss'])


@pytest.mark.parametrize('opt', OPT_TYPES)
def test_all_optimizers_step(ds, opt):
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5, root_history_len=ds.root_history_len)
    batch = ds.gather(np.arange(4))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(batch.inputs), make_optimizer(opt, 1e-3))
    step = make_train_step(model, ds.lab_offsets, LossConfig(), donate=False)
    state2, m = step(state, jnp.asarray(batch.inputs), jnp.asarray(batch.labels),
                     jax.random.PRNGKey(1))
    assert np.isfinite(float(m['loss']))
    assert int(state2.step) == 1


def test_eval_step_metrics(ds):
    model, state, batch = _setup(ds)
    eval_step = make_eval_step(model, ds.lab_offsets, LossConfig())
    outputs, metrics = eval_step(state, jnp.asarray(batch.inputs),
                                 jnp.asarray(batch.labels))
    assert metrics['force_loss'].shape == (6,)
    for k in ('force_avg_err', 'cop_avg_err', 'com_acc_avg_err', 'wrench_avg_err'):
        assert np.isfinite(float(metrics[k]))


def test_checkpoint_roundtrip_and_latest(ds, tmp_path):
    model, state, batch = _setup(ds)
    ckpt_dir = str(tmp_path / 'ckpts')
    step = make_train_step(model, ds.lab_offsets, LossConfig(), donate=False)
    state, _ = step(state, jnp.asarray(batch.inputs), jnp.asarray(batch.labels),
                    jax.random.PRNGKey(0))
    save_checkpoint(ckpt_dir, state, epoch=0, batch=1000)
    save_checkpoint(ckpt_dir, state, epoch=2, batch=0)
    save_checkpoint(ckpt_dir, state, epoch=1, batch=5000)

    model2, fresh, _ = _setup(ds)
    restored, epoch, batch_idx = load_latest_checkpoint(fresh, ckpt_dir)
    assert (epoch, batch_idx) == (2, 0)  # numeric (epoch, batch) sort
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too
    assert int(restored.step) == int(state.step)


def test_load_latest_checkpoint_empty(ds, tmp_path):
    _, state, _ = _setup(ds)
    restored, epoch, batch = load_latest_checkpoint(state, str(tmp_path / 'none'))
    assert (epoch, batch) == (-1, 0)


def test_data_parallel_step_on_8_device_mesh(ds):
    """Same math, sharded over the 8-CPU virtual mesh (SPMD replaces DDP)."""
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    model, state, batch = _setup(ds)
    step = make_train_step(model, ds.lab_offsets, LossConfig(), donate=False)

    state_r = replicate(mesh, state)
    x, y = shard_batch(mesh, batch.inputs, batch.labels)
    state_r, m = step(state_r, x, y, jax.random.PRNGKey(0))
    assert np.isfinite(float(m['loss']))

    # parity with single-device execution
    state_s, m_s = step(state, jnp.asarray(batch.inputs),
                        jnp.asarray(batch.labels), jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m['loss']), float(m_s['loss']), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_r.params),
                    jax.tree_util.tree_leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
