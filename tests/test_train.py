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


def test_tensor_parallel_step_parity(ds):
    """Transformer step on a (data=4, model=2) mesh matches single-device."""
    import jax.numpy as jnp
    from inferbiomechanics_tpu.parallel import shard_batch
    from inferbiomechanics_tpu.parallel.sharding_rules import shard_params_for_mesh

    mesh = make_mesh(model_parallel=2)
    model = get_model('transformer', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5, root_history_len=ds.root_history_len,
                      d_model=128, num_layers=2)
    batch = ds.gather(np.arange(8))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(batch.inputs),
                               make_optimizer('adam', 1e-3))
    step = make_train_step(model, ds.lab_offsets, LossConfig(), donate=False)

    state_s, m_s = step(state, jnp.asarray(batch.inputs),
                        jnp.asarray(batch.labels), jax.random.PRNGKey(0))

    state_tp = shard_params_for_mesh(mesh, state)
    x, y = shard_batch(mesh, batch.inputs, batch.labels)
    state_tp, m_tp = step(state_tp, x, y, jax.random.PRNGKey(0))

    # bf16 compute + different reduction orders across shards: expect small
    # numerical wobble; the test guards sharding CORRECTNESS, not bitwise
    # equality (the dp-only test above covers tight parity in f32 paths)
    np.testing.assert_allclose(float(m_tp['loss']), float(m_s['loss']),
                               rtol=5e-3)
    for a, b in zip(jax.tree_util.tree_leaves(state_tp.params),
                    jax.tree_util.tree_leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.1, atol=2e-3)


def test_wandb_report_key_schema(ds):
    """Exact reference wandb key-string parity (RegressionLossEvaluator.py:342-366)."""
    from inferbiomechanics_tpu.loss import RegressionLossEvaluator, LossConfig

    class Capture:
        def __init__(self): self.data = {}
        def log(self, d): self.data.update(d)

    cap = Capture()
    lc = LossConfig(predict_grf_components=(0, 1), predict_cop_components=(2,),
                    predict_moment_components=(3,), predict_wrench_components=(5, 11))
    ev = RegressionLossEvaluator('dev', lc, wandb_logger=cap)
    model, state, batch = _setup(ds)
    eval_step = make_eval_step(model, ds.lab_offsets, lc)
    _, metrics = eval_step(state, jnp.asarray(batch.inputs), jnp.asarray(batch.labels))
    ev(batch.inputs, None, None, precomputed_metrics=metrics,
       log_reports_to_wandb=True)
    keys = set(cap.data)
    assert {'dev/force_rmse/left-x', 'dev/force_rmse/left-y',
            'dev/cop_rmse/left-z', 'dev/moment_rmse/right-x',
            'dev/wrench_loss/left-force-z', 'dev/wrench_loss/right-force-z',
            'dev/loss',
            'dev/reports/Force Avg Err (N per kg)',
            'dev/reports/CoP Avg Err (m)',
            'dev/reports/Moment Avg Err (Nm per kg)',
            'dev/reports/COM Acc Avg Err (m per s^2)',
            'dev/reports/Wrench Avg Err (N+Nm per kg)'} <= keys, keys


def test_aux_head_supervision_trains_tau(ds):
    """With aux_tau_weight the transformer's tau head learns."""
    from inferbiomechanics_tpu.data.keys import OutputDataKeys
    model = get_model('transformer', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5, root_history_len=ds.root_history_len,
                      d_model=64, num_layers=2)
    batch = ds.gather(np.arange(16))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(batch.inputs),
                               make_optimizer('adam', 1e-3))
    lc = LossConfig(aux_tau_weight=1.0, aux_com_acc_weight=1.0,
                    aux_contact_weight=0.1)
    step = make_train_step(model, ds.lab_offsets, lc, donate=False)
    eval_step = make_eval_step(model, ds.lab_offsets, lc)
    x, y = jnp.asarray(batch.inputs), jnp.asarray(batch.labels)

    def tau_mse(state):
        outputs, _ = eval_step(state, x, y)
        labels = ds.unpack_labels(y)
        return float(np.mean((np.asarray(outputs[OutputDataKeys.TAU])
                              - np.asarray(labels[OutputDataKeys.TAU])) ** 2))

    before = tau_mse(state)
    for i in range(60):
        state, _ = step(state, x, y, jax.random.fold_in(jax.random.PRNGKey(1), i))
    after = tau_mse(state)
    assert after < 0.5 * before, (before, after)


def test_keep_best_and_early_stop(ds, tmp_path):
    """--keep-best writes best.ckpt on dev-loss improvement (ignored by
    the resume scan); --early-stop-patience breaks the epoch loop after
    N stale dev evals. lr=0 makes every eval identical: the first is
    best, the rest are stale."""
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.train.checkpoint import list_checkpoints
    from inferbiomechanics_tpu.train.loop import train

    ckpt = str(tmp_path / 'best')
    cfg = Config(window_size=20, stride=5, model_type='feedforward',
                 checkpoint_dir=ckpt, epochs=6, batch_size=16,
                 opt_type='sgd', learning_rate=0.0, device_data='off',
                 checkpoint_every_batches=1000, log_every_batches=1000,
                 keep_best=True, early_stop_patience=2)
    result = train(cfg, ds, ds, max_batches_per_epoch=2)
    assert result.epochs_run < 6                    # stopped early
    best = os.path.join(ckpt, 'best.ckpt')
    assert os.path.exists(best)
    # best.ckpt is a model artifact, not a resume point
    assert all(not p.endswith('best.ckpt')
               for _e, _b, p in list_checkpoints(ckpt))
    # ...but it loads explicitly (analyze --checkpoint-file)
    from inferbiomechanics_tpu.train.checkpoint import load_checkpoint_file
    from inferbiomechanics_tpu.train.loop import build_model_for_dataset
    from inferbiomechanics_tpu.train.state import create_train_state
    from inferbiomechanics_tpu.train.optimizers import make_optimizer
    import jax
    model = build_model_for_dataset(cfg, ds)
    sample = ds.gather(np.arange(16))
    st = create_train_state(model, jax.random.PRNGKey(1),
                            jnp.asarray(sample.inputs),
                            make_optimizer('sgd', 0.0))
    st, e, b = load_checkpoint_file(st, best)
    assert (e, b) == (-1, 0)   # best saved before any epoch completed
    leaves = jax.tree_util.tree_leaves(st.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_keep_best_scores_final_epoch(ds, tmp_path):
    """The epoch loop evals BEFORE each epoch, so --keep-best must run
    one extra dev eval after the last epoch — otherwise the final (often
    best) weights could never land in best.ckpt. With a real LR and one
    epoch, best.ckpt must be the post-training state (epoch 0), not the
    init-state eval (epoch -1)."""
    import jax
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.train.checkpoint import load_checkpoint_file
    from inferbiomechanics_tpu.train.loop import build_model_for_dataset, train
    from inferbiomechanics_tpu.train.optimizers import make_optimizer
    from inferbiomechanics_tpu.train.state import create_train_state

    ckpt = str(tmp_path / 'bestfinal')
    cfg = Config(window_size=20, stride=5, model_type='feedforward',
                 checkpoint_dir=ckpt, epochs=1, batch_size=16,
                 opt_type='adam', learning_rate=1e-3, device_data='off',
                 checkpoint_every_batches=1000, log_every_batches=1000,
                 keep_best=True)
    train(cfg, ds, ds, max_batches_per_epoch=8)
    model = build_model_for_dataset(cfg, ds)
    sample = ds.gather(np.arange(16))
    st = create_train_state(model, jax.random.PRNGKey(1),
                            jnp.asarray(sample.inputs),
                            make_optimizer('adam', 1e-3))
    _st, e, _b = load_checkpoint_file(st, os.path.join(ckpt, 'best.ckpt'))
    assert e == 0   # saved by the post-final-epoch eval, not the init eval


def test_lr_schedules():
    """LR schedule factory: warmup/decay envelopes + optimizer wiring;
    non-constant schedules demand a decay horizon."""
    from inferbiomechanics_tpu.train.optimizers import (
        make_lr_schedule, make_optimizer,
    )
    sched = make_lr_schedule('warmup_cosine', 1e-3, decay_steps=100,
                             warmup_steps=10)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1e-3) < 1e-9
    assert float(sched(100)) < float(sched(50)) < 1e-3
    lin = make_lr_schedule('linear', 1e-3, decay_steps=100)
    assert abs(float(lin(100))) < 1e-12
    with pytest.raises(ValueError, match='lr-decay-steps'):
        make_lr_schedule('cosine', 1e-3)
    tx = make_optimizer('adam', 1e-3, lr_schedule='cosine',
                        lr_decay_steps=50)
    params = {'w': jnp.ones(3)}
    st = tx.init(params)
    up, _ = tx.update({'w': jnp.ones(3)}, st, params)
    assert np.isfinite(np.asarray(up['w'])).all()


def test_seed_controls_reproducibility(ds, tmp_path):
    """--seed: same seed + same flags -> bit-identical final checkpoint;
    different seed -> different (init, dropout streams, and epoch
    shuffles all derive from it). The reference has no seed control."""
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.train.checkpoint import list_checkpoints
    from inferbiomechanics_tpu.train.loop import train

    def run(seed, tag):
        cfg = Config(window_size=20, stride=5, model_type='feedforward',
                     checkpoint_dir=str(tmp_path / tag), epochs=1,
                     batch_size=16, opt_type='adam', learning_rate=1e-3,
                     device_data='off', checkpoint_every_batches=1000,
                     log_every_batches=1000, seed=seed)
        train(cfg, ds, None, max_batches_per_epoch=4)
        _e, _b, path = list_checkpoints(cfg.checkpoint_dir)[-1]
        with open(path, 'rb') as f:
            return f.read()

    a = run(7, 'a')
    assert a == run(7, 'b')
    assert a != run(8, 'c')


def test_mid_epoch_resume_skips_consumed_prefix(ds, tmp_path, capsys):
    """A checkpoint at (epoch e, batch k>0) resumes inside epoch e."""
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.train.loop import train

    ckpt = str(tmp_path / 'resume')
    cfg = Config(window_size=20, stride=5, model_type='feedforward',
                 checkpoint_dir=ckpt, epochs=2, batch_size=16,
                 opt_type='adam', learning_rate=1e-3, device_data='off',
                 checkpoint_every_batches=3, log_every_batches=1000)
    # run one partial epoch then simulate a crash by training 1 epoch only
    cfg1 = Config(**{**vars(cfg), 'epochs': 1})
    train(cfg1, ds, None, max_batches_per_epoch=5)
    from inferbiomechanics_tpu.train.checkpoint import list_checkpoints
    ckpts = list_checkpoints(ckpt)
    # mid-epoch ckpt at batch 3 exists plus the end-of-epoch one
    assert (0, 3) in [(e, b) for e, b, _ in ckpts]
    # remove the end-of-epoch checkpoint to simulate a crash at batch 3
    import os as _os
    for e, b, path in ckpts:
        if b == 0:
            _os.remove(path)
    result = train(cfg, ds, None, max_batches_per_epoch=5)
    # epochs 0 (resumed mid-way) and 1 both complete
    assert result.epochs_run == 2
    # the ckpt at batch 3 was saved AFTER that step ran, so the resume must
    # replay only batch 4 of epoch 0 (not batch 3 again — double update),
    # then all 5 batches of epoch 1
    assert result.windows_seen == (1 + 5) * cfg.batch_size


def test_checkpoint_param_mismatch_guided_error(tmp_path, ds):
    """A checkpoint written with a different attention impl (round-1 flax
    trees) raises the guided error naming --attn-impl, not an opaque
    flax key mismatch."""
    import pytest
    from inferbiomechanics_tpu.train.checkpoint import (
        load_latest_checkpoint, save_checkpoint,
    )

    def build(attn):
        model = get_model('transformer', num_dofs=ds.num_dofs,
                          num_contact_bodies=ds.num_contact_bodies,
                          history_len=20, stride=5,
                          root_history_len=ds.root_history_len,
                          d_model=32, num_layers=1, num_heads=4,
                          attn_impl=attn)
        batch = ds.gather(np.arange(4))
        return create_train_state(model, jax.random.PRNGKey(0),
                                  jnp.asarray(batch.inputs),
                                  make_optimizer('adam', 1e-3))

    save_checkpoint(str(tmp_path), build('flax'), epoch=0, batch=0)
    with pytest.raises(ValueError, match='attn-impl'):
        load_latest_checkpoint(build('vpu'), str(tmp_path))
    # matching impl loads fine
    state, epoch, batch = load_latest_checkpoint(build('flax'), str(tmp_path))
    assert epoch == 0


def test_keep_checkpoints_retention(tmp_path):
    """--keep-checkpoints N prunes older epoch_* checkpoints; best.ckpt
    survives pruning."""
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.train.checkpoint import (
        list_checkpoints, prune_checkpoints,
    )
    from inferbiomechanics_tpu.train.loop import train

    data = tmp_path / 'data'
    os.makedirs(data / 'train'); os.makedirs(data / 'dev')
    for split, seed in (('train', 0), ('dev', 1)):
        write_synthetic_subject(str(data / split / 's.b3d'), num_trials=1,
                                trial_length=150, seed=seed)
    train_ds = WindowDataset(str(data / 'train'), window_size=50, stride=5,
                             skip_loading_skeletons=True)
    dev_ds = WindowDataset(str(data / 'dev'), window_size=50, stride=5,
                           skip_loading_skeletons=True)
    ck = str(tmp_path / 'ck')
    cfg = Config(dataset_home=str(data), checkpoint_dir=ck,
                 hidden_dims=[16], epochs=4, batch_size=16,
                 keep_checkpoints=2, keep_best=True)
    train(cfg, train_ds, dev_ds, max_batches_per_epoch=2)
    cks = list_checkpoints(ck)
    assert len(cks) == 2, cks                  # pruned to the newest 2
    assert cks[-1][0] == 3                     # latest epoch kept
    assert os.path.exists(os.path.join(ck, 'best.ckpt'))   # never pruned
    # direct helper: keep=0 is a no-op
    assert prune_checkpoints(ck, 0) == []
    assert len(list_checkpoints(ck)) == 2


def test_async_checkpointer_matches_sync(ds, tmp_path):
    """AsyncCheckpointer writes byte-identical checkpoints to
    save_checkpoint (same payload builder), serializes in-order, and
    prunes after commit."""
    from inferbiomechanics_tpu.train.checkpoint import (
        AsyncCheckpointer, list_checkpoints, save_checkpoint,
    )

    _model, state, _batch = _setup(ds)
    sync_dir = str(tmp_path / 'sync')
    async_dir = str(tmp_path / 'async')
    save_checkpoint(sync_dir, state, 3, 7)
    ck = AsyncCheckpointer()
    ck.save(async_dir, state, 3, 7)
    ck.wait()
    with open(os.path.join(sync_dir, 'epoch_3_batch_7.ckpt'), 'rb') as f:
        sync_blob = f.read()
    with open(os.path.join(async_dir, 'epoch_3_batch_7.ckpt'), 'rb') as f:
        async_blob = f.read()
    assert sync_blob == async_blob

    # back-to-back saves land in order; prune_keep retains the newest N
    for e in range(4, 9):
        ck.save(async_dir, state, e, 0, prune_keep=3)
    ck.wait()
    cks = list_checkpoints(async_dir)
    assert [(e, b) for e, b, _ in cks] == [(6, 0), (7, 0), (8, 0)]
    assert ck.last_path.endswith('epoch_8_batch_0.ckpt')
    # no stray tmp files left behind
    assert not [f for f in os.listdir(async_dir) if f.endswith('.tmp')]


def test_async_checkpointer_surfaces_write_error(ds, tmp_path):
    """A failed background write re-raises at the next wait(), not
    silently."""
    from inferbiomechanics_tpu.train.checkpoint import AsyncCheckpointer

    _model, state, _batch = _setup(ds)
    blocker = tmp_path / 'not_a_dir'
    blocker.write_text('file where the checkpoint dir should go')
    ck = AsyncCheckpointer()
    ck.save(str(blocker), state, 0, 0)   # makedirs over a file fails
    with pytest.raises(OSError):
        ck.wait()
    ck.wait()   # error is raised once, then cleared


def test_train_loop_async_checkpoint_equivalence(ds, tmp_path):
    """--async-checkpoint produces the exact same checkpoint files as the
    sync path for the same seed/flags (training itself is unchanged), and
    the run resumes from them."""
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.train.checkpoint import list_checkpoints
    from inferbiomechanics_tpu.train.loop import train

    def run(tag, async_ckpt):
        cfg = Config(window_size=20, stride=5, model_type='feedforward',
                     checkpoint_dir=str(tmp_path / tag), epochs=2,
                     batch_size=16, opt_type='adam', learning_rate=1e-3,
                     device_data='off', checkpoint_every_batches=3,
                     log_every_batches=1000, seed=11,
                     async_checkpoint=async_ckpt, keep_checkpoints=2)
        train(cfg, ds, None, max_batches_per_epoch=5)
        out = {}
        for e, b, path in list_checkpoints(cfg.checkpoint_dir):
            with open(path, 'rb') as f:
                out[(e, b)] = f.read()
        return out

    sync = run('sync', False)
    async_ = run('async', True)
    assert sync.keys() == async_.keys()
    assert len(sync) == 2   # keep_checkpoints=2 enforced in both modes
    for k in sync:
        assert sync[k] == async_[k], k


# ---------------------------------------------------------------------------
# Chunked host dispatch (--host-chunk-steps, round 4): K batches per
# upload + one K-step scan per dispatch, numerics identical to K
# per-step calls.
# ---------------------------------------------------------------------------

def test_chunked_step_matches_per_step(ds):
    from inferbiomechanics_tpu.train.step import make_chunked_train_step
    model, state, batch = _setup(ds)
    K, B = 4, 2
    x = jnp.asarray(batch.inputs).reshape(K, B, *batch.inputs.shape[1:])
    y = jnp.asarray(batch.labels).reshape(K, B, *batch.labels.shape[1:])
    base = jax.random.PRNGKey(3)
    rngs = jnp.stack([jax.random.fold_in(base, i) for i in range(K)])

    step = make_train_step(model, ds.lab_offsets, LossConfig(), donate=False)
    s1 = state
    per_losses = []
    for i in range(K):
        s1, m = step(s1, x[i], y[i], jax.random.fold_in(base, i))
        per_losses.append(float(m['loss']))

    chunk = make_chunked_train_step(model, ds.lab_offsets, LossConfig(), K,
                                    donate=False)
    s2, ms = chunk(state, x, y, rngs)
    np.testing.assert_allclose(np.asarray(ms['loss']), per_losses, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_train_loop_host_chunked_matches_per_step(ds, tmp_path):
    """The full train loop with --host-chunk-steps 2 reproduces the
    per-step loop's final state, including a remainder batch that falls
    back to per-step dispatch (5 batches per epoch, chunk 2)."""
    import jax
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.train.checkpoint import load_latest_checkpoint
    from inferbiomechanics_tpu.train.loop import build_model_for_dataset, train
    from inferbiomechanics_tpu.train.optimizers import make_optimizer
    from inferbiomechanics_tpu.train.state import create_train_state

    results = {}
    params = {}
    for chunk in (1, 2):
        ckpt = str(tmp_path / f'chunk{chunk}')
        cfg = Config(window_size=20, stride=5, model_type='feedforward',
                     checkpoint_dir=ckpt, epochs=2, batch_size=16,
                     opt_type='adam', learning_rate=1e-3, device_data='off',
                     checkpoint_every_batches=1000, log_every_batches=1000,
                     hidden_dims=[16], seed=7, host_chunk_steps=chunk)
        results[chunk] = train(cfg, ds, ds, max_batches_per_epoch=5)
        model = build_model_for_dataset(cfg, ds)
        sample = ds.gather(np.arange(4))
        st = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.asarray(sample.inputs),
                                make_optimizer('adam', 1e-3))
        st, e, b = load_latest_checkpoint(st, ckpt)
        assert (e, b) == (1, 0)
        params[chunk] = jax.tree_util.tree_leaves(st.params)

    # same data order, same RNG keys; the only daylight is XLA fusing
    # the scanned program differently from the standalone step (bf16
    # reassociation, ~1e-6/step over 20 steps)
    for a, b in zip(params[1], params[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    m1, m2 = (results[1].final_train_metrics, results[2].final_train_metrics)
    assert m1['loss'] == pytest.approx(m2['loss'], rel=1e-3)
    assert results[1].windows_seen == results[2].windows_seen


def test_host_upload_bf16_bitwise_free(ds, tmp_path):
    """--host-upload-dtype bf16 halves upload bytes and is numerically
    FREE for bf16-compute models: the model casts inputs to bf16 on
    device anyway, so pre-casting on host yields bitwise-identical
    training (no augmentation)."""
    import jax
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.train.checkpoint import load_latest_checkpoint
    from inferbiomechanics_tpu.train.loop import build_model_for_dataset, train
    from inferbiomechanics_tpu.train.optimizers import make_optimizer
    from inferbiomechanics_tpu.train.state import create_train_state

    params = {}
    for dt in ('f32', 'bf16'):
        ckpt = str(tmp_path / f'up{dt}')
        cfg = Config(window_size=20, stride=5, model_type='feedforward',
                     checkpoint_dir=ckpt, epochs=1, batch_size=16,
                     opt_type='adam', learning_rate=1e-3, device_data='off',
                     checkpoint_every_batches=1000, log_every_batches=1000,
                     hidden_dims=[16], seed=3, host_upload_dtype=dt)
        train(cfg, ds, ds, max_batches_per_epoch=4)
        model = build_model_for_dataset(cfg, ds)
        sample = ds.gather(np.arange(4))
        st = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.asarray(sample.inputs),
                                make_optimizer('adam', 1e-3))
        st, _, _ = load_latest_checkpoint(st, ckpt)
        params[dt] = jax.tree_util.tree_leaves(st.params)
    for a, b in zip(params['f32'], params['bf16']):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_step_matches_per_step_with_augmentation(ds):
    """Augmentation is compiled into the step; the chunked scan must
    reproduce the per-step path's augmented numerics exactly (same
    per-step RNG keys drive mirror selects and noise draws)."""
    from inferbiomechanics_tpu.train.augment import Augmenter, spec_from_dataset
    from inferbiomechanics_tpu.train.step import make_chunked_train_step
    model, state, batch = _setup(ds)
    aug = Augmenter(mirror=spec_from_dataset(ds), noise_std=0.02)
    K, B = 4, 2
    x = jnp.asarray(batch.inputs).reshape(K, B, *batch.inputs.shape[1:])
    y = jnp.asarray(batch.labels).reshape(K, B, *batch.labels.shape[1:])
    base = jax.random.PRNGKey(5)
    rngs = jnp.stack([jax.random.fold_in(base, i) for i in range(K)])

    step = make_train_step(model, ds.lab_offsets, LossConfig(),
                           donate=False, augment=aug)
    s1 = state
    per_losses = []
    for i in range(K):
        s1, m = step(s1, x[i], y[i], jax.random.fold_in(base, i))
        per_losses.append(float(m['loss']))

    chunk = make_chunked_train_step(model, ds.lab_offsets, LossConfig(), K,
                                    donate=False, augment=aug)
    s2, ms = chunk(state, x, y, rngs)
    np.testing.assert_allclose(np.asarray(ms['loss']), per_losses, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
