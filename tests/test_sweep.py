"""Vmapped hyperparameter sweep (train/sweep.py + `main.py sweep`).

Reference equivalent being replaced: nested bash loops launching one
sbatch job per hyperparameter point (src/slurm/slurm_loop.sh:13-22).
The core claims under test:

  1. the exact-lr trick — optimizer built at lr=1.0, updates scaled by
     each config's lr — is BIT-identical to baking the lr in, for all
     six reference optimizer choices;
  2. a config trained inside the vmapped sweep matches the same config
     trained standalone;
  3. the end-to-end sweep ranks configs and writes loadable checkpoints;
  4. sharding the config axis across the mesh preserves the results.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.config import Config
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.loss import LossConfig
from inferbiomechanics_tpu.models import get_model
from inferbiomechanics_tpu.train import create_train_state, make_optimizer
from inferbiomechanics_tpu.train.optimizers import OPT_TYPES
from inferbiomechanics_tpu.train.step import make_train_step
from inferbiomechanics_tpu.train.sweep import (
    init_sweep_states, make_sweep_train_step, run_sweep, shard_sweep_state,
    slice_config, sweep_grid,
)

MAIN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    'main.py')


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp('sweep_data')
    for split in ('train', 'dev'):
        os.makedirs(root / split)
        write_synthetic_subject(str(root / split / 's0.b3d'), num_trials=1,
                                trial_length=200, seed=0)
    train_ds = WindowDataset(str(root / 'train'), window_size=50, stride=5,
                             skip_loading_skeletons=True)
    dev_ds = WindowDataset(str(root / 'dev'), window_size=50, stride=5,
                           skip_loading_skeletons=True)
    return {'root': root, 'train': train_ds, 'dev': dev_ds}


def _tiny_model(ds):
    return get_model('feedforward', num_dofs=ds.num_dofs,
                     num_contact_bodies=ds.num_contact_bodies,
                     history_len=50, stride=5,
                     root_history_len=ds.root_history_len,
                     hidden_dims=[32, 32])


def test_lr_scaling_exact():
    """tx(lr).update == lr * tx(1.0).update, bitwise, for all six
    reference optimizers (the sweep's correctness precondition)."""
    params = {'w': jnp.asarray(np.random.default_rng(0)
                               .standard_normal((16, 8)), jnp.float32),
              'b': jnp.asarray(np.random.default_rng(1)
                               .standard_normal((8,)), jnp.float32)}
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(np.random.default_rng(p.shape[0])
                              .standard_normal(p.shape), jnp.float32), params)
    lr = 3.7e-4
    for opt in OPT_TYPES:
        tx_baked = make_optimizer(opt, lr)
        tx_unit = make_optimizer(opt, 1.0)
        s_baked = tx_baked.init(params)
        s_unit = tx_unit.init(params)
        # two update steps so stateful accumulators (rms, adam moments)
        # are exercised, not just the first-step fast path
        p_b, p_u = params, params
        for _ in range(2):
            u_b, s_baked = tx_baked.update(grads, s_baked, p_b)
            u_u, s_unit = tx_unit.update(grads, s_unit, p_u)
            u_scaled = jax.tree_util.tree_map(lambda u: u * lr, u_u)
            for a, b in zip(jax.tree_util.tree_leaves(u_b),
                            jax.tree_util.tree_leaves(u_scaled)):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f'{opt}: lr scaling not exact')
            import optax
            p_b = optax.apply_updates(p_b, u_b)
            p_u = optax.apply_updates(p_u, u_scaled)


def test_sweep_grid_is_lr_major():
    assert sweep_grid([1e-3, 1e-4], [0, 1]) == [
        (1e-3, 0), (1e-3, 1), (1e-4, 0), (1e-4, 1)]


def test_sweep_config_matches_standalone(dataset):
    """Config k of the vmapped sweep == that config trained alone (same
    seed, lr, batches)."""
    ds = dataset['train']
    model = _tiny_model(ds)
    lc = LossConfig()
    lrs, seeds = [1e-3, 1e-4], [0]
    grid = sweep_grid(lrs, seeds)
    batch = ds.gather(np.arange(32))
    bi, bl = jnp.asarray(batch.inputs), jnp.asarray(batch.labels)

    tx_unit = make_optimizer('rmsprop', 1.0)
    sweep_state = init_sweep_states(model, tx_unit, bi, [s for _, s in grid])
    sweep_step = make_sweep_train_step(model, tx_unit, ds.lab_offsets, lc,
                                       [l for l, _ in grid], donate=False)
    rng = jax.random.PRNGKey(7)
    for i in range(3):
        sweep_state, metrics = sweep_step(sweep_state, bi, bl,
                                          jax.random.fold_in(rng, i))
    assert np.asarray(metrics['loss']).shape == (2,)

    for k, (lr, seed) in enumerate(grid):
        tx = make_optimizer('rmsprop', lr)
        state = create_train_state(model, jax.random.PRNGKey(seed), bi, tx)
        step = make_train_step(model, ds.lab_offsets, lc, donate=False)
        for i in range(3):
            state, m = step(state, bi, bl, jax.random.fold_in(rng, i))
        got = slice_config(sweep_state, k)
        for a, b in zip(jax.tree_util.tree_leaves(got.params),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)


def test_run_sweep_end_to_end(dataset, tmp_path):
    ds, dev = dataset['train'], dataset['dev']
    config = Config(dataset_home=str(dataset['root']),
                    checkpoint_dir=str(tmp_path / 'ck'),
                    hidden_dims=[32, 32], epochs=1, batch_size=16, seed=0)
    result = run_sweep(config, ds, dev, lrs=[1e-3, 1e-5], seeds=[0, 1],
                       max_batches_per_epoch=4)
    assert len(result.points) == 4
    assert all(p.final_dev_loss is not None for p in result.points)
    assert 0 <= result.best_index < 4
    # per-epoch dev curves recorded; best == min of the curve
    for p in result.points:
        assert p.dev_curve is not None and len(p.dev_curve) == config.epochs
        assert p.best_dev_loss == pytest.approx(min(p.dev_curve))
        assert 0 <= p.best_epoch < config.epochs
    # checkpoints written per config and loadable into a standalone state
    from inferbiomechanics_tpu.train.checkpoint import load_latest_checkpoint
    pt = result.points[0]
    assert pt.checkpoint_path and os.path.exists(pt.checkpoint_path)
    model = _tiny_model(ds)
    batch = ds.gather(np.arange(16))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(batch.inputs),
                               make_optimizer('rmsprop', pt.learning_rate))
    state, epoch, _ = load_latest_checkpoint(
        state, os.path.dirname(pt.checkpoint_path))
    assert epoch == 0
    # different configs produced different outcomes
    a = result.points[0].final_train_loss
    b = result.points[1].final_train_loss
    assert a != b or result.points[0].final_dev_loss != result.points[1].final_dev_loss


def test_run_sweep_device_and_host_paths(dataset, tmp_path):
    """run_sweep produces finite ranked results on both the
    device-resident (gather-in-jit) and host-loader data paths."""
    import math
    for mode in ('on', 'off'):
        config = Config(dataset_home=str(dataset['root']),
                        checkpoint_dir=str(tmp_path / f'ck_{mode}'),
                        hidden_dims=[16], epochs=1, batch_size=16, seed=0,
                        device_data=mode)
        result = run_sweep(config, dataset['train'], dataset['dev'],
                           lrs=[1e-3, 1e-4], seeds=[0],
                           max_batches_per_epoch=3)
        assert len(result.points) == 2
        assert all(math.isfinite(p.final_train_loss) for p in result.points)
        assert all(math.isfinite(p.best_dev_loss) for p in result.points)


def test_shard_configs_preserves_results(dataset):
    """Config-axis sharding across the 8-device mesh: same losses as the
    replicated run."""
    ds = dataset['train']
    model = _tiny_model(ds)
    lc = LossConfig()
    grid = sweep_grid([1e-3, 3e-4, 1e-4, 3e-5], [0, 1])   # K=8
    batch = ds.gather(np.arange(32))
    bi, bl = jnp.asarray(batch.inputs), jnp.asarray(batch.labels)
    tx = make_optimizer('adam', 1.0)
    lrs = [l for l, _ in grid]
    seeds = [s for _, s in grid]

    def run(shard):
        state = init_sweep_states(model, tx, bi, seeds)
        if shard:
            from inferbiomechanics_tpu.parallel import make_mesh
            state = shard_sweep_state(state, make_mesh())
        step = make_sweep_train_step(model, tx, ds.lab_offsets, lc, lrs,
                                     donate=False)
        rng = jax.random.PRNGKey(3)
        for i in range(2):
            state, metrics = step(state, bi, bl, jax.random.fold_in(rng, i))
        return np.asarray(metrics['loss'])

    plain = run(False)
    sharded = run(True)
    np.testing.assert_allclose(plain, sharded, rtol=1e-5)


@pytest.mark.slow
def test_run_sweep_diffusion(dataset, tmp_path):
    """The diffusion family sweeps too: eps-MSE steps, fixed-noise dev
    comparator, ranked results."""
    import math
    root = dataset['root']
    tds = WindowDataset(str(root / 'train'), window_size=50, stride=5,
                        output_data_format='all_frames',
                        skip_loading_skeletons=True)
    dds = WindowDataset(str(root / 'dev'), window_size=50, stride=5,
                        output_data_format='all_frames',
                        skip_loading_skeletons=True)
    config = Config(dataset_home=str(root), model_type='diffusion',
                    output_data_format='all_frames',
                    checkpoint_dir=str(tmp_path / 'ck'),
                    d_model=32, num_layers=1, num_heads=4,
                    epochs=2, batch_size=16, seed=0)
    result = run_sweep(config, tds, dds, lrs=[1e-3, 1e-4], seeds=[0],
                       max_batches_per_epoch=2)
    assert len(result.points) == 2
    assert all(math.isfinite(p.final_train_loss) for p in result.points)
    assert all(p.dev_curve is not None and len(p.dev_curve) == 2
               for p in result.points)
    # deterministic comparator: same fixed noise scored both configs
    assert result.points[0].best_dev_loss != result.points[1].best_dev_loss


def test_run_sweep_diffusion_requires_all_frames(dataset, tmp_path):
    config = Config(dataset_home=str(dataset['root']),
                    model_type='diffusion',
                    checkpoint_dir=str(tmp_path / 'ck'))
    with pytest.raises(ValueError, match='all_frames'):
        run_sweep(config, dataset['train'], dataset['dev'],
                  lrs=[1e-3], seeds=[0])


def test_sweep_rejects_batchnorm(dataset):
    ds = dataset['train']
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=50, stride=5,
                      root_history_len=ds.root_history_len,
                      hidden_dims=[16], batchnorm=True)
    batch = ds.gather(np.arange(8))
    with pytest.raises(ValueError, match='batchnorm'):
        init_sweep_states(model, make_optimizer('sgd', 1.0),
                          jnp.asarray(batch.inputs), [0])


def test_sweep_cli(dataset, tmp_path):
    env = dict(os.environ, IB_PLATFORM='cpu')
    ckpt = tmp_path / 'ck'
    out = subprocess.run(
        [sys.executable, MAIN, 'sweep', '--dataset-home',
         str(dataset['root']), '--checkpoint-dir', str(ckpt), '--no-wandb',
         '--epochs', '1', '--batch-size', '16', '--hidden-dims', '16',
         '--lrs', '1e-3', '1e-4', '--seeds', '0',
         '--max-batches-per-epoch', '3'],
        capture_output=True, text=True, env=env, timeout=420)
    assert out.returncode == 0, out.stderr[-3000:]
    assert 'sweep winner' in out.stdout
    results = json.load(open(ckpt / 'sweep' / 'feedforward'
                             / 'sweep_results.json'))
    assert len(results['points']) == 2
    assert results['best'] is not None


def test_pbt_exploit_and_explore(dataset, tmp_path):
    """PBT: the worst config adopts the best config's weights (its next
    dev loss tracks the winner's) and a perturbed lr; events recorded."""
    ds, dev = dataset['train'], dataset['dev']
    # lr=50.0 diverges immediately -> guaranteed loser slot
    config = Config(dataset_home=str(dataset['root']),
                    checkpoint_dir=str(tmp_path / 'ck'),
                    hidden_dims=[16], epochs=3, batch_size=16, seed=0)
    result = run_sweep(config, ds, dev, lrs=[1e-3, 50.0], seeds=[0],
                       max_batches_per_epoch=3, pbt_every=1)
    assert result.pbt_events, 'no PBT events recorded'
    ev = result.pbt_events[0]
    assert ev['epoch'] == 0
    assert {ev['winner'], ev['replaced']} == {0, 1}
    # the diverged slot (lr=50) lost and adopted the winner's lr x{0.8,1.25}
    winner_lr = [1e-3, 50.0][ev['winner']]
    assert ev['new_lr'] == pytest.approx(winner_lr * 0.8) \
        or ev['new_lr'] == pytest.approx(winner_lr * 1.25)
    # after exploiting, the replaced slot's NEXT dev loss is near the
    # winner's (same params, one epoch of slightly different lr)
    loser = ev['replaced']
    curve = result.points[loser].dev_curve
    assert curve[1] < curve[0] * 0.9 or curve[1] < 1e3, \
        'replaced slot did not recover after exploit'
    # final lrs recorded per slot
    assert result.points[loser].final_learning_rate == pytest.approx(
        ev['new_lr']) or len(result.pbt_events) > 1
    # plain grid run records no events
    result2 = run_sweep(config, ds, dev, lrs=[1e-3, 1e-4], seeds=[0],
                        max_batches_per_epoch=2)
    assert result2.pbt_events == []


def test_sweep_step_lr_override_matches_baked(dataset):
    """Passing lrs at call time is equivalent to baking them at build
    time (the PBT mechanism's correctness)."""
    ds = dataset['train']
    model = _tiny_model(ds)
    lc = LossConfig()
    batch = ds.gather(np.arange(16))
    bi, bl = jnp.asarray(batch.inputs), jnp.asarray(batch.labels)
    tx = make_optimizer('rmsprop', 1.0)
    rng = jax.random.PRNGKey(0)

    s1 = init_sweep_states(model, tx, bi, [0, 1])
    step_a = make_sweep_train_step(model, tx, ds.lab_offsets, lc,
                                   [1e-3, 1e-4], donate=False)
    s1, m1 = step_a(s1, bi, bl, rng)

    s2 = init_sweep_states(model, tx, bi, [0, 1])
    step_b = make_sweep_train_step(model, tx, ds.lab_offsets, lc,
                                   [9.0, 9.0], donate=False)   # wrong bake
    s2, m2 = step_b(s2, bi, bl, rng, jnp.asarray([1e-3, 1e-4], jnp.float32))
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sweep_writes_best_checkpoint_artifact(dataset, tmp_path):
    """The ranked best-dev loss corresponds to a SAVED best.ckpt whose
    recorded epoch is the best epoch (final-epoch params may be worse)."""
    from inferbiomechanics_tpu.train.checkpoint import load_checkpoint_file
    ds, dev = dataset['train'], dataset['dev']
    config = Config(dataset_home=str(dataset['root']),
                    checkpoint_dir=str(tmp_path / 'ck'),
                    hidden_dims=[16], epochs=2, batch_size=16, seed=0)
    result = run_sweep(config, ds, dev, lrs=[1e-3], seeds=[0, 1],
                       max_batches_per_epoch=3)
    for p in result.points:
        assert p.best_checkpoint_path and os.path.exists(p.best_checkpoint_path)
        model = _tiny_model2 = get_model(
            'feedforward', num_dofs=ds.num_dofs,
            num_contact_bodies=ds.num_contact_bodies, history_len=50,
            stride=5, root_history_len=ds.root_history_len,
            hidden_dims=[16])
        batch = ds.gather(np.arange(8))
        st = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.asarray(batch.inputs),
                                make_optimizer('rmsprop', 1e-3))
        st, epoch, _ = load_checkpoint_file(st, p.best_checkpoint_path)
        assert epoch == p.best_epoch


def test_sweep_sharded_data_tier(tmp_path):
    """--device-data sharded: the sweep trains on pod-sharded trial
    blocks (shard-local sample+gather feeding every config); configs
    replicated; finite per-config losses; --shard-configs composes via
    the 2-D (config, data) mesh."""
    import subprocess
    import sys
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    data = tmp_path / 'data'
    for split in ('train', 'dev'):
        os.makedirs(data / split)
        write_synthetic_subject(str(data / split / 's.b3d'), num_trials=8,
                                trial_length=150, seed=2)
    MAIN = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'main.py')
    env = dict(os.environ, IB_PLATFORM='cpu',
               XLA_FLAGS=(os.environ.get('XLA_FLAGS', '')
                          + ' --xla_force_host_platform_device_count=8').strip())
    base = ['sweep', '--dataset-home', str(data), '--checkpoint-dir',
            str(tmp_path / 'ck'), '--no-wandb', '--epochs', '1',
            '--batch-size', '16', '--lrs', '1e-4', '3e-4',
            '--device-data', 'sharded', '--hidden-dims', '16', '--short']
    out = subprocess.run([sys.executable, MAIN, *base],
                         capture_output=True, text=True, env=env,
                         timeout=420)
    assert out.returncode == 0, out.stderr[-3000:]
    assert 'sweep pod-sharded data: 8 shards' in out.stderr
    assert 'sweep winner' in out.stdout
    res = json.load(open(tmp_path / 'ck' / 'sweep' / 'feedforward'
                         / 'sweep_results.json'))
    assert len(res['points']) == 2
    assert all(np.isfinite(p['final_train_loss']) for p in res['points'])

    # round 4: --shard-configs composes with the sharded tier via the
    # 2-D (config, data) mesh instead of erroring (test_sweep_2d_cli
    # covers the full path; here just assert the mesh engages)
    out = subprocess.run([sys.executable, MAIN, *base, '--shard-configs'],
                         capture_output=True, text=True, env=env,
                         timeout=300)
    assert out.returncode == 0, out.stderr[-3000:]
    assert 'sweep 2-D mesh: 2-way config x 4-way data' in out.stderr


def test_lr_scaling_exact_with_clipping():
    """Global-norm clipping (--grad-clip-norm) preserves the sweep's
    exact-lr precondition: tx(lr, clip).update == lr * tx(1.0, clip).update."""
    params = {'w': jnp.asarray(np.random.default_rng(0)
                               .standard_normal((16, 8)), jnp.float32)}
    grads = jax.tree_util.tree_map(
        lambda p: 50.0 * jnp.asarray(np.random.default_rng(2)
                                     .standard_normal(p.shape), jnp.float32),
        params)
    lr = 3.7e-4
    for opt in ('rmsprop', 'adamw'):
        tx_b = make_optimizer(opt, lr, grad_clip_norm=1.0)
        tx_u = make_optimizer(opt, 1.0, grad_clip_norm=1.0)
        s_b, s_u = tx_b.init(params), tx_u.init(params)
        u_b, _ = tx_b.update(grads, s_b, params)
        u_u, _ = tx_u.update(grads, s_u, params)
        for a, b in zip(jax.tree_util.tree_leaves(u_b),
                        jax.tree_util.tree_leaves(
                            jax.tree_util.tree_map(lambda u: u * lr, u_u))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sweep_streaming_data_tier(dataset, tmp_path, caplog):
    """--device-data stream trains the grid out-of-core: the dataset is
    split into HBM-budget segments (forced tiny here so the epoch spans
    >1 segment) and each in-scan step updates all K configs. Identical
    configs (same lr, same seed) must produce bitwise-identical dev
    losses — the vmapped config axis cannot leak between slots — and the
    streamed run must rank a sane grid like the resident tiers."""
    import logging
    import math
    ds, dev = dataset['train'], dataset['dev']
    bytes_per_row = (ds.num_input_channels + ds.num_label_channels) * 4
    config = Config(dataset_home=str(dataset['root']),
                    checkpoint_dir=str(tmp_path / 'ck_stream'),
                    hidden_dims=[16], epochs=2, batch_size=16, seed=0,
                    device_data='stream',
                    # ~1/3 of the trial rows per segment budget would
                    # violate the whole-trial constraint (1 trial); use
                    # full-trial budget => 1 segment per trial; with one
                    # trial the plan is a single segment — still exercises
                    # the streamed path end to end
                    device_data_max_bytes=bytes_per_row * 250)
    with caplog.at_level(logging.INFO):
        result = run_sweep(config, ds, dev, lrs=[1e-3, 1e-3, 1e-4],
                           seeds=[0], max_batches_per_epoch=None)
    assert any('sweep streaming data' in r.message for r in caplog.records)
    assert len(result.points) == 3
    assert all(math.isfinite(p.final_train_loss) for p in result.points)
    assert all(math.isfinite(p.best_dev_loss) for p in result.points)
    # identical configs in different slots: bitwise-equal outcomes
    assert result.points[0].final_train_loss == result.points[1].final_train_loss
    assert result.points[0].dev_curve == result.points[1].dev_curve
    # the different lr produced a different trajectory
    assert result.points[2].final_train_loss != result.points[0].final_train_loss
    # checkpoints written and loadable
    pt = result.points[result.best_index]
    assert pt.checkpoint_path and os.path.exists(pt.checkpoint_path)


def test_sweep_streaming_multi_segment(tmp_path):
    """A streamed sweep whose epoch really spans multiple segments (two
    trials, budget sized to one trial each) stays finite and sees every
    segment's windows in its throughput accounting."""
    import math
    root = tmp_path / 'ms'
    os.makedirs(root / 'train')
    write_synthetic_subject(str(root / 'train' / 's0.b3d'), num_trials=2,
                            trial_length=120, seed=0)
    ds = WindowDataset(str(root / 'train'), window_size=20, stride=5,
                       skip_loading_skeletons=True)
    bytes_per_row = (ds.num_input_channels + ds.num_label_channels) * 4
    from inferbiomechanics_tpu.train.streaming_data import StreamingPlan
    plan = StreamingPlan(ds, bytes_per_row * 130)
    assert len(plan.segments) == 2   # the budget forces one trial/segment
    config = Config(dataset_home=str(root),
                    checkpoint_dir=str(tmp_path / 'ck_ms'),
                    hidden_dims=[16], epochs=1, batch_size=16, seed=0,
                    device_data='stream',
                    device_data_max_bytes=bytes_per_row * 130)
    result = run_sweep(config, ds, None, lrs=[1e-3, 1e-4], seeds=[0])
    assert all(math.isfinite(p.final_train_loss) for p in result.points)
    assert result.windows_per_sec > 0


def test_sweep_sharded_diffusion_tier(dataset, tmp_path):
    """--device-data sharded now covers the diffusion family: shard-local
    sample+gather of conditioning + all-frames targets, shared noising,
    vmapped K-config eps-MSE updates. Finite ranked results on the
    8-device mesh."""
    import math
    root = tmp_path / 'shd_data'
    for split, seed in (('train', 0), ('dev', 1)):
        os.makedirs(root / split)
        write_synthetic_subject(str(root / split / 's.b3d'), num_trials=8,
                                trial_length=120, seed=seed)
    tds = WindowDataset(str(root / 'train'), window_size=50, stride=5,
                        output_data_format='all_frames',
                        skip_loading_skeletons=True)
    dds = WindowDataset(str(root / 'dev'), window_size=50, stride=5,
                        output_data_format='all_frames',
                        skip_loading_skeletons=True)
    config = Config(dataset_home=str(root), model_type='diffusion',
                    output_data_format='all_frames',
                    checkpoint_dir=str(tmp_path / 'ck_shd'),
                    d_model=32, num_layers=1, num_heads=4,
                    epochs=1, batch_size=16, seed=0,
                    device_data='sharded')
    result = run_sweep(config, tds, dds, lrs=[1e-3, 1e-4], seeds=[0],
                       max_batches_per_epoch=2)
    assert len(result.points) == 2
    assert all(math.isfinite(p.final_train_loss) for p in result.points)
    assert all(math.isfinite(p.best_dev_loss) for p in result.points)
    assert result.points[0].best_dev_loss != result.points[1].best_dev_loss


def test_sweep_streaming_diffusion_tier(tmp_path):
    """--device-data stream covers the diffusion sweep too: streamed
    segments feed the vmapped K-config eps-MSE update."""
    import math
    root = tmp_path / 'sd'
    os.makedirs(root / 'train')
    write_synthetic_subject(str(root / 'train' / 's.b3d'), num_trials=2,
                            trial_length=120, seed=0)
    tds = WindowDataset(str(root / 'train'), window_size=20, stride=5,
                        output_data_format='all_frames',
                        skip_loading_skeletons=True)
    bytes_per_row = (tds.num_input_channels + tds.num_label_channels) * 4
    config = Config(dataset_home=str(root), model_type='diffusion',
                    output_data_format='all_frames', window_size=20,
                    stride=5, checkpoint_dir=str(tmp_path / 'ck_sd'),
                    d_model=16, num_layers=1, num_heads=2,
                    diffusion_timesteps=8, epochs=1, batch_size=16, seed=0,
                    device_data='stream',
                    device_data_max_bytes=bytes_per_row * 130)
    result = run_sweep(config, tds, None, lrs=[1e-3, 1e-4], seeds=[0])
    assert len(result.points) == 2
    assert all(math.isfinite(p.final_train_loss) for p in result.points)
    assert result.windows_per_sec > 0


@pytest.mark.slow
def test_sweep_diffusion_cond_dropout_reaches_the_step(dataset, tmp_path):
    """--cond-dropout changes the sweep's diffusion training stream (it
    previously went silently unwired in the sweep family)."""
    import math
    root = dataset['root']
    tds = WindowDataset(str(root / 'train'), window_size=50, stride=5,
                        output_data_format='all_frames',
                        skip_loading_skeletons=True)

    def run(p):
        config = Config(dataset_home=str(root), model_type='diffusion',
                        output_data_format='all_frames',
                        checkpoint_dir=str(tmp_path / f'ck{p}'),
                        d_model=32, num_layers=1, num_heads=4,
                        epochs=1, batch_size=16, seed=0, cond_dropout=p)
        res = run_sweep(config, tds, None, lrs=[1e-3], seeds=[0],
                        max_batches_per_epoch=2)
        return res.points[0].final_train_loss

    l0, lp = run(0.0), run(0.9)
    assert math.isfinite(lp)
    assert l0 != lp


def test_sweep_resume_continues_identically(dataset, tmp_path):
    """A sweep rerun with the same grid + checkpoint dir resumes from the
    saved grid state: the combined dev curve equals an uninterrupted run."""
    root = dataset['root']

    def mk(ck, epochs):
        return Config(dataset_home=str(root), model_type='feedforward',
                      hidden_dims=[16], epochs=epochs, batch_size=16,
                      opt_type='adam', seed=0,
                      checkpoint_dir=str(tmp_path / ck))

    tds = WindowDataset(str(root / 'train'), window_size=50, stride=5,
                        skip_loading_skeletons=True)
    dds = WindowDataset(str(root / 'dev'), window_size=50, stride=5,
                        skip_loading_skeletons=True)
    lrs, seeds = [1e-3, 1e-2], [0]

    # uninterrupted 4-epoch reference
    full = run_sweep(mk('full', 4), tds, dds, lrs=lrs, seeds=seeds,
                     max_batches_per_epoch=2)
    # interrupted: 2 epochs, then rerun to 4 with the same dir
    part = run_sweep(mk('part', 2), tds, dds, lrs=lrs, seeds=seeds,
                     max_batches_per_epoch=2)
    resumed = run_sweep(mk('part', 4), tds, dds, lrs=lrs, seeds=seeds,
                        max_batches_per_epoch=2)
    for i in range(2):
        assert resumed.points[i].dev_curve[:2] == \
            part.points[i].dev_curve
        assert resumed.points[i].dev_curve == pytest.approx(
            full.points[i].dev_curve, rel=1e-6)
    # the ranked best artifact survives the interruption
    assert all(p.best_checkpoint_path for p in resumed.points)


def test_sweep_resume_rejects_grid_mismatch(dataset, tmp_path):
    root = dataset['root']
    tds = WindowDataset(str(root / 'train'), window_size=50, stride=5,
                        skip_loading_skeletons=True)
    cfg = Config(dataset_home=str(root), model_type='feedforward',
                 hidden_dims=[16], epochs=1, batch_size=16,
                 opt_type='adam', seed=0,
                 checkpoint_dir=str(tmp_path / 'ck'))
    run_sweep(cfg, tds, None, lrs=[1e-3], seeds=[0],
              max_batches_per_epoch=2)
    # different grid in the same dir: must start fresh, not resume
    res = run_sweep(cfg, tds, None, lrs=[1e-4, 1e-5], seeds=[0],
                    max_batches_per_epoch=2)
    assert len(res.points) == 2
    assert not res.preempted


# ---------------------------------------------------------------------------
# 2-D (config, data) sweep mesh (round 4): lifts the --shard-configs x
# --device-data sharded mutual exclusion.
# ---------------------------------------------------------------------------

def _sharded_dataset(tmp_path, n_trials=8):
    data = tmp_path / 'sharded2d'
    os.makedirs(data, exist_ok=True)
    write_synthetic_subject(str(data / 's.b3d'), num_trials=n_trials,
                            trial_length=150, seed=2)
    return WindowDataset(str(data), window_size=20, stride=5)


def test_sweep_2d_mesh_matches_1d_data_mesh(tmp_path):
    """K=2 configs x data=4 on the 8-device mesh reproduces the 1-D
    sharded tier's per-config losses: same trial partition (4 shards),
    same shard-local sample RNG, same vmapped update — the config axis
    only distributes WHERE each config computes."""
    from inferbiomechanics_tpu.parallel import make_mesh, make_sweep_mesh
    from inferbiomechanics_tpu.train.sharded_data import ShardedDeviceData
    from inferbiomechanics_tpu.train.sweep import (
        make_sweep_sharded_train_step,
    )
    ds = _sharded_dataset(tmp_path)
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len,
                      hidden_dims=(16,))
    tx = make_optimizer('adam', 1.0)
    lrs = [1e-3, 1e-4]
    sample = jnp.asarray(ds.gather(np.arange(8)).inputs)

    def run(mesh, sdata):
        state = init_sweep_states(model, tx, sample, [0, 1])
        state = shard_sweep_state(state, mesh)
        step = make_sweep_sharded_train_step(model, tx, sdata, LossConfig(),
                                             lrs, batch_size=16,
                                             donate=False, mesh=mesh)
        rng = jax.random.PRNGKey(11)
        for i in range(3):
            state, metrics = step(state, jax.random.fold_in(rng, i))
        return np.asarray(metrics['loss']), state

    mesh_1d = make_mesh(n_devices=4)           # data=4, configs replicated
    loss_1d, _ = run(mesh_1d, ShardedDeviceData(ds, mesh_1d))

    mesh_2d = make_sweep_mesh(2)               # config=2 x data=4
    assert dict(mesh_2d.shape) == {'config': 2, 'data': 4}
    loss_2d, state_2d = run(mesh_2d, ShardedDeviceData(ds, mesh_2d))

    np.testing.assert_allclose(loss_2d, loss_1d, rtol=1e-5)
    # the grid state actually lives sharded on the config axis
    leaf = jax.tree_util.tree_leaves(state_2d.params)[0]
    assert 'config' in str(leaf.sharding.spec)


def test_sweep_2d_cli(tmp_path):
    """CLI: --shard-configs + --device-data sharded builds the 2-D mesh
    and produces ranked finite results."""
    data = tmp_path / 'data'
    for split in ('train', 'dev'):
        os.makedirs(data / split)
        write_synthetic_subject(str(data / split / 's.b3d'), num_trials=8,
                                trial_length=150, seed=2)
    env = dict(os.environ, IB_PLATFORM='cpu',
               XLA_FLAGS=(os.environ.get('XLA_FLAGS', '')
                          + ' --xla_force_host_platform_device_count=8').strip())
    out = subprocess.run(
        [sys.executable, MAIN, 'sweep', '--dataset-home', str(data),
         '--checkpoint-dir', str(tmp_path / 'ck'), '--no-wandb',
         '--epochs', '1', '--batch-size', '16', '--lrs', '1e-4', '3e-4',
         '--device-data', 'sharded', '--shard-configs',
         '--hidden-dims', '16', '--short'],
        capture_output=True, text=True, env=env, timeout=420)
    assert out.returncode == 0, out.stderr[-3000:]
    assert 'sweep 2-D mesh: 2-way config x 4-way data' in out.stderr
    assert 'sweep winner' in out.stdout
    res = json.load(open(tmp_path / 'ck' / 'sweep' / 'feedforward'
                         / 'sweep_results.json'))
    assert len(res['points']) == 2
    assert all(np.isfinite(p['final_train_loss']) for p in res['points'])
