"""Pod-sharded device-resident data tests (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.loss import LossConfig
from inferbiomechanics_tpu.models import get_model
from inferbiomechanics_tpu.parallel import make_mesh, replicate
from inferbiomechanics_tpu.train import create_train_state, make_optimizer
from inferbiomechanics_tpu.train.sharded_data import (
    ShardedDeviceData, gather_by_local_indices, make_sharded_epoch_runner,
    partition_trials,
)


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp('sharded')
    for i in range(3):
        write_synthetic_subject(str(d / f's{i}.b3d'), num_trials=4,
                                trial_length=120 + 30 * i, seed=i)
    return WindowDataset(str(d), window_size=20, stride=5,
                         skip_loading_skeletons=True)


def test_partition_balances_and_covers(ds):
    shards = partition_trials(ds, 8)
    assert len(shards) == 8
    all_trials = sorted(t for s in shards for t in s)
    assert all_trials == list(range(ds.trial_row_offset.shape[0]))
    trial_ends = np.append(ds.trial_row_offset[1:], ds.features_all.shape[0])
    rows = trial_ends - ds.trial_row_offset
    loads = sorted(int(sum(rows[t] for t in s)) for s in shards)
    # LPT guarantee: max load < min load + the largest single trial
    assert loads[-1] - loads[0] <= int(rows.max())


def test_partition_rejects_too_few_trials(tmp_path):
    write_synthetic_subject(str(tmp_path / 's.b3d'), num_trials=2,
                            trial_length=120, seed=0)
    small = WindowDataset(str(tmp_path), window_size=20, stride=5,
                          skip_loading_skeletons=True)
    with pytest.raises(ValueError):
        partition_trials(small, 8)


def test_sharded_gather_matches_host_gather(ds):
    """Explicit per-shard local indices, gathered via shard_map, must be
    byte-identical to the host gather of the corresponding GLOBAL
    windows (win_global is the shard-local -> global id map)."""
    mesh = make_mesh()
    sdata = ShardedDeviceData(ds, mesh, feature_dtype=jnp.float32)
    assert sdata.num_windows == len(ds)
    S, b_local = sdata.num_shards, 3
    rng = np.random.default_rng(0)
    cnt = np.asarray(sdata.win_count)
    sel = np.stack([rng.integers(0, cnt[s], b_local) for s in range(S)])
    bi, bl = gather_by_local_indices(sdata, sel)
    global_ids = np.concatenate(
        [sdata.win_global[s, sel[s]] for s in range(S)])
    host = ds.gather(global_ids)
    np.testing.assert_allclose(np.asarray(bi), host.inputs, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bl), host.labels, rtol=1e-6)
    # the resident blocks are actually sharded: per-device bytes ~ 1/S
    shard_shapes = {s.data.shape for s in sdata.features.addressable_shards}
    assert all(sh[0] == 1 for sh in shard_shapes)


def test_sharded_lazy_dataset_parity(ds, tmp_path_factory):
    """materialize_features=False: the sharded tier featurizes owned
    trials on demand (featurize_trial_features) instead of requiring the
    full matrix — byte parity with the materialized path, and exactly
    one on-demand featurization per trial (host-RAM-scaling entry)."""
    d = tmp_path_factory.mktemp('sharded_lazy')
    for i in range(3):
        write_synthetic_subject(str(d / f's{i}.b3d'), num_trials=4,
                                trial_length=120 + 30 * i, seed=i)
    lazy = WindowDataset(str(d), window_size=20, stride=5,
                         skip_loading_skeletons=True,
                         materialize_features=False)
    assert lazy.features_all is None
    calls = []
    orig = lazy.featurize_trial_features
    lazy.featurize_trial_features = lambda ti: (calls.append(ti),
                                                orig(ti))[1]
    mesh = make_mesh()
    sdata = ShardedDeviceData(lazy, mesh, feature_dtype=jnp.float32)
    # single process owns every shard -> each trial featurized exactly once
    assert sorted(calls) == list(range(lazy.trial_row_offset.shape[0]))
    sdata_mat = ShardedDeviceData(ds, mesh, feature_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(sdata.features),
                                  np.asarray(sdata_mat.features))
    np.testing.assert_array_equal(np.asarray(sdata.labels),
                                  np.asarray(sdata_mat.labels))
    np.testing.assert_array_equal(np.asarray(sdata.win_base),
                                  np.asarray(sdata_mat.win_base))
    np.testing.assert_array_equal(sdata.win_global, sdata_mat.win_global)


def test_sharded_gather_all_frames(ds, tmp_path):
    write_synthetic_subject(str(tmp_path / 's.b3d'), num_trials=8,
                            trial_length=120, seed=9)
    af = WindowDataset(str(tmp_path), window_size=20, stride=5,
                       output_data_format='all_frames',
                       skip_loading_skeletons=True)
    mesh = make_mesh()
    sdata = ShardedDeviceData(af, mesh, feature_dtype=jnp.float32)
    sel = np.zeros((sdata.num_shards, 2), np.int64)
    bi, bl = gather_by_local_indices(sdata, sel)
    assert bl.shape == (2 * sdata.num_shards, af.num_model_frames,
                        af.labels_all.shape[1])
    global_ids = np.concatenate(
        [sdata.win_global[s, sel[s]] for s in range(sdata.num_shards)])
    host = af.gather(global_ids)
    np.testing.assert_allclose(np.asarray(bl), host.labels, rtol=1e-6)


def test_sharded_epoch_runner_trains(ds):
    mesh = make_mesh()
    sdata = ShardedDeviceData(ds, mesh)
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len)
    sample = ds.gather(np.arange(16))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(sample.inputs),
                               make_optimizer('adam', 1e-3))
    state = replicate(mesh, state)
    run = make_sharded_epoch_runner(model, sdata, LossConfig(),
                                    batch_size=16)
    rng = jax.random.PRNGKey(0)
    state, m0 = run(state, rng)          # donates state: chain
    assert np.isfinite(float(m0['loss']))
    for e in range(5):
        state, m = run(state, jax.random.fold_in(rng, e))
    assert float(m['loss']) < float(m0['loss'])


def test_sharded_runner_rejects_bad_batch(ds):
    mesh = make_mesh()
    sdata = ShardedDeviceData(ds, mesh)
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len)
    with pytest.raises(ValueError):
        make_sharded_epoch_runner(model, sdata, LossConfig(), batch_size=12)


def test_sharded_runner_bf16_allreduce_matches(ds):
    """grad_allreduce_dtype=bf16 on the sharded tier: in-shard_map
    sample+gather+grad with one explicit bf16 psum. Same rng -> same
    sampled batches as the GSPMD runner, so the first-epoch update must
    match within bf16 reduction rounding; lowered StableHLO carries the
    bf16 all_reduce regions."""
    mesh = make_mesh()
    sdata = ShardedDeviceData(ds, mesh)
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len, dropout=False)
    sample = ds.gather(np.arange(16))

    def fresh():
        st = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.asarray(sample.inputs),
                                make_optimizer('sgd', 1e-3))
        return replicate(mesh, st)

    rng = jax.random.PRNGKey(3)
    run_f32 = make_sharded_epoch_runner(model, sdata, LossConfig(),
                                        batch_size=16, steps_per_call=2)
    run_bf16 = make_sharded_epoch_runner(model, sdata, LossConfig(),
                                         batch_size=16, steps_per_call=2,
                                         grad_allreduce_dtype=jnp.bfloat16)
    s0 = fresh()
    p0 = jax.tree_util.tree_map(np.asarray, jax.device_get(s0.params))
    s_f, m_f = run_f32(s0, rng)
    s_b, m_b = run_bf16(fresh(), rng)
    np.testing.assert_allclose(float(m_b['loss']), float(m_f['loss']),
                               rtol=1e-3)
    for pa, pb, pz in zip(jax.tree_util.tree_leaves(s_f.params),
                          jax.tree_util.tree_leaves(s_b.params),
                          jax.tree_util.tree_leaves(p0)):
        ua = np.asarray(pa) - pz
        ub = np.asarray(pb) - pz
        assert np.abs(ua - ub).max() <= 0.02 * max(np.abs(ua).max(), 1e-12)


def test_sharded_diffusion_runner_trains_with_ema(tmp_path):
    """Pod-sharded diffusion: eps-loss decreases over epochs and the EMA
    tree lags the raw params (all_frames labels, 8 shards)."""
    write_synthetic_subject(str(tmp_path / 's.b3d'), num_trials=8,
                            trial_length=150, seed=5)
    dds = WindowDataset(str(tmp_path), window_size=20, stride=5,
                        output_data_format='all_frames',
                        skip_loading_skeletons=True)
    mesh = make_mesh()
    from inferbiomechanics_tpu.models.diffusion import (
        DDPMSchedule, DiffusionDenoiser,
    )
    from inferbiomechanics_tpu.train.sharded_data import (
        make_sharded_diffusion_epoch_runner,
    )
    from inferbiomechanics_tpu.train.state import TrainState
    sdata = ShardedDeviceData(dds, mesh)
    model = DiffusionDenoiser(num_dofs=dds.num_dofs,
                              num_contact_bodies=dds.num_contact_bodies,
                              history_len=20, stride=5, d_model=16,
                              num_layers=1, num_heads=2, timesteps=8)
    sched = DDPMSchedule(8)
    sample = dds.gather(np.arange(16))
    x_cond = jnp.asarray(sample.inputs)
    x0 = jnp.zeros((16, x_cond.shape[1], model.target_channels))
    t0 = jnp.zeros((16,), jnp.int32)
    variables = model.init({'params': jax.random.PRNGKey(0)}, x0, t0, x_cond)
    tx = make_optimizer('adam', 1e-3)
    state = TrainState(step=jnp.asarray(0, jnp.int32),
                       params=variables['params'],
                       opt_state=tx.init(variables['params']),
                       batch_stats={}, tx=tx, apply_fn=model.apply)
    state = replicate(mesh, state)
    ema = replicate(mesh, jax.device_get(state.params))
    run = make_sharded_diffusion_epoch_runner(model, sdata, sched,
                                              batch_size=16, ema_decay=0.9)
    rng = jax.random.PRNGKey(0)
    state, ema, m0 = run(state, ema, rng)
    for e in range(4):
        state, ema, m = run(state, ema, jax.random.fold_in(rng, e))
    assert float(m['loss']) < float(m0['loss'])
    diff = any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree_util.tree_leaves(ema),
                               jax.tree_util.tree_leaves(state.params)))
    assert diff


def test_sharded_runner_with_augmenter(ds):
    """Mirror+noise augmentation compiles and trains on the pod-sharded
    tier (both the GSPMD and bf16-shard_map step variants)."""
    from inferbiomechanics_tpu.train.augment import (Augmenter,
                                                     spec_from_dataset)
    mesh = make_mesh()
    sdata = ShardedDeviceData(ds, mesh)
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len)
    sample = ds.gather(np.arange(16))
    aug = Augmenter(mirror=spec_from_dataset(ds), noise_std=0.02)
    for lowp in (None, jnp.bfloat16):
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.asarray(sample.inputs),
                                   make_optimizer('adam', 1e-3))
        state = replicate(mesh, state)
        run = make_sharded_epoch_runner(model, sdata, LossConfig(),
                                        batch_size=16,
                                        grad_allreduce_dtype=lowp,
                                        augment=aug)
        state, m = run(state, jax.random.PRNGKey(1))
        assert np.isfinite(float(m['loss'])), lowp
