"""Device-resident data path tests (CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.loss import LossConfig
from inferbiomechanics_tpu.models import get_model
from inferbiomechanics_tpu.train import create_train_state, make_optimizer, make_train_step
from inferbiomechanics_tpu.train.device_data import (
    DeviceResidentData, make_device_epoch_runner, make_device_eval_runner,
    make_device_train_step,
)


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp('dev_data')
    write_synthetic_subject(str(d / 's.b3d'), num_trials=2, trial_length=300, seed=3)
    return WindowDataset(str(d), window_size=20, stride=5,
                         skip_loading_skeletons=True)


def _state(ds, model, opt='adam'):
    b = ds.gather(np.arange(16))
    return create_train_state(model, jax.random.PRNGKey(0),
                              jnp.asarray(b.inputs),
                              make_optimizer(opt, 1e-3)), b


def test_gather_in_jit_matches_host_gather(ds):
    data = DeviceResidentData(ds, feature_dtype=jnp.float32)
    idx = np.asarray([0, 5, 17, len(ds) - 1])
    bi, bl = jax.jit(data.gather_in_jit)(jnp.asarray(idx, jnp.int32))
    host = ds.gather(idx)
    np.testing.assert_allclose(np.asarray(bi), host.inputs, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bl), host.labels, rtol=1e-6)


def test_device_step_matches_host_step(ds):
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5, root_history_len=ds.root_history_len)
    state, batch = _state(ds, model)
    data = DeviceResidentData(ds, feature_dtype=jnp.float32)
    dstep = make_device_train_step(model, data, LossConfig(), donate=False)
    hstep = make_train_step(model, ds.lab_offsets, LossConfig(), donate=False)
    rng = jax.random.PRNGKey(1)
    idx = jnp.asarray(np.arange(16), jnp.int32)
    s_d, m_d = dstep(state, idx, rng)
    s_h, m_h = hstep(state, jnp.asarray(batch.inputs), jnp.asarray(batch.labels), rng)
    np.testing.assert_allclose(float(m_d['loss']), float(m_h['loss']), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_d.params),
                    jax.tree_util.tree_leaves(s_h.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_epoch_runner_trains(ds):
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5, root_history_len=ds.root_history_len)
    state, _ = _state(ds, model)
    data = DeviceResidentData(ds)
    run = make_device_epoch_runner(model, data, LossConfig(), batch_size=32)
    rng = jax.random.PRNGKey(0)
    # NOTE: the runner donates its state argument — always chain
    state, m0 = run(state, rng)
    for e in range(5):
        state, m = run(state, jax.random.fold_in(rng, e))
    assert float(m['loss']) < float(m0['loss'])


def test_epoch_step_sample_windows_trains(ds):
    """sample_windows=True: run(state, rng) draws window indices ON
    DEVICE (bench.py tier 2 — host-shipped index chunks cost transfer
    over the slow dev tunnel) and trains."""
    from inferbiomechanics_tpu.train.device_data import make_device_epoch_step
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5, root_history_len=ds.root_history_len)
    state, _ = _state(ds, model)
    data = DeviceResidentData(ds)
    run = make_device_epoch_step(model, data, LossConfig(), batch_size=32,
                                 steps_per_call=3, sample_windows=True)
    rng = jax.random.PRNGKey(0)
    state, m0 = run(state, rng)        # donates state: chain
    for e in range(5):
        state, m = run(state, jax.random.fold_in(rng, e))
    assert np.isfinite(float(m['loss']))
    assert float(m['loss']) < float(m0['loss'])


def test_eval_runner_matches_host_eval(ds):
    from inferbiomechanics_tpu.train import make_eval_step
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5, root_history_len=ds.root_history_len)
    state, _ = _state(ds, model)
    data = DeviceResidentData(ds, feature_dtype=jnp.float32)
    bs = 32
    run_eval = make_device_eval_runner(model, data, LossConfig(), bs)
    metrics_d = run_eval(state)

    eval_step = make_eval_step(model, ds.lab_offsets, LossConfig())
    accum = []
    n_steps = len(ds) // bs
    for k in range(n_steps):
        b = ds.gather(np.arange(k * bs, (k + 1) * bs))
        _, m = eval_step(state, jnp.asarray(b.inputs), jnp.asarray(b.labels))
        accum.append(float(m['loss']))
    np.testing.assert_allclose(float(metrics_d['loss']), np.mean(accum), rtol=1e-5)


def test_epoch_runner_rejects_tiny_dataset(ds):
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5, root_history_len=ds.root_history_len)
    data = DeviceResidentData(ds)
    with pytest.raises(ValueError):
        make_device_epoch_runner(model, data, LossConfig(),
                                 batch_size=len(ds) + 1)


def test_packed_gather_matches_strided_gather(ds):
    """pack_windows=True: the window-major packed copy must yield
    byte-identical batches to the frame-major strided gather (it is the
    same data, relaid; train/device_data.py probe: 1.5x step)."""
    plain = DeviceResidentData(ds, feature_dtype=jnp.float32)
    packed = DeviceResidentData(ds, feature_dtype=jnp.float32,
                                pack_windows=True)
    assert packed.features_packed is not None
    assert packed.hbm_bytes > plain.hbm_bytes
    est = DeviceResidentData.packed_bytes_estimate(ds, jnp.float32)
    assert est == packed.features_packed.nbytes
    idx = jnp.asarray([0, 5, 17, len(ds) - 1], jnp.int32)
    pi, pl = jax.jit(plain.gather_in_jit)(idx)
    qi, ql = jax.jit(packed.gather_in_jit)(idx)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(qi))
    np.testing.assert_array_equal(np.asarray(pl), np.asarray(ql))


def test_packed_epoch_runner_matches_unpacked(ds):
    """The epoch runner produces identical training trajectories with
    and without window packing (same rng -> same permutation -> same
    batches -> same params)."""
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5, root_history_len=ds.root_history_len)
    rng = jax.random.PRNGKey(0)
    losses = []
    params = []
    for pack in (False, True):
        state, _ = _state(ds, model)
        data = DeviceResidentData(ds, feature_dtype=jnp.float32,
                                  pack_windows=pack)
        run = make_device_epoch_runner(model, data, LossConfig(), batch_size=32)
        state, m = run(state, rng)
        losses.append(float(m['loss']))
        params.append(jax.tree_util.tree_leaves(state.params))
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    for a, b in zip(*params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_packed_gather_all_frames_packs_labels(tmp_path):
    """all_frames mode: labels are per-frame like the features, so
    pack_windows packs them too and the gathered batch is identical."""
    write_synthetic_subject(str(tmp_path / 's.b3d'), num_trials=1,
                            trial_length=200, seed=4)
    af = WindowDataset(str(tmp_path), window_size=20, stride=5,
                       output_data_format='all_frames',
                       skip_loading_skeletons=True)
    plain = DeviceResidentData(af, feature_dtype=jnp.float32)
    packed = DeviceResidentData(af, feature_dtype=jnp.float32,
                                pack_windows=True)
    assert packed.labels_packed is not None
    idx = jnp.asarray([0, 3, len(af) - 1], jnp.int32)
    pi, pl = jax.jit(plain.gather_in_jit)(idx)
    qi, ql = jax.jit(packed.gather_in_jit)(idx)
    assert ql.shape == pl.shape == (3, af.num_model_frames,
                                    af.labels_all.shape[1])
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(qi))
    np.testing.assert_array_equal(np.asarray(pl), np.asarray(ql))
    est = DeviceResidentData.packed_bytes_estimate(af, jnp.float32)
    assert est == (packed.features_packed.nbytes
                   + packed.labels_packed.nbytes)


def test_device_step_dp_sharded_matches_single(ds):
    """batch_shard pins the gathered batch onto the data axis: the
    8-way-dp step must (a) reproduce the single-device step and (b)
    compile to a program that actually all-reduces gradients — without
    the constraint GSPMD may keep the whole step replicated (every
    device computing the full batch, zero dp speedup)."""
    from inferbiomechanics_tpu.parallel import (
        batch_sharding, make_mesh, replicate, shard_batch,
    )
    from inferbiomechanics_tpu.parallel.mesh import replicated
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5, root_history_len=ds.root_history_len)
    state0, _ = _state(ds, model)
    rng = jax.random.PRNGKey(1)
    idx_np = np.arange(16, dtype=np.int32)

    data1 = DeviceResidentData(ds, feature_dtype=jnp.float32)
    step1 = make_device_train_step(model, data1, LossConfig(), donate=False)
    s1, m1 = step1(state0, jnp.asarray(idx_np), rng)

    mesh = make_mesh()
    assert mesh.shape['data'] == len(jax.devices())
    dataN = DeviceResidentData(ds, sharding=replicated(mesh),
                               feature_dtype=jnp.float32)
    stateN = replicate(mesh, state0)
    stepN = make_device_train_step(model, dataN, LossConfig(), donate=False,
                                   batch_shard=batch_sharding(mesh))
    idx_g = shard_batch(mesh, idx_np)
    sN, mN = stepN(stateN, idx_g, rng)
    np.testing.assert_allclose(float(mN['loss']), float(m1['loss']), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(sN.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    hlo = stepN.lower(stateN, idx_g, rng).compile().as_text()
    assert 'all-reduce' in hlo, 'dp step compiled without a gradient all-reduce'


def test_gather_non_divisible_stride(tmp_path):
    """window_size not divisible by stride: every gather path must take
    exactly num_model_frames = window_size // stride frames (reference
    readFrames(n=window//stride) semantics) — arange(0, W, s) would grab
    an extra frame and crash the packed reshape (regression: the
    --history-len 22 --stride 5 CLI combination)."""
    write_synthetic_subject(str(tmp_path / 's.b3d'), num_trials=1,
                            trial_length=200, seed=5)
    nd = WindowDataset(str(tmp_path), window_size=22, stride=5,
                       skip_loading_skeletons=True)
    assert nd.num_model_frames == 4
    plain = DeviceResidentData(nd, feature_dtype=jnp.float32)
    packed = DeviceResidentData(nd, feature_dtype=jnp.float32,
                                pack_windows=True)
    est = DeviceResidentData.packed_bytes_estimate(nd, jnp.float32)
    assert est == packed.features_packed.nbytes
    idx = jnp.asarray([0, 3, len(nd) - 1], jnp.int32)
    pi, pl = jax.jit(plain.gather_in_jit)(idx)
    qi, ql = jax.jit(packed.gather_in_jit)(idx)
    assert pi.shape == qi.shape == (3, 4, nd.features_all.shape[1])
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(qi))
    np.testing.assert_array_equal(np.asarray(pl), np.asarray(ql))
    # device gather agrees with the host (native/numpy) gather
    host = nd.gather(np.asarray([0, 3, len(nd) - 1]))
    np.testing.assert_allclose(np.asarray(pi), host.inputs, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pl), host.labels, rtol=1e-6)


def test_tiled_device_data_packs_windows(ds):
    from inferbiomechanics_tpu.train.device_data import TiledDeviceData
    tiled = TiledDeviceData(ds, seed_rows=16, pack_windows=True)
    plain = TiledDeviceData(ds, seed_rows=16)
    assert tiled.upload_bytes == plain.upload_bytes  # packing is on-device
    idx = jnp.arange(4, dtype=jnp.int32)
    ti, tl = jax.jit(tiled.gather_in_jit)(idx)
    pi, pl = jax.jit(plain.gather_in_jit)(idx)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(pi))
    np.testing.assert_array_equal(np.asarray(tl), np.asarray(pl))


def test_tiled_device_data_matches_interface(ds):
    """TiledDeviceData (bench small-upload variant) serves the same
    gather interface/shapes as DeviceResidentData with frame contents
    repeating at the seed period."""
    from inferbiomechanics_tpu.train.device_data import TiledDeviceData
    full = DeviceResidentData(ds)
    tiled = TiledDeviceData(ds, seed_rows=16)
    assert tiled.num_windows == full.num_windows
    assert tiled.upload_bytes < full.features_all.nbytes
    idx = jnp.arange(4, dtype=jnp.int32)
    fi, fl = full.gather_in_jit(idx)
    ti, tl = tiled.gather_in_jit(idx)
    assert fi.shape == ti.shape and fl.shape == tl.shape
    assert fi.dtype == ti.dtype and fl.dtype == tl.dtype
    # tiled rows repeat with the seed period
    f = np.asarray(tiled.features_all)
    np.testing.assert_array_equal(f[0], f[16 % f.shape[0] and 16])
    assert np.isfinite(np.asarray(tl)).all()


def test_grad_accum_matches_full_batch_host(ds):
    """make_train_step(grad_accum=4) on a 16-row batch produces the same
    update as one full-batch step (equal microbatches -> identical mean
    gradient up to float reassociation). Dropout off so the per-
    microbatch RNG split cannot differ from the full-batch draw."""
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len, dropout=False)
    state, batch = _state(ds, model, opt='sgd')
    rng = jax.random.PRNGKey(1)
    x, y = jnp.asarray(batch.inputs), jnp.asarray(batch.labels)
    full = make_train_step(model, ds.lab_offsets, LossConfig(), donate=False)
    accum = make_train_step(model, ds.lab_offsets, LossConfig(),
                            donate=False, grad_accum=4)
    s_f, m_f = full(state, x, y, rng)
    s_a, m_a = accum(state, x, y, rng)
    np.testing.assert_allclose(float(m_a['loss']), float(m_f['loss']),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_f.params)):
        # bf16 matmuls reassociate across the microbatch split: tiny
        # absolute noise on near-zero params, hence the tolerances
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


def test_grad_accum_matches_full_batch_device(ds):
    """Device-resident accumulation gathers each microbatch inside the
    scan; the result must still match the whole-batch device step."""
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len, dropout=False)
    state, _ = _state(ds, model, opt='sgd')
    data = DeviceResidentData(ds, feature_dtype=jnp.float32)
    full = make_device_train_step(model, data, LossConfig(), donate=False)
    accum = make_device_train_step(model, data, LossConfig(), donate=False,
                                   grad_accum=2)
    rng = jax.random.PRNGKey(2)
    idx = jnp.asarray(np.arange(16), jnp.int32)
    s_f, m_f = full(state, idx, rng)
    s_a, m_a = accum(state, idx, rng)
    np.testing.assert_allclose(float(m_a['loss']), float(m_f['loss']),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_f.params)):
        # bf16 matmuls reassociate across the microbatch split: tiny
        # absolute noise on near-zero params, hence the tolerances
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


def test_grad_accum_batch_stats_chain(ds):
    """Batchnorm stats thread through the accumulation scan (each
    microbatch updates the running stats the next one consumes)."""
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len,
                      batchnorm=True, dropout=False)
    state, batch = _state(ds, model)
    assert state.batch_stats
    accum = make_train_step(model, ds.lab_offsets, LossConfig(),
                            donate=False, grad_accum=4)
    before = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    s_a, m_a = accum(state, jnp.asarray(batch.inputs),
                     jnp.asarray(batch.labels), jax.random.PRNGKey(3))
    assert np.isfinite(float(m_a['loss']))
    changed = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(s_a.batch_stats)))
    assert changed


def test_grad_accum_rejects_indivisible(ds):
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len, dropout=False)
    state, batch = _state(ds, model)
    accum = make_train_step(model, ds.lab_offsets, LossConfig(),
                            donate=False, grad_accum=5)
    with pytest.raises(ValueError, match='not divisible'):
        accum(state, jnp.asarray(batch.inputs), jnp.asarray(batch.labels),
              jax.random.PRNGKey(0))


def _mesh8():
    from inferbiomechanics_tpu.parallel.mesh import make_mesh
    return make_mesh()


def test_bf16_allreduce_matches_plain_device_step(ds):
    """--grad-allreduce-dtype bf16 (explicit shard_map psum in bf16):
    per-step update within bf16 rounding of the GSPMD f32 step, for both
    plain and accumulating variants."""
    from inferbiomechanics_tpu.parallel.mesh import (
        batch_sharding, replicate, replicated,
    )
    mesh = _mesh8()
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len, dropout=False)
    state, _ = _state(ds, model, opt='sgd')
    state = replicate(mesh, state)
    data = DeviceResidentData(ds, sharding=replicated(mesh),
                              feature_dtype=jnp.float32)
    plain = make_device_train_step(model, data, LossConfig(), donate=False,
                                   batch_shard=batch_sharding(mesh))
    idx = jax.device_put(jnp.arange(16, dtype=jnp.int32),
                         batch_sharding(mesh))
    rng = jax.random.PRNGKey(1)
    s_p, m_p = plain(state, idx, rng)
    for accum in (1, 2):
        lowp = make_device_train_step(model, data, LossConfig(),
                                      donate=False, grad_accum=accum,
                                      grad_allreduce_dtype=jnp.bfloat16,
                                      mesh=mesh)
        s_l, m_l = lowp(state, idx, rng)
        np.testing.assert_allclose(float(m_l['loss']), float(m_p['loss']),
                                   rtol=1e-5)
        for pa, pb, p0 in zip(jax.tree_util.tree_leaves(s_p.params),
                              jax.tree_util.tree_leaves(s_l.params),
                              jax.tree_util.tree_leaves(state.params)):
            ua = np.asarray(pa - p0)
            ub = np.asarray(pb - p0)
            # updates agree to bf16 rounding of the gradient (~0.6%)
            assert np.abs(ua - ub).max() <= 0.02 * max(np.abs(ua).max(),
                                                       1e-12)


def test_bf16_allreduce_lowers_to_bf16_collective(ds):
    """The lowered StableHLO must carry all_reduce ops whose reduction
    region computes in bf16 — the whole point of the flag. (The compiled
    CPU HLO can't show this: the CPU backend promotes small-type
    all-reduces to f32; TPU consumes the lowered module below.)"""
    from inferbiomechanics_tpu.parallel.mesh import (
        batch_sharding, replicate, replicated,
    )
    mesh = _mesh8()
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len, dropout=False)
    state, _ = _state(ds, model, opt='sgd')
    state = replicate(mesh, state)
    data = DeviceResidentData(ds, sharding=replicated(mesh),
                              feature_dtype=jnp.float32)
    lowp = make_device_train_step(model, data, LossConfig(), donate=False,
                                  grad_allreduce_dtype=jnp.bfloat16,
                                  mesh=mesh)
    idx = jax.device_put(jnp.arange(16, dtype=jnp.int32),
                         batch_sharding(mesh))
    text = lowp.lower(state, idx, jax.random.PRNGKey(0)).as_text()
    chunks = text.split('stablehlo.all_reduce')[1:]
    bf16_regions = sum('tensor<bf16>' in c[:400] for c in chunks)
    assert bf16_regions >= 4, f'{bf16_regions} bf16 all_reduce regions'


def test_bf16_allreduce_rejects_batchnorm(ds):
    from inferbiomechanics_tpu.parallel.mesh import replicate, replicated
    mesh = _mesh8()
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len,
                      batchnorm=True, dropout=False)
    state, _ = _state(ds, model)
    state = replicate(mesh, state)
    data = DeviceResidentData(ds, sharding=replicated(mesh),
                              feature_dtype=jnp.float32)
    lowp = make_device_train_step(model, data, LossConfig(), donate=False,
                                  grad_allreduce_dtype=jnp.bfloat16,
                                  mesh=mesh)
    with pytest.raises(ValueError, match='batchnorm'):
        lowp(state, jnp.arange(16, dtype=jnp.int32), jax.random.PRNGKey(0))


def test_bf16_allreduce_host_step_matches(ds):
    """Host-path make_train_step honors grad_allreduce_dtype too."""
    from inferbiomechanics_tpu.parallel.mesh import (
        batch_sharding, replicate, shard_batch,
    )
    mesh = _mesh8()
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len, dropout=False)
    state, batch = _state(ds, model, opt='sgd')
    state = replicate(mesh, state)
    x, y = shard_batch(mesh, jnp.asarray(batch.inputs),
                       jnp.asarray(batch.labels))
    plain = make_train_step(model, ds.lab_offsets, LossConfig(),
                            donate=False)
    lowp = make_train_step(model, ds.lab_offsets, LossConfig(),
                           donate=False, grad_allreduce_dtype=jnp.bfloat16,
                           mesh=mesh)
    rng = jax.random.PRNGKey(1)
    s_p, m_p = plain(state, x, y, rng)
    s_l, m_l = lowp(state, x, y, rng)
    np.testing.assert_allclose(float(m_l['loss']), float(m_p['loss']),
                               rtol=1e-5)
    for pa, pb, p0 in zip(jax.tree_util.tree_leaves(s_p.params),
                          jax.tree_util.tree_leaves(s_l.params),
                          jax.tree_util.tree_leaves(state.params)):
        ua = np.asarray(pa - p0)
        ub = np.asarray(pb - p0)
        assert np.abs(ua - ub).max() <= 0.02 * max(np.abs(ua).max(), 1e-12)


def test_device_chunked_step_matches_per_step(ds):
    """--device-chunk-steps: a K-step scan over [K, B] index blocks
    reproduces K per-step dispatches (same step body, same RNG keys) —
    the flagship tier's dispatch-amortization lever (round 4)."""
    from inferbiomechanics_tpu.train.device_data import (
        make_device_chunked_step,
    )
    data = DeviceResidentData(ds, feature_dtype=jnp.float32)
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len,
                      hidden_dims=(16,))
    state, _b = _state(ds, model)
    K, B = 4, 8
    rng_np = np.random.default_rng(0)
    idx = rng_np.integers(0, len(ds), (K, B)).astype(np.int32)
    base = jax.random.PRNGKey(9)
    rngs = jnp.stack([jax.random.fold_in(base, i) for i in range(K)])

    step = make_device_train_step(model, data, LossConfig(), donate=False)
    s1 = state
    losses = []
    for i in range(K):
        s1, m = step(s1, jnp.asarray(idx[i]), jax.random.fold_in(base, i))
        losses.append(float(m['loss']))

    chunk = make_device_chunked_step(model, data, LossConfig(), K,
                                     donate=False)
    s2, ms = chunk(state, jnp.asarray(idx), rngs)
    np.testing.assert_allclose(np.asarray(ms['loss']), losses, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_train_loop_device_chunked_matches_per_step(ds, tmp_path):
    """Full train loop, device-resident tier: --device-chunk-steps 2
    reproduces per-step dispatch (same host permutation, same RNG folds),
    including the remainder fallback (5 steps/epoch, K=2)."""
    import jax
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.train import load_latest_checkpoint
    from inferbiomechanics_tpu.train.loop import build_model_for_dataset, train

    params = {}
    results = {}
    for chunk in (1, 2):
        ckpt = str(tmp_path / f'devchunk{chunk}')
        cfg = Config(window_size=20, stride=5, model_type='feedforward',
                     checkpoint_dir=ckpt, epochs=2, batch_size=16,
                     opt_type='adam', learning_rate=1e-3, device_data='on',
                     checkpoint_every_batches=1000, log_every_batches=1000,
                     hidden_dims=[16], seed=11, device_chunk_steps=chunk)
        results[chunk] = train(cfg, ds, ds, max_batches_per_epoch=5)
        model = build_model_for_dataset(cfg, ds)
        sample = ds.gather(np.arange(4))
        st = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.asarray(sample.inputs),
                                make_optimizer('adam', 1e-3))
        st, e, b = load_latest_checkpoint(st, ckpt)
        assert (e, b) == (1, 0)
        params[chunk] = jax.tree_util.tree_leaves(st.params)
    for a, b in zip(params[1], params[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    assert results[1].windows_seen == results[2].windows_seen


def test_device_chunked_midepoch_checkpoint_resumes_exactly(ds, tmp_path):
    """A mid-epoch checkpoint written from inside chunked dispatch must
    hold the state of exactly the batches its label names: resuming from
    it and replaying the rest of the epoch reproduces the uninterrupted
    run bitwise. Regression: the deferred metric drain used to write the
    checkpoint AFTER the next chunk was dispatched, so the saved state
    was one chunk ahead and the resume double-applied that chunk."""
    import os
    import jax
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.train import load_latest_checkpoint
    from inferbiomechanics_tpu.train.loop import build_model_for_dataset, train

    def cfg_for(d):
        return Config(window_size=20, stride=5, model_type='feedforward',
                      checkpoint_dir=d, epochs=1, batch_size=16,
                      opt_type='adam', learning_rate=1e-3, device_data='on',
                      checkpoint_every_batches=2, log_every_batches=1000,
                      hidden_dims=[16], seed=13, device_chunk_steps=2)

    def final_params(d):
        model = build_model_for_dataset(cfg_for(d), ds)
        sample = ds.gather(np.arange(4))
        st = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.asarray(sample.inputs),
                                make_optimizer('adam', 1e-3))
        st, _, _ = load_latest_checkpoint(st, d)
        return jax.tree_util.tree_leaves(st.params)

    d_full = str(tmp_path / 'full')
    train(cfg_for(d_full), ds, ds, max_batches_per_epoch=6)

    # same run, then rewind to the mid-epoch checkpoint at (0, 3) —
    # chunks (0,1)(2,3)(4,5) with every=2 checkpoint at batch 3 and 5 —
    # and resume the rest of the epoch
    d_res = str(tmp_path / 'resumed')
    train(cfg_for(d_res), ds, ds, max_batches_per_epoch=6)
    kept = 'epoch_0_batch_3.ckpt'
    names = sorted(os.listdir(d_res))
    assert kept in names, names
    for n in names:
        if n != kept and n.endswith('.ckpt'):
            os.remove(os.path.join(d_res, n))
    train(cfg_for(d_res), ds, ds, max_batches_per_epoch=6)

    for a, b in zip(final_params(d_full), final_params(d_res)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
