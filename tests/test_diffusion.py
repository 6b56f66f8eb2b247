"""Diffusion denoiser tests: schedule, training step, sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.keys import OutputDataKeys
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.models.diffusion import (
    DDPMSchedule, DiffusionDenoiser, diffusion_targets_from_labels,
    make_diffusion_train_step, make_sampler,
)
from inferbiomechanics_tpu.train.state import TrainState
from inferbiomechanics_tpu.train.optimizers import make_optimizer


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp('diffdata')
    write_synthetic_subject(str(d / 's.b3d'), num_trials=1, trial_length=200, seed=0)
    return WindowDataset(str(d), window_size=20, stride=5,
                         output_data_format='all_frames',
                         skip_loading_skeletons=True)


def _model(ds, timesteps=64):
    return DiffusionDenoiser(num_dofs=ds.num_dofs,
                             num_contact_bodies=ds.num_contact_bodies,
                             history_len=20, stride=5, d_model=64,
                             num_layers=2, num_heads=4, timesteps=timesteps)


def _state(model, ds):
    batch = ds.gather(np.arange(8))
    x_cond = jnp.asarray(batch.inputs)
    x0 = jnp.zeros((8, 4, model.target_channels))
    t = jnp.zeros((8,), jnp.int32)
    variables = model.init({'params': jax.random.PRNGKey(0)}, x0, t, x_cond)
    tx = make_optimizer('adam', 1e-3)
    return TrainState(step=jnp.asarray(0, jnp.int32), params=variables['params'],
                      opt_state=tx.init(variables['params']), batch_stats={},
                      tx=tx, apply_fn=model.apply), batch


def test_schedule_monotone_alpha_bar():
    s = DDPMSchedule(100)
    ab = np.asarray(s.alpha_bars)
    assert ab.shape == (100,)
    assert (np.diff(ab) < 0).all()          # strictly decreasing
    assert 0 < ab[-1] < ab[0] <= 1.0
    # q_sample at t=0 is nearly clean; at t=T-1 nearly pure noise
    x0 = jnp.ones((2, 3, 4))
    noise = jnp.zeros((2, 3, 4))
    x_t0 = s.q_sample(x0, jnp.zeros(2, jnp.int32), noise)
    np.testing.assert_allclose(np.asarray(x_t0), np.sqrt(ab[0]), rtol=1e-5)


def test_targets_extraction(ds):
    from inferbiomechanics_tpu.models.diffusion import target_scales
    batch = ds.gather(np.arange(4))
    x0_n = diffusion_targets_from_labels(jnp.asarray(batch.labels),
                                         ds.lab_offsets, ds.num_contact_bodies)
    assert x0_n.shape == (4, 4, 30)
    # the diffusion space is per-channel normalized (unit-variance noise
    # schedule); scaling back recovers the raw label slices exactly
    x0 = x0_n * target_scales(ds.num_contact_bodies)
    labels = ds.unpack_labels(batch.labels)
    np.testing.assert_allclose(
        np.asarray(x0[..., :6]),
        np.asarray(labels[OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME]),
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(x0[..., 6:12]),
        np.asarray(labels[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME]),
        rtol=1e-6, atol=1e-6)


def test_legacy_raw_target_space_sampler(ds, tmp_path):
    """Checkpoints trained before the round-5 target normalization
    denoise raw kg-normalized channels; `checkpoint_target_space`
    detects them from the sidecar (key absent = raw) and
    `make_sampler(target_space='raw')` must skip the exit multiply —
    otherwise every legacy prediction silently inflates ~10x."""
    import json
    import os
    from inferbiomechanics_tpu.models.diffusion import (
        checkpoint_target_space, target_scales,
    )
    from inferbiomechanics_tpu.train.run_config import (
        RUN_CONFIG_NAME, save_run_config,
    )
    from inferbiomechanics_tpu.config import Config

    # sidecar detection: current trainings mark themselves normalized;
    # pre-round-5 sidecars (no key) and sidecar-less dirs read as raw
    new_dir = tmp_path / 'new'
    save_run_config(str(new_dir), Config(model_type='diffusion'))
    assert checkpoint_target_space(str(new_dir)) == 'normalized'
    old_dir = tmp_path / 'old'
    os.makedirs(old_dir)
    payload = json.load(open(new_dir / RUN_CONFIG_NAME))
    del payload['diffusion_target_space']
    json.dump(payload, open(old_dir / RUN_CONFIG_NAME, 'w'))
    assert checkpoint_target_space(str(old_dir)) == 'raw'
    assert checkpoint_target_space(str(tmp_path / 'none')) == 'raw'

    # raw sampler == normalized sampler without the exit denormalize.
    # Warm-start low in the schedule (partial_frac) so x0_pred stays
    # small and the spaces' different clip bounds never bind — then the
    # chains are identical and outputs differ by exactly target_scales.
    model = _model(ds)
    state, batch = _state(model, ds)
    x = jnp.asarray(batch.inputs)
    init = 0.1 * jax.random.normal(jax.random.PRNGKey(3),
                                   (8, 4, model.target_channels))
    norm = make_sampler(model, DDPMSchedule(model.timesteps), num_steps=4,
                        partial_frac=0.1)
    raw = make_sampler(model, DDPMSchedule(model.timesteps), num_steps=4,
                       partial_frac=0.1, target_space='raw')
    o_n = norm(state.params, x, jax.random.PRNGKey(0), init)
    o_r = raw(state.params, x, jax.random.PRNGKey(0), init)
    scales = np.asarray(target_scales(ds.num_contact_bodies))
    packed_n = np.concatenate([np.asarray(o_n[k]) for k in (
        OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME,
        OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME,
        OutputDataKeys.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME,
        OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME)], axis=-1)
    packed_r = np.concatenate([np.asarray(o_r[k]) for k in (
        OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME,
        OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME,
        OutputDataKeys.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME,
        OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME)], axis=-1)
    np.testing.assert_allclose(packed_r * scales, packed_n,
                               rtol=1e-4, atol=1e-4)
    with pytest.raises(ValueError):
        make_sampler(model, target_space='physical')


@pytest.mark.slow
def test_train_step_reduces_eps_mse(ds):
    model = _model(ds)
    state, batch = _state(model, ds)
    step = make_diffusion_train_step(model, ds.lab_offsets,
                                     DDPMSchedule(model.timesteps), donate=False)
    x = jnp.asarray(batch.inputs)
    y = jnp.asarray(batch.labels)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(40):
        state, m = step(state, x, y, jax.random.fold_in(rng, i))
        losses.append(float(m['loss']))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_sampler_shapes_and_determinism(ds):
    model = _model(ds)
    state, batch = _state(model, ds)
    sampler = make_sampler(model, DDPMSchedule(model.timesteps), num_steps=8)
    out = sampler(state.params, jnp.asarray(batch.inputs), jax.random.PRNGKey(0))
    assert out[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME].shape == (8, 4, 6)
    assert out[OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME].shape == (8, 4, 12)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
    # eta=0 DDIM is deterministic given the same rng
    out2 = sampler(state.params, jnp.asarray(batch.inputs), jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(out[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME]),
        np.asarray(out2[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME]),
        atol=1e-6)


def test_partial_denoising_warm_start(ds):
    """Falcon-style partial denoising: seeding the chain with the TRUE
    labels at a small partial_frac reproduces the labels far more
    closely than a full chain from noise (the chain refines rather than
    re-generates), runs proportionally fewer steps, and enforces its
    init contract."""
    import pytest
    from inferbiomechanics_tpu.models.diffusion import (
        diffusion_targets_from_labels, diffusion_targets_from_outputs,
    )
    model = _model(ds)
    state, batch = _state(model, ds)
    x = jnp.asarray(batch.inputs)
    y = jnp.asarray(batch.labels)
    truth = diffusion_targets_from_labels(y, ds.lab_offsets,
                                          ds.num_contact_bodies)
    full = make_sampler(model, DDPMSchedule(model.timesteps), num_steps=8)
    part = make_sampler(model, DDPMSchedule(model.timesteps), num_steps=8,
                        partial_frac=0.05)
    key = jax.random.PRNGKey(0)
    out_full = full(state.params, x, key)
    out_part = part(state.params, x, key, truth)
    t_full = diffusion_targets_from_outputs(out_full)
    t_part = diffusion_targets_from_outputs(out_part)
    err_full = float(jnp.abs(t_full - truth).mean())
    err_part = float(jnp.abs(t_part - truth).mean())
    assert np.isfinite(err_part)
    assert err_part < 0.25 * err_full, (err_part, err_full)

    # the packing helper really is slice_output_heads' inverse ON THE
    # RAW side: outputs (raw units) -> normalized diffusion space
    from inferbiomechanics_tpu.models.common import slice_output_heads
    from inferbiomechanics_tpu.models.diffusion import target_scales
    raw = truth * target_scales(ds.num_contact_bodies)
    rt = diffusion_targets_from_outputs(
        slice_output_heads(raw, ds.num_contact_bodies, raw.shape[1]))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(truth),
                               rtol=1e-6, atol=1e-6)

    # contract: init is required, partial_frac validated, and a
    # last_frame-shaped init must not silently broadcast across frames
    with pytest.raises(ValueError, match='init'):
        part(state.params, x, key)
    with pytest.raises(ValueError, match='partial_frac'):
        make_sampler(model, DDPMSchedule(model.timesteps), partial_frac=1.5)
    with pytest.raises(ValueError, match='all-frames'):
        part(state.params, x, key, truth[:, :1])


def test_fused_denoiser_eps_matches_apply(ds):
    """fused_denoiser_eps consumes the vpu parameter tree and reproduces
    model.apply. Two checks: (a) the embedding/head wiring is EXACT —
    substitute flax EncoderBlocks for the fused layers in an f32 model
    and require 1e-5; (b) the full fused path (whose encoder always
    computes bf16 internally, like the TPU kernel) matches at
    bf16-residual tolerance."""
    from inferbiomechanics_tpu.models.diffusion import (
        fused_denoiser_eps, timestep_embedding)
    from inferbiomechanics_tpu.models.transformer import EncoderBlock
    from flax import linen as nn

    model = DiffusionDenoiser(
        num_dofs=ds.num_dofs, num_contact_bodies=ds.num_contact_bodies,
        history_len=20, stride=5, d_model=64, num_layers=2, num_heads=4,
        timesteps=64, compute_dtype=jnp.float32)
    state, batch = _state(model, ds)
    p = state.params
    cond = jnp.asarray(batch.inputs)
    x = jax.random.normal(jax.random.PRNGKey(3),
                          (8, 4, model.target_channels), jnp.float32)
    t = jnp.asarray(np.arange(8) * 7, jnp.int32)
    ref = model.apply({'params': p}, x, t, cond, train=False)

    # (a) fused embeddings/head around flax encoder blocks: exact
    def dense(name, v):
        return v @ p[name]['kernel'] + p[name]['bias']
    te = dense('t_mlp2', nn.gelu(dense('t_mlp1',
                                       timestep_embedding(t, model.d_model))))
    h = (dense('target_proj', x) + dense('cond_proj', cond)
         + te[:, None, :] + p['temporal_embedding'][None])
    for li in range(model.num_layers):
        h = EncoderBlock(64, 4, compute_dtype=jnp.float32,
                         attn_impl='vpu').apply(
            {'params': p[f'EncoderBlock_{li}']}, h)
    ln = p['LayerNorm_0']
    mean = h.mean(-1, keepdims=True)
    var = ((h - mean) ** 2).mean(-1, keepdims=True)
    hn = (h - mean) * jax.lax.rsqrt(var + 1e-6) * ln['scale'] + ln['bias']
    exact = dense('eps_head', hn)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(ref),
                               atol=1e-5)

    # (b) full fused path at bf16-internals tolerance
    got = fused_denoiser_eps(model, p, x, t, cond)
    err = float(jnp.max(jnp.abs(ref - got)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    assert err / scale < 5e-2, (err, scale)


def test_fused_sampler_end_to_end(ds):
    """make_sampler(fused_inference=True) runs the scan through
    fused_denoiser_eps and produces finite, deterministic outputs; a
    non-vpu denoiser is rejected loudly."""
    model = _model(ds)
    state, batch = _state(model, ds)
    sampler = make_sampler(model, DDPMSchedule(model.timesteps),
                           num_steps=6, fused_inference=True)
    out = sampler(state.params, jnp.asarray(batch.inputs),
                  jax.random.PRNGKey(0))
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
    out2 = sampler(state.params, jnp.asarray(batch.inputs),
                   jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(out[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME]),
        np.asarray(out2[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME]),
        atol=1e-6)
    flax_model = DiffusionDenoiser(
        num_dofs=ds.num_dofs, num_contact_bodies=ds.num_contact_bodies,
        history_len=20, stride=5, d_model=64, num_layers=2, num_heads=4,
        timesteps=64, attn_impl='flax')
    with pytest.raises(ValueError, match='vpu parameter tree'):
        make_sampler(flax_model, DDPMSchedule(64), num_steps=6,
                     fused_inference=True)


def test_diffusion_keep_best(ds, tmp_path):
    """--keep-best works for diffusion training too (review finding: the
    flags are global but only the regression loop implemented them)."""
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.train.diffusion_loop import train_diffusion

    cfg = Config(model_type='diffusion', window_size=20, stride=5,
                 output_data_format='all_frames', epochs=1, batch_size=8,
                 d_model=32, num_layers=1, num_heads=4,
                 diffusion_timesteps=8,
                 checkpoint_dir=str(tmp_path / 'dck'), keep_best=True,
                 device_data='off', opt_type='adam', learning_rate=1e-3,
                 log_every_batches=1000, checkpoint_every_batches=1000)
    train_diffusion(cfg, ds, ds, max_batches_per_epoch=2)
    assert (tmp_path / 'dck' / 'best.ckpt').exists()


def test_device_diffusion_epoch_runner(ds):
    from inferbiomechanics_tpu.train.device_data import (
        DeviceResidentData, make_device_diffusion_epoch_runner,
    )
    model = _model(ds)
    state, _ = _state(model, ds)
    data = DeviceResidentData(ds)
    run = make_device_diffusion_epoch_runner(model, data, DDPMSchedule(model.timesteps),
                                             batch_size=16)
    rng = jax.random.PRNGKey(0)
    state, m0 = run(state, rng)   # runner donates state: always chain
    for e in range(4):
        state, m = run(state, jax.random.fold_in(rng, e))
    assert np.isfinite(float(m['loss']))
    assert float(m['loss']) < float(m0['loss'])


def test_diffusion_timesteps_flag_reaches_model(tmp_path):
    """--diffusion-timesteps flows through build_model_for_dataset (sweep,
    serve, export all build the denoiser there; previously they silently
    used the 1000-step default)."""
    import numpy as np
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.train.loop import build_model_for_dataset
    write_synthetic_subject(str(tmp_path / 's.b3d'), num_trials=1,
                            trial_length=60, seed=0)
    ds = WindowDataset(str(tmp_path), window_size=20, stride=5,
                       skip_loading_skeletons=True)
    cfg = Config(model_type='diffusion', window_size=20, stride=5,
                 output_data_format='all_frames', diffusion_timesteps=8)
    model = build_model_for_dataset(cfg, ds)
    assert model.timesteps == 8


def _tiny_diffusion_data(tmp_path, trials=1, length=120):
    import os
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    for split in ('train', 'dev'):
        os.makedirs(tmp_path / split, exist_ok=True)
        write_synthetic_subject(str(tmp_path / split / 's.b3d'),
                                num_trials=trials, trial_length=length,
                                seed=4)
    return str(tmp_path)


def test_ema_update_math():
    """The jitted EMA update matches the closed form over several steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    d = 0.9
    upd = jax.jit(lambda e, p: jax.tree_util.tree_map(
        lambda a, b: a * d + b * (1.0 - d), e, p))
    ema = {'w': jnp.zeros((3,))}
    seq = [jnp.full((3,), float(i + 1)) for i in range(4)]
    for p in seq:
        ema = upd(ema, {'w': p})
    want = np.zeros(3)
    for p in seq:
        want = want * d + np.asarray(p) * (1 - d)
    np.testing.assert_allclose(np.asarray(ema['w']), want, rtol=1e-6)


@pytest.mark.slow
def test_diffusion_train_writes_and_uses_ema(tmp_path):
    """train --ema-decay writes ema_params into checkpoints; the EMA tree
    differs from the raw params (it lags them); analyze --use-ema swaps
    it in; serve --use-ema refuses checkpoints without one."""
    import os
    import subprocess
    import sys
    import numpy as np
    home = _tiny_diffusion_data(tmp_path)
    ck = tmp_path / 'ck'
    env = dict(os.environ, IB_PLATFORM='cpu')
    MAIN = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'main.py')
    base = ['--dataset-home', home, '--checkpoint-dir', str(ck),
            '--no-wandb', '--model-type', 'diffusion',
            '--output-data-format', 'all_frames', '--d-model', '16',
            '--num-layers', '1', '--num-heads', '2',
            '--diffusion-timesteps', '8', '--batch-size', '16', '--short']
    out = subprocess.run([sys.executable, MAIN, 'train', *base,
                          '--epochs', '1', '--ema-decay', '0.9'],
                         capture_output=True, text=True, env=env,
                         timeout=420)
    assert out.returncode == 0, out.stderr[-3000:]

    from inferbiomechanics_tpu.train.checkpoint import (
        load_ema_params, resolve_checkpoint_path,
    )
    from flax import serialization
    path = resolve_checkpoint_path(str(ck / 'diffusion'))
    raw = serialization.msgpack_restore(open(path, 'rb').read())
    assert 'ema_params' in raw
    flat_p = jax.tree_util.tree_leaves(raw['params'])
    flat_e = jax.tree_util.tree_leaves(raw['ema_params'])
    assert any(not np.array_equal(a, b) for a, b in zip(flat_p, flat_e))
    ema = load_ema_params(path, raw['params'])
    assert ema is not None

    out = subprocess.run([sys.executable, MAIN, 'analyze', *base,
                          '--use-ema'],
                         capture_output=True, text=True, env=env,
                         timeout=420)
    assert out.returncode == 0, out.stderr[-3000:]
    assert 'evaluating EMA parameters' in out.stdout

    # a checkpoint trained WITHOUT --ema-decay has no EMA to serve
    ck2 = tmp_path / 'ck2'
    out = subprocess.run([sys.executable, MAIN, 'train', *base[:3],
                          str(ck2), *base[4:], '--epochs', '1'],
                         capture_output=True, text=True, env=env,
                         timeout=420)
    assert out.returncode == 0, out.stderr[-3000:]
    out = subprocess.run([sys.executable, MAIN, 'serve', *base[:3],
                          str(ck2), *base[4:], '--use-ema', '--port', '0'],
                         capture_output=True, text=True, env=env,
                         timeout=300)
    assert out.returncode != 0
    assert 'ema_params' in (out.stderr + out.stdout)


@pytest.mark.slow
def test_diffusion_host_path_ema(tmp_path):
    """EMA also updates on the host loader path (max_batches_per_epoch
    forces it off the device epoch runner)."""
    import numpy as np
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.train.diffusion_loop import train_diffusion
    from inferbiomechanics_tpu.train.checkpoint import (
        load_ema_params, resolve_checkpoint_path,
    )
    from flax import serialization
    home = _tiny_diffusion_data(tmp_path)
    cfg = Config(model_type='diffusion', window_size=20, stride=5,
                 output_data_format='all_frames', d_model=16, num_layers=1,
                 num_heads=2, diffusion_timesteps=8, batch_size=16,
                 epochs=1, ema_decay=0.9, no_wandb=True,
                 checkpoint_dir=str(tmp_path / 'ckh'))
    tr = WindowDataset(home + '/train', window_size=20, stride=5,
                       skip_loading_skeletons=True)
    train_diffusion(cfg, tr, None, max_batches_per_epoch=2)
    path = resolve_checkpoint_path(cfg.checkpoint_dir)
    raw = serialization.msgpack_restore(open(path, 'rb').read())
    assert 'ema_params' in raw
    flat_p = jax.tree_util.tree_leaves(raw['params'])
    flat_e = jax.tree_util.tree_leaves(raw['ema_params'])
    assert any(not np.array_equal(a, b) for a, b in zip(flat_p, flat_e))


@pytest.mark.slow
def test_diffusion_sigterm_preemption(tmp_path):
    """SIGTERM during diffusion training checkpoints (with EMA) and
    exits 0; resume continues at the next epoch."""
    import os
    import signal
    import subprocess
    import sys
    import time as _time
    home = _tiny_diffusion_data(tmp_path, trials=2, length=1200)
    ck = tmp_path / 'ck'
    env = dict(os.environ, IB_PLATFORM='cpu')
    MAIN = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'main.py')
    args = [sys.executable, MAIN, 'train', '--dataset-home', home,
            '--checkpoint-dir', str(ck), '--no-wandb', '--model-type',
            'diffusion', '--output-data-format', 'all_frames',
            '--d-model', '16', '--num-layers', '1', '--num-heads', '2',
            '--diffusion-timesteps', '8', '--batch-size', '16',
            '--epochs', '500', '--ema-decay', '0.9',
            '--device-data', 'off']
    proc = subprocess.Popen(args, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    _time.sleep(45)
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=240)
    assert proc.returncode == 0, out[-3000:]
    assert 'preempted' in out, out[-2000:]
    from flax import serialization
    from inferbiomechanics_tpu.train.checkpoint import (
        list_checkpoints, resolve_checkpoint_path,
    )
    cks = list_checkpoints(str(ck / 'diffusion'))
    assert cks, out[-2000:]
    raw = serialization.msgpack_restore(
        open(resolve_checkpoint_path(str(ck / 'diffusion')), 'rb').read())
    assert 'ema_params' in raw
    epoch = cks[-1][0]
    out2 = subprocess.run([*args[:args.index('--epochs') + 1],
                           str(epoch + 2), *args[args.index('--epochs') + 2:]],
                          capture_output=True, text=True, env=env,
                          timeout=420)
    assert out2.returncode == 0, out2.stderr[-3000:]
    assert 'Training done' in out2.stdout


def test_diffusion_async_checkpoint_carries_ema(tmp_path):
    """--async-checkpoint on the diffusion loop: the background-written
    checkpoint carries ema_params (the EMA tree is snapshotted at save
    time, not when the write lands)."""
    import numpy as np
    from flax import serialization
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.train.checkpoint import resolve_checkpoint_path
    from inferbiomechanics_tpu.train.diffusion_loop import train_diffusion
    home = _tiny_diffusion_data(tmp_path)
    cfg = Config(model_type='diffusion', window_size=20, stride=5,
                 output_data_format='all_frames', d_model=16, num_layers=1,
                 num_heads=2, diffusion_timesteps=8, batch_size=16,
                 epochs=1, ema_decay=0.9, no_wandb=True,
                 async_checkpoint=True,
                 checkpoint_dir=str(tmp_path / 'cka'))
    tr = WindowDataset(home + '/train', window_size=20, stride=5,
                       skip_loading_skeletons=True)
    train_diffusion(cfg, tr, None, max_batches_per_epoch=2)
    path = resolve_checkpoint_path(cfg.checkpoint_dir)
    assert path is not None   # the async write drained before return
    raw = serialization.msgpack_restore(open(path, 'rb').read())
    assert 'ema_params' in raw
    flat_p = jax.tree_util.tree_leaves(raw['params'])
    assert all(np.isfinite(np.asarray(x)).all() for x in flat_p)


# ---------------------------------------------------------------------------
# Classifier-free guidance
# ---------------------------------------------------------------------------


def test_drop_conditioning_edges(ds):
    from inferbiomechanics_tpu.models.diffusion import drop_conditioning
    batch = ds.gather(np.arange(8))
    x = jnp.asarray(batch.inputs)
    rng = jax.random.PRNGKey(0)
    assert drop_conditioning(x, rng, 0.0) is x         # p=0: no-op, no key use
    z = drop_conditioning(x, rng, 1.0)
    np.testing.assert_array_equal(np.asarray(z), 0.0)  # p=1: all null
    # p=0.5: each sample is either untouched or fully zeroed
    h = np.asarray(drop_conditioning(x, rng, 0.5))
    xn = np.asarray(x)
    for b in range(8):
        assert np.array_equal(h[b], xn[b]) or (h[b] == 0).all()


@pytest.mark.slow
def test_cond_dropout_step_trains_and_differs(ds):
    model = _model(ds)
    state, batch = _state(model, ds)
    x, y = jnp.asarray(batch.inputs), jnp.asarray(batch.labels)

    def run(p):
        st = _state(model, ds)[0]
        step = make_diffusion_train_step(model, ds.lab_offsets,
                                         donate=False, cond_dropout=p)
        st, metrics = step(st, x, y, jax.random.PRNGKey(3))
        return float(metrics['loss'])

    l0, lp = run(0.0), run(0.5)
    assert np.isfinite(lp)
    assert l0 != lp     # some conditioning was dropped under the same seed


def test_guidance_scale_one_matches_plain_sampler(ds):
    model = _model(ds, timesteps=16)
    state, batch = _state(model, ds)
    x = jnp.asarray(batch.inputs)
    plain = make_sampler(model, num_steps=4)
    g1 = make_sampler(model, num_steps=4, guidance_scale=1.0)
    o_plain = plain(state.params, x, jax.random.PRNGKey(5))
    o_g1 = g1(state.params, x, jax.random.PRNGKey(5))
    for k in o_plain:
        np.testing.assert_array_equal(np.asarray(o_plain[k]),
                                      np.asarray(o_g1[k]))


def test_guidance_scale_changes_samples(ds):
    model = _model(ds, timesteps=16)
    state, batch = _state(model, ds)
    x = jnp.asarray(batch.inputs)
    plain = make_sampler(model, num_steps=4)
    g2 = make_sampler(model, num_steps=4, guidance_scale=2.0)
    o_plain = plain(state.params, x, jax.random.PRNGKey(5))
    o_g2 = g2(state.params, x, jax.random.PRNGKey(5))
    k = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
    assert np.all(np.isfinite(np.asarray(o_g2[k])))
    assert not np.array_equal(np.asarray(o_plain[k]), np.asarray(o_g2[k]))


def test_diffusion_loop_with_cfg_config(ds, tmp_path):
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.train.diffusion_loop import train_diffusion

    cfg = Config(window_size=20, stride=5, output_data_format='all_frames',
                 model_type='diffusion', d_model=32, num_layers=1,
                 num_heads=2, diffusion_timesteps=16, epochs=1,
                 batch_size=8, opt_type='adam', learning_rate=1e-3,
                 checkpoint_dir=str(tmp_path / 'ckpt'),
                 cond_dropout=0.2, no_wandb=True)
    res = train_diffusion(cfg, ds, dev_ds=None)
    assert res.epochs_run == 1
    assert np.isfinite(res.final_train_metrics['eps_mse'])
