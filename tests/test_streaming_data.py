"""Streaming (>HBM) data path tests."""

import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.loss import LossConfig
from inferbiomechanics_tpu.models import get_model
from inferbiomechanics_tpu.train import create_train_state, make_optimizer
from inferbiomechanics_tpu.train.streaming_data import StreamingPlan, make_streaming_epoch


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp('stream')
    for i in range(2):
        write_synthetic_subject(str(d / f's{i}.b3d'), num_trials=3,
                                trial_length=150, seed=i)
    return WindowDataset(str(d), window_size=20, stride=5,
                         skip_loading_skeletons=True)


def test_plan_packs_all_trials_under_budget(ds):
    bytes_per_row = (ds.features_all.shape[1] + ds.labels_all.shape[1]) * 4
    budget = 320 * bytes_per_row   # ~2 trials per segment
    plan = StreamingPlan(ds, budget)
    assert len(plan.segments) >= 2
    total_windows = sum(s.win_base.shape[0] for s in plan.segments)
    assert total_windows == len(ds)
    for si, s in enumerate(plan.segments):
        feats, labs = plan.segment_arrays(si)
        assert feats.shape[0] == plan.rows_pad == labs.shape[0]
        # every window's strided rows are inside the segment
        hi = s.win_base.max() + 20
        assert hi <= plan.rows_pad


def test_plan_rejects_oversize_trial(ds):
    bytes_per_row = (ds.features_all.shape[1] + ds.labels_all.shape[1]) * 4
    with pytest.raises(ValueError):
        StreamingPlan(ds, 10 * bytes_per_row)


def test_streaming_epoch_trains_and_matches_semantics(ds):
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len)
    sample = ds.gather(np.arange(16))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(sample.inputs),
                               make_optimizer('adam', 1e-3))
    bytes_per_row = (ds.features_all.shape[1] + ds.labels_all.shape[1]) * 4
    plan = StreamingPlan(ds, 320 * bytes_per_row)
    run = make_streaming_epoch(model, ds, plan, LossConfig(), batch_size=16,
                               feature_dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    state, m0 = run(state, rng)
    assert np.isfinite(float(m0['loss']))
    for e in range(4):
        state, m = run(state, jax.random.fold_in(rng, e))
    assert float(m['loss']) < float(m0['loss'])


def test_streaming_epoch_non_divisible_stride(tmp_path):
    """Stride not dividing window_size: the segment runner must gather
    num_model_frames = window // stride frames (regression: arange(0,W,s)
    took an extra frame and broke the model's expected window shape)."""
    write_synthetic_subject(str(tmp_path / 's.b3d'), num_trials=2,
                            trial_length=150, seed=7)
    nd = WindowDataset(str(tmp_path), window_size=22, stride=5,
                       skip_loading_skeletons=True)
    assert nd.num_model_frames == 4
    model = get_model('feedforward', num_dofs=nd.num_dofs,
                      num_contact_bodies=nd.num_contact_bodies,
                      history_len=22, stride=5,
                      root_history_len=nd.root_history_len)
    sample = nd.gather(np.arange(8))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(sample.inputs),
                               make_optimizer('adam', 1e-3))
    bytes_per_row = (nd.features_all.shape[1] + nd.labels_all.shape[1]) * 4
    run = make_streaming_epoch(model, nd, StreamingPlan(nd, 200 * bytes_per_row),
                               LossConfig(), batch_size=8,
                               feature_dtype=jnp.float32)
    state, m = run(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(m['loss']))


def test_streaming_gather_correctness(ds):
    """A window gathered inside a segment == the host gather of that window."""
    bytes_per_row = (ds.features_all.shape[1] + ds.labels_all.shape[1]) * 4
    plan = StreamingPlan(ds, 320 * bytes_per_row)
    seg = plan.segments[0]
    feats0, _labs0 = plan.segment_arrays(0)
    base0 = int(seg.win_base[0])
    rows = base0 + 5 * np.arange(4)
    from_seg = feats0[rows]
    # find the matching global window: first trial of the segment, start 0
    # -> use the dataset's own gather on the same (subject,trial,start)
    # reconstruct: segment 0 starts at trial 0 row 0
    global_rows = int(ds.trial_row_offset[0]) + (int(seg.win_base[0])) + 5 * np.arange(4)
    np.testing.assert_array_equal(from_seg, ds.features_all[global_rows])


def test_streaming_lazy_dataset(tmp_path):
    """materialize_features=False: planning is metadata-only and each
    segment featurizes its trials on demand — segment arrays are
    byte-identical to the materialized dataset's, and only the visited
    segment's trials are touched (true out-of-core behavior)."""
    for i in range(2):
        write_synthetic_subject(str(tmp_path / f's{i}.b3d'), num_trials=3,
                                trial_length=150, seed=i)
    mat = WindowDataset(str(tmp_path), window_size=20, stride=5,
                        skip_loading_skeletons=True)
    lazy = WindowDataset(str(tmp_path), window_size=20, stride=5,
                         skip_loading_skeletons=True,
                         materialize_features=False)
    assert lazy.features_all is None
    calls = []
    orig = lazy.featurize_trial_features
    lazy.featurize_trial_features = lambda ti: (calls.append(ti),
                                                orig(ti))[1]
    bytes_per_row = (lazy.num_input_channels + lazy.num_label_channels) * 4
    plan_m = StreamingPlan(mat, 320 * bytes_per_row)
    plan_l = StreamingPlan(lazy, 320 * bytes_per_row)
    assert not calls                       # planning touches no features
    assert len(plan_l.segments) == len(plan_m.segments)
    fm, lm = plan_m.segment_arrays(0)
    fl, ll = plan_l.segment_arrays(0)
    np.testing.assert_array_equal(fl, fm)
    np.testing.assert_array_equal(ll, lm)
    assert sorted(calls) == sorted(plan_l.segments[0].trials)

    # end-to-end: the lazy streaming epoch trains
    model = get_model('feedforward', num_dofs=lazy.num_dofs,
                      num_contact_bodies=lazy.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=lazy.root_history_len)
    sample = lazy.gather(np.arange(16))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(sample.inputs),
                               make_optimizer('adam', 1e-3))
    run = make_streaming_epoch(model, lazy, plan_l, LossConfig(),
                               batch_size=16, feature_dtype=jnp.float32)
    state, m = run(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(m['loss']))


def test_streaming_diffusion_epoch(tmp_path):
    """Diffusion trains out-of-core: --device-data stream on the
    diffusion loop streams HBM-budget segments through the eps-MSE
    scan; with --ema-decay the EMA tree rides inside the segment scan
    and lands in the checkpoint."""
    import numpy as np
    from flax import serialization
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.train.checkpoint import resolve_checkpoint_path
    from inferbiomechanics_tpu.train.diffusion_loop import train_diffusion

    root = tmp_path / 'data'
    os.makedirs(root / 'train')
    write_synthetic_subject(str(root / 'train' / 's.b3d'), num_trials=2,
                            trial_length=120, seed=0)
    ds = WindowDataset(str(root / 'train'), window_size=20, stride=5,
                       output_data_format='all_frames',
                       skip_loading_skeletons=True)
    bytes_per_row = (ds.num_input_channels + ds.num_label_channels) * 4
    from inferbiomechanics_tpu.train.streaming_data import StreamingPlan
    assert len(StreamingPlan(ds, bytes_per_row * 130).segments) == 2
    cfg = Config(model_type='diffusion', window_size=20, stride=5,
                 output_data_format='all_frames', d_model=16, num_layers=1,
                 num_heads=2, diffusion_timesteps=8, batch_size=16,
                 epochs=1, no_wandb=True, ema_decay=0.9,
                 device_data='stream',
                 device_data_max_bytes=bytes_per_row * 130,
                 checkpoint_dir=str(tmp_path / 'ck'))
    result = train_diffusion(cfg, ds, None)
    assert result.epochs_run == 1
    assert np.isfinite(result.final_train_metrics['eps_mse'])
    raw = serialization.msgpack_restore(
        open(resolve_checkpoint_path(cfg.checkpoint_dir), 'rb').read())
    assert 'ema_params' in raw
    flat_p = jax.tree_util.tree_leaves(raw['params'])
    flat_e = jax.tree_util.tree_leaves(raw['ema_params'])
    assert any(not np.array_equal(a, b) for a, b in zip(flat_p, flat_e))


def test_streaming_epoch_with_augmenter(ds):
    """Augmentation inside the streamed segment runner: bf16 segment
    features stay bf16 through the mirror (dtype-preserving signs)."""
    from inferbiomechanics_tpu.loss import LossConfig
    from inferbiomechanics_tpu.models import get_model
    from inferbiomechanics_tpu.train.augment import (Augmenter,
                                                     spec_from_dataset)
    from inferbiomechanics_tpu.train.optimizers import make_optimizer
    from inferbiomechanics_tpu.train.state import create_train_state
    from inferbiomechanics_tpu.train.streaming_data import (
        StreamingPlan, make_streaming_epoch,
    )
    plan = StreamingPlan(ds, hbm_budget_bytes=400_000)
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=ds.window_size, stride=ds.stride,
                      root_history_len=ds.root_history_len,
                      output_data_format=ds.output_data_format)
    sample = ds.gather(np.arange(8))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(sample.inputs),
                               make_optimizer('adam', 1e-3))
    aug = Augmenter(mirror=spec_from_dataset(ds), noise_std=0.02)
    run = make_streaming_epoch(model, ds, plan, LossConfig(), batch_size=8,
                               augment=aug)
    state, metrics = run(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(np.asarray(metrics['loss'])))
