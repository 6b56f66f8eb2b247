"""Data layer tests: B3D-TPU round-trip, window enumeration, featurization."""

import numpy as np
import pytest

from inferbiomechanics_tpu.data import InputDataKeys, OutputDataKeys
from inferbiomechanics_tpu.data.b3d import (
    MissingGRFReason, ProcessingPassType, SubjectOnDisk,
    layout_offsets, pass_channel_layout,
)
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import (
    standard_skeleton, write_synthetic_subject,
)


@pytest.fixture(scope='module')
def subject_file(tmp_path_factory):
    d = tmp_path_factory.mktemp('b3d')
    path = str(d / 'subj_0.b3d')
    write_synthetic_subject(path, num_trials=2, trial_length=120,
                            missing_frac=0.05, seed=0)
    return path


@pytest.fixture(scope='module')
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('data')
    for i in range(2):
        write_synthetic_subject(str(d / f'subj_{i}.b3d'), num_trials=2,
                                trial_length=120, missing_frac=0.05, seed=i)
    # a file that must be skipped by discovery
    write_synthetic_subject(str(d / 'vanderXYZ.b3d'), num_trials=1,
                            trial_length=50, seed=9)
    return str(d)


def test_subject_header_roundtrip(subject_file):
    s = SubjectOnDisk(subject_file)
    assert s.getNumDofs() == 23
    assert s.getNumTrials() == 2
    assert s.getGroundForceBodies() == ['calcn_r', 'calcn_l']
    assert s.getMassKg() == 70.0
    assert s.getHeightM() == 1.75
    assert s.getAgeYears() == 30
    assert s.getNumProcessingPasses() == 2
    assert s.getProcessingPassType(0) == ProcessingPassType.KINEMATICS
    assert s.getProcessingPassType(1) == ProcessingPassType.DYNAMICS
    assert s.getTrialLength(0) == 120
    assert s.getTrialName(1) == 'trial_1'
    assert len(s.getMissingGRF(0)) == 120
    assert s.getRootHistoryLen() == 10


def test_trial_pass_matrix_shape_and_mmap(subject_file):
    s = SubjectOnDisk(subject_file)
    layout = pass_channel_layout(23, 2, 10)
    C = sum(w for _, w in layout)
    m0 = s.trial_pass_matrix(0, 0)
    m1 = s.trial_pass_matrix(0, 1)
    assert m0.shape == (120, C)
    assert m0.dtype == np.float32
    # kinematics and dynamics passes differ (noise on kinematics)
    assert not np.array_equal(m0, m1)
    # memory-mapped: read-only view
    assert not m0.flags.writeable


def test_read_frames_compat(subject_file):
    s = SubjectOnDisk(subject_file)
    frames = s.readFrames(0, 10, 5, stride=2)
    assert len(frames) == 5
    f = frames[0]
    assert len(f.processingPasses) == 2
    assert f.processingPasses[0].pos.shape == (23,)
    assert f.processingPasses[0].jointCentersInRootFrame.shape == (36,)
    assert f.processingPasses[1].type == ProcessingPassType.DYNAMICS
    # row parity with the fast path
    m = s.trial_pass_matrix(0, 0)
    offs = s.field_offsets
    o, w = offs['vel']
    np.testing.assert_array_equal(f.processingPasses[0].vel, m[10, o:o + w])


def test_skeleton_spec(subject_file):
    s = SubjectOnDisk(subject_file)
    spec = s.readSkel(1)
    assert spec.num_dofs == 23
    assert len(spec.joints) == 12
    assert spec.joints[0].type == 'free'
    assert len(spec.bodies) == 12
    assert abs(sum(b.mass for b in spec.bodies) - 70.0) > 0  # masses present


def test_window_enumeration_masks_missing_frames(data_dir):
    ds = WindowDataset(data_dir, window_size=20, stride=5)
    assert len(ds) > 0
    # every window must contain no missing-GRF frame at strided positions
    for w in range(0, len(ds), max(1, len(ds) // 37)):
        s_idx = int(ds.win_subject[w]); t_idx = int(ds.win_trial[w])
        start = int(ds.win_start[w])
        missing = ds.subjects[s_idx].getMissingGRF(t_idx)
        for k in range(start, start + 20, 5):
            assert missing[k] == MissingGRFReason.notMissingGRF
        assert start + 20 < ds.subjects[s_idx].getTrialLength(t_idx)


def test_vander_files_skipped(data_dir):
    ds = WindowDataset(data_dir, window_size=20, stride=5,
                       skip_loading_skeletons=True)
    assert len(ds.subject_paths) == 2
    assert all('vander' not in p for p in ds.subject_paths)


def test_featurization_semantics(data_dir):
    ds = WindowDataset(data_dir, window_size=20, stride=5)
    inputs, labels, s_idx, t_idx = ds[0]
    W = 20 // 5
    assert inputs[InputDataKeys.POS].shape == (W, 23)
    assert inputs[InputDataKeys.JOINT_CENTERS_IN_ROOT_FRAME].shape == (W, 36)
    assert inputs[InputDataKeys.ROOT_POS_HISTORY_IN_ROOT_FRAME].shape == (W, 30)
    # default output_data_format='last_frame': single output frame
    assert labels[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME].shape == (1, 6)
    assert labels[OutputDataKeys.TAU].shape == (1, 23)

    # verify against the raw file: inputs come from pass 0, forces from
    # pass 0 divided by mass, tau from last pass NOT divided
    subject = ds.subjects[s_idx]
    start = int(ds.win_start[0])
    kin = subject.trial_pass_matrix(t_idx, 0)
    dyn = subject.trial_pass_matrix(t_idx, 1)
    offs = subject.field_offsets
    o, w = offs['pos']
    np.testing.assert_allclose(inputs[InputDataKeys.POS][0], kin[start, o:o + w], rtol=1e-6)
    o, w = offs['groundContactForceInRootFrame']
    last_row = start + 15
    np.testing.assert_allclose(
        labels[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME][0],
        kin[last_row, o:o + w] / subject.getMassKg(), rtol=1e-5)
    o, w = offs['tau']
    np.testing.assert_allclose(labels[OutputDataKeys.TAU][0], dyn[last_row, o:o + w], rtol=1e-6)
    # CoP is NOT mass normalized
    o, w = offs['groundContactCenterOfPressureInRootFrame']
    np.testing.assert_allclose(
        labels[OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME][0],
        kin[last_row, o:o + w], rtol=1e-5)


def test_all_frames_output_format(data_dir):
    ds = WindowDataset(data_dir, window_size=20, stride=5,
                       output_data_format='all_frames')
    _inputs, labels, _s, _t = ds[0]
    assert labels[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME].shape == (4, 6)


def test_batch_gather_matches_getitem(data_dir):
    ds = WindowDataset(data_dir, window_size=20, stride=5)
    idx = np.asarray([0, 3, 7, len(ds) - 1])
    batch = ds.gather(idx)
    assert batch.inputs.shape == (4, 4, ds.num_input_channels)
    assert batch.labels.shape == (4, 1, ds.num_label_channels)
    for b, i in enumerate(idx):
        inputs, labels, s_idx, t_idx = ds[int(i)]
        np.testing.assert_array_equal(
            batch.inputs[b][..., ds.in_offsets[InputDataKeys.VEL][0]:
                            ds.in_offsets[InputDataKeys.VEL][0] + 23],
            inputs[InputDataKeys.VEL])
        assert batch.subject_indices[b] == s_idx
        assert batch.trial_indices[b] == t_idx


def test_epoch_batches_shard_and_drop_last(data_dir):
    ds = WindowDataset(data_dir, window_size=20, stride=5)
    bs = 16
    all_batches = list(ds.batches(bs, seed=1))
    assert all(b.inputs.shape[0] == bs for b in all_batches)
    # two shards partition the (shuffled) index space
    sh0 = list(ds.batches(bs, seed=1, shard_index=0, num_shards=2))
    sh1 = list(ds.batches(bs, seed=1, shard_index=1, num_shards=2))
    assert abs(len(sh0) - len(sh1)) <= 1


def test_featurization_golden_checksum(tmp_path):
    """Lock featurization semantics: any change to window enumeration,
    column ordering, mass normalization, or contact reindexing changes
    these digests and must be deliberate."""
    import hashlib
    path = str(tmp_path / 'golden.b3d')
    write_synthetic_subject(path, num_trials=1, trial_length=100, seed=42,
                            missing_frac=0.1)
    ds = WindowDataset(path, window_size=20, stride=5, skip_loading_skeletons=True)
    h_feat = hashlib.sha256(np.ascontiguousarray(ds.features_all).tobytes()).hexdigest()[:16]
    h_lab = hashlib.sha256(np.ascontiguousarray(ds.labels_all).tobytes()).hexdigest()[:16]
    h_win = hashlib.sha256(np.ascontiguousarray(ds.win_start).tobytes()).hexdigest()[:16]
    assert (h_feat, h_lab, h_win) == (
        '455c3992ef12e523', '782cbfbc3c5a56fd', '92e394613f70467f'), \
        (h_feat, h_lab, h_win)


def test_on_demand_featurization_matches_materialized(data_dir):
    ds_m = WindowDataset(data_dir, window_size=20, stride=5,
                         skip_loading_skeletons=True)
    ds_o = WindowDataset(data_dir, window_size=20, stride=5,
                         skip_loading_skeletons=True,
                         materialize_features=False)
    assert ds_o.features_all is None
    assert len(ds_o) == len(ds_m)
    idx = np.asarray([0, 7, len(ds_m) // 2, len(ds_m) - 1])
    b_m = ds_m.gather(idx)
    b_o = ds_o.gather(idx)
    np.testing.assert_array_equal(b_o.inputs, b_m.inputs)
    np.testing.assert_array_equal(b_o.labels, b_m.labels)


def test_on_demand_mode_trains_via_host_loader(data_dir):
    """device_data='auto' gracefully falls back when features are on disk."""
    import jax
    import jax.numpy as jnp
    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.train.loop import train
    ds = WindowDataset(data_dir, window_size=20, stride=5,
                       skip_loading_skeletons=True, materialize_features=False)
    cfg = Config(window_size=20, stride=5, model_type='feedforward',
                 checkpoint_dir='/tmp/ondemand_ckpt_test', epochs=1,
                 batch_size=16, opt_type='adam')
    import shutil
    shutil.rmtree('/tmp/ondemand_ckpt_test', ignore_errors=True)
    result = train(cfg, ds, None, max_batches_per_epoch=3)
    assert result.epochs_run == 1


def test_single_pass_subject_roundtrip(tmp_path):
    """Kinematics-only subjects (the reference's TrialRaw scenario,
    make_plots.py:1623-1733) flow through dataset + stats."""
    from inferbiomechanics_tpu.data.b3d import (
        ProcessingPassType, TrialData, write_subject,
    )
    from inferbiomechanics_tpu.data.synthetic import synthetic_trial
    t = synthetic_trial('raw_trial', 80, rng=np.random.default_rng(0))
    t_single = TrialData(name=t.name, timestep=t.timestep,
                         passes=[t.passes[0]],
                         pass_types=[int(ProcessingPassType.KINEMATICS)],
                         missing_grf_reasons=t.missing_grf_reasons)
    path = str(tmp_path / 'raw.b3d')
    write_subject(path, num_dofs=23, ground_force_bodies=['calcn_r', 'calcn_l'],
                  root_history_len=10, trials=[t_single])
    s = SubjectOnDisk(path)
    assert s.getNumProcessingPasses() == 1
    ds = WindowDataset(path, window_size=20, stride=5, skip_loading_skeletons=True)
    assert len(ds) > 0
    inputs, labels, _s, _t = ds[0]
    # with one pass, labels fall back to the same (kinematics) pass
    assert np.isfinite(labels[OutputDataKeys.TAU]).all()
    # stats engine: processed mode skips dynamics-less trials like the
    # reference's has_dynamics filter (make_plots.py:990-995); the TrialRaw
    # variant (--raw, ref :1623-1733) ingests kinematics-only data
    from inferbiomechanics_tpu.cli.make_plots_cmd import collect_stats
    assert collect_stats([path])['num_trials'] == 0
    stats = collect_stats([path], raw=True)
    assert stats['num_trials'] == 1


def test_processing_pass_type_heterogeneous_trials(tmp_path):
    """Pass type at index i comes from whichever trials reach i.

    Round-1 bug: getProcessingPassType read trials[0] only, wrong when
    trials carry different-length pass lists (the format allows it).
    """
    from inferbiomechanics_tpu.data import b3d as B

    path = str(tmp_path / 'het.b3d')
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    write_synthetic_subject(path, num_trials=2, trial_length=60, seed=0)
    sub = B.SubjectOnDisk(path)
    # truncate trial 0's pass list in the parsed header to simulate a
    # kinematics-only first trial
    sub.header['trials'][0]['pass_types'] = sub.header['trials'][0]['pass_types'][:1]
    assert sub.getProcessingPassType(0) == B.ProcessingPassType.KINEMATICS
    # index 1 only exists on trial 1 — must come from there, not trials[0]
    assert sub.getProcessingPassType(1) == B.ProcessingPassType.DYNAMICS
    import pytest
    with pytest.raises(IndexError):
        sub.getProcessingPassType(2)
    # disagreement at a shared index is an error, not a silent pick
    sub.header['trials'][0]['pass_types'] = [int(B.ProcessingPassType.DYNAMICS)]
    with pytest.raises(ValueError):
        sub.getProcessingPassType(0)


def test_pickle_data_roundtrip_multiblock(tmp_path, monkeypatch):
    """pickle-data blocks: matrices stored once, metadata validated on load.

    Capability parity: reference src/cli/pickle_data.py:52-79 +
    src/data/PickledDataset.py (block store → same batch interface).
    """
    import argparse
    from inferbiomechanics_tpu.cli import pickle_data_cmd as P
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.pickled import PickledDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject

    src = tmp_path / 'train'
    src.mkdir()
    write_synthetic_subject(str(src / 's.b3d'), num_trials=2,
                            trial_length=80, seed=0)
    monkeypatch.setattr(P, 'BLOCK', 8)   # force several blocks
    cmd = P.PickleDataCommand()
    args = argparse.Namespace(command='pickle-data',
                              dataset_home=str(tmp_path),
                              history_len=20, stride=5, geometry_folder='')
    assert cmd.run(args)

    import glob
    import numpy as np
    blocks = sorted(glob.glob(str(tmp_path / 'train_pickled' / '*.npz')))
    assert len(blocks) > 1
    # the packed matrices live in block 0 ONLY
    assert 'features_all' in np.load(blocks[0]).files
    for b in blocks[1:]:
        assert 'features_all' not in np.load(b).files

    ds = WindowDataset(str(src), window_size=20, stride=5)
    pk = PickledDataset(str(tmp_path / 'train_pickled'))
    assert len(pk) == len(ds)
    idx = np.arange(len(ds))
    a, b = ds.gather(idx), pk.gather(idx)
    np.testing.assert_array_equal(a.inputs, b.inputs)
    np.testing.assert_array_equal(a.labels, b.labels)
    # layout metadata mismatch must raise, not silently mis-slice
    import pytest
    with pytest.raises(ValueError):
        PickledDataset(str(tmp_path / 'train_pickled'), num_dofs=17)


def test_b3dt_version_gate_and_reconvert(tmp_path, monkeypatch):
    """v1 B3D-TPU files (pre-MissingGRFReason-revision, ADVICE r2) are
    rejected with a reconvert hint, and ensure_tpu_format treats a
    stale-version cache as missing and reconverts it."""
    import struct

    import pytest

    from inferbiomechanics_tpu.data import b3d
    from inferbiomechanics_tpu.data.b3d import SubjectOnDisk, is_current_b3dt
    from inferbiomechanics_tpu.data.b3d_legacy import ensure_tpu_format
    from inferbiomechanics_tpu.data.synthetic import (
        write_synthetic_legacy_subject,
    )

    src = str(tmp_path / 's.b3d')
    write_synthetic_legacy_subject(src, num_trials=1, trial_length=30)
    out = ensure_tpu_format(src)
    assert is_current_b3dt(out)

    # rewrite the version word to 1: open fails with the reconvert hint
    with open(out, 'r+b') as f:
        f.seek(4)
        f.write(struct.pack('<I', 1))
    assert not is_current_b3dt(out)
    with pytest.raises(ValueError, match='reconvert'):
        SubjectOnDisk(out)

    # ensure_tpu_format reconverts the stale cache (mtime is NEWER than
    # the source, so only the version check can trigger this)
    out2 = ensure_tpu_format(src)
    assert out2 == out
    assert is_current_b3dt(out)
    assert SubjectOnDisk(out).getNumTrials() == 1
