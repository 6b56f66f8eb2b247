"""Unit tests for the make-plots / review-file analytic helpers."""

import os

import numpy as np

from inferbiomechanics_tpu.cli.make_plots_cmd import (
    classify_motion, estimate_mass, stance_speed, _butter_lowpass,
)
from inferbiomechanics_tpu.cli.review_file_cmd import find_suspicious_segments
import pytest


def test_classify_motion_keywords():
    assert classify_motion('Treadmill_2ms') == 'walking'
    assert classify_motion('overground_walking_01') == 'walking'
    assert classify_motion('Sprint_Max') == 'running'
    assert classify_motion('stair_ascent') == 'stairs'
    assert classify_motion('DropJump3') == 'jump'
    assert classify_motion('STS_chair') == 'squat'
    assert classify_motion('random_task') == 'other'


def test_estimate_mass_recovers_true_mass():
    rng = np.random.default_rng(0)
    T, mass = 500, 63.0
    g = np.array([0.0, -9.81, 0.0])
    com_acc = rng.normal(0, 2.0, (T, 3))
    total_grf = mass * (com_acc - g)
    valid = np.ones(T, bool)
    est = estimate_mass(total_grf, com_acc, valid)
    assert np.isclose(est, mass, rtol=1e-6)


def test_estimate_mass_no_valid_frames():
    assert np.isnan(estimate_mass(np.zeros((5, 3)), np.zeros((5, 3)),
                                  np.zeros(5, bool)))


def test_stance_speed_uses_stance_frames_only():
    T = 100
    root_vel = np.zeros((T, 3))
    root_vel[:50, 0] = 2.0    # moving during stance
    root_vel[50:, 0] = 99.0   # flight frames must be ignored
    contact = np.zeros((T, 2), bool)
    contact[:50, 0] = True
    valid = np.ones(T, bool)
    assert np.isclose(stance_speed(root_vel, contact, valid), 2.0)


def test_butterworth_passes_dc_and_attenuates_high_freq():
    fs = 100.0
    t = np.arange(1000) / fs
    low = np.sin(2 * np.pi * 1.0 * t)
    high = np.sin(2 * np.pi * 40.0 * t)
    sig = (low + high)[:, None]
    filt = _butter_lowpass(sig, cutoff_hz=5.0, fs=fs)[:, 0]
    # low component survives, high is crushed
    assert np.corrcoef(filt[100:-100], low[100:-100])[0, 1] > 0.99
    assert np.std(filt - low) < 0.1 * np.std(high)


def test_find_suspicious_segments_merging():
    loss = np.ones(20)
    loss[[3, 4, 5, 10, 15, 16]] = 100.0
    segs = find_suspicious_segments(loss, threshold_ratio=3.0)
    assert segs == [(3, 6), (10, 11), (15, 17)]
    assert find_suspicious_segments(np.ones(5)) == []
    assert find_suspicious_segments(np.zeros(0)) == []


def test_demographic_overrides():
    from inferbiomechanics_tpu.cli.make_plots_cmd import (
        apply_demographic_overrides,
    )
    # Fregly sexes come from the file name (ref make_plots.py:1011-1017)
    assert apply_demographic_overrides('/d/Fregly_3GC/s.b3d', 's', 40,
                                       'unknown')[1] == 'female'
    assert apply_demographic_overrides('/d/Fregly_4GC/s.b3d', 's', 40,
                                       'unknown')[1] == 'male'
    # Carter2023 from the demographics CSV (ref :1007-1009,1019-1020)
    csv = {'P01': {'Age (years)': '31', 'Sex': 'female'}}
    age, sex = apply_demographic_overrides('/d/Carter2023/x.b3d',
                                           'P01_split3', 7, 'unknown', csv)
    assert (age, sex) == (31, 'female')
    # other datasets: untouched
    assert apply_demographic_overrides('/d/Other/s.b3d', 's', 25,
                                       'male') == (25, 'male')


@pytest.mark.slow
def test_make_plots_full_scatter_set(tmp_path):
    """The complete ScatterPlots figure set renders (ref :560-616,907-985):
    13 per-DOF matrices + joint centers + 11 singles."""
    from inferbiomechanics_tpu.cli.make_plots_cmd import (
        PER_DOF_MATRICES, SINGLE_PLOTS, collect_stats, render_plots,
    )
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    p = str(tmp_path / 's.b3d')
    write_synthetic_subject(p, num_trials=1, trial_length=120, seed=0)
    stats = collect_stats([p])
    assert len(stats['joint_pos']) > 0
    assert len(stats['scatter_class']) == len(stats['joint_pos'])
    written = render_plots(stats, str(tmp_path / 'out'))
    names = {os.path.basename(w) for w in written}
    for name, *_ in PER_DOF_MATRICES:
        assert f'scatter_{name}.png' in names, name
    for name, *_ in SINGLE_PLOTS:
        assert f'scatter_{name}.png' in names, name
    assert 'scatter_jointcenters_vs_totgrf.png' in names
    # by-sex demographics figures (ref make_plots.py:1157-1198) and the
    # per-motion-class error-vs-frequency curve (ref :1253-1260)
    for fig in ('age_bysex_histo.png', 'bmi_bysex_histo.png',
                'age_bysex_boxplot.png', 'bmi_bysex_boxplot.png',
                'err_vs_freq_by_motion.png'):
        assert fig in names, fig
    assert stats['freq_rmse_by_motion']   # keyed by motion class


def test_make_plots_split_dataset_dedup(tmp_path):
    """Split-dataset subjects are counted once (ref :1040-1052)."""
    from inferbiomechanics_tpu.cli.make_plots_cmd import collect_stats
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    d = tmp_path / 'Carter2023'
    d.mkdir()
    for split in range(3):
        write_synthetic_subject(str(d / f'P01_{split}.b3d'), num_trials=1,
                                trial_length=60, seed=split)
    write_synthetic_subject(str(d / 'P02_0.b3d'), num_trials=1,
                            trial_length=60, seed=9)
    stats = collect_stats([str(d / f) for f in sorted(os.listdir(d))])
    assert stats['num_subjects'] == 4       # files
    assert stats['num_valid_subjs'] == 2    # unique P01, P02
    assert stats['dataset_n'] == {'Carter2023': 2}


def test_ref_classification_is_per_subject(tmp_path):
    """A Carter2023 subject in the scan must not route OTHER datasets
    through the ref machinery (which without a class dict labels
    everything 'unknown'): the tier decision is per subject."""
    from inferbiomechanics_tpu.cli.make_plots_cmd import collect_stats
    from inferbiomechanics_tpu.data.b3d import write_subject
    from inferbiomechanics_tpu.data.synthetic import (
        standard_skeleton, synthetic_trial, write_synthetic_subject,
    )
    carter = tmp_path / 'Carter2023'
    other = tmp_path / 'MyLab2020'
    carter.mkdir(); other.mkdir()
    write_synthetic_subject(str(carter / 'P01_0.b3d'), num_trials=1,
                            trial_length=60, seed=0)
    rng = np.random.default_rng(1)
    write_subject(str(other / 'S1.b3d'), num_dofs=23,
                  ground_force_bodies=['calcn_l', 'calcn_r'],
                  root_history_len=10, skeleton=standard_skeleton(),
                  trials=[synthetic_trial('walk_01', 60, rng=rng)])
    stats = collect_stats([str(carter / 'P01_0.b3d'), str(other / 'S1.b3d')])
    hours = stats['motion_class_hours']
    # Carter trial 'trial_0': rule table -> running_treadmill;
    # MyLab trial 'walk_01': keyword fallback -> walking, NOT 'unknown'
    assert 'running_treadmill' in hours
    assert 'walking' in hours
    assert 'unknown' not in hours


@pytest.mark.slow
def test_make_plots_raw_mode(tmp_path):
    """TrialRaw variant: kinematics-only, no tau figures (ref :1623-1733)."""
    from inferbiomechanics_tpu.cli.make_plots_cmd import (
        collect_stats, render_plots,
    )
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    p = str(tmp_path / 's.b3d')
    write_synthetic_subject(p, num_trials=1, trial_length=100, seed=1)
    stats = collect_stats([p], raw=True)
    assert stats['raw'] and stats['num_trials'] == 1
    assert stats['estimated_masses'] == []          # dynamics-only product
    assert all(not v for v in stats['freq_rmse'].values())
    written = render_plots(stats, str(tmp_path / 'out'))
    names = {os.path.basename(w) for w in written}
    assert not any('jointtau' in n for n in names)  # tau skipped in raw
    assert 'scatter_jointpos_vs_totgrf.png' in names


def test_grf_dist_ignores_negative_vertical_grf(tmp_path):
    """Frames with non-positive total vertical GRF contribute dist=0, not
    ~1e6-scale garbage from a clamped signed division."""
    from inferbiomechanics_tpu.cli.make_plots_cmd import collect_stats
    from inferbiomechanics_tpu.data.b3d import (
        TrialData, layout_offsets, layout_total, pass_channel_layout,
        write_subject,
    )
    layout = pass_channel_layout(23, 2, 10)
    offs = layout_offsets(layout)
    C = layout_total(layout)
    T = 40
    mat = np.zeros((T, C), np.float32)
    o_f, _ = offs['groundContactForce']
    mat[:, o_f + 1] = -5.0        # body 0 vertical force negative
    mat[:, o_f + 4] = 0.0         # body 1 zero -> total vertical = -5
    p = str(tmp_path / 's.b3d')
    write_subject(p, num_dofs=23, ground_force_bodies=['calcn_l', 'calcn_r'],
                  root_history_len=10,
                  trials=[TrialData(name='t', timestep=0.01,
                                    passes=[mat, mat.copy()],
                                    pass_types=[0, 1],
                                    missing_grf_reasons=[0] * T)])
    stats = collect_stats([p])
    dist = np.asarray(stats['scatter_frames']['grf_dist_y'])
    assert dist.size > 0
    np.testing.assert_array_equal(dist, 0.0)


# ---------------------------------------------------------------------------
# reference motion-classification machinery (ref make_plots.py:661-788)
# ---------------------------------------------------------------------------

def test_classify_motion_ref_rule_tables():
    from inferbiomechanics_tpu.cli.make_plots_cmd import classify_motion_ref
    # Carter2023 rules
    assert classify_motion_ref('/d/Carter2023/x.b3d', 'Static01', {}) == 'standing'
    assert classify_motion_ref('/d/Carter2023/x.b3d', 'walk_fast', {}) == 'walking_treadmill'
    assert classify_motion_ref('/d/Carter2023/x.b3d', 'trial7', {}) == 'running_treadmill'
    # Han2023 rules
    assert classify_motion_ref('/d/Han2023/x.b3d', 'a_squat_1', {}) == 'squat'
    assert classify_motion_ref('/d/Han2023/x.b3d', 'chair_rise', {}) == 'squat'
    assert classify_motion_ref('/d/Han2023/x.b3d', 'a_hop_2', {}) == 'jump'
    assert classify_motion_ref('/d/Han2023/x.b3d', 'jumpingjack3', {}) == 'jump'
    assert classify_motion_ref('/d/Han2023/x.b3d', 'a_step_up', {}) == 'stairs'
    assert classify_motion_ref('/d/Han2023/x.b3d', 'b_static', {}) == 'standing'
    assert classify_motion_ref('/d/Han2023/x.b3d', 'a_walk_1', {}) == 'walking_overground'
    assert classify_motion_ref('/d/Han2023/x.b3d', 'freeform', {}) == 'other'
    # manual dict lookup + relabeling quirks
    d = {'t1': 'walking_ramp', 't2': 'transition_sit', 't3': 'bad_marker',
         't4': None}
    assert classify_motion_ref('/d/Other/x.b3d', 't1', d) == 'walking_overground'
    assert classify_motion_ref('/d/Other/x.b3d', 't2', d) == 'other'
    assert 'bad' in classify_motion_ref('/d/Other/x.b3d', 't3', d)
    assert classify_motion_ref('/d/Other/x.b3d', 't4', d) == 'unknown'
    assert classify_motion_ref('/d/Other/x.b3d', 'absent', d) == 'unknown'
    # dataset-specific unknown relabels
    assert classify_motion_ref('/d/Tan2021/s9.b3d', 'absent', {}) == 'running_treadmill'
    assert classify_motion_ref('/d/Uhlrich2023/subject2.b3d', 'absent', {}) == 'jump_dropjump'


def test_parse_subject_id():
    from inferbiomechanics_tpu.cli.make_plots_cmd import parse_subject_id
    assert parse_subject_id('/data/X/AB_split5_no_arm_subj42.b3d') == 'subj42'
    assert parse_subject_id('/data/X/freeform.b3d') == 'freeform'
    assert parse_subject_id('/data/X/no_arm_p1.b3d', raw=True) == 'no_arm_p1'


def test_class_path_npy_changes_activity_chart(tmp_path):
    """A synthetic .npy class dict (ref format) relabels trials on the
    activity chart, replacing the keyword fallback (VERDICT r2 #4)."""
    import numpy as np

    from inferbiomechanics_tpu.cli.make_plots_cmd import collect_stats
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject

    data = tmp_path / 'data' / 'Hamner2013'
    data.mkdir(parents=True)
    subj = str(data / 'split0_no_arm_P001.b3d')
    write_synthetic_subject(subj, num_trials=2, trial_length=60, seed=0)

    # keyword fallback: synthetic trials are named trial_0/trial_1 -> other
    base = collect_stats([subj])
    assert base['motion_class_hours'].get('other', 0) > 0

    # write the reference-format class dict: {trial_name, motion_class}
    class_dir = tmp_path / 'classes'
    d = class_dir / 'Hamner2013' / 'P001'
    d.mkdir(parents=True)
    np.save(str(d / 'P001.npy'),
            np.array([{'trial_name': 'trial_0',
                       'motion_class': 'running_treadmill'},
                      {'trial_name': 'trial_1', 'motion_class': 'bad'}],
                     dtype=object))

    stats = collect_stats([subj], class_dir=str(class_dir),
                          class_datasets=['Hamner2013'])
    mc = stats['motion_class_hours']
    assert mc.get('running_treadmill', 0) > 0
    assert mc.get('other', 0) == 0
    # the 'bad' trial is skipped entirely, not just unlabeled
    assert stats['num_trials'] == 1


def test_make_plots_cli_flag_parity(tmp_path):
    """--datasets filters subjects; --output-histograms restricts the
    rendered figure set; --downsample-size parses (ref :26-41)."""
    import subprocess
    import sys

    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    for i, ds_name in enumerate(('SetA', 'SetB')):
        d = tmp_path / 'data' / ds_name
        d.mkdir(parents=True)
        # fixed per-name seed: built-in hash() is salted per process
        write_synthetic_subject(str(d / 's.b3d'), num_trials=1,
                                trial_length=60, seed=40 + i)
    out = tmp_path / 'figs'
    main_py = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'main.py')
    env = dict(os.environ, IB_PLATFORM='cpu')
    r = subprocess.run(
        [sys.executable, main_py, 'make-plots',
         '--data-path', str(tmp_path / 'data'), '--datasets', 'SetA',
         '--downsample-size', '5', '--output-histograms',
         '--out-dir', str(out), '--cache', str(tmp_path / 'c.pkl')],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'subjects=1' in r.stdout          # SetB filtered out
    files = os.listdir(out)
    assert any(f.startswith('hist_') for f in files)
    assert not any(f.startswith('scatter_') for f in files)  # gated off
