"""Unit tests for the make-plots / review-file analytic helpers."""

import numpy as np

from inferbiomechanics_tpu.cli.make_plots_cmd import (
    classify_motion, estimate_mass, stance_speed, _butter_lowpass,
)
from inferbiomechanics_tpu.cli.review_file_cmd import find_suspicious_segments


def test_classify_motion_keywords():
    assert classify_motion('Treadmill_2ms') == 'walk'
    assert classify_motion('overground_walking_01') == 'walk'
    assert classify_motion('Sprint_Max') == 'run'
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
