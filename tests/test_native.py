"""Native C++ data-plane tests: gather parity with numpy fallback."""

import numpy as np
import pytest

from inferbiomechanics_tpu.data import native


def _ref_gather(src, starts, frames, stride):
    rows = starts[:, None] + stride * np.arange(frames)[None, :]
    return src[rows]


def test_gather_windows_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(1000, 177)).astype(np.float32)
    starts = rng.integers(0, 900, size=64).astype(np.int64)
    out = native.gather_windows(src, starts, frames=10, stride=5)
    np.testing.assert_array_equal(out, _ref_gather(src, starts, 10, 5))


def test_gather_columns_matches_numpy():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(500, 64)).astype(np.float32)
    starts = rng.integers(0, 400, size=32).astype(np.int64)
    col_idx = np.asarray([3, 0, 10, 63, 7], np.int64)
    scale = np.asarray([1.0, 0.5, 2.0, 1.0, -1.0], np.float32)
    out = native.gather_columns(src, starts, frames=4, stride=2,
                                col_idx=col_idx, scale=scale)
    ref = _ref_gather(src, starts, 4, 2)[:, :, col_idx] * scale[None, None, :]
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_native_library_loads():
    # the library should be built in this repo (make -C native); if this
    # fails the numpy fallback still keeps the framework functional, but
    # the build is expected to exist.
    assert native.available(), 'native/libib_native.so missing — run make -C native'


def test_dataset_gather_uses_native(tmp_path):
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    path = str(tmp_path / 's.b3d')
    write_synthetic_subject(path, num_trials=1, trial_length=150, seed=0)
    ds = WindowDataset(path, window_size=20, stride=5, skip_loading_skeletons=True)
    b = ds.gather(np.arange(16))
    # parity with the pure-numpy reference computation
    base = ds.trial_row_offset[ds.win_ft[:16]] + ds.win_start[:16]
    ref = _ref_gather(ds.features_all, base, 4, 5)
    np.testing.assert_array_equal(b.inputs, ref)
