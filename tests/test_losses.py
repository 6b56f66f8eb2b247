"""Parity suite for the core loss/metric kernels.

Port of the reference's 24 unit tests
(``test/loss/test_RegressionLossEvaluator.py:7-192``) against the JAX
implementations in ``inferbiomechanics_tpu.ops.losses``. These are the
behavioral oracle for the reduction semantics (per-channel MSE over
(batch,time); per-3-vector threshold masks; last-frame-only norm errors;
summed L+R COM-acc proxy).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from inferbiomechanics_tpu.ops import (
    squared_diff_mean_vector,
    mask_by_threes,
    mean_norm_error,
    com_acc_error,
)


# ---- squared_diff_mean_vector -------------------------------------------

def test_squared_diff_mean_vector_with_valid_tensors():
    output = jnp.arange(24, dtype=jnp.float32).reshape((2, 4, 3))
    label = jnp.arange(24, dtype=jnp.float32).reshape((2, 4, 3))
    np.testing.assert_array_equal(np.asarray(squared_diff_mean_vector(output, label)),
                                  np.zeros(3, np.float32))


def test_squared_diff_mean_vector_with_nonzero_loss():
    output = jnp.arange(24, dtype=jnp.float32).reshape((2, 4, 3))
    label = output + 1.0
    np.testing.assert_allclose(np.asarray(squared_diff_mean_vector(output, label)),
                               np.ones(3, np.float32))


def test_squared_diff_mean_vector_with_mismatched_tensor_shapes():
    output = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]])
    label = jnp.asarray([[[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]])
    with pytest.raises(ValueError):
        squared_diff_mean_vector(output, label)


def test_squared_diff_mean_vector_with_empty_tensors():
    output = jnp.zeros((0,))
    label = jnp.zeros((0,))
    with pytest.raises(ValueError):
        squared_diff_mean_vector(output, label)


# ---- mask_by_threes -------------------------------------------------------

def test_mask_by_threes_with_valid_input():
    tensor = jnp.asarray([[[1.0, 0.0, 0.0],
                           [0.0, 2.0, 0.0]],
                          [[0.0, 0.0, 0.0],
                           [3.0, 0.0, 4.0]]])
    expected = np.asarray([[[1.0, 1.0, 1.0],
                            [1.0, 1.0, 1.0]],
                           [[0.0, 0.0, 0.0],
                            [1.0, 1.0, 1.0]]], np.float32)
    np.testing.assert_array_equal(np.asarray(mask_by_threes(tensor)), expected)


def test_mask_by_threes_with_threshold():
    tensor = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]]])
    expected = np.asarray([[[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]], np.float32)
    np.testing.assert_array_equal(np.asarray(mask_by_threes(tensor, threshold=1.5)), expected)


def test_mask_by_threes_with_invalid_dimensions():
    with pytest.raises(ValueError):
        mask_by_threes(jnp.asarray([[1.0, 0.0, 0.0]]))


def test_mask_by_threes_with_empty_tensor():
    with pytest.raises(ValueError):
        mask_by_threes(jnp.zeros((0,)))


def test_mask_by_threes_with_invalid_last_dimension():
    with pytest.raises(ValueError):
        mask_by_threes(jnp.asarray([[[1.0, 0.0], [0.0, 2.0]]]))


def test_mask_by_threes_with_zeros():
    tensor = jnp.zeros((1, 2, 3))
    np.testing.assert_array_equal(np.asarray(mask_by_threes(tensor)), np.zeros((1, 2, 3), np.float32))


def test_mask_by_threes_with_one_non_zero():
    tensor = jnp.asarray([[[0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
                           [0.0, 0.0, 0.0, 1.0, 0.0, 0.0]]])
    expected = np.asarray([[[1.0, 1.0, 1.0, 0.0, 0.0, 0.0],
                            [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]]], np.float32)
    np.testing.assert_array_equal(np.asarray(mask_by_threes(tensor)), expected)


# ---- mean_norm_error ------------------------------------------------------

def test_mean_norm_error_shape_mismatch():
    with pytest.raises(ValueError):
        mean_norm_error(jnp.zeros((3, 2, 6)), jnp.zeros((3, 2, 9)))


def test_mean_norm_error_tensor_not_3d():
    with pytest.raises(ValueError):
        mean_norm_error(jnp.zeros((2, 6)), jnp.zeros((2, 6)))


def test_mean_norm_error_empty_tensor():
    with pytest.raises(ValueError):
        mean_norm_error(jnp.zeros((0, 6)), jnp.zeros((0, 6)))


def test_mean_norm_error_final_dimension_not_divisible_by_three():
    with pytest.raises(ValueError):
        mean_norm_error(jnp.zeros((3, 2, 7)), jnp.zeros((3, 2, 7)))


def test_mean_norm_error_zero():
    # Differences exist only on the FIRST frame; the metric uses the last
    # frame only, so the error must be zero.
    output = jnp.asarray([[[3.0, -2.0, 4.0], [4.0, 5.0, 6.0]],
                          [[3.0, -2.0, 4.0], [4.0, 5.0, 6.0]]])
    label = jnp.asarray([[[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]],
                         [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]])
    assert np.isclose(float(mean_norm_error(output, label)), 0.0)


def test_mean_norm_error_non_zero():
    output = jnp.asarray([[[3.0, -2.0, 4.0], [4.0, 5.0, 6.0]],
                          [[3.0, -2.0, 4.0], [4.0, 5.0, 7.0]]])
    label = jnp.asarray([[[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]],
                         [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]])
    assert np.isclose(float(mean_norm_error(output, label)), 0.5)


def test_mean_norm_error_zero_vec_size_6():
    output = jnp.asarray([[[1.0, 2.0, 3.0, 4.0, 5.0, 6.0]]])
    assert np.isclose(float(mean_norm_error(output, output, vec_size=6)), 0.0)


def test_mean_norm_error_non_zero_vec_size_6():
    output = jnp.asarray([[[1.0, 2.0, 3.0, 4.0, 5.0, 6.0]]])
    label = jnp.zeros_like(output)
    expected = float(np.linalg.norm([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]))
    assert np.isclose(float(mean_norm_error(output, label, vec_size=6)), expected)


# ---- com_acc_error --------------------------------------------------------

def test_com_acc_shape_mismatch():
    with pytest.raises(ValueError):
        com_acc_error(jnp.zeros((3, 2, 6)), jnp.zeros((4, 2, 6)))


def test_com_acc_not_3d_tensor():
    with pytest.raises(ValueError):
        com_acc_error(jnp.zeros((2, 6)), jnp.zeros((2, 6)))


def test_com_acc_empty_tensor():
    with pytest.raises(ValueError):
        com_acc_error(jnp.zeros((0, 0)), jnp.zeros((3, 6)))


def test_com_acc_final_dimension_not_six():
    with pytest.raises(ValueError):
        com_acc_error(jnp.zeros((3, 2, 5)), jnp.zeros((3, 2, 5)))


def test_com_acc_output_zero():
    # L and R forces are swapped between output and label; their sums match.
    output = jnp.asarray([[[1.0, 2.0, 3.0, 0.0, 0.0, 0.0],
                           [0.0, 0.0, 0.0, 1.0, 2.0, 3.0]]])
    label = jnp.asarray([[[0.0, 0.0, 0.0, 1.0, 2.0, 3.0],
                          [1.0, 2.0, 3.0, 0.0, 0.0, 0.0]]])
    assert np.isclose(float(com_acc_error(output, label)), 0.0)


# ---- jit-compatibility ----------------------------------------------------

def test_helpers_work_under_jit():
    import jax

    @jax.jit
    def f(o, l):
        mask = mask_by_threes(l, threshold=10.0)
        return (squared_diff_mean_vector(o * mask, l * mask),
                mean_norm_error(o, l),
                com_acc_error(o, l))

    o = jnp.ones((4, 5, 6))
    l = jnp.ones((4, 5, 6)) * 20.0
    mse, mne, cae = f(o, l)
    assert mse.shape == (6,)
    np.testing.assert_allclose(np.asarray(mse), np.full(6, 19.0 ** 2), rtol=1e-6)
    assert np.isclose(float(mne), np.linalg.norm([19.0] * 3), rtol=1e-6)
    assert np.isclose(float(cae), np.linalg.norm([38.0] * 3), rtol=1e-6)


def test_mask_stops_gradient():
    import jax

    def loss(l):
        m = mask_by_threes(l, threshold=0.5)
        return jnp.sum(m * l)

    g = jax.grad(loss)(jnp.ones((1, 1, 3)) * 2.0)
    # Gradient flows through l but not through the mask itself.
    np.testing.assert_allclose(np.asarray(g), np.ones((1, 1, 3)), rtol=1e-6)


# ---- property-style checks -------------------------------------------------

def test_squared_diff_symmetry_and_shift_invariance():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(5, 4, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(5, 4, 6)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(squared_diff_mean_vector(a, b)),
                               np.asarray(squared_diff_mean_vector(b, a)),
                               rtol=1e-6)
    c = jnp.asarray(rng.normal(size=(1, 1, 6)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(squared_diff_mean_vector(a + c, b + c)),
                               np.asarray(squared_diff_mean_vector(a, b)),
                               rtol=1e-4, atol=1e-5)


def test_mask_by_threes_idempotent_and_binary():
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.normal(size=(3, 4, 12)).astype(np.float32))
    m = mask_by_threes(t, threshold=0.5)
    vals = np.unique(np.asarray(m))
    assert set(vals.tolist()) <= {0.0, 1.0}
    # masking a mask with threshold below 1 returns the same mask
    np.testing.assert_array_equal(np.asarray(mask_by_threes(m, threshold=0.5)),
                                  np.asarray(m))


def test_mean_norm_error_scale_equivariance():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(4, 3, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4, 3, 6)).astype(np.float32))
    e1 = float(mean_norm_error(a, b))
    e2 = float(mean_norm_error(3.0 * a, 3.0 * b))
    assert np.isclose(e2, 3.0 * e1, rtol=1e-5)
