"""Core regression-loss/metric kernels, jit-compatible.

Parity surface: the four static helpers of the reference
``src/loss/RegressionLossEvaluator.py``:

- :func:`squared_diff_mean_vector`  (ref :73-83)
- :func:`mask_by_threes`            (ref :85-108)
- :func:`mean_norm_error`           (ref :119-141) — NOTE the reference
  reports the norm error of the **last frame only** (``[:, -1:, :, :]``);
  we reproduce that exactly.
- :func:`com_acc_error`             (ref :143-158)

All shape validation is static (Python ``ValueError`` at trace time), so
these functions are safe to call inside ``jax.jit`` with zero runtime cost
for the checks. The reference's 24 unit tests are ported in
``tests/test_losses.py`` as the parity oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _check_3d_same_shape(output_tensor: jax.Array, label_tensor: jax.Array) -> None:
    if output_tensor.shape != label_tensor.shape:
        raise ValueError('Output and label tensors must have the same shape')
    if len(output_tensor.shape) != 3:
        raise ValueError('Output and label tensors must be 3-dimensional')
    if output_tensor.size == 0:
        raise ValueError('Output and label tensors must not be empty')


def squared_diff_mean_vector(output_tensor: jax.Array, label_tensor: jax.Array) -> jax.Array:
    """Per-channel MSE, averaged over (batch, time); returns a (C,) vector."""
    _check_3d_same_shape(output_tensor, label_tensor)
    diff = output_tensor - label_tensor
    return jnp.mean(diff * diff, axis=(0, 1))


def mask_by_threes(tensor: jax.Array, threshold: float = 0.0) -> jax.Array:
    """Per-3-vector gating mask: 1.0 where the 3-vector's norm > threshold.

    Last dim must be divisible by 3; the mask is broadcast back to the
    input shape. Gradients are stopped (the reference computes this under
    ``torch.no_grad``).
    """
    if len(tensor.shape) != 3:
        raise ValueError('Mask tensor must be 3-dimensional')
    if tensor.size == 0:
        raise ValueError('Mask tensor must not be empty')
    if tensor.shape[-1] % 3 != 0:
        raise ValueError('Mask tensor must have a final dimension divisible by 3')
    b, t, c = tensor.shape
    vecs = tensor.reshape(b, t, c // 3, 3)
    norms = jnp.linalg.norm(vecs, axis=-1)
    mask = (norms > threshold).astype(tensor.dtype)
    mask = jnp.broadcast_to(mask[..., None], (b, t, c // 3, 3)).reshape(b, t, c)
    return jax.lax.stop_gradient(mask)


def mean_norm_error(output_tensor: jax.Array, label_tensor: jax.Array,
                    vec_size: int = 3) -> jax.Array:
    """Mean (over batch & vector groups) norm of LAST-FRAME error vectors.

    Matches the reference exactly: errors are grouped into ``vec_size``
    chunks along the channel dim, the norm is taken only on the final
    timestep, and the mean is over everything that remains.
    """
    _check_3d_same_shape(output_tensor, label_tensor)
    if output_tensor.shape[-1] % vec_size != 0:
        raise ValueError('Tensors must have a final dimension divisible by vec_size=' + str(vec_size))
    b, t, c = output_tensor.shape
    diffs = (output_tensor - label_tensor).reshape(b, t, c // vec_size, vec_size)
    norms = jnp.linalg.norm(diffs[:, -1:, :, :], axis=3)
    return jnp.mean(norms)


def com_acc_error(output_force_tensor: jax.Array, label_force_tensor: jax.Array) -> jax.Array:
    """Norm error of the summed left+right contact-force 3-vectors.

    A proxy for COM-acceleration error: total GRF / mass ~ COM acc + g.
    Final dim must be exactly 6 (two stacked 3-vectors).
    """
    _check_3d_same_shape(output_force_tensor, label_force_tensor)
    if output_force_tensor.shape[-1] != 6:
        raise ValueError('Output and label tensors must have a 6 dimensional final dimension')
    out_sum = output_force_tensor[:, :, :3] + output_force_tensor[:, :, 3:]
    lab_sum = label_force_tensor[:, :, :3] + label_force_tensor[:, :, 3:]
    return mean_norm_error(out_sum, lab_sum, vec_size=3)
