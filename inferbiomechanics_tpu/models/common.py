"""Shared model plumbing: packed-input handling and output-head slicing.

Every model in the family consumes the 10 input streams in the canonical
concat order (reference FeedForwardRegressionBaseline.py:97-108) and
produces the 4 ground-contact output groups (ref :116-120). On TPU the
dataset already serves inputs as one packed ``[B, T, C_in]`` array, so
"concatenation" is the identity; models accept either the packed array or
a dict keyed by ``InputDataKeys`` (compat path — XLA folds the re-concat
of contiguous slices back into a no-op).
"""

from __future__ import annotations

from typing import Dict, Union

import jax
import jax.numpy as jnp

from inferbiomechanics_tpu.data import keys as K

ModelInput = Union[jax.Array, Dict[str, jax.Array]]


def pack_inputs(inputs: ModelInput) -> jax.Array:
    """Dict-of-streams -> packed [B, T, C_in]; passthrough if already packed."""
    if isinstance(inputs, dict):
        return jnp.concatenate([inputs[k] for k in K.INPUT_CONCAT_ORDER], axis=-1)
    return inputs


def slice_output_heads(x: jax.Array, num_contact_bodies: int,
                       num_output_frames: int) -> Dict[str, jax.Array]:
    """Split a flat head vector into the 4 contact output groups.

    ``x`` is [B, num_output_frames * per_frame] or [B, F, per_frame] where
    per-frame layout is [CoPs 3nb | forces 3nb | torques 3nb | wrenches 6nb]
    — generalizing the reference's hard-coded 2-body slicing
    (FeedForwardRegressionBaseline.py:116-120, Groundlink.py:151-156).
    """
    nb = num_contact_bodies
    per_frame = nb * (3 * 3 + 6)
    if x.ndim == 2:
        x = x.reshape(x.shape[0], num_output_frames, per_frame)
    c3, c6 = 3 * nb, 6 * nb
    return {
        K.OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME: x[..., 0:c3],
        K.OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME: x[..., c3:2 * c3],
        K.OutputDataKeys.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME: x[..., 2 * c3:3 * c3],
        K.OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME: x[..., 3 * c3:3 * c3 + c6],
    }


def output_head_size(num_contact_bodies: int, num_output_frames: int) -> int:
    return num_contact_bodies * (3 * 3 + 6) * num_output_frames
