"""GroundLink temporal-CNN regressor.

Capability parity: reference ``src/models/Groundlink.py`` — a 1-D temporal
conv stack (channels [C_in,128,128,256,256], kernel 7, replicate padding,
ELU, dropout) followed by an MLP head per frame (fc_depth=3, dropout 0.2)
emitting the 4 contact output groups; ``last_frame`` mode runs the head on
the final frame only (ref :145-148). Xavier-normal init with the ELU gain
(ref :79-103).

TPU notes: convolutions run as [B, T, C] bf16 ``nn.Conv`` (XLA lowers
feature-last conv1d onto the MXU); replicate padding is an explicit
edge-pad so the conv itself is VALID.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from inferbiomechanics_tpu.models.common import (
    ModelInput, output_head_size, pack_inputs, slice_output_heads,
)

# xavier_normal with torch's calculate_gain('relu') = sqrt(2), as the
# reference applies to ELU layers (Groundlink.py:84,94-98).
_XAVIER_RELU = nn.initializers.variance_scaling(
    scale=2.0, mode='fan_avg', distribution='truncated_normal')


class Groundlink(nn.Module):
    num_dofs: int
    num_contact_bodies: int
    root_history_len: int
    output_data_format: str = 'all_frames'
    cnn_kernel: int = 7
    cnn_features: tuple = (128, 128, 256, 256)
    cnn_dropout: float = 0.0
    fc_depth: int = 3
    fc_dropout: float = 0.2
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs: ModelInput, *, train: bool = False):
        x = pack_inputs(inputs)                       # [B, T, C_in]
        assert x.ndim == 3, f'expected (B, T, C), got {x.shape}'
        x = x.astype(self.compute_dtype)
        half = self.cnn_kernel // 2

        for c_out in self.cnn_features:
            x = nn.Dropout(self.cnn_dropout, deterministic=not train)(x)
            # replicate ("edge") padding along time, then VALID conv
            xp = jnp.pad(x, ((0, 0), (half, half), (0, 0)), mode='edge')
            x = nn.Conv(c_out, kernel_size=(self.cnn_kernel,), padding='VALID',
                        kernel_init=_XAVIER_RELU, dtype=self.compute_dtype)(xp)
            x = nn.elu(x)

        if self.output_data_format != 'all_frames':
            x = x[:, -1:, :]

        for _ in range(self.fc_depth - 1):
            x = nn.Dropout(self.fc_dropout, deterministic=not train)(x)
            x = nn.Dense(self.cnn_features[-1], kernel_init=_XAVIER_RELU,
                         dtype=self.compute_dtype)(x)
            x = nn.elu(x)
        x = nn.Dropout(self.fc_dropout, deterministic=not train)(x)
        per_frame = output_head_size(self.num_contact_bodies, 1)
        x = nn.Dense(per_frame, use_bias=False, kernel_init=_XAVIER_RELU,
                     dtype=self.compute_dtype)(x)
        x = x.astype(jnp.float32)
        return slice_output_heads(x, self.num_contact_bodies, x.shape[1])
