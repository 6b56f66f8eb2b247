"""GroundLink temporal-CNN regressor.

Capability parity: reference ``src/models/Groundlink.py`` — a 1-D temporal
conv stack (channels [C_in,128,128,256,256], kernel 7, replicate padding,
ELU, dropout) followed by an MLP head per frame (fc_depth=3, dropout 0.2)
emitting the 4 contact output groups; ``last_frame`` mode runs the head on
the final frame only (ref :145-148). Xavier-normal init with the ELU gain
(ref :79-103).

TPU notes: two interchangeable conv lowerings (same parameter tree, so
checkpoints swap freely):

- ``conv_impl='xla'`` (default): [B, T, C] ``nn.Conv`` with explicit
  edge-pad. Measured round 3 (B=4096, chained + scalar readback):
  2.87 ms/step — ~1.7x the conv stack's ~1.7 ms train-step FLOP floor
  at the 138 TFLOP/s sustained rate, i.e. the stack is FLOP-bound and
  XLA's conv lowering is already near-roofline here.
- ``conv_impl='banded'``: with the short windows this model runs on
  (T = 10 frames after striding), a k-tap temporal conv IS one dense
  matmul ``[B, T*C_in] @ [T*C_in, T*C_out]`` against a block-banded
  weight built from the conv kernel — replicate padding folds into the
  band edges. Band density is k/T (7/10) so the dense matmul does
  1.43x the conv's FLOPs; measured 3.55 ms/step (B=4096) and 1.73 vs
  1.51 (B=512) — the FLOP overhead loses at every tested batch because
  the stack is compute-bound, so this stays an option for genuinely
  launch-bound regimes, validated bit-equivalent and checkpoint-
  compatible with the default.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from inferbiomechanics_tpu.models.common import (
    ModelInput, output_head_size, pack_inputs, slice_output_heads,
)

# xavier_normal with torch's calculate_gain('relu') = sqrt(2), as the
# reference applies to ELU layers (Groundlink.py:84,94-98).
_XAVIER_RELU = nn.initializers.variance_scaling(
    scale=2.0, mode='fan_avg', distribution='truncated_normal')

# torch nn.Linear default (kaiming_uniform a=sqrt(5) == U(+-1/sqrt(fan_in)))
# for the final head, which the reference's initialize() never reaches
_TORCH_KERNEL_INIT = nn.initializers.variance_scaling(
    1.0 / 3.0, 'fan_in', 'uniform')


def _band_selector(T: int, k: int) -> np.ndarray:
    """[k, T, T] 0/1 constant: S[d, t, u] == 1 iff output frame u's d-th
    tap reads input frame t under replicate padding, i.e.
    t == clip(u + d - k//2, 0, T-1). Built in numpy at trace time —
    constant-folded by XLA."""
    half = k // 2
    S = np.zeros((k, T, T), np.float32)
    u = np.arange(T)
    for d in range(k):
        src = np.clip(u + d - half, 0, T - 1)
        S[d, src, u] = 1.0
    return S


class BandedConv(nn.Module):
    """Temporal conv as one dense banded matmul (module docstring above).

    Parameter names/shapes match ``nn.Conv`` (``kernel`` [k, C_in, C_out],
    ``bias`` [C_out]) so either lowering loads the other's checkpoints.
    """
    features: int
    kernel_size: int
    dtype: jnp.dtype = jnp.bfloat16
    kernel_init: nn.initializers.Initializer = _XAVIER_RELU

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:   # [B, T, C_in]
        B, T, C = x.shape
        kernel = self.param('kernel', self.kernel_init,
                            (self.kernel_size, C, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        S = jnp.asarray(_band_selector(T, self.kernel_size), self.dtype)
        # W_big[(t,ci),(u,co)] = sum_d S[d,t,u] * kernel[d,ci,co]
        w_big = jnp.einsum('dtu,dio->tiuo', S, kernel.astype(self.dtype))
        w_big = w_big.reshape(T * C, T * self.features)
        y = x.reshape(B, T * C).astype(self.dtype) @ w_big
        y = y + jnp.tile(bias.astype(self.dtype), T)[None, :]
        return y.reshape(B, T, self.features)


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
    conv_impl: str = 'xla'     # 'xla' (nn.Conv) | 'banded' (matmul lowering)
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs: ModelInput, *, train: bool = False):
        x = pack_inputs(inputs)                       # [B, T, C_in]
        assert x.ndim == 3, f'expected (B, T, C), got {x.shape}'
        x = x.astype(self.compute_dtype)
        half = self.cnn_kernel // 2

        for i, c_out in enumerate(self.cnn_features):
            x = nn.Dropout(self.cnn_dropout, deterministic=not train)(x)
            # explicit name: both lowerings share the parameter tree
            if self.conv_impl == 'banded':
                x = BandedConv(c_out, self.cnn_kernel,
                               dtype=self.compute_dtype,
                               kernel_init=_XAVIER_RELU,
                               name=f'Conv_{i}')(x)
            else:
                # replicate ("edge") padding along time, then VALID conv
                xp = jnp.pad(x, ((0, 0), (half, half), (0, 0)), mode='edge')
                x = nn.Conv(c_out, kernel_size=(self.cnn_kernel,),
                            padding='VALID', kernel_init=_XAVIER_RELU,
                            dtype=self.compute_dtype, name=f'Conv_{i}')(xp)
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
        # the reference's initialize() (Groundlink.py:79-105) zips each
        # layer with its FOLLOWING activation, so the final un-activated
        # Linear keeps torch's default kaiming-uniform init — xavier-relu
        # here made the init output scale ~3x larger and cost ~2x dev
        # CoP/COM-acc error over the first training epochs (PARITY_RMSE.md)
        x = nn.Dense(per_frame, use_bias=False,
                     kernel_init=_TORCH_KERNEL_INIT,
                     dtype=self.compute_dtype)(x)
        x = x.astype(jnp.float32)
        return slice_output_heads(x, self.num_contact_bodies, x.shape[1])
