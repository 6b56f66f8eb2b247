"""Feedforward MLP baseline.

Capability parity: reference ``src/models/FeedForwardRegressionBaseline.py``
— an MLP over the flattened window of all 10 input streams, configurable
hidden dims / activation / dropout / batchnorm, emitting the 4 contact
output groups per output frame. Differences by design:

- contact-body count is generic (the reference hard-assumes 2, ref :116-120);
- the root-history width is taken from the data's ``root_history_len``
  (the reference inconsistently asserts ``stride*3``, ref :92-94 — a
  latent bug SURVEY.md §2.5 says not to replicate);
- compute runs in bf16 on the MXU with fp32 params/outputs.

Weight init (round-4 parity study, PARITY_RMSE.md): ``init_style='torch'``
(default) reproduces torch's Linear init — kernel AND bias ~
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — which the head-to-head benchmark
showed is what reproduces the reference's dev CoP error; flax's
lecun-normal/zeros ('lecun') gave better GRF error but ~2x CoP error on
the synthetic benchmark. Both styles share one param-tree structure, so
checkpoints interoperate.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from inferbiomechanics_tpu.models.common import (
    ModelInput, output_head_size, pack_inputs, slice_output_heads,
)

ACTIVATIONS = {
    'relu': nn.relu,
    'tanh': jnp.tanh,
    'sigmoid': nn.sigmoid,
    'gelu': nn.gelu,
    'elu': nn.elu,
}

# torch nn.Linear default: kernel kaiming_uniform(a=sqrt(5)) == U(-k, k)
# with k = 1/sqrt(fan_in), i.e. uniform variance scaling at scale 1/3.
_TORCH_KERNEL_INIT = nn.initializers.variance_scaling(
    1.0 / 3.0, 'fan_in', 'uniform')


def _torch_bias_init(key, shape, dtype=jnp.float32, *, fan_in: int):
    k = 1.0 / np.sqrt(fan_in)
    return nn.initializers.uniform(scale=2 * k)(key, shape, dtype) - k


def dense_init_kwargs(init_style: str, fan_in: int) -> dict:
    """Dense kernel/bias init kwargs for 'torch' or 'lecun' style."""
    if init_style == 'torch':
        return {'kernel_init': _TORCH_KERNEL_INIT,
                'bias_init': functools.partial(_torch_bias_init,
                                               fan_in=fan_in)}
    if init_style == 'lecun':
        return {}
    raise ValueError(f"init_style must be 'torch' or 'lecun', "
                     f"got {init_style!r}")


class FeedForwardBaseline(nn.Module):
    num_dofs: int
    num_contact_bodies: int
    history_len: int                  # raw-frame window length
    stride: int
    root_history_len: int
    output_data_format: str = 'last_frame'
    activation: str = 'sigmoid'
    hidden_dims: Sequence[int] = (512, 512)
    batchnorm: bool = False
    dropout: bool = False
    dropout_prob: float = 0.0
    compute_dtype: jnp.dtype = jnp.bfloat16
    init_style: str = 'torch'
    # Serve the forward pass through the fused Pallas MLP kernel
    # (ops/pallas_mlp.py): whole layer chain VMEM-resident, ~1.2x XLA on
    # TPU. Parameters are created explicitly so the jnp (training) and
    # pallas (inference) paths share one param tree. Incompatible with
    # batchnorm/dropout.
    use_pallas: bool = False

    @property
    def num_frames(self) -> int:
        return self.history_len // self.stride

    @property
    def num_output_frames(self) -> int:
        return self.num_frames if self.output_data_format == 'all_frames' else 1

    @nn.compact
    def __call__(self, inputs: ModelInput, *, train: bool = False):
        x = pack_inputs(inputs)                      # [B, T, C_in]
        assert x.ndim == 3, f'expected (B, T, C), got {x.shape}'
        b = x.shape[0]
        out_size = output_head_size(self.num_contact_bodies, self.num_output_frames)

        if self.use_pallas:
            assert not self.batchnorm and not self.dropout, \
                'use_pallas is incompatible with batchnorm/dropout'
            from inferbiomechanics_tpu.ops.pallas_mlp import fused_mlp, mlp_reference
            x2 = x.reshape(b, -1)
            dims = [x2.shape[-1], *self.hidden_dims, out_size]
            flat = []
            for i, (d0, d1) in enumerate(zip(dims[:-1], dims[1:])):
                ik = dense_init_kwargs(self.init_style, d0)
                kinit = ik.get('kernel_init', nn.initializers.lecun_normal())
                binit = ik.get('bias_init', nn.initializers.zeros_init())
                flat.append(self.param(f'W{i}', kinit, (d0, d1)))
                flat.append(self.param(f'b{i}', binit, (d1,)))
            if train:
                params = [(flat[2 * i], flat[2 * i + 1]) for i in range(len(dims) - 1)]
                out = mlp_reference(x2, params, self.activation, self.compute_dtype)
            else:
                out = fused_mlp(x2, tuple(flat), self.activation)
            return slice_output_heads(out, self.num_contact_bodies,
                                      self.num_output_frames)

        x = x.reshape(b, -1).astype(self.compute_dtype)
        act = ACTIVATIONS[self.activation]
        for h in self.hidden_dims:
            if self.dropout:
                x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
            if self.batchnorm:
                x = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.compute_dtype)(x)
            x = nn.Dense(h, dtype=self.compute_dtype,
                         **dense_init_kwargs(self.init_style, x.shape[-1]))(x)
            x = act(x)
        if self.dropout:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        if self.batchnorm:
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.compute_dtype)(x)
        out = nn.Dense(out_size, dtype=self.compute_dtype,
                       **dense_init_kwargs(self.init_style, x.shape[-1]))(x)
        out = out.astype(jnp.float32)
        return slice_output_heads(out, self.num_contact_bodies, self.num_output_frames)
