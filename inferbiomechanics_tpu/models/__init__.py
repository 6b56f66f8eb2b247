"""Model registry / factory.

Capability parity: reference ``src/cli/abstract_command.py:44-84``
(``get_model``), extended with the transformer (first-class here, dead
code there) and the diffusion denoiser (BASELINE.json config #4).
"""

from typing import Sequence

from inferbiomechanics_tpu.models.common import (
    pack_inputs, slice_output_heads, output_head_size,
)
from inferbiomechanics_tpu.models.feedforward import FeedForwardBaseline
from inferbiomechanics_tpu.models.groundlink import Groundlink
from inferbiomechanics_tpu.models.transformer import TransformerRegressor

MODEL_TYPES = ('analytical', 'feedforward', 'groundlink', 'transformer', 'diffusion')


def get_model(model_type: str,
              *,
              num_dofs: int,
              num_contact_bodies: int,
              history_len: int,
              stride: int,
              root_history_len: int,
              output_data_format: str = 'last_frame',
              activation: str = 'sigmoid',
              hidden_dims: Sequence[int] = (512, 512),
              batchnorm: bool = False,
              dropout: bool = False,
              dropout_prob: float = 0.0,
              d_model: int = 256,
              num_layers: int = 4,
              num_heads: int = 8,
              use_pallas: bool = False,
              attn_impl: str = 'vpu',
              conv_impl: str = 'xla',
              diffusion_timesteps: int = 1000,
              init_style: str = 'torch'):
    """Build a model by name. 'analytical' has no learnable parameters and is
    served by :mod:`inferbiomechanics_tpu.models.analytical` instead."""
    if model_type == 'feedforward':
        return FeedForwardBaseline(
            num_dofs=num_dofs, num_contact_bodies=num_contact_bodies,
            history_len=history_len, stride=stride,
            root_history_len=root_history_len,
            output_data_format=output_data_format, activation=activation,
            hidden_dims=tuple(hidden_dims), batchnorm=batchnorm,
            dropout=dropout, dropout_prob=dropout_prob,
            use_pallas=use_pallas, init_style=init_style)
    if model_type == 'groundlink':
        return Groundlink(
            num_dofs=num_dofs, num_contact_bodies=num_contact_bodies,
            root_history_len=root_history_len,
            output_data_format=output_data_format, conv_impl=conv_impl)
    if model_type == 'transformer':
        return TransformerRegressor(
            num_dofs=num_dofs, num_contact_bodies=num_contact_bodies,
            history_len=history_len, stride=stride,
            output_data_format=output_data_format,
            d_model=d_model, num_layers=num_layers, num_heads=num_heads,
            dropout=dropout_prob if dropout else 0.0,
            attn_impl=attn_impl)
    if model_type == 'diffusion':
        from inferbiomechanics_tpu.models.diffusion import DiffusionDenoiser
        return DiffusionDenoiser(
            num_dofs=num_dofs, num_contact_bodies=num_contact_bodies,
            history_len=history_len, stride=stride,
            d_model=d_model, num_layers=num_layers, num_heads=num_heads,
            attn_impl=attn_impl, timesteps=diffusion_timesteps)
    raise ValueError(f'unknown model type {model_type!r}; expected one of {MODEL_TYPES}')


__all__ = [
    'get_model', 'MODEL_TYPES',
    'FeedForwardBaseline', 'Groundlink', 'TransformerRegressor',
    'pack_inputs', 'slice_output_heads', 'output_head_size',
]
