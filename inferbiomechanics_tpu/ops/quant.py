"""int8 weight+activation quantization for MXU serving.

Beyond reference parity (the reference serves f32 torch modules only):
the TPU MXU executes int8xint8->int32 matmuls at twice the bf16 rate and
a quarter of the f32 weight-HBM traffic, so a quantized forward raises
the serving ceiling on exactly the hardware this framework targets.

Scheme (standard symmetric post-training quantization):

- weights: per-output-channel symmetric int8 — ``w_q = round(w / s_w)``
  with ``s_w[j] = max_i |w[i, j]| / 127`` (zero-point free, so the
  matmul needs no correction terms);
- activations: dynamic per-row symmetric int8 — ``s_x[b] =
  max_j |x[b, j]| / 127`` computed inside the jitted forward (no
  calibration dataset needed; one VPU max-reduce per layer);
- accumulation in int32 (``preferred_element_type``), dequantized by the
  rank-1 outer product ``s_x * s_w`` and biased in f32.

The quantized model family entry point is
``quantized_feedforward_forward`` which rebuilds the FeedForwardBaseline
inference chain (models/feedforward.py:88-105) from a trained param
tree. Serving integration: ``serve --quantize int8``.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from inferbiomechanics_tpu.models.common import (
    output_head_size, pack_inputs, slice_output_heads,
)
from inferbiomechanics_tpu.models.feedforward import ACTIVATIONS


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: ``(w_q [in,out], s_w [out])``."""
    s_w = jnp.max(jnp.abs(w), axis=0) / 127.0
    s_w = jnp.where(s_w == 0, 1.0, s_w)         # all-zero column guard
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    return w_q, s_w.astype(jnp.float32)


def qdense(x: jax.Array, w_q: jax.Array, s_w: jax.Array,
           b: jax.Array) -> jax.Array:
    """``x [B, in] f32 -> [B, out] f32`` through an int8 MXU matmul."""
    s_x = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    s_x = jnp.where(s_x == 0, 1.0, s_x)
    x_q = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (s_x * s_w[None, :]) + b


def quantize_feedforward_params(params: Dict) -> Dict:
    """Quantize every Dense kernel of a FeedForwardBaseline param tree.

    Returns ``{layer_name: {'w_q', 's_w', 'b'}}`` in layer order. Accepts
    both the flax ``Dense_i`` naming and the explicit ``W{i}/b{i}``
    pallas-path naming (models/feedforward.py:76-79).
    """
    out = {}
    if any(k.startswith('Dense_') for k in params):
        names = sorted((k for k in params if k.startswith('Dense_')),
                       key=lambda k: int(k.split('_')[1]))
        for name in names:
            w_q, s_w = quantize_weight(params[name]['kernel'])
            out[name] = {'w_q': w_q, 's_w': s_w,
                         'b': params[name]['bias'].astype(jnp.float32)}
        return out
    names = sorted((k for k in params if k.startswith('W')),
                   key=lambda k: int(k[1:]))
    if not names:
        raise ValueError('no Dense_i / W{i} kernels found; is this a '
                         'feedforward param tree?')
    for name in names:
        i = name[1:]
        w_q, s_w = quantize_weight(params[name])
        out[f'Dense_{i}'] = {'w_q': w_q, 's_w': s_w,
                             'b': params[f'b{i}'].astype(jnp.float32)}
    return out


def quantized_feedforward_forward(model, params: Dict) -> Callable:
    """Build ``fn(x [B,T,C_in]) -> outputs dict`` — the int8 serving
    forward for a trained FeedForwardBaseline (inference semantics of
    models/feedforward.py:88-105: no dropout, f32 head outputs).

    Batchnorm checkpoints are rejected: folding running stats into the
    quantized kernels is not implemented.
    """
    if model.batchnorm:
        raise ValueError('--quantize int8 does not support batchnorm '
                         'checkpoints (stats folding not implemented)')
    q = quantize_feedforward_params(params)
    names = sorted(q, key=lambda k: int(k.split('_')[1]))
    act = ACTIVATIONS[model.activation]
    n_hidden = len(model.hidden_dims)
    if len(names) != n_hidden + 1:
        raise ValueError(f'{len(names)} quantized layers for '
                         f'{n_hidden} hidden dims + 1 head')
    out_size = output_head_size(model.num_contact_bodies,
                                model.num_output_frames)
    if int(q[names[-1]]['b'].shape[0]) != out_size:
        raise ValueError('head width mismatch: checkpoint '
                         f'{q[names[-1]]["b"].shape[0]} vs model {out_size}')

    def forward(inputs):
        x = pack_inputs(inputs)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        for name in names[:-1]:
            layer = q[name]
            x = act(qdense(x, layer['w_q'], layer['s_w'], layer['b']))
        head = q[names[-1]]
        out = qdense(x, head['w_q'], head['s_w'], head['b'])
        return slice_output_heads(out, model.num_contact_bodies,
                                  model.num_output_frames)

    return forward
