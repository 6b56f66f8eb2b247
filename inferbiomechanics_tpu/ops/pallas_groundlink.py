"""Fused GroundLink forward: the whole conv stack + FC head in ONE Pallas
kernel per batch tile.

Serving motivation (BENCH_NOTES.md): the GroundLink forward measures
1.45 ms at B=4096 against a ~0.57 ms FLOP floor — a 2.5x gap, mostly
this runtime's ~12 µs-per-kernel launch tax across the ~50 kernels XLA
emits for 4 convs + pads + ELUs + 3 Dense. One kernel per tile dodges it
(the mechanism proven by the fused encoder, ops/pallas_encoder.py).

Layout (Mosaic-safe, 2-D values only — encoder kernel conventions):

- activations ride as ``[R, T*C]`` window-major rows; ``[R, T*C] <->
  [R*T, C]`` reshapes are free on TPU.
- temporal conv (kernel k=7, replicate padding) = k SHIFTED matmuls:
  for each tap j, frames are re-gathered with clamped lane slices
  (replicate padding falls out of the clamp) and ONE ``[R*T, C_in] x
  [C_in, C_out]`` matmul accumulates — exact conv FLOPs, MXU-shaped
  M = R*T.
- channel counts must be lane-aligned: the 177-channel input pads to
  256 (+7% conv FLOPs) and the 30-wide head pads to 128 lanes; both
  paddings are zeros and sliced off outside the kernel.

MEASURED OUTCOME (BENCH_NOTES.md "GroundLink fused-forward probe"): XLA
already runs this stack at the same rate (1.74 ms vs 1.79-1.96 fused at
B=4096) — unlike the transformer, the conv stack is compute-bound, not
launch-tax-bound. The kernel is therefore NOT wired into serving
(``nn.Conv`` stays the path); it is kept as validated infrastructure
(5 CPU/interpret tests) and as the recorded negative result. Parity
cite: reference Groundlink.py:41-62 (stack), :151-156 (head layout —
frame-major, identical to slice_output_heads, so no permutation).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_PER_FRAME = 30          # 2 contact bodies x (3*3 + 6)
_HEAD_PAD = 128          # head lanes padded for Mosaic alignment


def _elu(z):
    return jnp.where(z > 0, z, jnp.exp(jnp.minimum(z, 0.0)) - 1.0)


def groundlink_params_from_tree(params, c_in: int,
                                c_pad: int) -> Tuple[jnp.ndarray, ...]:
    """Flax Groundlink tree -> flat kernel operands.

    Conv kernels [k, C_in, C_out] flatten to [k*C_in_padded, C_out]
    (row-sliceable per tap); the first layer's C_in pads ``c_in ->
    c_pad`` with zero rows; the final Dense [C, 30] pads to
    [C, _HEAD_PAD] zero columns; biases become [1, N] rows.
    """
    out = []
    i = 0
    while f'Conv_{i}' in params:
        k = params[f'Conv_{i}']['kernel']               # [k, Cin, Cout]
        if i == 0 and k.shape[1] == c_in and c_in != c_pad:
            k = jnp.concatenate(
                [k, jnp.zeros((k.shape[0], c_pad - c_in, k.shape[2]),
                              k.dtype)], axis=1)
        out.append(k.reshape(-1, k.shape[2]))           # [k*Cin, Cout]
        out.append(params[f'Conv_{i}']['bias'][None, :])
        i += 1
    j = 0
    while f'Dense_{j}' in params:
        w = params[f'Dense_{j}']['kernel']
        b = params[f'Dense_{j}'].get('bias')
        if b is None and w.shape[1] == _PER_FRAME:      # padded head
            w = jnp.concatenate(
                [w, jnp.zeros((w.shape[0], _HEAD_PAD - _PER_FRAME),
                              w.dtype)], axis=1)
        out.append(w)
        if b is not None:
            out.append(b[None, :])
        j += 1
    return tuple(out)


def _gl_forward_math(x2d, params, t, conv_channels, fc_depth, last_frame,
                     compute_dtype, act_dtype=jnp.float32):
    """THE forward math on 2-D values — runs inside the Mosaic kernel and
    under interpret mode / the CPU fallback, so they cannot diverge.

    ``x2d`` [R, T*C0] f32 (C0 already padded); returns [R, T*_HEAD_PAD]
    (or [R, _HEAD_PAD] in last-frame mode) f32. ``act_dtype`` is the
    inter-layer activation residency (bf16 halves VMEM footprint and
    matches the flax model's own activation precision).
    """
    f32 = jnp.float32
    r = x2d.shape[0]
    h = x2d.astype(act_dtype)                            # [R, T*C]
    idx = 0
    k_taps = 7
    half = k_taps // 2
    c_cur = conv_channels[0]
    for c_out in conv_channels[1:]:
        w = params[idx]                                  # [k*Cin, Cout]
        b = params[idx + 1]                              # [1, Cout]
        idx += 2
        acc = None
        for j in range(k_taps):
            parts = []
            for ti in range(t):
                src = min(max(ti + j - half, 0), t - 1)  # replicate pad
                parts.append(h[:, src * c_cur:(src + 1) * c_cur])
            sh = jnp.concatenate(parts, axis=1).reshape(r * t, c_cur)
            z = jnp.dot(sh.astype(compute_dtype),
                        w[j * c_cur:(j + 1) * c_cur].astype(compute_dtype),
                        preferred_element_type=f32)
            acc = z if acc is None else acc + z
        h = _elu(acc + b).astype(act_dtype).reshape(r, t * c_out)
        c_cur = c_out
    h = h.astype(f32)

    if last_frame:
        h = h[:, (t - 1) * c_cur:]                       # [R, C]
        rows = r
    else:
        h = h.reshape(r * t, c_cur)
        rows = r * t
    h = h.reshape(rows, c_cur)
    for _ in range(fc_depth - 1):
        w, b = params[idx], params[idx + 1]
        idx += 2
        h = _elu(jnp.dot(h.astype(compute_dtype), w.astype(compute_dtype),
                         preferred_element_type=f32) + b)
    w = params[idx]                                      # padded head, no bias
    h = jnp.dot(h.astype(compute_dtype), w.astype(compute_dtype),
                preferred_element_type=f32)              # [rows, _HEAD_PAD]
    if last_frame:
        return h
    return h.reshape(r, t * _HEAD_PAD)


def _gl_kernel(t, conv_channels, fc_depth, last_frame, compute_dtype,
               act_dtype, x_ref, *refs):
    params = tuple(ref[:] for ref in refs[:-1])
    out_ref = refs[-1]
    out_ref[:] = _gl_forward_math(x_ref[:], params, t, conv_channels,
                                  fc_depth, last_frame, compute_dtype,
                                  act_dtype)


def fused_groundlink_forward(x: jax.Array, params, *,
                             output_data_format: str = 'all_frames',
                             fc_depth: int = 3,
                             tile_rows: int = 64,
                             compute_dtype=jnp.bfloat16,
                             act_dtype=jnp.float32,
                             interpret: bool = False) -> jax.Array:
    """x [B, T, C_in] f32 -> head vector [B, out_frames, 30] f32.

    On CPU without ``interpret`` the same math runs as plain jnp (the
    fallback used by tests and non-TPU machines).
    """
    b, t, c_in = x.shape
    c_pad = -(-c_in // 128) * 128
    last_frame = output_data_format != 'all_frames'

    conv_channels = [c_pad]
    i = 0
    while f'Conv_{i}' in params:
        conv_channels.append(params[f'Conv_{i}']['kernel'].shape[2])
        i += 1
    flat = groundlink_params_from_tree(params, c_in, c_pad)

    xp = x
    if c_pad != c_in:
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, c_pad - c_in)))
    xf = xp.reshape(b, t * c_pad)

    out_frames = 1 if last_frame else t
    if jax.default_backend() == 'cpu' and not interpret:
        out = _gl_forward_math(xf, flat, t, conv_channels, fc_depth,
                               last_frame, compute_dtype, act_dtype)
    else:
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        grid_b = -(-b // tile_rows)
        b_padded = grid_b * tile_rows
        if b_padded != b:
            xf = jnp.pad(xf, ((0, b_padded - b), (0, 0)))
        out_w = _HEAD_PAD if last_frame else t * _HEAD_PAD
        in_specs = [pl.BlockSpec((tile_rows, t * c_pad), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for p in flat:
            in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        kernel = functools.partial(_gl_kernel, t, conv_channels, fc_depth,
                                   last_frame, compute_dtype, act_dtype)
        out = pl.pallas_call(
            kernel,
            grid=(grid_b,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile_rows, out_w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b_padded, out_w), jnp.float32),
            interpret=interpret,
        )(xf, *flat)
        out = out[:b]

    out = out.reshape(b, out_frames, _HEAD_PAD)
    return out[..., :_PER_FRAME]
