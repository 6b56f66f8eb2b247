"""Fused MLP forward kernel in Pallas (TPU).

The feedforward baseline's hot path is a small MLP over flattened
windows (e.g. 1770 → 512 → 512 → 30). XLA runs it as one matmul per
layer with activations bouncing through HBM between layers; this kernel
keeps the whole chain — every weight and intermediate activation — in
VMEM and touches HBM exactly twice per batch tile (input read, output
write). Weights for the default config are ~2.5 MB bf16, far under the
~16 MB VMEM budget.

Shapes are padded host-side to 128-lane multiples (zero padding is
exact for dense layers). Backward runs through a ``jax.custom_vjp``
whose bwd recomputes with the jnp reference — training works, and the
fused kernel serves the forward/inference path.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

_ACTS = {
    'relu': lambda x: jnp.maximum(x, 0),
    'tanh': jnp.tanh,
    'sigmoid': jax.nn.sigmoid,
    'gelu': jax.nn.gelu,
    'elu': jax.nn.elu,
}


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def mlp_reference(x: jax.Array, params: Sequence[Tuple[jax.Array, jax.Array]],
                  activation: str = 'sigmoid',
                  compute_dtype=jnp.bfloat16) -> jax.Array:
    """jnp reference: x [B, C] -> [B, out]. params = [(W, b), ...]."""
    act = _ACTS[activation]
    h = x.astype(compute_dtype)
    for i, (W, b) in enumerate(params):
        h = jnp.dot(h, W.astype(compute_dtype),
                    preferred_element_type=jnp.float32) + b
        if i < len(params) - 1:
            h = act(h)
        h = h.astype(compute_dtype)
    return h.astype(jnp.float32)


def _fused_kernel(activation, n_layers, x_ref, *refs):
    """One batch tile: the full MLP chain in VMEM."""
    import jax.experimental.pallas as pl  # noqa: F401

    act = _ACTS[activation]
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    out_ref = refs[2 * n_layers]
    h = x_ref[:]
    for i in range(n_layers):
        h = jnp.dot(h, w_refs[i][:],
                    preferred_element_type=jnp.float32) + b_refs[i][:]
        if i < n_layers - 1:
            h = act(h)
        h = h.astype(x_ref.dtype)
    out_ref[:] = h.astype(jnp.float32)


def fused_mlp_forward(x: jax.Array,
                      params: Sequence[Tuple[jax.Array, jax.Array]],
                      activation: str = 'sigmoid',
                      tile_b: int = 512,
                      compute_dtype=jnp.bfloat16) -> jax.Array:
    """Pallas fused forward. x [B, C_in] -> [B, C_out] float32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(params)
    b, c_in = x.shape
    c_out = params[-1][0].shape[1]

    # pad every dim to lane multiples; zero-padding is exact for dense+act
    # chains as long as padded OUTPUT columns are sliced off at the end
    # (sigmoid/tanh of 0-bias columns feed zero weights downstream only if
    # the next W's padded rows are zero — they are, see below).
    dims = [c_in] + [W.shape[1] for W, _ in params]
    pdims = [_round_up(d, 128) for d in dims]
    bp = _round_up(min(tile_b, b), 128)
    grid_b = -(-b // bp)
    b_pad = grid_b * bp

    xp = jnp.zeros((b_pad, pdims[0]), compute_dtype)
    xp = xp.at[:b, :c_in].set(x.astype(compute_dtype))
    Ws, bs = [], []
    for li, (W, bias) in enumerate(params):
        Wp = jnp.zeros((pdims[li], pdims[li + 1]), compute_dtype)
        Wp = Wp.at[:W.shape[0], :W.shape[1]].set(W.astype(compute_dtype))
        bp_ = jnp.zeros((1, pdims[li + 1]), jnp.float32)
        bp_ = bp_.at[0, :bias.shape[0]].set(bias.astype(jnp.float32))
        Ws.append(Wp)
        bs.append(bp_)
    # NOTE on padding correctness: padded hidden columns get bias 0 and
    # activation(0) != 0 for sigmoid — but the NEXT layer's padded ROWS are
    # zero, so those columns never contribute to real outputs. Final-layer
    # padded columns are sliced off below.

    kernel = functools.partial(_fused_kernel, activation, n_layers)
    in_specs = [pl.BlockSpec((bp, pdims[0]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for li in range(n_layers):
        in_specs.append(pl.BlockSpec((pdims[li], pdims[li + 1]),
                                     lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for li in range(n_layers):
        in_specs.append(pl.BlockSpec((1, pdims[li + 1]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kernel,
        grid=(grid_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bp, pdims[-1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, pdims[-1]), jnp.float32),
    )(xp, *Ws, *bs)
    return out[:b, :c_out]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_mlp(x, flat_params, activation='sigmoid'):
    """Trainable fused MLP: pallas forward on TPU, jnp elsewhere.

    ``flat_params``: tuple (W1, b1, W2, b2, ...).
    """
    params = [(flat_params[2 * i], flat_params[2 * i + 1])
              for i in range(len(flat_params) // 2)]
    if jax.default_backend() == 'cpu':   # static at trace time
        return mlp_reference(x, params, activation)
    return fused_mlp_forward(x, params, activation)


def _fwd(x, flat_params, activation):
    return fused_mlp(x, flat_params, activation), (x, flat_params)


def _bwd(activation, res, g):
    x, flat_params = res
    params = [(flat_params[2 * i], flat_params[2 * i + 1])
              for i in range(len(flat_params) // 2)]
    _, vjp = jax.vjp(lambda x_, fp: mlp_reference(
        x_, [(fp[2 * i], fp[2 * i + 1]) for i in range(len(fp) // 2)],
        activation), x, flat_params)
    return vjp(g)


fused_mlp.defvjp(_fwd, _bwd)
