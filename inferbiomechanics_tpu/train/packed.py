"""Packed-state train step: the whole TrainState in a few flat buffers.

Motivation (BENCH_NOTES.md, round-2 bisection): on the axon TPU runtime a
per-step program returning the updated ~100-leaf TrainState costs ~7 ms
beyond the encoder's fwd+bwd, and the cost tracks the returned pytree
rather than loss/metric/optimizer compute — consistent with per-output-
buffer overhead. Packing parameters and optimizer state into ONE flat
array per dtype turns ~100 donated outputs into ~2, while inside the jit
program the unpack is free (XLA slices/reshapes fuse away).

The epoch runners (device_data.py) don't need this — they keep the state
inside one program for a whole epoch. This is for per-step dispatch paths
(the flagship transformer step, host-loader training).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from inferbiomechanics_tpu.loss.evaluator import LossConfig, loss_and_metrics
from inferbiomechanics_tpu.train.state import TrainState


class PackSpec(NamedTuple):
    """How to rebuild a pytree from per-dtype flat buffers."""
    treedef: Any
    dtypes: List[str]                       # buffer order
    leaf_dtype: List[str]                   # per leaf: which buffer
    leaf_offset: List[int]                  # per leaf: offset in its buffer
    leaf_shape: List[Tuple[int, ...]]
    sizes: Dict[str, int]                   # per dtype: total elements


def make_pack_spec(tree) -> PackSpec:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    dtypes: List[str] = []
    offsets: Dict[str, int] = {}
    leaf_dtype, leaf_offset, leaf_shape = [], [], []
    for leaf in leaves:
        dt = str(jnp.asarray(leaf).dtype)
        if dt not in offsets:
            offsets[dt] = 0
            dtypes.append(dt)
        leaf_dtype.append(dt)
        leaf_offset.append(offsets[dt])
        leaf_shape.append(tuple(np.shape(leaf)))
        offsets[dt] += int(np.prod(np.shape(leaf)))  # () -> 1, zero-size -> 0
    return PackSpec(treedef, dtypes, leaf_dtype, leaf_offset, leaf_shape,
                    dict(offsets))


def pack(spec: PackSpec, tree) -> Dict[str, jax.Array]:
    """Pytree -> {dtype: flat buffer}. Traceable (usable inside jit)."""
    leaves = jax.tree_util.tree_leaves(tree)
    parts: Dict[str, list] = {dt: [] for dt in spec.dtypes}
    for leaf, dt in zip(leaves, spec.leaf_dtype):
        parts[dt].append(jnp.asarray(leaf).reshape(-1))
    return {dt: (jnp.concatenate(parts[dt]) if parts[dt]
                 else jnp.zeros((0,), dt)) for dt in spec.dtypes}


def unpack(spec: PackSpec, buffers: Dict[str, jax.Array]):
    """{dtype: flat buffer} -> pytree. Traceable; slices fuse away."""
    leaves = []
    for dt, off, shape in zip(spec.leaf_dtype, spec.leaf_offset,
                              spec.leaf_shape):
        n = int(np.prod(shape))
        leaves.append(jax.lax.dynamic_slice_in_dim(
            buffers[dt], off, n).reshape(shape) if n else
            jnp.zeros(shape, buffers[dt].dtype))
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)


class PackedState(NamedTuple):
    params: Dict[str, jax.Array]            # {dtype: flat}
    opt: Any                                # optax state OVER the flat dict
    step: jax.Array


def make_packed_device_train_step(model, data, loss_config: LossConfig,
                                  template: TrainState
                                  ) -> Tuple[Callable, Callable, Callable]:
    """Returns (pack_state, step, unpack_params).

    ``pack_state(TrainState) -> PackedState`` (host-side, once);
    ``step(packed, idx, rng) -> (packed, metrics)`` with the flat buffers
    donated; ``unpack_params(packed) -> params pytree`` for checkpointing.

    The optimizer runs DIRECTLY on the flat buffers (optax works on any
    pytree): instead of ~60 tensors × {m, v, update, apply} ≈ 300 tiny
    kernels per step, the whole update is ~6 big elementwise kernels —
    this is where the kernel-launch tax actually bites (BENCH_NOTES.md);
    gradients come out of value_and_grad already flat because the loss is
    differentiated with respect to the flat dict. Note: the optimizer
    state therefore lives in flat space — resuming a packed run restores
    params from a tree checkpoint but starts the optimizer fresh.
    """
    from inferbiomechanics_tpu.data.dataset import unpack as unpack_labels

    p_spec = make_pack_spec(template.params)
    tx = template.tx

    def pack_state(state: TrainState) -> PackedState:
        flat_params = pack(p_spec, state.params)
        return PackedState(flat_params, tx.init(flat_params),
                           jnp.asarray(state.step, jnp.int32))

    def unpack_params(packed: PackedState):
        return unpack(p_spec, packed.params)

    import functools
    import optax

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(packed: PackedState, idx: jax.Array, dropout_rng: jax.Array):
        x, y = data.gather_in_jit(idx)
        labels = unpack_labels(y, data.lab_offsets)

        def loss_fn(flat_params):
            params = unpack(p_spec, flat_params)
            out = model.apply({'params': params}, x.astype(jnp.float32),
                              train=True, rngs={'dropout': dropout_rng})
            loss, metrics = loss_and_metrics(out, labels, loss_config)
            return loss, metrics

        (loss, metrics), flat_grads = jax.value_and_grad(
            loss_fn, has_aux=True)(packed.params)
        updates, opt_state = tx.update(flat_grads, packed.opt, packed.params)
        flat_params = optax.apply_updates(packed.params, updates)
        return PackedState(flat_params, opt_state, packed.step + 1), metrics

    return pack_state, step, unpack_params
