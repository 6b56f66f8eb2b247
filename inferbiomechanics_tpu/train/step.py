"""Jitted train / eval steps.

One fused XLA program per step: forward, loss, ALL reported metrics,
backward, and optimizer update (the reference runs each of these as
separate eager torch calls — train.py:240-284). Steps take the packed
``[B, T, C]`` batch arrays straight from the data layer; label dicts are
zero-cost column slices created inside the traced function.

The same step functions serve single-chip jit and multi-chip pjit: under
a ``Mesh`` the caller passes sharded inputs and XLA inserts the gradient
all-reduce over ICI automatically (replacing the reference's DDP/NCCL,
train.py:175).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax

from inferbiomechanics_tpu.data.dataset import unpack
from inferbiomechanics_tpu.loss.evaluator import LossConfig, loss_and_metrics
from inferbiomechanics_tpu.train.state import TrainState


def accumulate_grads(state: TrainState, batch_inputs: jax.Array,
                     batch_labels: jax.Array, dropout_rng: jax.Array,
                     grad_accum: int, loss_for) -> Tuple[object, dict, dict]:
    """Microbatched grad computation shared by the host and device steps.

    Splits the batch into ``grad_accum`` equal microbatches, runs them
    sequentially under ``lax.scan`` (activation memory = one microbatch),
    and returns ``(grads, metrics, new_batch_stats)`` with gradients and
    metrics averaged over microbatches — numerically the full-batch mean
    because the microbatches are equal-sized. ``loss_for(params,
    batch_stats, inputs, labels, rng) -> (loss, (metrics, new_ms))`` is
    the per-microbatch loss closure.
    """
    import jax.numpy as jnp

    b = batch_inputs.shape[0]
    if b % grad_accum:
        raise ValueError(f'batch size {b} not divisible by '
                         f'--grad-accum-steps {grad_accum}')
    mb = b // grad_accum
    mb_in = batch_inputs.reshape(grad_accum, mb, *batch_inputs.shape[1:])
    mb_lab = batch_labels.reshape(grad_accum, mb, *batch_labels.shape[1:])
    rngs = jax.random.split(dropout_rng, grad_accum)

    def one(carry, xs):
        gsum, bstats = carry
        inputs, labels, rng = xs
        grads, (metrics, new_ms) = jax.grad(loss_for, has_aux=True)(
            state.params, bstats, inputs, labels, rng)
        if new_ms:
            bstats = new_ms['batch_stats']
        gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
        return (gsum, bstats), metrics

    zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    (gsum, bstats), metrics = jax.lax.scan(
        one, (zeros, state.batch_stats), (mb_in, mb_lab, rngs))
    grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
    metrics = jax.tree_util.tree_map(lambda m: m.mean(0), metrics)
    return grads, metrics, bstats


def lowp_allreduce_grads(state: TrainState, loss_for, batch: Tuple,
                         dropout_rng, mesh, reduce_dtype,
                         grad_accum: int = 1):
    """Per-shard grads + explicit reduced-precision psum over the data
    axis — the core of ``--grad-allreduce-dtype`` shared by the host and
    device-resident steps.

    ``batch`` is a tuple of (data-axis-sharded) arrays matching
    ``loss_for(params, bstats, batch[0], batch[1], rng)``; batchnorm is
    the caller's responsibility to reject. Params are marked
    device-varying BEFORE differentiating: the cotangent of a replicated
    input is auto-psummed in f32 (transpose-of-broadcast), which would
    both bypass the reduced-precision reduction and double-count it.
    Returns ``(grads, metrics)`` with grads mean-reduced across shards
    (reduction in ``reduce_dtype``, mean finished in the param dtype)
    and metrics pmean'd.
    """
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from inferbiomechanics_tpu.parallel.mesh import DATA_AXIS
    n_dp = int(mesh.shape[DATA_AXIS])
    rd = jnp.dtype(reduce_dtype)
    if hasattr(jax.lax, 'pcast'):
        def to_varying(x):
            return jax.lax.pcast(x, DATA_AXIS, to='varying')
    else:                                   # pragma: no cover - old jax
        def to_varying(x):
            return jax.lax.pvary(x, (DATA_AXIS,))

    def shard_fn(params, a, b, rng):
        # decorrelate dropout across shards (GSPMD partitions one global
        # noise tensor; explicit shards must fold the shard id in)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        params = jax.tree_util.tree_map(to_varying, params)
        if grad_accum > 1:
            grads, metrics, _ = accumulate_grads(
                state.replace(params=params), a, b, rng, grad_accum,
                loss_for)
        else:
            grads, (metrics, _) = jax.grad(loss_for, has_aux=True)(
                params, {}, a, b, rng)
        grads = jax.tree_util.tree_map(
            lambda g: (jax.lax.psum(g.astype(rd), DATA_AXIS)
                       .astype(g.dtype) / n_dp), grads)
        metrics = jax.tree_util.tree_map(
            lambda m: jax.lax.pmean(m, DATA_AXIS), metrics)
        return grads, metrics

    try:                                    # jax >= 0.8
        from jax import shard_map as _shard_map
    except ImportError:                     # pragma: no cover
        from jax.experimental.shard_map import shard_map as _shard_map
    fn = _shard_map(shard_fn, mesh=mesh,
                    in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
                    out_specs=(P(), P()))
    return fn(state.params, batch[0], batch[1], dropout_rng)


def make_train_step(model, lab_offsets: Dict[str, Tuple[int, int]],
                    loss_config: LossConfig,
                    donate: bool = True,
                    grad_accum: int = 1,
                    grad_allreduce_dtype=None,
                    mesh=None,
                    augment=None) -> Callable:
    """Build ``step(state, inputs, labels, rng) -> (state, metrics)``.

    ``grad_accum > 1`` splits the batch into that many sequential
    microbatches and averages the gradients before the single optimizer
    update (one XLA program either way).

    ``grad_allreduce_dtype`` (requires ``mesh``) runs the step as an
    explicit-collective ``shard_map`` over the data axis with the
    gradient psum cast to the reduced dtype — see
    ``device_data.make_device_train_step`` for the full rationale.
    Batchnorm models are rejected on that path.

    ``augment`` (an ``augment.Augmenter``) mirrors/noises each batch
    inside the compiled step; eval steps never augment."""

    def make_loss_for(mutable):
        def loss_for(params, bstats, inputs, labels_packed, rng):
            from inferbiomechanics_tpu.train.augment import maybe_augment
            inputs, labels_packed = maybe_augment(augment, inputs,
                                                  labels_packed, rng)
            labels = unpack(labels_packed, lab_offsets)
            variables = {'params': params}
            if bstats:
                variables['batch_stats'] = bstats
            if mutable:
                outputs, new_model_state = model.apply(
                    variables, inputs, train=True,
                    rngs={'dropout': rng}, mutable=mutable)
            else:
                outputs = model.apply(variables, inputs, train=True,
                                      rngs={'dropout': rng})
                new_model_state = {}
            loss, metrics = loss_and_metrics(outputs, labels, loss_config)
            return loss, (metrics, new_model_state)
        return loss_for

    if grad_allreduce_dtype is not None:
        if mesh is None:
            raise ValueError('grad_allreduce_dtype requires the mesh')

        def step_lowp(state: TrainState, batch_inputs: jax.Array,
                      batch_labels: jax.Array, dropout_rng: jax.Array):
            if state.batch_stats:
                raise ValueError('--grad-allreduce-dtype does not support '
                                 'batchnorm models')
            grads, metrics = lowp_allreduce_grads(
                state, make_loss_for([]), (batch_inputs, batch_labels),
                dropout_rng, mesh, grad_allreduce_dtype, grad_accum)
            return state.apply_gradients(grads=grads), metrics

        return jax.jit(step_lowp, donate_argnums=(0,) if donate else ())

    def step(state: TrainState, batch_inputs: jax.Array,
             batch_labels: jax.Array, dropout_rng: jax.Array):
        mutable = ['batch_stats'] if state.batch_stats else []
        loss_for = make_loss_for(mutable)
        if grad_accum > 1:
            grads, metrics, bstats = accumulate_grads(
                state, batch_inputs, batch_labels, dropout_rng,
                grad_accum, loss_for)
        else:
            grads, (metrics, new_ms) = jax.grad(loss_for, has_aux=True)(
                state.params, state.batch_stats, batch_inputs, batch_labels,
                dropout_rng)
            bstats = new_ms['batch_stats'] if mutable else state.batch_stats
        state = state.apply_gradients(grads=grads)
        if mutable:
            state = state.replace(batch_stats=bstats)
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_chunked_train_step(model, lab_offsets: Dict[str, Tuple[int, int]],
                            loss_config: LossConfig,
                            chunk_steps: int,
                            donate: bool = True,
                            grad_accum: int = 1,
                            augment=None) -> Callable:
    """Chunked host dispatch: ``chunk(state, inputs [K,B,...], labels
    [K,B,...], rngs [K]) -> (state, stacked per-step metrics)``.

    The host tier's per-step dispatch pays one upload + one program
    launch per batch (BENCH_NOTES: 228-423k w/s vs the device-resident
    scan's 11M). Prefetching K batches, uploading them as ONE array, and
    running a K-step ``lax.scan`` per dispatch amortizes both costs by K
    while keeping semantics bitwise-identical to K sequential calls of
    ``make_train_step``'s program (same step body, same per-step RNG
    keys, per-step metrics returned stacked so the evaluator accumulates
    exactly as before). Replaces the reference's per-sample hot loop
    economics (train.py:240-284) for datasets too large for HBM
    residency."""
    per_step = make_train_step(model, lab_offsets, loss_config,
                               donate=False, grad_accum=grad_accum,
                               augment=augment)

    def chunk(state: TrainState, inputs: jax.Array, labels: jax.Array,
              rngs: jax.Array):
        def body(s, xs):
            x, y, r = xs
            return per_step(s, x, y, r)

        return jax.lax.scan(body, state, (inputs, labels, rngs))

    del chunk_steps  # shape comes from the [K, ...] arrays themselves
    return jax.jit(chunk, donate_argnums=(0,) if donate else ())


def make_eval_step(model, lab_offsets: Dict[str, Tuple[int, int]],
                   loss_config: LossConfig) -> Callable:
    """Build ``eval_step(state, inputs, labels) -> (outputs, metrics)``."""

    def eval_step(state: TrainState, batch_inputs: jax.Array,
                  batch_labels: jax.Array):
        labels = unpack(batch_labels, lab_offsets)
        variables = {'params': state.params}
        if state.batch_stats:
            variables['batch_stats'] = state.batch_stats
        outputs = model.apply(variables, batch_inputs, train=False)
        _, metrics = loss_and_metrics(outputs, labels, loss_config)
        return outputs, metrics

    return jax.jit(eval_step)
