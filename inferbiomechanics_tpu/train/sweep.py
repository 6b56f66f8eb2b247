"""Vmapped hyperparameter sweeps: K configs trained in ONE compiled program.

Capability parity+: the reference sweeps hyperparameters as bash loops
over sbatch — one full training job per (hidden_size, learning_rate)
point, each re-reading the dataset and re-dispatching every step
(reference ``src/slurm/slurm_loop.sh:13-22``). The TPU-native
replacement trains every same-shape config SIMULTANEOUSLY: parameters,
optimizer states, learning rates and dropout streams stack along a
config axis and a single ``jax.vmap``-ed train step updates all K
configs per batch. The batch is gathered (and, device-resident, HBM-read)
ONCE per step for all configs, and the per-kernel dispatch tax the small
models are bounded by (BENCH_NOTES.md: ~12 us/kernel; the feedforward
step is launch/gather-bound, not FLOP-bound) is paid once instead of K
times — so a K-way sweep costs far less than K sequential runs.

Sweepable axes (shape-preserving, so one XLA program serves every
config): learning rate x init/shuffle seed. Shape-CHANGING axes (hidden
dims) sweep as an outer sequential loop in the CLI
(``cli/sweep_cmd.py``), vmapping the lr x seed grid inside each shape.

Exact-lr trick: every reference optimizer choice (optimizers.py — the
six optax factories of ref train.py:183-197) ends in
``optax.scale_by_learning_rate(lr)``, i.e. its update is exactly linear
in the learning rate and lr appears nowhere in the optimizer STATE. The
sweep therefore builds one optimizer at lr=1.0 and multiplies each
config's (already sign-flipped) updates by its own lr — bit-identical
per op to baking that lr in (IEEE multiply is commutative; the sign
flip by -1.0 is exact), verified against all six factories in
``tests/test_sweep.py::test_lr_scaling_exact``.

Multi-chip: a sweep is embarrassingly parallel, so the natural mesh
mapping shards the CONFIG axis (not the batch) across devices —
each chip trains K/n configs with zero per-step collectives
(``config_axis_sharding``). Batch data parallelism would all-reduce
gradients every step for no cross-config benefit.
"""

from __future__ import annotations

import itertools
import json
import logging
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from inferbiomechanics_tpu.config import Config
from inferbiomechanics_tpu.data.dataset import WindowDataset, unpack
from inferbiomechanics_tpu.loss import LossConfig
from inferbiomechanics_tpu.loss.evaluator import loss_and_metrics
from inferbiomechanics_tpu.train.checkpoint import save_checkpoint
from inferbiomechanics_tpu.train.optimizers import make_optimizer
from inferbiomechanics_tpu.train.state import TrainState

logger = logging.getLogger(__name__)


@dataclass
class SweepPoint:
    """One config of the sweep grid and its outcome."""
    index: int
    learning_rate: float
    seed: int
    final_dev_loss: Optional[float] = None
    final_train_loss: Optional[float] = None
    checkpoint_path: Optional[str] = None
    best_dev_loss: Optional[float] = None     # min over per-epoch evals
    best_epoch: Optional[int] = None
    dev_curve: Optional[List[float]] = None   # dev loss after each epoch
    final_learning_rate: Optional[float] = None   # != learning_rate under PBT
    best_checkpoint_path: Optional[str] = None    # params at best_epoch


@dataclass
class SweepResult:
    points: List[SweepPoint] = field(default_factory=list)
    best_index: int = -1
    windows_per_sec: float = 0.0   # aggregate over all configs
    pbt_events: List[dict] = field(default_factory=list)
    preempted: bool = False        # SIGTERM grid-state-saved-and-exited

    @property
    def best(self) -> SweepPoint:
        return self.points[self.best_index]

    def to_json(self) -> str:
        return json.dumps({
            'points': [vars(p) for p in self.points],
            'best_index': self.best_index,
            'windows_per_sec': self.windows_per_sec,
            'pbt_events': self.pbt_events,
            'preempted': self.preempted,
        }, indent=2)


def sweep_grid(lrs: Sequence[float], seeds: Sequence[int]
               ) -> List[Tuple[float, int]]:
    """Cartesian lr x seed grid, lr-major (matching the reference's nested
    bash loops, slurm_loop.sh:17-22)."""
    return list(itertools.product([float(l) for l in lrs],
                                  [int(s) for s in seeds]))


# ---------------------------------------------------------------------------
# Stacked state
# ---------------------------------------------------------------------------


def init_sweep_states(model, tx: optax.GradientTransformation,
                      sample_inputs, seeds: Sequence[int],
                      init_fn=None) -> TrainState:
    """One TrainState whose leaves carry a leading [K] config axis.

    Each config's parameters are initialized from its own PRNG seed —
    exactly what K independent runs would do. ``init_fn(rngs)`` overrides
    the default regression-model init for models with other apply
    signatures (diffusion)."""

    def init_one(seed):
        rng = jax.random.PRNGKey(seed)
        rngs = {'params': rng, 'dropout': rng}
        variables = (init_fn(rngs) if init_fn is not None
                     else model.init(rngs, sample_inputs, train=False))
        if 'batch_stats' in variables:
            raise ValueError('sweep does not support batchnorm models '
                             '(mutable batch_stats cannot stack under vmap '
                             'with a shared batch); drop --batchnorm')
        params = variables['params']
        return params, tx.init(params)

    params, opt_state = jax.vmap(init_one)(
        jnp.asarray(list(seeds), jnp.uint32))
    return TrainState(step=jnp.zeros((len(list(seeds)),), jnp.int32),
                      params=params, opt_state=opt_state, batch_stats={},
                      tx=tx, apply_fn=model.apply)


def slice_config(state: TrainState, k: int) -> TrainState:
    """Extract config ``k`` as a plain (unstacked) TrainState — checkpoint
    compatible with single-run training (same pytree structure: lr is not
    part of any reference optimizer's state)."""
    take = lambda x: x[k]
    return state.replace(step=state.step[k],
                         params=jax.tree_util.tree_map(take, state.params),
                         opt_state=jax.tree_util.tree_map(take, state.opt_state))


def _config_axis_name(mesh) -> str:
    """The mesh axis carrying the [K] grid: 'config' on a 2-D sweep mesh
    (make_sweep_mesh — data axis reserved for pod-sharded trials), else
    the data axis (the original 1-D --shard-configs layout)."""
    from inferbiomechanics_tpu.parallel.mesh import CONFIG_AXIS, DATA_AXIS
    return CONFIG_AXIS if CONFIG_AXIS in mesh.axis_names else DATA_AXIS


def config_axis_sharding(mesh):
    """NamedSharding placing the leading config axis on the mesh's config
    (or data) axis — each device owns K/n configs, zero per-step
    collectives."""
    from jax.sharding import NamedSharding, PartitionSpec
    return NamedSharding(mesh, PartitionSpec(_config_axis_name(mesh)))


def shard_sweep_state(state: TrainState, mesh) -> TrainState:
    """Constrain every stacked leaf onto the config sharding. Leaves whose
    config axis does not divide the mesh (or 0-d leaves) stay replicated.

    Multi-process safe: the stacked state is a deterministic function of
    the seeds, so every process holds the identical host value and
    ``jax.device_put`` onto the global sharding is well-defined."""
    shard = config_axis_sharding(mesh)
    n = dict(mesh.shape).get(_config_axis_name(mesh), 1)
    multiproc = jax.process_count() > 1

    def place(x):
        if getattr(x, 'ndim', 0) >= 1 and x.shape[0] % n == 0:
            if multiproc:
                x = np.asarray(x)   # global device_put wants a host value
            return jax.device_put(x, shard)
        return x

    return jax.tree_util.tree_map(place, state)


def gather_replicated(tree, mesh):
    """All-gather a (possibly config-sharded) pytree to fully replicated —
    after this every process can address every leaf (checkpoint slicing,
    best-params snapshots, np conversion)."""
    from jax.sharding import NamedSharding, PartitionSpec
    rep = NamedSharding(mesh, PartitionSpec())
    return jax.jit(lambda t: t, out_shardings=rep)(tree)


def _metrics_replicated(metrics, mesh):
    """Pin [K]-stacked metrics replicated so hosts can read them under a
    config-sharded state on a multi-process mesh (a K-float all-gather)."""
    if mesh is None:
        return metrics
    from jax.sharding import NamedSharding, PartitionSpec
    rep = NamedSharding(mesh, PartitionSpec())
    return jax.tree_util.tree_map(
        lambda m: jax.lax.with_sharding_constraint(m, rep), metrics)


# ---------------------------------------------------------------------------
# Steps
# ---------------------------------------------------------------------------


def _one_update(model, tx, loss_config, batch_inputs, labels):
    """Per-config closure: grad + optimizer update with the exact-lr trick."""

    def update(params, opt_state, lr, dropout_rng):
        def loss_fn(p):
            outputs = model.apply({'params': p}, batch_inputs, train=True,
                                  rngs={'dropout': dropout_rng})
            loss, metrics = loss_and_metrics(outputs, labels, loss_config)
            return loss, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        # tx was built at lr=1.0 (updates already sign-flipped); scaling by
        # this config's lr is bit-identical to baking lr into tx (module
        # docstring; test_lr_scaling_exact)
        updates = jax.tree_util.tree_map(
            lambda u: u * lr.astype(u.dtype), updates)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, metrics

    return update


def make_sweep_train_step(model, tx: optax.GradientTransformation,
                          lab_offsets: Dict[str, Tuple[int, int]],
                          loss_config: LossConfig, lrs: Sequence[float],
                          donate: bool = True, mesh=None, augment=None):
    """``step(state, batch_inputs, batch_labels, rng[, lrs]) -> (state,
    metrics)`` — one host-fed batch updates all K configs; metrics leaves
    are [K]-stacked. The build-time ``lrs`` are the default; passing a
    [K] array at call time overrides them (how PBT mutates learning
    rates without retracing)."""
    lrs_default = jnp.asarray(list(lrs), jnp.float32)
    k = lrs_default.shape[0]

    def step(state: TrainState, batch_inputs, batch_labels, rng,
             lrs=lrs_default):
        from inferbiomechanics_tpu.train.augment import maybe_augment
        batch_inputs, batch_labels = maybe_augment(augment, batch_inputs,
                                                   batch_labels, rng)
        labels = unpack(batch_labels, lab_offsets)
        update = _one_update(model, tx, loss_config, batch_inputs, labels)
        subs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(k))
        new_params, new_opt, metrics = jax.vmap(update)(
            state.params, state.opt_state, lrs, subs)
        state = state.replace(step=state.step + 1, params=new_params,
                              opt_state=new_opt)
        return state, _metrics_replicated(metrics, mesh)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sweep_device_train_step(model, tx: optax.GradientTransformation,
                                 data, loss_config: LossConfig,
                                 lrs: Sequence[float], donate: bool = True,
                                 mesh=None, augment=None):
    """Device-resident variant of :func:`make_sweep_train_step`:
    ``step(state, idx, rng)`` gathers the batch from HBM inside the jit
    program (one gather feeds ALL configs) — per-step host traffic is
    one [B] int32 index vector (train/device_data.py mechanics)."""
    lrs_arr = jnp.asarray(list(lrs), jnp.float32)
    k = lrs_arr.shape[0]

    def step(state: TrainState, idx: jax.Array, rng: jax.Array,
             lrs=lrs_arr):
        from inferbiomechanics_tpu.train.augment import maybe_augment
        batch_inputs, batch_labels = data.gather_in_jit(idx)
        batch_inputs, batch_labels = maybe_augment(augment, batch_inputs,
                                                   batch_labels, rng)
        labels = unpack(batch_labels, data.lab_offsets)
        update = _one_update(model, tx, loss_config, batch_inputs, labels)
        subs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(k))
        new_params, new_opt, metrics = jax.vmap(update)(
            state.params, state.opt_state, lrs, subs)
        state = state.replace(step=state.step + 1, params=new_params,
                              opt_state=new_opt)
        return state, _metrics_replicated(metrics, mesh)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _constrain_config_axis(tree, mesh, k: int):
    """Keep [K, ...] leaves pinned to the config sharding inside jit so
    GSPMD cannot drift the grid state to replicated mid-step (2-D sweep
    mesh). No-op on 1-D meshes (no 'config' axis)."""
    if mesh is None or 'config' not in mesh.axis_names:
        return tree
    cs = config_axis_sharding(mesh)
    n = dict(mesh.shape)['config']

    def place(x):
        if getattr(x, 'ndim', 0) >= 1 and x.shape[0] == k and k % n == 0:
            return jax.lax.with_sharding_constraint(x, cs)
        return x

    return jax.tree_util.tree_map(place, tree)


def make_sweep_sharded_train_step(model, tx: optax.GradientTransformation,
                                  sdata, loss_config: LossConfig,
                                  lrs: Sequence[float], batch_size: int,
                                  donate: bool = True, augment=None,
                                  mesh=None):
    """Pod-sharded variant: ``step(state, rng[, lrs]) -> (state, metrics)``.

    The dataset lives as trial blocks sharded across the mesh's data
    axis (train/sharded_data.py — HBM capacity scales with the chip
    count); each step every shard samples and gathers its
    ``batch_size/S`` windows locally, and the batch-sharded result feeds
    the vmapped K-config update with GSPMD inserting the per-config
    gradient all-reduce.

    On a 1-D mesh configs are REPLICATED (the data axis is spent on the
    batch). On a 2-D ``make_sweep_mesh`` (config, data) mesh — the lift
    of the old ``--shard-configs`` x ``--device-data sharded`` mutual
    exclusion — the [K] grid shards over 'config' while trial blocks
    shard over 'data': each config-row of devices computes only its
    K/config-axis configs on the batch gathered from its data-row's
    shards, with the per-config gradient all-reduce riding 'data' only.
    """
    from inferbiomechanics_tpu.train.sharded_data import (
        make_sharded_sample_gather,
    )
    lrs_arr = jnp.asarray(list(lrs), jnp.float32)
    k = lrs_arr.shape[0]
    sample_gather = make_sharded_sample_gather(sdata, batch_size)

    def step(state: TrainState, rng: jax.Array, lrs=lrs_arr,
             *, feats, labs, base, cnt):
        rng_s, rng_k = jax.random.split(rng)
        from inferbiomechanics_tpu.train.augment import maybe_augment
        batch_inputs, batch_labels = sample_gather(feats, labs, base, cnt,
                                                   rng_s)
        batch_inputs, batch_labels = maybe_augment(augment, batch_inputs,
                                                   batch_labels, rng_k)
        labels = unpack(batch_labels, sdata.lab_offsets)
        update = _one_update(model, tx, loss_config, batch_inputs, labels)
        subs = jax.vmap(lambda i: jax.random.fold_in(rng_k, i))(jnp.arange(k))
        new_params, new_opt, metrics = jax.vmap(update)(
            state.params, state.opt_state, lrs, subs)
        new_params = _constrain_config_axis(new_params, mesh, k)
        new_opt = _constrain_config_axis(new_opt, mesh, k)
        state = state.replace(step=state.step + 1, params=new_params,
                              opt_state=new_opt)
        return state, _metrics_replicated(metrics, mesh)

    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())

    def run(state: TrainState, rng: jax.Array, lrs=lrs_arr):
        # sharded blocks travel as jit arguments (multi-host jit rejects
        # closures over non-addressable arrays — sharded_data.py)
        return jitted(state, rng, lrs, feats=sdata.features,
                      labs=sdata.labels, base=sdata.win_base,
                      cnt=sdata.win_count)

    return run


def make_sweep_device_epoch_step(model, tx, data, loss_config: LossConfig,
                                 lrs: Sequence[float], batch_size: int,
                                 steps_per_call: int = 8, augment=None):
    """Device-resident variant: ``run(state, rng) -> (state, mean_metrics)``
    — ``steps_per_call`` sweep steps per jit program (lax.scan), window
    indices sampled on device, the gathered batch read from HBM once per
    step for ALL configs (train/device_data.py mechanics)."""
    lrs_arr = jnp.asarray(list(lrs), jnp.float32)
    k = lrs_arr.shape[0]

    def one(carry, idx):
        state, rng = carry
        rng, sub = jax.random.split(rng)
        from inferbiomechanics_tpu.train.augment import maybe_augment
        batch_inputs, batch_labels = data.gather_in_jit(idx)
        batch_inputs, batch_labels = maybe_augment(augment, batch_inputs,
                                                   batch_labels, sub)
        labels = unpack(batch_labels, data.lab_offsets)
        update = _one_update(model, tx, loss_config, batch_inputs, labels)
        subs = jax.vmap(lambda i: jax.random.fold_in(sub, i))(jnp.arange(k))
        new_params, new_opt, metrics = jax.vmap(update)(
            state.params, state.opt_state, lrs_arr, subs)
        state = state.replace(step=state.step + 1, params=new_params,
                              opt_state=new_opt)
        return (state, rng), metrics

    def run(state: TrainState, rng: jax.Array):
        idx = jax.random.randint(
            jax.random.fold_in(rng, 0x5e), (steps_per_call, batch_size),
            0, data.num_windows, dtype=jnp.int32)
        (state, _), metrics = jax.lax.scan(one, (state, rng), idx)
        return state, jax.tree_util.tree_map(lambda m: m.mean(0), metrics)

    return jax.jit(run, donate_argnums=(0,))


def make_sweep_streaming_epoch(model, tx: optax.GradientTransformation,
                               ds: WindowDataset, plan,
                               loss_config: LossConfig,
                               lrs: Sequence[float], batch_size: int,
                               feature_dtype=jnp.bfloat16, mesh=None,
                               augment=None):
    """Out-of-core sweep tier: ``run(state, rng[, lrs]) -> (state,
    mean_metrics)`` — one streamed epoch over the StreamingPlan's
    segments (train/streaming_data.py mechanics: shuffled segment order,
    one-ahead host prefetch, hierarchical shuffle), with each in-scan
    step the vmapped K-config update. The segment upload is paid ONCE
    per segment for all K configs, so the sweep's K-for-the-price-of-one
    economics survive datasets beyond HBM."""
    from inferbiomechanics_tpu.train.streaming_data import run_segmented_epoch
    lrs_default = jnp.asarray(list(lrs), jnp.float32)
    k = lrs_default.shape[0]
    frames = ds.num_model_frames
    stride = ds.stride
    offs = jnp.arange(frames, dtype=jnp.int32) * stride
    last_frame = ds.output_data_format != 'all_frames'

    def seg_runner(state, feats, labs, idx_chunks, rng, lrs):
        def one(carry, idx):
            state, rng = carry
            rng, sub = jax.random.split(rng)
            rows = idx[:, None] + offs[None, :]
            bi = jnp.take(feats, rows, axis=0)
            if last_frame:
                bl = jnp.take(labs, idx[:, None] + (frames - 1) * stride,
                              axis=0)
            else:
                bl = jnp.take(labs, rows, axis=0)
            from inferbiomechanics_tpu.train.augment import maybe_augment
            bi, bl = maybe_augment(augment, bi, bl, sub)
            labels = unpack(bl, ds.lab_offsets)
            update = _one_update(model, tx, loss_config, bi, labels)
            subs = jax.vmap(lambda i: jax.random.fold_in(sub, i))(
                jnp.arange(k))
            new_params, new_opt, metrics = jax.vmap(update)(
                state.params, state.opt_state, lrs, subs)
            state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt)
            return (state, rng), metrics

        (state, _), metrics = jax.lax.scan(one, (state, rng), idx_chunks)
        metrics = jax.tree_util.tree_map(lambda m: m.mean(0), metrics)
        return state, _metrics_replicated(metrics, mesh)

    seg_runner = jax.jit(seg_runner, donate_argnums=(0,))

    def run(state: TrainState, rng: jax.Array, lrs=lrs_default):
        seg_fn = lambda st, f, l, ic, r: seg_runner(st, f, l, ic, r, lrs)
        return run_segmented_epoch(plan, batch_size, state, rng, seg_fn,
                                   feature_dtype)

    return run


def _diffusion_update(model, tx, sched, x_t, t, cond, noise):
    """Per-config diffusion closure: shared noising, per-config params/lr
    (the denoiser uses no dropout rng — matching
    models/diffusion.py::make_diffusion_train_step)."""

    def update(params, opt_state, lr):
        def loss_fn(p):
            eps = model.apply({'params': p}, x_t, t, cond, train=True)
            loss = jnp.mean((eps - noise) ** 2)
            return loss, {'loss': loss}

        grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(
            lambda u: u * lr.astype(u.dtype), updates)
        return optax.apply_updates(params, updates), new_opt, metrics

    return update


def _noising(sched, x0, rng):
    b = x0.shape[0]
    rng_t, rng_n = jax.random.split(rng)
    t = jax.random.randint(rng_t, (b,), 0, sched.timesteps)
    noise = jax.random.normal(rng_n, x0.shape, x0.dtype)
    return sched.q_sample(x0, t, noise), t, noise


def make_sweep_diffusion_step(model, tx, lab_offsets, lrs: Sequence[float],
                              schedule=None, donate: bool = True,
                              augment=None, cond_dropout: float = 0.0):
    """Diffusion (ε-MSE) sweep step: every config denoises the SAME
    noised batch (shared t/noise draw, the analogue of the shared batch
    gather) with its own params and lr."""
    from inferbiomechanics_tpu.models.diffusion import (
        DDPMSchedule, diffusion_targets_from_labels,
    )
    sched = schedule or DDPMSchedule(model.timesteps)
    lrs_arr = jnp.asarray(list(lrs), jnp.float32)

    def step(state: TrainState, batch_inputs, batch_labels, rng,
             lrs=lrs_arr):
        from inferbiomechanics_tpu.train.augment import maybe_augment
        from inferbiomechanics_tpu.models.diffusion import drop_conditioning
        batch_inputs, batch_labels = maybe_augment(augment, batch_inputs,
                                                   batch_labels, rng)
        batch_inputs = drop_conditioning(batch_inputs, rng, cond_dropout)
        x0 = diffusion_targets_from_labels(batch_labels, lab_offsets,
                                           model.num_contact_bodies)
        x_t, t, noise = _noising(sched, x0, rng)
        update = _diffusion_update(model, tx, sched, x_t, t, batch_inputs,
                                   noise)
        new_params, new_opt, metrics = jax.vmap(update)(
            state.params, state.opt_state, lrs)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sweep_device_diffusion_step(model, tx, data,
                                     lrs: Sequence[float], schedule=None,
                                     donate: bool = True, augment=None,
                                     cond_dropout: float = 0.0):
    """Device-resident diffusion sweep step: ``step(state, idx, rng)``."""
    from inferbiomechanics_tpu.models.diffusion import (
        DDPMSchedule, diffusion_targets_from_labels,
    )
    sched = schedule or DDPMSchedule(model.timesteps)
    lrs_arr = jnp.asarray(list(lrs), jnp.float32)

    def step(state: TrainState, idx: jax.Array, rng: jax.Array,
             lrs=lrs_arr):
        from inferbiomechanics_tpu.train.augment import maybe_augment
        from inferbiomechanics_tpu.models.diffusion import drop_conditioning
        batch_inputs, batch_labels = data.gather_in_jit(idx)
        batch_inputs, batch_labels = maybe_augment(augment, batch_inputs,
                                                   batch_labels, rng)
        batch_inputs = drop_conditioning(batch_inputs, rng, cond_dropout)
        x0 = diffusion_targets_from_labels(batch_labels, data.lab_offsets,
                                           model.num_contact_bodies)
        x_t, t, noise = _noising(sched, x0, rng)
        update = _diffusion_update(model, tx, sched, x_t, t, batch_inputs,
                                   noise)
        new_params, new_opt, metrics = jax.vmap(update)(
            state.params, state.opt_state, lrs)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sweep_streaming_diffusion_epoch(model, tx, ds: WindowDataset, plan,
                                         lrs: Sequence[float],
                                         batch_size: int, schedule=None,
                                         feature_dtype=jnp.bfloat16,
                                         mesh=None, augment=None,
                                         cond_dropout: float = 0.0):
    """Out-of-core diffusion sweep: streamed segments, each in-scan step
    one shared noising draw feeding the vmapped K-config ε-MSE update
    (segment upload paid once for all K configs)."""
    from inferbiomechanics_tpu.models.diffusion import (
        DDPMSchedule, diffusion_targets_from_labels,
    )
    from inferbiomechanics_tpu.train.streaming_data import run_segmented_epoch
    if ds.output_data_format != 'all_frames':
        raise ValueError('diffusion requires all_frames labels')
    sched = schedule or DDPMSchedule(model.timesteps)
    lrs_default = jnp.asarray(list(lrs), jnp.float32)
    frames = ds.num_model_frames
    stride = ds.stride
    offs = jnp.arange(frames, dtype=jnp.int32) * stride

    def seg_runner(state, feats, labs, idx_chunks, rng, lrs):
        def one(carry, idx):
            state, rng = carry
            rng, sub = jax.random.split(rng)
            rows = idx[:, None] + offs[None, :]
            bi = jnp.take(feats, rows, axis=0)
            bl = jnp.take(labs, rows, axis=0)
            from inferbiomechanics_tpu.train.augment import maybe_augment
            from inferbiomechanics_tpu.models.diffusion import (
                drop_conditioning,
            )
            bi, bl = maybe_augment(augment, bi, bl, sub)
            bi = drop_conditioning(bi, sub, cond_dropout)
            x0 = diffusion_targets_from_labels(bl, ds.lab_offsets,
                                               model.num_contact_bodies)
            x_t, t, noise = _noising(sched, x0, sub)
            update = _diffusion_update(model, tx, sched, x_t, t, bi, noise)
            new_params, new_opt, metrics = jax.vmap(update)(
                state.params, state.opt_state, lrs)
            state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt)
            return (state, rng), metrics

        (state, _), metrics = jax.lax.scan(one, (state, rng), idx_chunks)
        metrics = jax.tree_util.tree_map(lambda m: m.mean(0), metrics)
        return state, _metrics_replicated(metrics, mesh)

    seg_runner = jax.jit(seg_runner, donate_argnums=(0,))

    def run(state: TrainState, rng: jax.Array, lrs=lrs_default):
        seg_fn = lambda st, f, l, ic, r: seg_runner(st, f, l, ic, r, lrs)
        return run_segmented_epoch(plan, batch_size, state, rng, seg_fn,
                                   feature_dtype)

    return run


def make_sweep_sharded_diffusion_step(model, tx, sdata,
                                      lrs: Sequence[float], batch_size: int,
                                      schedule=None, donate: bool = True,
                                      augment=None,
                                      cond_dropout: float = 0.0,
                                      mesh=None):
    """Pod-sharded diffusion sweep step: ``step(state, rng[, lrs])``.

    Shard-local sample+gather of the conditioning windows and all-frames
    targets (train/sharded_data.py), one shared noising draw, then the
    vmapped K-config ε-MSE update with GSPMD inserting the per-config
    gradient all-reduce. On a 1-D mesh configs are replicated (the data
    axis carries the batch); on a 2-D ``make_sweep_mesh`` the grid
    shards 'config' while trial blocks shard 'data' — same contract as
    the regression sharded step.
    """
    from inferbiomechanics_tpu.models.diffusion import (
        DDPMSchedule, diffusion_targets_from_labels,
    )
    from inferbiomechanics_tpu.train.sharded_data import (
        make_sharded_sample_gather,
    )
    if sdata.output_data_format != 'all_frames':
        raise ValueError('diffusion requires all_frames labels')
    sched = schedule or DDPMSchedule(model.timesteps)
    lrs_arr = jnp.asarray(list(lrs), jnp.float32)
    sample_gather = make_sharded_sample_gather(sdata, batch_size)

    def step(state: TrainState, rng: jax.Array, lrs=lrs_arr,
             *, feats, labs, base, cnt):
        rng_s, rng_n = jax.random.split(rng)
        from inferbiomechanics_tpu.train.augment import maybe_augment
        from inferbiomechanics_tpu.models.diffusion import drop_conditioning
        batch_inputs, batch_labels = sample_gather(feats, labs, base, cnt,
                                                   rng_s)
        batch_inputs, batch_labels = maybe_augment(augment, batch_inputs,
                                                   batch_labels, rng_n)
        batch_inputs = drop_conditioning(batch_inputs, rng_n, cond_dropout)
        x0 = diffusion_targets_from_labels(batch_labels, sdata.lab_offsets,
                                           model.num_contact_bodies)
        x_t, t, noise = _noising(sched, x0, rng_n)
        update = _diffusion_update(model, tx, sched, x_t, t, batch_inputs,
                                   noise)
        new_params, new_opt, metrics = jax.vmap(update)(
            state.params, state.opt_state, lrs)
        new_params = _constrain_config_axis(new_params, mesh,
                                            lrs_arr.shape[0])
        new_opt = _constrain_config_axis(new_opt, mesh, lrs_arr.shape[0])
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), _metrics_replicated(
                                 metrics, mesh)

    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())

    def run(state: TrainState, rng: jax.Array, lrs=lrs_arr):
        # sharded blocks travel as jit arguments (multi-host jit rejects
        # closures over non-addressable arrays — sharded_data.py)
        return jitted(state, rng, lrs, feats=sdata.features,
                      labs=sdata.labels, base=sdata.win_base,
                      cnt=sdata.win_count)

    return run


def make_sweep_diffusion_eval(model, lab_offsets, schedule=None, mesh=None):
    """Deterministic ε-MSE comparator: every config scored on the SAME
    fixed noising of the dev batch (fixed PRNG), so per-epoch dev values
    are comparable across configs and epochs."""
    from inferbiomechanics_tpu.models.diffusion import (
        DDPMSchedule, diffusion_targets_from_labels,
    )
    sched = schedule or DDPMSchedule(model.timesteps)

    def eval_step(params_stack, batch_inputs, batch_labels):
        x0 = diffusion_targets_from_labels(batch_labels, lab_offsets,
                                           model.num_contact_bodies)
        x_t, t, noise = _noising(sched, x0, jax.random.PRNGKey(123))

        def one(params):
            eps = model.apply({'params': params}, x_t, t, batch_inputs,
                              train=False)
            return {'loss': jnp.mean((eps - noise) ** 2)}

        return _metrics_replicated(jax.vmap(one)(params_stack), mesh)

    return jax.jit(eval_step)


def make_sweep_eval_step(model, lab_offsets, loss_config: LossConfig,
                         mesh=None):
    """``eval(params_stack, batch_inputs, batch_labels) -> metrics`` with
    [K]-stacked leaves; the dev batch is shared across configs."""

    def eval_one(params, batch_inputs, labels):
        outputs = model.apply({'params': params}, batch_inputs, train=False)
        _, metrics = loss_and_metrics(outputs, labels, loss_config)
        return metrics

    def eval_step(params_stack, batch_inputs, batch_labels):
        labels = unpack(batch_labels, lab_offsets)
        metrics = jax.vmap(eval_one, in_axes=(0, None, None))(
            params_stack, batch_inputs, labels)
        return _metrics_replicated(metrics, mesh)

    return jax.jit(eval_step)


# ---------------------------------------------------------------------------
# The sweep loop
# ---------------------------------------------------------------------------


def run_sweep(config: Config, train_ds: WindowDataset,
              dev_ds: Optional[WindowDataset],
              lrs: Sequence[float], seeds: Sequence[int],
              max_batches_per_epoch: Optional[int] = None,
              shard_configs: bool = False,
              pbt_every: int = 0,
              metric_logger=None,
              metric_prefix: str = '') -> SweepResult:
    """Train the full lr x seed grid simultaneously; every config is
    dev-evaluated after every epoch and ranked by its BEST dev loss
    (final train loss when no dev split is usable). With
    ``config.early_stop_patience`` set, the whole grid stops early once
    no config has improved for that many evals.

    ``pbt_every=N`` turns the grid into population-based training: after
    every N-th dev eval the bottom quartile of configs EXPLOITS (copies
    the top quartile's params + optimizer state — a [K]-gather on the
    stacked state, one cheap device op) and EXPLORES (adopts the
    winner's lr perturbed by x0.8 / x1.25). Slot lineage is recorded in
    ``SweepResult.pbt_events``; a slot's ``dev_curve`` then describes
    the SLOT, not one fixed hyperparameter point.

    Batch order is shared across configs (one gather per step), seeded by
    ``config.seed`` — the per-config ``seeds`` drive init + dropout, which
    is the part that must vary for seed sweeps to be meaningful.
    """
    from inferbiomechanics_tpu.data.loader import PrefetchLoader
    from inferbiomechanics_tpu.train.loop import (
        build_model_for_dataset, loss_config_from,
    )

    grid = sweep_grid(lrs, seeds)
    k = len(grid)
    grid_lrs = [g[0] for g in grid]
    grid_seeds = [g[1] for g in grid]
    lc = loss_config_from(config)
    model = build_model_for_dataset(config, train_ds)
    is_diffusion = config.model_type == 'diffusion'
    if is_diffusion:
        if config.output_data_format != 'all_frames':
            raise ValueError('sweep --model-type diffusion requires '
                             '--output-data-format all_frames (like train)')
        # --diffusion-timesteps reaches the denoiser via
        # build_model_for_dataset since round 3; no silent default
        assert config.diffusion_timesteps == model.timesteps

    sample = train_ds.gather(
        np.arange(min(config.batch_size, max(1, len(train_ds)))))
    sample_inputs = sample.inputs
    if sample_inputs.shape[0] < config.batch_size:
        reps = -(-config.batch_size // sample_inputs.shape[0])
        sample_inputs = np.tile(sample_inputs,
                                (reps, 1, 1))[:config.batch_size]

    tx = make_optimizer(config.opt_type, 1.0,
                        weight_decay=config.weight_decay,
                        grad_clip_norm=config.grad_clip_norm)
    if config.lr_schedule != 'constant':
        raise ValueError('sweep supports constant learning rates only '
                         '(the exact-lr vmap trick needs lr out of the '
                         'optimizer state); drop --lr-schedule')
    if is_diffusion:
        x_cond = jnp.asarray(sample_inputs)
        x0_init = jnp.zeros((x_cond.shape[0], x_cond.shape[1],
                             model.target_channels))
        t_init = jnp.zeros((x_cond.shape[0],), jnp.int32)
        state = init_sweep_states(
            model, tx, None, grid_seeds,
            init_fn=lambda rngs: model.init(rngs, x0_init, t_init, x_cond))
    else:
        state = init_sweep_states(model, tx, jnp.asarray(sample_inputs),
                                  grid_seeds)
    # -- preemption safety + epoch-granular resume ----------------------
    # SIGTERM (TPU-VM / batch-scheduler eviction) saves the FULL stacked
    # grid state at the next epoch boundary and exits cleanly; rerunning
    # the same sweep command resumes from that state. Same contract as
    # train/loop.py, at the sweep's natural (epoch) granularity.
    stop_requested = {'flag': False}

    def _on_term(signum, frame):
        stop_requested['flag'] = True
        logger.warning('SIGTERM received: saving the grid state at the '
                       'next epoch boundary and exiting cleanly')

    import signal as _signal
    old_handler = None
    try:
        old_handler = _signal.signal(_signal.SIGTERM, _on_term)
    except ValueError:
        pass   # not the main thread (tests driving run_sweep directly)

    import json as _json
    grid_dir = (os.path.join(config.checkpoint_dir, '_grid')
                if config.checkpoint_dir else None)
    side_path = (os.path.join(grid_dir, 'sweep_state.json')
                 if grid_dir else None)
    grid_spec = [[float(lr), int(sd)] for lr, sd in grid]
    start_epoch = 0
    resumed_side = None
    if grid_dir:
        from inferbiomechanics_tpu.train.checkpoint import (
            load_latest_checkpoint,
        )
        st2, ge, _gb = load_latest_checkpoint(state, grid_dir)
        if ge >= 0:
            side = {}
            if side_path and os.path.exists(side_path):
                with open(side_path) as f:
                    side = _json.load(f)
            if side.get('grid') == grid_spec:
                state = st2
                start_epoch = ge + 1
                resumed_side = side
                logger.info('sweep resume: grid state restored from '
                            'epoch %d', ge)
            else:
                logger.warning('sweep grid checkpoint in %s does not match '
                               'the requested lr x seed grid; starting '
                               'fresh', grid_dir)

    mesh = None
    if shard_configs:
        if config.device_data == 'sharded':
            # 2-D (config, data) mesh: configs shard one axis, trial
            # blocks the other — lifts the round-3 mutual exclusion
            from inferbiomechanics_tpu.parallel import make_sweep_mesh
            mesh = make_sweep_mesh(k)
            shape = dict(mesh.shape)
            state = shard_sweep_state(state, mesh)
            if shape['config'] > 1:
                logger.info('sweep 2-D mesh: %d-way config x %d-way data '
                            'sharding', shape['config'], shape['data'])
            else:
                logger.warning('--shard-configs: %d configs share no '
                               'divisor with %d devices; configs stay '
                               'replicated, all devices carry data shards',
                               k, shape['data'])
        else:
            from inferbiomechanics_tpu.parallel import make_mesh
            mesh = make_mesh()
            n_dev = int(mesh.shape['data'])
            state = shard_sweep_state(state, mesh)
            if k % n_dev == 0:
                logger.info('sweep configs sharded %d-way across the mesh',
                            n_dev)
            else:
                logger.warning('--shard-configs: %d configs do not divide '
                               'the %d-device data axis; configs stay '
                               'replicated', k, n_dev)

    eval_step = (make_sweep_diffusion_eval(model, train_ds.lab_offsets,
                                           mesh=mesh)
                 if is_diffusion
                 else make_sweep_eval_step(model, train_ds.lab_offsets, lc,
                                           mesh=mesh))

    # on-device augmentation: the shared per-step batch is augmented once
    # and feeds all K configs (train/augment.py); dev eval never augments
    from inferbiomechanics_tpu.train.augment import augmenter_from_config
    augmenter = augmenter_from_config(config, train_ds, logger)

    # data tiers (same ladder as train/loop.py, simplified): pod-sharded
    # residency on request; else single-chip residency when the dataset
    # fits HBM; else the host loader. The sharded tier spends the mesh's
    # data axis on the BATCH, so it is mutually exclusive with
    # --shard-configs (which spends it on the config axis).
    device_data = None
    sharded_data = None
    streaming_run = None
    stream_windows_per_epoch = 0
    if config.device_data == 'stream':
        from inferbiomechanics_tpu.train.streaming_data import StreamingPlan
        plan = StreamingPlan(train_ds, config.device_data_max_bytes)
        if is_diffusion:
            streaming_run = make_sweep_streaming_diffusion_epoch(
                model, tx, train_ds, plan, grid_lrs, config.batch_size,
                mesh=mesh, augment=augmenter,
                cond_dropout=config.cond_dropout)
        else:
            streaming_run = make_sweep_streaming_epoch(
                model, tx, train_ds, plan, lc, grid_lrs, config.batch_size,
                mesh=mesh, augment=augmenter)
        stream_windows_per_epoch = sum(
            (s.win_base.shape[0] // config.batch_size)
            * config.batch_size for s in plan.segments)
        logger.info('sweep streaming data: %d segments of %d rows',
                    len(plan.segments), plan.rows_pad)
    if config.device_data == 'sharded':
        from inferbiomechanics_tpu.train.sharded_data import ShardedDeviceData
        if shard_configs:
            # the 2-D sweep mesh built above: trial blocks shard its
            # 'data' axis (replicated across 'config' rows), configs its
            # 'config' axis — K x pod grids over larger-than-HBM datasets
            data_mesh = mesh
        else:
            from inferbiomechanics_tpu.parallel import make_mesh
            data_mesh = make_mesh()
        sharded_data = ShardedDeviceData(train_ds, data_mesh)
        logger.info('sweep pod-sharded data: %d shards, %.0f MB HBM/device',
                    sharded_data.num_shards,
                    sharded_data.hbm_bytes_per_device / 1e6)
    elif (streaming_run is None and train_ds.features_all is not None
          and config.device_data != 'off'):
        data_bytes = (train_ds.features_all.nbytes
                      + train_ds.labels_all.nbytes)
        fits = data_bytes < config.device_data_max_bytes
        if config.device_data == 'on' or fits:
            from inferbiomechanics_tpu.train.device_data import (
                DeviceResidentData,
            )
            device_data = DeviceResidentData(
                train_ds,
                pack_windows=(config.pack_windows == 'on' or
                              (config.pack_windows == 'auto' and
                               data_bytes * (1 + train_ds.num_model_frames)
                               < config.device_data_max_bytes)))
            logger.info('sweep device-resident data: %.0f MB in HBM',
                        device_data.hbm_bytes / 1e6)
    if streaming_run is not None:
        step = None
        loader = None
    elif sharded_data is not None:
        step = (make_sweep_sharded_diffusion_step(model, tx, sharded_data,
                                                  grid_lrs, config.batch_size,
                                                  augment=augmenter,
                                                  cond_dropout=config.cond_dropout,
                                                  mesh=mesh)
                if is_diffusion else
                make_sweep_sharded_train_step(model, tx, sharded_data, lc,
                                              grid_lrs, config.batch_size,
                                              augment=augmenter, mesh=mesh))
        loader = None
    elif device_data is not None:
        step = (make_sweep_device_diffusion_step(model, tx, device_data,
                                                 grid_lrs, augment=augmenter,
                                                 cond_dropout=config.cond_dropout)
                if is_diffusion else
                make_sweep_device_train_step(model, tx, device_data, lc,
                                             grid_lrs, mesh=mesh,
                                             augment=augmenter))
        loader = None
    else:
        step = (make_sweep_diffusion_step(model, tx, train_ds.lab_offsets,
                                          grid_lrs, augment=augmenter,
                                          cond_dropout=config.cond_dropout)
                if is_diffusion else
                make_sweep_train_step(model, tx, train_ds.lab_offsets, lc,
                                      grid_lrs, mesh=mesh,
                                      augment=augmenter))
        loader = PrefetchLoader(train_ds, config.batch_size,
                                n_threads=config.data_loading_workers)
    dev_loader = (PrefetchLoader(dev_ds, config.batch_size, shuffle=False)
                  if dev_ds is not None and len(dev_ds) >= config.batch_size
                  else None)
    if dev_loader is None:
        logger.warning(
            'sweep: no usable dev split (%s) — configs will be ranked by '
            'FINAL TRAIN loss, which favors overfitting',
            'none provided' if dev_ds is None else
            f'{len(dev_ds)} dev windows < batch size {config.batch_size}; '
            f'lower --batch-size to enable dev ranking')

    def dev_losses_now() -> Optional[np.ndarray]:
        """Every config scored on the identical dev stream; [K] or None."""
        if dev_loader is None:
            return None
        acc, n = np.zeros(k), 0
        for batch in dev_loader.epoch(seed=0):
            m = eval_step(state.params, batch.inputs, batch.labels)
            acc += np.asarray(m['loss'])
            n += 1
        return acc / n if n else None

    rng = jax.random.PRNGKey(config.seed)
    windows_seen = 0
    t0 = time.time()
    last_train = None
    dev_curves: List[np.ndarray] = []      # [epoch][K]: dev loss AFTER epoch
    best_dev = np.full(k, np.inf)
    best_epoch = np.full(k, -1, np.int64)
    stale = 0
    cur_lrs = np.asarray(grid_lrs, np.float32)
    pbt_events: List[dict] = []
    best_params: List[Optional[dict]] = [None] * k   # host snapshots
    preempted = False
    if resumed_side is not None:
        cur_lrs = np.asarray(resumed_side['cur_lrs'], np.float32)
        best_dev = np.asarray(resumed_side['best_dev'], np.float64)
        best_epoch = np.asarray(resumed_side['best_epoch'], np.int64)
        dev_curves = [np.asarray(c) for c in resumed_side['dev_curves']]
        stale = int(resumed_side['stale'])
        pbt_events = list(resumed_side['pbt_events'])

    def persist_grid(epoch: int) -> None:
        """Write the resume artifact: the stacked grid state (one
        checkpoint) + the host-side trackers (JSON sidecar)."""
        if grid_dir is None:
            return
        state_rep = (gather_replicated(state, mesh) if mesh is not None
                     else state)
        save_checkpoint(grid_dir, state_rep, epoch, 0)
        from inferbiomechanics_tpu.train.checkpoint import prune_checkpoints
        prune_checkpoints(grid_dir, keep=2)
        if jax.process_index() == 0:
            tmp = side_path + '.tmp'
            with open(tmp, 'w') as f:
                _json.dump({'grid': grid_spec,
                            'cur_lrs': cur_lrs.tolist(),
                            'best_dev': best_dev.tolist(),
                            'best_epoch': best_epoch.tolist(),
                            'dev_curves': [list(map(float, c))
                                           for c in dev_curves],
                            'stale': stale,
                            'pbt_events': pbt_events}, f)
            os.replace(tmp, side_path)

    last_epoch = start_epoch - 1
    for epoch in range(start_epoch, config.epochs):
        last_epoch = epoch
        if streaming_run is not None:
            # one streamed epoch = one call (segment-granular, like the
            # train loop's streaming tier); PBT lr mutations apply
            # between epochs, which is when PBT mutates anyway
            state, last_train = streaming_run(
                state, jax.random.fold_in(rng, epoch),
                jnp.asarray(cur_lrs))
            windows_seen += stream_windows_per_epoch * k
            batch_iter = ()   # the per-batch loop below has nothing to do
        elif sharded_data is not None:
            # shard-local sampling happens in-program; the "batch" is
            # just the step index
            batch_iter = range(max(1, sharded_data.num_windows
                                   // config.batch_size))
        elif device_data is not None:
            perm = np.random.default_rng(
                (config.seed, epoch)).permutation(len(train_ds))
            n_steps = max(1, perm.shape[0] // config.batch_size)
            batch_iter = (
                jnp.asarray(np.resize(
                    perm[i * config.batch_size:(i + 1) * config.batch_size],
                    config.batch_size), jnp.int32)
                for i in range(n_steps))
        else:
            batch_iter = loader.epoch(seed=config.seed * 1_000_003 + epoch)
        for batch_idx, batch in enumerate(batch_iter):
            if (max_batches_per_epoch is not None
                    and batch_idx >= max_batches_per_epoch):
                break
            step_rng = jax.random.fold_in(rng, epoch * 1_000_000 + batch_idx)
            lrs_now = jnp.asarray(cur_lrs)
            if sharded_data is not None:
                state, metrics = step(state, step_rng, lrs_now)
            elif device_data is not None:
                state, metrics = step(state, batch, step_rng, lrs_now)
            else:
                # --host-upload-dtype bf16: inputs ship at half the bytes
                # (free for bf16-compute models — train/loop.py)
                bi = (np.asarray(batch.inputs).astype(jnp.bfloat16)
                      if config.host_upload_dtype == 'bf16'
                      else batch.inputs)
                state, metrics = step(state, bi, batch.labels,
                                      step_rng, lrs_now)
            last_train = metrics
            windows_seen += config.batch_size * k
        dl = dev_losses_now()
        if dl is None:
            logger.info('sweep epoch %d done', epoch)
            persist_grid(epoch)
            if stop_requested['flag']:
                preempted = True
                break
            continue
        dev_curves.append(dl)
        if metric_logger is not None:
            p = metric_prefix
            metric_logger.log({'epoch': epoch,
                               **{f'sweep/{p}config_{i}/dev_loss': float(v)
                                  for i, v in enumerate(dl)},
                               f'sweep/{p}best_dev_loss': float(dl.min())})
        improved = dl < best_dev
        best_epoch = np.where(improved, epoch, best_epoch)
        best_dev = np.minimum(best_dev, dl)
        # snapshot improved configs' params to host: the ranked best-dev
        # number must correspond to a SAVED artifact (best.ckpt below) —
        # final-epoch params may be worse, and under PBT the best params
        # may be overwritten by an exploit. Config-sharded states are
        # all-gathered first so every process can address every slice.
        if improved.any():
            state_rep = (gather_replicated(state, mesh) if mesh is not None
                         else state)
            for i in np.nonzero(improved)[0]:
                best_params[int(i)] = jax.tree_util.tree_map(
                    lambda x, j=int(i): np.asarray(x[j]), state_rep.params)
                if config.checkpoint_dir:
                    # write best.ckpt AT improvement time so a preempted
                    # (and resumed) sweep never loses its ranked artifact
                    lr_i, seed_i = grid[int(i)]
                    sub = os.path.join(config.checkpoint_dir,
                                       f'lr{lr_i:g}_seed{seed_i}')
                    bstate = slice_config(state_rep, int(i)).replace(
                        params=best_params[int(i)])
                    save_checkpoint(sub, bstate, int(epoch), 0,
                                    filename='best.ckpt')
        logger.info('sweep epoch %d: best dev loss %.6f (config %d)',
                    epoch, float(best_dev.min()), int(best_dev.argmin()))
        # grid-wide early stop: when NO config improved for
        # --early-stop-patience consecutive evals, more epochs will not
        # change the ranking
        stale = 0 if improved.any() else stale + 1
        if config.early_stop_patience and stale >= config.early_stop_patience:
            logger.info('sweep early stop after epoch %d: no config '
                        'improved in %d evals', epoch, stale)
            break
        # -- population-based training: exploit + explore ------------------
        if (pbt_every and k >= 2 and (len(dev_curves) % pbt_every == 0)
                and epoch + 1 < config.epochs):
            order = np.argsort(dl)                      # best loss first
            n_rep = max(1, k // 4)
            src, dst = order[:n_rep], order[-n_rep:]
            perm = np.arange(k)
            perm[dst] = src
            pj = jnp.asarray(perm)
            take = lambda x: x[pj]                      # all leaves are [K,...]
            state = state.replace(
                params=jax.tree_util.tree_map(take, state.params),
                opt_state=jax.tree_util.tree_map(take, state.opt_state))
            pbt_rng = np.random.default_rng((config.seed, 0x9b7, epoch))
            for d, s in zip(dst, src):
                factor = float(pbt_rng.choice([0.8, 1.25]))
                cur_lrs[d] = cur_lrs[s] * factor
                pbt_events.append({'epoch': int(epoch), 'winner': int(s),
                                   'replaced': int(d),
                                   'new_lr': float(cur_lrs[d])})
            logger.info('PBT at epoch %d: slots %s adopted %s (lrs now %s)',
                        epoch, dst.tolist(), src.tolist(),
                        ['%.2g' % v for v in cur_lrs])
        persist_grid(epoch)
        if stop_requested['flag']:
            preempted = True
            logger.warning('sweep preempted: grid state saved at epoch %d',
                           epoch)
            break

    # np.asarray forces the device->host readback = the only trustworthy
    # sync on this runtime (BENCH_NOTES.md measurement rules)
    train_losses = (np.asarray(last_train['loss'])
                    if last_train is not None else np.full(k, np.nan))
    elapsed = time.time() - t0

    dev_losses = dev_curves[-1] if dev_curves else None
    # rank on each config's BEST dev loss (robust to a final-epoch blip);
    # fall back to final train loss without a usable dev split
    ranking = best_dev if dev_curves else train_losses
    if mesh is not None:
        # checkpoint slicing below reads every config's leaves on every
        # process: all-gather the final state off the config sharding
        state = gather_replicated(state, mesh)
    result = SweepResult(windows_per_sec=(windows_seen / elapsed
                                          if elapsed > 0 else 0.0),
                         pbt_events=pbt_events, preempted=preempted)
    if old_handler is not None:
        try:
            _signal.signal(_signal.SIGTERM, old_handler)
        except ValueError:   # pragma: no cover
            pass
    for i, (lr, seed) in enumerate(grid):
        pt = SweepPoint(index=i, learning_rate=lr, seed=seed,
                        final_train_loss=float(train_losses[i]),
                        final_dev_loss=(float(dev_losses[i])
                                        if dev_losses is not None else None),
                        best_dev_loss=(float(best_dev[i])
                                       if dev_curves else None),
                        best_epoch=(int(best_epoch[i])
                                    if dev_curves else None),
                        dev_curve=([float(c[i]) for c in dev_curves]
                                   if dev_curves else None),
                        final_learning_rate=float(cur_lrs[i]))
        if config.checkpoint_dir:
            sub = os.path.join(config.checkpoint_dir,
                               f'lr{lr:g}_seed{seed}')
            # name by the epoch actually reached (early stop may end the
            # grid before config.epochs)
            pt.checkpoint_path = save_checkpoint(
                sub, slice_config(state, i), max(0, last_epoch), 0)
            if jax.process_index() == 0:
                # provenance sidecar with THIS config's resolved axes
                # (train/run_config.py) — consumers of a sweep artifact
                # get the same auto-fill/warnings as a train run's
                from dataclasses import replace as _replace
                from inferbiomechanics_tpu.train.run_config import (
                    save_run_config,
                )
                save_run_config(sub, _replace(config, learning_rate=lr,
                                              seed=seed,
                                              checkpoint_dir=sub))
            # best.ckpt is written at improvement time (possibly by an
            # earlier, preempted run of this same sweep)
            bpath = os.path.join(sub, 'best.ckpt')
            if os.path.exists(bpath):
                pt.best_checkpoint_path = bpath
        result.points.append(pt)
    if k and np.isfinite(ranking).any():
        result.best_index = int(np.nanargmin(ranking))
    elif k:
        result.best_index = 0   # nothing ran (e.g. --epochs 0): arbitrary
    return result
