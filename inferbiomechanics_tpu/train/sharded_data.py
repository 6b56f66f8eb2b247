"""Pod-sharded device-resident data: HBM capacity scales with the mesh.

Completes the data-placement ladder (SURVEY.md §2.10 / §3.5 — the
reference's only distributed data story is DistributedSampler shards,
train.py:143-150):

- ``train/device_data.py``   — dataset fits ONE chip's HBM (replicated)
- **this module**            — dataset fits the POD's combined HBM:
  trials are partitioned across the mesh's ``data`` axis, each shard
  holds only its slice, and every training batch is sampled and
  gathered SHARD-LOCALLY via ``shard_map`` — zero cross-chip data
  movement; only the gradient psum rides ICI (inserted by GSPMD, since
  the gathered batch comes back batch-sharded).
- ``train/streaming_data.py`` — dataset exceeds even the pod: host
  streams trial segments.

Sampling semantics are the reference's DistributedSampler (each rank
draws from its own fixed shard, train.py:143-150): per step every shard
draws ``batch_size / n_shards`` windows uniformly from its local window
table. Trials are assigned to shards by greedy longest-processing-time
balancing, so shard row counts differ by at most one trial.

Multi-host: construction is PROCESS-LOCAL. Each process materializes
feature/label blocks only for the shards its devices own (ownership read
off the sharding's device→index map) and ``make_array_from_callback``
fills its addressable shards from them. With a
``materialize_features=False`` dataset the owned trials are featurized
on demand (``WindowDataset.featurize_trial_features``), so HOST RAM
scales with the process count the same way HBM scales with the mesh —
no host ever holds the full feature matrix.
"""

from __future__ import annotations

from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from inferbiomechanics_tpu.data.dataset import WindowDataset, unpack
from inferbiomechanics_tpu.loss.evaluator import LossConfig, loss_and_metrics
from inferbiomechanics_tpu.parallel.mesh import DATA_AXIS
from inferbiomechanics_tpu.train.state import TrainState

try:                                    # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:                     # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def partition_trials(ds: WindowDataset, n_shards: int) -> List[List[int]]:
    """Greedy LPT assignment of trials to shards, balanced by row count.

    Every shard must end up with at least one window; raises otherwise
    (use the replicated tier for datasets with fewer trials than
    shards).
    """
    n_trials = int(ds.trial_row_offset.shape[0])
    if n_trials < n_shards:
        raise ValueError(f'{n_trials} trials < {n_shards} shards; use the '
                         f'replicated device-data tier')
    # labels_all is materialized in every dataset mode; use it for the
    # row count so partitioning stays metadata-only under
    # materialize_features=False
    trial_ends = np.append(ds.trial_row_offset[1:], ds.labels_all.shape[0])
    rows = trial_ends - ds.trial_row_offset                     # [n_trials]
    order = np.argsort(rows)[::-1]                              # LPT
    loads = np.zeros(n_shards, np.int64)
    shards: List[List[int]] = [[] for _ in range(n_shards)]
    for ti in order:
        s = int(np.argmin(loads))
        shards[s].append(int(ti))
        loads[s] += int(rows[ti])
    for s, trials in enumerate(shards):
        if not any(np.any(ds.win_ft == ti) for ti in trials):
            raise ValueError(f'shard {s} has no windows; dataset too small '
                             f'for {n_shards} shards')
    return shards


class ShardedDeviceData:
    """Per-shard packed blocks, stacked [S, rows_pad, C] and sharded on
    the mesh's ``data`` axis — each device stores only its slice."""

    def __init__(self, ds: WindowDataset, mesh: Mesh,
                 feature_dtype=jnp.bfloat16):
        n_shards = S = int(mesh.shape[DATA_AXIS])
        shards = partition_trials(ds, n_shards)
        trial_ends = np.append(ds.trial_row_offset[1:],
                               ds.labels_all.shape[0])
        C_in = ds.num_input_channels
        C_lab = ds.num_label_channels

        # -- metadata for ALL shards (cheap; no feature bytes touched) ------
        rows_per_trial = trial_ends - ds.trial_row_offset
        shard_rows = [int(sum(rows_per_trial[ti] for ti in trials))
                      for trials in shards]
        base_blocks, global_blocks = [], []
        for trials in shards:
            row_off = 0
            bases, gids = [], []
            for ti in trials:
                mask = ds.win_ft == ti
                bases.append(ds.win_start[mask].astype(np.int64) + row_off)
                gids.append(np.nonzero(mask)[0])
                row_off += int(rows_per_trial[ti])
            base_blocks.append(np.concatenate(bases))
            global_blocks.append(np.concatenate(gids))
        rows_pad = max(shard_rows)
        win_pad = max(b.shape[0] for b in base_blocks)
        cnt = np.asarray([b.shape[0] for b in base_blocks], np.int32)
        self.win_global = np.zeros((S, win_pad), np.int64)   # host-side map
        base = np.zeros((S, win_pad), np.int32)
        for s in range(S):
            w = base_blocks[s].shape[0]
            base[s, :w] = base_blocks[s]
            self.win_global[s, :w] = global_blocks[s]

        # -- ownership: materialize feature/label blocks ONLY for the
        # shards on this process's devices. With materialize_features=False
        # datasets, each owned trial is featurized on demand
        # (WindowDataset.featurize_trial_features), so HOST RAM scales
        # with the process count like device HBM scales with the mesh. --
        shard_sharding = NamedSharding(mesh, P(DATA_AXIS))
        dev_map = shard_sharding.devices_indices_map((S, rows_pad, C_in))
        owned = sorted({
            int(idx[0].start or 0)
            for dev, idx in dev_map.items()
            if dev.process_index == jax.process_index()})

        def trial_features(ti: int) -> np.ndarray:
            if ds.features_all is not None:
                lo, hi = int(ds.trial_row_offset[ti]), int(trial_ends[ti])
                return ds.features_all[lo:hi]
            return ds.featurize_trial_features(ti)

        blocks = {}                          # s -> (feat_pad, lab_pad)
        for s in owned:
            feat_s = np.zeros((rows_pad, C_in), feature_dtype)
            lab_s = np.zeros((rows_pad, C_lab), np.float32)
            row_off = 0
            for ti in shards[s]:
                lo, hi = int(ds.trial_row_offset[ti]), int(trial_ends[ti])
                n = hi - lo
                feat_s[row_off:row_off + n] = \
                    trial_features(ti).astype(feature_dtype)
                lab_s[row_off:row_off + n] = ds.labels_all[lo:hi]
                row_off += n
            blocks[s] = (feat_s, lab_s)

        # -- global device arrays: each process's callbacks see only its
        # addressable shards, so `blocks` never needs the others ----------
        def from_blocks(shape, dtype, pick):
            def cb(idx):
                s = int(idx[0].start or 0)
                # np.asarray is a no-copy view when the dtype already
                # matches (blocks are built in their final dtype) — an
                # astype here would transiently double each shard's host
                # footprint during upload
                return np.asarray(pick(s), dtype)[None]
            return jax.make_array_from_callback(shape, shard_sharding, cb)

        self.features = from_blocks((S, rows_pad, C_in), feature_dtype,
                                    lambda s: blocks[s][0])
        self.labels = from_blocks((S, rows_pad, C_lab), np.float32,
                                  lambda s: blocks[s][1])
        self.win_base = jax.make_array_from_callback(
            (S, win_pad), shard_sharding,
            lambda idx: base[idx])                           # [S, W_pad]
        self.win_count = jax.make_array_from_callback(
            (S,), shard_sharding, lambda idx: cnt[idx])      # [S]
        self.mesh = mesh
        self.num_shards = S
        self.num_windows = int(cnt.sum())
        self.window_size = ds.window_size
        self.stride = ds.stride
        self.num_model_frames = ds.num_model_frames
        self.output_data_format = ds.output_data_format
        self.lab_offsets = ds.lab_offsets
        # per-device HBM cost = ONE shard's slice (the scaling claim)
        itemsize = np.dtype(feature_dtype).itemsize
        self.hbm_bytes_per_device = (rows_pad * C_in * itemsize
                                     + rows_pad * C_lab * 4
                                     + win_pad * 4)


def _local_gather(sdata: ShardedDeviceData):
    """Shard-local gather of explicit per-shard window indices.

    Returns ``gather(feats, labs, base, sel) -> (inputs, labels)`` to be
    wrapped in shard_map: all block args arrive as this shard's [1, ...]
    slice; ``sel`` is [1, B_local] local window ids.
    """
    T, stride = sdata.num_model_frames, sdata.stride
    offs = np.arange(T, dtype=np.int32) * stride
    last_frame = sdata.output_data_format != 'all_frames'

    def gather(feats, labs, base, sel):
        b = base[0, sel[0]]                                  # [B_local]
        rows = b[:, None] + offs[None, :]
        bi = feats[0][rows]                                  # [B_local,T,C]
        if last_frame:
            bl = labs[0][b + (T - 1) * stride][:, None]      # [B_local,1,C]
        else:
            bl = labs[0][rows]
        return bi, bl

    return gather


def make_sharded_diffusion_epoch_runner(model, sdata: ShardedDeviceData,
                                        schedule, batch_size: int,
                                        steps_per_call: int = 0,
                                        ema_decay: float = 0.0,
                                        augment=None,
                                        cond_dropout: float = 0.0) -> Callable:
    """Pod-sharded diffusion training: ``run(state[, ema], rng)``.

    Same shape as :func:`make_sharded_epoch_runner` but the step is the
    DDPM ε-prediction objective (models/diffusion.py): shard-local
    sample+gather, q_sample the all-frames targets, regress the noise;
    GSPMD inserts the gradient all-reduce. ``ema_decay > 0`` threads the
    EMA tree through the scan like the device-resident runner
    (device_data.py::make_device_diffusion_epoch_runner).
    """
    from inferbiomechanics_tpu.models.diffusion import (
        diffusion_targets_from_labels,
    )
    if sdata.output_data_format != 'all_frames':
        raise ValueError('diffusion requires all_frames labels')
    n_steps = steps_per_call or sdata.num_windows // batch_size
    if n_steps == 0:
        raise ValueError(f'dataset has {sdata.num_windows} windows < '
                         f'batch_size {batch_size}')
    sample_gather = make_sharded_sample_gather(sdata, batch_size)

    def make_one(feats, labs, base, cnt):
        # the sharded blocks travel as jit ARGUMENTS (multi-host jit
        # rejects closures over non-addressable arrays), so the step
        # closure is built inside the traced run_epoch
        def one(carry, _):
            state, rng = carry
            rng, s_rng, t_rng, n_rng = jax.random.split(rng, 4)
            batch_inputs, batch_labels = sample_gather(feats, labs, base,
                                                       cnt, s_rng)
            from inferbiomechanics_tpu.train.augment import maybe_augment
            from inferbiomechanics_tpu.models.diffusion import (
                drop_conditioning,
            )
            batch_inputs, batch_labels = maybe_augment(
                augment, batch_inputs, batch_labels, t_rng)
            batch_inputs = drop_conditioning(batch_inputs, t_rng,
                                             cond_dropout)
            x0 = diffusion_targets_from_labels(
                batch_labels, sdata.lab_offsets, model.num_contact_bodies)
            t = jax.random.randint(t_rng, (batch_size,), 0,
                                   schedule.timesteps)
            noise = jax.random.normal(n_rng, x0.shape, x0.dtype)
            x_t = schedule.q_sample(x0, t, noise)

            def loss_fn(params):
                eps = model.apply({'params': params}, x_t, t, batch_inputs,
                                  train=True)
                return jnp.mean((eps - noise) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            state = state.apply_gradients(grads=grads)
            return (state, rng), {'loss': loss}
        return one

    if not ema_decay:
        def run_epoch(state: TrainState, rng: jax.Array,
                      feats, labs, base, cnt):
            one = make_one(feats, labs, base, cnt)
            (state, _), metrics = jax.lax.scan(one, (state, rng), None,
                                               length=n_steps)
            return state, jax.tree_util.tree_map(lambda m: m.mean(0),
                                                 metrics)

        jitted = jax.jit(run_epoch, donate_argnums=(0,))

        def run(state: TrainState, rng: jax.Array):
            return jitted(state, rng, sdata.features, sdata.labels,
                          sdata.win_base, sdata.win_count)

        return run

    def run_epoch_ema(state: TrainState, ema, rng: jax.Array,
                      feats, labs, base, cnt):
        one = make_one(feats, labs, base, cnt)

        def one_ema(carry, _):
            state, ema, rng = carry
            (state, rng), metrics = one((state, rng), None)
            ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                ema, state.params)
            return (state, ema, rng), metrics

        (state, ema, _), metrics = jax.lax.scan(one_ema, (state, ema, rng),
                                                None, length=n_steps)
        return state, ema, jax.tree_util.tree_map(lambda m: m.mean(0),
                                                  metrics)

    jitted_ema = jax.jit(run_epoch_ema, donate_argnums=(0, 1))

    def run_ema(state: TrainState, ema, rng: jax.Array):
        return jitted_ema(state, ema, rng, sdata.features, sdata.labels,
                          sdata.win_base, sdata.win_count)

    return run_ema


def gather_by_local_indices(sdata: ShardedDeviceData, sel: np.ndarray):
    """Test/debug entry: gather explicit [S, B_local] shard-local window
    ids into a global batch-sharded ``(inputs [B,T,C], labels)``."""
    gather = _local_gather(sdata)
    fn = _shard_map(gather, mesh=sdata.mesh,
                    in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                              P(DATA_AXIS)),
                    out_specs=(P(DATA_AXIS), P(DATA_AXIS)))
    sel_dev = jax.device_put(np.asarray(sel, np.int32),
                             NamedSharding(sdata.mesh, P(DATA_AXIS)))
    return jax.jit(fn)(sdata.features, sdata.labels, sdata.win_base, sel_dev)


def make_sharded_sample_gather(sdata: ShardedDeviceData,
                               batch_size: int) -> Callable:
    """``sample_gather(feats, labs, base, cnt, rng) -> (inputs, labels)``
    — each shard samples ``batch_size/S`` windows uniformly from its
    local table and gathers them locally (DistributedSampler semantics);
    the result is the global batch, sharded on the data axis."""
    S = sdata.num_shards
    if batch_size % S != 0:
        raise ValueError(f'batch_size {batch_size} not divisible by '
                         f'{S} shards')
    b_local = batch_size // S
    gather = _local_gather(sdata)

    def sample_gather(feats, labs, base, cnt, rng):
        # per-shard rng stream: fold the step key by the shard index
        r = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        sel = jax.random.randint(r, (1, b_local), 0, cnt[0], dtype=jnp.int32)
        return gather(feats, labs, base, sel)

    return _shard_map(
        sample_gather, mesh=sdata.mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)))


def make_sharded_epoch_runner(model, sdata: ShardedDeviceData,
                              loss_config: LossConfig,
                              batch_size: int,
                              steps_per_call: int = 0,
                              grad_allreduce_dtype=None,
                              augment=None) -> Callable:
    """``run_epoch(state, rng) -> (state, mean_metrics)``.

    One jit program scans ``num_windows // batch_size`` steps (or
    ``steps_per_call`` if given); each step every shard samples its
    ``batch_size / S`` windows uniformly from its local table
    (DistributedSampler semantics) and gathers them locally; the model
    step then runs on the batch-sharded result with GSPMD inserting the
    gradient all-reduce.

    ``grad_allreduce_dtype`` (e.g. bf16): the per-step work moves INSIDE
    one shard_map — shard-local sample+gather+forward+backward, then the
    single cross-chip collective is an explicit psum in the reduced
    dtype (train/step.py::lowp_allreduce_grads rationale). Batchnorm
    models are the caller's responsibility to reject.
    """
    S = sdata.num_shards
    n_steps = steps_per_call or sdata.num_windows // batch_size
    if n_steps == 0:
        raise ValueError(f'dataset has {sdata.num_windows} windows < '
                         f'batch_size {batch_size}')
    sample_gather = make_sharded_sample_gather(sdata, batch_size)

    if grad_allreduce_dtype is not None:
        if batch_size % S:
            raise ValueError(f'batch_size {batch_size} not divisible by '
                             f'{S} shards')
        b_local = batch_size // S
        gather = _local_gather(sdata)
        rd = jnp.dtype(grad_allreduce_dtype)
        if hasattr(jax.lax, 'pcast'):
            def to_varying(x):
                return jax.lax.pcast(x, DATA_AXIS, to='varying')
        else:                                   # pragma: no cover - old jax
            def to_varying(x):
                return jax.lax.pvary(x, (DATA_AXIS,))

        def shard_grads(params, feats, labs, base, cnt, s_rng, d_rng):
            shard = jax.lax.axis_index(DATA_AXIS)
            sel = jax.random.randint(jax.random.fold_in(s_rng, shard),
                                     (1, b_local), 0, cnt[0],
                                     dtype=jnp.int32)
            bi, bl = gather(feats, labs, base, sel)
            d_rng = jax.random.fold_in(d_rng, shard)
            from inferbiomechanics_tpu.train.augment import maybe_augment
            bi, bl = maybe_augment(augment, bi, bl, d_rng)
            labels = unpack(bl, sdata.lab_offsets)
            # device-varying params: the replicated-input cotangent rule
            # would otherwise auto-psum in f32 (step.py rationale)
            params = jax.tree_util.tree_map(to_varying, params)

            def loss_fn(p):
                outputs = model.apply({'params': p}, bi, train=True,
                                      rngs={'dropout': d_rng})
                return loss_and_metrics(outputs, labels, loss_config)

            grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
            grads = jax.tree_util.tree_map(
                lambda g: (jax.lax.psum(g.astype(rd), DATA_AXIS)
                           .astype(g.dtype) / S), grads)
            metrics = jax.tree_util.tree_map(
                lambda m: jax.lax.pmean(m, DATA_AXIS), metrics)
            return grads, metrics

        shard_grads = _shard_map(
            shard_grads, mesh=sdata.mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS), P(), P()),
            out_specs=(P(), P()))

    # the sharded blocks must be jit ARGUMENTS, not closure constants:
    # multi-host jit rejects closing over arrays that span non-addressable
    # devices (each process only holds its own shards)
    def run_epoch(state: TrainState, rng: jax.Array,
                  feats, labs, base, cnt):
        def one(carry, _):
            state, rng = carry
            rng, s_rng, d_rng = jax.random.split(rng, 3)
            if grad_allreduce_dtype is not None:
                grads, metrics = shard_grads(state.params, feats, labs,
                                             base, cnt, s_rng, d_rng)
                state = state.apply_gradients(grads=grads)
                return (state, rng), metrics
            batch_inputs, batch_labels = sample_gather(feats, labs, base,
                                                       cnt, s_rng)
            from inferbiomechanics_tpu.train.augment import maybe_augment
            batch_inputs, batch_labels = maybe_augment(
                augment, batch_inputs, batch_labels, d_rng)
            labels = unpack(batch_labels, sdata.lab_offsets)

            def loss_fn(params):
                outputs = model.apply({'params': params}, batch_inputs,
                                      train=True, rngs={'dropout': d_rng})
                loss, metrics = loss_and_metrics(outputs, labels, loss_config)
                return loss, metrics

            grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            return (state, rng), metrics

        (state, _), metrics = jax.lax.scan(one, (state, rng), None,
                                           length=n_steps)
        return state, jax.tree_util.tree_map(lambda m: m.mean(0), metrics)

    jitted = jax.jit(run_epoch, donate_argnums=(0,))

    def run(state: TrainState, rng: jax.Array):
        return jitted(state, rng, sdata.features, sdata.labels,
                      sdata.win_base, sdata.win_count)

    return run
