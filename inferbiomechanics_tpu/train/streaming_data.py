"""Streaming device data: training when the dataset exceeds HBM.

Complements ``train/device_data.py`` (whole dataset resident): trials are
packed into fixed-size SEGMENTS that fit an HBM budget; each epoch visits
segments in shuffled order, uploads one segment's packed rows, and runs
all of that segment's windows as scanned train steps in one jit program
per segment (segments are padded to a common row count, so ONE compiled
executable serves every segment). Shuffling is hierarchical — segments
shuffled globally, windows shuffled within a segment — the standard
locality-constrained shuffle for out-of-core training.

Segments are materialized LAZILY, one at a time (with the next segment
prefetched on a host thread while the current one trains), so host RAM
holds O(2 segments), not the dataset: with a
``materialize_features=False`` dataset this is a true out-of-core tier —
features stay on disk (mmap) and each segment's trials are featurized on
demand (``WindowDataset.featurize_trial_features``).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from inferbiomechanics_tpu.data.dataset import WindowDataset, unpack
from inferbiomechanics_tpu.loss.evaluator import LossConfig, loss_and_metrics
from inferbiomechanics_tpu.train.state import TrainState


@dataclass
class Segment:
    """Metadata only — rows materialize via ``StreamingPlan.segment_arrays``."""
    trials: List[int]             # flat-trial ids packed into this segment
    win_base: np.ndarray          # [W_seg] window starts, segment-local rows
    n_rows: int                   # un-padded row count


class StreamingPlan:
    """Pack trials into equal-row segments under ``hbm_budget_bytes``.

    Planning is metadata-only (row counts from ``labels_all``, which every
    dataset mode materializes); feature bytes are touched only when
    ``segment_arrays`` materializes a segment.
    """

    def __init__(self, ds: WindowDataset, hbm_budget_bytes: int):
        bytes_per_row = (ds.num_input_channels + ds.num_label_channels) * 4
        budget_rows = max(1, hbm_budget_bytes // bytes_per_row)
        n_trials = ds.trial_row_offset.shape[0]
        trial_ends = np.append(ds.trial_row_offset[1:], ds.labels_all.shape[0])

        self.ds = ds
        self._trial_ends = trial_ends
        self.segments: List[Segment] = []
        cur_trials: List[int] = []
        cur_rows = 0

        def flush():
            nonlocal cur_trials, cur_rows
            if not cur_trials:
                return
            base_chunks = []
            row_off = 0
            for ti in cur_trials:
                lo, hi = int(ds.trial_row_offset[ti]), int(trial_ends[ti])
                mask = ds.win_ft == ti
                base_chunks.append(ds.win_start[mask].astype(np.int64)
                                   + row_off)
                row_off += hi - lo
            self.segments.append(Segment(
                trials=cur_trials,
                win_base=(np.concatenate(base_chunks) if base_chunks else
                          np.zeros(0, np.int64)),
                n_rows=row_off))
            cur_trials, cur_rows = [], 0

        for ti in range(n_trials):
            rows = int(trial_ends[ti]) - int(ds.trial_row_offset[ti])
            if rows > budget_rows:
                raise ValueError(
                    f'trial {ti} has {rows} rows > segment budget {budget_rows}; '
                    f'raise hbm_budget_bytes')
            if cur_rows + rows > budget_rows:
                flush()
            cur_trials.append(ti)
            cur_rows += rows
        flush()

        # common padded row count -> one compiled executable for all segments
        self.rows_pad = max((s.n_rows for s in self.segments), default=0)

    def segment_arrays(self, si: int) -> Tuple[np.ndarray, np.ndarray]:
        """Materialize segment ``si``: ([rows_pad, C_in] f32 features,
        [rows_pad, C_lab] labels), zero-padded. Features come from the
        materialized matrix when present, else per-trial on demand."""
        ds = self.ds
        seg = self.segments[si]
        feats = np.zeros((self.rows_pad, ds.num_input_channels), np.float32)
        labs = np.zeros((self.rows_pad, ds.num_label_channels), np.float32)
        row_off = 0
        for ti in seg.trials:
            lo, hi = int(ds.trial_row_offset[ti]), int(self._trial_ends[ti])
            n = hi - lo
            if ds.features_all is not None:
                feats[row_off:row_off + n] = ds.features_all[lo:hi]
            else:
                feats[row_off:row_off + n] = ds.featurize_trial_features(ti)
            labs[row_off:row_off + n] = ds.labels_all[lo:hi]
            row_off += n
        return feats, labs


def run_segmented_epoch(plan: StreamingPlan, batch_size: int, state,
                        rng, seg_fn: Callable, feature_dtype=jnp.bfloat16):
    """Shared host-side driver for one streamed epoch.

    Visits segments in shuffled order with one-ahead prefetch; per
    segment shuffles its windows into ``[n_steps, batch]`` index chunks
    and calls ``seg_fn(state, feats, labs, idx_chunks, seg_rng) ->
    (state, metrics)`` (a jitted per-segment runner). Returns
    ``(state, mean_metrics)`` with metrics averaged across segments
    (host-side numpy, matching per-batch evaluator accumulation)."""
    host_rng = np.random.default_rng(int(jax.device_get(
        jax.random.randint(rng, (), 0, 2**31 - 1))))
    order = [si for si in host_rng.permutation(len(plan.segments))
             if plan.segments[si].win_base.shape[0] >= batch_size]
    all_metrics = []
    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = (pool.submit(plan.segment_arrays, order[0])
                   if order else None)
        for k, si in enumerate(order):
            feats_np, labs_np = pending.result()
            pending = (pool.submit(plan.segment_arrays, order[k + 1])
                       if k + 1 < len(order) else None)
            seg = plan.segments[si]
            idx = host_rng.permutation(seg.win_base)
            n_steps = idx.shape[0] // batch_size
            idx = idx[:n_steps * batch_size].reshape(n_steps, batch_size)
            # cast on HOST so the transfer ships feature_dtype bytes —
            # jnp.asarray(f32).astype(bf16) uploads the full f32 matrix
            # and casts on device, paying 2x the (often tunnel-bound)
            # transfer for nothing (round-4 probe_chunked finding)
            feats = jnp.asarray(feats_np.astype(feature_dtype, copy=False))
            labs = jnp.asarray(labs_np)
            state, metrics = seg_fn(state, feats, labs,
                                    jnp.asarray(idx, jnp.int32),
                                    jax.random.fold_in(rng, int(si)))
            all_metrics.append(jax.tree_util.tree_map(np.asarray, metrics))
    mean = ({k: np.mean(np.stack([m[k] for m in all_metrics]), axis=0)
             for k in all_metrics[0]} if all_metrics else {})
    return state, mean


def make_streaming_epoch(model, ds: WindowDataset, plan: StreamingPlan,
                         loss_config: LossConfig, batch_size: int,
                         feature_dtype=jnp.bfloat16,
                         augment=None,
                         batch_shard=None) -> Callable:
    """Build ``run_epoch(state, rng) -> (state, mean_metrics)``.

    One jit program per SEGMENT shape (shared across segments); per
    segment the host uploads the padded rows once and scans that
    segment's shuffled windows. While segment i trains, segment i+1
    materializes on a prefetch thread.

    ``batch_shard``: optional ``NamedSharding`` (``parallel.
    batch_sharding(mesh)``) composing this tier with data parallelism
    (VERDICT r4 #5): the segment rows replicate across the data axis
    (each segment already fits ONE device's HBM budget — streaming's
    capacity story is unlimited dataset size through segmentation, not
    per-segment sharding) while the gathered batch and therefore the
    model compute/grad all-reduce shard across it. Batch composition is
    IDENTICAL to the single-device tier, so losses reproduce exactly
    (tests/test_streaming_dp.py). Single-controller SPMD only — the
    per-process segment materialization has no cross-process plan
    (train/loop.py rejects stream + multi-host)."""
    frames = ds.num_model_frames
    stride = ds.stride
    offs = jnp.arange(frames, dtype=jnp.int32) * stride
    last_frame = ds.output_data_format != 'all_frames'

    def seg_runner(state, feats, labs, idx_chunks, rng):
        def one(carry, idx):
            state, rng = carry
            rng, sub = jax.random.split(rng)
            rows = idx[:, None] + offs[None, :]
            bi = jnp.take(feats, rows, axis=0)
            if last_frame:
                bl = jnp.take(labs, idx[:, None] + (frames - 1) * stride, axis=0)
            else:
                bl = jnp.take(labs, rows, axis=0)
            from inferbiomechanics_tpu.train.augment import maybe_augment
            from inferbiomechanics_tpu.train.device_data import _constrain
            bi, bl = _constrain(batch_shard, bi, bl)
            bi, bl = maybe_augment(augment, bi, bl, sub)
            labels = unpack(bl, ds.lab_offsets)

            def loss_fn(params):
                outputs = model.apply({'params': params}, bi, train=True,
                                      rngs={'dropout': sub})
                loss, metrics = loss_and_metrics(outputs, labels, loss_config)
                return loss, metrics

            grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
            return (state.apply_gradients(grads=grads), rng), metrics

        (state, _), metrics = jax.lax.scan(one, (state, rng), idx_chunks)
        return state, jax.tree_util.tree_map(lambda m: m.mean(0), metrics)

    seg_runner = jax.jit(seg_runner, donate_argnums=(0,))

    def run_epoch(state: TrainState, rng: jax.Array):
        return run_segmented_epoch(plan, batch_size, state, rng, seg_runner,
                                   feature_dtype)

    # exposed so tests can lower the compiled program and assert the dp
    # gradient all-reduce is really in the HLO (tests/test_streaming_dp.py)
    run_epoch.seg_runner = seg_runner
    return run_epoch


def make_streaming_diffusion_epoch(model, ds: WindowDataset,
                                   plan: StreamingPlan, schedule,
                                   batch_size: int,
                                   ema_decay: float = 0.0,
                                   feature_dtype=jnp.bfloat16,
                                   augment=None,
                                   cond_dropout: float = 0.0,
                                   batch_shard=None) -> Callable:
    """Out-of-core diffusion training: the ε-prediction step over
    streamed segments (same segment/prefetch mechanics as
    :func:`make_streaming_epoch`; step = the DDPM objective of
    ``device_data.py::make_device_diffusion_epoch_runner``).

    ``batch_shard`` composes the tier with data parallelism exactly as
    in :func:`make_streaming_epoch` (replicated segment rows, gathered
    batch sharded over the data axis).

    ``ema_decay > 0`` threads the EMA tree through the scan — the
    signature becomes ``run(state, ema, rng) -> (state, ema, metrics)``
    like the resident runner."""
    from inferbiomechanics_tpu.models.diffusion import (
        diffusion_targets_from_labels,
    )
    if ds.output_data_format != 'all_frames':
        raise ValueError('diffusion requires all_frames labels')
    frames = ds.num_model_frames
    stride = ds.stride
    offs = jnp.arange(frames, dtype=jnp.int32) * stride

    def one(carry, idx, feats, labs):
        state, rng = carry
        rng, rng_t, rng_n = jax.random.split(rng, 3)
        rows = idx[:, None] + offs[None, :]
        bi = jnp.take(feats, rows, axis=0)
        bl = jnp.take(labs, rows, axis=0)
        from inferbiomechanics_tpu.train.augment import maybe_augment
        from inferbiomechanics_tpu.models.diffusion import drop_conditioning
        from inferbiomechanics_tpu.train.device_data import _constrain
        bi, bl = _constrain(batch_shard, bi, bl)
        bi, bl = maybe_augment(augment, bi, bl, rng_t)
        bi = drop_conditioning(bi, rng_t, cond_dropout)
        x0 = diffusion_targets_from_labels(bl, ds.lab_offsets,
                                           model.num_contact_bodies)
        t = jax.random.randint(rng_t, (idx.shape[0],), 0, schedule.timesteps)
        noise = jax.random.normal(rng_n, x0.shape, x0.dtype)
        x_t = schedule.q_sample(x0, t, noise)

        def loss_fn(params):
            eps = model.apply({'params': params}, x_t, t, bi, train=True)
            return jnp.mean((eps - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return (state, rng), {'loss': loss}

    def seg_plain(state, feats, labs, idx_chunks, rng):
        (state, _), metrics = jax.lax.scan(
            lambda c, i: one(c, i, feats, labs), (state, rng), idx_chunks)
        return state, jax.tree_util.tree_map(lambda m: m.mean(0), metrics)

    def seg_ema(state_ema, feats, labs, idx_chunks, rng):
        def body(carry, idx):
            state, ema, rng = carry
            (state, rng), metrics = one((state, rng), idx, feats, labs)
            ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                ema, state.params)
            return (state, ema, rng), metrics

        state, ema = state_ema
        (state, ema, _), metrics = jax.lax.scan(body, (state, ema, rng),
                                                idx_chunks)
        return (state, ema), jax.tree_util.tree_map(lambda m: m.mean(0),
                                                    metrics)

    if not ema_decay:
        seg_plain = jax.jit(seg_plain, donate_argnums=(0,))

        def run_epoch(state: TrainState, rng: jax.Array):
            return run_segmented_epoch(plan, batch_size, state, rng,
                                       seg_plain, feature_dtype)

        return run_epoch

    seg_ema = jax.jit(seg_ema, donate_argnums=(0,))

    def run_epoch_ema(state: TrainState, ema, rng: jax.Array):
        (state, ema), metrics = run_segmented_epoch(
            plan, batch_size, (state, ema), rng, seg_ema, feature_dtype)
        return state, ema, metrics

    return run_epoch_ema
