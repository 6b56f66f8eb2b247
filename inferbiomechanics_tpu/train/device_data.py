"""Device-resident data path: window assembly inside the train step.

TPU-first design: when the packed feature/label matrices fit in HBM
(45 MB per 64k frames at 177 channels — a v5e chip holds hours of
motion), the whole dataset is ``device_put`` once and every training
batch is gathered ON DEVICE inside the jitted step. Per-step
host→device traffic drops from the full batch (tens of MB) to one
``[B]`` int32 index vector, eliminating the host data bottleneck the
reference suffered (SURVEY.md §3.5) entirely instead of merely hiding
it behind prefetch.

On a data-parallel mesh the matrices are replicated (they're small) and
the gathered batch is resharded across the data axis by XLA; for
datasets larger than HBM, fall back to the PrefetchLoader host path.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from inferbiomechanics_tpu.data.dataset import WindowDataset, unpack
from inferbiomechanics_tpu.loss.evaluator import LossConfig, loss_and_metrics
from inferbiomechanics_tpu.train.state import TrainState


class DeviceResidentData:
    """The dataset's packed arrays + window table, resident in HBM."""

    def __init__(self, ds: WindowDataset, sharding=None,
                 feature_dtype=jnp.bfloat16, label_upload_dtype=None,
                 pack_windows: bool = False):
        """``feature_dtype=bfloat16`` halves HBM footprint and gather
        bandwidth; models cast inputs to bf16 anyway so compute is
        unchanged. Labels stay float32 (loss runs in f32).

        ``pack_windows=True`` additionally materializes a WINDOW-MAJOR
        copy of the features on device ([num_windows, T*C_in]): the
        per-step batch gather becomes ONE take of B contiguous ~3.5 KB
        rows instead of B*T scattered ~350 B rows. Measured on v5e this
        removes the gather from the step entirely (0.60 -> 0.39 ms/step
        on the feedforward headline, scripts/probe_gather.py). Costs
        ~window/stride x the frame-major features in HBM (overlapping
        windows share frames), so it is gated by the train loop's HBM
        budget; packing runs ON DEVICE (one jitted take) — upload
        traffic is unchanged.

        All dtype narrowing happens ON HOST before the transfer — the
        axon tunnel moves bytes at ~10 MB/s on a good day (CLAUDE.md),
        so uploading f32 and casting on device doubles startup time.
        ``label_upload_dtype`` (e.g. ``jnp.bfloat16``) additionally
        ships labels narrow and widens them back to f32 on device —
        resident arrays and gather cost are unchanged, only label
        precision is reduced (~3 decimal digits); used by bench.py.

        Multi-host: every process must construct this from the SAME
        dataset files (replicated data plane); global arrays are built
        from process-local copies."""
        if sharding is not None and jax.process_count() > 1:
            put = lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        elif sharding is not None:
            put = lambda x: jax.device_put(x, sharding)
        else:
            put = jax.device_put
        feat_np = np.asarray(ds.features_all).astype(feature_dtype)
        self.features_all = put(feat_np)
        if label_upload_dtype is not None:
            lab_np = np.asarray(ds.labels_all).astype(label_upload_dtype)
            self.labels_all = put(lab_np).astype(jnp.float32)
        else:
            lab_np = np.asarray(ds.labels_all)
            self.labels_all = put(lab_np)
        self.upload_bytes = feat_np.nbytes + lab_np.nbytes
        base = ds.trial_row_offset[ds.win_ft] + ds.win_start
        self.win_base = put(jnp.asarray(base, jnp.int32))
        self._adopt_window_metadata(ds, base)
        self.hbm_bytes = (ds.features_all.nbytes + ds.labels_all.nbytes +
                          base.nbytes)
        if pack_windows:
            self._pack_windows(sharding)

    def _adopt_window_metadata(self, ds: WindowDataset,
                               base: np.ndarray) -> None:
        """Dataset-shape metadata shared by every constructor (the
        runners read these; subclasses MUST go through here so a new
        field can't silently go missing on one of them)."""
        self.num_windows = int(base.shape[0])
        self.window_size = ds.window_size
        self.stride = ds.stride
        self.num_model_frames = ds.num_model_frames
        self.output_data_format = ds.output_data_format
        self.lab_offsets = ds.lab_offsets
        self.features_packed = None
        self.labels_packed = None

    def _pack_windows(self, sharding=None) -> None:
        """Materialize the window-major copies on device (features
        always; labels too in all_frames mode, where they are gathered
        per frame like the features). The row-index matrix is built
        INSIDE the jit from the resident window table — no host
        round-trip, no uploaded index constant."""

        def pack(mat, base):
            # exactly num_model_frames frames per window, matching the
            # host gather / reference readFrames(n=window//stride)
            offs = jnp.arange(self.num_model_frames, dtype=base.dtype) * self.stride
            rows = base[:, None] + offs[None, :]
            g = jnp.take(mat, rows, axis=0)           # [N, T, C]
            return g.reshape(g.shape[0], -1)          # [N, T*C]

        packer = (jax.jit(pack, out_shardings=sharding) if sharding is not None
                  else jax.jit(pack))
        self.features_packed = packer(self.features_all, self.win_base)
        self.hbm_bytes += self.features_packed.nbytes
        if self.output_data_format == 'all_frames':
            self.labels_packed = packer(self.labels_all, self.win_base)
            self.hbm_bytes += self.labels_packed.nbytes

    @staticmethod
    def packed_bytes_estimate(ds: WindowDataset,
                              feature_dtype=jnp.bfloat16) -> int:
        """HBM cost of ``pack_windows=True`` for this dataset (without
        building anything) — used by the train loop's auto gate."""
        n_windows = int(ds.win_start.shape[0])
        c_in = int(ds.features_all.shape[1])
        itemsize = jnp.dtype(feature_dtype).itemsize
        per_window = ds.num_model_frames * c_in * itemsize
        if ds.output_data_format == 'all_frames':
            per_window += (ds.num_model_frames * int(ds.labels_all.shape[1])
                           * 4)   # labels stay float32
        return n_windows * per_window

    def gather_in_jit(self, idx: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """[B] window indices -> (inputs [B,W,C_in], labels [B,F,C_lab]).
        Traced code — call inside a jitted function."""
        base = self.win_base[idx]                                # [B]
        # num_model_frames = window_size // stride frames per window
        # (reference readFrames semantics; arange(0, W, s) would take an
        # EXTRA frame whenever stride does not divide window_size and
        # disagree with the packed copy / host gather)
        offs = jnp.arange(self.num_model_frames, dtype=jnp.int32) * self.stride
        rows = base[:, None] + offs[None, :]
        if self.features_packed is not None:
            flat = jnp.take(self.features_packed, idx, axis=0)   # [B, T*C]
            inputs = flat.reshape(idx.shape[0], self.num_model_frames, -1)
        else:
            inputs = jnp.take(self.features_all, rows, axis=0)
        if self.output_data_format == 'all_frames':
            if self.labels_packed is not None:
                flat = jnp.take(self.labels_packed, idx, axis=0)
                labels = flat.reshape(idx.shape[0], self.num_model_frames, -1)
            else:
                labels = jnp.take(self.labels_all, rows, axis=0)
        else:
            last = base + (self.num_model_frames - 1) * self.stride
            labels = jnp.take(self.labels_all, last[:, None], axis=0)
        return inputs, labels


class TiledDeviceData(DeviceResidentData):
    """DeviceResidentData built from a SMALL uploaded seed, tiled on device.

    The axon tunnel's host→device bandwidth is unreliable (observed from
    10 MB/s down to ~7 KB/s), so benchmarks that upload the full packed
    dataset can blow any time budget before measuring anything (the
    round-1/2 null-bench root cause). This variant ships only the first
    ``seed_rows`` frames (~300 KB) plus the window table and repeats
    them on device to the full row count: every gather/train step does
    identical work on real-data statistics, only the frame contents
    repeat with period ``seed_rows``. For benchmarking and smoke runs —
    real training uses :class:`DeviceResidentData`.
    """

    def __init__(self, ds: WindowDataset, seed_rows: int = 1000,
                 feature_dtype=jnp.bfloat16, pack_windows: bool = False):
        rows = int(ds.features_all.shape[0])
        seed_rows = min(seed_rows, rows)
        feat = np.asarray(ds.features_all[:seed_rows]).astype(feature_dtype)
        lab = np.asarray(ds.labels_all[:seed_rows]).astype(jnp.bfloat16)
        base = np.asarray(ds.trial_row_offset[ds.win_ft] + ds.win_start,
                          np.int32)
        reps = -(-rows // seed_rows)
        self.features_all = jnp.tile(jax.device_put(feat), (reps, 1))[:rows]
        self.labels_all = jnp.tile(jax.device_put(lab),
                                   (reps, 1))[:rows].astype(jnp.float32)
        self.win_base = jax.device_put(base)
        self._adopt_window_metadata(ds, base)
        self.upload_bytes = feat.nbytes + lab.nbytes + base.nbytes
        self.hbm_bytes = (self.features_all.nbytes + self.labels_all.nbytes
                          + base.nbytes)
        if pack_windows:
            self._pack_windows()


def _constrain(batch_shard, *arrays):
    """Pin the gathered batch's SPMD sharding to the data axis.

    The resident matrices are replicated and the index vector may arrive
    replicated too; without an explicit constraint GSPMD is free to keep
    the whole step replicated — every device computing the FULL batch,
    i.e. zero data-parallel speedup on a multi-chip mesh. Constraining
    the gather output forces the batch split (and the gradient psum)
    XLA's propagation would otherwise not owe us."""
    if batch_shard is None:
        return arrays if len(arrays) > 1 else arrays[0]
    out = tuple(jax.lax.with_sharding_constraint(a, batch_shard)
                for a in arrays)
    return out if len(out) > 1 else out[0]


def make_device_train_step(model, data: DeviceResidentData,
                           loss_config: LossConfig,
                           donate: bool = True,
                           batch_shard=None,
                           grad_accum: int = 1,
                           grad_allreduce_dtype=None,
                           mesh=None,
                           augment=None) -> Callable:
    """``step(state, idx, rng) -> (state, metrics)`` — gather fused in.

    ``batch_shard``: optional ``NamedSharding`` (e.g.
    ``parallel.batch_sharding(mesh)``) pinning the gathered batch onto
    the data axis; pass it on any multi-device mesh. Multi-host callers
    must ALSO ship ``idx`` as a global array
    (``parallel.shard_batch(mesh, idx)``) — a plain per-process numpy
    vector is treated as replicated, and differing per-process values
    silently diverge the replicated parameters.

    ``grad_accum > 1`` splits ``idx`` into that many microbatches and
    gathers each INSIDE the accumulation scan — neither the full batch
    nor its activations ever materialize, so the effective batch is
    bounded by HBM left over after the resident dataset, not by the
    activation footprint.

    ``grad_allreduce_dtype`` (e.g. ``jnp.bfloat16``, requires ``mesh``)
    switches the step to an explicit-collective ``shard_map`` over the
    data axis: each shard computes its local gradient, the cross-device
    reduction runs as a ``psum`` in the reduced dtype (halving the ICI
    bytes of data-parallel training's dominant collective), and the
    mean is finished in the parameter dtype. GSPMD cannot express this
    — its implicit all-reduce inherits the gradient dtype. Models with
    batchnorm are rejected (running stats would need their own
    cross-shard reduction)."""

    def loss_for_builder(state, mutable, shard=batch_shard):
        def loss_for(params, bstats, idx, _labels_unused, rng):
            from inferbiomechanics_tpu.train.augment import maybe_augment
            batch_inputs, batch_labels = data.gather_in_jit(idx)
            batch_inputs, batch_labels = _constrain(shard, batch_inputs,
                                                    batch_labels)
            batch_inputs, batch_labels = maybe_augment(
                augment, batch_inputs, batch_labels, rng)
            labels = unpack(batch_labels, data.lab_offsets)
            variables = {'params': params}
            if bstats:
                variables['batch_stats'] = bstats
            if mutable:
                outputs, new_ms = model.apply(variables, batch_inputs,
                                              train=True,
                                              rngs={'dropout': rng},
                                              mutable=mutable)
            else:
                outputs = model.apply(variables, batch_inputs, train=True,
                                      rngs={'dropout': rng})
                new_ms = {}
            loss, metrics = loss_and_metrics(outputs, labels, loss_config)
            return loss, (metrics, new_ms)
        return loss_for

    if grad_allreduce_dtype is not None:
        if mesh is None:
            raise ValueError('grad_allreduce_dtype requires the mesh')
        from inferbiomechanics_tpu.train.step import lowp_allreduce_grads

        def step_lowp(state: TrainState, idx: jax.Array,
                      dropout_rng: jax.Array):
            if state.batch_stats:
                raise ValueError('--grad-allreduce-dtype does not support '
                                 'batchnorm models (running stats would '
                                 'need their own cross-shard reduction)')
            # no GSPMD constraint inside the manual shard_map region —
            # the in_specs already pin the batch split. The index vector
            # stands in for the batch; the zero-width placeholder fills
            # loss_for's (ignored) labels slot.
            loss_for = loss_for_builder(state, [], shard=None)
            grads, metrics = lowp_allreduce_grads(
                state, loss_for,
                (idx, jnp.zeros((idx.shape[0], 0), jnp.float32)),
                dropout_rng, mesh, grad_allreduce_dtype, grad_accum)
            return state.apply_gradients(grads=grads), metrics

        return jax.jit(step_lowp, donate_argnums=(0,) if donate else ())

    def step(state: TrainState, idx: jax.Array, dropout_rng: jax.Array):
        mutable = ['batch_stats'] if state.batch_stats else []
        loss_for = loss_for_builder(state, mutable)
        if grad_accum > 1:
            from inferbiomechanics_tpu.train.step import accumulate_grads
            # the index vector stands in for the batch: it reshapes to
            # [A, B/A] and each microbatch gathers its own rows in-scan
            grads, metrics, bstats = accumulate_grads(
                state, idx, jnp.zeros((idx.shape[0], 0), jnp.float32),
                dropout_rng, grad_accum, loss_for)
        else:
            grads, (metrics, new_ms) = jax.grad(loss_for, has_aux=True)(
                state.params, state.batch_stats, idx, None, dropout_rng)
            bstats = new_ms['batch_stats'] if mutable else state.batch_stats
        state = state.apply_gradients(grads=grads)
        if mutable:
            state = state.replace(batch_stats=bstats)
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_device_chunked_step(model, data: DeviceResidentData,
                             loss_config: LossConfig,
                             chunk_steps: int,
                             donate: bool = True,
                             grad_accum: int = 1,
                             batch_shard=None,
                             augment=None) -> Callable:
    """Chunked device-tier dispatch: ``chunk(state, idx [K,B], rngs [K])
    -> (state, stacked per-step metrics)``.

    The per-step device tier pays one program dispatch + one [B] index
    upload per batch — ~2-7 ms of overhead per ~0.23 ms of compute on
    the dev runtime (probe_batch_scaling.py), the difference between
    ~0.2M and 17.5M windows/s. Scanning K steps per dispatch ships the
    SAME index bytes in one transfer and amortizes the dispatch by K,
    with numerics bitwise-identical to K ``make_device_train_step``
    calls (same step body, same per-step RNG keys)."""
    per_step = make_device_train_step(model, data, loss_config,
                                      donate=False, grad_accum=grad_accum,
                                      batch_shard=batch_shard,
                                      augment=augment)

    def chunk(state: TrainState, idx_kb: jax.Array, rngs: jax.Array):
        def body(s, xs):
            idx, r = xs
            return per_step(s, idx, r)

        return jax.lax.scan(body, state, (idx_kb, rngs))

    del chunk_steps  # shape comes from the [K, B] index array itself
    return jax.jit(chunk, donate_argnums=(0,) if donate else ())


def make_device_epoch_step(model, data: DeviceResidentData,
                           loss_config: LossConfig,
                           batch_size: int,
                           steps_per_call: int = 8,
                           sample_windows: bool = False,
                           batch_shard=None,
                           augment=None) -> Callable:
    """``run(state, idx_chunk [K,B], rng) -> (state, mean_metrics)``.

    Rolls ``steps_per_call`` train steps into ONE jit program with
    ``lax.scan`` — amortizing per-step dispatch overhead; with the data
    already in HBM there is nothing for the host to do between steps.

    With ``sample_windows=True`` the signature becomes
    ``run(state, rng) -> (state, mean_metrics)`` and the window indices
    are drawn uniformly (with replacement) ON DEVICE from
    ``data.num_windows``. Host-supplied index chunks cost
    ``K*B*4`` bytes of host→device transfer per call — over the slow
    axon tunnel (~10-20 MB/s, CLAUDE.md) that shipping alone halved the
    measured bench throughput; in-program sampling makes the steady
    state transfer-free.
    """

    def one(carry, xs):
        from inferbiomechanics_tpu.train.augment import maybe_augment
        state, rng = carry
        idx = xs
        rng, sub = jax.random.split(rng)
        batch_inputs, batch_labels = data.gather_in_jit(idx)
        batch_inputs, batch_labels = _constrain(batch_shard, batch_inputs,
                                                batch_labels)
        batch_inputs, batch_labels = maybe_augment(augment, batch_inputs,
                                                   batch_labels, sub)
        labels = unpack(batch_labels, data.lab_offsets)

        def loss_fn(params):
            outputs = model.apply({'params': params}, batch_inputs,
                                  train=True, rngs={'dropout': sub})
            loss, metrics = loss_and_metrics(outputs, labels, loss_config)
            return loss, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return (state, rng), metrics

    def run(state: TrainState, idx_chunk: jax.Array, rng: jax.Array):
        (state, _), metrics = jax.lax.scan(one, (state, rng), idx_chunk)
        return state, jax.tree_util.tree_map(lambda m: m.mean(0), metrics)

    if sample_windows:
        def run_sampled(state: TrainState, rng: jax.Array):
            idx = jax.random.randint(
                jax.random.fold_in(rng, 0x1d), (steps_per_call, batch_size),
                0, data.num_windows, dtype=jnp.int32)
            return run(state, idx, jax.random.fold_in(rng, 0x2d))
        return jax.jit(run_sampled, donate_argnums=(0,))

    return jax.jit(run, donate_argnums=(0,))


def make_device_diffusion_epoch_runner(model, data: DeviceResidentData,
                                       schedule, batch_size: int,
                                       batch_shard=None,
                                       ema_decay: float = 0.0,
                                       augment=None,
                                       cond_dropout: float = 0.0) -> Callable:
    """Whole-epoch diffusion (ε-prediction) training in one jit program.

    Same shape as :func:`make_device_epoch_runner` but the step is the
    DDPM objective (models/diffusion.py): sample t and noise, q_sample the
    packed all-frames targets, regress the noise.

    ``ema_decay > 0`` threads an exponential moving average of the params
    through the scan — signature becomes ``run(state, ema, rng) ->
    (state, ema, metrics)`` and the per-step EMA update rides free inside
    the compiled epoch.
    """
    from inferbiomechanics_tpu.models.diffusion import (
        diffusion_targets_from_labels,
    )
    if data.output_data_format != 'all_frames':
        raise ValueError('diffusion requires all_frames labels')
    n_steps = data.num_windows // batch_size
    if n_steps == 0:
        raise ValueError(f'dataset has {data.num_windows} windows < '
                         f'batch_size {batch_size}')

    def one(carry, idx):
        state, rng = carry
        rng, rng_t, rng_n = jax.random.split(rng, 3)
        batch_inputs, batch_labels = data.gather_in_jit(idx)
        batch_inputs, batch_labels = _constrain(batch_shard, batch_inputs,
                                                batch_labels)
        from inferbiomechanics_tpu.train.augment import maybe_augment
        from inferbiomechanics_tpu.models.diffusion import drop_conditioning
        batch_inputs, batch_labels = maybe_augment(augment, batch_inputs,
                                                   batch_labels, rng_t)
        batch_inputs = drop_conditioning(batch_inputs, rng_t, cond_dropout)
        x0 = diffusion_targets_from_labels(batch_labels, data.lab_offsets,
                                           model.num_contact_bodies)
        t = jax.random.randint(rng_t, (batch_size,), 0, schedule.timesteps)
        noise = jax.random.normal(rng_n, x0.shape, x0.dtype)
        x_t = schedule.q_sample(x0, t, noise)

        def loss_fn(params):
            eps = model.apply({'params': params}, x_t, t, batch_inputs,
                              train=True)
            return jnp.mean((eps - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return (state, rng), {'loss': loss}

    def run_epoch(state: TrainState, rng: jax.Array):
        perm_rng, step_rng = jax.random.split(rng)
        perm = jax.random.permutation(perm_rng, data.num_windows)
        idx = perm[:n_steps * batch_size].reshape(n_steps, batch_size)
        (state, _), metrics = jax.lax.scan(one, (state, step_rng), idx)
        return state, jax.tree_util.tree_map(lambda m: m.mean(0), metrics)

    if not ema_decay:
        return jax.jit(run_epoch, donate_argnums=(0,))

    def one_ema(carry, idx):
        state, ema, rng = carry
        (state, rng), metrics = one((state, rng), idx)
        ema = jax.tree_util.tree_map(
            lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
            ema, state.params)
        return (state, ema, rng), metrics

    def run_epoch_ema(state: TrainState, ema, rng: jax.Array):
        perm_rng, step_rng = jax.random.split(rng)
        perm = jax.random.permutation(perm_rng, data.num_windows)
        idx = perm[:n_steps * batch_size].reshape(n_steps, batch_size)
        (state, ema, _), metrics = jax.lax.scan(
            one_ema, (state, ema, step_rng), idx)
        return state, ema, jax.tree_util.tree_map(lambda m: m.mean(0),
                                                  metrics)

    return jax.jit(run_epoch_ema, donate_argnums=(0, 1))


def make_device_eval_runner(model, data: DeviceResidentData,
                            loss_config: LossConfig,
                            batch_size: int,
                            batch_shard=None) -> Callable:
    """``run_eval(state) -> mean_metrics`` — the whole eval split scanned
    in one jit program (sequential order, no shuffle), metrics averaged
    over batches exactly like the host-side evaluator accumulation."""
    n_steps = data.num_windows // batch_size
    if n_steps == 0:
        raise ValueError(f'eval split has {data.num_windows} windows < '
                         f'batch_size {batch_size}')
    idx_all = jnp.arange(n_steps * batch_size, dtype=jnp.int32).reshape(
        n_steps, batch_size)

    def one(state, idx):
        batch_inputs, batch_labels = data.gather_in_jit(idx)
        batch_inputs, batch_labels = _constrain(batch_shard, batch_inputs,
                                                batch_labels)
        labels = unpack(batch_labels, data.lab_offsets)
        outputs = model.apply({'params': state.params}, batch_inputs, train=False)
        _, metrics = loss_and_metrics(outputs, labels, loss_config)
        return state, metrics

    def run_eval(state: TrainState):
        _, metrics = jax.lax.scan(one, state, idx_all)
        return jax.tree_util.tree_map(lambda m: m.mean(0), metrics)

    return jax.jit(run_eval)


def make_device_epoch_runner(model, data: DeviceResidentData,
                             loss_config: LossConfig,
                             batch_size: int,
                             batch_shard=None) -> Callable:
    """``run_epoch(state, rng) -> (state, mean_metrics)`` — a WHOLE epoch
    in one jit program: the shuffle (``jax.random.permutation`` over the
    window table), every gather, and every train step run on device.
    Host traffic per epoch: one dispatch, zero data.
    """
    n_steps = data.num_windows // batch_size
    if n_steps == 0:
        raise ValueError(f'dataset has {data.num_windows} windows < '
                         f'batch_size {batch_size}')

    def one(carry, idx):
        state, rng = carry
        rng, sub = jax.random.split(rng)
        batch_inputs, batch_labels = data.gather_in_jit(idx)
        batch_inputs, batch_labels = _constrain(batch_shard, batch_inputs,
                                                batch_labels)
        labels = unpack(batch_labels, data.lab_offsets)

        def loss_fn(params):
            outputs = model.apply({'params': params}, batch_inputs,
                                  train=True, rngs={'dropout': sub})
            loss, metrics = loss_and_metrics(outputs, labels, loss_config)
            return loss, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return (state, rng), metrics

    def run_epoch(state: TrainState, rng: jax.Array):
        perm_rng, step_rng = jax.random.split(rng)
        perm = jax.random.permutation(perm_rng, data.num_windows)
        idx = perm[:n_steps * batch_size].reshape(n_steps, batch_size)
        (state, _), metrics = jax.lax.scan(one, (state, step_rng), idx)
        return state, jax.tree_util.tree_map(lambda m: m.mean(0), metrics)

    return jax.jit(run_epoch, donate_argnums=(0,))
