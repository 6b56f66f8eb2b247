"""The training loop.

Capability parity: reference ``src/cli/train.py:199-295`` — per epoch:
dev-set evaluation BEFORE the train epoch (model in eval mode, ref
:207-226), then the train epoch with metric logging every 100 batches
(ref :263-268), checkpointing every 1000 batches from process 0 only
(ref :266-278), and resume from the latest ``epoch_{e}_batch_{b}``
checkpoint (ref :199-201). The reference's latent bugs (undefined DEV,
unimported time/mp — SURVEY.md §2.12) are not replicated.

TPU-native: the step is one fused jit program; batches stream through the
PrefetchLoader onto the data-parallel mesh; there are no barriers — the
collectives XLA inserts are the synchronization.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from inferbiomechanics_tpu.config import Config
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.loader import PrefetchLoader
from inferbiomechanics_tpu.loss import LossConfig, RegressionLossEvaluator
from inferbiomechanics_tpu.models import get_model
from inferbiomechanics_tpu.parallel import make_mesh, batch_sharding, replicate
from inferbiomechanics_tpu.train.checkpoint import (
    AsyncCheckpointer, list_checkpoints, load_latest_checkpoint,
    prune_checkpoints, save_checkpoint, warm_start_from,
)
from inferbiomechanics_tpu.train.optimizers import make_optimizer, wrap_freeze
from inferbiomechanics_tpu.train.state import create_train_state, num_params
from inferbiomechanics_tpu.train.step import make_eval_step, make_train_step

logger = logging.getLogger(__name__)


@dataclass
class TrainResult:
    epochs_run: int
    final_train_metrics: Dict[str, float]
    final_dev_metrics: Dict[str, float]
    windows_per_sec: float
    windows_seen: int = 0
    preempted: bool = False   # SIGTERM checkpoint-and-exit (see train())


def loss_config_from(config: Config) -> LossConfig:
    return LossConfig(
        predict_grf_components=tuple(config.predict_grf_components),
        predict_cop_components=tuple(config.predict_cop_components),
        predict_moment_components=tuple(config.predict_moment_components),
        predict_wrench_components=tuple(config.predict_wrench_components),
        aux_tau_weight=config.aux_tau_weight,
        aux_com_acc_weight=config.aux_com_acc_weight,
        aux_contact_weight=config.aux_contact_weight,
    )


def build_model_for_dataset(config: Config, ds: WindowDataset):
    return get_model(
        config.model_type,
        num_dofs=ds.num_dofs,
        num_contact_bodies=ds.num_contact_bodies,
        history_len=config.window_size,
        stride=config.stride,
        root_history_len=ds.root_history_len,
        output_data_format=config.output_data_format,
        activation=config.activation,
        hidden_dims=config.hidden_dims,
        batchnorm=config.batchnorm,
        dropout=config.dropout,
        dropout_prob=config.dropout_prob,
        d_model=config.d_model,
        num_layers=config.num_layers,
        num_heads=config.num_heads,
        attn_impl=config.attn_impl,
        conv_impl=config.conv_impl,
        diffusion_timesteps=config.diffusion_timesteps,
        init_style=config.init_style,
    )


def train(config: Config,
          train_ds: WindowDataset,
          dev_ds: Optional[WindowDataset] = None,
          metric_logger=None,
          max_batches_per_epoch: Optional[int] = None) -> TrainResult:
    """Run the full training workflow on the current device mesh.

    Preemption-safe: SIGTERM (the signal TPU VMs and batch schedulers
    deliver before eviction) requests a checkpoint at the next step
    boundary and a clean exit; the run resumes mid-epoch from that
    checkpoint (the resume path below replays the exact remaining batch
    stream). The reference had no preemption story — a killed run lost
    everything since its last 1000-batch checkpoint.
    """
    stop_requested = {'flag': False}

    def _on_term(signum, frame):
        stop_requested['flag'] = True
        logger.warning('SIGTERM received: writing a checkpoint at the '
                       'next step boundary and exiting cleanly')

    import signal as _signal
    old_handler = None
    try:
        old_handler = _signal.signal(_signal.SIGTERM, _on_term)
    except ValueError:
        pass   # not the main thread (e.g. tests driving train() directly)

    pp = max(1, int(config.pipeline_parallel))
    if pp > 1:
        # pipeline parallelism (parallel/pipeline.py): transformer-only,
        # host loader tier — the other tiers each own the data axis with
        # their own epoch programs
        if config.model_type != 'transformer':
            raise ValueError('--pipeline-parallel requires the transformer '
                             f'(got {config.model_type})')
        if config.model_parallel > 1:
            raise ValueError('--pipeline-parallel and --model-parallel are '
                             'mutually exclusive mesh layouts')
        if config.device_data in ('on', 'sharded', 'stream'):
            raise ValueError('--pipeline-parallel runs the host loader '
                             'tier; use --device-data auto or off')
        if config.grad_accum_steps > 1:
            raise ValueError('--pipeline-parallel already microbatches '
                             'the step; --grad-accum-steps must be 1')
        if config.grad_allreduce_dtype == 'bf16':
            raise ValueError('--grad-allreduce-dtype bf16 is not supported '
                             'with --pipeline-parallel')
        if config.dropout and config.dropout_prob:
            raise ValueError('--pipeline-parallel requires dropout off '
                             '(stages run without per-layer RNG plumbing)')
        if config.attn_impl == 'pallas':
            raise ValueError("--pipeline-parallel supports attn_impl "
                             "'vpu'/'flax' only (pallas checkpoints store "
                             "flat enc{i}_* params the stage converters "
                             "cannot restructure)")
        from inferbiomechanics_tpu.parallel.pipeline import (
            make_pipeline_mesh,
        )
        mesh = make_pipeline_mesh(pipe=pp)
    else:
        mesh = make_mesh(model_parallel=config.model_parallel)
    sharding = batch_sharding(mesh)
    n_dp = mesh.shape['data']
    if config.batch_size % n_dp != 0:
        raise ValueError(f'batch_size={config.batch_size} not divisible by '
                         f'data-parallel size {n_dp}')
    if config.grad_accum_steps > 1:
        micro = config.batch_size // config.grad_accum_steps
        if config.batch_size % config.grad_accum_steps or micro % n_dp:
            raise ValueError(
                f'batch_size={config.batch_size} must split into '
                f'--grad-accum-steps {config.grad_accum_steps} microbatches '
                f'each divisible by data-parallel size {n_dp}')
        if config.device_data in ('sharded', 'stream'):
            raise ValueError('--grad-accum-steps applies to the host and '
                             'device-resident tiers; the sharded/streaming '
                             'tiers run fixed whole-batch epoch programs')
    lowp_allreduce = (jax.numpy.bfloat16
                      if config.grad_allreduce_dtype == 'bf16' else None)
    if lowp_allreduce is not None:
        if config.batchnorm:
            raise ValueError('--grad-allreduce-dtype bf16 does not support '
                             'batchnorm models (running stats would need '
                             'their own cross-shard reduction)')
        if config.device_data == 'stream':
            raise ValueError('--grad-allreduce-dtype bf16 applies to the '
                             'host, device-resident, and sharded tiers; '
                             'the streaming tier runs fixed whole-batch '
                             'segment programs')
        if n_dp == 1:
            logger.info('--grad-allreduce-dtype bf16: single data shard, '
                        'no cross-device reduction to reduce — ignored')
            lowp_allreduce = None

    model = build_model_for_dataset(config, train_ds)
    lc = loss_config_from(config)

    # on-device augmentation: compiled into every tier's train step
    # (train/augment.py); dev eval always scores unaugmented windows
    from inferbiomechanics_tpu.train.augment import augmenter_from_config
    augmenter = augmenter_from_config(config, train_ds, logger)

    sample = train_ds.gather(np.arange(min(config.batch_size, max(1, len(train_ds)))))
    if sample.inputs.shape[0] < config.batch_size:
        reps = -(-config.batch_size // sample.inputs.shape[0])
        sample_inputs = np.tile(sample.inputs, (reps, 1, 1))[:config.batch_size]
    else:
        sample_inputs = sample.inputs

    tx = make_optimizer(config.opt_type, config.learning_rate,
                        lr_schedule=config.lr_schedule,
                        lr_decay_steps=config.lr_decay_steps,
                        lr_warmup_steps=config.lr_warmup_steps,
                        weight_decay=config.weight_decay,
                        grad_clip_norm=config.grad_clip_norm)
    if config.freeze_params:
        tx = wrap_freeze(tx, config.freeze_params)
    rng = jax.random.PRNGKey(config.seed)
    state = create_train_state(model, rng, jax.numpy.asarray(sample_inputs), tx)
    logger.info('model %s: %d params', config.model_type, num_params(state))
    if jax.process_index() == 0:
        # provenance sidecar: consumers auto-configure/validate against
        # what this dir was actually trained as (train/run_config.py).
        # On resume, warn about architecture drift against the PREVIOUS
        # run's sidecar before this run's config overwrites it.
        from inferbiomechanics_tpu.train.run_config import (
            check_resume_architecture, save_run_config,
            warn_on_architecture_mismatch,
        )
        if list_checkpoints(config.checkpoint_dir):
            check_resume_architecture(config, config.checkpoint_dir)
            warn_on_architecture_mismatch(config, config.checkpoint_dir,
                                          'resume')
        save_run_config(config.checkpoint_dir, config)
    if config.init_from_checkpoint:
        # transfer learning: params only, fresh optimizer, epoch 0.
        # Resume always wins — a warm start must not clobber an
        # interrupted run's progress in the same checkpoint dir.
        if list_checkpoints(config.checkpoint_dir):
            logger.warning('--init-from-checkpoint %s ignored: %s already '
                           'has resume checkpoints',
                           config.init_from_checkpoint, config.checkpoint_dir)
        else:
            state = warm_start_from(state, config.init_from_checkpoint)
            logger.info('warm start: params from %s (fresh optimizer)',
                        config.init_from_checkpoint)

    # resume (parity: abstract_command.py:86-120). The reference parses the
    # mid-epoch batch index but restarts at epoch+1 anyway; here a mid-epoch
    # checkpoint resumes INSIDE its epoch — batch order is a deterministic
    # function of the epoch seed, so skipping the consumed prefix replays
    # the exact remaining stream.
    state, ckpt_epoch, ckpt_batch = load_latest_checkpoint(state, config.checkpoint_dir)
    if ckpt_batch > 0:
        # Mid-epoch checkpoints are written AFTER the step at ckpt_batch
        # runs, so its gradient update is already in the state: resume at
        # ckpt_batch + 1 or the checkpointed batch would be applied twice.
        # (If ckpt_batch was the epoch's last step, the resumed epoch
        # simply replays zero batches and falls through to epoch end.)
        start_epoch = ckpt_epoch
        skip_batches = ckpt_batch + 1
    else:
        start_epoch = ckpt_epoch + 1
        skip_batches = 0
    if pp > 1:
        # restructure the canonical state (params + optimizer moments)
        # into the stage-stacked, pipe-sharded layout; checkpoints stay
        # canonical (write_checkpoint converts back)
        from inferbiomechanics_tpu.parallel.pipeline import (
            pipeline_trainstate_from_canonical,
        )
        state = pipeline_trainstate_from_canonical(state, mesh,
                                                   model.num_layers)
    else:
        state = replicate(mesh, state)

    # device-resident data path: HBM dataset + on-device window gather,
    # per-step host traffic = one [B] int32 index vector. Requires
    # materialized features (on-demand mode streams from disk instead).
    dev_resident = (dev_ds is not None and len(dev_ds) >= config.batch_size
                    and not state.batch_stats and not config.compute_report
                    and dev_ds.features_all is not None)
    if train_ds.features_all is not None:
        data_bytes = train_ds.features_all.nbytes + train_ds.labels_all.nbytes
        if dev_resident:
            # the dev split gets its own resident copy (and packed copy,
            # below) — it shares the HBM budget, so count it here too
            data_bytes += dev_ds.features_all.nbytes + dev_ds.labels_all.nbytes
        use_device_data = (config.device_data == 'on' or
                           (config.device_data == 'auto' and
                            data_bytes < config.device_data_max_bytes))
        use_device_data = use_device_data and pp == 1
    else:
        if config.device_data == 'on':
            raise ValueError('--device-data on requires materialized '
                             'features (dataset was built with '
                             'materialize_features=False); the sharded '
                             'tier accepts lazy datasets')
        use_device_data = False
        # lazy datasets still have exact metadata: rows x C_in f32 — lets
        # 'auto' reach the sharded tier without materializing anything
        data_bytes = (train_ds.labels_all.shape[0]
                      * train_ds.num_input_channels * 4
                      + train_ds.labels_all.nbytes)
    device_data = None
    device_step = None
    device_chunked_step = None
    dev_chunk_k = 1
    device_eval = None
    streaming_epoch = None
    # pod-sharded residency: trials split across the mesh's data axis so
    # HBM capacity scales with the chip count (train/sharded_data.py);
    # 'auto' reaches for it when the dataset misses single-chip residency
    # but fits the combined HBM of a multi-chip mesh
    from inferbiomechanics_tpu.parallel.mesh import DATA_AXIS
    n_data_shards = int(mesh.shape[DATA_AXIS])
    want_sharded = (config.device_data == 'sharded' or
                    (config.device_data == 'auto' and not use_device_data
                     and pp == 1 and config.grad_accum_steps == 1
                     and data_bytes is not None and n_data_shards > 1
                     and data_bytes <
                     config.device_data_max_bytes * n_data_shards))
    if want_sharded:
        from inferbiomechanics_tpu.train.sharded_data import (
            ShardedDeviceData, make_sharded_epoch_runner,
        )
        try:
            sdata = ShardedDeviceData(train_ds, mesh)
            streaming_epoch = make_sharded_epoch_runner(
                model, sdata, lc, config.batch_size,
                grad_allreduce_dtype=lowp_allreduce,
                augment=augmenter)
            use_device_data = False
            logger.info('pod-sharded device data: %d shards, %.0f MB '
                        'HBM/device', sdata.num_shards,
                        sdata.hbm_bytes_per_device / 1e6)
        except (ValueError, NotImplementedError) as e:
            if config.device_data == 'sharded':
                raise
            logger.warning('sharded device data unavailable (%s); '
                           'falling back to the host loader', e)
    if config.device_data == 'stream':
        # out-of-core tier: trials packed into HBM-budget segments
        # (train/streaming_data.py); epoch-granular logging/checkpoints
        from inferbiomechanics_tpu.train.streaming_data import (
            StreamingPlan, make_streaming_epoch,
        )
        if jax.process_count() > 1:
            raise ValueError(
                '--device-data stream is single-controller SPMD: the '
                'per-process segment materialization has no cross-process '
                'plan; on a multi-host pod use --device-data sharded')
        use_device_data = False
        plan = StreamingPlan(train_ds, config.device_data_max_bytes)
        streaming_epoch = make_streaming_epoch(
            model, train_ds, plan, lc, config.batch_size,
            augment=augmenter,
            # streaming x dp (VERDICT r4 #5): gathered batch + grad
            # all-reduce shard over the data axis, segments replicated
            batch_shard=sharding if n_data_shards > 1 else None)
        logger.info('streaming data: %d segments of %d rows%s',
                    len(plan.segments), plan.rows_pad,
                    f', batch dp x{n_data_shards}'
                    if n_data_shards > 1 else '')
    if use_device_data:
        from inferbiomechanics_tpu.parallel.mesh import replicated
        from inferbiomechanics_tpu.train.device_data import (
            DeviceResidentData, make_device_eval_runner, make_device_train_step,
        )
        # window-major packed gather: 1.5x step throughput for
        # ~window/stride x the feature HBM (device_data.py); 'auto'
        # packs only when frame-major + packed fit the HBM budget
        packed_est = DeviceResidentData.packed_bytes_estimate(train_ds)
        if dev_resident:
            packed_est += DeviceResidentData.packed_bytes_estimate(dev_ds)
        pack = (config.pack_windows == 'on' or
                (config.pack_windows == 'auto' and
                 data_bytes + packed_est < config.device_data_max_bytes))
        device_data = DeviceResidentData(train_ds, sharding=replicated(mesh),
                                         pack_windows=pack)
        device_step = make_device_train_step(model, device_data, lc,
                                             batch_shard=sharding,
                                             grad_accum=config.grad_accum_steps,
                                             grad_allreduce_dtype=lowp_allreduce,
                                             mesh=mesh,
                                             augment=augmenter)
        # chunked dispatch (--device-chunk-steps, default ON): K steps
        # per scan program — the per-step path spends ~2-7 ms of
        # dispatch overhead per ~0.2-0.4 ms step (BENCH_NOTES round 4).
        # Numerics bitwise-identical; remainder/resume batches fall back
        # to device_step. Multi-process and bf16-allreduce stay per-step.
        dev_chunk_k = max(1, int(config.device_chunk_steps))
        # clamp to the epoch length: a chunk larger than the epoch would
        # never fill and silently fall back to per-step dispatch
        steps_per_epoch = max(1, (len(train_ds) // jax.process_count())
                              // config.batch_size)
        dev_chunk_k = min(dev_chunk_k, steps_per_epoch)
        if dev_chunk_k > 1 and lowp_allreduce is None \
                and jax.process_count() == 1:
            from inferbiomechanics_tpu.train.device_data import (
                make_device_chunked_step,
            )
            device_chunked_step = make_device_chunked_step(
                model, device_data, lc, dev_chunk_k,
                grad_accum=config.grad_accum_steps,
                batch_shard=sharding, augment=augmenter)
            logger.info('device chunked dispatch: %d steps/program',
                        dev_chunk_k)
        else:
            dev_chunk_k = 1
        logger.info('device-resident data: %.0f MB in HBM%s',
                    device_data.hbm_bytes / 1e6,
                    ' (windows packed)' if pack else '')
        if dev_resident:
            dev_device_data = DeviceResidentData(dev_ds, sharding=replicated(mesh),
                                                 pack_windows=pack)
            device_eval = make_device_eval_runner(model, dev_device_data, lc,
                                                  config.batch_size,
                                                  batch_shard=sharding)

    if pp > 1:
        from inferbiomechanics_tpu.parallel.pipeline import (
            make_pipeline_train_step, to_canonical_params,
        )
        num_micro = config.pipeline_microbatches or 2 * pp
        train_step = make_pipeline_train_step(
            model, train_ds.lab_offsets, lc, mesh,
            num_microbatches=num_micro, donate=False, augment=augmenter)
        logger.info('pipeline parallelism: %d stages x %d layers, dp=%d, '
                    '%d microbatches/step', pp, model.num_layers // pp,
                    n_dp, num_micro)
        base_eval_step = make_eval_step(model, train_ds.lab_offsets, lc)

        _canon_cache = [None, None]   # (source state, canonical state)

        def eval_step(state, inputs, labels):
            # dev eval reuses the plain single-program forward on a
            # canonical view of the pipe-sharded params; params are
            # constant for a whole eval pass, so gather them ONCE per
            # state rather than once per batch
            if _canon_cache[0] is not state:
                _canon_cache[0] = state
                _canon_cache[1] = state.replace(params=to_canonical_params(
                    state.params, model.num_layers))
            return base_eval_step(_canon_cache[1], inputs, labels)
    else:
        train_step = make_train_step(model, train_ds.lab_offsets, lc,
                                     grad_accum=config.grad_accum_steps,
                                     grad_allreduce_dtype=lowp_allreduce,
                                     mesh=mesh,
                                     augment=augmenter)
        eval_step = make_eval_step(model, train_ds.lab_offsets, lc)

    # host-tier upload dtype (--host-upload-dtype bf16): inputs ship at
    # half the bytes; free when compute_dtype is bf16 (the default)
    if config.host_upload_dtype == 'bf16':
        def _upcast(a):
            return np.asarray(a).astype(jnp.bfloat16)
    else:
        def _upcast(a):
            return a

    # chunked host dispatch (--host-chunk-steps K): K batches per upload
    # + one K-step scan per dispatch on the host-loader tier
    chunk_k = max(1, int(config.host_chunk_steps))
    # clamp to the epoch length (a bigger chunk never fills -> silent
    # per-step fallback)
    chunk_k = min(chunk_k, max(1, (len(train_ds) // jax.process_count())
                               // config.batch_size))
    chunked_step = None
    if chunk_k > 1 and pp == 1 and not use_device_data \
            and streaming_epoch is None:
        if lowp_allreduce is not None:
            raise ValueError('--host-chunk-steps > 1 does not compose with '
                             '--grad-allreduce-dtype (the explicit-psum '
                             'shard_map step); use one or the other')
        from inferbiomechanics_tpu.train.step import make_chunked_train_step
        chunked_step = make_chunked_train_step(
            model, train_ds.lab_offsets, lc, chunk_k,
            grad_accum=config.grad_accum_steps, augment=augmenter)

    tau_fn = None
    if config.compute_report and dev_ds is not None:
        from inferbiomechanics_tpu.loss.tau_report import make_tau_report_fn
        tau_fn = make_tau_report_fn(dev_ds)
    train_eval = RegressionLossEvaluator('train', lc, wandb_logger=metric_logger)
    dev_eval = RegressionLossEvaluator('dev', lc, tau_fn=tau_fn,
                                       wandb_logger=metric_logger)

    train_loader = PrefetchLoader(train_ds, config.batch_size, sharding=sharding,
                                  shard_index=jax.process_index(),
                                  num_shards=jax.process_count(),
                                  n_threads=config.data_loading_workers)
    dev_loader = (PrefetchLoader(dev_ds, config.batch_size, shuffle=False,
                                 sharding=sharding,
                                 shard_index=jax.process_index(),
                                 num_shards=jax.process_count())
                  if dev_ds is not None and len(dev_ds) >= config.batch_size else None)

    windows_seen = 0
    compute_time = 0.0
    final_dev: Dict[str, float] = {}
    epochs_run = 0
    best_dev_loss = float('inf')
    stale_evals = 0

    profiling = False
    if config.profile:
        import os as _os
        _os.makedirs(config.profile_dir, exist_ok=True)
        jax.profiler.start_trace(config.profile_dir)
        profiling = True
        logger.info('JAX profiler trace -> %s', config.profile_dir)

    ckpt_async = AsyncCheckpointer() if config.async_checkpoint else None

    def write_checkpoint(epoch: int, batch: int, filename=None) -> None:
        """One checkpoint commit: sync (reference behavior) or async
        (--async-checkpoint). Retention pruning runs after the write in
        both modes; best.ckpt is a named artifact and never pruned."""
        save_state = state
        if pp > 1:
            # checkpoints always store the canonical layout so resume,
            # analyze, serve, and convert-checkpoint all interoperate
            from inferbiomechanics_tpu.parallel.pipeline import (
                canonical_trainstate_from_pipeline,
            )
            save_state = canonical_trainstate_from_pipeline(
                state, model.num_layers)
        keep = 0 if filename else config.keep_checkpoints
        if ckpt_async is not None:
            ckpt_async.save(config.checkpoint_dir, save_state, epoch, batch,
                            filename=filename, prune_keep=keep)
            return
        save_checkpoint(config.checkpoint_dir, save_state, epoch, batch,
                        filename=filename)
        if keep:
            prune_checkpoints(config.checkpoint_dir, keep)

    def run_dev_eval(epoch: int) -> bool:
        """Dev eval of the CURRENT state (ref train.py:207-226)."""
        nonlocal final_dev
        if device_eval is not None:
            metrics = device_eval(state)
            dev_eval(None, None, None, precomputed_metrics=metrics)
        elif dev_loader is not None:
            for batch in dev_loader.epoch(seed=config.seed * 1_000_003 + epoch):
                outputs, metrics = eval_step(state, batch.inputs, batch.labels)
                dev_eval(batch.inputs, outputs,
                         dev_ds.unpack_labels(batch.labels),
                         batch.subject_indices,
                         compute_report=config.compute_report,
                         precomputed_metrics=metrics)
        else:
            return False
        print(f'[epoch {epoch}] dev report:')
        final_dev = dev_eval.print_report(log_to_wandb=metric_logger is not None)
        return True

    def track_best(epoch: int) -> bool:
        """Best-checkpoint / early-stop bookkeeping (beyond parity).
        The dev eval at epoch e scores the state AFTER epoch e-1.
        Returns True when training should stop."""
        nonlocal best_dev_loss, stale_evals
        if not (final_dev and (config.keep_best or config.early_stop_patience)):
            return False
        dev_loss = final_dev['loss']
        if dev_loss < best_dev_loss:
            best_dev_loss = dev_loss
            stale_evals = 0
            if config.keep_best:
                write_checkpoint(epoch - 1, 0, filename='best.ckpt')
                logger.info('new best dev loss %.6f -> best.ckpt', dev_loss)
            return False
        stale_evals += 1
        if config.early_stop_patience and stale_evals >= config.early_stop_patience:
            print(f'early stop: dev loss has not improved in '
                  f'{stale_evals} evals (best {best_dev_loss:.6f})')
            return True
        return False

    stopped_early = False
    preempted = False
    for epoch in range(start_epoch, config.epochs):
        # -- dev eval before the epoch (ref train.py:207-226) --------------
        run_dev_eval(epoch)
        if track_best(epoch):
            stopped_early = True
            break

        # -- train epoch ----------------------------------------------------
        t_epoch = time.time()
        if streaming_epoch is not None:
            t0 = time.time()
            state, metrics = streaming_epoch(state, jax.random.fold_in(rng, epoch))
            if metrics:
                train_eval(None, None, None, precomputed_metrics=metrics)
                if metric_logger is not None:
                    metric_logger.log({'train/loss': float(metrics['loss']),
                                       'epoch': epoch})
            compute_time += time.time() - t0
            windows_seen += (len(train_ds) // config.batch_size) * config.batch_size
            epochs_run += 1
            print(f'[epoch {epoch}] train report ({time.time() - t_epoch:.1f}s):')
            train_metrics = train_eval.print_report(log_to_wandb=metric_logger is not None)
            write_checkpoint(epoch, 0)
            if stop_requested['flag']:
                preempted = True
                break
            continue
        if use_device_data:
            # per-epoch shuffle sharded across hosts, indices sent per step
            perm = np.random.default_rng(
                (config.seed, epoch)).permutation(len(train_ds))
            # equalize host shards (see WindowDataset.batches): all
            # processes must yield identical step counts per epoch
            n_proc = jax.process_count()
            perm = perm[:(perm.shape[0] // n_proc) * n_proc]
            perm = perm[jax.process_index()::n_proc]
            n_steps = perm.shape[0] // config.batch_size
            # ship each step's indices as a GLOBAL array sharded on the
            # data axis (shard_batch handles the multi-host global-array
            # construction): per-process slices fed as plain numpy would
            # be treated as replicated, and with differing values the
            # "replicated" parameters silently diverge across processes
            from inferbiomechanics_tpu.parallel import shard_batch
            batch_iter = (
                (k, shard_batch(mesh, np.asarray(
                    perm[k * config.batch_size:(k + 1) * config.batch_size],
                    np.int32)))
                for k in range(n_steps))
        else:
            batch_iter = enumerate(train_loader.epoch(
                seed=config.seed * 1_000_003 + epoch))
        # windows_per_sec timing: epoch-level wall clock closed by a
        # scalar readback of the LAST step's metrics — per-step
        # time.time() deltas around async dispatches only measure host
        # dispatch rate on this runtime (BENCH_NOTES.md measurement
        # rules), which could overstate throughput arbitrarily.
        t_compute = time.time()
        last_metrics = None
        active_chunked = (device_chunked_step if use_device_data
                          else chunked_step)
        active_chunk_k = dev_chunk_k if use_device_data else chunk_k
        if active_chunked is not None:
            import itertools

            def _crosses(first_idx: int, last_idx: int, every: int) -> bool:
                """True when [first_idx, last_idx] crosses a multiple of
                ``every`` (batch-0 never counts as a crossing)."""
                return (last_idx > 0
                        and last_idx // every
                        > max(first_idx - 1, 0) // every)

            def _crosses_ckpt(first_idx: int, last_idx: int) -> bool:
                return _crosses(first_idx, last_idx,
                                config.checkpoint_every_batches)

            def _log_ckpt_boundaries(first_idx: int, last_idx: int,
                                     metrics) -> None:
                """Fire the per-batch log/checkpoint cadences once per
                crossed boundary (chunk granularity). The float() here is
                the ONLY mid-epoch device sync — lazily, on boundaries,
                like the per-step path."""
                if (first_idx == 0
                        or _crosses(first_idx, last_idx,
                                    config.log_every_batches)):
                    loss = float(metrics['loss'])
                    if metric_logger is not None:
                        metric_logger.log({'train/loss': loss,
                                           'epoch': epoch,
                                           'batch': last_idx})
                    logger.info('epoch %d batch %d loss %.6f', epoch,
                                last_idx, loss)
                if _crosses_ckpt(first_idx, last_idx):
                    write_checkpoint(epoch, last_idx)

            # metric accumulation is DEFERRED by one chunk: per-row
            # device slices would issue K x n_metrics tiny ops per chunk
            # (measured SLOWER than per-step dispatch on the tunnel), and
            # an immediate device_get would serialize chunk N+1 behind
            # chunk N; fetching the PREVIOUS chunk's stacked metrics
            # after dispatching the current one keeps one transfer per
            # chunk with full overlap.
            pending = None    # (first_idx, last_idx, ms_device, n_rows)

            def _drain(p):
                nonlocal last_metrics
                f_idx, l_idx, ms_d, n_rows = p
                ms_np = jax.device_get(ms_d)
                for k_i in range(n_rows):
                    train_eval(None, None, None, precomputed_metrics={
                        k: v[k_i] for k, v in ms_np.items()})
                last_metrics = {k: v[-1] for k, v in ms_np.items()}
                _log_ckpt_boundaries(f_idx, l_idx, last_metrics)

            it = iter(batch_iter)
            while True:
                raw = list(itertools.islice(it, active_chunk_k))
                if not raw:
                    break
                hit_cap = (max_batches_per_epoch is not None
                           and raw[-1][0] >= max_batches_per_epoch - 1)
                group = [g for g in raw
                         if (max_batches_per_epoch is None
                             or g[0] < max_batches_per_epoch)
                         and not (epoch == start_epoch
                                  and g[0] < skip_batches)]
                if not group:
                    if hit_cap:
                        break
                    continue
                first_idx, last_idx = group[0][0], group[-1][0]
                if pending is not None and _crosses_ckpt(pending[0],
                                                         pending[1]):
                    # the pending chunk writes a mid-epoch checkpoint:
                    # drain it NOW, while `state` is still exactly the
                    # post-chunk state its batch label names. Deferring
                    # past the next dispatch would save a state one
                    # chunk AHEAD of the label (the chunked step donates
                    # its input state, so the old buffers can't be
                    # snapshotted later), and a resume would re-apply
                    # that chunk's updates. Checkpoint boundaries are
                    # rare, so the lost overlap is negligible.
                    _drain(pending)
                    pending = None
                if len(group) == active_chunk_k:
                    rngs = jnp.stack([
                        jax.random.fold_in(rng, epoch * 1_000_000 + i)
                        for i, _ in group])
                    if use_device_data:
                        # payloads are [B] index arrays (already on
                        # device); the K-step scan gathers each batch
                        # from the resident dataset in-program
                        idx_kb = jnp.stack([p for _, p in group])
                        state, ms = active_chunked(state, idx_kb, rngs)
                    else:
                        # per-batch ASYNC device_put (keeps the
                        # upload/compute overlap per-step dispatch gets
                        # for free) + one on-device stack; host-side
                        # np.stack + one giant synchronous upload
                        # measured SLOWER than per-step on the tunnel
                        # (scripts/probe_chunked.py)
                        xs = jnp.stack([jax.device_put(_upcast(b.inputs))
                                        for _, b in group])
                        ys = jnp.stack([jax.device_put(b.labels)
                                        for _, b in group])
                        state, ms = active_chunked(state, xs, ys, rngs)
                    if pending is not None:
                        _drain(pending)
                    pending = (first_idx, last_idx, ms, active_chunk_k)
                else:
                    # remainder (epoch tail / resume prefix): the K-step
                    # program's shape can't serve it — per-step fallback.
                    # Drain first: evaluator rows must stay in step order.
                    if pending is not None:
                        _drain(pending)
                        pending = None
                    for batch_idx, payload in group:
                        step_rng = jax.random.fold_in(
                            rng, epoch * 1_000_000 + batch_idx)
                        if use_device_data:
                            state, metrics = device_step(state, payload,
                                                         step_rng)
                        else:
                            state, metrics = train_step(
                                state, _upcast(payload.inputs),
                                payload.labels, step_rng)
                        train_eval(None, None, None,
                                   precomputed_metrics=metrics)
                        last_metrics = metrics
                    _log_ckpt_boundaries(first_idx, last_idx, last_metrics)
                windows_seen += len(group) * config.batch_size
                if stop_requested['flag'] and last_idx >= 1:
                    if pending is not None:
                        _drain(pending)
                        pending = None
                    write_checkpoint(epoch, last_idx)
                    logger.info('preemption checkpoint written: epoch %d '
                                'batch %d', epoch, last_idx)
                    preempted = True
                    break
                if hit_cap:
                    break
            if pending is not None:
                _drain(pending)
            batch_iter = ()   # consumed; skip the per-step loop below
        for batch_idx, batch in batch_iter:
            if max_batches_per_epoch is not None and batch_idx >= max_batches_per_epoch:
                break
            if epoch == start_epoch and batch_idx < skip_batches:
                continue   # mid-epoch resume: prefix already consumed
            step_rng = jax.random.fold_in(rng, epoch * 1_000_000 + batch_idx)
            if use_device_data:
                state, metrics = device_step(state, batch, step_rng)
            else:
                state, metrics = train_step(state, _upcast(batch.inputs),
                                            batch.labels, step_rng)
            train_eval(None, None, None, precomputed_metrics=metrics)
            last_metrics = metrics
            # preemption: checkpoint after this step and exit cleanly.
            # Only at batch_idx >= 1 — a batch-0 mid-epoch checkpoint is
            # indistinguishable from an end-of-epoch one to the resume
            # logic (it would skip the rest of this epoch).
            if stop_requested['flag'] and batch_idx >= 1:
                write_checkpoint(epoch, batch_idx)
                logger.info('preemption checkpoint written: epoch %d '
                            'batch %d', epoch, batch_idx)
                preempted = True
                windows_seen += config.batch_size
                break
            if batch_idx % config.log_every_batches == 0:
                loss = float(metrics['loss'])
                if metric_logger is not None:
                    metric_logger.log({'train/loss': loss, 'epoch': epoch,
                                       'batch': batch_idx})
                logger.info('epoch %d batch %d loss %.6f', epoch, batch_idx, loss)
            if batch_idx > 0 and batch_idx % config.checkpoint_every_batches == 0:
                write_checkpoint(epoch, batch_idx)
            windows_seen += config.batch_size
        if last_metrics is not None:
            float(last_metrics['loss'])   # sync: chained through state
            compute_time += time.time() - t_compute
        if preempted:
            break
        epochs_run += 1
        if profiling:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            profiling = False
            logger.info('profiler trace written to %s', config.profile_dir)
        print(f'[epoch {epoch}] train report ({time.time() - t_epoch:.1f}s):')
        train_metrics = train_eval.print_report(log_to_wandb=metric_logger is not None)
        write_checkpoint(epoch, 0)

    if profiling:   # e.g. every epoch took the streaming early-continue
        jax.profiler.stop_trace()
    # the loop evals BEFORE each epoch, so without this the final epoch's
    # state would never be scored: best.ckpt could not capture the final
    # (often best) weights. Parity-gated: only the beyond-parity flags
    # change the eval cadence.
    if ((config.keep_best or config.early_stop_patience)
            and not stopped_early and epochs_run > 0
            and run_dev_eval(config.epochs)):
        track_best(config.epochs)
    if ckpt_async is not None:
        # drain the in-flight write before returning (and surface any
        # background write failure here instead of losing it); on an
        # exception path the write is abandoned mid-flight, but the
        # tmp+rename protocol means no torn checkpoint becomes visible
        ckpt_async.wait()
    if old_handler is not None:
        _signal.signal(_signal.SIGTERM, old_handler)
    if preempted:
        print('training preempted (SIGTERM): checkpoint written, resume '
              'with the same command')
    wps = windows_seen / compute_time if compute_time > 0 else 0.0
    return TrainResult(epochs_run=epochs_run,
                       final_train_metrics=train_metrics if epochs_run else {},
                       final_dev_metrics=final_dev,
                       windows_per_sec=wps,
                       windows_seen=windows_seen,
                       preempted=preempted)
