"""Training loop for the diffusion denoiser (BASELINE config #4).

Same epoch structure as the regression loop (dev-eval-before-epoch,
periodic checkpoints), but the step is ε-prediction MSE and the dev
evaluation SAMPLES the model (fast DDIM subset) and scores the samples
with the standard regression metric engine — so diffusion runs report
the same Force/CoP/COM-acc schema as every other model.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from inferbiomechanics_tpu.config import Config
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.loader import PrefetchLoader
from inferbiomechanics_tpu.loss import RegressionLossEvaluator
from inferbiomechanics_tpu.models.diffusion import (
    DDPMSchedule, DiffusionDenoiser, make_diffusion_train_step, make_sampler,
)
from inferbiomechanics_tpu.parallel import make_mesh, batch_sharding, replicate
from inferbiomechanics_tpu.train.checkpoint import (
    load_latest_checkpoint, prune_checkpoints, save_checkpoint,
)
from inferbiomechanics_tpu.train.loop import TrainResult, loss_config_from
from inferbiomechanics_tpu.train.optimizers import make_optimizer
from inferbiomechanics_tpu.train.state import TrainState, num_params

logger = logging.getLogger(__name__)

EVAL_SAMPLE_STEPS = 50   # DDIM steps for dev-set sampling


def train_diffusion(config: Config,
                    train_ds: WindowDataset,
                    dev_ds: Optional[WindowDataset] = None,
                    metric_logger=None,
                    max_batches_per_epoch: Optional[int] = None) -> TrainResult:
    if config.output_data_format != 'all_frames':
        raise ValueError('diffusion training requires --output-data-format '
                         'all_frames (the denoiser models whole windows)')
    # preemption safety (same contract as the regression loop,
    # train/loop.py): SIGTERM checkpoints at the next step/epoch boundary
    # and exits cleanly. Diffusion resume is epoch-granular
    # (start_epoch = ckpt_epoch + 1), so a mid-epoch preemption
    # checkpoint preserves the params/EMA but the interrupted epoch's
    # remaining batches are not replayed — the reference's own resume
    # has the same coarseness (abstract_command.py:118-120).
    stop_requested = {'flag': False}

    def _on_term(signum, frame):
        stop_requested['flag'] = True
        logger.warning('SIGTERM received: writing a checkpoint at the '
                       'next boundary and exiting cleanly')

    import signal as _signal
    old_handler = None
    try:
        old_handler = _signal.signal(_signal.SIGTERM, _on_term)
    except ValueError:
        pass   # not the main thread (tests driving train_diffusion())

    mesh = make_mesh(model_parallel=config.model_parallel)
    sharding = batch_sharding(mesh)

    model = DiffusionDenoiser(
        num_dofs=train_ds.num_dofs,
        num_contact_bodies=train_ds.num_contact_bodies,
        history_len=config.window_size, stride=config.stride,
        d_model=config.d_model, num_layers=config.num_layers,
        num_heads=config.num_heads, timesteps=config.diffusion_timesteps,
        attn_impl=config.attn_impl)
    sched = DDPMSchedule(config.diffusion_timesteps)
    lc = loss_config_from(config)

    sample_b = train_ds.gather(np.arange(min(config.batch_size, len(train_ds))))
    x_cond = jnp.asarray(sample_b.inputs)
    x0 = jnp.zeros((x_cond.shape[0], x_cond.shape[1], model.target_channels))
    t0 = jnp.zeros((x_cond.shape[0],), jnp.int32)
    rng = jax.random.PRNGKey(config.seed)
    variables = model.init({'params': rng}, x0, t0, x_cond, train=False)
    tx = make_optimizer(config.opt_type, config.learning_rate,
                        lr_schedule=config.lr_schedule,
                        lr_decay_steps=config.lr_decay_steps,
                        lr_warmup_steps=config.lr_warmup_steps,
                        weight_decay=config.weight_decay,
                        grad_clip_norm=config.grad_clip_norm)
    if config.freeze_params:
        from inferbiomechanics_tpu.train.optimizers import wrap_freeze
        tx = wrap_freeze(tx, config.freeze_params)
    state = TrainState(step=jnp.asarray(0, jnp.int32),
                       params=variables['params'],
                       opt_state=tx.init(variables['params']),
                       batch_stats={}, tx=tx, apply_fn=model.apply)
    logger.info('diffusion model: %d params', num_params(state))
    if jax.process_index() == 0:
        # provenance sidecar (train/run_config.py): analyze/serve warn on
        # architecture drift; the partial-denoise proposal auto-configures.
        # On resume, warn against the previous run's sidecar first.
        from inferbiomechanics_tpu.train.checkpoint import list_checkpoints
        from inferbiomechanics_tpu.train.run_config import (
            check_resume_architecture, save_run_config,
            warn_on_architecture_mismatch,
        )
        if list_checkpoints(config.checkpoint_dir):
            check_resume_architecture(config, config.checkpoint_dir)
            warn_on_architecture_mismatch(config, config.checkpoint_dir,
                                          'resume')
        save_run_config(config.checkpoint_dir, config)

    warm_started = False
    if config.init_from_checkpoint:
        from inferbiomechanics_tpu.train.checkpoint import (
            list_checkpoints, warm_start_from,
        )
        if list_checkpoints(config.checkpoint_dir):
            logger.warning('--init-from-checkpoint %s ignored: %s already '
                           'has resume checkpoints',
                           config.init_from_checkpoint, config.checkpoint_dir)
        else:
            state = warm_start_from(state, config.init_from_checkpoint)
            warm_started = True
            logger.info('warm start: params from %s (fresh optimizer)',
                        config.init_from_checkpoint)
    state, ckpt_epoch, _ = load_latest_checkpoint(state, config.checkpoint_dir)
    start_epoch = ckpt_epoch + 1
    state = replicate(mesh, state)

    # device-resident fast path: whole epoch (shuffle+gather+eps-steps) in
    # on-device augmentation, compiled into every tier's step (mirror
    # transforms the conditioning windows AND the denoising targets
    # consistently; train/augment.py). Dev sampling stays unaugmented.
    from inferbiomechanics_tpu.train.augment import augmenter_from_config
    augmenter = augmenter_from_config(config, train_ds, logger)

    # one jit program when the packed dataset fits HBM (requires
    # materialized features; on-demand datasets use the host loader)
    data_bytes = (train_ds.features_all.nbytes + train_ds.labels_all.nbytes
                  if train_ds.features_all is not None else None)
    epoch_runner = None
    if (config.device_data not in ('off', 'sharded', 'stream')
            and data_bytes is not None
            and data_bytes < config.device_data_max_bytes
            and len(train_ds) >= config.batch_size
            and max_batches_per_epoch is None):
        from inferbiomechanics_tpu.parallel.mesh import replicated
        from inferbiomechanics_tpu.train.device_data import (
            DeviceResidentData, make_device_diffusion_epoch_runner,
        )
        packed_est = DeviceResidentData.packed_bytes_estimate(train_ds)
        pack = (config.pack_windows == 'on' or
                (config.pack_windows == 'auto' and
                 data_bytes + packed_est < config.device_data_max_bytes))
        device_data = DeviceResidentData(train_ds, sharding=replicated(mesh),
                                         pack_windows=pack)
        epoch_runner = make_device_diffusion_epoch_runner(
            model, device_data, sched, config.batch_size,
            batch_shard=sharding, ema_decay=config.ema_decay,
            augment=augmenter, cond_dropout=config.cond_dropout)
        logger.info('diffusion device-resident data: %.0f MB in HBM%s',
                    device_data.hbm_bytes / 1e6,
                    ' (windows packed)' if pack else '')
    if config.device_data == 'stream':
        # out-of-core tier: HBM-budget segments, same mechanics as the
        # regression loop's streaming tier (train/streaming_data.py)
        from inferbiomechanics_tpu.train.streaming_data import (
            StreamingPlan, make_streaming_diffusion_epoch,
        )
        if jax.process_count() > 1:
            raise ValueError(
                '--device-data stream is single-controller SPMD: the '
                'per-process segment materialization has no cross-process '
                'plan; on a multi-host pod use --device-data sharded')
        plan = StreamingPlan(train_ds, config.device_data_max_bytes)
        epoch_runner = make_streaming_diffusion_epoch(
            model, train_ds, plan, sched, config.batch_size,
            ema_decay=config.ema_decay, augment=augmenter,
            cond_dropout=config.cond_dropout,
            batch_shard=sharding if int(mesh.shape['data']) > 1 else None)
        logger.info('diffusion streaming data: %d segments of %d rows%s',
                    len(plan.segments), plan.rows_pad,
                    f', batch dp x{int(mesh.shape["data"])}'
                    if int(mesh.shape['data']) > 1 else '')
    n_data_shards = int(mesh.shape['data'])
    if (epoch_runner is None and max_batches_per_epoch is None
            and len(train_ds) >= config.batch_size
            and (config.device_data == 'sharded' or
                 (config.device_data == 'auto' and data_bytes is not None
                  and n_data_shards > 1
                  and data_bytes <
                  config.device_data_max_bytes * n_data_shards))):
        # pod-sharded tier: trial blocks split across the data axis so
        # HBM capacity scales with the chip count (same ladder as the
        # regression loop, train/loop.py)
        from inferbiomechanics_tpu.train.sharded_data import (
            ShardedDeviceData, make_sharded_diffusion_epoch_runner,
        )
        try:
            sdata = ShardedDeviceData(train_ds, mesh)
            epoch_runner = make_sharded_diffusion_epoch_runner(
                model, sdata, sched, config.batch_size,
                ema_decay=config.ema_decay, augment=augmenter,
                cond_dropout=config.cond_dropout)
            logger.info('diffusion pod-sharded data: %d shards, %.0f MB '
                        'HBM/device', sdata.num_shards,
                        sdata.hbm_bytes_per_device / 1e6)
        except (ValueError, NotImplementedError) as e:
            if config.device_data == 'sharded':
                raise
            logger.warning('sharded device data unavailable (%s); '
                           'falling back to the host loader', e)

    step = make_diffusion_train_step(model, train_ds.lab_offsets, sched,
                                     augment=augmenter,
                                     cond_dropout=config.cond_dropout)
    sampler = make_sampler(model, sched, num_steps=EVAL_SAMPLE_STEPS,
                           fused_inference=config.fused_inference)

    # EMA of the denoiser params (--ema-decay; standard diffusion
    # practice). Initialized from the (possibly checkpoint-restored)
    # params; the device epoch runner updates it inside its scan, the
    # host path with one fused jit per step.
    ema = None
    ema_update = None
    if config.ema_decay:
        from inferbiomechanics_tpu.train.checkpoint import (
            load_ema_params, resolve_checkpoint_path,
        )
        ckpt_path = resolve_checkpoint_path(config.checkpoint_dir)
        if ckpt_path is None and warm_started:
            # seed the EMA from the warm-start source's tree if it has one
            ckpt_path = config.init_from_checkpoint
        restored = (load_ema_params(ckpt_path, state.params)
                    if ckpt_path else None)
        ema = replicate(mesh, restored if restored is not None
                        else jax.device_get(state.params))
        d = float(config.ema_decay)
        ema_update = jax.jit(
            lambda e, p: jax.tree_util.tree_map(
                lambda a, b: a * d + b * (1.0 - d), e, p),
            donate_argnums=(0,))
    dev_eval = RegressionLossEvaluator('dev', lc, wandb_logger=metric_logger)

    train_loader = PrefetchLoader(train_ds, config.batch_size, sharding=sharding,
                                  shard_index=jax.process_index(),
                                  num_shards=jax.process_count())
    dev_loader = (PrefetchLoader(dev_ds, config.batch_size, shuffle=False,
                                 sharding=sharding,
                                 shard_index=jax.process_index(),
                                 num_shards=jax.process_count())
                  if dev_ds is not None and len(dev_ds) >= config.batch_size else None)

    windows_seen, compute_time = 0, 0.0
    final_dev: Dict[str, float] = {}
    last_loss = float('nan')
    epochs_run = 0
    best_dev_loss = float('inf')
    stale_evals = 0

    from inferbiomechanics_tpu.train.checkpoint import AsyncCheckpointer
    ckpt_async = AsyncCheckpointer() if config.async_checkpoint else None

    def write_checkpoint(epoch: int, batch: int, filename=None) -> None:
        """Sync or background checkpoint commit (same contract as
        train/loop.py's write_checkpoint; EMA rides along)."""
        keep = 0 if filename else config.keep_checkpoints
        if ckpt_async is not None:
            ckpt_async.save(config.checkpoint_dir, state, epoch, batch,
                            filename=filename, ema_params=ema,
                            prune_keep=keep)
            return
        save_checkpoint(config.checkpoint_dir, state, epoch, batch,
                        filename=filename, ema_params=ema)
        if keep:
            prune_checkpoints(config.checkpoint_dir, keep)

    def run_dev_eval(epoch: int) -> bool:
        nonlocal final_dev
        if dev_loader is None:
            return False
        for batch in dev_loader.epoch(seed=config.seed * 1_000_003 + epoch):
            outputs = sampler(state.params, batch.inputs,
                              jax.random.fold_in(rng, 777 + epoch))
            dev_eval(batch.inputs, None, None,
                     precomputed_metrics=dev_eval.compute_metrics(
                         outputs, dev_ds.unpack_labels(batch.labels)))
        print(f'[epoch {epoch}] dev report (sampled, {EVAL_SAMPLE_STEPS} steps):')
        final_dev = dev_eval.print_report(log_to_wandb=metric_logger is not None)
        return True

    def track_best(epoch: int) -> bool:
        """Same semantics as the regression loop (train/loop.py): the dev
        eval at epoch e scores the state AFTER epoch e-1; returns True
        when training should stop."""
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

    profiling = False
    if config.profile:
        import os as _os
        _os.makedirs(config.profile_dir, exist_ok=True)
        jax.profiler.start_trace(config.profile_dir)
        profiling = True
        logger.info('JAX profiler trace -> %s', config.profile_dir)

    stopped_early = False
    preempted = False
    for epoch in range(start_epoch, config.epochs):
        run_dev_eval(epoch)
        if track_best(epoch):
            stopped_early = True
            break

        if epoch_runner is not None:
            t_step = time.time()
            if ema is not None:
                state, ema, metrics = epoch_runner(
                    state, ema, jax.random.fold_in(rng, epoch))
            else:
                state, metrics = epoch_runner(state,
                                              jax.random.fold_in(rng, epoch))
            last_loss = float(metrics['loss'])
            n_steps = len(train_ds) // config.batch_size
            if metric_logger is not None:
                metric_logger.log({'train/diffusion_loss': last_loss,
                                   'epoch': epoch})
            compute_time += time.time() - t_step
            windows_seen += n_steps * config.batch_size
        else:
            for batch_idx, batch in enumerate(train_loader.epoch(
                    seed=config.seed * 1_000_003 + epoch)):
                if (max_batches_per_epoch is not None
                        and batch_idx >= max_batches_per_epoch):
                    break
                t_step = time.time()
                state, metrics = step(state, batch.inputs, batch.labels,
                                      jax.random.fold_in(rng, epoch * 1_000_000 + batch_idx))
                if ema is not None:
                    ema = ema_update(ema, state.params)
                last_loss = float(metrics['loss'])
                if batch_idx % config.log_every_batches == 0:
                    if metric_logger is not None:
                        metric_logger.log({'train/diffusion_loss': last_loss,
                                           'epoch': epoch, 'batch': batch_idx})
                    logger.info('epoch %d batch %d eps-mse %.6f',
                                epoch, batch_idx, last_loss)
                if batch_idx > 0 and batch_idx % config.checkpoint_every_batches == 0:
                    write_checkpoint(epoch, batch_idx)
                compute_time += time.time() - t_step
                windows_seen += config.batch_size
                if stop_requested['flag']:
                    break
        epochs_run += 1
        if profiling:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            profiling = False
            logger.info('profiler trace written to %s', config.profile_dir)
        print(f'[epoch {epoch}] eps-mse {last_loss:.6f}')
        write_checkpoint(epoch, 0)
        if stop_requested['flag']:
            preempted = True
            break

    # score the FINAL state too (the loop evals before each epoch only);
    # parity-gated on the beyond-parity flags like train/loop.py
    if ((config.keep_best or config.early_stop_patience)
            and not stopped_early and epochs_run > 0
            and run_dev_eval(config.epochs)):
        track_best(config.epochs)

    if profiling:   # zero epochs ran (e.g. resume already at --epochs)
        jax.profiler.stop_trace()
    if ckpt_async is not None:
        ckpt_async.wait()   # drain the in-flight background write
    if old_handler is not None:
        _signal.signal(_signal.SIGTERM, old_handler)
    if preempted:
        print('training preempted (SIGTERM): checkpoint written, resume '
              'with the same command')
    wps = windows_seen / compute_time if compute_time > 0 else 0.0
    return TrainResult(epochs_run=epochs_run,
                       final_train_metrics={'eps_mse': last_loss},
                       final_dev_metrics=final_dev,
                       windows_per_sec=wps,
                       preempted=preempted)
