"""Batch-inference HTTP server (beyond reference parity).

The reference has no serving story — its inference surfaces are
interactive commands (``visualize_file.py``, ``save_prediction_csv.py``).
This module provides the production path the task calls for: load the
latest checkpoint ONCE, compile bucketed batch forwards (static shapes —
XLA recompiles per shape, so batches are padded up to power-of-two
buckets), and answer HTTP requests with stdlib-only plumbing
(``http.server``); device work is serialized behind one lock (one
process owns the chip).

Endpoints:
  GET  /health         liveness + checkpoint provenance
  GET  /schema         input/label channel layouts and expected shapes
  POST /predict        raw packed windows: JSON ``{"inputs": [[[...]]]}``
                       ([B, T, C_in] nested lists) or
                       ``{"inputs_b64": <base64 float32 little-endian>,
                          "shape": [B, T, C_in]}``
  POST /predict_file   windows of a server-visible subject file:
                       ``{"file": path, "trial": n}`` (optional
                       ``"max_windows"``) — legacy ``.b3d`` files convert
                       on first touch like every other entry point.

Returned predictions use the reference's output-key schema
(``OutputDataKeys``, AddBiomechanicsDataset.py:29-42), each value
``[B, out_frames, C]`` nested lists (or base64 when the request asked
with ``"encoding": "b64"``).

Ensembles: constructed with ``ensemble=[dir_or_ckpt, ...]`` (CLI
``--ensemble``), every member runs in ONE vmapped forward per request —
the stacked-params mechanism of ``train/sweep.py`` — and /predict
returns the member MEAN; ``{"spread": true}`` adds the across-member
std per channel as an uncertainty estimate. Pairs naturally with a seed
sweep's per-config checkpoints.
"""

from __future__ import annotations

import base64
import json
import logging
import threading
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

from inferbiomechanics_tpu.config import Config
from inferbiomechanics_tpu.data.dataset import WindowDataset

logger = logging.getLogger(__name__)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1)).bit_length()


def _schema_run_config(checkpoint_dir: Optional[str]) -> Optional[dict]:
    """Provenance block for GET /schema: the run_config.json sidecar the
    served checkpoint dir was trained with (train/run_config.py), or
    None for pre-sidecar dirs / explicit checkpoint files with no
    sidecar next to them. Never raises — serving metadata must not die
    on a stale or hand-edited sidecar."""
    if not checkpoint_dir:
        return None
    try:
        from inferbiomechanics_tpu.train.run_config import load_run_config
        return load_run_config(checkpoint_dir)
    except Exception as e:  # sidecar is advisory provenance only
        logger.warning('run-config sidecar unreadable for /schema: %s', e)
        return None


class _DynamicBatcher:
    """Coalesce concurrent /predict requests into one device forward.

    Each handler thread enqueues its rows and blocks on an event; a
    single batcher thread drains the queue (waiting ``wait_ms`` after
    the first arrival so concurrent requests can pile in, the classic
    serving trade of a little latency for a lot of throughput), runs ONE
    padded forward for up to ``max_batch`` rows, and scatters the row
    slices back to the waiting requests. With the measured launch-bound
    forwards (BENCH_NOTES.md: a B=4096 forward costs barely more than a
    B=64 one) coalescing N small clients costs ~1 forward instead of N.
    """

    def __init__(self, service: 'InferenceService', wait_ms: float):
        self.service = service
        self.wait_s = max(0.0, wait_ms) / 1e3
        self._cv = threading.Condition()
        self._queue: list = []
        self._closed = False
        self.forwards = 0           # instrumentation (tests/telemetry)
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name='ib-serve-batcher')
        self._thread.start()

    def predict(self, x: np.ndarray, with_spread: bool):
        item = {'x': x, 'spread': with_spread, 'ev': threading.Event()}
        with self._cv:
            if self._closed or not self._thread.is_alive():
                raise RuntimeError('dynamic batcher is shut down')
            self._queue.append(item)
            self._cv.notify()
        # bounded wait + liveness recheck: if the batcher thread dies the
        # request must error out, not hang the HTTP handler forever
        while not item['ev'].wait(timeout=5.0):
            if not self._thread.is_alive():
                raise RuntimeError('dynamic batcher thread died; '
                                   'request abandoned')
        if 'err' in item:
            raise item['err']
        return item['out']

    def close(self):
        with self._cv:
            self._closed = True
            # fail any queued-but-unserved requests instead of leaving
            # their handler threads blocked
            for it in self._queue:
                it['err'] = RuntimeError('dynamic batcher shut down')
                it['ev'].set()
            self._queue.clear()
            self._cv.notify()

    def _run(self):
        import time
        while True:
            with self._cv:
                while not self._queue and not self._closed:
                    self._cv.wait()
                if self._closed and not self._queue:
                    return
            if self.wait_s:
                time.sleep(self.wait_s)     # let concurrent requests pile in
            with self._cv:
                group: list = []
                rows = 0
                while self._queue and rows + self._queue[0]['x'].shape[0] \
                        <= self.service.max_batch:
                    item = self._queue.pop(0)
                    group.append(item)
                    rows += item['x'].shape[0]
                if not group and self._queue:
                    # single oversized request: let predict_packed raise
                    group = [self._queue.pop(0)]
            if not group:
                continue
            try:
                x = np.concatenate([it['x'] for it in group]) \
                    if len(group) > 1 else group[0]['x']
                want_spread = any(it['spread'] for it in group)
                if want_spread:
                    out, spread = self.service.predict_packed(
                        x, with_spread=True)
                else:
                    out, spread = self.service.predict_packed(x), None
                self.forwards += 1
                off = 0
                for it in group:
                    n = it['x'].shape[0]
                    o = {k: v[off:off + n] for k, v in out.items()}
                    s = ({k: v[off:off + n] for k, v in spread.items()}
                         if spread is not None else None)
                    it['out'] = (o, s) if it['spread'] else o
                    off += n
            except Exception as e:   # propagate to every waiting request
                for it in group:
                    it['err'] = e
            finally:
                for it in group:
                    it['ev'].set()


class InferenceService:
    """Checkpointed model + bucketed, lock-serialized batch forward."""

    def __init__(self, config: Config, checkpoint_dir: str,
                 dataset: WindowDataset, max_batch: int = 4096,
                 ensemble: Optional[list] = None,
                 batch_wait_ms: float = 0.0,
                 sample_steps: int = 50,
                 quantize: Optional[str] = None,
                 use_ema: bool = False,
                 diffusion_samples: int = 1,
                 tta_mirror: bool = False,
                 diffusion_partial: Optional[float] = None,
                 init_checkpoint: Optional[str] = None):
        """``ensemble``: optional list of checkpoint dirs or ``.ckpt``
        files (e.g. the per-config checkpoints a seed sweep wrote). All
        members run as ONE vmapped forward per request — the same
        stacked-params mechanism as ``train/sweep.py`` — and /predict
        returns the ensemble MEAN plus (on request) the across-member
        std as an uncertainty estimate."""
        import os
        import jax
        import jax.numpy as jnp
        from inferbiomechanics_tpu.train import (
            create_train_state, load_latest_checkpoint, make_optimizer,
        )
        from inferbiomechanics_tpu.train.checkpoint import load_checkpoint_file
        from inferbiomechanics_tpu.train.loop import build_model_for_dataset

        if config.model_type == 'analytical':
            raise ValueError('serve supports learned models; the analytical '
                             'baseline needs per-subject skeletons — use '
                             '`analyze --model-type analytical` instead')
        if len(dataset) == 0:
            raise ValueError('schema dataset has no complete windows '
                             '(no .b3d files, or every trial is shorter '
                             'than --history-len); point --dataset-home at '
                             'data the model was built for')
        self.config = config
        self.ds = dataset
        self.max_batch = int(max_batch)
        self.is_diffusion = config.model_type == 'diffusion'
        self.sample_steps = int(sample_steps)
        self.diffusion_samples = int(diffusion_samples)
        if self.diffusion_samples < 1:
            raise ValueError('--diffusion-samples must be >= 1')
        if self.diffusion_samples > 1 and not self.is_diffusion:
            raise ValueError('--diffusion-samples applies to '
                             '--model-type diffusion')
        if diffusion_partial is not None and not self.is_diffusion:
            raise ValueError('--diffusion-partial applies to '
                             '--model-type diffusion')
        if init_checkpoint and diffusion_partial is None:
            raise ValueError('--init-checkpoint only does something with '
                             '--diffusion-partial (it seeds the truncated '
                             'DDIM chains)')
        if self.is_diffusion:
            if ensemble:
                raise ValueError('ensembles are not supported for diffusion '
                                 'serving (each member would run a full '
                                 'sampling chain); soup the checkpoints '
                                 'instead (convert-checkpoint --soup)')
            if config.output_data_format != 'all_frames':
                raise ValueError('serve --model-type diffusion requires '
                                 '--output-data-format all_frames '
                                 '(like diffusion training/analyze)')
        self.model = build_model_for_dataset(config, dataset)
        sample = dataset.gather(np.arange(min(8, len(dataset))))
        if self.is_diffusion:
            from inferbiomechanics_tpu.train.state import TrainState
            x_cond = jnp.asarray(sample.inputs)
            x0 = jnp.zeros((x_cond.shape[0], x_cond.shape[1],
                            self.model.target_channels))
            t0 = jnp.zeros((x_cond.shape[0],), jnp.int32)
            variables = self.model.init({'params': jax.random.PRNGKey(0)},
                                        x0, t0, x_cond)
            tx = make_optimizer(config.opt_type, config.learning_rate)
            self.state = TrainState(step=jnp.asarray(0, jnp.int32),
                                    params=variables['params'],
                                    opt_state=tx.init(variables['params']),
                                    batch_stats={}, tx=tx,
                                    apply_fn=self.model.apply)
        else:
            self.state = create_train_state(
                self.model, jax.random.PRNGKey(0), jnp.asarray(sample.inputs),
                make_optimizer(config.opt_type, config.learning_rate))
        self.members: list = []
        if ensemble:
            states = []
            for spec in ensemble:
                if os.path.isdir(spec):
                    st, e, b = load_latest_checkpoint(self.state, spec)
                    if e < 0:
                        raise ValueError(f'ensemble member {spec!r}: no '
                                         f'checkpoints found')
                else:
                    if not os.path.exists(spec):
                        raise FileNotFoundError(f'ensemble member {spec!r}')
                    st, e, b = load_checkpoint_file(self.state, spec)
                states.append(st)
                self.members.append({'path': spec, 'epoch': e, 'batch': b})
            self.state, self.epoch, self.batch = states[0], *max(
                (m['epoch'], m['batch']) for m in self.members)
            stack = lambda *xs: jnp.stack(xs)
            self._params_stack = jax.tree_util.tree_map(
                stack, *[s.params for s in states])
            self._bs_stack = (jax.tree_util.tree_map(
                stack, *[s.batch_stats for s in states])
                if states[0].batch_stats else {})
        else:
            from inferbiomechanics_tpu.train.run_config import (
                warn_on_architecture_mismatch,
            )
            warn_on_architecture_mismatch(config, checkpoint_dir, 'serve')
            self.state, self.epoch, self.batch = load_latest_checkpoint(
                self.state, checkpoint_dir)
            if self.epoch < 0:
                logger.warning('no checkpoint found in %s — serving an '
                               'UNTRAINED model', checkpoint_dir)
        self._checkpoint_dir = checkpoint_dir
        self.use_ema = bool(use_ema)
        if self.use_ema:
            from inferbiomechanics_tpu.train.checkpoint import (
                require_ema_params, resolve_checkpoint_path,
            )
            if self.members:
                raise ValueError('--use-ema serves a single checkpoint, '
                                 'not an ensemble')
            ema = require_ema_params(resolve_checkpoint_path(checkpoint_dir),
                                     self.state.params)
            self.state = self.state.replace(params=ema)

        has_bs = bool(self.state.batch_stats)
        self.quantize = quantize if quantize not in (None, 'none') else None
        if self.quantize:
            from inferbiomechanics_tpu.models.feedforward import (
                FeedForwardBaseline,
            )
            if self.quantize != 'int8':
                raise ValueError(f'unknown --quantize {self.quantize!r}; '
                                 f'expected int8')
            if self.is_diffusion or self.members:
                raise ValueError('--quantize int8 serves a single '
                                 'feedforward checkpoint (not diffusion '
                                 'or ensembles)')
            if not isinstance(self.model, FeedForwardBaseline):
                raise ValueError('--quantize int8 currently supports the '
                                 'feedforward family only')
        use_fused = bool(getattr(config, 'fused_inference', False))
        if use_fused and self.members:
            logger.warning('--fused-inference ignored for ensembles '
                           '(the fused kernel path is single-model)')
            use_fused = False
        if use_fused and not self.is_diffusion:
            from inferbiomechanics_tpu.models.transformer import (
                TransformerRegressor,
            )
            if not (isinstance(self.model, TransformerRegressor)
                    and self.model.attn_impl == 'vpu'
                    and self.model.d_model % 128 == 0):
                logger.warning('--fused-inference ignored: needs a vpu '
                               'transformer with d_model %% 128 == 0')
                use_fused = False
        self._use_fused = use_fused

        if self.is_diffusion:
            # a /predict is a full DDIM sampling chain conditioned on the
            # request windows (one lax.scan program; models/diffusion.py)
            from inferbiomechanics_tpu.models.diffusion import (
                checkpoint_target_space, make_sampler,
            )
            self.diffusion_partial = diffusion_partial
            tspace = checkpoint_target_space(self._checkpoint_dir)
            sampler = make_sampler(self.model, num_steps=self.sample_steps,
                                   fused_inference=use_fused,
                                   guidance_scale=config.guidance_scale,
                                   partial_frac=diffusion_partial,
                                   target_space=tspace)
            propose = None
            if diffusion_partial is not None:
                # Falcon-style warm start: chains begin at
                # diffusion_partial of the schedule from an all-frames
                # feedforward proposal — denoiser launches scale with the
                # fraction. The proposal params are a closure constant:
                # POST /reload swaps the DENOISER only.
                from inferbiomechanics_tpu.models.diffusion import (
                    make_partial_proposal_fn,
                )
                propose = make_partial_proposal_fn(
                    config, dataset, init_checkpoint, sample.inputs,
                    target_space=tspace)

            if self.diffusion_samples > 1:
                # aleatoric uncertainty: K independent sampling chains in
                # one vmapped program; /predict returns the across-sample
                # mean and (on request) std — the generative analogue of
                # the ensemble spread
                keys = jax.random.split(jax.random.PRNGKey(0),
                                        self.diffusion_samples)

                def fwd(params, bstats, x):
                    init = propose(x) if propose is not None else None
                    outs = jax.vmap(lambda k: sampler(params, x, k, init))(
                        keys)
                    mean = jax.tree_util.tree_map(lambda o: o.mean(0), outs)
                    spread = jax.tree_util.tree_map(lambda o: o.std(0), outs)
                    return mean, spread
            else:
                def fwd(params, bstats, x):
                    init = propose(x) if propose is not None else None
                    return sampler(params, x, jax.random.PRNGKey(0), init)
        elif self.quantize:
            # weights quantized ONCE here; the closure constants fold
            # into the compiled program as int8 tensors (ops/quant.py)
            from inferbiomechanics_tpu.ops.quant import (
                quantized_feedforward_forward,
            )
            qfwd = quantized_feedforward_forward(
                self.model, jax.device_get(self.state.params))

            def fwd(params, bstats, x):
                del params, bstats  # baked into the quantized closure
                return qfwd(x)
        else:
            # batch_stats rides as a jit ARGUMENT, not a closure constant:
            # a hot reload must swap batchnorm running stats along with
            # the params (stale closed-over stats would silently skew
            # every post-reload prediction)
            def fwd(params, bstats, x):
                if use_fused:
                    from inferbiomechanics_tpu.models.transformer import (
                        fused_transformer_forward,
                    )
                    return fused_transformer_forward(self.model, params, x)
                variables = {'params': params}
                if has_bs:
                    variables['batch_stats'] = bstats
                return self.model.apply(variables, x, train=False)

        self.tta_mirror = bool(tta_mirror)
        tta_wrap = None
        if self.tta_mirror:
            # mirror test-time augmentation (train/augment.py): average
            # the prediction with the un-mirrored prediction of the
            # mirrored window — one extra forward inside the same
            # compiled program. Composes with ensembles (each member is
            # symmetrized before the across-member mean/std).
            if self.is_diffusion or self.quantize:
                raise ValueError('--tta-mirror serves the learned-model '
                                 'paths (single model or ensemble; not '
                                 'diffusion or int8)')
            from inferbiomechanics_tpu.train.augment import (
                spec_from_dataset, tta_average,
            )
            tta_spec = spec_from_dataset(
                dataset, lateral_axis=getattr(config, 'mirror_lateral_axis',
                                              2))
            lab_offsets = dataset.lab_offsets

            def tta_wrap(base):
                # base(*head, x) -> output dict; x is always last
                return tta_average(tta_spec, lab_offsets, base)

            if not self.members:
                fwd = tta_wrap(fwd)

        if self.members:
            has_bs = bool(self._bs_stack)

            def one(p, bs, x):
                variables = {'params': p}
                if has_bs:
                    variables['batch_stats'] = bs
                return self.model.apply(variables, x, train=False)

            if tta_wrap is not None:
                one = tta_wrap(one)

            def fwd_ens(params_stack, bs_stack, x):
                outs = jax.vmap(one, in_axes=(0, 0 if has_bs else None,
                                              None))(
                    params_stack, bs_stack if has_bs else None, x)
                mean = jax.tree_util.tree_map(lambda o: o.mean(0), outs)
                spread = jax.tree_util.tree_map(lambda o: o.std(0), outs)
                return mean, spread

            self._fwd_ens = jax.jit(fwd_ens)
        self._fwd = jax.jit(fwd)
        # multi-chip serving: on a multi-device host the request batch is
        # sharded across the mesh's data axis — GSPMD splits the forward
        # (throughput scales with the chip count) and gathers the outputs
        # on fetch. Params stay replicated; single-chip behavior is
        # unchanged.
        self.mesh = None
        if len(jax.devices()) > 1:
            from inferbiomechanics_tpu.parallel import (
                batch_sharding, make_mesh,
            )
            self.mesh = make_mesh()
            self._x_sharding = batch_sharding(self.mesh)
            self._n_dp = int(self.mesh.shape['data'])
            if self.max_batch % self._n_dp:
                # keep max_batch an exact compile-bucket/HBM ceiling: the
                # divisibility round-up must never push a padded batch
                # past it
                aligned = max(self._n_dp,
                              (self.max_batch // self._n_dp) * self._n_dp)
                logger.warning('--max-batch %d not divisible by the %d-way '
                               'data axis; aligning to %d',
                               self.max_batch, self._n_dp, aligned)
                self.max_batch = aligned
        self._lock = threading.Lock()
        # dynamic batching: coalesce concurrent /predict requests into one
        # forward (enabled by batch_wait_ms > 0, CLI --batch-wait-ms)
        self.batcher = (_DynamicBatcher(self, batch_wait_ms)
                        if batch_wait_ms > 0 else None)
        # /metrics counters (lock-protected; latencies in a bounded ring)
        self._stats_lock = threading.Lock()
        self.stats = {'requests': 0, 'rows': 0, 'errors': 0,
                      'device_forwards': 0}
        self._latencies_ms: list = []
        # file-mode dataset cache: path -> WindowDataset, LRU-bounded so a
        # long-running server can't grow host RAM without limit; its own
        # lock since ThreadingHTTPServer handlers race on first requests
        self._file_ds: 'OrderedDict[str, WindowDataset]' = OrderedDict()
        self._file_ds_lock = threading.Lock()
        self._file_ds_cap = 4

    def reload(self) -> dict:
        """Hot-swap to the newest checkpoint in the service's checkpoint
        dir (``POST /reload``). Parameters are per-call jit arguments, so
        the swap costs zero recompilation; in-flight forwards finish on
        the old params (the swap serializes on the device lock). No-op
        when the newest checkpoint is already being served."""
        from inferbiomechanics_tpu.train.checkpoint import (
            list_checkpoints, load_checkpoint_file, require_ema_params,
        )
        if self.members:
            raise ValueError('reload serves a single checkpoint dir; '
                             'restart the server to change an ensemble')
        if self.quantize:
            raise ValueError('reload is not supported with --quantize '
                             '(weights are baked into the compiled '
                             'program); restart the server')
        # metadata-only currency check: a no-op poll must not read (let
        # alone deserialize) a possibly-huge checkpoint file
        ckpts = list_checkpoints(self._checkpoint_dir)
        if not ckpts or (ckpts[-1][0], ckpts[-1][1]) == (self.epoch,
                                                         self.batch):
            return {'reloaded': False, 'epoch': self.epoch,
                    'batch': self.batch}
        epoch, batch, path = ckpts[-1]
        # load params and (optionally) EMA from the SAME file — resolving
        # the dir twice could straddle a concurrent checkpoint write
        new_state, epoch, batch = load_checkpoint_file(self.state, path)
        if self.use_ema:
            ema = require_ema_params(path, new_state.params)
            new_state = new_state.replace(params=ema)
        with self._lock:
            self.state = new_state
            self.epoch, self.batch = epoch, batch
        logger.info('reloaded checkpoint epoch %d batch %d', epoch, batch)
        return {'reloaded': True, 'epoch': epoch, 'batch': batch}

    def warmup(self) -> None:
        """Pre-compile every power-of-two batch bucket (``--warmup``).

        XLA compiles one executable per padded batch shape; without this
        the FIRST request of each size pays the compile — seconds
        normally, minutes on a degraded backend. One pass of zeros
        through ``predict_packed`` per bucket exercises the exact
        pad/shard path requests take."""
        import time as _time
        sizes, b = [], 1
        while b < self.max_batch:
            sizes.append(b)
            b <<= 1
        sizes.append(self.max_batch)
        t0 = _time.time()
        shape = (self.ds.num_model_frames, self.ds.num_input_channels)
        for bsz in sizes:
            self.predict_packed(np.zeros((bsz,) + shape, np.float32))
        logger.info('warmup: %d batch buckets compiled in %.1fs',
                    len(sizes), _time.time() - t0)

    def start_reload_poller(self, poll_sec: float) -> None:
        """Background thread: poll the checkpoint dir every ``poll_sec``
        and hot-swap when a newer checkpoint lands (``--reload-poll-sec``)
        — train in one process, serve always-freshest in another, no
        operator in the loop. Errors are logged, never fatal."""
        if poll_sec <= 0:
            return
        if self.members or self.quantize:
            raise ValueError('--reload-poll-sec cannot work here: reload '
                             'is unsupported for '
                             + ('ensembles' if self.members else
                                '--quantize services'))

        def loop():
            import time as _time
            while not getattr(self, '_poller_stop', False):
                _time.sleep(poll_sec)
                try:
                    r = self.reload()
                    if r.get('reloaded'):
                        logger.info('reload poller: now serving epoch %d '
                                    'batch %d', r['epoch'], r['batch'])
                except Exception as e:    # pragma: no cover - defensive
                    logger.warning('reload poller: %s', e)

        self._poller_stop = False
        self._poller = threading.Thread(target=loop, daemon=True,
                                        name='ib-serve-reload-poller')
        self._poller.start()

    def record_request(self, rows: int, dt_ms: float, error: bool) -> None:
        with self._stats_lock:
            self.stats['requests'] += 1
            self.stats['rows'] += rows
            self.stats['errors'] += int(error)
            self._latencies_ms.append(dt_ms)
            if len(self._latencies_ms) > 4096:
                del self._latencies_ms[:2048]

    def metrics(self) -> dict:
        with self._stats_lock:
            lat = sorted(self._latencies_ms)
            out = dict(self.stats)
        if lat:
            pick = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))]
            out['latency_ms'] = {'p50': round(pick(0.50), 2),
                                 'p90': round(pick(0.90), 2),
                                 'p99': round(pick(0.99), 2),
                                 'max': round(lat[-1], 2)}
        return out

    # -- raw packed windows --------------------------------------------------

    def predict(self, x: np.ndarray, with_spread: bool = False):
        """Request-facing entry: through the dynamic batcher when enabled
        (shape-validated FIRST so bad requests fail fast, not in the
        batcher thread where they would poison a coalesced group)."""
        if self.batcher is not None:
            self._validate(x)
            return self.batcher.predict(x, with_spread)
        return self.predict_packed(x, with_spread)

    def _validate(self, x: np.ndarray) -> None:
        ds = self.ds
        if x.ndim != 3 or x.shape[1] != ds.num_model_frames \
                or x.shape[2] != ds.num_input_channels:
            raise ValueError(
                f'inputs must be [B, {ds.num_model_frames}, '
                f'{ds.num_input_channels}] (got {list(x.shape)}); '
                f'GET /schema describes the channel layout')
        if x.shape[0] == 0:
            raise ValueError('empty batch')
        if x.shape[0] > self.max_batch:
            raise ValueError(f'batch {x.shape[0]} exceeds max_batch '
                             f'{self.max_batch}; split the request')

    def predict_packed(self, x: np.ndarray, with_spread: bool = False):
        """[B, T, C_in] float32 -> output dict, each [B, out_frames, C].

        With ``with_spread=True`` returns ``(outputs, spread)`` where
        spread holds the across-ensemble std per output channel
        (zeros-shaped ``None`` for single-model services)."""
        import jax
        import jax.numpy as jnp

        self._validate(x)
        b = x.shape[0]
        bp = min(_next_pow2(b), self.max_batch)
        if self.mesh is not None:
            # keep the padded batch divisible by the data axis so it
            # shards evenly (compile buckets stay pow2-aligned)
            bp = max(bp, self._n_dp)
            bp = -(-bp // self._n_dp) * self._n_dp
        if bp != b:
            x = np.concatenate(
                [x, np.zeros((bp - b,) + x.shape[1:], np.float32)])
        spread = None
        with self._stats_lock:
            self.stats['device_forwards'] += 1
        with self._lock:
            xj = jnp.asarray(x, jnp.float32)
            if self.mesh is not None:
                xj = jax.device_put(xj, self._x_sharding)
            if self.members:
                out, spread = jax.device_get(self._fwd_ens(
                    self._params_stack, self._bs_stack, xj))
            elif self.diffusion_samples > 1:
                out, spread = jax.device_get(self._fwd(
                    self.state.params, self.state.batch_stats, xj))
            else:
                out = jax.device_get(self._fwd(
                    self.state.params, self.state.batch_stats, xj))
        out = {k: np.asarray(v)[:b] for k, v in out.items()}
        if with_spread:
            if spread is not None:
                spread = {k: np.asarray(v)[:b] for k, v in spread.items()}
            return out, spread
        return out

    # -- server-visible subject files ----------------------------------------

    def predict_file(self, path: str, trial: int,
                     max_windows: Optional[int] = None) -> dict:
        with self._file_ds_lock:
            ds = self._file_ds.get(path)
            if ds is not None:
                self._file_ds.move_to_end(path)
        if ds is None:
            ds = WindowDataset(path, window_size=self.config.window_size,
                               stride=self.config.stride,
                               output_data_format=self.config.output_data_format,
                               skip_loading_skeletons=True,
                               materialize_features=False)
            with self._file_ds_lock:
                self._file_ds[path] = ds
                while len(self._file_ds) > self._file_ds_cap:
                    self._file_ds.popitem(last=False)
        if ds.num_input_channels != self.ds.num_input_channels:
            raise ValueError(
                f'{path}: {ds.num_input_channels} input channels, model '
                f'expects {self.ds.num_input_channels}')
        mask = (ds.win_subject == 0) & (ds.win_trial == int(trial))
        idx = np.nonzero(mask)[0]
        if idx.size == 0:
            raise ValueError(f'{path}: no complete windows in trial {trial}')
        if max_windows:
            idx = idx[:int(max_windows)]
        outs = []
        for i in range(0, idx.size, self.max_batch):
            batch = ds.gather(idx[i:i + self.max_batch])
            outs.append(self.predict_packed(np.asarray(batch.inputs)))
        outputs = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
        starts = ds.win_start[idx]
        last = starts + (ds.num_model_frames - 1) * ds.stride
        return {'window_starts': starts, 'last_frame': last,
                'outputs': outputs}

    # -- metadata --------------------------------------------------------------

    def schema(self) -> dict:
        ds = self.ds
        return {
            'model_type': self.config.model_type,
            'checkpoint': {'epoch': self.epoch, 'batch': self.batch},
            'ensemble': {'size': len(self.members),
                         'members': self.members} if self.members else None,
            'diffusion_sample_steps': (self.sample_steps
                                       if self.is_diffusion else None),
            'diffusion_samples': (self.diffusion_samples
                                  if self.is_diffusion else None),
            'fused_inference': self._use_fused,
            'quantize': self.quantize,
            'use_ema': self.use_ema,
            'mesh_devices': (int(np.prod(list(self.mesh.shape.values())))
                             if self.mesh is not None else 1),
            'window_size': ds.window_size,
            'stride': ds.stride,
            'num_model_frames': ds.num_model_frames,
            'num_dofs': ds.num_dofs,
            'contact_bodies': list(ds.contact_bodies),
            'num_input_channels': ds.num_input_channels,
            'input_layout': [{'key': k, 'width': w} for k, w in ds.in_layout],
            'label_layout': [{'key': k, 'width': w} for k, w in ds.lab_layout],
            'output_data_format': self.config.output_data_format,
            'max_batch': self.max_batch,
            'dynamic_batching': (None if self.batcher is None else
                                 {'wait_ms': self.batcher.wait_s * 1e3,
                                  'forwards': self.batcher.forwards}),
            # provenance: what the served checkpoint dir was trained as
            # (train/run_config.py sidecar; None for pre-sidecar dirs)
            'run_config': _schema_run_config(self._checkpoint_dir),
        }


# -----------------------------------------------------------------------------
# HTTP layer
# -----------------------------------------------------------------------------

def _decode_inputs(payload: dict) -> np.ndarray:
    if 'inputs_b64' in payload:
        shape = payload.get('shape')
        if not (isinstance(shape, list) and len(shape) == 3):
            raise ValueError('inputs_b64 requires "shape": [B, T, C]')
        raw = base64.b64decode(payload['inputs_b64'])
        x = np.frombuffer(raw, dtype='<f4')
        if x.size != int(np.prod(shape)):
            raise ValueError(f'inputs_b64 carries {x.size} floats, '
                             f'shape {shape} needs {int(np.prod(shape))}')
        return x.reshape(shape).astype(np.float32)
    if 'inputs' in payload:
        return np.asarray(payload['inputs'], np.float32)
    raise ValueError('request needs "inputs" or "inputs_b64"')


def _encode_outputs(outputs: Dict[str, np.ndarray], encoding: str) -> dict:
    if encoding == 'b64':
        return {k: {'b64': base64.b64encode(
                        np.ascontiguousarray(v, '<f4').tobytes()).decode(),
                    'shape': list(v.shape)}
                for k, v in outputs.items()}
    return {k: np.asarray(v, np.float32).tolist() for k, v in outputs.items()}


def make_handler(service: InferenceService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):   # route through logging, not stderr
            logger.info('%s %s', self.address_string(), fmt % args)

        def _send(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/health':
                self._send(200, {'status': 'ok',
                                 'model': service.config.model_type,
                                 'epoch': service.epoch,
                                 'batch': service.batch,
                                 'ensemble_size': len(service.members)})
            elif self.path == '/schema':
                self._send(200, service.schema())
            elif self.path == '/metrics':
                self._send(200, service.metrics())
            else:
                self._send(404, {'error': f'unknown path {self.path}'})

        def do_POST(self):
            import time
            t_start = time.time()
            rows = 0
            ok = False
            try:
                n = int(self.headers.get('Content-Length', 0))
                payload = json.loads(self.rfile.read(n) or b'{}')
            except (ValueError, json.JSONDecodeError) as e:
                service.record_request(0, (time.time() - t_start) * 1e3,
                                       error=True)
                return self._send(400, {'error': f'bad JSON: {e}'})
            encoding = payload.get('encoding', 'json')
            try:
                if self.path == '/predict':
                    x = _decode_inputs(payload)
                    rows = int(x.shape[0])
                    want_spread = bool(payload.get('spread'))
                    if want_spread:
                        out, spread = service.predict(x, with_spread=True)
                    else:
                        out, spread = service.predict(x), None
                    resp = {'outputs': _encode_outputs(out, encoding),
                            'batch': rows}
                    if want_spread:
                        # across-ensemble std per channel; all-zeros has no
                        # meaning for a single model, so null there
                        resp['spread'] = (_encode_outputs(spread, encoding)
                                          if spread is not None else None)
                    ok = True
                    self._send(200, resp)
                elif self.path == '/reload':
                    resp = service.reload()
                    ok = True
                    self._send(200, resp)
                elif self.path == '/predict_file':
                    if 'file' not in payload:
                        raise ValueError('request needs "file"')
                    res = service.predict_file(
                        payload['file'], payload.get('trial', 0),
                        payload.get('max_windows'))
                    rows = len(res['window_starts'])
                    ok = True
                    self._send(200, {
                        'window_starts': res['window_starts'].tolist(),
                        'last_frame': res['last_frame'].tolist(),
                        'outputs': _encode_outputs(res['outputs'], encoding)})
                else:
                    self._send(404, {'error': f'unknown path {self.path}'})
            except ValueError as e:
                self._send(400, {'error': str(e)})
            except FileNotFoundError as e:
                self._send(404, {'error': str(e)})
            except Exception as e:   # pragma: no cover — last-resort guard
                logger.exception('predict failed')
                self._send(500, {'error': f'{type(e).__name__}: {e}'})
            finally:
                service.record_request(rows, (time.time() - t_start) * 1e3,
                                       error=not ok)

    return Handler


def serve(service: InferenceService, host: str = '127.0.0.1',
          port: int = 8090) -> ThreadingHTTPServer:
    """Build (and return) the HTTP server; caller runs serve_forever()."""
    server = ThreadingHTTPServer((host, port), make_handler(service))
    logger.info('serving %s on http://%s:%d (max_batch=%d)',
                service.config.model_type, host, server.server_address[1],
                service.max_batch)
    return server
