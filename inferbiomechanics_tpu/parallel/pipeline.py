"""Pipeline parallelism for the transformer family (GPipe-style, SPMD).

Capability: the reference scales only by data parallelism (DDP over NCCL,
src/cli/train.py:175 — one replica per GPU, whole model per device). On a
TPU pod the idiomatic extra axis is *pipeline* parallelism: encoder layers
are partitioned into S stages along a ``pipe`` mesh axis, microbatches
stream through the stages, and ``jax.lax.ppermute`` shifts activations
stage-to-stage over ICI. This module implements that as one SPMD program
under ``jax.shard_map`` — no per-stage processes, no point-to-point send/
recv code; XLA lowers the whole schedule (including the transposed
backward pipeline, which ``jax.grad`` derives automatically from the
forward ``lax.scan`` + ``ppermute``) into a single executable.

Design notes (scaling-book pipelining recipe):
- Per-layer parameters are stacked on a leading ``[L, ...]`` axis and
  sharded ``P('pipe')`` — each device holds ``L/S`` layers. The embedding
  / output heads ("rest") are replicated; they are computed redundantly
  on every stage (a few 1000-FLOP matmuls) so the only inter-stage
  traffic is the ``[mb, T, d_model]`` activation ppermute per tick.
- GPipe schedule: ``M + S - 1`` ticks for M microbatches; bubble fraction
  ``(S-1)/(M+S-1)``. The loss is evaluated on the last stage only and
  replicated with a masked ``psum`` (a scalar — cheaper than psumming the
  ``[M, mb, T, D]`` output buffer, which only the forward/eval path pays).
- Gradients w.r.t. the replicated "rest" params are auto-psummed across
  the mesh by the transpose of their broadcast (jax VMA semantics);
  stage-stacked gradients stay ``P('pipe')``-sharded. No explicit
  collectives appear in the step besides the activation ppermute.

Mesh axes are ``('data', 'pipe')`` so dp x pp compose: the batch is
sharded over ``data`` and every pipe stage sees the full local shard.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from inferbiomechanics_tpu.data import keys as K
from inferbiomechanics_tpu.data.dataset import unpack
from inferbiomechanics_tpu.loss.evaluator import LossConfig, loss_and_metrics
from inferbiomechanics_tpu.models.common import pack_inputs, slice_output_heads
from inferbiomechanics_tpu.parallel.mesh import DATA_AXIS
from inferbiomechanics_tpu.train.state import TrainState

PIPE_AXIS = 'pipe'

try:                                        # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:                         # pragma: no cover - old jax
    from jax.experimental.shard_map import shard_map as _shard_map


def make_pipeline_mesh(n_devices: Optional[int] = None, pipe: int = 2,
                       devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(data, pipe)`` mesh. ``pipe`` consecutive devices form one
    pipeline so the activation ppermute rides neighbouring ICI links."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % pipe != 0:
        raise ValueError(f'{n} devices not divisible by pipe={pipe}')
    arr = np.array(devs).reshape(n // pipe, pipe)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


# ---------------------------------------------------------------------------
# Parameter restructuring: canonical flax tree <-> {stages: [L,...], rest}
# ---------------------------------------------------------------------------

def to_pipeline_params(params, num_layers: int):
    """Canonical ``TransformerRegressor`` param tree -> pipeline layout.

    Returns ``{'stages': <EncoderBlock tree stacked on a leading [L] axis>,
    'rest': <everything else>}``. The stacked axis is what gets sharded
    ``P('pipe')``; checkpoints always store the canonical layout (see
    ``to_canonical_params``) so pipeline training interoperates with every
    other consumer (serve / analyze / convert-checkpoint).
    """
    layers = [params[f'EncoderBlock_{i}'] for i in range(num_layers)]
    stages = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    rest = {k: v for k, v in params.items()
            if not k.startswith('EncoderBlock_')}
    return {'stages': stages, 'rest': rest}


def to_canonical_params(pp_params, num_layers: int):
    """Inverse of ``to_pipeline_params`` (for checkpointing / serving)."""
    out = dict(pp_params['rest'])
    for i in range(num_layers):
        out[f'EncoderBlock_{i}'] = jax.tree_util.tree_map(
            lambda a, i=i: a[i], pp_params['stages'])
    return out


def shard_pipeline_params(mesh: Mesh, pp_params):
    """Place pipeline params: stage stack split on ``pipe``, rest replicated."""
    st = NamedSharding(mesh, P(PIPE_AXIS))
    rep = NamedSharding(mesh, P())
    return {
        'stages': jax.tree_util.tree_map(
            lambda a: jax.device_put(a, st), pp_params['stages']),
        'rest': jax.tree_util.tree_map(
            lambda a: jax.device_put(a, rep), pp_params['rest']),
    }


# ---------------------------------------------------------------------------
# Replicated pre/post computation (embedding + final LN + heads)
# ---------------------------------------------------------------------------

def _pre_encoder(model, rest, x):
    """Input projection + learned temporal embedding (replicated on every
    stage; mirrors TransformerRegressor.__call__ pre-encoder math)."""
    dt = model.compute_dtype
    x = pack_inputs(x)
    h = (x.astype(dt) @ rest['Dense_0']['kernel'].astype(dt)
         + rest['Dense_0']['bias'].astype(dt))
    return h + rest['temporal_embedding'].astype(dt)[None]


def _post_encoder(model, rest, h) -> Dict[str, jax.Array]:
    """Final LayerNorm + output heads (mirrors the module's post-encoder
    math; numerics identical to ``fused_transformer_forward``'s tail)."""
    dt = model.compute_dtype
    h = h.astype(jnp.float32)
    ln = rest['LayerNorm_0']
    mean = h.mean(-1, keepdims=True)
    var = ((h - mean) ** 2).mean(-1, keepdims=True)
    # flax nn.LayerNorm(dtype=bf16) applies scale/bias in f32 and casts
    # ONCE at the end — verified bitwise against the installed flax with
    # non-identity scale/bias (casting before the affine deviates ~3e-2)
    h = ((h - mean) * jax.lax.rsqrt(var + 1e-6)
         * ln['scale'] + ln['bias']).astype(dt)
    if model.output_data_format != 'all_frames':
        h = h[:, -1:, :]

    def head(name):
        return (h @ rest[name]['kernel'].astype(dt)
                + rest[name]['bias'].astype(dt)).astype(jnp.float32)

    main = head('contact_head')
    out = slice_output_heads(main, model.num_contact_bodies, main.shape[1])
    if model.predict_tau:
        out[K.OutputDataKeys.TAU] = head('tau_head')
    if model.predict_com_acc:
        out[K.OutputDataKeys.COM_ACC_IN_ROOT_FRAME] = head('com_acc_head')
    if model.predict_contact:
        out[K.OutputDataKeys.CONTACT] = head('contact_cls_head')
    return out


def _make_stage_fn(model, layers_per_stage: int, remat: bool) -> Callable:
    """One pipeline stage: apply this device's ``L/S`` encoder layers."""
    from inferbiomechanics_tpu.models.transformer import EncoderBlock
    blk = EncoderBlock(model.d_model, model.num_heads, model.mlp_ratio,
                       0.0, model.compute_dtype, model.attn_impl)

    def stage(stacked_local, h):
        for i in range(layers_per_stage):
            lp = jax.tree_util.tree_map(lambda a, i=i: a[i], stacked_local)
            h = blk.apply({'params': lp}, h, train=False)
        return h

    return jax.checkpoint(stage) if remat else stage


def _pvary(tree, axes: Tuple[str, ...]):
    """Mark values device-varying over ``axes`` (jax VMA semantics): the
    scan carry must have a fixed varying-set, so the zero-initialized
    buffers are promoted up front to match the tick outputs."""
    if hasattr(jax.lax, 'pcast'):
        f = lambda x: jax.lax.pcast(x, axes, to='varying')
    else:                                   # pragma: no cover - old jax
        f = lambda x: jax.lax.pvary(x, axes)
    return jax.tree_util.tree_map(f, tree)


def _pipeline_encoder(stage_fn, stages_local, xs, n_stages: int,
                      num_micro: int):
    """The GPipe schedule under shard_map: scan ``M + S - 1`` ticks, feed
    microbatch t at stage 0, collect finished outputs at stage S-1, shift
    activations with ppermute. ``xs`` is ``[M, mb, T, D]`` (embedded).
    Returns the ``[M, mb, T, D]`` output buffer, valid on the LAST stage
    only (zeros elsewhere) — callers mask or psum as needed."""
    idx = jax.lax.axis_index(PIPE_AXIS)
    perm = [(i, i + 1) for i in range(n_stages - 1)]
    xs = _pvary(xs, (PIPE_AXIS,))
    carry0 = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs))

    def tick(carry, t):
        buf, ys = carry
        feed = jax.lax.dynamic_index_in_dim(
            xs, jnp.clip(t, 0, num_micro - 1), 0, keepdims=False)
        inp = jnp.where(idx == 0, feed, buf)
        out = stage_fn(stages_local, inp)
        ot = t - (n_stages - 1)
        upd = jax.lax.dynamic_update_index_in_dim(
            ys, out, jnp.clip(ot, 0, num_micro - 1), 0)
        ys = jnp.where((idx == n_stages - 1) & (ot >= 0), upd, ys)
        if perm:
            buf = jax.lax.ppermute(out, PIPE_AXIS, perm)
        else:                       # S == 1: degenerate single-stage pipe
            buf = out
        return (buf, ys), None

    (_, ys), _ = jax.lax.scan(tick, carry0,
                              jnp.arange(num_micro + n_stages - 1))
    if n_stages == 1:
        return ys
    return jnp.where(idx == n_stages - 1, ys, jnp.zeros_like(ys))


def _check(model, mesh: Mesh, batch: int, num_micro: int):
    n_stages = int(mesh.shape[PIPE_AXIS])
    n_dp = int(mesh.shape[DATA_AXIS])
    if model.num_layers % n_stages:
        raise ValueError(f'num_layers={model.num_layers} not divisible by '
                         f'pipe={n_stages}')
    if getattr(model, 'dropout', 0.0):
        raise ValueError('pipeline parallelism requires dropout == 0 '
                         '(stages run without per-layer RNG plumbing)')
    if batch % (n_dp * num_micro):
        raise ValueError(f'batch {batch} not divisible by data axis '
                         f'({n_dp}) x microbatches ({num_micro})')
    return n_stages, n_dp


def make_pipeline_forward(model, mesh: Mesh,
                          num_microbatches: Optional[int] = None,
                          remat: bool = False) -> Callable:
    """Build ``forward(pp_params, x) -> outputs`` (jitted, eval/serving).

    ``x`` is the packed ``[B, T, C_in]`` batch sharded on ``data``; outputs
    are batch-sharded and pipe-replicated (the last stage's buffer is
    psum-broadcast so every device can run the heads)."""
    n_stages = int(mesh.shape[PIPE_AXIS])
    num_micro = num_microbatches or 2 * n_stages
    stage_fn = _make_stage_fn(model, model.num_layers // n_stages, remat)

    def fwd_impl(pp_params, x):
        n_s = n_stages

        def shard_fn(stages_local, rest, x_local):
            h = _pre_encoder(model, rest, x_local)
            bl, t, d = h.shape
            xs = h.reshape(num_micro, bl // num_micro, t, d)
            ys = _pipeline_encoder(stage_fn, stages_local, xs, n_s,
                                   num_micro)
            ys = jax.lax.psum(ys, PIPE_AXIS)     # masked: only last stage
            return _post_encoder(model, rest, ys.reshape(bl, t, d))

        return _shard_map(shard_fn, mesh=mesh,
                          in_specs=(P(PIPE_AXIS), P(), P(DATA_AXIS)),
                          out_specs=P(DATA_AXIS))(
            pp_params['stages'], pp_params['rest'], x)

    jitted = jax.jit(fwd_impl)

    def fwd(pp_params, x):
        _check(model, mesh, x.shape[0], num_micro)
        return jitted(pp_params, x)

    return fwd


def make_pipeline_train_step(model, lab_offsets: Dict[str, Tuple[int, int]],
                             loss_config: LossConfig, mesh: Mesh,
                             num_microbatches: Optional[int] = None,
                             remat: bool = False,
                             donate: bool = True,
                             augment=None) -> Callable:
    """Build ``step(state, inputs, labels, rng) -> (state, metrics)`` with
    the encoder pipelined over the ``pipe`` mesh axis and the batch
    sharded over ``data``. ``state.params`` must be in pipeline layout
    (``create_pipeline_state``). ``jax.grad`` through the scheduled scan
    yields the reverse (backward) pipeline automatically.

    ``augment`` (an ``augment.Augmenter``) runs on the global batch at
    the jit level BEFORE the shard_map — GSPMD partitions it over the
    data axis, which keeps the draw bit-identical to the plain
    (non-pipelined) step with the same rng."""
    n_stages = int(mesh.shape[PIPE_AXIS])
    num_micro = num_microbatches or 2 * n_stages
    stage_fn = _make_stage_fn(model, model.num_layers // n_stages, remat)

    def shard_loss(stages_local, rest, x_local, y_local):
        n_s = n_stages
        idx = jax.lax.axis_index(PIPE_AXIS)
        h = _pre_encoder(model, rest, x_local)
        bl, t, d = h.shape
        xs = h.reshape(num_micro, bl // num_micro, t, d)
        ys = _pipeline_encoder(stage_fn, stages_local, xs, n_s, num_micro)
        outputs = _post_encoder(model, rest, ys.reshape(bl, t, d))
        labels = unpack(y_local, lab_offsets)
        loss, metrics = loss_and_metrics(outputs, labels, loss_config)
        # loss/metrics are garbage on every stage but the last: mask, then
        # replicate with a scalar psum (cheap — no activation broadcast)
        sel = (idx == n_s - 1)
        loss = jax.lax.psum(jnp.where(sel, loss, 0.0), PIPE_AXIS)
        metrics = jax.tree_util.tree_map(
            lambda m: jax.lax.pmean(
                jax.lax.psum(jnp.where(sel, m, jnp.zeros_like(m)),
                             PIPE_AXIS), DATA_AXIS), metrics)
        return jax.lax.pmean(loss, DATA_AXIS), metrics

    smapped = _shard_map(shard_loss, mesh=mesh,
                         in_specs=(P(PIPE_AXIS), P(), P(DATA_AXIS),
                                   P(DATA_AXIS)),
                         out_specs=(P(), P()))

    def step_impl(state: TrainState, batch_inputs: jax.Array,
                  batch_labels: jax.Array, rng: jax.Array):
        from inferbiomechanics_tpu.train.augment import maybe_augment
        xi, yi = maybe_augment(augment, batch_inputs, batch_labels, rng)

        def loss_fn(params):
            return smapped(params['stages'], params['rest'], xi, yi)

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), metrics

    jitted = jax.jit(step_impl, donate_argnums=(0,) if donate else ())

    def step(state: TrainState, batch_inputs: jax.Array,
             batch_labels: jax.Array, rng: jax.Array = None):
        _check(model, mesh, batch_inputs.shape[0], num_micro)
        if rng is None:                       # dropout rejected in _check;
            rng = jax.random.PRNGKey(0)       # rng only feeds augmentation
        return jitted(state, batch_inputs, batch_labels, rng)

    return step


def _map_paramlike(tree, is_target, fn):
    """Rebuild a (possibly optax-NamedTuple-nested) tree, applying ``fn``
    to every sub-tree ``is_target`` recognizes as a params-shaped dict.
    Optimizer moments (adam mu/nu, rmsprop nu, ...) structurally mirror
    the params dict, so one converter restructures the whole TrainState
    between canonical and pipeline layouts."""
    if isinstance(tree, dict):
        if is_target(tree):
            return fn(tree)
        return {k: _map_paramlike(v, is_target, fn) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        vals = [_map_paramlike(v, is_target, fn) for v in tree]
        if hasattr(tree, '_fields'):          # optax NamedTuple states
            return type(tree)(*vals)
        return type(tree)(vals)
    return tree


def _is_canonical(tree) -> bool:
    return isinstance(tree, dict) and 'EncoderBlock_0' in tree


def _is_pipeline(tree) -> bool:
    return (isinstance(tree, dict) and set(tree) == {'stages', 'rest'}
            and isinstance(tree.get('rest'), dict))


def pipeline_trainstate_from_canonical(state: TrainState, mesh: Mesh,
                                       num_layers: int) -> TrainState:
    """Convert a canonical TrainState (params + matching optimizer
    moments) into sharded pipeline layout — the resume path: checkpoints
    always store the canonical layout."""
    conv = lambda p: shard_pipeline_params(
        mesh, to_pipeline_params(p, num_layers))
    rep = NamedSharding(mesh, P())
    return state.replace(
        params=conv(state.params),
        opt_state=_map_paramlike(state.opt_state, _is_canonical, conv),
        step=jax.device_put(state.step, rep))


def canonical_trainstate_from_pipeline(state: TrainState,
                                       num_layers: int) -> TrainState:
    """Inverse of ``pipeline_trainstate_from_canonical`` (the checkpoint-
    save path; also lets analyze/serve consume pipeline-trained runs)."""
    conv = lambda p: to_canonical_params(p, num_layers)
    return state.replace(
        params=conv(state.params),
        opt_state=_map_paramlike(state.opt_state, _is_pipeline, conv))


def create_pipeline_state(model, rng: jax.Array, sample_input, tx,
                          mesh: Mesh) -> TrainState:
    """Init a TrainState whose params are in sharded pipeline layout.

    Optimizer moments are initialized under jit so they inherit each
    param's sharding (stage moments land ``P('pipe')``-sharded too)."""
    variables = model.init({'params': rng, 'dropout': rng}, sample_input,
                           train=False)
    pp = shard_pipeline_params(
        mesh, to_pipeline_params(variables['params'], model.num_layers))
    opt_state = jax.jit(tx.init)(pp)
    return TrainState(step=jnp.asarray(0, jnp.int32), params=pp,
                      opt_state=opt_state, batch_stats={}, tx=tx,
                      apply_fn=model.apply)
