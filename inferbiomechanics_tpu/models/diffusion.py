"""Conditional diffusion denoiser over motion windows (DDPM).

Capability: BASELINE.json config #4 — "diffusion denoiser (transformer
backbone, DDPM schedule) training + sampling on motion windows". The
reference repo only attests this model via its gitignored launch script
(src/.gitignore:9, SURVEY.md §7.6); no source exists, so this is built
to the spec: a transformer backbone that denoises the per-frame physics
outputs (CoPs / forces / torques / wrenches) conditioned on the window's
kinematic input features and a sinusoidal timestep embedding.

TPU notes: the sampling loop is a ``lax.scan`` over schedule steps (one
compiled program regardless of step count); bf16 compute everywhere; the
cosine alpha-bar schedule is precomputed host-side into constants.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from inferbiomechanics_tpu.models.common import ModelInput, pack_inputs, slice_output_heads
from inferbiomechanics_tpu.models.transformer import EncoderBlock

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Noise schedule
# ---------------------------------------------------------------------------

class DDPMSchedule:
    """Precomputed DDPM constants (cosine schedule, Nichol & Dhariwal)."""

    def __init__(self, timesteps: int = 1000, s: float = 0.008):
        self.timesteps = timesteps
        t = np.linspace(0, timesteps, timesteps + 1)
        f = np.cos((t / timesteps + s) / (1 + s) * np.pi / 2) ** 2
        alpha_bar = f / f[0]
        betas = np.clip(1 - alpha_bar[1:] / alpha_bar[:-1], 0, 0.999)
        self.betas = jnp.asarray(betas, jnp.float32)
        self.alphas = 1.0 - self.betas
        self.alpha_bars = jnp.asarray(alpha_bar[1:], jnp.float32)

    def q_sample(self, x0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """Forward process: x_t = √ᾱ_t x0 + √(1−ᾱ_t) ε. t: [B] ints."""
        ab = self.alpha_bars[t][:, None, None]
        return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embedding of integer timesteps [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


# ---------------------------------------------------------------------------
# Denoiser network
# ---------------------------------------------------------------------------

class DiffusionDenoiser(nn.Module):
    num_dofs: int
    num_contact_bodies: int
    history_len: int
    stride: int
    d_model: int = 256
    num_layers: int = 4
    num_heads: int = 8
    mlp_ratio: int = 4
    timesteps: int = 1000
    compute_dtype: jnp.dtype = jnp.bfloat16
    # 'vpu' broadcast-reduce attention: ~3x faster than 'flax' at T=10 on
    # TPU (BENCH_NOTES.md); the denoiser pays it x50 in DDIM sampling
    attn_impl: str = 'vpu'

    @property
    def num_frames(self) -> int:
        return self.history_len // self.stride

    @property
    def target_channels(self) -> int:
        # per-frame [CoPs 3nb | forces 3nb | torques 3nb | wrenches 6nb]
        return self.num_contact_bodies * (3 * 3 + 6)

    @nn.compact
    def __call__(self, noisy_targets: jax.Array, t: jax.Array,
                 cond_inputs: ModelInput, *, train: bool = False) -> jax.Array:
        """Predict the noise ε given x_t, timestep, and motion conditioning."""
        cond = pack_inputs(cond_inputs)                  # [B, T, C_in]
        assert noisy_targets.ndim == 3
        x = nn.Dense(self.d_model, dtype=self.compute_dtype,
                     name='target_proj')(noisy_targets.astype(self.compute_dtype))
        c = nn.Dense(self.d_model, dtype=self.compute_dtype,
                     name='cond_proj')(cond.astype(self.compute_dtype))
        te = timestep_embedding(t, self.d_model)
        te = nn.Dense(self.d_model, dtype=self.compute_dtype, name='t_mlp1')(
            te.astype(self.compute_dtype))
        te = nn.gelu(te)
        te = nn.Dense(self.d_model, dtype=self.compute_dtype, name='t_mlp2')(te)
        pos = self.param('temporal_embedding', nn.initializers.normal(0.02),
                         (self.num_frames, self.d_model))
        h = x + c + te[:, None, :] + pos.astype(self.compute_dtype)[None]
        for _ in range(self.num_layers):
            h = EncoderBlock(self.d_model, self.num_heads, self.mlp_ratio,
                             0.0, self.compute_dtype,
                             self.attn_impl)(h, train=train)
        h = nn.LayerNorm(dtype=self.compute_dtype)(h)
        eps = nn.Dense(self.target_channels, dtype=self.compute_dtype,
                       name='eps_head')(h)
        return eps.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Training + sampling
# ---------------------------------------------------------------------------

def target_scales(num_contact_bodies: int) -> jax.Array:
    """Per-channel normalizers for the diffusion target space.

    The DDPM noise schedule assumes ~unit-variance data; the raw
    kg-normalized targets span two orders of magnitude across channels
    (forces ~±20 N/kg, CoPs ~±1 m), so without normalization the
    forward process barely corrupts the large channels at most
    timesteps while drowning the small ones — mis-training the score
    and making DDIM-from-noise converge pathologically slowly (found
    during the round-5 quality anchor: dev force error fell 63 -> 50
    N/kg over 10 epochs un-normalized). Fixed physical scales (not
    dataset statistics) keep checkpoints free of data-coupled state.
    Order matches :func:`diffusion_targets_from_labels`."""
    per3 = lambda v: jnp.full((3,), v, jnp.float32)
    one_body = [per3(0.5),                 # cops (m)
                per3(10.0),                # forces (N/kg)
                per3(5.0),                 # torques (Nm/kg)
                ]
    wrench_body = jnp.concatenate([per3(5.0), per3(10.0)])  # [n; f]
    return jnp.concatenate(
        [jnp.tile(v, num_contact_bodies) for v in one_body]
        + [jnp.tile(wrench_body, num_contact_bodies)])


def diffusion_targets_from_labels(packed_labels: jax.Array,
                                  lab_offsets: Dict[str, Tuple[int, int]],
                                  num_contact_bodies: int) -> jax.Array:
    """[B, T, C_lab] -> [B, T, target_channels] in head-slice order,
    NORMALIZED into the diffusion space (see :func:`target_scales`);
    the sampler denormalizes at its exit."""
    from inferbiomechanics_tpu.data.keys import OutputDataKeys as O
    parts = []
    for key in (O.GROUND_CONTACT_COPS_IN_ROOT_FRAME,
                O.GROUND_CONTACT_FORCES_IN_ROOT_FRAME,
                O.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME,
                O.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME):
        o, w = lab_offsets[key]
        parts.append(packed_labels[..., o:o + w])
    x = jnp.concatenate(parts, axis=-1)
    return x / target_scales(num_contact_bodies).astype(x.dtype)


def diffusion_targets_from_outputs(outputs: Dict[str, jax.Array],
                                   target_space: str = 'normalized') -> jax.Array:
    """Model-output dict -> [B, T, target_channels] in head-slice order,
    normalized into the diffusion space — the proposal packing for
    partial-denoising warm starts (the inverse of
    ``slice_output_heads`` restricted to the four GRF heads).
    ``target_space='raw'`` skips the normalization, for denoisers
    trained before the round-5 target normalization (see
    :func:`checkpoint_target_space`)."""
    from inferbiomechanics_tpu.data.keys import OutputDataKeys as O
    x = jnp.concatenate([
        outputs[O.GROUND_CONTACT_COPS_IN_ROOT_FRAME],
        outputs[O.GROUND_CONTACT_FORCES_IN_ROOT_FRAME],
        outputs[O.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME],
        outputs[O.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME]], axis=-1)
    if target_space == 'raw':
        return x
    nb = outputs[O.GROUND_CONTACT_COPS_IN_ROOT_FRAME].shape[-1] // 3
    return x / target_scales(nb).astype(x.dtype)


def checkpoint_target_space(checkpoint_dir: str) -> str:
    """Which space a diffusion checkpoint denoises in.

    Denoisers trained at/after the round-5 target normalization operate
    on ``target_scales``-normalized channels; their ``run_config.json``
    sidecar carries ``diffusion_target_space: 'normalized'``. Older
    checkpoints (no sidecar, or a sidecar without the key) were trained
    on raw kg-normalized channels — sampling them through the
    normalized exit would inflate forces ~10x silently, so consumers
    must pass the returned value to :func:`make_sampler` /
    :func:`make_partial_proposal_fn`."""
    import json
    import os
    from inferbiomechanics_tpu.train.run_config import RUN_CONFIG_NAME
    path = os.path.join(checkpoint_dir, RUN_CONFIG_NAME)
    try:
        with open(path) as f:
            space = json.load(f).get('diffusion_target_space')
    except (OSError, ValueError):
        space = None
    if space is None:
        logger.warning(
            '%s predates the normalized diffusion target space '
            '(no diffusion_target_space in run_config.json); sampling '
            'in the legacy raw space', checkpoint_dir)
        return 'raw'
    return space


def make_partial_proposal_fn(config, dataset, init_checkpoint,
                             sample_inputs, target_space: str = 'normalized'):
    """Load the all-frames feedforward proposal model for partial
    denoising and return ``propose(x) -> [B, T, target_channels]`` in
    the diffusion target layout (``diffusion_targets_from_outputs``).

    Shared by ``analyze --diffusion-partial`` and ``serve
    --diffusion-partial`` so the loader logic (model build, checkpoint
    restore, batch-stats plumbing) cannot drift between the two paths.
    Raises ``ValueError`` if ``init_checkpoint`` is empty or holds no
    checkpoint.

    When ``init_checkpoint`` holds a ``run_config.json`` sidecar
    (written by every training run — train/run_config.py), the proposal
    architecture comes FROM the sidecar: no re-spelling --hidden-dims /
    --activation at analyze/serve time, and any all-frames regression
    family (feedforward/groundlink/transformer) can propose. Without a
    sidecar the legacy contract applies: a feedforward built from the
    current CLI flags."""
    from dataclasses import replace

    # lazy: train.loop imports models.diffusion (avoid the cycle)
    from inferbiomechanics_tpu.train import (
        create_train_state, load_latest_checkpoint, make_optimizer,
    )
    from inferbiomechanics_tpu.train.loop import build_model_for_dataset
    from inferbiomechanics_tpu.train.run_config import (
        apply_architecture, load_run_config,
    )

    if not init_checkpoint:
        raise ValueError('--diffusion-partial needs --init-checkpoint '
                         '(an all-frames feedforward proposal model)')
    prop_config = replace(config, model_type='feedforward',
                          output_data_format='all_frames')
    sidecar = load_run_config(init_checkpoint)
    if sidecar is not None:
        prop_config = apply_architecture(prop_config, sidecar)
        if prop_config.output_data_format != 'all_frames':
            raise ValueError(
                f'--init-checkpoint {init_checkpoint} was trained as '
                f'output_data_format='
                f'{prop_config.output_data_format!r} (run_config.json); '
                'partial denoising needs an all_frames proposal')
        if prop_config.model_type == 'diffusion':
            raise ValueError(
                f'--init-checkpoint {init_checkpoint} holds a diffusion '
                'model (run_config.json); the proposal must be a '
                'regression model (feedforward/groundlink/transformer)')
        if (prop_config.window_size != config.window_size
                or prop_config.stride != config.stride):
            raise ValueError(
                f'--init-checkpoint {init_checkpoint} was trained on '
                f'window/stride {prop_config.window_size}/'
                f'{prop_config.stride} (run_config.json) but this run '
                f'uses {config.window_size}/{config.stride} — the '
                'proposal must see the same windows as the denoiser')
    prop_model = build_model_for_dataset(prop_config, dataset)
    prop_state = create_train_state(
        prop_model, jax.random.PRNGKey(0), jnp.asarray(sample_inputs),
        make_optimizer(config.opt_type, config.learning_rate))
    prop_state, pe, _pb = load_latest_checkpoint(prop_state, init_checkpoint)
    if pe < 0:
        raise ValueError(f'--init-checkpoint: no checkpoint '
                         f'in {init_checkpoint}')
    prop_vars = {'params': prop_state.params}
    if prop_state.batch_stats:
        prop_vars['batch_stats'] = prop_state.batch_stats

    def propose(x):
        return diffusion_targets_from_outputs(
            prop_model.apply(prop_vars, x, train=False),
            target_space=target_space)

    return propose


def make_diffusion_train_step(model: DiffusionDenoiser,
                              lab_offsets: Dict[str, Tuple[int, int]],
                              schedule: Optional[DDPMSchedule] = None,
                              donate: bool = True,
                              augment=None,
                              cond_dropout: float = 0.0):
    """Jitted ε-prediction MSE step. Labels must be all_frames format.

    ``augment`` (train/augment.py) mirrors/noises the conditioning
    windows — and mirrors the denoising targets consistently — inside
    the compiled step.

    ``cond_dropout`` (classifier-free guidance training): each sample's
    conditioning windows are zeroed with this probability, so the model
    learns the unconditional score too (the cond_proj bias acts as the
    learned null embedding). Sample with ``make_sampler(...,
    guidance_scale=s)`` to trade diversity for conditioning fidelity."""
    sched = schedule or DDPMSchedule(model.timesteps)

    def step(state, batch_inputs, batch_labels, rng):
        from inferbiomechanics_tpu.train.augment import maybe_augment
        batch_inputs, batch_labels = maybe_augment(
            augment, batch_inputs, batch_labels, rng)
        batch_inputs = drop_conditioning(batch_inputs, rng, cond_dropout)
        x0 = diffusion_targets_from_labels(batch_labels, lab_offsets,
                                           model.num_contact_bodies)
        b = x0.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (b,), 0, sched.timesteps)
        noise = jax.random.normal(rng_n, x0.shape, x0.dtype)
        x_t = sched.q_sample(x0, t, noise)

        def loss_fn(params):
            eps = model.apply({'params': params}, x_t, t, batch_inputs,
                              train=True)
            loss = jnp.mean((eps - noise) ** 2)
            return loss, {'loss': loss}

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def fused_denoiser_eps(model: DiffusionDenoiser, params,
                       noisy_targets: jax.Array, t: jax.Array,
                       cond_packed: jax.Array) -> jax.Array:
    """ε-prediction forward through the fused Pallas encoder kernel, on a
    checkpoint TRAINED with ``attn_impl='vpu'`` (the default).

    Same mechanism as ``models.transformer.fused_transformer_forward``:
    one kernel per encoder layer instead of ~90 dodges this runtime's
    per-kernel launch tax, and DDIM sampling pays the encoder stack
    ``num_steps`` times per sample. Consumes the vpu parameter tree
    (``EncoderBlock_i/ShortWindowAttention_0/...``) as-is; numerics
    differ from ``model.apply`` at bf16-residual level (the kernel keeps
    residuals in f32). Falls back to the jnp reference math on CPU.
    """
    from inferbiomechanics_tpu.ops.pallas_encoder import fused_encoder_layer

    dt = model.compute_dtype

    def dense(name, v):
        return (v @ params[name]['kernel'].astype(dt)
                + params[name]['bias'].astype(dt))

    x = dense('target_proj', noisy_targets.astype(dt))
    c = dense('cond_proj', cond_packed.astype(dt))
    te = dense('t_mlp1', timestep_embedding(t, model.d_model).astype(dt))
    te = dense('t_mlp2', nn.gelu(te))
    h = x + c + te[:, None, :] + params['temporal_embedding'].astype(dt)[None]
    h = h.astype(jnp.float32)
    for li in range(model.num_layers):
        blk = params[f'EncoderBlock_{li}']
        attn = blk['ShortWindowAttention_0']
        layer = (blk['LayerNorm_0']['scale'], blk['LayerNorm_0']['bias'],
                 attn['qkv']['kernel'], attn['qkv']['bias'],
                 attn['proj']['kernel'], attn['proj']['bias'],
                 blk['LayerNorm_1']['scale'], blk['LayerNorm_1']['bias'],
                 blk['Dense_0']['kernel'], blk['Dense_0']['bias'],
                 blk['Dense_1']['kernel'], blk['Dense_1']['bias'])
        h = fused_encoder_layer(h, layer, model.num_heads)
    ln = params['LayerNorm_0']
    mean = h.mean(-1, keepdims=True)
    var = ((h - mean) ** 2).mean(-1, keepdims=True)
    h = ((h - mean) * jax.lax.rsqrt(var + 1e-6)
         * ln['scale'] + ln['bias']).astype(dt)
    return dense('eps_head', h).astype(jnp.float32)


def drop_conditioning(cond: jax.Array, rng: jax.Array,
                      cond_dropout: float) -> jax.Array:
    """Zero each sample's conditioning with probability ``cond_dropout``
    (classifier-free guidance training; traced code). The key is folded
    so the t/noise streams drawn from the same ``rng`` stay untouched —
    ``cond_dropout=0`` is bit-identical to not calling this."""
    if cond_dropout <= 0.0:
        return cond
    keep = jax.random.bernoulli(jax.random.fold_in(rng, 0xCF6),
                                1.0 - cond_dropout, (cond.shape[0],))
    return cond * keep[:, None, None].astype(cond.dtype)


def make_sampler(model: DiffusionDenoiser,
                 schedule: Optional[DDPMSchedule] = None,
                 num_steps: Optional[int] = None,
                 eta: float = 0.0,
                 fused_inference: bool = False,
                 guidance_scale: float = 1.0,
                 partial_frac: Optional[float] = None,
                 target_space: str = 'normalized'):
    """Build ``sample(params, cond_inputs, rng) -> outputs dict``.

    DDIM sampling over an evenly-spaced subset of the schedule
    (``num_steps``; defaults to the full schedule → DDPM-like when
    eta=1.0). The loop is a single ``lax.scan``. ``fused_inference``
    routes each denoiser call through the fused Pallas encoder
    (``fused_denoiser_eps``) — vpu checkpoints only.

    ``guidance_scale != 1`` applies classifier-free guidance: per step
    the denoiser evaluates a [2B] batch-concat of (conditional,
    null-conditioned) rows — ONE launch, the standard CFG trick — and
    ``eps = eps_u + scale·(eps_c − eps_u)``. Meaningful on checkpoints
    trained with ``cond_dropout > 0``; scale 1 skips the extra forward
    entirely (bit-identical to the plain sampler).

    ``partial_frac`` enables partial denoising (Falcon-style warm
    start): the chain starts at ``t_start = partial_frac * (T_sched-1)``
    from ``q_sample(init, t_start)`` instead of pure noise at the top of
    the schedule, and the built ``sample`` takes a REQUIRED fourth
    argument ``init`` — a [B, T, target_channels] proposal in the
    diffusion target layout (e.g. a feedforward baseline's all-frames
    prediction through ``diffusion_targets_from_outputs``). ``num_steps``
    then spaces over the truncated range, so the denoiser runs
    proportionally fewer launches for the same step density.

    ``target_space``: the space the CHECKPOINT denoises in —
    'normalized' (training default since round 5) or 'raw' for legacy
    pre-normalization checkpoints (detect with
    :func:`checkpoint_target_space`; a mismatch silently mis-scales
    every output ~10x).
    """
    if fused_inference and model.attn_impl != 'vpu':
        raise ValueError('fused_inference consumes the vpu parameter tree; '
                         f'this denoiser was built with '
                         f'attn_impl={model.attn_impl!r}')
    if target_space not in ('normalized', 'raw'):
        raise ValueError(f'target_space must be normalized|raw, '
                         f'got {target_space!r}')
    normalized = target_space == 'normalized'
    # raw: legacy pre-normalization checkpoints denoise kg-normalized
    # channels directly (forces span ~±30 N/kg), so the x0 clamp stays
    # in physical units and the exit multiply is skipped
    x0_clip = 8.0 if normalized else 50.0
    sched = schedule or DDPMSchedule(model.timesteps)
    n = num_steps or sched.timesteps
    t_top = sched.timesteps - 1
    if partial_frac is not None:
        if not 0.0 < partial_frac <= 1.0:
            raise ValueError(f'partial_frac must be in (0, 1], got '
                             f'{partial_frac}')
        t_top = max(1, int(round(partial_frac * (sched.timesteps - 1))))
        # keep the full chain's step DENSITY over the truncated range:
        # latency scales with partial_frac (raise num_steps to densify)
        n = max(1, min(int(round(n * partial_frac)), t_top + 1))
    ts = np.linspace(t_top, 0, n).round().astype(np.int32)
    ts_prev = np.concatenate([ts[1:], [-1]]).astype(np.int32)

    def sample(params, cond_inputs, rng, init=None):
        cond = pack_inputs(cond_inputs)
        b, T = cond.shape[0], cond.shape[1]
        c_out = model.target_channels
        rng, rng0 = jax.random.split(rng)
        noise = jax.random.normal(rng0, (b, T, c_out), jnp.float32)
        if partial_frac is not None:
            if init is None:
                raise ValueError('partial_frac sampling needs an init '
                                 'proposal ([B, T, target_channels])')
            if tuple(init.shape) != (b, T, c_out):
                # a [B, 1, C] last_frame proposal would otherwise
                # silently broadcast across every frame in q_sample
                raise ValueError(f'init proposal must be [B, T, '
                                 f'target_channels] = {(b, T, c_out)}, '
                                 f'got {tuple(init.shape)} (all-frames '
                                 f'proposals only)')
            x = sched.q_sample(init.astype(jnp.float32),
                               jnp.full((b,), t_top, jnp.int32), noise)
        else:
            x = noise

        def body(carry, t_pair):
            x, rng = carry
            t, t_prev = t_pair
            tb = jnp.full((b,), t, jnp.int32)

            def denoise(xb, tbb, cb):
                if fused_inference:
                    return fused_denoiser_eps(model, params, xb, tbb, cb)
                return model.apply({'params': params}, xb, tbb, cb,
                                   train=False)

            if guidance_scale != 1.0:
                eps2 = denoise(jnp.concatenate([x, x]),
                               jnp.concatenate([tb, tb]),
                               jnp.concatenate([cond, jnp.zeros_like(cond)]))
                eps_c, eps_u = eps2[:b], eps2[b:]
                eps = eps_u + guidance_scale * (eps_c - eps_u)
            else:
                eps = denoise(x, tb, cond)
            ab_t = sched.alpha_bars[t]
            ab_prev = jnp.where(t_prev >= 0, sched.alpha_bars[jnp.maximum(t_prev, 0)], 1.0)
            x0_pred = (x - jnp.sqrt(1 - ab_t) * eps) / jnp.sqrt(ab_t)
            # the chain runs in the checkpoint's target space (normalized
            # per-channel ~unit scale, or legacy raw); clip a few sigma
            # out to stop early-step blowups
            x0_pred = jnp.clip(x0_pred, -x0_clip, x0_clip)
            sigma = eta * jnp.sqrt((1 - ab_prev) / (1 - ab_t)) * \
                jnp.sqrt(1 - ab_t / ab_prev)
            dir_xt = jnp.sqrt(jnp.maximum(1 - ab_prev - sigma ** 2, 0.0)) * eps
            rng, rng_z = jax.random.split(rng)
            z = jax.random.normal(rng_z, x.shape, x.dtype)
            x_next = jnp.sqrt(ab_prev) * x0_pred + dir_xt + \
                jnp.where(t_prev >= 0, sigma, 0.0) * z
            return (x_next, rng), None

        (x, _), _ = jax.lax.scan(body, (x, rng),
                                 (jnp.asarray(ts), jnp.asarray(ts_prev)))
        if normalized:
            # leave the normalized diffusion space (target_scales)
            x = x * target_scales(model.num_contact_bodies).astype(x.dtype)
        return slice_output_heads(x, model.num_contact_bodies, T)

    return jax.jit(sample)
