"""``export`` subcommand — serialize a checkpointed model to StableHLO.

Beyond reference parity (the reference's only serving artifact is a
torch pickle): ``jax.export`` serializes the jitted forward — parameters
baked in, batch dimension symbolic — into a version-stable StableHLO
artifact that any JAX runtime (or XLA-based server) can deserialize and
call without this package, its model code, or its checkpoint machinery.
A sidecar JSON records the input schema and provenance.

Regression models export their forward; diffusion exports the full DDIM
sampling chain (``--sample-steps`` DDIM steps baked in, PRNG seed passed
at call time as a second int32 scalar argument). The analytical baseline
has per-subject skeleton state and does not export.

Usage::

    python main.py export --dataset-home ../data --checkpoint-dir ../ck \
        --model-type feedforward --out model.stablehlo
    # consumer side (pure jax, no inferbiomechanics_tpu needed):
    #   from jax import export
    #   fn = export.deserialize(open('model.stablehlo','rb').read())
    #   outputs = fn.call(windows)     # [B, T, C_in] float32, any B
"""

from __future__ import annotations

import argparse
import json
import logging
import os

from inferbiomechanics_tpu.config import add_config_flags, config_from_args

logger = logging.getLogger(__name__)


class ExportCommand:
    name = 'export'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'export', help='Serialize a checkpointed model to a StableHLO '
                           'artifact (jax.export; symbolic batch dim)')
        add_config_flags(parser)
        from inferbiomechanics_tpu.train.run_config import add_run_config_flag
        add_run_config_flag(parser)
        parser.add_argument('--out', type=str, required=True,
                            help='Output artifact path (sidecar schema '
                                 'JSON written next to it)')
        parser.add_argument('--checkpoint-file', type=str, default=None,
                            help='Export this specific checkpoint instead '
                                 'of the latest epoch_* one')
        parser.add_argument('--static-batch', type=int, default=None,
                            help='Freeze the batch dimension instead of '
                                 'exporting it symbolic')
        parser.add_argument('--sample-steps', type=int, default=50,
                            help='Diffusion: DDIM steps baked into the '
                                 'exported sampling chain')
        parser.add_argument('--quantize', type=str, default=None,
                            choices=['int8'],
                            help='Export the int8-quantized forward '
                                 '(feedforward family; ops/quant.py) — '
                                 'weights serialize as int8 constants')

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'export':
            return False
        from inferbiomechanics_tpu.train.run_config import (
            use_run_config_if_requested,
        )
        config = use_run_config_if_requested(config_from_args(args), args)
        if config.model_type == 'analytical':
            raise SystemExit('export supports learned models; the '
                             'analytical baseline carries per-subject '
                             'skeleton state')

        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax import export as jexport

        from inferbiomechanics_tpu.data.dataset import WindowDataset
        from inferbiomechanics_tpu.train import (
            create_train_state, load_latest_checkpoint, make_optimizer,
        )
        from inferbiomechanics_tpu.train.checkpoint import load_checkpoint_file
        from inferbiomechanics_tpu.train.loop import build_model_for_dataset
        from inferbiomechanics_tpu.train.state import TrainState

        data_dir = os.path.join(config.dataset_home, 'dev')
        if not os.path.isdir(data_dir):
            data_dir = config.dataset_home
        ds = WindowDataset(data_dir, window_size=config.window_size,
                           stride=config.stride,
                           output_data_format=config.output_data_format,
                           skip_loading_skeletons=True,
                           materialize_features=False)
        model = build_model_for_dataset(config, ds)
        checkpoint_dir = os.path.join(os.path.abspath(config.checkpoint_dir),
                                      config.model_type)
        from inferbiomechanics_tpu.train.run_config import (
            warn_on_architecture_mismatch,
        )
        warn_on_architecture_mismatch(config, checkpoint_dir, 'export')
        sample = ds.gather(np.arange(min(4, len(ds))))
        x_sample = jnp.asarray(sample.inputs)

        is_diffusion = config.model_type == 'diffusion'
        if is_diffusion:
            if config.output_data_format != 'all_frames':
                raise SystemExit('export --model-type diffusion requires '
                                 '--output-data-format all_frames')
            x0 = jnp.zeros((x_sample.shape[0], x_sample.shape[1],
                            model.target_channels))
            t0 = jnp.zeros((x_sample.shape[0],), jnp.int32)
            variables = model.init({'params': jax.random.PRNGKey(0)},
                                   x0, t0, x_sample)
            tx = make_optimizer(config.opt_type, config.learning_rate)
            state = TrainState(step=jnp.asarray(0, jnp.int32),
                               params=variables['params'],
                               opt_state=tx.init(variables['params']),
                               batch_stats={}, tx=tx, apply_fn=model.apply)
        else:
            state = create_train_state(
                model, jax.random.PRNGKey(0), x_sample,
                make_optimizer(config.opt_type, config.learning_rate))
        if args.checkpoint_file:
            state, epoch, batch = load_checkpoint_file(state,
                                                       args.checkpoint_file)
        else:
            state, epoch, batch = load_latest_checkpoint(state, checkpoint_dir)
            if epoch < 0:
                print(f'WARNING: no checkpoint in {checkpoint_dir}; '
                      f'exporting an untrained model')

        params = jax.device_get(state.params)
        batch_stats = jax.device_get(state.batch_stats) or {}
        if args.quantize:
            from inferbiomechanics_tpu.models.feedforward import (
                FeedForwardBaseline,
            )
            if is_diffusion or not isinstance(model, FeedForwardBaseline):
                raise SystemExit('export --quantize int8 supports the '
                                 'feedforward family only')
        if is_diffusion:
            from inferbiomechanics_tpu.models.diffusion import (
                checkpoint_target_space, make_sampler,
            )
            sampler = make_sampler(model, num_steps=args.sample_steps,
                                   guidance_scale=config.guidance_scale,
                                   target_space=checkpoint_target_space(
                                       checkpoint_dir))

            # Seed travels as a runtime argument so one artifact serves
            # both deterministic replay (same seed) and fresh draws.
            def fwd(x, seed):
                return sampler(params, x, jax.random.PRNGKey(seed))
        elif args.quantize:
            from inferbiomechanics_tpu.ops.quant import (
                quantized_feedforward_forward,
            )
            fwd = quantized_feedforward_forward(model, params)
        else:
            def fwd(x):
                variables = {'params': params}
                if batch_stats:
                    variables['batch_stats'] = batch_stats
                return model.apply(variables, x, train=False)

        if args.static_batch:
            bdim = int(args.static_batch)
        else:
            (bdim,) = jexport.symbolic_shape('b')
        spec = jax.ShapeDtypeStruct(
            (bdim, ds.num_model_frames, ds.num_input_channels), jnp.float32)
        if is_diffusion:
            seed_spec = jax.ShapeDtypeStruct((), jnp.int32)
            exported = jexport.export(jax.jit(fwd))(spec, seed_spec)
        else:
            exported = jexport.export(jax.jit(fwd))(spec)
        blob = exported.serialize()
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, 'wb') as f:
            f.write(blob)
        sidecar = {
            'model_type': config.model_type,
            'checkpoint': {'epoch': epoch, 'batch': batch},
            'input': {'shape': ['b' if not args.static_batch
                                else args.static_batch,
                                ds.num_model_frames, ds.num_input_channels],
                      'dtype': 'float32',
                      'layout': [{'key': k, 'width': w}
                                 for k, w in ds.in_layout]},
            'output_data_format': config.output_data_format,
            'diffusion_sample_steps': (args.sample_steps if is_diffusion
                                       else None),
            'extra_inputs': ([{'name': 'seed', 'shape': [],
                               'dtype': 'int32'}] if is_diffusion else []),
            'quantize': args.quantize,
            'jax_version': jax.__version__,
            'stablehlo_bytes': len(blob),
        }
        with open(args.out + '.json', 'w') as f:
            json.dump(sidecar, f, indent=2)
        print(f'exported {config.model_type} (epoch {epoch}) -> {args.out} '
              f'({len(blob) / 1e6:.2f} MB StableHLO, '
              f'{"symbolic" if not args.static_batch else args.static_batch} '
              f'batch) + {args.out}.json')
        return True
