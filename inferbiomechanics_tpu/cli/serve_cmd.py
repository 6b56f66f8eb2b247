"""``serve`` subcommand — batch-inference HTTP server (beyond parity).

The reference has no serving entry point (its inference surfaces are the
interactive ``visualize-file``/``save-prediction-csv`` commands,
visualize_file.py:94-116); this serves the same checkpoint + featurized
window schema over HTTP for production use. See
``inferbiomechanics_tpu/serve.py`` for the endpoint contract.
"""

from __future__ import annotations

import argparse
import logging
import os

from inferbiomechanics_tpu.config import add_config_flags, config_from_args

logger = logging.getLogger(__name__)


class ServeCommand:
    name = 'serve'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'serve', help='Serve checkpoint predictions over HTTP '
                          '(beyond-parity production path)')
        add_config_flags(parser)
        from inferbiomechanics_tpu.train.run_config import add_run_config_flag
        add_run_config_flag(parser)
        parser.add_argument('--port', type=int, default=8090)
        parser.add_argument('--host', type=str, default='127.0.0.1',
                            help='Bind address; 0.0.0.0 exposes the server '
                                 'to the network')
        parser.add_argument('--max-batch', type=int, default=4096,
                            help='Largest accepted /predict batch (also the '
                                 'top compile bucket)')
        parser.add_argument('--sample-steps', type=int, default=50,
                            help='Diffusion serving: DDIM steps per '
                                 '/predict request (the whole chain is '
                                 'one compiled program)')
        parser.add_argument('--batch-wait-ms', type=float, default=0.0,
                            help='Dynamic batching: wait this long after '
                                 'a /predict arrives so concurrent '
                                 'requests coalesce into ONE device '
                                 'forward (0 = off). Trades ~that much '
                                 'latency for near-flat throughput '
                                 'scaling with client count')
        parser.add_argument('--diffusion-partial', type=float, default=None,
                            help='Partial denoising: start each DDIM '
                                 'chain at FRAC of the schedule from a '
                                 'proposal model prediction (needs '
                                 '--init-checkpoint); denoiser launches '
                                 'scale with FRAC')
        parser.add_argument('--init-checkpoint', type=str, default=None,
                            help='Checkpoint dir of an ALL-FRAMES '
                                 'feedforward proposal model seeding '
                                 '--diffusion-partial chains (closure '
                                 'constant: POST /reload swaps only the '
                                 'denoiser)')
        parser.add_argument('--diffusion-samples', type=int, default=1,
                            help='Diffusion: draw K independent sampling '
                                 'chains per request (one vmapped program) '
                                 'and return their mean; "spread": true '
                                 'also returns the across-sample std as an '
                                 'aleatoric-uncertainty signal')
        parser.add_argument('--tta-mirror', action='store_true',
                            help='Mirror test-time augmentation: each '
                                 'prediction is averaged with the '
                                 'un-mirrored prediction of the sagittally '
                                 'mirrored window (one extra forward in '
                                 'the same compiled program)')
        parser.add_argument('--warmup', action='store_true',
                            help='Compile every batch bucket before '
                                 'accepting requests (no first-request '
                                 'compile latency spikes)')
        parser.add_argument('--reload-poll-sec', type=float, default=0.0,
                            help='Poll the checkpoint dir every N seconds '
                                 'and hot-swap to newer checkpoints '
                                 'automatically (0 = off; POST /reload '
                                 'always works)')
        parser.add_argument('--use-ema', action='store_true',
                            help='Serve the checkpoint\'s EMA parameter '
                                 'tree (train --ema-decay)')
        parser.add_argument('--quantize', type=str, default=None,
                            choices=['int8'],
                            help='Serve through int8 weight+activation '
                                 'quantization (feedforward family): the '
                                 'MXU runs int8 matmuls at 2x the bf16 '
                                 'rate with 1/4 the weight HBM traffic '
                                 '(ops/quant.py)')
        parser.add_argument('--ensemble', type=str, nargs='+', default=None,
                            metavar='CKPT',
                            help='Serve the MEAN of several checkpoints '
                                 '(dirs or .ckpt files, e.g. a seed '
                                 'sweep\'s per-config checkpoints) in one '
                                 'vmapped forward; /predict can also '
                                 'return the across-member std '
                                 '("spread": true)')

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'serve':
            return False
        from inferbiomechanics_tpu.train.run_config import (
            use_run_config_if_requested,
        )
        config = use_run_config_if_requested(config_from_args(args), args)
        from inferbiomechanics_tpu.data.dataset import WindowDataset
        from inferbiomechanics_tpu.serve import InferenceService, serve

        checkpoint_dir = os.path.join(os.path.abspath(config.checkpoint_dir),
                                      config.model_type)
        # schema source: dev split if present, else the dataset root
        data_dir = os.path.join(config.dataset_home, 'dev')
        if not os.path.isdir(data_dir):
            data_dir = config.dataset_home
        # lazy: the service needs only layouts + an 8-window init sample,
        # so don't featurize (and hold) the whole split in host RAM
        ds = WindowDataset(data_dir, window_size=config.window_size,
                           stride=config.stride,
                           output_data_format=config.output_data_format,
                           testing_with_short_dataset=config.short,
                           skip_loading_skeletons=True,
                           materialize_features=False)
        service = InferenceService(config, checkpoint_dir, ds,
                                   max_batch=args.max_batch,
                                   ensemble=args.ensemble,
                                   batch_wait_ms=args.batch_wait_ms,
                                   sample_steps=args.sample_steps,
                                   quantize=args.quantize,
                                   use_ema=args.use_ema,
                                   diffusion_samples=args.diffusion_samples,
                                   tta_mirror=args.tta_mirror,
                                   diffusion_partial=args.diffusion_partial,
                                   init_checkpoint=args.init_checkpoint)
        if args.warmup:
            service.warmup()
        service.start_reload_poller(args.reload_poll_sec)
        server = serve(service, host=args.host, port=args.port)
        tag = (f'{len(service.members)}-member ensemble'
               if service.members else
               f'epoch {service.epoch}, batch {service.batch}')
        print(f'serving {config.model_type} ({tag}) on '
              f'http://{args.host}:{server.server_address[1]} — Ctrl-C stops',
              flush=True)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.server_close()
        return True
