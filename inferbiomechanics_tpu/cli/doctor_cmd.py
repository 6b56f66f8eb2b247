"""``doctor`` subcommand — environment and backend health diagnostics.

Beyond reference parity (the reference has no diagnostics; failures
surfaced as stack traces mid-run). This encodes the operational
knowledge accumulated against the experimental TPU runtime
(BENCH_NOTES.md measurement rules / CLAUDE.md quirks) into one command:

- device inventory + platform;
- a SMALL jit compile+execute probe with a scalar readback, timed —
  compile of a trivial program taking more than ~3 minutes is the
  documented signature of a degraded backend (park TPU work, retry
  later), and readback (not ``block_until_ready``) is the only
  trustworthy sync on it;
- host->device transfer probe (the tunnel has been observed anywhere
  from ~10 MB/s down to ~2 KB/s — the round-1/2 null-bench root cause);
- optional dataset summary (windows, channels, bytes) with the
  device-data tier the train loop would pick for it.

Exit code: 0 healthy, 1 degraded (slow compile or transfer), so launch
scripts can gate expensive runs on ``main.py doctor``.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

logger = logging.getLogger(__name__)

COMPILE_DEGRADED_S = 180.0      # CLAUDE.md: trivial compile > ~3 min
TRANSFER_DEGRADED_MBPS = 0.5    # tunnel collapse territory


def classify_backend_health(compile_s=None, transfer_mbps=None) -> str:
    """One-word backend classification shared by doctor and bench.py's
    self-describing output line: 'healthy', 'degraded-compile',
    'degraded-tunnel', 'degraded-both', or 'unknown' (no probes ran)."""
    slow_compile = compile_s is not None and compile_s >= COMPILE_DEGRADED_S
    slow_tunnel = (transfer_mbps is not None
                   and transfer_mbps < TRANSFER_DEGRADED_MBPS)
    if compile_s is None and transfer_mbps is None:
        return 'unknown'
    if slow_compile and slow_tunnel:
        return 'degraded-both'
    if slow_compile:
        return 'degraded-compile'
    if slow_tunnel:
        return 'degraded-tunnel'
    return 'healthy'


class DoctorCommand:
    name = 'doctor'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'doctor', help='Backend/environment health diagnostics '
                           '(compile probe, transfer bandwidth, dataset '
                           'summary); exit 1 when degraded')
        parser.add_argument('--dataset-home', type=str, default=None,
                            help='Also summarize this dataset root')
        parser.add_argument('--transfer-mb', type=float, default=1.0,
                            help='Size of the host->device transfer probe')
        parser.add_argument('--skip-device', action='store_true',
                            help='Environment/dataset checks only')
        parser.add_argument('--json', action='store_true',
                            help='Also print one machine-readable JSON '
                                 'line (for launch-script gating beyond '
                                 'the exit code)')

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'doctor':
            return False
        import sys
        degraded = []
        report = {'probes': {}, 'datasets': {}}

        import jax
        import numpy as np
        print(f'jax {jax.__version__}; backend '
              f'{jax.default_backend()}; devices: '
              f'{[str(d) for d in jax.devices()]}')
        print(f'process {jax.process_index()}/{jax.process_count()}, '
              f'local devices {jax.local_device_count()}')

        if not args.skip_device:
            import jax.numpy as jnp

            # compile + execute probe, synced by scalar readback
            t0 = time.time()
            x = jnp.ones((512, 512), jnp.bfloat16)
            val = float((x @ x).sum())
            dt = time.time() - t0
            status = 'ok' if dt < COMPILE_DEGRADED_S else 'DEGRADED'
            report['probes']['compile_s'] = round(dt, 2)
            print(f'compile probe: {dt:.1f}s ({status}) '
                  f'[readback={val:.0f}]')
            if dt >= COMPILE_DEGRADED_S:
                degraded.append(
                    f'trivial compile took {dt:.0f}s (> {COMPILE_DEGRADED_S:.0f}s '
                    f'— the documented degraded-backend signature; park TPU '
                    f'work and retry later)')

            # host->device transfer probe, chunked small-first so a
            # collapsed tunnel (~KB/s) is diagnosed from the 64 KB chunk
            # in seconds instead of stalling doctor for minutes on the
            # full payload — the exact failure mode the probe exists for
            small_mb = min(0.064, args.transfer_mb)
            t0 = time.time()
            dev = jnp.asarray(np.ones(int(small_mb * 1e6 / 4), np.float32))
            float(dev[0])                       # force completion
            dt = max(time.time() - t0, 1e-9)
            mbps = small_mb / dt
            probed_mb = small_mb
            if mbps >= TRANSFER_DEGRADED_MBPS and args.transfer_mb > small_mb:
                rest = args.transfer_mb - small_mb
                t0 = time.time()
                dev = jnp.asarray(np.ones(int(rest * 1e6 / 4), np.float32))
                float(dev[0])
                dt = max(time.time() - t0, 1e-9)
                mbps = rest / dt
                probed_mb = rest
            status = 'ok' if mbps >= TRANSFER_DEGRADED_MBPS else 'DEGRADED'
            report['probes']['transfer_mbps'] = round(mbps, 3)
            print(f'host->device: {probed_mb:.3f} MB in {dt:.2f}s '
                  f'= {mbps:.2f} MB/s ({status})')
            if mbps < TRANSFER_DEGRADED_MBPS:
                degraded.append(
                    f'host->device at {mbps:.3f} MB/s — tunnel collapse '
                    f'territory; prefer the tiled/device-resident data '
                    f'paths and avoid large uploads')

            # steady-state step dispatch probe (chained matmuls)
            t0 = time.time()
            y = x
            for _ in range(16):
                y = y @ x
            val = float(y.sum())
            dt = (time.time() - t0) / 16
            report['probes']['step_ms'] = round(dt * 1e3, 3)
            print(f'chained 512x512 matmul: {dt * 1e3:.2f} ms/step '
                  f'(includes dispatch; readback-synced)')

        if args.dataset_home:
            from inferbiomechanics_tpu.data.dataset import WindowDataset
            splits = [s for s in ('train', 'dev')
                      if os.path.isdir(os.path.join(args.dataset_home, s))]
            # bare dataset root only when no split subdirs exist (walking
            # the root WITH splits would re-featurize everything twice)
            roots = ([os.path.join(args.dataset_home, s) for s in splits]
                     or [args.dataset_home])
            for root in roots:
                if not os.path.isdir(root):
                    continue
                try:
                    ds = WindowDataset(root, window_size=50, stride=5,
                                       skip_loading_skeletons=True,
                                       materialize_features=False)
                except (FileNotFoundError, ValueError) as e:
                    print(f'{root}: unreadable ({e})')
                    degraded.append(f'{root}: {e}')
                    continue
                rows = ds.labels_all.shape[0]
                feat_bytes = rows * ds.num_input_channels * 4
                report['datasets'][root] = {
                    'subjects': len(ds.subject_paths),
                    'windows': len(ds), 'num_dofs': ds.num_dofs,
                    'featurized_mb': round(
                        (feat_bytes + ds.labels_all.nbytes) / 1e6, 1)}
                print(f'{root}: {len(ds.subject_paths)} subjects, '
                      f'{len(ds)} windows, {ds.num_dofs} dofs, '
                      f'{ds.num_input_channels} input channels, '
                      f'~{(feat_bytes + ds.labels_all.nbytes) / 1e6:.0f} MB '
                      f'featurized')

        report['degraded'] = degraded
        report['healthy'] = not degraded
        if getattr(args, 'json', False):
            import json as _json
            print(_json.dumps(report))
        if degraded:
            print('DOCTOR: DEGRADED —')
            for d in degraded:
                print(f'  - {d}')
            sys.exit(1)
        print('DOCTOR: healthy')
        return True
