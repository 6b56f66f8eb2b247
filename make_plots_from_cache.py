"""Replay a make-plots statistics cache into figures.

Capability parity: reference ``src/make_plots_from_cache.py`` — a
standalone script that re-renders histograms/plots from the pickle
caches written by ``make-plots`` without rescanning the dataset, with
optional outlier clipping (ref :119-191).
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser(description='Replay make-plots caches')
    parser.add_argument('--cache', type=str, default='outputs/plots/cache.pkl')
    parser.add_argument('--out-dir', type=str, default='outputs/plots')
    parser.add_argument('--clip-percentile', type=float, default=None,
                        help='Clip histogram data above this percentile')
    args = parser.parse_args()

    with open(args.cache, 'rb') as f:
        stats = pickle.load(f)

    if args.clip_percentile is not None:
        for key in ('trial_lengths_s', 'speeds_m_s', 'max_grf_n_kg', 'bmis'):
            data = np.asarray(stats.get(key, []))
            if data.size:
                hi = np.percentile(data, args.clip_percentile)
                stats[key] = data[data <= hi].tolist()

    from inferbiomechanics_tpu.cli.make_plots_cmd import render_plots
    for path in render_plots(stats, args.out_dir):
        print(f'wrote {path}')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
