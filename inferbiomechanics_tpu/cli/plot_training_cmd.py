"""``plot-training`` subcommand — training curves from logged metrics.

Beyond reference parity: the reference relies entirely on the wandb web
UI for loss curves (train.py:117-132). In offline/zero-egress
environments this framework's MetricLogger falls back to JSONL files
(utils/wandb_compat.py) that nothing could visualize; this command
closes that loop — it renders the logged metric streams (train loss,
dev reports, sweep curves) into one small-multiples PNG and prints a
final-value summary, so a run is inspectable without any external
service.

Input: a ``metrics_*.jsonl`` file (newest in ``--log-dir`` by default;
``wandb-offline`` run dirs are not parsed — sync those to a wandb
server). Each line is one ``log()`` dict; an optional leading
``{"_config": ...}`` record carries the run config for the title.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Dict, List, Tuple

# Validated categorical palette (fixed slot order, never cycled) and
# surface/ink tokens from the dataviz reference palette; lines use the
# adjacent pairlist, which this 8-slot order passes (CVD dE >= 8.4).
SERIES = ['#2a78d6', '#eb6834', '#1baf7a', '#eda100',
          '#e87ba4', '#008300', '#4a3aa7', '#e34948']
SURFACE = '#fcfcfb'
INK = '#0b0b0b'
INK_2 = '#52514e'
GRID = '#e4e3df'


def read_metrics(path: str) -> Tuple[dict, Dict[str, List[Tuple[int, float]]]]:
    """Parse a MetricLogger JSONL file.

    Returns ``(config, series)`` where ``series[key]`` is a list of
    ``(record_index, value)`` for every numeric metric key. The record
    index is the honest x-axis: log() calls are ordered but different
    keys fire at different cadences (per-batch train loss vs per-epoch
    dev reports)."""
    config: dict = {}
    series: Dict[str, List[Tuple[int, float]]] = {}
    with open(path) as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue          # torn final line of a live run
            if '_config' in rec:
                config = rec['_config'] or {}
                continue
            for k, v in rec.items():
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    continue
                series.setdefault(k, []).append((i, float(v)))
    return config, series


def group_key(key: str) -> str:
    """Panel assignment: per-component keys (``dev/force_rmse/left-x``)
    share one panel per metric group; everything else gets its own."""
    parts = key.split('/')
    if len(parts) >= 3:
        return '/'.join(parts[:-1])
    return key


def ema(values: List[float], alpha: float) -> List[float]:
    out, m = [], values[0]
    for v in values:
        m = alpha * m + (1.0 - alpha) * v
        out.append(m)
    return out


def newest_log(log_dir: str) -> str:
    paths = sorted(glob.glob(os.path.join(log_dir, 'metrics_*.jsonl')),
                   key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(
            f'no metrics_*.jsonl under {log_dir} (runs logged to a real '
            f'wandb server have no local JSONL; pass --log-file)')
    return paths[-1]


def plot_training(path: str, out_path: str, keys=None, smooth: int = 0,
                  drop: Tuple[str, ...] = ('epoch', 'batch')) -> dict:
    """Render the run at ``path`` to ``out_path``; returns
    ``{key: final_value}`` for the plotted series."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    config, series = read_metrics(path)
    if keys:
        missing = [k for k in keys if k not in series]
        if missing:
            raise ValueError(f'keys {missing} not in {path}; available: '
                             f'{sorted(series)}')
        series = {k: series[k] for k in keys}
    else:
        series = {k: v for k, v in series.items() if k not in drop}
    if not series:
        raise ValueError(f'{path} holds no numeric metric series')

    panels: Dict[str, List[str]] = {}
    for k in sorted(series):
        panels.setdefault(group_key(k), []).append(k)

    n = len(panels)
    ncols = min(3, n)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(5.2 * ncols, 3.4 * nrows),
                             squeeze=False)
    fig.patch.set_facecolor(SURFACE)
    finals = {}
    for ax, (panel, panel_keys) in zip(axes.flat, panels.items()):
        ax.set_facecolor(SURFACE)
        for spine in ('top', 'right'):
            ax.spines[spine].set_visible(False)
        for spine in ('left', 'bottom'):
            ax.spines[spine].set_color(GRID)
        ax.grid(True, color=GRID, linewidth=0.6, alpha=0.8)
        ax.set_axisbelow(True)
        ax.tick_params(colors=INK_2, labelsize=8)
        for si, k in enumerate(panel_keys):
            xs = [x for x, _v in series[k]]
            ys = [v for _x, v in series[k]]
            finals[k] = ys[-1]
            color = SERIES[si % len(SERIES)]
            label = k.split('/')[-1] if len(panel_keys) > 1 else None
            if smooth > 1 and len(ys) >= smooth:
                alpha = 1.0 - 2.0 / (smooth + 1)
                ax.plot(xs, ys, color=color, linewidth=1.0, alpha=0.25)
                ax.plot(xs, ema(ys, alpha), color=color, linewidth=2.0,
                        label=label)
            else:
                ax.plot(xs, ys, color=color, linewidth=2.0, label=label)
        ax.set_title(panel, color=INK, fontsize=10)
        ax.set_xlabel('log record', color=INK_2, fontsize=8)
        if len(panel_keys) > 1:
            leg = ax.legend(fontsize=7, labelcolor=INK_2, frameon=True,
                            framealpha=0.92, edgecolor=GRID)
            leg.get_frame().set_facecolor(SURFACE)
    for ax in axes.flat[n:]:
        ax.set_visible(False)
    run_name = config.get('model_type') or os.path.basename(path)
    fig.suptitle(f'training curves — {run_name}', color=INK, fontsize=12)
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=120, facecolor=SURFACE)
    plt.close(fig)
    return finals


def plot_training_compare(paths, out_path, keys=None, smooth: int = 0,
                          labels=None,
                          drop: Tuple[str, ...] = ('epoch', 'batch')) -> dict:
    """Overlay several runs (``--compare``): one panel per metric key
    present in EVERY run, one color per run — the did-my-change-help
    view. Returns ``{label: {key: final_value}}``."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    if labels and len(labels) != len(paths):
        raise ValueError(f'{len(labels)} labels for {len(paths)} runs')
    runs = []
    for i, path in enumerate(paths):
        label = labels[i] if labels else os.path.splitext(
            os.path.basename(path))[0]
        runs.append((label, *read_metrics(path)))
    common = set(runs[0][2])
    for _label, _cfg, series in runs[1:]:
        common &= set(series)
    if keys:
        missing = [k for k in keys if k not in common]
        if missing:
            raise ValueError(f'keys {missing} not present in every run; '
                             f'common keys: {sorted(common)}')
    else:
        keys = sorted(k for k in common if k not in drop)
    if not keys:
        raise ValueError('the runs share no numeric metric keys')

    n = len(keys)
    ncols = min(3, n)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(5.2 * ncols, 3.4 * nrows),
                             squeeze=False)
    fig.patch.set_facecolor(SURFACE)
    finals: Dict[str, dict] = {label: {} for label, _c, _s in runs}
    for ax, k in zip(axes.flat, keys):
        ax.set_facecolor(SURFACE)
        for spine in ('top', 'right'):
            ax.spines[spine].set_visible(False)
        for spine in ('left', 'bottom'):
            ax.spines[spine].set_color(GRID)
        ax.grid(True, color=GRID, linewidth=0.6, alpha=0.8)
        ax.set_axisbelow(True)
        ax.tick_params(colors=INK_2, labelsize=8)
        for ri, (label, _cfg, series) in enumerate(runs):
            xs = [x for x, _v in series[k]]
            ys = [v for _x, v in series[k]]
            finals[label][k] = ys[-1]
            color = SERIES[ri % len(SERIES)]
            if smooth > 1 and len(ys) >= smooth:
                alpha = 1.0 - 2.0 / (smooth + 1)
                ax.plot(xs, ys, color=color, linewidth=1.0, alpha=0.25)
                ax.plot(xs, ema(ys, alpha), color=color, linewidth=2.0,
                        label=label)
            else:
                ax.plot(xs, ys, color=color, linewidth=2.0, label=label)
        ax.set_title(k, color=INK, fontsize=10)
        ax.set_xlabel('log record', color=INK_2, fontsize=8)
        leg = ax.legend(fontsize=7, labelcolor=INK_2, frameon=True,
                        framealpha=0.92, edgecolor=GRID)
        leg.get_frame().set_facecolor(SURFACE)
    for ax in axes.flat[n:]:
        ax.set_visible(False)
    fig.suptitle(f'training curves — {len(runs)} runs', color=INK,
                 fontsize=12)
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=120, facecolor=SURFACE)
    plt.close(fig)
    return finals


class PlotTrainingCommand:
    name = 'plot-training'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'plot-training',
            help='Render training curves from the offline metric JSONL '
                 '(the wandb fallback) into one PNG')
        parser.add_argument('--log-file', type=str, default=None,
                            help='A metrics_*.jsonl file (default: newest '
                                 'in --log-dir)')
        parser.add_argument('--log-dir', type=str, default='outputs/logs',
                            help='Where MetricLogger wrote its fallback '
                                 'JSONL files')
        parser.add_argument('--out', type=str,
                            default='outputs/plots/training_curves.png')
        parser.add_argument('--keys', type=str, nargs='+', default=None,
                            help='Plot only these metric keys (default: '
                                 'every numeric key except epoch/batch)')
        parser.add_argument('--smooth', type=int, default=0,
                            help='EMA smoothing span; raw series stays '
                                 'visible underneath (0 = off)')
        parser.add_argument('--compare', type=str, nargs='+', default=None,
                            metavar='JSONL',
                            help='Overlay several runs: one panel per '
                                 'shared metric key, one color per run')
        parser.add_argument('--labels', type=str, nargs='+', default=None,
                            help='Legend labels for --compare runs '
                                 '(default: file names)')

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'plot-training':
            return False
        if args.compare:
            finals = plot_training_compare(args.compare, args.out,
                                           keys=args.keys,
                                           smooth=args.smooth,
                                           labels=args.labels)
            print(f'compared {len(args.compare)} runs -> {args.out}')
            for label, fin in finals.items():
                for k in sorted(fin):
                    print(f'  {label} {k}  final {fin[k]:.6g}')
            return True
        path = args.log_file or newest_log(args.log_dir)
        finals = plot_training(path, args.out, keys=args.keys,
                               smooth=args.smooth)
        print(f'plotted {len(finals)} series from {path} -> {args.out}')
        width = max(len(k) for k in finals)
        for k in sorted(finals):
            print(f'  {k:<{width}}  final {finals[k]:.6g}')
        return True
