"""``make-plots`` subcommand — dataset statistics / figures engine.

Capability parity: reference ``src/cli/make_plots.py`` (1,842 LoC) — the
paper-figure engine: per-trial validity filtering (kinematics pass ∧
dynamics pass ∧ notMissingGRF, ref :1476), histograms of trial lengths /
speeds / contact distribution / max GRF (ref :1200-1223), the contact
pie chart (ref :1225-1240), demographics aggregation (age/sex/BMI,
ref :1000-1052), error-vs-frequency curves (RMSE between kinematics-pass
COM acc and GRF/mass after Butterworth low-pass filtering at cutoffs
0..30 Hz, ref :420-444,1245-1260), and pickle caches replayable via
``make-plots-from-cache`` (ref :1331-1383). Computation is vectorized
over whole trial matrices instead of per-frame Python loops.
"""

from __future__ import annotations

import argparse
import os
import pickle
from typing import Dict, List

import numpy as np

from inferbiomechanics_tpu.data.b3d import MissingGRFReason, SubjectOnDisk

GRAVITY_MAG = 9.81
FREQ_CUTOFFS = list(range(0, 31, 3))   # ref :1245 — [0, 3, ..., 30] Hz

# Motion-class labeling from trial-name keywords (capability parity with the
# reference's per-dataset rules + .npy classification dicts, ref :661-785;
# the reference's exact per-dataset tables are data-specific, so the rebuild
# ships keyword rules with the same class vocabulary).
MOTION_CLASSES = {
    'walk': ('walk', 'gait', 'tread'),
    'run': ('run', 'jog', 'sprint'),
    'stairs': ('stair', 'step'),
    'jump': ('jump', 'hop', 'land'),
    'squat': ('squat', 'sts', 'sit'),
    'other': (),
}


def classify_motion(trial_name: str) -> str:
    name = trial_name.lower()
    for cls, keywords in MOTION_CLASSES.items():
        if any(k in name for k in keywords):
            return cls
    return 'other'


def estimate_mass(total_grf: 'np.ndarray', com_acc: 'np.ndarray',
                  valid: 'np.ndarray') -> float:
    """Mass estimate from ‖ΣGRF‖ / ‖a_com − g‖ over valid frames
    (capability parity: ref :371-418)."""
    g = np.array([0.0, -GRAVITY_MAG, 0.0])
    acc = com_acc[valid] - g[None, :]
    f = total_grf[valid]
    denom = np.linalg.norm(acc, axis=1)
    keep = denom > 1.0
    if not keep.any():
        return float('nan')
    return float(np.median(np.linalg.norm(f[keep], axis=1) / denom[keep]))


def stance_speed(root_vel: 'np.ndarray', contact: 'np.ndarray',
                 valid: 'np.ndarray') -> float:
    """Treadmill-aware mean speed: sagittal root speed averaged over
    stance frames only (capability parity: ref :253-281 — on a treadmill
    the belt speed shows up as root-relative speed during stance)."""
    stance = (contact.sum(axis=1) > 0) & valid
    if not stance.any():
        return float('nan')
    return float(np.linalg.norm(root_vel[stance][:, [0, 2]], axis=1).mean())


def _butter_lowpass(signal: np.ndarray, cutoff_hz: float, fs: float) -> np.ndarray:
    """Zero-phase 3rd-order Butterworth low-pass (ref :420-444)."""
    from scipy.signal import butter, filtfilt
    if cutoff_hz <= 0 or cutoff_hz >= fs / 2:
        return signal
    b, a = butter(3, cutoff_hz / (fs / 2), btype='low')
    return filtfilt(b, a, signal, axis=0)


def collect_stats(subject_paths: List[str], short: bool = False) -> Dict:
    """One pass over all subjects -> the plot-data cache dict."""
    stats: Dict = {
        'trial_lengths_s': [], 'speeds_m_s': [], 'max_grf_n_kg': [],
        'contact_counts': {'flight': 0, 'single': 0, 'double': 0},
        'ages': [], 'sexes': [], 'bmis': [], 'masses': [], 'heights': [],
        'freq_cutoffs': FREQ_CUTOFFS,
        'freq_rmse': {c: [] for c in FREQ_CUTOFFS},
        'num_subjects': 0, 'num_trials': 0, 'total_frames': 0,
        'valid_frames': 0, 'total_hours': 0.0,
        'motion_class_hours': {c: 0.0 for c in MOTION_CLASSES},
        'estimated_masses': [],
        'stance_speeds_m_s': [],
        # scatter-matrix samples: (joint acc norm, total GRF norm/mass,
        # COM acc norm, grf distribution L share) per subsampled frame
        'scatter': {'joint_acc': [], 'total_grf': [], 'com_acc': [],
                    'grf_dist': []},
        'scatter_correlations': {},
    }
    if short:
        subject_paths = subject_paths[:2]
    for path in subject_paths:
        s = SubjectOnDisk(path)
        mass = s.getMassKg()
        height = s.getHeightM()
        stats['num_subjects'] += 1
        stats['ages'].append(s.getAgeYears())
        stats['sexes'].append(s.getBiologicalSex())
        stats['masses'].append(mass)
        stats['heights'].append(height)
        stats['bmis'].append(mass / max(height * height, 1e-6))
        offs = s.field_offsets

        def col(mat, name):
            o, w = offs[name]
            return mat[:, o:o + w]

        for trial in range(s.getNumTrials()):
            stats['num_trials'] += 1
            T = s.getTrialLength(trial)
            dt = s.getTrialTimestep(trial)
            fs = 1.0 / dt
            stats['trial_lengths_s'].append(T * dt)
            stats['total_frames'] += T
            stats['total_hours'] += T * dt / 3600.0
            kin = s.trial_pass_matrix(trial, 0)
            n_passes = s.getTrialNumProcessingPasses(trial)
            dyn = s.trial_pass_matrix(trial, n_passes - 1)
            valid = np.asarray([int(r) == int(MissingGRFReason.notMissingGRF)
                                for r in s.getMissingGRF(trial)])
            stats['valid_frames'] += int(valid.sum())

            # forward speed from root linear velocity (sagittal magnitude)
            v = col(kin, 'rootLinearVelInRootFrame')
            if valid.any():
                stats['speeds_m_s'].append(float(np.linalg.norm(
                    v[valid][:, [0, 2]], axis=1).mean()))

            grf = col(dyn, 'groundContactForce')
            nb = grf.shape[1] // 3
            grf_vecs = grf.reshape(T, nb, 3)
            total_grf = grf_vecs.sum(axis=1)
            if valid.any():
                stats['max_grf_n_kg'].append(
                    float(np.linalg.norm(total_grf[valid], axis=1).max() / mass))

            contact = col(dyn, 'contact')[:, :2]
            n_contact = (contact > 0.5).sum(axis=1)
            stats['contact_counts']['flight'] += int((n_contact[valid] == 0).sum())
            stats['contact_counts']['single'] += int((n_contact[valid] == 1).sum())
            stats['contact_counts']['double'] += int((n_contact[valid] >= 2).sum())

            # error-vs-frequency: kinematics COM acc vs GRF/mass - g
            com_acc_kin = col(kin, 'comAcc')
            grf_acc = total_grf / mass
            grf_acc = grf_acc + np.array([0.0, -GRAVITY_MAG, 0.0])[None, :]
            if valid.sum() > 30:
                for c in FREQ_CUTOFFS:
                    filt = _butter_lowpass(com_acc_kin, c, fs) if c > 0 else \
                        np.zeros_like(com_acc_kin)
                    err = filt[valid] - grf_acc[valid]
                    stats['freq_rmse'][c].append(
                        float(np.sqrt((err ** 2).mean())))

            # motion classification by trial name (ref :661-785)
            cls = classify_motion(s.getTrialName(trial))
            stats['motion_class_hours'][cls] += T * dt / 3600.0

            # mass estimation from dynamics (ref :371-418)
            m_est = estimate_mass(total_grf, col(dyn, 'comAcc'), valid)
            if np.isfinite(m_est):
                stats['estimated_masses'].append(m_est)

            # treadmill-aware stance-phase speed (ref :253-281)
            sp = stance_speed(v, contact > 0.5, valid)
            if np.isfinite(sp):
                stats['stance_speeds_m_s'].append(sp)

            # scatter samples (ref ScatterPlots matrices :560-616,907-985)
            if valid.any():
                idx = np.nonzero(valid)[0][::max(1, int(valid.sum()) // 200)]
                acc_q = col(kin, 'acc')
                fmag = np.linalg.norm(total_grf[idx], axis=1) / mass
                lmag = np.linalg.norm(grf_vecs[idx, 0], axis=1)
                tmag = np.linalg.norm(grf_vecs[idx], axis=2).sum(axis=1)
                with np.errstate(invalid='ignore', divide='ignore'):
                    dist = np.where(tmag > 1e-6, lmag / np.maximum(tmag, 1e-6), 0.5)
                stats['scatter']['joint_acc'] += np.linalg.norm(acc_q[idx], axis=1).tolist()
                stats['scatter']['total_grf'] += fmag.tolist()
                stats['scatter']['com_acc'] += np.linalg.norm(
                    col(dyn, 'comAcc')[idx], axis=1).tolist()
                stats['scatter']['grf_dist'] += dist.tolist()

    # Pearson correlations between scatter dimensions (ref :1778-1789)
    sc = {k: np.asarray(v) for k, v in stats['scatter'].items()}
    keys = list(sc.keys())
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            a, b = sc[keys[i]], sc[keys[j]]
            if a.size > 2 and np.std(a) > 0 and np.std(b) > 0:
                r = float(np.corrcoef(a, b)[0, 1])
                stats['scatter_correlations'][f'{keys[i]}~{keys[j]}'] = r
    return stats


def render_plots(stats: Dict, out_dir: str) -> List[str]:
    """Render the figure set to PNG files."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    written = []

    def save(name):
        path = os.path.join(out_dir, name)
        plt.tight_layout()
        plt.savefig(path, dpi=120)
        plt.close()
        written.append(path)

    for key, title, unit in [('trial_lengths_s', 'Trial lengths', 's'),
                             ('speeds_m_s', 'Mean speeds', 'm/s'),
                             ('stance_speeds_m_s', 'Stance-phase speeds', 'm/s'),
                             ('max_grf_n_kg', 'Max total GRF', 'N/kg'),
                             ('ages', 'Ages', 'years'),
                             ('estimated_masses', 'Estimated masses', 'kg'),
                             ('bmis', 'BMI', 'kg/m^2')]:
        data = stats.get(key, [])
        if data:
            plt.figure(figsize=(5, 4))
            plt.hist(data, bins=min(30, max(5, len(data))), color='#346beb')
            plt.title(title)
            plt.xlabel(unit)
            plt.ylabel('count')
            save(f'hist_{key}.png')

    cc = stats['contact_counts']
    if sum(cc.values()) > 0:
        plt.figure(figsize=(5, 4))
        plt.pie(list(cc.values()), labels=list(cc.keys()), autopct='%1.1f%%')
        plt.title('Contact distribution')
        save('contact_pie.png')

    mc = stats.get('motion_class_hours', {})
    if any(v > 0 for v in mc.values()):
        plt.figure(figsize=(6, 4))
        names = [k for k, v in mc.items() if v > 0]
        plt.bar(names, [mc[k] for k in names], color='#346beb')
        plt.title('Hours by activity class')
        plt.ylabel('hours')
        save('activity_bars.png')

    sc = {k: np.asarray(v) for k, v in stats.get('scatter', {}).items()}
    pairs = [('joint_acc', 'total_grf'), ('com_acc', 'total_grf'),
             ('total_grf', 'grf_dist'), ('joint_acc', 'com_acc')]
    ready = [(a, b) for a, b in pairs
             if sc.get(a) is not None and sc[a].size > 2 and sc[b].size == sc[a].size]
    if ready:
        n = len(ready)
        plt.figure(figsize=(4 * n, 3.6))
        corr = stats.get('scatter_correlations', {})
        for i, (a, b) in enumerate(ready):
            ax = plt.subplot(1, n, i + 1)
            ax.scatter(sc[a], sc[b], s=3, alpha=0.3, color='#346beb')
            r = corr.get(f'{a}~{b}', corr.get(f'{b}~{a}'))
            ax.set_title(f'{a} vs {b}' + (f'  (r={r:.2f})' if r is not None else ''))
            ax.set_xlabel(a)
            ax.set_ylabel(b)
        save('scatter_matrix.png')

    fr = stats['freq_rmse']
    cutoffs = [c for c in stats['freq_cutoffs'] if fr[c]]
    if cutoffs:
        plt.figure(figsize=(5, 4))
        means = [float(np.mean(fr[c])) for c in cutoffs]
        plt.plot(cutoffs, means, marker='o')
        plt.title('COM acc vs GRF/mass RMSE by low-pass cutoff')
        plt.xlabel('cutoff (Hz)')
        plt.ylabel('RMSE (m/s^2)')
        save('err_vs_frequency.png')
    return written


class MakePlotsCommand:
    name = 'make-plots'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'make-plots', help='Compute dataset statistics and render figures')
        parser.add_argument('--data-path', type=str, default='../data')
        parser.add_argument('--out-dir', type=str, default='outputs/plots')
        parser.add_argument('--cache', type=str, default='outputs/plots/cache.pkl')
        parser.add_argument('--use-cache', action='store_true',
                            help='Replay an existing cache instead of rescanning')
        parser.add_argument('--short', action='store_true')

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'make-plots':
            return False
        if args.use_cache and os.path.exists(args.cache):
            with open(args.cache, 'rb') as f:
                stats = pickle.load(f)
            print(f'loaded cache {args.cache}')
        else:
            paths = []
            for root, _dirs, files in os.walk(args.data_path):
                for fname in sorted(files):
                    if fname.endswith('.b3d') and 'vander' not in fname.lower():
                        paths.append(os.path.join(root, fname))
            print(f'scanning {len(paths)} subjects...')
            stats = collect_stats(paths, short=args.short)
            os.makedirs(os.path.dirname(os.path.abspath(args.cache)), exist_ok=True)
            with open(args.cache, 'wb') as f:
                pickle.dump(stats, f)
            print(f'wrote cache {args.cache}')

        print(f"subjects={stats['num_subjects']} trials={stats['num_trials']} "
              f"hours={stats['total_hours']:.2f} "
              f"valid_frames={stats['valid_frames']}/{stats['total_frames']}")
        for path in render_plots(stats, args.out_dir):
            print(f'wrote {path}')
        return True
