"""Honest reference-pipeline baseline: torch train loop WITH the
reference-shaped data path (per-window protobuf decode + per-field
featurization), measurable now that data/b3d_legacy.py exists.

Mirrors the reference pipeline shape:
- AddBiomechanicsDataset.__getitem__ (src/data/AddBiomechanicsDataset.py:161-247):
  readFrames(trial, start, window//stride, stride) -> per-pass field stacks
- train loop (src/cli/train.py:56-57,166-186): batch 64, MLP fwd+loss+bwd+step

Prints the measured windows/sec; record in BASELINE.md. Run on CPU
(the reference's SLURM partitions were CPU — BASELINE.md).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import torch

WINDOW, STRIDE = 50, 5
BATCH = 64

INPUT_FIELDS = ['pos', 'vel', 'acc', 'jointCentersInRootFrame',
                'rootLinearVelInRootFrame', 'rootLinearAccInRootFrame',
                'rootAngularVelInRootFrame', 'rootAngularAccInRootFrame',
                'rootPosHistoryInRootFrame', 'rootEulerHistoryInRootFrame']
LABEL_FIELDS = ['tau', 'residualWrenchInRootFrame', 'comAccInRootFrame',
                'groundContactWrenchesInRootFrame',
                'groundContactCenterOfPressureInRootFrame',
                'groundContactTorqueInRootFrame',
                'groundContactForceInRootFrame']


def getitem(subject, trial: int, start: int):
    """Reference __getitem__ shape: decode + row_stack per field."""
    frames = subject.readFrames(trial, start, WINDOW // STRIDE, stride=STRIDE)
    first = [f.processingPasses[0] for f in frames]
    last = [f.processingPasses[-1] for f in frames]
    inputs = {k: torch.row_stack([torch.tensor(getattr(p, k), dtype=torch.float32)
                                  for p in first]) for k in INPUT_FIELDS}
    labels = {k: torch.row_stack([torch.tensor(getattr(p, k), dtype=torch.float32)
                                  for p in last[-1:]]) for k in LABEL_FIELDS}
    return inputs, labels


def main():
    from inferbiomechanics_tpu.data.b3d_legacy import LegacySubjectOnDisk
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_legacy_subject

    tmp = '/tmp/ib_ref_baseline'
    os.makedirs(tmp, exist_ok=True)
    paths = []
    for i in range(2):
        p = os.path.join(tmp, f's{i}.b3d')
        if not os.path.exists(p):
            write_synthetic_legacy_subject(p, num_trials=2, trial_length=2000,
                                           seed=i)
        paths.append(p)
    subjects = [LegacySubjectOnDisk(p) for p in paths]

    # window table (reference ctor :131-139)
    windows = []
    for si, s in enumerate(subjects):
        for t in range(s.getNumTrials()):
            n = s.getTrialLength(t)
            for start in range(0, max(n - WINDOW - 1, 0), 7):  # subsample
                windows.append((si, t, start))
    rng = np.random.default_rng(0)
    order = rng.permutation(len(windows))

    # reference model shape (train.py:56; FeedForwardBaseline)
    sample_in, sample_lab = getitem(subjects[0], 0, 0)
    c_in = sum(v.numel() for v in sample_in.values())
    c_out = 30
    model = torch.nn.Sequential(
        torch.nn.Linear(c_in, 512), torch.nn.Sigmoid(),
        torch.nn.Linear(512, 512), torch.nn.Sigmoid(),
        torch.nn.Linear(512, c_out))
    opt = torch.optim.RMSprop(model.parameters(), lr=1e-4)

    n_batches = min(30, len(order) // BATCH)
    t0 = time.time()
    for b in range(n_batches):
        xs, ys = [], []
        for wi in order[b * BATCH:(b + 1) * BATCH]:
            si, t, start = windows[wi]
            inputs, labels = getitem(subjects[si], t, start)
            xs.append(torch.cat([v.flatten() for v in inputs.values()]))
            ys.append(torch.cat([labels['groundContactForceInRootFrame'].flatten(),
                                 labels['comAccInRootFrame'].flatten()])[:c_out])
        x = torch.stack(xs)
        y = torch.stack(ys)
        y = torch.nn.functional.pad(y, (0, c_out - y.shape[1]))
        opt.zero_grad()
        loss = ((model(x) - y) ** 2).mean()
        loss.backward()
        opt.step()
    dt = time.time() - t0
    wps = n_batches * BATCH / dt
    print(f'reference-shaped pipeline (decode+featurize+train, batch {BATCH}): '
          f'{wps:.1f} windows/sec over {n_batches} batches')

    # decode-only rate for the breakdown
    t0 = time.time()
    n = 256
    for wi in order[:n]:
        si, t, start = windows[wi]
        getitem(subjects[si], t, start)
    print(f'decode+featurize only: {n / (time.time() - t0):.1f} windows/sec')


if __name__ == '__main__':
    main()
