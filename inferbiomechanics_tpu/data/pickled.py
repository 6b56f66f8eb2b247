"""Pre-materialized dataset blocks.

Capability parity: reference ``src/data/PickledDataset.py`` — load
windows from blocks written by the ``pickle-data`` command (§2.14),
skipping all header/featurization work. Blocks are ``.npz`` files
holding the packed feature/label matrices plus the window table (see
cli/pickle_data_cmd.py), so a loaded PickledDataset serves batches
through the same ``gather``/``batches`` interface as WindowDataset.
"""

from __future__ import annotations

import glob
import os
from typing import List

import numpy as np

from inferbiomechanics_tpu.data.dataset import WindowDataset, input_layout, label_layout, _offsets


class PickledDataset:
    """Load `{split}_{i}.npz` blocks from a `*_pickled` directory."""

    def __init__(self, pickled_dir: str, num_dofs: int = 23,
                 root_history_len: int = 10, num_contact_bodies: int = 2):
        paths = sorted(glob.glob(os.path.join(pickled_dir, '*.npz')))
        if not paths:
            raise FileNotFoundError(f'no .npz blocks in {pickled_dir}')
        feats, labs, fts, subs, trs, starts = [], [], [], [], [], []
        row_offset = 0
        ft_offset = 0
        self.window_size = None
        self.stride = None
        trial_offsets = []
        for p in paths:
            z = np.load(p)
            if self.window_size is None:
                self.window_size = int(z['window_size'])
                self.stride = int(z['stride'])
                # all blocks share the same matrices in the current writer;
                # only the first block's arrays are loaded once
                feats.append(z['features_all'])
                labs.append(z['labels_all'])
                trial_offsets = z['trial_row_offset']
            fts.append(z['win_ft'])
            subs.append(z['win_subject'])
            trs.append(z['win_trial'])
            starts.append(z['win_start'])
        self.features_all = np.concatenate(feats)
        self.labels_all = np.concatenate(labs)
        self.trial_row_offset = np.asarray(trial_offsets, np.int64)
        self.win_ft = np.concatenate(fts)
        self.win_subject = np.concatenate(subs)
        self.win_trial = np.concatenate(trs)
        self.win_start = np.concatenate(starts)

        self.num_dofs = num_dofs
        self.root_history_len = root_history_len
        self.num_contact_bodies = num_contact_bodies
        self.in_layout = input_layout(num_dofs, root_history_len)
        self.lab_layout = label_layout(num_dofs, num_contact_bodies)
        self.in_offsets = _offsets(self.in_layout)
        self.lab_offsets = _offsets(self.lab_layout)
        self.num_input_channels = self.features_all.shape[1]
        self.num_label_channels = self.labels_all.shape[1]
        self.num_model_frames = self.window_size // self.stride
        self.output_data_format = 'last_frame'
        self.num_output_frames = 1
        self.subjects: List = []
        self.subject_paths: List[str] = []
        self.contact_bodies = ['calcn_r', 'calcn_l'][:num_contact_bodies]
        self.skeletons: List = []

    # reuse WindowDataset's gather/batches/unpack implementations
    __len__ = WindowDataset.__len__
    gather = WindowDataset.gather
    batches = WindowDataset.batches
    unpack_inputs = WindowDataset.unpack_inputs
    unpack_labels = WindowDataset.unpack_labels
