"""Generate the committed legacy .b3d fixture (tests/test_b3d_legacy.py).

Deterministic payload: every channel value is ``pass*1000 + frame*10 +
column/100`` so the reader tests can assert exact literals. Re-running this
script must reproduce the committed binary byte-for-byte.
"""

import os

import numpy as np

from inferbiomechanics_tpu.data.b3d import (
    TrialData, layout_total, pass_channel_layout,
)
from inferbiomechanics_tpu.data.b3d_legacy import write_legacy_subject
from inferbiomechanics_tpu.data.synthetic import standard_skeleton

T, D, NB, RH = 12, 23, 2, 10
C = layout_total(pass_channel_layout(D, NB, RH))

passes = []
for p in range(2):
    k = np.arange(T, dtype=np.float32)[:, None]
    c = np.arange(C, dtype=np.float32)[None, :]
    passes.append(np.asarray(p * 1000 + k * 10 + c / 100.0, np.float32))

trial = TrialData(
    name='fixture_trial', timestep=0.008333, passes=passes,
    pass_types=[0, 1],
    missing_grf_reasons=[0, 0, 0, 10, 0, 0, 0, 0, 9, 0, 0, 0])

out = os.path.join(os.path.dirname(__file__), 'legacy_subject.b3d')
write_legacy_subject(
    out, num_dofs=D, ground_force_bodies=['calcn_l', 'calcn_r'],
    root_history_len=RH, trials=[trial], skeleton=standard_skeleton(),
    mass_kg=61.5, height_m=1.62, age_years=27, biological_sex='female')
print(f'wrote {out} ({os.path.getsize(out)} bytes)')
