"""Anti-bitrot smoke for the learning-quality parity study.

``scripts/parity_rmse.py`` anchors BASELINE.json's north star (dev-RMSE
parity vs the reference-shaped torch models, PARITY_RMSE.md); this
keeps both of its modes runnable: tiny trials, 1 epoch, 1 seed, both
sides must produce finite metric curves.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')   # the study's anchor side

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, 'scripts', 'parity_rmse.py')


@pytest.mark.parametrize('model', ['feedforward', 'groundlink'])
def test_parity_rmse_smoke(model, tmp_path):
    out = str(tmp_path / f'{model}.json')
    env = dict(os.environ, IB_PLATFORM='cpu')
    r = subprocess.run(
        [sys.executable, SCRIPT, '--model', model, '--epochs', '1',
         '--seeds', '0', '--trial-length', '300',
         '--data', str(tmp_path / 'data'), '--out', out],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    res = json.load(open(out))
    assert res['config']['model'] == model
    for side in ('torch', 'jax'):
        curve = res[side]['0']
        assert len(curve) == 1
        for metric, v in curve[0].items():
            assert np.isfinite(v), (side, metric, v)
