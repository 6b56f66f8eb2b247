"""Table-free legacy-schema inference (data/b3d_infer.py).

The built-in ``b3d_legacy`` field tables are a reconstruction; these
tests prove the inference tool would CATCH a real nimble file whose
numbering differs — writing fixtures under perturbed tables and checking
the diagnosis names the moved fields — and stays silent when the file
agrees.
"""

import os
import subprocess
import sys

import pytest

from inferbiomechanics_tpu.data import b3d_legacy as L
from inferbiomechanics_tpu.data.b3d_infer import (
    format_infer_report, infer_legacy_schema, walk_framing,
)
from inferbiomechanics_tpu.data.synthetic import write_synthetic_legacy_subject

MAIN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    'main.py')


@pytest.fixture()
def legacy_file(tmp_path):
    p = str(tmp_path / 's.b3d')
    write_synthetic_legacy_subject(p, num_trials=2, trial_length=50,
                                   missing_frac=0.1, seed=3)
    return p


def test_walk_framing(legacy_file):
    header, sizes = walk_framing(legacy_file)
    assert len(header) > 100
    assert len(sizes) == 100            # 2 trials x 50 frames
    assert len(set(sizes)) >= 1 and min(sizes) > 100


def test_infer_matches_builtin_tables(legacy_file):
    """On a file written with the built-in tables, every uniquely
    inferable field lands on the built-in number and the diff is empty."""
    r = infer_legacy_schema(legacy_file)
    assert r['builtin_diff'] == []
    assert r['num_dofs'] == 23
    assert r['framing']['num_trials'] == 2
    for name in ('num_dofs', 'num_joints', 'ground_force_body',
                 'trial_header', 'processing_pass_header', 'mass_kg',
                 'height_m', 'dof_name', 'joint_name'):
        assert r['proposed']['H'][name] == L._H[name], name
    for name in ('name', 'trial_length', 'trial_timestep', 'frame_bytes',
                 'missing_grf_reason', 'trial_pass_type'):
        assert r['proposed']['TH'][name] == L._TH[name], name
    assert r['proposed']['F']['processing_pass'] == L._F['processing_pass']
    assert r['proposed']['F']['missing_grf_reason'] == L._F['missing_grf_reason']
    # the unique-width pass field resolves to its exact name
    jc = [e for e in r['proposed']['PF_width_classes']
          if e['candidates'] == ['jointCentersInRootFrame']]
    assert jc and jc[0]['field'] == L._PF['jointCentersInRootFrame']
    assert any('_PF confirmed' in n for n in r['notes'])
    assert 'CONSISTENT' in format_infer_report(r)


def test_infer_flags_moved_header_fields(tmp_path, monkeypatch):
    """A file whose header numbering differs (num_dofs moved, mass/height
    swapped) is diagnosed field-by-field against the built-ins."""
    perturbed = dict(L._H)
    perturbed['num_dofs'], perturbed['version'] = 15, 1   # swap 1 <-> 15
    perturbed['mass_kg'], perturbed['height_m'] = 8, 7    # swap 7 <-> 8
    monkeypatch.setattr(L, '_H', perturbed)
    p = str(tmp_path / 'moved.b3d')
    write_synthetic_legacy_subject(p, num_trials=1, trial_length=30, seed=0)
    monkeypatch.undo()                                    # infer vs REAL tables

    r = infer_legacy_schema(p)
    assert r['proposed']['H']['num_dofs'] == 15
    assert r['proposed']['H']['mass_kg'] == 8
    assert r['proposed']['H']['height_m'] == 7
    msgs = '\n'.join(r['builtin_diff'])
    assert '_H[num_dofs]: file says field 15' in msgs
    assert '_H[mass_kg]: file says field 8' in msgs
    assert '_H[height_m]: file says field 7' in msgs


def test_infer_flags_moved_pass_field(tmp_path, monkeypatch):
    """A pass-frame field with a UNIQUE width (joint centers) moved to a
    different field number is named in the diff."""
    pf = dict(L._PF)
    a, b = pf['jointCentersInRootFrame'], pf['rootLinearVelInRootFrame']
    pf['jointCentersInRootFrame'], pf['rootLinearVelInRootFrame'] = b, a
    monkeypatch.setattr(L, '_PF', pf)
    p = str(tmp_path / 'movedpf.b3d')
    write_synthetic_legacy_subject(p, num_trials=1, trial_length=30, seed=0)
    monkeypatch.undo()

    r = infer_legacy_schema(p)
    msgs = '\n'.join(r['builtin_diff'])
    assert f'_PF[jointCentersInRootFrame]: file says field {b}' in msgs
    # order no longer matches the built-in layout
    assert not any('_PF confirmed' in n for n in r['notes'])


def test_infer_cli(legacy_file, tmp_path):
    env = dict(os.environ, IB_PLATFORM='cpu')
    out = subprocess.run(
        [sys.executable, MAIN, 'convert-b3d', legacy_file, '--infer-schema'],
        capture_output=True, text=True, env=env, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'CONSISTENT' in out.stdout
    assert 'num_dofs: 23' in out.stdout


def test_infer_rejects_non_framed_garbage(tmp_path):
    p = str(tmp_path / 'junk.b3d')
    with open(p, 'wb') as f:
        f.write(b'\xff' * 64)
    with pytest.raises(ValueError):
        infer_legacy_schema(p)


@pytest.mark.parametrize('seed', [1, 2, 3])
def test_infer_under_fully_shuffled_pf_tables(tmp_path, monkeypatch, seed):
    """Fuzz: write a fixture under a RANDOM permutation of the pass-frame
    field numbering; every unique-width field must be re-located and the
    order mismatch must be flagged (unless the permutation happens to be
    order-preserving for the unique fields)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    names = list(L._PF)
    new_nums = rng.permutation(np.arange(1, len(names) + 1)).tolist()
    pf = dict(zip(names, new_nums))
    monkeypatch.setattr(L, '_PF', pf)
    monkeypatch.setattr(L, '_PF_CONTACT_FIELD', pf['contact'])
    p = str(tmp_path / f'shuf{seed}.b3d')
    write_synthetic_legacy_subject(p, num_trials=1, trial_length=30,
                                   seed=seed)
    monkeypatch.undo()

    r = infer_legacy_schema(p)
    # the unique-width field (joint centers, 36 wide) must be found at
    # its shuffled number
    jc = [e for e in r['proposed']['PF_width_classes']
          if e['candidates'] == ['jointCentersInRootFrame']]
    assert jc and jc[0]['field'] == pf['jointCentersInRootFrame']
    # contact (packed ints) found at its shuffled number
    ct = [e for e in r['proposed']['PF_width_classes']
          if e['candidates'] == ['contact']]
    assert ct and ct[0]['field'] == pf['contact']
    if pf['jointCentersInRootFrame'] != L._PF['jointCentersInRootFrame']:
        assert any('jointCentersInRootFrame' in d for d in r['builtin_diff'])
