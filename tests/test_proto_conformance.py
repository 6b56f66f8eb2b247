"""Wire-format conformance: the hand-rolled codec vs the OFFICIAL protobuf.

Compiles protos/subject_on_disk.proto with protoc at test time and checks
both directions: bytes written by google.protobuf parse identically through
data/b3d_legacy.py, and bytes written by write_legacy_subject parse
identically through the official runtime. This pins the codec to the
protobuf spec, not merely to its own inverse.
"""

import os
import shutil
import struct
import subprocess
import sys

import numpy as np
import pytest

from inferbiomechanics_tpu.data import b3d_legacy as L
from inferbiomechanics_tpu.data.b3d import (
    layout_offsets, layout_total, pass_channel_layout,
)
from inferbiomechanics_tpu.data.synthetic import (
    CONTACT_BODIES, write_synthetic_legacy_subject, synthetic_trial,
)

PROTO = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     'protos', 'subject_on_disk.proto')


@pytest.fixture(scope='module')
def pb(tmp_path_factory):
    if shutil.which('protoc') is None:
        pytest.skip('protoc not available')
    out = str(tmp_path_factory.mktemp('pb'))
    res = subprocess.run(['protoc', f'--proto_path={os.path.dirname(PROTO)}',
                          f'--python_out={out}', PROTO],
                         capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    sys.path.insert(0, out)
    try:
        import subject_on_disk_pb2
    except ImportError as e:
        pytest.skip(f'generated code unusable with this runtime: {e}')
    finally:
        sys.path.remove(out)
    return subject_on_disk_pb2


def test_official_header_parses_through_our_codec(pb):
    h = pb.SubjectHeader(num_dofs=23, num_joints=12, biological_sex='female',
                         mass_kg=61.5, height_m=1.62, age_years=27, version=1)
    h.ground_force_body.extend(['calcn_l', 'calcn_r'])
    h.dof_name.extend([f'd{i}' for i in range(23)])
    ph = h.processing_pass_header.add()
    ph.type = 1
    th = h.trial_header.add()
    th.name = 'walk_01'
    th.trial_length = 3
    th.trial_timestep = 0.01
    th.missing_grf_reason.extend([0, 10, 0])
    th.trial_pass_type.extend([0, 1])
    th.frame_bytes.extend([20, 20, 20])
    blob = h.SerializeToString()

    f = L.parse_message(blob)
    assert L.get_int(f, L._H['num_dofs']) == 23
    assert L.get_double(f, L._H['mass_kg']) == 61.5
    assert L.get_str(f, L._H['biological_sex']) == 'female'
    assert L.get_strs(f, L._H['ground_force_body']) == ['calcn_l', 'calcn_r']
    ths = L.get_messages(f, L._H['trial_header'])
    assert len(ths) == 1
    assert L.get_str(ths[0], L._TH['name']) == 'walk_01'
    assert L.get_packed_ints(ths[0], L._TH['missing_grf_reason']) == [0, 10, 0]
    assert L.get_packed_ints(ths[0], L._TH['frame_bytes']) == [20, 20, 20]


def test_our_frame_bytes_parse_through_official_runtime(pb):
    """write_legacy_subject's frame records are valid protobuf per the
    official parser, field for field."""
    rng = np.random.default_rng(5)
    trial = synthetic_trial('t', 6, rng=rng)
    layout = pass_channel_layout(23, len(CONTACT_BODIES), 10)
    offs = layout_offsets(layout)
    body = L._encode_pass_frame(trial.passes[0][2], offs)
    m = pb.PassFrame()
    m.ParseFromString(body)
    o, w = offs['pos']
    np.testing.assert_allclose(np.asarray(m.pos, np.float32),
                               trial.passes[0][2, o:o + w])
    o, w = offs['tau']
    np.testing.assert_allclose(np.asarray(m.tau, np.float32),
                               trial.passes[0][2, o:o + w])
    o, w = offs['contact']
    np.testing.assert_array_equal(np.asarray(m.contact, np.float32),
                                  trial.passes[0][2, o:o + w])


def test_official_full_file_roundtrip(pb, tmp_path):
    """A complete legacy file whose protos were serialized by the OFFICIAL
    runtime reads back through LegacySubjectOnDisk (and converts)."""
    layout = pass_channel_layout(4, 2, 2)
    offs = layout_offsets(layout)
    C = layout_total(layout)
    T = 3
    mats = [np.arange(T * C, dtype=np.float32).reshape(T, C) * (p + 1)
            for p in range(2)]

    frames = []
    for k in range(T):
        fr = pb.SubjectFrame(missing_grf_reason=0)
        for p in range(2):
            pf = fr.processing_pass.add()
            for name, (o, w) in offs.items():
                vals = mats[p][k, o:o + w]
                field = getattr(pf, {
                    'comPos': 'com_pos', 'comVel': 'com_vel',
                    'comAcc': 'com_acc',
                    'comAccInRootFrame': 'com_acc_in_root_frame',
                    'residualWrenchInRootFrame': 'residual_wrench_in_root_frame',
                    'jointCentersInRootFrame': 'joint_centers_in_root_frame',
                    'rootLinearVelInRootFrame': 'root_linear_vel_in_root_frame',
                    'rootAngularVelInRootFrame': 'root_angular_vel_in_root_frame',
                    'rootLinearAccInRootFrame': 'root_linear_acc_in_root_frame',
                    'rootAngularAccInRootFrame': 'root_angular_acc_in_root_frame',
                    'rootPosHistoryInRootFrame': 'root_pos_history_in_root_frame',
                    'rootEulerHistoryInRootFrame': 'root_euler_history_in_root_frame',
                    'rootPosInWorld': 'root_pos_in_world',
                    'rootEulerInWorld': 'root_euler_in_world',
                    'groundContactWrenchesInRootFrame': 'ground_contact_wrenches_in_root_frame',
                    'groundContactCenterOfPressureInRootFrame': 'ground_contact_cop_in_root_frame',
                    'groundContactTorqueInRootFrame': 'ground_contact_torque_in_root_frame',
                    'groundContactForceInRootFrame': 'ground_contact_force_in_root_frame',
                    'groundContactWrenches': 'ground_contact_wrenches',
                    'groundContactCenterOfPressure': 'ground_contact_cop',
                    'groundContactTorque': 'ground_contact_torque',
                    'groundContactForce': 'ground_contact_force',
                }.get(name, name))
                if name == 'contact':
                    field.extend(int(v) for v in vals)
                else:
                    field.extend(float(v) for v in vals)
        frames.append(fr.SerializeToString())

    h = pb.SubjectHeader(num_dofs=4, num_joints=2, biological_sex='male',
                         mass_kg=80.0, height_m=1.8, age_years=40, version=1)
    h.ground_force_body.extend(['calcn_l', 'calcn_r'])
    ph = h.processing_pass_header.add(); ph.type = 0
    ph2 = h.processing_pass_header.add(); ph2.type = 1
    th = h.trial_header.add()
    th.name = 'official'
    th.trial_length = T
    th.trial_timestep = 0.005
    th.missing_grf_reason.extend([0, 0, 0])
    th.trial_pass_type.extend([0, 1])
    th.frame_bytes.extend([len(f) + 8 for f in frames])
    header = h.SerializeToString()

    path = str(tmp_path / 'official.b3d')
    with open(path, 'wb') as f:
        f.write(struct.pack('<Q', len(header)))
        f.write(header)
        for fr in frames:
            f.write(struct.pack('<Q', len(fr)))
            f.write(fr)

    s = L.LegacySubjectOnDisk(path)
    assert s.getNumDofs() == 4
    assert s.getTrialName(0) == 'official'
    got = s.readFrames(0, 0, T)
    for k in range(T):
        for p in range(2):
            for name, (o, w) in offs.items():
                np.testing.assert_allclose(
                    np.asarray(getattr(got[k].processingPasses[p], name),
                               np.float32),
                    mats[p][k, o:o + w], err_msg=f'{k}/{p}/{name}')
    s.close()
    # and the converter (incl. the native C decoder) handles it
    out = str(tmp_path / 'official_tpu.b3d')
    L.convert_to_tpu(out_path=out, legacy_path=path)
    from inferbiomechanics_tpu.data.b3d import SubjectOnDisk
    t = SubjectOnDisk(out)
    for p in range(2):
        np.testing.assert_allclose(t.trial_pass_matrix(0, p), mats[p],
                                   rtol=1e-6)
    t.close()
