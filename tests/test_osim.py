"""OpenSim .osim XML -> SkeletonSpec parser (data/osim.py).

Parity surface: nimble's readSkel consumed the model_osim_text embedded in
real .b3d files (reference AddBiomechanicsDataset.py:127); the parser
extracts the body tree + joint topology subset our kernels use.
"""

import numpy as np
import pytest

from inferbiomechanics_tpu.data.osim import parse_osim

OSIM = """<?xml version="1.0" encoding="UTF-8" ?>
<OpenSimDocument Version="40000">
<Model name="subject_scaled">
 <BodySet><objects>
  <Body name="pelvis">
   <mass>11.777</mass>
   <mass_center>-0.0707 0 0</mass_center>
   <inertia>0.1028 0.0871 0.0579 0 0 0</inertia>
  </Body>
  <Body name="femur_r">
   <mass>9.3014</mass>
   <mass_center>0 -0.17 0</mass_center>
   <inertia>0.1339 0.0351 0.1412 0 0 0</inertia>
  </Body>
  <Body name="tibia_r">
   <mass>3.7075</mass>
   <mass_center>0 -0.1867 0</mass_center>
   <inertia>0.0504 0.0051 0.0511 0 0 0</inertia>
  </Body>
  <Body name="talus_r">
   <mass>0.1</mass>
   <mass_center>0 0 0</mass_center>
   <inertia_xx>0.001</inertia_xx><inertia_yy>0.001</inertia_yy>
   <inertia_zz>0.001</inertia_zz><inertia_xy>0</inertia_xy>
   <inertia_xz>0</inertia_xz><inertia_yz>0</inertia_yz>
  </Body>
  <Body name="torso">
   <mass>26.82</mass>
   <mass_center>-0.03 0.32 0</mass_center>
   <inertia>1.47 0.75 1.43 0 0 0</inertia>
  </Body>
 </objects></BodySet>
 <JointSet><objects>
  <CustomJoint name="ground_pelvis">
   <socket_parent_frame>ground_offset</socket_parent_frame>
   <socket_child_frame>pelvis_offset</socket_child_frame>
   <coordinates>
    <Coordinate name="pelvis_tilt"/><Coordinate name="pelvis_list"/>
    <Coordinate name="pelvis_rotation"/><Coordinate name="pelvis_tx"/>
    <Coordinate name="pelvis_ty"/><Coordinate name="pelvis_tz"/>
   </coordinates>
   <frames>
    <PhysicalOffsetFrame name="ground_offset">
     <socket_parent>/ground</socket_parent>
     <translation>0 0 0</translation><orientation>0 0 0</orientation>
    </PhysicalOffsetFrame>
    <PhysicalOffsetFrame name="pelvis_offset">
     <socket_parent>/bodyset/pelvis</socket_parent>
     <translation>0 0 0</translation><orientation>0 0 0</orientation>
    </PhysicalOffsetFrame>
   </frames>
  </CustomJoint>
  <CustomJoint name="hip_r">
   <socket_parent_frame>pelvis_offset</socket_parent_frame>
   <socket_child_frame>femur_r_offset</socket_child_frame>
   <coordinates>
    <Coordinate name="hip_flexion_r"/><Coordinate name="hip_adduction_r"/>
    <Coordinate name="hip_rotation_r"/>
   </coordinates>
   <SpatialTransform>
    <TransformAxis name="rotation1"><coordinates>hip_flexion_r</coordinates><axis>0 0 1</axis></TransformAxis>
    <TransformAxis name="rotation2"><coordinates>hip_adduction_r</coordinates><axis>1 0 0</axis></TransformAxis>
    <TransformAxis name="rotation3"><coordinates>hip_rotation_r</coordinates><axis>0 1 0</axis></TransformAxis>
   </SpatialTransform>
   <frames>
    <PhysicalOffsetFrame name="pelvis_offset">
     <socket_parent>/bodyset/pelvis</socket_parent>
     <translation>-0.0707 -0.0661 0.0835</translation><orientation>0 0 0</orientation>
    </PhysicalOffsetFrame>
    <PhysicalOffsetFrame name="femur_r_offset">
     <socket_parent>/bodyset/femur_r</socket_parent>
     <translation>0 0 0</translation><orientation>0 0 0</orientation>
    </PhysicalOffsetFrame>
   </frames>
  </CustomJoint>
  <CustomJoint name="walker_knee_r">
   <socket_parent_frame>femur_r_offset</socket_parent_frame>
   <socket_child_frame>tibia_r_offset</socket_child_frame>
   <coordinates><Coordinate name="knee_angle_r"/></coordinates>
   <SpatialTransform>
    <TransformAxis name="rotation1"><coordinates>knee_angle_r</coordinates><axis>0 0 1</axis></TransformAxis>
    <TransformAxis name="translation1"><coordinates>knee_angle_r</coordinates><axis>1 0 0</axis></TransformAxis>
   </SpatialTransform>
   <frames>
    <PhysicalOffsetFrame name="femur_r_offset">
     <socket_parent>/bodyset/femur_r</socket_parent>
     <translation>0 -0.40 0</translation><orientation>0 0 0</orientation>
    </PhysicalOffsetFrame>
    <PhysicalOffsetFrame name="tibia_r_offset">
     <socket_parent>/bodyset/tibia_r</socket_parent>
     <translation>0 0 0</translation><orientation>0 0 0</orientation>
    </PhysicalOffsetFrame>
   </frames>
  </CustomJoint>
  <PinJoint name="ankle_r">
   <socket_parent_frame>tibia_r_offset</socket_parent_frame>
   <socket_child_frame>talus_r_offset</socket_child_frame>
   <frames>
    <PhysicalOffsetFrame name="tibia_r_offset">
     <socket_parent>/bodyset/tibia_r</socket_parent>
     <translation>0 -0.43 0</translation><orientation>0 0 0</orientation>
    </PhysicalOffsetFrame>
    <PhysicalOffsetFrame name="talus_r_offset">
     <socket_parent>/bodyset/talus_r</socket_parent>
     <translation>0 0 0</translation><orientation>0 0 0</orientation>
    </PhysicalOffsetFrame>
   </frames>
  </PinJoint>
  <WeldJoint name="back">
   <socket_parent_frame>pelvis_offset</socket_parent_frame>
   <socket_child_frame>torso_offset</socket_child_frame>
   <frames>
    <PhysicalOffsetFrame name="pelvis_offset">
     <socket_parent>/bodyset/pelvis</socket_parent>
     <translation>-0.1 0.08 0</translation><orientation>0 0 0</orientation>
    </PhysicalOffsetFrame>
    <PhysicalOffsetFrame name="torso_offset">
     <socket_parent>/bodyset/torso</socket_parent>
     <translation>0 0 0</translation><orientation>0 0 0</orientation>
    </PhysicalOffsetFrame>
   </frames>
  </WeldJoint>
 </objects></JointSet>
</Model>
</OpenSimDocument>
"""


def test_parse_osim_structure():
    spec, warnings = parse_osim(OSIM)
    assert [b.name for b in spec.bodies] == ['pelvis', 'femur_r', 'tibia_r',
                                             'talus_r', 'torso']
    assert spec.bodies[0].mass == pytest.approx(11.777)
    assert spec.bodies[0].com == pytest.approx([-0.0707, 0, 0])
    assert spec.bodies[0].inertia[:3] == pytest.approx([0.1028, 0.0871, 0.0579])
    # 3.x-style per-element inertia also parsed
    assert spec.bodies[3].inertia == pytest.approx([0.001, 0.001, 0.001, 0, 0, 0])

    types = {j.name: j.type for j in spec.joints}
    assert types == {'ground_pelvis': 'free', 'hip_r': 'ball',
                     'walker_knee_r': 'revolute', 'ankle_r': 'revolute',
                     'back': 'fixed'}
    # 6 (free) + 3 (ball) + 1 + 1 + 0 = 11 DOFs
    assert spec.num_dofs == 11
    hip = next(j for j in spec.joints if j.name == 'hip_r')
    assert hip.parent_body == 0 and hip.child_body == 1
    assert hip.translation == pytest.approx([-0.0707, -0.0661, 0.0835])
    knee = next(j for j in spec.joints if j.name == 'walker_knee_r')
    assert knee.axis == pytest.approx([0, 0, 1])
    # the knee's coupled translation function is an approximation -> warned
    assert any('walker_knee_r' in w for w in warnings)
    # topological order: every joint's parent body already placed
    placed = {-1}
    for j in spec.joints:
        assert j.parent_body in placed
        placed.add(j.child_body)


def test_parsed_skeleton_runs_fk_and_id():
    import jax.numpy as jnp
    from inferbiomechanics_tpu.ops.skeleton import compile_skeleton
    spec, _ = parse_osim(OSIM)
    sk = compile_skeleton(spec)
    assert sk.num_dofs == 11
    q = jnp.zeros(11)
    Rs, ps = sk.fk(q)
    assert Rs.shape == (5, 3, 3) and ps.shape == (5, 3)
    # weld: torso rides the pelvis at the weld offset
    np.testing.assert_allclose(np.asarray(ps)[4], [-0.1, 0.08, 0], atol=1e-7)
    # hinge at the parsed hip offset
    np.testing.assert_allclose(np.asarray(ps)[1], [-0.0707, -0.0661, 0.0835],
                               atol=1e-7)
    tau = sk.inverse_dynamics(q, jnp.zeros(11), jnp.zeros(11))
    assert np.isfinite(np.asarray(tau)).all()
    # static equilibrium: vertical root DOF carries the full weight
    total_m = sum(b.mass for b in spec.bodies)
    assert float(tau[4]) == pytest.approx(9.81 * total_m, rel=1e-5)


def test_legacy_file_osim_fallback(tmp_path):
    """A legacy .b3d whose pass headers carry only model_osim_text (like
    real nimble files) still yields a skeleton through readSkel."""
    import numpy as np
    from inferbiomechanics_tpu.data import b3d_legacy as L
    from inferbiomechanics_tpu.data.b3d import TrialData, layout_total, pass_channel_layout
    C = layout_total(pass_channel_layout(11, 2, 10))
    trial = TrialData(name='t', timestep=0.01,
                      passes=[np.zeros((5, C), np.float32)],
                      pass_types=[0], missing_grf_reasons=[0] * 5)
    path = str(tmp_path / 'osim_only.b3d')
    L.write_legacy_subject(path, num_dofs=11,
                           ground_force_bodies=['calcn_r', 'calcn_l'],
                           root_history_len=10, trials=[trial],
                           skeleton=None, model_osim_text=OSIM)
    s = L.LegacySubjectOnDisk(path)
    spec = s.readSkel(0)
    assert spec.num_dofs == 11
    s.close()
    # conversion picks the osim-derived skeleton up too
    out = str(tmp_path / 'conv.b3d')
    L.convert_to_tpu(path, out)
    from inferbiomechanics_tpu.data.b3d import SubjectOnDisk
    assert SubjectOnDisk(out).readSkel(0).num_dofs == 11
