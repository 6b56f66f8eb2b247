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
    <TransformAxis name="rotation2"><axis>1 0 0</axis><Constant><value>0</value></Constant></TransformAxis>
    <TransformAxis name="translation1"><coordinates>knee_angle_r</coordinates>
     <SimmSpline>
      <x>-2.0944 -1.5708 -1.0472 -0.5236 0 0.1745</x>
      <y>-0.0098 -0.0093 -0.0083 -0.0045 0 0.0019</y>
     </SimmSpline>
     <axis>1 0 0</axis>
    </TransformAxis>
    <TransformAxis name="translation2"><coordinates>knee_angle_r</coordinates>
     <MultiplierFunction>
      <function>
       <SimmSpline>
        <x>-2.0944 -1.0472 0 0.1745</x>
        <y>-0.0042 -0.0024 0 0.0007</y>
       </SimmSpline>
      </function>
      <scale>2.0</scale>
     </MultiplierFunction>
     <axis>0 1 0</axis>
    </TransformAxis>
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
    # hip rotation axes follow the model's z, x, y TransformAxis order
    np.testing.assert_allclose(hip.rot_axes,
                               [[0, 0, 1], [1, 0, 0], [0, 1, 0]])
    knee = next(j for j in spec.joints if j.name == 'walker_knee_r')
    assert knee.axis == pytest.approx([0, 0, 1])
    # coordinate-coupling functions are parsed, not approximated:
    # rotation1 identity + two spline translations (MultiplierFunction
    # scale folded into the second one's knots); zero Constant dropped
    kinds = [(c['kind'], c['fn']['type']) for c in knee.couplings]
    assert kinds == [('rotation', 'identity'), ('translation', 'spline'),
                     ('translation', 'spline')]
    assert knee.couplings[2]['fn']['y'] == pytest.approx(
        [-0.0084, -0.0048, 0, 0.0014])
    # the standard-model constructs parse without any approximation
    assert warnings == []
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


# ---------------------------------------------------------------------------
# Round-4 OpenSim fidelity: coordinate-coupling functions, offset-frame
# orientations, ordered CustomJoint rotation axes (closed-form oracles).
# ---------------------------------------------------------------------------

def _rx(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _ry(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


KNEE_X = [-2.0944, -1.5708, -1.0472, -0.5236, 0.0, 0.7854]
KNEE_Y = [-0.0098, -0.0093, -0.0083, -0.0045, 0.0, 0.0019]

KNEE_OSIM = f"""<?xml version="1.0"?>
<OpenSimDocument Version="40000">
<Model name="knee_golden">
 <BodySet><objects>
  <Body name="femur"><mass>9.0</mass><mass_center>0 -0.17 0</mass_center>
   <inertia>0.13 0.03 0.14 0 0 0</inertia></Body>
  <Body name="tibia"><mass>3.7</mass><mass_center>0 -0.19 0</mass_center>
   <inertia>0.05 0.005 0.05 0 0 0</inertia></Body>
 </objects></BodySet>
 <JointSet><objects>
  <WeldJoint name="ground_femur">
   <socket_parent_frame>gf</socket_parent_frame>
   <socket_child_frame>ff</socket_child_frame>
   <frames>
    <PhysicalOffsetFrame name="gf"><socket_parent>/ground</socket_parent>
     <translation>0 0 0</translation><orientation>0 0 0</orientation>
    </PhysicalOffsetFrame>
    <PhysicalOffsetFrame name="ff"><socket_parent>/bodyset/femur</socket_parent>
     <translation>0 0 0</translation><orientation>0 0 0</orientation>
    </PhysicalOffsetFrame>
   </frames>
  </WeldJoint>
  <CustomJoint name="knee">
   <socket_parent_frame>femur_off</socket_parent_frame>
   <socket_child_frame>tibia_off</socket_child_frame>
   <coordinates><Coordinate name="knee_angle"/></coordinates>
   <SpatialTransform>
    <TransformAxis name="rotation1"><coordinates>knee_angle</coordinates><axis>0 0 1</axis></TransformAxis>
    <TransformAxis name="translation1"><coordinates>knee_angle</coordinates>
     <SimmSpline><x>{' '.join(str(v) for v in KNEE_X)}</x>
      <y>{' '.join(str(v) for v in KNEE_Y)}</y></SimmSpline>
     <axis>1 0 0</axis>
    </TransformAxis>
    <TransformAxis name="translation2"><coordinates>knee_angle</coordinates>
     <LinearFunction><coefficients>0.02 0.005</coefficients></LinearFunction>
     <axis>0 1 0</axis>
    </TransformAxis>
   </SpatialTransform>
   <frames>
    <PhysicalOffsetFrame name="femur_off"><socket_parent>/bodyset/femur</socket_parent>
     <translation>0.1 -0.4 0.02</translation><orientation>0.1 -0.2 0.3</orientation>
    </PhysicalOffsetFrame>
    <PhysicalOffsetFrame name="tibia_off"><socket_parent>/bodyset/tibia</socket_parent>
     <translation>0.01 0.02 -0.03</translation><orientation>-0.2 0.1 0.05</orientation>
    </PhysicalOffsetFrame>
   </frames>
  </CustomJoint>
 </objects></JointSet>
</Model>
</OpenSimDocument>
"""


def _knee_oracle_transform(theta):
    """Closed-form parent-body -> child-body transform for KNEE_OSIM:
    X = X_parent_offset o X_joint o X_child_offset^-1."""
    from scipy.interpolate import CubicSpline
    R_po = _rx(0.1) @ _ry(-0.2) @ _rz(0.3)
    t_po = np.array([0.1, -0.4, 0.02])
    R_co = _rx(-0.2) @ _ry(0.1) @ _rz(0.05)
    t_co = np.array([0.01, 0.02, -0.03])
    Rj = _rz(theta)
    spline = CubicSpline(KNEE_X, KNEE_Y, bc_type='natural')
    tj = np.array([float(spline(theta)), 0.02 * theta + 0.005, 0.0])
    R = R_po @ Rj @ R_co.T
    t = t_po + R_po @ (tj - (Rj @ R_co.T) @ t_co)
    return R, t


def test_coupled_knee_fk_golden():
    """FK through a knee with spline+linear coupled translations AND
    rotated parent/child offset frames matches the closed-form oracle."""
    import jax.numpy as jnp
    from inferbiomechanics_tpu.ops.skeleton import compile_skeleton
    spec, warnings = parse_osim(KNEE_OSIM)
    assert warnings == []
    sk = compile_skeleton(spec)
    assert sk.num_dofs == 1
    for theta in (-1.2, -0.3, 0.0, 0.6):
        Rs, ps = sk.fk(jnp.asarray([theta], jnp.float32))
        R_exp, t_exp = _knee_oracle_transform(theta)
        np.testing.assert_allclose(np.asarray(Rs)[1], R_exp, atol=2e-6)
        np.testing.assert_allclose(np.asarray(ps)[1], t_exp, atol=2e-6)


def test_coupled_knee_inverse_dynamics_gravity():
    """Lagrangian ID differentiates THROUGH the coupling functions: the
    static knee torque equals the numeric dV/dq of the oracle FK."""
    import jax.numpy as jnp
    from inferbiomechanics_tpu.ops.skeleton import compile_skeleton
    spec, _ = parse_osim(KNEE_OSIM)
    sk = compile_skeleton(spec)
    g = np.array([0.0, -9.81, 0.0])
    com_tibia = np.array([0, -0.19, 0])

    def V(theta):
        R, t = _knee_oracle_transform(theta)
        return -3.7 * g @ (t + R @ com_tibia)

    theta = 0.4
    h = 1e-4
    dV = (V(theta + h) - V(theta - h)) / (2 * h)
    tau = sk.inverse_dynamics(jnp.asarray([theta], jnp.float32),
                              jnp.zeros(1), jnp.zeros(1))
    assert float(tau[0]) == pytest.approx(dV, rel=1e-3)


def test_ball_rot_axes_order_golden():
    """3-coordinate CustomJoints rotate about the model's ORDERED axes
    (Rajagopal hips: z, x, y) — not euler-XYZ."""
    import jax.numpy as jnp
    from inferbiomechanics_tpu.ops.skeleton import compile_skeleton
    spec, _ = parse_osim(OSIM)
    sk = compile_skeleton(spec)
    q = np.zeros(11, np.float32)
    a, b, c = 0.3, -0.4, 0.25
    q[6:9] = (a, b, c)   # hip_r coords (after the 6-DOF root)
    Rs, ps = sk.fk(jnp.asarray(q))
    R_exp = _rz(a) @ _rx(b) @ _ry(c)
    np.testing.assert_allclose(np.asarray(Rs)[1], R_exp, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ps)[1],
                               [-0.0707, -0.0661, 0.0835], atol=1e-6)


def test_coupling_param_stack_and_vmap():
    """Scaled subjects share coupling STRUCTURE but scale the spline
    ordinates; the [S,...] parameter stack + with_params reproduces each
    subject's own FK under vmap."""
    import copy
    import jax
    import jax.numpy as jnp
    from inferbiomechanics_tpu.ops.skeleton import (
        compile_skeleton, skeleton_param_stack, with_params)
    spec0, _ = parse_osim(KNEE_OSIM)
    spec1 = copy.deepcopy(spec0)
    knee1 = next(j for j in spec1.joints if j.name == 'knee')
    for cpl in knee1.couplings:
        if cpl['fn']['type'] == 'spline':
            cpl['fn']['y'] = [1.5 * v for v in cpl['fn']['y']]
    stack = skeleton_param_stack([spec0, spec1])
    sk = compile_skeleton(spec0)
    theta = jnp.asarray([0.6], jnp.float32)

    def tibia_pos(params):
        _, ps = with_params(sk, params).fk(theta)
        return ps[1]

    got = jax.vmap(tibia_pos)(stack)
    for i, spec in enumerate((spec0, spec1)):
        _, ps = compile_skeleton(spec).fk(theta)
        np.testing.assert_allclose(np.asarray(got)[i], np.asarray(ps)[1],
                                   atol=1e-6)
    # the scaled spline actually changes the pose
    assert abs(float(got[0, 0]) - float(got[1, 0])) > 1e-5


def test_skeleton_json_roundtrip_with_fidelity_fields():
    from inferbiomechanics_tpu.data.b3d import SkeletonSpec
    spec, _ = parse_osim(KNEE_OSIM)
    spec2 = SkeletonSpec.from_json(spec.to_json())
    knee = next(j for j in spec2.joints if j.name == 'knee')
    assert knee.orientation == pytest.approx([0.1, -0.2, 0.3])
    assert knee.child_translation == pytest.approx([0.01, 0.02, -0.03])
    assert [c['fn']['type'] for c in knee.couplings] == [
        'identity', 'spline', 'linear']
    hip_spec, _ = parse_osim(OSIM)
    hip2 = SkeletonSpec.from_json(hip_spec.to_json())
    hip = next(j for j in hip2.joints if j.name == 'hip_r')
    assert hip.rot_axes == [[0, 0, 1], [1, 0, 0], [0, 1, 0]]


PLANAR_OSIM = """<?xml version="1.0"?>
<OpenSimDocument Version="40000"><Model name="planar">
 <BodySet><objects>
  <Body name="a"><mass>1</mass><mass_center>0 0 0</mass_center>
   <inertia>1 1 1 0 0 0</inertia></Body>
  <Body name="b"><mass>1</mass><mass_center>0 0 0</mass_center>
   <inertia>1 1 1 0 0 0</inertia></Body>
 </objects></BodySet>
 <JointSet><objects>
  <WeldJoint name="root">
   <socket_parent_frame>gf</socket_parent_frame>
   <socket_child_frame>af</socket_child_frame>
   <frames>
    <PhysicalOffsetFrame name="gf"><socket_parent>/ground</socket_parent>
     <translation>0 0 0</translation><orientation>0 0 0</orientation></PhysicalOffsetFrame>
    <PhysicalOffsetFrame name="af"><socket_parent>/bodyset/a</socket_parent>
     <translation>0 0 0</translation><orientation>0 0 0</orientation></PhysicalOffsetFrame>
   </frames>
  </WeldJoint>
  <CustomJoint name="planar_j">
   <socket_parent_frame>af2</socket_parent_frame>
   <socket_child_frame>bf</socket_child_frame>
   <coordinates><Coordinate name="rz"/><Coordinate name="tx"/>
    <Coordinate name="ty"/></coordinates>
   <SpatialTransform>
    <TransformAxis name="rotation1"><coordinates>rz</coordinates><axis>0 0 1</axis></TransformAxis>
    <TransformAxis name="translation1"><coordinates>tx</coordinates><axis>1 0 0</axis></TransformAxis>
    <TransformAxis name="translation2"><coordinates>ty</coordinates><axis>0 1 0</axis></TransformAxis>
   </SpatialTransform>
   <frames>
    <PhysicalOffsetFrame name="af2"><socket_parent>/bodyset/a</socket_parent>
     <translation>0 0 0</translation><orientation>0 0 0</orientation></PhysicalOffsetFrame>
    <PhysicalOffsetFrame name="bf"><socket_parent>/bodyset/b</socket_parent>
     <translation>0 0 0</translation><orientation>0 0 0</orientation></PhysicalOffsetFrame>
   </frames>
  </CustomJoint>
 </objects></JointSet>
</Model></OpenSimDocument>
"""


def test_planar_joint_warns_loudly():
    """A planar CustomJoint (1 rotation + 2 translation coordinates)
    cannot be represented as 'ball' — the approximation must be warned,
    never silent (round-4 review finding)."""
    spec, warnings = parse_osim(PLANAR_OSIM)
    assert any('planar_j' in w and 'approximated as ball' in w
               for w in warnings)
    assert spec.fidelity_warnings == warnings


def test_fidelity_warnings_survive_serialization():
    """Warnings ride the native header JSON so analyze can surface them
    on CONVERTED datasets (the osim text is not re-parsed after
    conversion)."""
    from inferbiomechanics_tpu.data.b3d import SkeletonSpec
    spec, warnings = parse_osim(PLANAR_OSIM)
    assert warnings
    spec2 = SkeletonSpec.from_json(spec.to_json())
    assert spec2.fidelity_warnings == warnings
    # clean specs keep a clean (and back-compatible) header
    clean, w2 = parse_osim(KNEE_OSIM)
    assert w2 == []
    assert 'fidelity_warnings' not in clean.to_json()
