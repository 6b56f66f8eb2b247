"""Rigid-body kernel tests: FK, COM dynamics, inverse dynamics, analytical.

Physics invariants are the oracle (no nimble available to diff against):
finite-difference consistency for velocity/acceleration kernels, gravity
compensation and energy-rate identities for inverse dynamics, and the
Newton-Euler balance for the external-wrench path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.data.synthetic import standard_skeleton
from inferbiomechanics_tpu.ops.skeleton import GRAVITY, compile_skeleton
from inferbiomechanics_tpu.ops.spatial import (
    dAdInvT, euler_xyz_to_matrix, skew, unskew,
)


@pytest.fixture(scope='module')
def skel():
    return compile_skeleton(standard_skeleton())


def _rand_state(skel, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    q = rng.normal(0, scale, skel.num_dofs).astype(np.float64)
    dq = rng.normal(0, scale, skel.num_dofs).astype(np.float64)
    ddq = rng.normal(0, scale, skel.num_dofs).astype(np.float64)
    return jnp.asarray(q), jnp.asarray(dq), jnp.asarray(ddq)


# ---- spatial primitives ---------------------------------------------------

def test_euler_roundtrip_orthonormal():
    R = euler_xyz_to_matrix(jnp.asarray([0.3, -0.7, 1.2]))
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-6)
    assert np.isclose(float(jnp.linalg.det(R)), 1.0, atol=1e-6)


def test_skew_unskew():
    v = jnp.asarray([1.0, -2.0, 3.0])
    np.testing.assert_allclose(np.asarray(unskew(skew(v))), np.asarray(v), atol=1e-7)
    w = jnp.asarray([0.5, 0.25, -1.0])
    np.testing.assert_allclose(np.asarray(skew(v) @ w), np.cross(v, w), atol=1e-6)


def test_dAdInvT_identity_and_force_invariance():
    F = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    np.testing.assert_allclose(
        np.asarray(dAdInvT(jnp.eye(3), jnp.zeros(3), F)), np.asarray(F), atol=1e-7)
    # pure translation: force part unchanged, moment shifts by -p x f
    p = jnp.asarray([1.0, 0.0, 0.0])
    out = dAdInvT(jnp.eye(3), p, F)
    np.testing.assert_allclose(np.asarray(out[3:]), [4.0, 5.0, 6.0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(out[:3]),
                               np.asarray(F[:3]) - np.cross(p, F[3:]), atol=1e-6)


# ---- FK -------------------------------------------------------------------

def test_fk_zero_pose(skel):
    q = jnp.zeros(skel.num_dofs)
    Rs, ps = skel.fk(q)
    assert Rs.shape == (12, 3, 3)
    np.testing.assert_allclose(np.asarray(Rs[0]), np.eye(3), atol=1e-7)
    # pelvis sits at the root joint translation
    np.testing.assert_allclose(np.asarray(ps[0]), [0.0, 0.95, 0.0], atol=1e-7)
    # femur joint center below+lateral of pelvis; feet near the ground
    calcn_r = skel.body_index['calcn_r']
    assert float(ps[calcn_r, 1]) < 0.25


def test_fk_root_translation_shifts_all(skel):
    q0 = jnp.zeros(skel.num_dofs)
    q1 = q0.at[3:6].set(jnp.asarray([1.0, 2.0, 3.0]))
    _, p0 = skel.fk(q0)
    _, p1 = skel.fk(q1)
    np.testing.assert_allclose(np.asarray(p1 - p0),
                               np.tile([1.0, 2.0, 3.0], (12, 1)), atol=1e-6)


def test_joint_world_positions(skel):
    q = jnp.zeros(skel.num_dofs)
    jc = skel.joint_world_positions(q)
    assert jc.shape == (12, 3)
    np.testing.assert_allclose(np.asarray(jc[0]), [0.0, 0.95, 0.0], atol=1e-7)


# ---- COM kinematics (finite-difference oracle) ----------------------------

def test_com_velocity_matches_finite_difference(skel):
    # float32 central difference: eps large enough to beat roundoff
    q, dq, _ = _rand_state(skel)
    eps = 1e-3
    fd = (skel.com(q + eps * dq) - skel.com(q - eps * dq)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(skel.com_velocity(q, dq)),
                               np.asarray(fd), rtol=5e-3, atol=5e-4)


def test_com_acceleration_matches_finite_difference(skel):
    # float32 second difference is noisy: richer 5-point stencil + loose tol
    q, dq, ddq = _rand_state(skel, seed=1)
    eps = 0.02

    def com_at(t):
        return np.asarray(skel.com(q + t * dq + 0.5 * t * t * ddq),
                          dtype=np.float64)
    fd = (-com_at(2 * eps) + 16 * com_at(eps) - 30 * com_at(0.0)
          + 16 * com_at(-eps) - com_at(-2 * eps)) / (12 * eps * eps)
    np.testing.assert_allclose(np.asarray(skel.com_acceleration(q, dq, ddq)),
                               fd, rtol=5e-2, atol=5e-3)


# ---- inverse dynamics -----------------------------------------------------

def test_id_static_gravity_compensation(skel):
    """At rest, tau must exactly compensate gravity: tau = dV/dq; in
    particular the root vertical-translation DOF carries total weight."""
    q = jnp.zeros(skel.num_dofs)
    zeros = jnp.zeros(skel.num_dofs)
    tau = skel.inverse_dynamics(q, zeros, zeros)
    # root translation DOFs: [3] x, [4] y, [5] z
    np.testing.assert_allclose(float(tau[4]), skel.total_mass * 9.81, rtol=1e-5)
    assert abs(float(tau[3])) < 1e-4
    assert abs(float(tau[5])) < 1e-4


def test_id_linear_in_ddq(skel):
    """tau(q,dq,ddq) - tau(q,dq,0) must be linear in ddq (= M(q) ddq)."""
    q, dq, ddq = _rand_state(skel, seed=2)
    t0 = skel.inverse_dynamics(q, dq, jnp.zeros_like(ddq))
    t1 = skel.inverse_dynamics(q, dq, ddq)
    t2 = skel.inverse_dynamics(q, dq, 2.0 * ddq)
    np.testing.assert_allclose(np.asarray(t2 - t0), 2.0 * np.asarray(t1 - t0),
                               rtol=1e-4, atol=1e-6)


def test_id_power_balance(skel):
    """Energy rate: dqᵀ·tau == d/dt(T + V) along the trajectory."""
    q, dq, ddq = _rand_state(skel, seed=3, scale=0.3)
    tau = skel.inverse_dynamics(q, dq, ddq)
    power = float(jnp.dot(dq, tau))
    E = lambda q_, dq_: skel.kinetic_energy(q_, dq_) + skel.potential_energy(q_)
    dE = float(jax.jvp(E, (q, dq), (dq, ddq))[1])
    np.testing.assert_allclose(power, dE, rtol=1e-4, atol=1e-6)


def test_id_external_wrench_cancels_gravity(skel):
    """A world upward force of m·g applied at a point with zero moment about
    the world origin... instead: a wrench [p_com x F; F] with F = m·g ŷ
    through the whole-body COM should cancel gravity at q=0, leaving the
    root translation torques ~0."""
    q = jnp.zeros(skel.num_dofs)
    zeros = jnp.zeros(skel.num_dofs)
    com = skel.com(q)
    F = jnp.asarray([0.0, skel.total_mass * 9.81, 0.0])
    wrench = jnp.concatenate([jnp.cross(com, F), F])
    tau = skel.inverse_dynamics(q, zeros, zeros, {0: wrench})
    np.testing.assert_allclose(np.asarray(tau[3:6]), np.zeros(3), atol=1e-4)


def test_id_from_predictions_roundtrip(skel):
    """Root-frame wrench conversion: at q=0 the root frame == world frame
    (up to the root translation offset), so a wrench that cancels gravity
    in world must do so when supplied in root coordinates."""
    q = jnp.zeros(skel.num_dofs)
    zeros = jnp.zeros(skel.num_dofs)
    com = skel.com(q)
    _, ps = skel.fk(q)
    p_root = ps[0]
    F = jnp.asarray([0.0, skel.total_mass * 9.81, 0.0])
    # wrench about root origin in root(=world-rotated) frame
    n_root = jnp.cross(com - p_root, F)
    calcn_r = skel.body_index['calcn_r']
    wrenches = jnp.concatenate([n_root, F])
    tau = skel.inverse_dynamics_from_predictions(
        q, zeros, zeros, [calcn_r], wrenches)
    np.testing.assert_allclose(np.asarray(tau[3:6]), np.zeros(3), atol=1e-3)


# ---- analytical baseline --------------------------------------------------

def test_analytical_forward_semantics(skel):
    from inferbiomechanics_tpu.models.analytical import analytical_forward
    from inferbiomechanics_tpu.data.keys import OutputDataKeys

    cbi = [skel.body_index['calcn_r'], skel.body_index['calcn_l']]
    q = jnp.zeros(skel.num_dofs)
    dq = jnp.zeros(skel.num_dofs)
    ddq = jnp.zeros(skel.num_dofs)
    out = analytical_forward(skel, cbi, q, dq, ddq)
    f = np.asarray(out[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME]).reshape(2, 3)
    # at rest, feet below 0.1m -> both in contact; force per foot = g/2 up
    np.testing.assert_allclose(f[:, 1], [9.81 / 2, 9.81 / 2], rtol=1e-5)
    np.testing.assert_allclose(f[:, 0], [0, 0], atol=1e-6)
    # CoPs near the feet, symmetric in z
    cops = np.asarray(out[OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME]).reshape(2, 3)
    assert np.isclose(cops[0, 2], -cops[1, 2], atol=1e-5)
    # flight phase: lift the root 1m -> no contact -> all zeros
    q_air = q.at[4].set(1.0)
    out_air = analytical_forward(skel, cbi, q_air, dq, ddq)
    np.testing.assert_allclose(
        np.asarray(out_air[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME]),
        np.zeros(6), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_air[OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME]),
        np.zeros(6), atol=1e-6)


def test_analytical_batched_predict(tmp_path):
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.models.analytical import make_analytical_fn
    from inferbiomechanics_tpu.data.keys import OutputDataKeys

    path = str(tmp_path / 's.b3d')
    write_synthetic_subject(path, num_trials=1, trial_length=120, seed=0)
    ds = WindowDataset(path, window_size=20, stride=5)
    predict = make_analytical_fn(ds)
    batch = ds.gather(np.arange(8))
    out = predict(batch.inputs)
    assert out[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME].shape == (8, 4, 6)
    assert out[OutputDataKeys.TAU].shape == (8, 4, 23)
    assert np.isfinite(np.asarray(
        out[OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME])).all()


@pytest.mark.slow
def test_tau_report_hook(tmp_path):
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.loss.tau_report import make_tau_report_fn
    from inferbiomechanics_tpu.data.keys import OutputDataKeys

    path = str(tmp_path / 's.b3d')
    write_synthetic_subject(path, num_trials=1, trial_length=120, seed=0)
    ds = WindowDataset(path, window_size=20, stride=5)
    tau_fn = make_tau_report_fn(ds)
    batch = ds.gather(np.arange(4))
    labels = ds.unpack_labels(batch.labels)
    outputs = {OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME:
               np.zeros((4, 1, 12), np.float32)}
    err = tau_fn(batch.inputs, outputs, labels)
    assert np.isfinite(err) and err >= 0.0


@pytest.mark.slow
def test_tau_report_uses_per_item_mass(tmp_path):
    """Items from subjects with different masses get different tau scaling.

    Parity: the reference indexes batch_subject_indices and uses each
    item's own skel.getMass() (RegressionLossEvaluator.py:271-285).
    """
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.loss.tau_report import make_tau_report_fn
    from inferbiomechanics_tpu.data.keys import OutputDataKeys

    write_synthetic_subject(str(tmp_path / 'a_light.b3d'), num_trials=1,
                            trial_length=120, seed=0, mass_kg=50.0)
    write_synthetic_subject(str(tmp_path / 'b_heavy.b3d'), num_trials=1,
                            trial_length=120, seed=1, mass_kg=100.0)
    ds = WindowDataset(str(tmp_path), window_size=20, stride=5)
    assert [s.getMassKg() for s in ds.subjects] == [50.0, 100.0]
    tau_fn = make_tau_report_fn(ds)
    batch = ds.gather(np.arange(4))
    labels = ds.unpack_labels(batch.labels)
    outputs = {OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME:
               np.zeros((4, 1, 12), np.float32)}
    # same inputs, but attribute all items to the light vs heavy subject:
    # with zero predicted wrenches tau is mass-independent, so the
    # /mass normalization must make the reports differ by exactly 2x
    light = tau_fn(batch.inputs, outputs, labels,
                   batch_subject_indices=np.zeros(4, np.int64))
    heavy = tau_fn(batch.inputs, outputs, labels,
                   batch_subject_indices=np.full(4, 1, np.int64))
    assert light > 0.0
    np.testing.assert_allclose(light, 2.0 * heavy, rtol=1e-5)


@pytest.mark.slow
def test_tau_report_per_subject_skeletons(tmp_path):
    """Multi-subject datasets with SCALED skeletons (same topology,
    different masses/COMs) run ID with each item's own skeleton via the
    batched parameter stack (ref RegressionLossEvaluator.py:271-285 uses
    per-item skeleton objects)."""
    import dataclasses
    from inferbiomechanics_tpu.data.b3d import write_subject
    from inferbiomechanics_tpu.data.synthetic import (
        CONTACT_BODIES, standard_skeleton, synthetic_trial,
    )
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data import keys as K
    from inferbiomechanics_tpu.loss.tau_report import make_tau_report_fn
    from inferbiomechanics_tpu.ops.skeleton import compile_skeleton

    d = tmp_path / 'data'
    d.mkdir()
    specs = []
    for i, scale in enumerate([1.0, 1.35]):
        sk = standard_skeleton()
        sk = dataclasses.replace(sk) if dataclasses.is_dataclass(sk) else sk
        for b in sk.bodies:
            b.mass *= scale
        specs.append(sk)
        rng = np.random.default_rng(i)
        trials = [synthetic_trial('t', 60, rng=rng)]
        write_subject(str(d / f's{i}.b3d'), num_dofs=23,
                      ground_force_bodies=list(CONTACT_BODIES),
                      root_history_len=10, trials=trials, skeleton=sk,
                      mass_kg=70.0 * scale)
    ds = WindowDataset(str(d), window_size=20, stride=5)
    assert len(ds.skeletons) == 2
    tau_fn = make_tau_report_fn(ds)

    B = 6
    sidx = np.array([0, 1, 1, 0, 1, 0])
    batch = ds.gather(np.concatenate([
        np.nonzero(ds.win_subject == s)[0][:1] for s in sidx]))
    wr_key = K.OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME
    labels = ds.unpack_labels(jnp.asarray(batch.labels))
    outputs = {wr_key: labels[wr_key] * 0.9}
    got = tau_fn(batch.inputs, outputs, labels, batch_subject_indices=sidx)

    # oracle: per-item ID with each subject's individually compiled skeleton
    o_pos, w = ds.in_offsets[K.InputDataKeys.POS]
    o_vel, _ = ds.in_offsets[K.InputDataKeys.VEL]
    o_acc, _ = ds.in_offsets[K.InputDataKeys.ACC]
    masses = [70.0, 70.0 * 1.35]
    skels = [compile_skeleton(s) for s in specs]
    ci = [skels[0].body_index[b] for b in ds.contact_bodies]
    vals = []
    for k in range(B):
        x = batch.inputs[k, -1]
        q = jnp.asarray(x[o_pos:o_pos + w])
        dq = jnp.asarray(x[o_vel:o_vel + w])
        ddq = jnp.asarray(x[o_acc:o_acc + w])
        m = masses[sidx[k]]
        wr = jnp.asarray(outputs[wr_key])[k, -1] * m
        tau = skels[sidx[k]].inverse_dynamics_from_predictions(
            q, dq, ddq, ci, wr)
        tl = jnp.asarray(labels[K.OutputDataKeys.TAU])[k, -1]
        # non-root DOFs only, like the reference (:284) and tau_fn
        vals.append(float(jnp.mean(jnp.abs((tau - tl)[6:])) / m))
    np.testing.assert_allclose(got, np.mean(vals), rtol=1e-4)
    # differing masses must actually change the per-item values
    assert np.std(vals) > 0


def test_analytical_per_subject_skeletons(tmp_path):
    """The analytical baseline uses each subject's scaled skeleton when
    subject_indices are provided (ref AnalyticalBaseline.py per-item
    skels_and_contact)."""
    from inferbiomechanics_tpu.data.b3d import write_subject
    from inferbiomechanics_tpu.data.synthetic import (
        CONTACT_BODIES, standard_skeleton, synthetic_trial,
    )
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.models.analytical import (
        analytical_forward, make_analytical_fn,
    )
    from inferbiomechanics_tpu.ops.skeleton import compile_skeleton
    from inferbiomechanics_tpu.data import keys as K

    d = tmp_path / 'data'
    d.mkdir()
    specs = []
    for i, scale in enumerate([1.0, 1.4]):
        sk = standard_skeleton()
        for b in sk.bodies:
            b.mass *= scale
            b.com = [c * (1 + 0.1 * i) for c in b.com]
        specs.append(sk)
        rng = np.random.default_rng(i)
        write_subject(str(d / f's{i}.b3d'), num_dofs=23,
                      ground_force_bodies=list(CONTACT_BODIES),
                      root_history_len=10,
                      trials=[synthetic_trial('t', 60, rng=rng)],
                      skeleton=sk, mass_kg=70.0 * scale)
    ds = WindowDataset(str(d), window_size=20, stride=5)
    predict = make_analytical_fn(ds)
    sidx = np.array([0, 1])
    batch = ds.gather(np.concatenate([
        np.nonzero(ds.win_subject == s)[0][:1] for s in sidx]))
    out = predict(batch.inputs, subject_indices=sidx)

    # oracle: per-item forward with individually compiled skeletons
    o_pos, w = ds.in_offsets[K.InputDataKeys.POS]
    o_vel, _ = ds.in_offsets[K.InputDataKeys.VEL]
    o_acc, _ = ds.in_offsets[K.InputDataKeys.ACC]
    key = K.OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
    for k in range(2):
        sk = compile_skeleton(specs[sidx[k]])
        ci = [sk.body_index[b] for b in ds.contact_bodies]
        x = batch.inputs[k]
        ref_rows = [analytical_forward(
            sk, ci, jnp.asarray(x[t_, o_pos:o_pos + w]),
            jnp.asarray(x[t_, o_vel:o_vel + w]),
            jnp.asarray(x[t_, o_acc:o_acc + w]))[key]
            for t_ in range(x.shape[0])]
        np.testing.assert_allclose(np.asarray(out[key])[k],
                                   np.stack([np.asarray(r) for r in ref_rows]),
                                   rtol=1e-4, atol=1e-5)
    # the two subjects' scaled COMs must give different predictions for
    # identical poses (proves per-subject params are actually in play)
    same_inputs = np.stack([batch.inputs[0], batch.inputs[0]])
    out2 = predict(same_inputs, subject_indices=np.array([0, 1]))
    assert not np.allclose(np.asarray(out2[key])[0], np.asarray(out2[key])[1])


# ---- vectorized FK (round 5: batched joint groups + level composition) ----

def _offset_frame_spec():
    """Standard skeleton, perturbed with parent-offset orientations, a
    child offset frame, and non-canonical ordered rotation axes on the
    root/first ball joint — every structural branch of the fast path."""
    import dataclasses
    s = standard_skeleton()
    joints = [dataclasses.replace(j) for j in s.joints]
    joints[0] = dataclasses.replace(
        joints[0], orientation=[0.1, -0.2, 0.3],
        rot_axes=[[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    joints[2] = dataclasses.replace(
        joints[2], orientation=[0.05, 0.0, -0.1],
        child_translation=[0.02, -0.03, 0.01],
        child_orientation=[-0.2, 0.1, 0.15])
    joints[6] = dataclasses.replace(
        joints[6],
        rot_axes=[[0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    return dataclasses.replace(s, joints=joints)


@pytest.mark.parametrize('spec_fn', [standard_skeleton, _offset_frame_spec])
def test_vectorized_fk_matches_unrolled(spec_fn):
    sk = compile_skeleton(spec_fn())
    assert sk._can_vectorize
    for seed in range(3):
        q, _, _ = _rand_state(sk, seed=seed)
        q = q.astype(jnp.float32)
        Rv, pv = sk._fk_vectorized(q)
        Ru, pu = sk._fk_unrolled(q)
        np.testing.assert_allclose(np.asarray(Rv), np.asarray(Ru),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pv), np.asarray(pu),
                                   rtol=1e-5, atol=1e-6)


def test_vectorized_fk_jvp_matches_unrolled(skel):
    """com_acceleration (nested jvp through fk) agrees across paths."""
    q, dq, ddq = _rand_state(skel, seed=4)
    import copy
    fast = copy.copy(skel)
    fast._fast_fk = True
    fast_acc = fast.com_acceleration(q, dq, ddq)
    slow_acc = skel.com_acceleration(q, dq, ddq)
    np.testing.assert_allclose(np.asarray(fast_acc), np.asarray(slow_acc),
                               rtol=1e-4, atol=1e-6)


def test_coupled_skeleton_cannot_vectorize():
    import dataclasses
    s = standard_skeleton()
    joints = [dataclasses.replace(j) for j in s.joints]
    joints[2] = dataclasses.replace(
        joints[2],
        couplings=[{'kind': 'rotation', 'axis': [0.0, 0.0, 1.0],
                    'fn': {'type': 'identity'}}])
    sk = compile_skeleton(dataclasses.replace(s, joints=joints))
    assert not sk._can_vectorize
