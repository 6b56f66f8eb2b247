"""Golden-value parity tests for the rigid-body kernels (ops/skeleton.py).

Round-1 VERDICT item #5: the physics-invariant tests (test_skeleton.py)
cannot catch a CONSISTENT sign/frame error; these cases assert against
closed-form textbook dynamics derived independently of the implementation
(reference consumers: src/models/AnalyticalBaseline.py:54-100,
src/loss/RegressionLossEvaluator.py:271-285).

Cases: single pendulum (revolute), planar double pendulum (the classic RR
equations of motion), free-root point mass (translation + external force).
"""

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

from inferbiomechanics_tpu.data.b3d import BodySpec, JointSpec, SkeletonSpec
from inferbiomechanics_tpu.ops.skeleton import GRAVITY, compile_skeleton

G = 9.81


def pendulum_skeleton(m=2.0, L=0.5):
    """One revolute joint about +z at the world origin; point mass at
    distance L 'below' the joint in the body frame."""
    return SkeletonSpec(
        joints=[JointSpec(name='hinge', type='revolute', parent_body=-1,
                          child_body=0, translation=[0.0, 0.0, 0.0],
                          axis=[0.0, 0.0, 1.0])],
        bodies=[BodySpec(name='rod', mass=m, com=[0.0, -L, 0.0],
                         inertia=[0.0] * 6)])


def test_pendulum_com_position_and_acceleration():
    m, L = 2.0, 0.5
    sk = compile_skeleton(pendulum_skeleton(m, L))
    th, dth, ddth = 0.3, 0.7, 1.1
    q = jnp.array([th]); dq = jnp.array([dth]); ddq = jnp.array([ddth])
    # com_world = R_z(th) @ [0,-L,0] = [L sin th, -L cos th, 0]
    np.testing.assert_allclose(
        np.asarray(sk.com(q)),
        [L * np.sin(th), -L * np.cos(th), 0.0], atol=1e-7)
    # a = d2/dt2 [L sin th, -L cos th, 0]
    expect = [L * (np.cos(th) * ddth - np.sin(th) * dth ** 2),
              L * (np.sin(th) * ddth + np.cos(th) * dth ** 2), 0.0]
    np.testing.assert_allclose(
        np.asarray(sk.com_acceleration(q, dq, ddq)), expect, atol=1e-6)


def test_pendulum_inverse_dynamics_textbook():
    """tau = m L^2 th'' + m g L sin(th)  (theta from straight-down)."""
    m, L = 2.0, 0.5
    sk = compile_skeleton(pendulum_skeleton(m, L))
    for th, dth, ddth in [(0.0, 0.0, 0.0), (0.3, 0.7, 1.1),
                          (-1.2, 2.0, -0.5), (np.pi / 2, 0.0, 0.0)]:
        tau = sk.inverse_dynamics(jnp.array([th]), jnp.array([dth]),
                                  jnp.array([ddth]))
        expect = m * L ** 2 * ddth + m * G * L * np.sin(th)
        np.testing.assert_allclose(np.asarray(tau), [expect], atol=1e-5,
                                   err_msg=f'theta={th}')


def test_pendulum_energy_golden():
    m, L = 2.0, 0.5
    sk = compile_skeleton(pendulum_skeleton(m, L))
    th, dth = 0.4, 1.3
    T = float(sk.kinetic_energy(jnp.array([th]), jnp.array([dth])))
    V = float(sk.potential_energy(jnp.array([th])))
    assert T == pytest.approx(0.5 * m * L ** 2 * dth ** 2, abs=1e-7)
    # V = -m g . com ; with g=(0,-G,0): V = -m G L cos(th) (+0 at joint)
    assert V == pytest.approx(-m * G * L * np.cos(th), abs=1e-6)


def double_pendulum_skeleton(m1, m2, l1, l2):
    """Two revolute z-joints: shoulder at origin, elbow at the tip of
    link 1 (body-frame offset [0,-l1,0]); point masses at the link tips."""
    return SkeletonSpec(
        joints=[
            JointSpec(name='shoulder', type='revolute', parent_body=-1,
                      child_body=0, translation=[0.0, 0.0, 0.0],
                      axis=[0.0, 0.0, 1.0]),
            JointSpec(name='elbow', type='revolute', parent_body=0,
                      child_body=1, translation=[0.0, -l1, 0.0],
                      axis=[0.0, 0.0, 1.0]),
        ],
        bodies=[
            BodySpec(name='link1', mass=m1, com=[0.0, -l1, 0.0],
                     inertia=[0.0] * 6),
            BodySpec(name='link2', mass=m2, com=[0.0, -l2, 0.0],
                     inertia=[0.0] * 6),
        ])


def double_pendulum_tau(m1, m2, l1, l2, q, dq, ddq):
    """Classic point-mass double-pendulum EoM (absolute-angle derivation,
    e.g. Goldstein / standard robotics texts), angles from straight-down,
    q2 relative to link 1. Independent oracle for the autodiff ID."""
    t1, t2 = q
    dt1, dt2 = dq
    a1, a2 = ddq
    # M(q)
    m11 = (m1 + m2) * l1 ** 2 + m2 * l2 ** 2 + 2 * m2 * l1 * l2 * np.cos(t2)
    m12 = m2 * l2 ** 2 + m2 * l1 * l2 * np.cos(t2)
    m22 = m2 * l2 ** 2
    # Coriolis/centrifugal
    h = m2 * l1 * l2 * np.sin(t2)
    c1 = -h * (2 * dt1 * dt2 + dt2 ** 2)
    c2 = h * dt1 ** 2
    # gravity
    g1 = (m1 + m2) * G * l1 * np.sin(t1) + m2 * G * l2 * np.sin(t1 + t2)
    g2 = m2 * G * l2 * np.sin(t1 + t2)
    return np.array([m11 * a1 + m12 * a2 + c1 + g1,
                     m12 * a1 + m22 * a2 + c2 + g2])


def test_double_pendulum_inverse_dynamics_textbook():
    m1, m2, l1, l2 = 1.5, 0.8, 0.6, 0.4
    sk = compile_skeleton(double_pendulum_skeleton(m1, m2, l1, l2))
    rng = np.random.default_rng(0)
    for _ in range(5):
        q = rng.uniform(-1.5, 1.5, 2)
        dq = rng.uniform(-2, 2, 2)
        ddq = rng.uniform(-3, 3, 2)
        tau = np.asarray(sk.inverse_dynamics(
            jnp.asarray(q), jnp.asarray(dq), jnp.asarray(ddq)))
        expect = double_pendulum_tau(m1, m2, l1, l2, q, dq, ddq)
        np.testing.assert_allclose(tau, expect, rtol=1e-4, atol=1e-5)


def free_root_skeleton(m=3.0):
    return SkeletonSpec(
        joints=[JointSpec(name='root', type='free', parent_body=-1,
                          child_body=0, translation=[0.0, 0.0, 0.0])],
        bodies=[BodySpec(name='pelvis', mass=m, com=[0.0, 0.0, 0.0],
                         inertia=[0.01, 0.01, 0.01, 0.0, 0.0, 0.0])])


def test_free_root_translation_newton():
    """Pure translation: tau_trans = m (a - g); rotational tau = 0."""
    m = 3.0
    sk = compile_skeleton(free_root_skeleton(m))
    q = jnp.array([0.0, 0.0, 0.0, 0.2, 1.0, -0.3])
    dq = jnp.array([0.0, 0.0, 0.0, 0.5, -0.2, 0.1])
    a = np.array([1.0, 2.0, -0.5])
    ddq = jnp.concatenate([jnp.zeros(3), jnp.asarray(a)])
    tau = np.asarray(sk.inverse_dynamics(q, dq, ddq))
    g = np.asarray(GRAVITY)
    np.testing.assert_allclose(tau[:3], 0.0, atol=1e-6)
    np.testing.assert_allclose(tau[3:], m * (a - g), atol=1e-5)
    # COM acceleration equals the translational ddq
    np.testing.assert_allclose(np.asarray(sk.com_acceleration(q, dq, ddq)),
                               a, atol=1e-6)


def test_free_root_external_force_newton():
    """A world force F (zero moment about the COM) applied to a floating
    point mass supplies F to the translational DOFs: tau = m(a-g) - F."""
    m = 3.0
    sk = compile_skeleton(free_root_skeleton(m))
    p = np.array([0.2, 1.0, -0.3])
    q = jnp.concatenate([jnp.zeros(3), jnp.asarray(p)])
    dq = jnp.zeros(6)
    a = np.array([0.5, -1.0, 2.0])
    ddq = jnp.concatenate([jnp.zeros(3), jnp.asarray(a)])
    F = np.array([4.0, 5.0, -6.0])
    # wrench about the WORLD origin: moment n = p x F so the line of
    # action passes through the body COM (no induced torque)
    n = np.cross(p, F)
    tau = np.asarray(sk.inverse_dynamics(
        q, dq, ddq, {0: jnp.asarray(np.concatenate([n, F]))}))
    g = np.asarray(GRAVITY)
    np.testing.assert_allclose(tau[3:], m * (a - g) - F, atol=1e-4)
    np.testing.assert_allclose(tau[:3], 0.0, atol=1e-4)
