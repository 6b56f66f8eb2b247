"""Batched rigid-body skeleton kernels: FK, COM dynamics, inverse dynamics.

Capability parity: the nimble ``dynamics.Skeleton`` surface the reference
consumes (SURVEY.md §2.9) — ``setPositions/Velocities/Accelerations`` +
``getCOMLinearAcceleration`` (AnalyticalBaseline.py:54-59), body world
transforms/COMs (:63-90), ``getJointWorldPositionsMap``, and
``getInverseDynamicsFromPredictions`` (RegressionLossEvaluator.py:280).

TPU-first redesign: instead of a stateful C++ skeleton object called
per-frame in Python loops, a :class:`CompiledSkeleton` is a set of pure
functions over the ``SkeletonSpec`` arrays. Velocity/acceleration-level
quantities come from nested ``jax.jvp`` through forward kinematics, and
inverse dynamics is Lagrangian: tau = d/dt(∂T/∂q̇) − ∂T/∂q + ∂V/∂q − Q_ext,
with every derivative taken by autodiff. Everything vmaps over
(batch × time) and compiles into a single fused XLA program — replacing
the reference's per-(batch,timestep) C++ round trips (AnalyticalBaseline
:49-53, RegressionLossEvaluator:270-285).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from inferbiomechanics_tpu.data.b3d import SkeletonSpec
from inferbiomechanics_tpu.ops.spatial import (
    axis_angle_to_matrix, euler_xyz_to_matrix, unskew,
)
from inferbiomechanics_tpu.ops.spline import NaturalCubicSpline

GRAVITY = jnp.array([0.0, -9.81, 0.0])

_CANONICAL_AXES = np.eye(3)


def _nonzero(vals) -> bool:
    return any(abs(float(v)) > 1e-12 for v in vals)


class CompiledSkeleton:
    """Pure-function rigid-body model compiled from a SkeletonSpec.

    The joint loop is unrolled at trace time (≤ a dozen joints), producing
    straight-line XLA code; all public methods accept single-sample ``q``
    vectors and are designed to be wrapped in ``jax.vmap``.
    """

    def __init__(self, spec: SkeletonSpec):
        self.spec = spec
        self.num_bodies = len(spec.bodies)
        self.num_joints = len(spec.joints)
        self.masses = jnp.asarray([b.mass for b in spec.bodies])
        self.total_mass = float(np.sum([b.mass for b in spec.bodies]))
        self.coms = jnp.asarray([b.com for b in spec.bodies])
        # inertia [Ixx,Iyy,Izz,Ixy,Ixz,Iyz] -> full 3x3 about COM, body frame
        I = []
        for b in spec.bodies:
            ixx, iyy, izz, ixy, ixz, iyz = b.inertia
            I.append([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
        self.inertias = jnp.asarray(I)
        self.joint_translations = jnp.asarray([j.translation for j in spec.joints])
        self.joint_axes = jnp.asarray([j.axis for j in spec.joints])
        # OpenSim fidelity arrays (round 4): offset-frame orientations,
        # child offset frames, ordered CustomJoint rotation axes, and
        # coordinate-coupling function parameters. All per-subject
        # SCALABLE quantities live in arrays (PARAM_FIELDS); which
        # transforms exist at all is STRUCTURAL (decided from `spec` at
        # trace time, so legacy specs lower to the exact same XLA).
        self.joint_orientations = jnp.asarray(
            [j.orientation for j in spec.joints])
        self.child_translations = jnp.asarray(
            [j.child_translation for j in spec.joints])
        self.child_orientations = jnp.asarray(
            [j.child_orientation for j in spec.joints])
        self.joint_rot_axes = jnp.asarray(
            [j.rot_axes if j.rot_axes is not None else _CANONICAL_AXES
             for j in spec.joints])
        self._has_pre_rot = [_nonzero(j.orientation) for j in spec.joints]
        self._has_child_off = [
            _nonzero(j.child_translation) or _nonzero(j.child_orientation)
            for j in spec.joints]
        self._noncanon_rot = [j.rot_axes is not None for j in spec.joints]
        # couplings: structural metadata + one flat parameter vector
        # (so per-subject scaled spline knots stack/vmap like any other
        # skeleton parameter). Entry: (kind, axis const, fn_type,
        # (param_off, param_len), spline_or_None).
        self._couplings: List[List[tuple]] = []
        flat_params: List[float] = []
        for j in spec.joints:
            entries = []
            for c in j.couplings:
                fn = c['fn']
                off_p = len(flat_params)
                spline = None
                if fn['type'] == 'spline':
                    spline = NaturalCubicSpline(fn['x'])
                    flat_params.extend(float(v) for v in fn['y'])
                elif fn['type'] == 'linear':
                    flat_params.extend(
                        float(v) for v in fn['coeffs'])
                elif fn['type'] == 'constant':
                    flat_params.append(float(fn['value']))
                elif fn['type'] != 'identity':
                    raise ValueError(
                        f"unknown coupling fn type {fn['type']!r} on "
                        f"joint {j.name}")
                entries.append((c['kind'], np.asarray(c['axis'], np.float64),
                                fn['type'],
                                (off_p, len(flat_params) - off_p), spline))
            self._couplings.append(entries)
        self.coupling_params = jnp.asarray(flat_params, jnp.float32) \
            if flat_params else jnp.zeros((0,), jnp.float32)
        # per-joint dof slice
        self.dof_offsets: List[int] = []
        off = 0
        for j in spec.joints:
            self.dof_offsets.append(off)
            off += {'free': 6, 'ball': 3, 'revolute': 1, 'fixed': 0}[j.type]
        self.num_dofs = off
        self.body_names = [b.name for b in spec.bodies]
        self.body_index = {b.name: i for i, b in enumerate(spec.bodies)}

        # -- vectorized-FK schedule (round 5) ---------------------------
        # Joints without coordinate couplings CAN evaluate as type-grouped
        # batched rotation builders + a level-by-level chain composition
        # (``_fk_vectorized``). MEASURED SLOWER on both venues
        # (TPU same-day A/B: 130.4 vs 44.1 ms/batch(1024); CPU 2.6x —
        # scripts/probe_fk_ab.py, BENCH_NOTES round 5): the level
        # composition's gathers/scatters cost more than the unrolled
        # straight-line 3x3 chains, which XLA fuses fully. The unrolled
        # path stays the default; the vectorized kernel is kept as
        # tested infrastructure (tests/test_skeleton.py).
        self._fast_fk = False
        self._can_vectorize = not any(self._couplings)
        if self._can_vectorize:
            joints = spec.joints
            rev, eul, ordr, fix, free = [], [], [], [], []
            for ji, j in enumerate(joints):
                if j.type == 'revolute':
                    rev.append(ji)
                elif j.type in ('ball', 'free'):
                    (ordr if self._noncanon_rot[ji] else eul).append(ji)
                    if j.type == 'free':
                        free.append(ji)
                else:
                    fix.append(ji)
            self._vec_rev = np.asarray(rev, np.int32)
            self._vec_eul = np.asarray(eul, np.int32)
            self._vec_ord = np.asarray(ordr, np.int32)
            self._vec_fix = np.asarray(fix, np.int32)
            self._vec_free = [(ji, self.dof_offsets[ji]) for ji in free]
            self._vec_rev_qoff = np.asarray(
                [self.dof_offsets[ji] for ji in rev], np.int32)
            self._vec_eul_qoff = np.asarray(
                [[self.dof_offsets[ji] + k for k in range(3)]
                 for ji in eul], np.int32).reshape(len(eul), 3)
            self._vec_ord_qoff = np.asarray(
                [[self.dof_offsets[ji] + k for k in range(3)]
                 for ji in ordr], np.int32).reshape(len(ordr), 3)
            # concat([rev, eul, ord, fix]) -> joint order
            self._vec_perm = np.argsort(
                np.concatenate([self._vec_rev, self._vec_eul,
                                self._vec_ord, self._vec_fix])
            ).astype(np.int32)
            self._vec_any_pre = any(self._has_pre_rot)
            self._vec_any_child = any(self._has_child_off)
            # level schedule: joints grouped by tree depth; every level is
            # one batched (gather-parent, matmul, scatter-child) step
            depth = {}
            for ji, j in enumerate(joints):
                depth[j.child_body] = (0 if j.parent_body < 0
                                       else depth[j.parent_body] + 1)
            levels: Dict[int, List[int]] = {}
            for ji, j in enumerate(joints):
                levels.setdefault(depth[j.child_body], []).append(ji)
            self._vec_levels = []
            for d in sorted(levels):
                jis = levels[d]
                self._vec_levels.append((
                    np.asarray(jis, np.int32),
                    np.asarray([joints[ji].child_body for ji in jis],
                               np.int32),
                    np.asarray([joints[ji].parent_body for ji in jis],
                               np.int32),
                    d == 0))

    # -- joint-local transforms ------------------------------------------

    def _coupling_fn(self, entry, q_scalar):
        """Evaluate one coupling function at the joint coordinate."""
        _kind, _axis, fn_type, (p_off, p_len), spline = entry
        if fn_type == 'identity':
            return q_scalar
        p = self.coupling_params[p_off:p_off + p_len]
        if fn_type == 'linear':
            return p[0] * q_scalar + p[1]
        if fn_type == 'constant':
            return p[0]
        return spline(q_scalar, y=p)  # 'spline'

    def _ordered_rotation(self, ji: int, angles) -> jax.Array:
        """Compose rotations about the joint's ordered axes (OpenSim
        CustomJoint semantics); canonical axes reduce to euler-XYZ."""
        if not self._noncanon_rot[ji]:
            return euler_xyz_to_matrix(jnp.stack(angles))
        R = axis_angle_to_matrix(self.joint_rot_axes[ji, 0], angles[0])
        for k in (1, 2):
            R = R @ axis_angle_to_matrix(self.joint_rot_axes[ji, k],
                                         angles[k])
        return R

    def _joint_local(self, ji: int, joint, q: jax.Array):
        """(Rj, tj): the joint frame's motion within the parent offset
        frame — rotation matrix and translation (translation expressed in
        the parent offset frame, per OpenSim SpatialTransform)."""
        off = self.dof_offsets[ji]
        zero3 = jnp.zeros(3, q.dtype)
        if joint.type == 'free':
            return (self._ordered_rotation(ji, [q[off], q[off + 1],
                                                q[off + 2]]),
                    q[off + 3:off + 6])
        if joint.type == 'ball':
            return (self._ordered_rotation(ji, [q[off], q[off + 1],
                                                q[off + 2]]),
                    zero3)
        if joint.type == 'revolute':
            entries = self._couplings[ji]
            if not entries:
                return (axis_angle_to_matrix(self.joint_axes[ji], q[off]),
                        zero3)
            Rj = jnp.eye(3, dtype=q.dtype)
            tj = zero3
            for e in entries:
                val = self._coupling_fn(e, q[off])
                axis = jnp.asarray(e[1], q.dtype)
                if e[0] == 'rotation':
                    Rj = Rj @ axis_angle_to_matrix(axis, val)
                else:
                    tj = tj + axis * val
            return Rj, tj
        return jnp.eye(3, dtype=q.dtype), zero3  # fixed

    def _joint_transform(self, ji: int, joint, q: jax.Array):
        """Full parent-body -> child-body transform:
        X = X_parent_offset ∘ X_joint ∘ X_child_offset⁻¹."""
        Rj, tj = self._joint_local(ji, joint, q)
        t_total = tj
        if self._has_child_off[ji]:
            R_co = euler_xyz_to_matrix(
                self.child_orientations[ji].astype(q.dtype))
            t_co = self.child_translations[ji]
            Rj = Rj @ R_co.T
            t_total = tj - Rj @ t_co
        R_total = Rj
        if self._has_pre_rot[ji]:
            R_po = euler_xyz_to_matrix(
                self.joint_orientations[ji].astype(q.dtype))
            R_total = R_po @ Rj
            t_total = R_po @ t_total
        return R_total, self.joint_translations[ji] + t_total

    # -- kinematics ----------------------------------------------------------

    def fk(self, q: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """World transforms for every body: (R [nb,3,3], p [nb,3])."""
        if self._fast_fk:
            return self._fk_vectorized(q)
        return self._fk_unrolled(q)

    def _fk_unrolled(self, q: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Per-joint unroll — the general path (coordinate couplings
        evaluate per-entry scalar functions that don't batch)."""
        Rs = [None] * self.num_bodies
        ps = [None] * self.num_bodies
        for ji, joint in enumerate(self.spec.joints):
            if joint.parent_body < 0:
                Rp, pp = jnp.eye(3, dtype=q.dtype), jnp.zeros(3, q.dtype)
            else:
                Rp, pp = Rs[joint.parent_body], ps[joint.parent_body]
            Rj, tj = self._joint_transform(ji, joint, q)
            Rs[joint.child_body] = Rp @ Rj
            ps[joint.child_body] = pp + Rp @ tj
        return jnp.stack(Rs), jnp.stack(ps)

    def _fk_vectorized(self, q: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Type-grouped batched joint rotations + level-wise composition.

        Semantics identical to :meth:`_fk_unrolled` (pinned by
        tests/test_skeleton.py::test_vectorized_fk_matches_unrolled);
        per-subject parameter arrays (with_params) stay traced values —
        only topology/type grouping is baked at trace time.
        """
        nj = self.num_joints
        dt = q.dtype
        parts = []
        if self._vec_rev.size:
            parts.append(axis_angle_to_matrix(
                self.joint_axes[self._vec_rev].astype(dt),
                q[self._vec_rev_qoff]))
        if self._vec_eul.size:
            parts.append(euler_xyz_to_matrix(q[self._vec_eul_qoff]))
        if self._vec_ord.size:
            axs = self.joint_rot_axes[self._vec_ord].astype(dt)  # [no,3,3]
            ang = q[self._vec_ord_qoff]                          # [no,3]
            R = axis_angle_to_matrix(axs[:, 0], ang[:, 0])
            R = R @ axis_angle_to_matrix(axs[:, 1], ang[:, 1])
            parts.append(R @ axis_angle_to_matrix(axs[:, 2], ang[:, 2]))
        if self._vec_fix.size:
            parts.append(jnp.broadcast_to(
                jnp.eye(3, dtype=dt), (self._vec_fix.size, 3, 3)))
        Rj = jnp.concatenate(parts)[self._vec_perm]              # [nj,3,3]
        tj = jnp.zeros((nj, 3), dt)
        for ji, off in self._vec_free:
            tj = tj.at[ji].set(q[off + 3:off + 6])
        # offset frames (zero angles/translations are exact identities,
        # so they apply to ALL joints whenever ANY joint has one)
        t = tj
        if self._vec_any_child:
            C = euler_xyz_to_matrix(self.child_orientations.astype(dt))
            Rj = Rj @ jnp.swapaxes(C, -1, -2)
            t = tj - jnp.einsum('jab,jb->ja', Rj,
                                self.child_translations.astype(dt))
        if self._vec_any_pre:
            A = euler_xyz_to_matrix(self.joint_orientations.astype(dt))
            Rj = A @ Rj
            t = jnp.einsum('jab,jb->ja', A, t)
        t_loc = self.joint_translations.astype(dt) + t
        # chain composition: one batched gather/matmul/scatter per level
        R = jnp.zeros((self.num_bodies, 3, 3), dt)
        p = jnp.zeros((self.num_bodies, 3), dt)
        for jis, childs, parents, is_root in self._vec_levels:
            if is_root:
                Rw, pw = Rj[jis], t_loc[jis]
            else:
                Rp, pp = R[parents], p[parents]
                Rw = Rp @ Rj[jis]
                pw = pp + jnp.einsum('jab,jb->ja', Rp, t_loc[jis])
            R = R.at[childs].set(Rw)
            p = p.at[childs].set(pw)
        return R, p

    def joint_world_positions(self, q: jax.Array) -> jax.Array:
        """World position of every joint center [nj, 3] (parity:
        ``getJointWorldPositionsMap``)."""
        Rs, ps = self.fk(q)
        out = []
        for ji, joint in enumerate(self.spec.joints):
            t = self.joint_translations[ji]
            if joint.parent_body < 0:
                base = t.astype(q.dtype)
                if joint.type == 'free':
                    off = self.dof_offsets[ji]
                    tq = q[off + 3:off + 6]
                    if self._has_pre_rot[ji]:
                        tq = euler_xyz_to_matrix(
                            self.joint_orientations[ji].astype(q.dtype)) @ tq
                    base = base + tq
                out.append(base)
            else:
                out.append(ps[joint.parent_body] + Rs[joint.parent_body] @ t)
        return jnp.stack(out)

    def body_coms_world(self, q: jax.Array) -> jax.Array:
        Rs, ps = self.fk(q)
        return ps + jnp.einsum('bij,bj->bi', Rs, self.coms)

    def com(self, q: jax.Array) -> jax.Array:
        """Whole-body COM in world frame (parity: ``getCOM``)."""
        return (self.masses[:, None] * self.body_coms_world(q)).sum(0) / self.total_mass

    def com_velocity(self, q: jax.Array, dq: jax.Array) -> jax.Array:
        return jax.jvp(self.com, (q,), (dq,))[1]

    def com_acceleration(self, q: jax.Array, dq: jax.Array, ddq: jax.Array) -> jax.Array:
        """COM linear acceleration (parity: ``getCOMLinearAcceleration``):
        a = J̇(q,q̇)q̇ + J(q)q̈ via nested jvp."""
        vel_fn = lambda q_, dq_: jax.jvp(self.com, (q_,), (dq_,))[1]
        return jax.jvp(vel_fn, (q, dq), (dq, ddq))[1]

    def body_velocities(self, q: jax.Array, dq: jax.Array):
        """Per-body (com linear velocity [nb,3], world angular velocity
        [nb,3]) from one jvp through FK."""
        def pose(q_):
            Rs, _ = self.fk(q_)
            return Rs, self.body_coms_world(q_)
        (Rs, _coms), (dRs, dcoms) = jax.jvp(pose, (q,), (dq,))
        omega_world = unskew(jnp.einsum('bij,bkj->bik', dRs, Rs))
        return dcoms, omega_world, Rs

    # -- energies ------------------------------------------------------------

    def kinetic_energy(self, q: jax.Array, dq: jax.Array) -> jax.Array:
        v, w_world, Rs = self.body_velocities(q, dq)
        w_body = jnp.einsum('bji,bj->bi', Rs, w_world)
        trans = 0.5 * (self.masses * (v * v).sum(-1)).sum()
        rot = 0.5 * jnp.einsum('bi,bij,bj->', w_body, self.inertias, w_body)
        return trans + rot

    def potential_energy(self, q: jax.Array) -> jax.Array:
        h = self.body_coms_world(q)
        return -(self.masses[:, None] * GRAVITY[None, :] * h).sum()

    # -- inverse dynamics ----------------------------------------------------

    def inverse_dynamics(self, q: jax.Array, dq: jax.Array, ddq: jax.Array,
                         ext_world_wrenches: Dict[int, jax.Array] | None = None
                         ) -> jax.Array:
        """Generalized forces tau s.t. the motion (q, dq, ddq) holds under
        gravity and the given external wrenches.

        ``ext_world_wrenches`` maps body index -> [n; f] wrench expressed in
        WORLD frame about the WORLD origin (applied to that body). Lagrangian
        form, all derivatives by autodiff:
            tau = d/dt(∂T/∂q̇) − ∂T/∂q + ∂V/∂q − Q_ext
        """
        dT_ddq = jax.grad(self.kinetic_energy, argnums=1)
        # d/dt of the generalized momentum along the trajectory
        dmom_dt = jax.jvp(lambda q_, dq_: dT_ddq(q_, dq_), (q, dq), (dq, ddq))[1]
        dT_dq = jax.grad(self.kinetic_energy, argnums=0)(q, dq)
        dV_dq = jax.grad(self.potential_energy)(q)
        tau = dmom_dt - dT_dq + dV_dq
        if ext_world_wrenches:
            def power(dq_):
                v, w_world, _Rs = self.body_velocities(q, dq_)
                _Rs2, ps = self.fk(q)
                coms = self.body_coms_world(q)
                total = 0.0
                for bi, wrench in ext_world_wrenches.items():
                    n, f = wrench[:3], wrench[3:]
                    # velocity of the body-fixed point at the world origin
                    v_origin = v[bi] + jnp.cross(w_world[bi], -coms[bi])
                    total = total + jnp.dot(n, w_world[bi]) + jnp.dot(f, v_origin)
                return total
            Q_ext = jax.grad(power)(dq)
            tau = tau - Q_ext
        return tau

    def inverse_dynamics_from_predictions(self, q: jax.Array, dq: jax.Array,
                                          ddq: jax.Array,
                                          contact_body_indices: List[int],
                                          root_wrenches: jax.Array,
                                          ) -> jax.Array:
        """Parity surface for ``getInverseDynamicsFromPredictions``
        (RegressionLossEvaluator.py:280): contact wrenches arrive expressed
        in the ROOT frame about the root origin (as the models predict
        them); convert to world and run ID."""
        Rs, ps = self.fk(q)
        R_wr, p_wr = Rs[0], ps[0]   # body 0 is the root (pelvis)
        ext = {}
        for i, bi in enumerate(contact_body_indices):
            w = root_wrenches[6 * i:6 * i + 6]
            n_r, f_r = w[:3], w[3:]
            # inverse of dAdInvT: n_w = R n_r + p × (R f_r), f_w = R f_r
            f_w = R_wr @ f_r
            n_w = R_wr @ n_r + jnp.cross(p_wr, f_w)
            ext[bi] = jnp.concatenate([n_w, f_w])
        return self.inverse_dynamics(q, dq, ddq, ext)


def compile_skeleton(spec: SkeletonSpec) -> CompiledSkeleton:
    return CompiledSkeleton(spec)


# ---------------------------------------------------------------------------
# Batched per-subject skeleton parameters
# ---------------------------------------------------------------------------
# Real AddBiomechanics datasets carry one SCALED model per subject: same
# topology/joint types, different masses / COMs / inertias / segment
# offsets. Those are plain arrays in CompiledSkeleton, so a batch of
# subjects vmaps over a parameter stack while the joint structure stays a
# trace-time constant — the TPU-native replacement for the reference's
# per-item skeleton objects (RegressionLossEvaluator.py:271-285).

PARAM_FIELDS = ('masses', 'coms', 'inertias', 'joint_translations',
                'joint_axes', 'joint_orientations', 'child_translations',
                'child_orientations', 'joint_rot_axes', 'coupling_params')


def _joint_structure(j) -> tuple:
    """Everything FK branches on at trace time (values live in arrays):
    topology, which offset transforms exist, rotation-axis convention,
    and the coupling-function signatures (incl. spline knot abscissae —
    those are structural; ordinates are per-subject parameters)."""
    return (j.name, j.type, j.parent_body, j.child_body,
            _nonzero(j.orientation),
            _nonzero(j.child_translation) or _nonzero(j.child_orientation),
            j.rot_axes is not None,
            tuple((c['kind'], c['fn']['type'],
                   tuple(c['fn'].get('x', ())),
                   len(c['fn'].get('y', ())) or len(c['fn'].get('coeffs', ())))
                  for c in j.couplings))


def skeletons_structurally_equal(a: SkeletonSpec, b: SkeletonSpec) -> bool:
    return ([_joint_structure(j) for j in a.joints]
            == [_joint_structure(j) for j in b.joints]
            and [x.name for x in a.bodies] == [x.name for x in b.bodies])


def skeleton_param_stack(specs: List[SkeletonSpec]) -> Dict[str, jax.Array]:
    """Stack per-subject parameter arrays [S, ...]; requires identical
    topology (raises ValueError otherwise)."""
    base = specs[0]
    for i, s in enumerate(specs[1:], 1):
        if not skeletons_structurally_equal(base, s):
            raise ValueError(
                f'skeleton {i} differs structurally from skeleton 0 — '
                f'per-subject batching needs shared topology')
    compiled = [CompiledSkeleton(s) for s in specs]
    return {f: jnp.stack([getattr(c, f) for c in compiled])
            for f in PARAM_FIELDS}


def with_params(skel: CompiledSkeleton,
                arrays: Dict[str, jax.Array]) -> CompiledSkeleton:
    """Shallow copy with (possibly traced) per-subject parameter arrays —
    usable inside jit/vmap; structure stays from `skel`."""
    import copy
    out = copy.copy(skel)
    for f in PARAM_FIELDS:
        setattr(out, f, arrays[f])
    out.total_mass = arrays['masses'].sum()
    return out
