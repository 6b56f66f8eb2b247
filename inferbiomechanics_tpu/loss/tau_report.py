"""Inverse-dynamics joint-torque report.

Capability parity: reference ``RegressionLossEvaluator.py:265-286`` — per
batch item: set the skeleton state from the LAST input frame, scale the
predicted (kg-normalized) contact wrenches by subject mass, run
``getInverseDynamicsFromPredictions``, and report the mean |tau error|
over non-root DOFs divided by mass, averaged over the batch.

TPU-first: the reference's per-item Python/C++ loop becomes one vmapped,
jitted ID program over the whole batch; per-subject SCALED skeletons
(same topology, different masses/COMs/inertias/offsets) batch as a
parameter stack gathered by batch_subject_indices (ops/skeleton.py
``skeleton_param_stack``), matching the reference's use of each item's
own skeleton.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from inferbiomechanics_tpu.data import keys as K
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.ops.skeleton import (
    compile_skeleton, skeleton_param_stack, skeletons_structurally_equal,
    with_params,
)


def make_tau_report_fn(ds: WindowDataset) -> Callable:
    """Build the ``tau_fn`` hook consumed by RegressionLossEvaluator."""
    specs = [sk for sk in getattr(ds, 'skeletons', []) if sk is not None]
    if not specs:
        from inferbiomechanics_tpu.data.synthetic import standard_skeleton
        specs = [standard_skeleton()]
    skel = compile_skeleton(specs[0])
    # per-subject parameter stack when every subject shares the topology
    # (real scaled models do); else fall back to subject 0's skeleton
    param_stack = None
    if (len(specs) == len(ds.subject_paths) and len(specs) > 1
            and all(skeletons_structurally_equal(specs[0], s)
                    for s in specs[1:])):
        param_stack = skeleton_param_stack(specs)
    contact_indices = [skel.body_index[b] for b in ds.contact_bodies
                       if b in skel.body_index]
    # per-subject mass, indexed by batch_subject_indices (ref uses each
    # item's own skel.getMass(); the round-1 dataset-mean was wrong for
    # multi-subject datasets with differing masses)
    subject_masses = (np.asarray([s.getMassKg() for s in ds.subjects],
                                 dtype=np.float32)
                      if ds.subjects else np.asarray([70.0], np.float32))
    mean_mass = float(np.mean(subject_masses))
    o_pos, w_pos = ds.in_offsets[K.InputDataKeys.POS]
    o_vel, _ = ds.in_offsets[K.InputDataKeys.VEL]
    o_acc, _ = ds.in_offsets[K.InputDataKeys.ACC]

    def one(q, dq, ddq, wrenches_per_kg, tau_label, mass, skel_arrays):
        sk = with_params(skel, skel_arrays) if skel_arrays else skel
        tau = sk.inverse_dynamics_from_predictions(
            q, dq, ddq, contact_indices, wrenches_per_kg * mass)
        err = tau - tau_label
        return jnp.mean(jnp.abs(err[6:])) / mass   # non-root DOFs (ref :284)

    if param_stack is not None:
        batched = jax.jit(jax.vmap(
            lambda q, dq, ddq, w, t, m, arrs: one(q, dq, ddq, w, t, m, arrs)))
    else:
        batched = jax.jit(jax.vmap(
            lambda q, dq, ddq, w, t, m: one(q, dq, ddq, w, t, m, None)))

    masses_j = jnp.asarray(subject_masses)

    def traceable(packed_inputs, outputs, labels,
                  batch_subject_indices=None) -> jax.Array:
        """Jit-safe core: returns the batch-mean tau metric as a traced
        scalar (``batch_subject_indices`` may be a traced int array) —
        used by analyze's chunked scan dispatch (cli/analyze_cmd.py)."""
        x = jnp.asarray(packed_inputs)
        q = x[:, -1, o_pos:o_pos + w_pos]
        dq = x[:, -1, o_vel:o_vel + w_pos]
        ddq = x[:, -1, o_acc:o_acc + w_pos]
        wrenches = jnp.asarray(
            outputs[K.OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME])[:, -1, :]
        tau_label = jnp.asarray(labels[K.OutputDataKeys.TAU])[:, -1, :]
        if batch_subject_indices is not None:
            # NB: traced gathers CLAMP out-of-range indices (XLA
            # semantics); the host wrapper below validates eagerly
            sidx = jnp.asarray(batch_subject_indices)
            mass = masses_j[sidx]
        else:
            sidx = jnp.zeros((q.shape[0],), jnp.int32)
            mass = jnp.full((q.shape[0],), mean_mass, jnp.float32)
        if param_stack is not None:
            arrs = {k: v[sidx] for k, v in param_stack.items()}
            vals = batched(q, dq, ddq, wrenches, tau_label, mass, arrs)
        else:
            vals = batched(q, dq, ddq, wrenches, tau_label, mass)
        return jnp.mean(vals)

    def tau_fn(packed_inputs, outputs, labels, batch_subject_indices=None) -> float:
        if batch_subject_indices is not None:
            si = np.asarray(batch_subject_indices)
            if si.size and (si.min() < 0 or si.max() >= len(subject_masses)):
                # inside jit the gather would silently clamp to the last
                # subject's mass/skeleton (dataset/checkpoint mismatch)
                raise IndexError(
                    f'batch_subject_indices out of range '
                    f'[0, {len(subject_masses)}): '
                    f'min {si.min()}, max {si.max()}')
        return float(traceable(packed_inputs, outputs, labels,
                               batch_subject_indices))

    tau_fn.traceable = traceable
    return tau_fn
