"""Inverse-dynamics joint-torque report.

Capability parity: reference ``RegressionLossEvaluator.py:265-286`` — per
batch item: set the skeleton state from the LAST input frame, scale the
predicted (kg-normalized) contact wrenches by subject mass, run
``getInverseDynamicsFromPredictions``, and report the mean |tau error|
over non-root DOFs divided by mass, averaged over the batch.

TPU-first: the reference's per-item Python/C++ loop becomes one vmapped,
jitted ID program over the whole batch.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from inferbiomechanics_tpu.data import keys as K
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.ops.skeleton import compile_skeleton


def make_tau_report_fn(ds: WindowDataset) -> Callable:
    """Build the ``tau_fn`` hook consumed by RegressionLossEvaluator."""
    spec = None
    for sk in getattr(ds, 'skeletons', []):
        if sk is not None:
            spec = sk
            break
    if spec is None:
        from inferbiomechanics_tpu.data.synthetic import standard_skeleton
        spec = standard_skeleton()
    skel = compile_skeleton(spec)
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

    def one(q, dq, ddq, wrenches_per_kg, tau_label, mass):
        tau = skel.inverse_dynamics_from_predictions(
            q, dq, ddq, contact_indices, wrenches_per_kg * mass)
        err = tau - tau_label
        return jnp.mean(jnp.abs(err[6:])) / mass   # non-root DOFs (ref :284)

    batched = jax.jit(jax.vmap(one))

    def tau_fn(packed_inputs, outputs, labels, batch_subject_indices=None) -> float:
        x = jnp.asarray(packed_inputs)
        q = x[:, -1, o_pos:o_pos + w_pos]
        dq = x[:, -1, o_vel:o_vel + w_pos]
        ddq = x[:, -1, o_acc:o_acc + w_pos]
        wrenches = jnp.asarray(
            outputs[K.OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME])[:, -1, :]
        tau_label = jnp.asarray(labels[K.OutputDataKeys.TAU])[:, -1, :]
        if batch_subject_indices is not None:
            mass = jnp.asarray(
                subject_masses[np.asarray(batch_subject_indices)])
        else:
            mass = jnp.full((q.shape[0],), mean_mass, jnp.float32)
        return float(jnp.mean(batched(q, dq, ddq, wrenches, tau_label, mass)))

    return tau_fn
