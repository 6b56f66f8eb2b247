"""Analytical physics baseline — no learned parameters.

Capability parity: reference ``src/models/AnalyticalBaseline.py`` — per
frame: COM "acceleration" = a_com − g from the skeleton state (ref :59);
contact heuristic: contact-body world height < 0.1 m ⇒ in contact
(ref :62-68); the (per-kg) total force split equally across contacting
feet (ref :85), rotated into the root frame (ref :87); CoPs = contact-
body COMs in the root frame (ref :89-90); per-body wrench =
dAdInvT(T_wr, [cop_w × F_w; F_w]) (ref :96-100); zeros for tau /
contact / comAcc / residual outputs (ref :28-45).

TPU-first redesign: the reference double-loops (batch, timestep) through
C++ skeleton calls; here the whole computation is one ``vmap`` over
(B·T) frames through the CompiledSkeleton FK/jvp kernels, jitted into a
single XLA program.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from inferbiomechanics_tpu.data import keys as K
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.ops.skeleton import GRAVITY, CompiledSkeleton, compile_skeleton
from inferbiomechanics_tpu.ops.spatial import dAdInvT, inverse_transform_point

CONTACT_HEIGHT_THRESHOLD = 0.1  # meters (ref :66)


def analytical_forward(skel: CompiledSkeleton,
                       contact_body_indices: List[int],
                       q: jax.Array, dq: jax.Array, ddq: jax.Array
                       ) -> Dict[str, jax.Array]:
    """Single-frame analytical prediction; vmap over frames for batches."""
    nb = len(contact_body_indices)
    cbi = jnp.asarray(contact_body_indices)

    Rs, ps = skel.fk(q)
    com_acc = skel.com_acceleration(q, dq, ddq) - GRAVITY  # ref :59

    # body COMs from the FK above (body_coms_world(q) would re-run FK)
    body_coms = ps + jnp.einsum('bij,bj->bi', Rs, skel.coms.astype(q.dtype))
    heights = ps[cbi, 1]
    contact = (heights < CONTACT_HEIGHT_THRESHOLD).astype(q.dtype)  # ref :62-68
    n_contact = contact.sum()
    any_contact = n_contact > 0
    safe_n = jnp.maximum(n_contact, 1.0)

    world_forces = contact[:, None] * (com_acc / safe_n)[None, :]   # [nb,3]
    R_wr, p_wr = Rs[0], ps[0]
    root_forces = jnp.einsum('ji,bj->bi', R_wr, world_forces)       # T_rw.rotation() @ f
    world_cops = body_coms[cbi]
    root_cops = inverse_transform_point(R_wr, p_wr, world_cops)

    moments = jnp.cross(world_cops, world_forces)
    world_wrenches = jnp.concatenate([moments, world_forces], axis=-1)
    body_wrenches = dAdInvT(R_wr[None], p_wr[None], world_wrenches)

    gate = jnp.where(any_contact, 1.0, 0.0).astype(q.dtype)
    return {
        K.OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME: gate * root_forces.reshape(-1),
        K.OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME: gate * root_cops.reshape(-1),
        K.OutputDataKeys.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME: jnp.zeros(3 * nb, q.dtype),
        K.OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME: gate * body_wrenches.reshape(-1),
        K.OutputDataKeys.RESIDUAL_WRENCH_IN_ROOT_FRAME: jnp.zeros(6, q.dtype),
        K.OutputDataKeys.CONTACT: jnp.zeros(nb, q.dtype),
        K.OutputDataKeys.COM_ACC_IN_ROOT_FRAME: jnp.zeros(3, q.dtype),
        K.OutputDataKeys.TAU: jnp.zeros_like(q),
    }


def make_analytical_fn(ds: WindowDataset):
    """Build ``predict(packed_inputs [B,T,C], subject_indices) -> outputs``.

    All subjects share the standard skeleton TOPOLOGY (the dataset asserts
    this — AddBiomechanicsDataset.py:141-156), but each subject's model is
    individually SCALED; when every subject carries a skeleton, the
    per-subject parameter arrays (masses/COMs/inertias/segment offsets)
    batch as a stack gathered by ``subject_indices`` (ops/skeleton.py) —
    matching the reference's per-item skeleton objects
    (AnalyticalBaseline.py:49-100). Per-kg force outputs keep subject
    mass out of the contact math itself.
    """
    from inferbiomechanics_tpu.ops.skeleton import (
        skeleton_param_stack, skeletons_structurally_equal, with_params,
    )

    specs = [sk for sk in getattr(ds, 'skeletons', []) if sk is not None]
    if not specs:
        from inferbiomechanics_tpu.data.synthetic import standard_skeleton
        specs = [standard_skeleton()]
    skel = compile_skeleton(specs[0])
    param_stack = None
    if (len(specs) == len(ds.subject_paths) and len(specs) > 1
            and all(skeletons_structurally_equal(specs[0], s)
                    for s in specs[1:])):
        param_stack = skeleton_param_stack(specs)
    contact_indices = [skel.body_index[b] for b in ds.contact_bodies
                       if b in skel.body_index]
    o_pos, w_pos = ds.in_offsets[K.InputDataKeys.POS]
    o_vel, _ = ds.in_offsets[K.InputDataKeys.VEL]
    o_acc, _ = ds.in_offsets[K.InputDataKeys.ACC]

    # ONE flat vmap over B*T frames (reshaped back to [B,T,...] after):
    # a single large batch axis instead of nested vmaps — bigger fused
    # ops, and it sidesteps an XLA algebraic-simplifier RET_CHECK crash
    # on doubly-vmapped 3x3 dot/transpose chains (observed jax 0.9.0 CPU)
    frame_fn = lambda q, dq, ddq: analytical_forward(skel, contact_indices, q, dq, ddq)
    batched_flat = jax.jit(jax.vmap(frame_fn))

    def frame_ps(q, dq, ddq, arrs):
        sk = with_params(skel, arrs)
        return analytical_forward(sk, contact_indices, q, dq, ddq)

    batched_ps_flat = jax.jit(jax.vmap(frame_ps))

    def predict(packed_inputs, subject_indices=None) -> Dict[str, jax.Array]:
        x = jnp.asarray(packed_inputs)
        B, T = x.shape[0], x.shape[1]
        q = x[..., o_pos:o_pos + w_pos].reshape(B * T, w_pos)
        dq = x[..., o_vel:o_vel + w_pos].reshape(B * T, w_pos)
        ddq = x[..., o_acc:o_acc + w_pos].reshape(B * T, w_pos)
        if param_stack is not None and subject_indices is not None:
            # jnp (not np) so traced subject indices work — analyze's
            # chunked scan dispatch calls predict inside lax.scan
            sidx = jnp.asarray(subject_indices)
            # per-frame parameter rows: repeat each window's subject T x
            fidx = jnp.repeat(sidx, T)
            arrs = {k: v[fidx] for k, v in param_stack.items()}
            out = batched_ps_flat(q, dq, ddq, arrs)
        else:
            out = batched_flat(q, dq, ddq)
        return {k: v.reshape((B, T) + v.shape[1:]) for k, v in out.items()}

    return predict
