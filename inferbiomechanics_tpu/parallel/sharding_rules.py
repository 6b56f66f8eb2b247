"""Parameter sharding rules for tensor-parallel layout.

With ``model_parallel > 1`` the transformer/diffusion Dense kernels are
split column-wise over the ``model`` mesh axis (Megatron-style layout for
the MLP up-projection; XLA inserts the matching all-gathers/reduce-
scatters during pjit compilation). Everything else — and everything when
the model axis has size 1 — is replicated on the mesh, giving pure data
parallelism.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from inferbiomechanics_tpu.parallel.mesh import MODEL_AXIS

# kernels at least this wide get column-sharded on the model axis
_MIN_SHARD_DIM = 64


def _param_spec(path, leaf, mp: int) -> P:
    if mp <= 1:
        return P()
    names = [getattr(k, 'key', getattr(k, 'name', str(k))) for k in path]
    is_kernel = names and str(names[-1]) == 'kernel'
    if (is_kernel and leaf.ndim == 2 and leaf.shape[-1] % mp == 0
            and leaf.shape[-1] >= _MIN_SHARD_DIM):
        return P(None, MODEL_AXIS)
    return P()


def shard_params_for_mesh(mesh: Mesh, state):
    """device_put a TrainState with tp-sharded kernels, replicated rest."""
    mp = mesh.shape.get(MODEL_AXIS, 1)

    def put_tree(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)
        leaves, treedef = flat
        out = [jax.device_put(leaf, NamedSharding(mesh, _param_spec(path, leaf, mp)))
               for path, leaf in leaves]
        return jax.tree_util.tree_unflatten(treedef, out)

    # opt_state mirrors params structurally where it holds per-param moments;
    # replicate scalars, shard matching leaves by shape.
    params = put_tree(state.params)

    shape_to_sharding = {}
    for p_old, p_new in zip(jax.tree_util.tree_leaves(state.params),
                            jax.tree_util.tree_leaves(params)):
        shape_to_sharding.setdefault(p_old.shape, p_new.sharding)

    def put_opt(leaf):
        # match per-param moment tensors to their param's sharding by shape
        if leaf.ndim >= 2 and leaf.shape in shape_to_sharding:
            return jax.device_put(leaf, shape_to_sharding[leaf.shape])
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    opt_state = jax.tree_util.tree_map(put_opt, state.opt_state)
    rep = NamedSharding(mesh, P())
    return state.replace(
        params=params,
        opt_state=opt_state,
        batch_stats=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), state.batch_stats),
        step=jax.device_put(state.step, rep))
