"""Train state: params + optimizer state + (optional) batch stats + step.

The whole state is a pytree, so it shards/replicates transparently under a
``jax.sharding.Mesh`` and serializes via flax.serialization for
checkpointing.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any                      # {} when the model has none
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> 'TrainState':
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def create_train_state(model, rng: jax.Array, sample_input,
                       tx: optax.GradientTransformation) -> TrainState:
    """Initialize parameters from a sample batch and wrap with the optimizer."""
    variables = model.init({'params': rng, 'dropout': rng}, sample_input, train=False)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        tx=tx,
        apply_fn=model.apply,
    )


def num_params(state: TrainState) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(state.params))
