"""Jitted train / eval steps.

One fused XLA program per step: forward, loss, ALL reported metrics,
backward, and optimizer update (the reference runs each of these as
separate eager torch calls — train.py:240-284). Steps take the packed
``[B, T, C]`` batch arrays straight from the data layer; label dicts are
zero-cost column slices created inside the traced function.

The same step functions serve single-chip jit and multi-chip pjit: under
a ``Mesh`` the caller passes sharded inputs and XLA inserts the gradient
all-reduce over ICI automatically (replacing the reference's DDP/NCCL,
train.py:175).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax

from inferbiomechanics_tpu.data.dataset import unpack
from inferbiomechanics_tpu.loss.evaluator import LossConfig, loss_and_metrics
from inferbiomechanics_tpu.train.state import TrainState


def make_train_step(model, lab_offsets: Dict[str, Tuple[int, int]],
                    loss_config: LossConfig,
                    donate: bool = True) -> Callable:
    """Build ``step(state, inputs, labels, rng) -> (state, metrics)``."""
    has_batch_stats = None  # resolved at first trace from the state pytree

    def step(state: TrainState, batch_inputs: jax.Array,
             batch_labels: jax.Array, dropout_rng: jax.Array):
        labels = unpack(batch_labels, lab_offsets)
        mutable = ['batch_stats'] if state.batch_stats else []

        def loss_fn(params):
            variables = {'params': params}
            if state.batch_stats:
                variables['batch_stats'] = state.batch_stats
            if mutable:
                outputs, new_model_state = model.apply(
                    variables, batch_inputs, train=True,
                    rngs={'dropout': dropout_rng}, mutable=mutable)
            else:
                outputs = model.apply(variables, batch_inputs, train=True,
                                      rngs={'dropout': dropout_rng})
                new_model_state = {}
            loss, metrics = loss_and_metrics(outputs, labels, loss_config)
            return loss, (metrics, new_model_state)

        grads, (metrics, new_model_state) = jax.grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        if mutable:
            state = state.replace(batch_stats=new_model_state['batch_stats'])
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, lab_offsets: Dict[str, Tuple[int, int]],
                   loss_config: LossConfig) -> Callable:
    """Build ``eval_step(state, inputs, labels) -> (outputs, metrics)``."""

    def eval_step(state: TrainState, batch_inputs: jax.Array,
                  batch_labels: jax.Array):
        labels = unpack(batch_labels, lab_offsets)
        variables = {'params': state.params}
        if state.batch_stats:
            variables['batch_stats'] = state.batch_stats
        outputs = model.apply(variables, batch_inputs, train=False)
        _, metrics = loss_and_metrics(outputs, labels, loss_config)
        return outputs, metrics

    return jax.jit(eval_step)
