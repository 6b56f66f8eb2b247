"""Optimizer factory.

Capability parity: reference ``src/cli/train.py:183-197`` — the six
selectable optimizers {adagrad, adam, sgd, rmsprop (default), adadelta,
adamax}, built on optax.
"""

from __future__ import annotations

import optax

OPT_TYPES = ('adagrad', 'adam', 'sgd', 'rmsprop', 'adadelta', 'adamax')


def make_optimizer(opt_type: str, learning_rate: float) -> optax.GradientTransformation:
    if opt_type == 'adagrad':
        return optax.adagrad(learning_rate)
    if opt_type == 'adam':
        return optax.adam(learning_rate)
    if opt_type == 'sgd':
        return optax.sgd(learning_rate)
    if opt_type == 'rmsprop':
        return optax.rmsprop(learning_rate)
    if opt_type == 'adadelta':
        return optax.adadelta(learning_rate)
    if opt_type == 'adamax':
        return optax.adamax(learning_rate)
    raise ValueError(f'unknown optimizer {opt_type!r}; expected one of {OPT_TYPES}')
