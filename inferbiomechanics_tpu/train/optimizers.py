"""Optimizer factory.

Capability parity: reference ``src/cli/train.py:183-197`` — the six
selectable optimizers {adagrad, adam, sgd, rmsprop (default), adadelta,
adamax}, built on optax. Beyond parity: optional learning-rate schedules
(the reference trains at a fixed LR only).
"""

from __future__ import annotations

from typing import Optional, Union

import optax

OPT_TYPES = ('adagrad', 'adam', 'sgd', 'rmsprop', 'adadelta', 'adamax')
LR_SCHEDULES = ('constant', 'cosine', 'warmup_cosine', 'linear')


def make_lr_schedule(schedule: str, learning_rate: float,
                     decay_steps: int = 0, warmup_steps: int = 0
                     ) -> Union[float, optax.Schedule]:
    """LR schedule factory; 'constant' returns the plain float (so the
    optimizer state and checkpoints stay identical to the parity path)."""
    if schedule == 'constant':
        return learning_rate
    if decay_steps <= 0:
        raise ValueError(f'--lr-schedule {schedule} requires '
                         f'--lr-decay-steps > 0 (total steps to decay over)')
    if schedule == 'cosine':
        return optax.cosine_decay_schedule(learning_rate, decay_steps)
    if schedule == 'warmup_cosine':
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps=max(1, warmup_steps),
            decay_steps=decay_steps)
    if schedule == 'linear':
        return optax.linear_schedule(learning_rate, 0.0, decay_steps)
    raise ValueError(f'unknown lr schedule {schedule!r}; expected one of '
                     f'{LR_SCHEDULES}')


def make_optimizer(opt_type: str,
                   learning_rate: Union[float, optax.Schedule],
                   lr_schedule: str = 'constant',
                   lr_decay_steps: int = 0,
                   lr_warmup_steps: int = 0) -> optax.GradientTransformation:
    if isinstance(learning_rate, float):
        learning_rate = make_lr_schedule(lr_schedule, learning_rate,
                                         lr_decay_steps, lr_warmup_steps)
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
