"""Optimizer factory.

Capability parity: reference ``src/cli/train.py:183-197`` — the six
selectable optimizers {adagrad, adam, sgd, rmsprop (default), adadelta,
adamax}, built on optax. Beyond parity: 'adamw' (decoupled weight
decay), optional learning-rate schedules, and global-norm gradient
clipping (the reference trains at a fixed LR with none of these).

Every factory keeps the update LINEAR in the learning rate with lr
absent from the optimizer state — the sweep's exact-lr precondition
(train/sweep.py module docstring; test_lr_scaling_exact covers all
types including adamw and clipping).
"""

from __future__ import annotations

from typing import Optional, Union

import optax

OPT_TYPES = ('adagrad', 'adam', 'sgd', 'rmsprop', 'adadelta', 'adamax',
             'adamw')
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
                   lr_warmup_steps: int = 0,
                   weight_decay: float = 1e-4,
                   grad_clip_norm: float = 0.0) -> optax.GradientTransformation:
    """``weight_decay`` applies to 'adamw' only; ``grad_clip_norm > 0``
    prepends global-norm clipping (clip-then-update, the standard
    composition)."""
    if isinstance(learning_rate, float):
        learning_rate = make_lr_schedule(lr_schedule, learning_rate,
                                         lr_decay_steps, lr_warmup_steps)
    if opt_type == 'adagrad':
        tx = optax.adagrad(learning_rate)
    elif opt_type == 'adam':
        tx = optax.adam(learning_rate)
    elif opt_type == 'sgd':
        tx = optax.sgd(learning_rate)
    elif opt_type == 'rmsprop':
        # Match torch.optim.RMSprop's shipped semantics (the reference's
        # default optimizer, train.py:189-190): alpha=0.99 and eps added
        # OUTSIDE the sqrt. optax's own defaults (decay=0.9, eps in sqrt)
        # measurably change convergence — the round-4 parity study
        # (PARITY_RMSE.md) attributed a 25% dev COM-acc error gap
        # entirely to the decay difference.
        tx = optax.rmsprop(learning_rate, decay=0.99, eps=1e-8,
                           eps_in_sqrt=False)
    elif opt_type == 'adadelta':
        tx = optax.adadelta(learning_rate)
    elif opt_type == 'adamax':
        tx = optax.adamax(learning_rate)
    elif opt_type == 'adamw':
        tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    else:
        raise ValueError(f'unknown optimizer {opt_type!r}; expected one of '
                         f'{OPT_TYPES}')
    if grad_clip_norm and grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx


def wrap_freeze(tx: optax.GradientTransformation,
                patterns) -> optax.GradientTransformation:
    """Freeze parameter subtrees for transfer learning
    (``--freeze-params``, beyond parity — the reference always trains
    every weight): updates for any parameter whose ``/``-joined path
    matches one of the ``patterns`` regexes are zeroed AFTER the inner
    optimizer runs, so frozen leaves stay bitwise at their (typically
    ``--init-from-checkpoint``-loaded) values on every data tier.

    A pattern that matches no parameter raises at ``tx.init`` with the
    available paths — typo protection.
    """
    import re

    pats = [re.compile(p) for p in patterns]

    def freeze_mask(tree):
        from flax import traverse_util
        flat = traverse_util.flatten_dict(tree, sep='/')
        unmatched = [p.pattern for p in pats
                     if not any(p.search(k) for k in flat)]
        if unmatched:
            raise ValueError(
                f'--freeze-params pattern(s) {unmatched} match no '
                f'parameter; available paths: {sorted(flat)}')
        mask = {k: any(p.search(k) for p in pats) for k in flat}
        return traverse_util.unflatten_dict(
            {tuple(k.split('/')): v for k, v in mask.items()})

    return optax.chain(tx, optax.masked(optax.set_to_zero(), freeze_mask))
