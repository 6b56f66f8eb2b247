"""Checkpoint save / restore with reference filename parity.

Capability parity: reference ``src/cli/abstract_command.py:86-120`` +
``train.py:266-278`` — checkpoints named ``epoch_{e}_batch_{b}.*``, the
loader lists the checkpoint dir, sorts numerically by (epoch, batch),
and restores model + optimizer state; returns ``(-1, 0)`` when none
exist. Serialization is flax msgpack (whole TrainState pytree) instead
of torch.save.

On a multi-host mesh only process 0 writes (the reference's rank-0-only
checkpointing, train.py:270-278); state is fully replicated on the data
axis so any process holds the complete pytree.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

from inferbiomechanics_tpu.train.state import TrainState

_CKPT_RE = re.compile(r'epoch_(\d+)_batch_(\d+)\.(?:ckpt|msgpack|pt)$')


def checkpoint_name(epoch: int, batch: int) -> str:
    return f'epoch_{epoch}_batch_{batch}.ckpt'


def _snapshot_payload(state: TrainState, epoch: int, batch: int,
                      ema_params=None) -> dict:
    """Device→host snapshot of everything a checkpoint stores.

    Starts non-blocking transfers for every leaf first so a multi-array
    state comes down in parallel, then blocks until all data is on host.
    After this returns the caller may donate/overwrite the device
    buffers (the next train step does) — the payload is pure numpy."""
    for leaf in jax.tree_util.tree_leaves((state, ema_params)):
        if isinstance(leaf, jax.Array):
            try:
                leaf.copy_to_host_async()
            except Exception:   # pragma: no cover - backend-dependent
                pass
    host_state = jax.device_get(state)
    payload = {
        'step': host_state.step,
        'params': host_state.params,
        'opt_state': host_state.opt_state,
        'batch_stats': host_state.batch_stats,
        'epoch': np.asarray(epoch, np.int64),
        'batch': np.asarray(batch, np.int64),
    }
    if ema_params is not None:
        payload['ema_params'] = jax.device_get(ema_params)
    return payload


def _write_payload(checkpoint_dir: str, payload: dict, path: str) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    blob = serialization.to_bytes(payload)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint
    return path


def save_checkpoint(checkpoint_dir: str, state: TrainState,
                    epoch: int, batch: int,
                    filename: Optional[str] = None,
                    ema_params=None) -> Optional[str]:
    """Serialize the full train state. No-op on non-zero processes.

    ``filename`` overrides the ``epoch_{e}_batch_{b}.ckpt`` name — used
    for ``best.ckpt``, which resume's latest-checkpoint scan deliberately
    ignores (it is a model artifact, not a resume point).

    ``ema_params``: optional exponential-moving-average parameter tree
    (diffusion ``--ema-decay``); stored under its own key so checkpoints
    without one stay byte-compatible."""
    if jax.process_index() != 0:
        return None
    path = os.path.join(checkpoint_dir,
                        filename or checkpoint_name(epoch, batch))
    payload = _snapshot_payload(state, epoch, batch, ema_params)
    return _write_payload(checkpoint_dir, payload, path)


class AsyncCheckpointer:
    """Checkpoint writes that overlap training (``--async-checkpoint``).

    The reference blocks its train loop for every ``torch.save``
    (train.py:270-278). Here only the device→host snapshot runs on the
    caller thread (it must: the loop donates the state buffers to the
    next step, so the copy has to finish before training resumes);
    serialization + the atomic file write — the dominant cost for
    multi-MB states on a parallel filesystem — run on a background
    thread. One write is in flight at a time: a new ``save`` first joins
    the previous one, so checkpoints land in order and a crash loses at
    most the newest. ``wait()`` drains the queue (call before process
    exit); a failed background write re-raises there, not silently.

    Pruning (``--keep-checkpoints``) runs on the worker AFTER its write
    commits, keeping the "newest N on disk" invariant race-free.
    """

    def __init__(self):
        import threading
        self._threading = threading
        self._thread = None
        self._exc = None
        self.last_path = None

    def save(self, checkpoint_dir: str, state: TrainState,
             epoch: int, batch: int, filename: Optional[str] = None,
             ema_params=None, prune_keep: int = 0) -> None:
        if jax.process_index() != 0:
            return
        self.wait()   # serialize commits; surfaces a prior write's error
        path = os.path.join(checkpoint_dir,
                            filename or checkpoint_name(epoch, batch))
        payload = _snapshot_payload(state, epoch, batch, ema_params)

        def work():
            try:
                self.last_path = _write_payload(checkpoint_dir, payload, path)
                if prune_keep:
                    prune_checkpoints(checkpoint_dir, prune_keep)
            except BaseException as e:   # surfaced by the next wait()
                self._exc = e

        self._thread = self._threading.Thread(
            target=work, name='ib-async-ckpt', daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight write (if any) commits; re-raise its
        error here if it failed."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


def list_checkpoints(checkpoint_dir: str):
    """All checkpoints in dir as sorted [(epoch, batch, path)]."""
    if not os.path.isdir(checkpoint_dir):
        return []
    out = []
    for f in os.listdir(checkpoint_dir):
        m = _CKPT_RE.match(f)
        if m:
            out.append((int(m.group(1)), int(m.group(2)),
                        os.path.join(checkpoint_dir, f)))
    out.sort()
    return out


def load_latest_checkpoint(state: TrainState,
                           checkpoint_dir: str) -> Tuple[TrainState, int, int]:
    """Restore the newest checkpoint into ``state``.

    Returns ``(state, epoch, batch)``; ``(state, -1, 0)`` if none exist —
    matching the reference's sentinel (abstract_command.py:118-120).
    """
    ckpts = list_checkpoints(checkpoint_dir)
    if not ckpts:
        return state, -1, 0
    return load_checkpoint_file(state, ckpts[-1][2])


def load_checkpoint_file(state: TrainState,
                         path: str) -> Tuple[TrainState, int, int]:
    """Restore one specific checkpoint file (e.g. ``best.ckpt``, which the
    latest-checkpoint scan deliberately ignores)."""
    with open(path, 'rb') as f:
        blob = f.read()
    raw = serialization.msgpack_restore(blob)
    # prefer the recorded epoch/batch (best.ckpt's name carries neither)
    epoch = int(raw.get('epoch', -1))
    batch = int(raw.get('batch', 0))
    try:
        params = serialization.from_state_dict(jax.device_get(state.params),
                                               raw['params'])
    except (ValueError, KeyError) as e:
        raise ValueError(
            f'checkpoint {path}: parameter tree does not match the model '
            f'being built — most commonly a transformer checkpoint written '
            f'with a different --attn-impl (the default changed to "vpu"; '
            f'pass --attn-impl flax for round-1 checkpoints) or different '
            f'--hidden-dims/--d-model/--num-layers. Original error: {e}'
        ) from e
    batch_stats = serialization.from_state_dict(
        jax.device_get(state.batch_stats), raw.get('batch_stats', {}))
    state = state.replace(step=np.asarray(raw['step']), params=params,
                          batch_stats=batch_stats)
    # optimizer state only restores when the optimizer matches the one the
    # checkpoint was written with; eval paths built with a different
    # --opt-type keep a fresh opt_state (params are what matter there)
    try:
        opt_state = serialization.from_state_dict(
            jax.device_get(state.opt_state), raw['opt_state'])
        state = state.replace(opt_state=opt_state)
    except (ValueError, KeyError) as e:
        import logging
        logging.getLogger(__name__).warning(
            'checkpoint %s: optimizer state not restored (%s); '
            'parameters restored, optimizer starts fresh', path, e)
    return state, epoch, batch


def warm_start_from(state: TrainState, path: str) -> TrainState:
    """Transfer-learning init (``--init-from-checkpoint``): copy ONLY the
    parameters (and batch stats) of ``path`` into ``state``, keeping the
    fresh optimizer state and step counter — a warm start, not a resume.
    The architecture must match (same check/diagnosis as resume); use
    ``convert-checkpoint`` first for reference ``.pt`` sources. Beyond
    parity: the reference can only resume whole runs in place
    (abstract_command.py:86-120)."""
    loaded, _epoch, _batch = load_checkpoint_file(state, path)
    return state.replace(params=loaded.params,
                         batch_stats=loaded.batch_stats)


def load_ema_params(path: str, like_params):
    """Return the checkpoint's EMA parameter tree (``--ema-decay``
    training), structured like ``like_params``; ``None`` when the
    checkpoint carries no EMA."""
    with open(path, 'rb') as f:
        raw = serialization.msgpack_restore(f.read())
    if 'ema_params' not in raw:
        return None
    return serialization.from_state_dict(jax.device_get(like_params),
                                         raw['ema_params'])


def resolve_checkpoint_path(checkpoint_dir: str) -> Optional[str]:
    """Path of the newest epoch_* checkpoint, or None."""
    ckpts = list_checkpoints(checkpoint_dir)
    return ckpts[-1][2] if ckpts else None


def require_ema_params(checkpoint_path: Optional[str], like_params):
    """The EMA tree of ``checkpoint_path`` (a file path, from
    ``resolve_checkpoint_path`` or a --checkpoint-file); raises ValueError
    with the canonical --use-ema guidance when the checkpoint is missing
    or carries none."""
    ema = (load_ema_params(checkpoint_path, like_params)
           if checkpoint_path else None)
    if ema is None:
        raise ValueError(f'--use-ema: checkpoint {checkpoint_path} carries '
                         f'no ema_params (train with --ema-decay)')
    return ema


def soup_checkpoints(paths, out_path: str) -> str:
    """Uniform parameter average of same-architecture checkpoints — a
    "model soup": one merged checkpoint that serves at single-model cost
    (vs `serve --ensemble`, which keeps K models and averages
    predictions). Opt-state/step are taken from the newest member (the
    soup is an eval/serving artifact; resuming training from it is a
    warm restart). Raises when the parameter trees disagree in structure
    or shape."""
    if len(paths) < 2:
        raise ValueError('soup needs at least 2 checkpoints')
    raws = []
    for p in paths:
        with open(p, 'rb') as f:
            raws.append(serialization.msgpack_restore(f.read()))
    trees = [r['params'] for r in raws]
    flat0, td0 = jax.tree_util.tree_flatten(trees[0])
    for p, t in zip(paths[1:], trees[1:]):
        flat, td = jax.tree_util.tree_flatten(t)
        if td != td0:
            raise ValueError(f'{p}: parameter tree structure differs from '
                             f'{paths[0]} — not the same architecture')
        for a, b in zip(flat0, flat):
            if np.asarray(a).shape != np.asarray(b).shape:
                raise ValueError(f'{p}: shape mismatch '
                                 f'{np.asarray(b).shape} vs '
                                 f'{np.asarray(a).shape}')
    n = len(trees)
    avg = jax.tree_util.tree_map(
        lambda *xs: (np.sum([np.asarray(x, np.float64) for x in xs], axis=0)
                     / n).astype(np.asarray(xs[0]).dtype), *trees)
    newest = max(range(n), key=lambda i: (int(raws[i].get('epoch', -1)),
                                          int(raws[i].get('batch', 0))))
    out = dict(raws[newest])
    out['params'] = avg
    blob = serialization.to_bytes(out)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tmp = out_path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(blob)
    os.replace(tmp, out_path)
    return out_path


def prune_checkpoints(checkpoint_dir: str, keep: int):
    """Delete all but the newest ``keep`` epoch_* checkpoints (rank-0
    only). Named artifacts (best.ckpt) are never touched — they are not
    resume points and the latest-checkpoint scan ignores them anyway.
    Returns the removed paths."""
    if keep <= 0 or jax.process_index() != 0:
        return []
    removed = []
    for _e, _b, path in list_checkpoints(checkpoint_dir)[:-keep]:
        os.remove(path)
        removed.append(path)
    return removed
