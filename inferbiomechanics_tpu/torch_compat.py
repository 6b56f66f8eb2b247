"""Convert reference PyTorch checkpoints into this framework's format.

The reference saves ``torch.save({'epoch', 'model_state_dict',
'optimizer_state_dict'})`` as ``epoch_{e}_batch_{b}.pt``
(``/root/reference/src/cli/train.py:270-278``); this framework saves a
flax-msgpack ``TrainState`` under the same naming scheme
(``train/checkpoint.py``). A reference user migrating mid-project can
convert trained weights instead of retraining.

Feedforward (FeedForwardRegressionBaseline.py) and GroundLink
(Groundlink.py) checkpoints are supported — the two trainable reference
models. Representation differences handled for the feedforward MLP:

- torch ``nn.Linear`` stores ``weight [out, in]``; flax ``nn.Dense``
  stores ``kernel [in, out]`` → transpose.
- the reference's output head is GROUPED BY COMPONENT across frames
  (``x[:, 0:6F] -> CoPs [B, F, 6]``, forces ``[6F:12F]``, ...,
  FeedForwardRegressionBaseline.py:116-120) while this framework's head
  is frame-major (``[B, F, 30]`` per-frame
  ``[CoPs 6 | forces 6 | torques 6 | wrenches 12]``,
  models/common.py::slice_output_heads) → the final layer's output
  columns are permuted. The input layouts match exactly
  (INPUT_CONCAT_ORDER mirrors the reference's concat,
  FeedForwardRegressionBaseline.py:97-108), so all other layers map
  1:1.

torch is only needed to *read* the pickle; it is an optional dependency
gated at call time.

The REVERSE direction (``export_*``, ``convert-checkpoint --to-torch``)
writes this framework's checkpoints back out as reference-format ``.pt``
blobs loadable by the reference's own loader
(abstract_command.py:86-120) — migration is two-way.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Tuple

import numpy as np

# reference head blocks: (flat-vector start multiplier, per-frame width)
# x[:, start*F : (start+width)*F].reshape(B, F, width)
_REF_HEAD_BLOCKS: List[Tuple[int, int]] = [
    (0, 6),     # groundContactCenterOfPressureInRootFrame
    (6, 6),     # groundContactForceInRootFrame
    (12, 6),    # groundContactTorqueInRootFrame
    (18, 12),   # groundContactWrenchesInRootFrame
]
_PER_FRAME = 30     # 2 contact bodies x (3*3 + 6)


def output_permutation(num_output_frames: int) -> np.ndarray:
    """``perm`` with ``ours_flat[o] = ref_flat[perm[o]]``.

    ref:  block b starts at ``start_b * F``; within it index ``f*w_b + c``.
    ours: frame-major, ``f * 30 + start_b + c``.
    """
    F = num_output_frames
    perm = np.empty(_PER_FRAME * F, np.int64)
    for start, width in _REF_HEAD_BLOCKS:
        for f in range(F):
            for c in range(width):
                perm[f * _PER_FRAME + start + c] = start * F + f * width + c
    return perm


def _strip_ddp(sd: Dict[str, 'np.ndarray']) -> Dict[str, np.ndarray]:
    return {re.sub(r'^module\.', '', k): v for k, v in sd.items()}


def convert_state_dict(state_dict: Dict, num_output_frames: int
                       ) -> Dict[str, Dict[str, np.ndarray]]:
    """Reference ``net.{i}.weight/bias`` Linears -> flax ``Dense_{j}``
    params (transposed kernels, head-permuted final layer)."""
    sd = _strip_ddp({k: np.asarray(v) for k, v in state_dict.items()})
    blocked = [k for k, v in sd.items()
               if '.running_mean' in k or '.running_var' in k]
    if blocked:
        raise ValueError(
            f'checkpoint carries BatchNorm state ({blocked[:2]}...); '
            'batchnorm checkpoints are not convertible — retrain with '
            '--batchnorm here')
    # Linear layers: 2-D weights, ordered by their Sequential position
    lin = sorted(
        (int(m.group(1)) for k, v in sd.items()
         if (m := re.match(r'net\.(\d+)\.weight$', k)) and v.ndim == 2),
    )
    if not lin:
        raise ValueError('no net.{i}.weight Linear layers found — is this '
                         'a reference FeedForwardBaseline checkpoint?')
    params: Dict[str, Dict[str, np.ndarray]] = {}
    perm = output_permutation(num_output_frames)
    for j, i in enumerate(lin):
        w = sd[f'net.{i}.weight'].astype(np.float32).T     # [in, out]
        b = sd[f'net.{i}.bias'].astype(np.float32)
        if j == len(lin) - 1:
            if w.shape[1] != perm.size:
                raise ValueError(
                    f'final layer emits {w.shape[1]} outputs, expected '
                    f'{perm.size} (= 30 x {num_output_frames} output '
                    f'frames / 2 contact bodies)')
            w = w[:, perm]
            b = b[perm]
        params[f'Dense_{j}'] = {'kernel': w, 'bias': b}
    return params


def convert_groundlink_state_dict(state_dict: Dict
                                  ) -> Dict[str, Dict[str, np.ndarray]]:
    """Reference GroundLink ``cnn.{i}``/``fc.{i}`` -> flax ``Conv_{j}``/
    ``Dense_{j}`` params.

    torch ``Conv1d`` weight is ``[C_out, C_in, k]``; flax ``nn.Conv``
    kernel is ``[k, C_in, C_out]`` (both are cross-correlation — no
    kernel flip). The output head needs NO permutation: the reference
    slices GroundLink outputs frame-major (Groundlink.py:151-156),
    exactly this framework's ``slice_output_heads`` layout.
    """
    sd = _strip_ddp({k: np.asarray(v) for k, v in state_dict.items()})
    convs = sorted(int(m.group(1)) for k, v in sd.items()
                   if (m := re.match(r'cnn\.(\d+)\.weight$', k)))
    fcs = sorted(int(m.group(1)) for k, v in sd.items()
                 if (m := re.match(r'fc\.(\d+)\.weight$', k)))
    if not convs or not fcs:
        raise ValueError('no cnn.{i}/fc.{i} layers found — is this a '
                         'reference Groundlink checkpoint?')
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for j, i in enumerate(convs):
        params[f'Conv_{j}'] = {
            'kernel': sd[f'cnn.{i}.weight'].astype(np.float32)
                      .transpose(2, 1, 0),
            'bias': sd[f'cnn.{i}.bias'].astype(np.float32)}
    for j, i in enumerate(fcs):
        p = {'kernel': sd[f'fc.{i}.weight'].astype(np.float32).T}
        if f'fc.{i}.bias' in sd:
            p['bias'] = sd[f'fc.{i}.bias'].astype(np.float32)
        params[f'Dense_{j}'] = p
    return params


def convert_torch_checkpoint(pt_path: str, out_dir: str,
                             opt_type: str = 'rmsprop',
                             learning_rate: float = 1e-4) -> str:
    """Convert one reference ``.pt`` into ``out_dir`` with the same
    epoch/batch name; returns the written path. Optimizer state is NOT
    converted (torch and optax layouts differ) — a fresh ``opt_type``
    state is initialized, matching a warm restart."""
    import torch

    from inferbiomechanics_tpu.train.checkpoint import save_checkpoint
    from inferbiomechanics_tpu.train.optimizers import make_optimizer
    from inferbiomechanics_tpu.train.state import TrainState

    base = os.path.basename(pt_path)
    m = re.search(r'epoch_(\d+)_batch_(\d+)\.pt$', base)
    if m:
        epoch, batch = int(m.group(1)), int(m.group(2))
        filename = None                     # standard epoch_{e}_batch_{b}
    else:
        # keep the stem (best.pt -> best.ckpt): mapping every non-standard
        # name to epoch_0_batch_0 would silently overwrite earlier
        # conversions in the same --out-dir
        epoch, batch = -1, 0
        filename = os.path.splitext(base)[0] + '.ckpt'
    blob = torch.load(pt_path, map_location='cpu', weights_only=True)
    sd = blob.get('model_state_dict', blob)
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    stripped = _strip_ddp(sd)
    sidecar_fields = {}
    if any(k.startswith('cnn.') for k in stripped):
        params = convert_groundlink_state_dict(sd)
        sidecar_fields['model_type'] = 'groundlink'
    else:
        # output frames from the final Linear width (2 contact bodies)
        widths = [v.shape[0] for k, v in stripped.items()
                  if re.match(r'net\.\d+\.weight$', k) and v.ndim == 2]
        num_output_frames = widths[-1] // _PER_FRAME if widths else 1
        params = convert_state_dict(sd, num_output_frames)
        sidecar_fields['model_type'] = 'feedforward'
        sidecar_fields['hidden_dims'] = [int(w) for w in widths[:-1]]
        sidecar_fields['batchnorm'] = any('running_mean' in k
                                          for k in stripped)
        if num_output_frames > 1:
            # width 1 is ambiguous (last_frame, or all_frames with
            # window == stride) — only record the unambiguous case
            sidecar_fields['output_data_format'] = 'all_frames'

    import jax.numpy as jnp
    tx = make_optimizer(opt_type, learning_rate)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       opt_state=tx.init(params), batch_stats={},
                       tx=tx, apply_fn=None)
    out = save_checkpoint(out_dir, state, epoch, batch, filename=filename)
    # partial provenance: the architecture a torch state dict reveals
    # (train/run_config.py; consumers ignore fields not recorded)
    from inferbiomechanics_tpu.train.run_config import (
        save_partial_run_config,
    )
    save_partial_run_config(out_dir, sidecar_fields)
    return out


# -----------------------------------------------------------------------------
# Reverse direction: this framework's checkpoints -> reference .pt
# -----------------------------------------------------------------------------


def _linear_index(j: int, dropout: bool, batchnorm: bool) -> int:
    """Sequential index of the j-th Linear in the reference feedforward
    ``net`` (FeedForwardRegressionBaseline.py:65-77: per layer
    ``[Dropout?][BatchNorm?] Linear [act if not last]``)."""
    block = int(dropout) + int(batchnorm) + 2   # every preceding block has an act
    return j * block + int(dropout) + int(batchnorm)


def export_state_dict(params: Dict[str, Dict[str, np.ndarray]],
                      num_output_frames: int,
                      dropout: bool = False,
                      batchnorm: bool = False) -> Dict[str, np.ndarray]:
    """Flax feedforward params -> reference ``net.{i}.weight/bias`` state
    dict (the exact inverse of :func:`convert_state_dict`): kernels
    transposed back to ``[out, in]`` and the final layer's outputs
    permuted back from frame-major to the reference's component-grouped
    head (FeedForwardRegressionBaseline.py:116-120)."""
    if batchnorm:
        raise ValueError('batchnorm models are not exportable (flax '
                         'batch_stats have no torch-BatchNorm layout here)')
    dense = sorted((int(m.group(1)) for k in params
                    if (m := re.match(r'Dense_(\d+)$', k))))
    if not dense or dense != list(range(len(dense))):
        raise ValueError(f'expected Dense_0..Dense_n params, got '
                         f'{sorted(params)} — is this a feedforward '
                         f'checkpoint?')
    perm = output_permutation(num_output_frames)
    inv = np.argsort(perm)                       # ref_flat[r] = ours_flat[inv[r]]
    sd: Dict[str, np.ndarray] = {}
    for j in dense:
        w = np.asarray(params[f'Dense_{j}']['kernel'], np.float32)  # [in, out]
        b = np.asarray(params[f'Dense_{j}']['bias'], np.float32)
        if j == dense[-1]:
            if w.shape[1] != inv.size:
                raise ValueError(
                    f'final layer emits {w.shape[1]} outputs, expected '
                    f'{inv.size} (= 30 x {num_output_frames} output frames '
                    f'/ 2 contact bodies)')
            w = w[:, inv]
            b = b[inv]
        i = _linear_index(j, dropout, batchnorm)
        sd[f'net.{i}.weight'] = w.T.copy()       # [out, in]
        sd[f'net.{i}.bias'] = b.copy()
    return sd


def export_groundlink_state_dict(params: Dict[str, Dict[str, np.ndarray]]
                                 ) -> Dict[str, np.ndarray]:
    """Flax GroundLink params -> reference ``cnn.{i}``/``fc.{i}`` state
    dict (inverse of :func:`convert_groundlink_state_dict`). Reference
    Sequential indices (Groundlink.py:41-62): cnn blocks are
    ``[Dropout, Conv1d, ELU]`` (Conv at 3j+1); fc is ``[Transpose] +
    (depth-1) x [Dropout, Linear, ELU] + [Dropout, Linear(bias=False)]``
    (Linear at 3j+2, the last one biasless)."""
    convs = sorted((int(m.group(1)) for k in params
                    if (m := re.match(r'Conv_(\d+)$', k))))
    denses = sorted((int(m.group(1)) for k in params
                     if (m := re.match(r'Dense_(\d+)$', k))))
    if not convs or not denses:
        raise ValueError(f'expected Conv_*/Dense_* params, got '
                         f'{sorted(params)} — is this a GroundLink '
                         f'checkpoint?')
    sd: Dict[str, np.ndarray] = {}
    for j in convs:
        sd[f'cnn.{3 * j + 1}.weight'] = np.asarray(
            params[f'Conv_{j}']['kernel'],
            np.float32).transpose(2, 1, 0).copy()     # [C_out, C_in, k]
        sd[f'cnn.{3 * j + 1}.bias'] = np.asarray(
            params[f'Conv_{j}']['bias'], np.float32).copy()
    for j in denses:
        p = params[f'Dense_{j}']
        sd[f'fc.{3 * j + 2}.weight'] = np.asarray(
            p['kernel'], np.float32).T.copy()
        if 'bias' in p:
            sd[f'fc.{3 * j + 2}.bias'] = np.asarray(p['bias'],
                                                    np.float32).copy()
    return sd


def export_torch_checkpoint(ckpt_path: str, out_dir: str,
                            dropout: bool = False,
                            batchnorm: bool = False) -> str:
    """Convert one of this framework's ``.ckpt`` files back into a
    reference-format ``torch.save`` blob (``{'epoch',
    'model_state_dict'}``, bare — non-DDP — key names, loadable by the
    reference's ``load_latest_checkpoint``/``analyze`` path,
    abstract_command.py:86-120). Optimizer state is not exported (optax
    and torch layouts differ). The model family is detected from the
    parameter tree; returns the written path."""
    import torch
    from flax import serialization

    with open(ckpt_path, 'rb') as f:
        raw = serialization.msgpack_restore(f.read())
    params = raw['params']
    epoch = int(raw.get('epoch', 0))
    batch = int(raw.get('batch', 0))
    if raw.get('batch_stats'):
        raise ValueError('batchnorm checkpoints are not exportable')
    if any(re.match(r'Conv_\d+$', k) for k in params):
        sd = export_groundlink_state_dict(params)
    elif any(re.match(r'Dense_\d+$', k) for k in params):
        last = max(int(m.group(1)) for k in params
                   if (m := re.match(r'Dense_(\d+)$', k)))
        out_width = np.asarray(params[f'Dense_{last}']['kernel']).shape[1]
        if out_width % _PER_FRAME:
            raise ValueError(f'final layer width {out_width} is not a '
                             f'multiple of {_PER_FRAME} — not a 2-contact-'
                             f'body feedforward head')
        sd = export_state_dict(params, out_width // _PER_FRAME,
                               dropout=dropout, batchnorm=batchnorm)
    else:
        raise ValueError(f'unrecognized parameter tree ({sorted(params)[:4]}'
                         f'...): only feedforward and GroundLink export '
                         f'to the reference format')
    base = os.path.basename(ckpt_path)
    m = re.search(r'epoch_(\d+)_batch_(\d+)\.ckpt$', base)
    if m:
        epoch, batch = int(m.group(1)), int(m.group(2))
    # name from the SOURCE stem (best.ckpt -> best.pt), mirroring the
    # forward converter: recorded-epoch naming would silently collapse
    # best.ckpt onto its sibling epoch_{e}_batch_{b} conversion
    name = os.path.splitext(base)[0] + '.pt'
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, name)
    if os.path.exists(out):
        # same-named sources from different dirs (e.g. two sweep configs'
        # epoch_4_batch_0.ckpt): disambiguate with the parent dir name
        # instead of silently overwriting the earlier export
        parent = os.path.basename(os.path.dirname(os.path.abspath(ckpt_path)))
        out = os.path.join(out_dir,
                           f'{parent}_{name}' if parent else f'dup_{name}')
        if os.path.exists(out):
            raise ValueError(f'output {out} already exists — exports from '
                             f'{ckpt_path} would overwrite it')
    torch.save({'epoch': max(epoch, 0),
                'model_state_dict': {k: torch.from_numpy(np.ascontiguousarray(v))
                                     for k, v in sd.items()}}, out)
    return out
