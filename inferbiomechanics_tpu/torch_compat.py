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
    if any(k.startswith('cnn.') for k in stripped):
        params = convert_groundlink_state_dict(sd)
    else:
        # output frames from the final Linear width (2 contact bodies)
        widths = [v.shape[0] for k, v in stripped.items()
                  if re.match(r'net\.\d+\.weight$', k) and v.ndim == 2]
        num_output_frames = widths[-1] // _PER_FRAME if widths else 1
        params = convert_state_dict(sd, num_output_frames)

    import jax.numpy as jnp
    tx = make_optimizer(opt_type, learning_rate)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       opt_state=tx.init(params), batch_stats={},
                       tx=tx, apply_fn=None)
    return save_checkpoint(out_dir, state, epoch, batch, filename=filename)
