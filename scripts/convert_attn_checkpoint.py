"""Convert transformer/diffusion checkpoints between attention impls.

``attn_impl='flax'`` (nn.MultiHeadDotProductAttention) and ``'vpu'``
(ShortWindowAttention) are numerically equivalent parameterizations of
the same layer, but their parameter trees differ:

    flax:  EncoderBlock_i/MultiHeadDotProductAttention_0/{query,key,value}
           /kernel [d, H, dh] (+bias [H, dh]), /out/kernel [H, dh, d]
    vpu:   EncoderBlock_i/ShortWindowAttention_0/qkv/kernel [d, 3d]
           (q|k|v blocks, each ordered (H, dh)), /proj/kernel [d, d]

This converts a checkpoint written with one impl into the other so e.g.
round-1 flax checkpoints can train/serve on the (3x faster) vpu path:

    python scripts/convert_attn_checkpoint.py IN.ckpt OUT.ckpt --to vpu
"""

from __future__ import annotations

import argparse

import numpy as np


def flax_attn_to_vpu(blk: dict) -> dict:
    """Replace MultiHeadDotProductAttention_0 with ShortWindowAttention_0."""
    mha = blk.pop('MultiHeadDotProductAttention_0')
    q, k, v, out = (mha[n] for n in ('query', 'key', 'value', 'out'))
    d = q['kernel'].shape[0]

    def fold(p):   # [d, H, dh] -> [d, d]
        return np.asarray(p['kernel']).reshape(d, d)

    qkv_kernel = np.concatenate([fold(q), fold(k), fold(v)], axis=1)
    qkv_bias = np.concatenate([np.asarray(p['bias']).reshape(d)
                               for p in (q, k, v)])
    blk['ShortWindowAttention_0'] = {
        'qkv': {'kernel': qkv_kernel, 'bias': qkv_bias},
        'proj': {'kernel': np.asarray(out['kernel']).reshape(d, d),
                 'bias': np.asarray(out['bias'])},
    }
    return blk


def vpu_attn_to_flax(blk: dict, num_heads: int) -> dict:
    swa = blk.pop('ShortWindowAttention_0')
    kern = np.asarray(swa['qkv']['kernel'])
    bias = np.asarray(swa['qkv']['bias'])
    d = kern.shape[0]
    dh = d // num_heads

    def unfold(mat, b):   # [d, d] -> {kernel [d,H,dh], bias [H,dh]}
        return {'kernel': mat.reshape(d, num_heads, dh),
                'bias': b.reshape(num_heads, dh)}

    blk['MultiHeadDotProductAttention_0'] = {
        'query': unfold(kern[:, :d], bias[:d]),
        'key': unfold(kern[:, d:2 * d], bias[d:2 * d]),
        'value': unfold(kern[:, 2 * d:], bias[2 * d:]),
        'out': {'kernel': np.asarray(swa['proj']['kernel']).reshape(
                    num_heads, dh, d),
                'bias': np.asarray(swa['proj']['bias'])},
    }
    return blk


def convert_params(params: dict, to: str, num_heads: int,
                   _converted=None) -> dict:
    """Convert every EncoderBlock_* in a checkpoint parameter tree.
    `_converted`, if given, is a list receiving the converted block names."""
    out = dict(params)
    for key, blk in params.items():
        if not key.startswith('EncoderBlock_'):
            continue
        blk = dict(blk)
        if to == 'vpu' and 'MultiHeadDotProductAttention_0' in blk:
            out[key] = flax_attn_to_vpu(blk)
        elif to == 'flax' and 'ShortWindowAttention_0' in blk:
            d = np.asarray(blk['ShortWindowAttention_0']['qkv']['kernel']).shape[0]
            if d % num_heads != 0:
                raise SystemExit(
                    f'{key}: d_model {d} not divisible by --num-heads '
                    f'{num_heads}')
            out[key] = vpu_attn_to_flax(blk, num_heads)
        else:
            continue
        if _converted is not None:
            _converted.append(key)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('input')
    ap.add_argument('output')
    ap.add_argument('--to', choices=['vpu', 'flax'], required=True)
    ap.add_argument('--num-heads', type=int, default=8,
                    help='needed for --to flax (dh = d_model / num_heads)')
    args = ap.parse_args()

    from flax import serialization
    with open(args.input, 'rb') as f:
        raw = serialization.msgpack_restore(f.read())
    converted = []
    raw['params'] = convert_params(raw['params'], args.to, args.num_heads,
                                   _converted=converted)
    if not converted:
        raise SystemExit(
            f'no EncoderBlock attention parameters to convert to '
            f'{args.to!r} — is {args.input} already in that format? '
            f'(nothing written)')
    # NOTE: --num-heads must match the TRAINING config for --to flax; any
    # divisor of d_model reshapes cleanly, but a wrong value changes the
    # per-head softmax grouping silently.
    # optimizer moments have the old tree shape; drop them (the loader
    # restarts the optimizer on mismatch anyway, this makes it explicit)
    raw.pop('opt_state', None)
    with open(args.output, 'wb') as f:
        f.write(serialization.msgpack_serialize(raw))
    print(f'wrote {args.output} ({args.to} attention, '
          f'{len(converted)} blocks converted)')


if __name__ == '__main__':
    main()
