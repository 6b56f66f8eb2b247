"""Transformer sequence regressor — the flagship learned model.

Capability: the reference ships a bit-rotted ``TransformerBaseline``
(src/models/TransformerBaseline.py — self-attention encoder with learned
temporal embedding) written against a long-dead key schema and not
reachable from its model factory (SURVEY.md §2.8). This module implements
that *capability* against the current schema: a pre-LN transformer encoder
over the window's frames with a learned temporal embedding, emitting the
4 contact output groups per frame (or last frame only), plus optional
auxiliary heads for tau / COM-acc / contact — the quantities
BASELINE.json's config #3 calls for ("transformer sequence model
predicting GRF + joint torques on 50-frame windows").

TPU notes: bf16 compute; all matmuls are [B*T, D]-shaped MXU work; window
lengths are short (10-50 frames) so flash-attention kernels are not the
bottleneck — batch size is. Sequence length stays a config knob.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from inferbiomechanics_tpu.data import keys as K
from inferbiomechanics_tpu.models.common import (
    ModelInput, output_head_size, pack_inputs, slice_output_heads,
)


class ShortWindowAttention(nn.Module):
    """Multi-head self-attention specialized for SHORT sequences (T≈10).

    Batched [T, d_head]x[d_head, T] matmuls put 10x10 tiles on the MXU —
    <1% tile utilization. Here scores and the weighted sum are computed as
    broadcast-multiply + reduce, which XLA lowers onto the VPU with the
    huge batch dim in the lanes. FLOP-equivalent to standard attention;
    far better hardware mapping when T*T << 128*128.
    """
    num_heads: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        dh = d // self.num_heads
        qkv = nn.Dense(3 * d, dtype=self.compute_dtype, name='qkv')(x)
        q, k, v = jnp.split(qkv.reshape(b, t, 3, self.num_heads, dh), 3, axis=2)
        q = q[:, :, 0] * (dh ** -0.5)        # [B, T, H, dh]
        k = k[:, :, 0]
        v = v[:, :, 0]
        # scores [B, Tq, Tk, H] via elementwise mul + reduce (VPU)
        scores = (q[:, :, None] * k[:, None, :]).sum(-1)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=2)
        probs = probs.astype(self.compute_dtype)
        out = (probs[..., None] * v[:, None, :, :, :]).sum(2)   # [B, Tq, H, dh]
        out = out.reshape(b, t, d)
        return nn.Dense(d, dtype=self.compute_dtype, name='proj')(out)


class EncoderBlock(nn.Module):
    d_model: int
    num_heads: int
    mlp_ratio: int = 4
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = 'flax'   # 'flax' (MXU batched matmul) | 'vpu' (short-T)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = nn.LayerNorm(dtype=self.compute_dtype)(x)
        if self.attn_impl == 'vpu':
            y = ShortWindowAttention(self.num_heads, self.compute_dtype)(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        else:
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.compute_dtype,
                dropout_rate=self.dropout, deterministic=not train)(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.compute_dtype)(x)
        y = nn.Dense(self.d_model * self.mlp_ratio, dtype=self.compute_dtype)(y)
        y = nn.gelu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.d_model, dtype=self.compute_dtype)(y)
        return x + y


class TransformerRegressor(nn.Module):
    num_dofs: int
    num_contact_bodies: int
    history_len: int
    stride: int
    output_data_format: str = 'last_frame'
    d_model: int = 256
    num_layers: int = 4
    num_heads: int = 8
    mlp_ratio: int = 4
    dropout: float = 0.0
    predict_tau: bool = True
    predict_com_acc: bool = True
    predict_contact: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = 'vpu'   # short windows: VPU attention maps far better
    # knobs for attn_impl='pallas' (ops/pallas_encoder.py): batch-tile
    # rows, attention-core version (2 = key-frame-batched, round 3) and
    # the fused recompute+VJP backward kernel (round 3; False = backward
    # recomputes through the XLA reference as in round 2)
    pallas_tile_rows: int = 64
    pallas_kernel_version: int = 1
    pallas_fused_bwd: bool = False

    @property
    def num_frames(self) -> int:
        return self.history_len // self.stride

    @property
    def num_output_frames(self) -> int:
        return self.num_frames if self.output_data_format == 'all_frames' else 1

    @nn.compact
    def __call__(self, inputs: ModelInput, *, train: bool = False) -> Dict[str, jax.Array]:
        x = pack_inputs(inputs)                      # [B, T, C_in]
        assert x.ndim == 3, f'expected (B, T, C), got {x.shape}'
        t = x.shape[1]
        x = nn.Dense(self.d_model, dtype=self.compute_dtype)(x.astype(self.compute_dtype))
        # learned temporal embedding (capability of ref TransformerBaseline.py:93-96)
        pos = self.param('temporal_embedding',
                         nn.initializers.normal(0.02), (t, self.d_model))
        x = x + pos.astype(self.compute_dtype)[None]
        if self.attn_impl == 'pallas':
            # fully fused encoder layers (ops/pallas_encoder.py); dropout
            # unsupported inside the kernel
            assert self.dropout == 0.0, 'pallas encoder does not support dropout'
            from inferbiomechanics_tpu.ops.pallas_encoder import (
                PARAM_NAMES, fused_encoder_layer,
            )
            d, m = self.d_model, self.d_model * self.mlp_ratio
            shapes = {'ln1_scale': (d,), 'ln1_bias': (d,),
                      'wqkv': (d, 3 * d), 'bqkv': (3 * d,),
                      'wproj': (d, d), 'bproj': (d,),
                      'ln2_scale': (d,), 'ln2_bias': (d,),
                      'wmlp1': (d, m), 'bmlp1': (m,),
                      'wmlp2': (m, d), 'bmlp2': (d,)}

            def init_for(name):
                if name.startswith('w'):
                    return nn.initializers.lecun_normal()
                if name.endswith('scale'):
                    return nn.initializers.ones_init()
                return nn.initializers.zeros_init()

            x = x.astype(jnp.float32)
            for li in range(self.num_layers):
                layer_params = tuple(
                    self.param(f'enc{li}_{name}', init_for(name), shapes[name])
                    for name in PARAM_NAMES)
                x = fused_encoder_layer(x, layer_params, self.num_heads,
                                        self.pallas_tile_rows,
                                        self.pallas_kernel_version,
                                        self.pallas_fused_bwd)
            x = x.astype(self.compute_dtype)
        else:
            for _ in range(self.num_layers):
                x = EncoderBlock(self.d_model, self.num_heads, self.mlp_ratio,
                                 self.dropout, self.compute_dtype,
                                 self.attn_impl)(x, train=train)
        x = nn.LayerNorm(dtype=self.compute_dtype)(x)

        if self.output_data_format != 'all_frames':
            x = x[:, -1:, :]

        per_frame = output_head_size(self.num_contact_bodies, 1)
        main = nn.Dense(per_frame, dtype=self.compute_dtype,
                        name='contact_head')(x).astype(jnp.float32)
        out = slice_output_heads(main, self.num_contact_bodies, main.shape[1])

        if self.predict_tau:
            out[K.OutputDataKeys.TAU] = nn.Dense(
                self.num_dofs, dtype=self.compute_dtype,
                name='tau_head')(x).astype(jnp.float32)
        if self.predict_com_acc:
            out[K.OutputDataKeys.COM_ACC_IN_ROOT_FRAME] = nn.Dense(
                3, dtype=self.compute_dtype,
                name='com_acc_head')(x).astype(jnp.float32)
        if self.predict_contact:
            out[K.OutputDataKeys.CONTACT] = nn.Dense(
                self.num_contact_bodies, dtype=self.compute_dtype,
                name='contact_cls_head')(x).astype(jnp.float32)
        return out


def fused_transformer_forward(model: 'TransformerRegressor', params,
                              inputs: ModelInput) -> Dict[str, jax.Array]:
    """Inference forward using the fused Pallas encoder kernel on a
    checkpoint TRAINED with ``attn_impl='vpu'`` (the default).

    The fused kernel (ops/pallas_encoder.py) collapses ~90 kernels per
    layer into one; measured full-model serving is ~4% faster than the
    bf16 vpu path (1.56x vs the f32 reference encoder — BENCH_NOTES.md
    serving table). The module's 'pallas' path names its parameters
    differently, so a vpu checkpoint could not use it directly — this
    function consumes the vpu/flax parameter tree (EncoderBlock_i/...)
    as-is. Numerics differ from ``model.apply`` at
    bf16-residual level (the kernel keeps residuals in f32).
    """
    from inferbiomechanics_tpu.ops.pallas_encoder import fused_encoder_layer

    dt = model.compute_dtype
    x = pack_inputs(inputs)
    x = x.astype(dt) @ params['Dense_0']['kernel'].astype(dt) \
        + params['Dense_0']['bias'].astype(dt)
    x = x + params['temporal_embedding'].astype(dt)[None]
    x = x.astype(jnp.float32)
    for li in range(model.num_layers):
        blk = params[f'EncoderBlock_{li}']
        attn = blk['ShortWindowAttention_0']
        layer = (blk['LayerNorm_0']['scale'], blk['LayerNorm_0']['bias'],
                 attn['qkv']['kernel'], attn['qkv']['bias'],
                 attn['proj']['kernel'], attn['proj']['bias'],
                 blk['LayerNorm_1']['scale'], blk['LayerNorm_1']['bias'],
                 blk['Dense_0']['kernel'], blk['Dense_0']['bias'],
                 blk['Dense_1']['kernel'], blk['Dense_1']['bias'])
        x = fused_encoder_layer(x, layer, model.num_heads)
    ln = params['LayerNorm_0']
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    x = ((x - mean) * jax.lax.rsqrt(var + 1e-6)
         * ln['scale'] + ln['bias']).astype(dt)

    if model.output_data_format != 'all_frames':
        x = x[:, -1:, :]

    def head(name):
        return (x @ params[name]['kernel'].astype(dt)
                + params[name]['bias'].astype(dt)).astype(jnp.float32)

    main = head('contact_head')
    out = slice_output_heads(main, model.num_contact_bodies, main.shape[1])
    if model.predict_tau:
        out[K.OutputDataKeys.TAU] = head('tau_head')
    if model.predict_com_acc:
        out[K.OutputDataKeys.COM_ACC_IN_ROOT_FRAME] = head('com_acc_head')
    if model.predict_contact:
        out[K.OutputDataKeys.CONTACT] = head('contact_cls_head')
    return out
