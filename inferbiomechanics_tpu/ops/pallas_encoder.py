"""Fused transformer encoder layer in Pallas (TPU).

One kernel = one pre-LN encoder layer over a batch tile: LayerNorm →
QKV projection (MXU) → short-window attention (VPU broadcast-reduce,
see models/transformer.ShortWindowAttention for the rationale at T≈10)
→ output projection → residual → LayerNorm → 4x MLP (MXU) → residual.
Every intermediate stays in VMEM; HBM sees one read of the tile and one
write. This attacks the small-shape overhead that caps the XLA
transformer step (BENCH_NOTES.md "known optimization target"): instead
of ~30 small HLO ops per layer on [B, 10, 256] tensors, the whole layer
is one pass over [R·T, d] tiles with MXU-aligned matmuls.

Constraints: d_model and mlp width multiples of 128; T static; no
dropout inside the kernel (inference / dropout-0 training path — the
custom-vjp backward recomputes with the jnp reference, as in
ops/pallas_mlp.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# parameter order for the flat tuple interface
PARAM_NAMES = ('ln1_scale', 'ln1_bias', 'wqkv', 'bqkv', 'wproj', 'bproj',
               'ln2_scale', 'ln2_bias', 'wmlp1', 'bmlp1', 'wmlp2', 'bmlp2')


def init_encoder_params(rng: jax.Array, d_model: int,
                        mlp_ratio: int = 4) -> Tuple[jax.Array, ...]:
    """LeCun-normal weights / zero biases / unit LN, as a flat tuple."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    d, m = d_model, d_model * mlp_ratio
    init = jax.nn.initializers.lecun_normal()
    return (
        jnp.ones((d,), jnp.float32), jnp.zeros((d,), jnp.float32),
        init(k1, (d, 3 * d), jnp.float32), jnp.zeros((3 * d,), jnp.float32),
        init(k2, (d, d), jnp.float32), jnp.zeros((d,), jnp.float32),
        jnp.ones((d,), jnp.float32), jnp.zeros((d,), jnp.float32),
        init(k3, (d, m), jnp.float32), jnp.zeros((m,), jnp.float32),
        init(k4, (m, d), jnp.float32), jnp.zeros((d,), jnp.float32),
    )


def _layernorm(x, scale, bias, eps=1e-6):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def encoder_layer_reference(x: jax.Array, params: Tuple[jax.Array, ...],
                            num_heads: int,
                            compute_dtype=jnp.bfloat16) -> jax.Array:
    """jnp reference; x [B, T, d] float32 -> [B, T, d] float32."""
    (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bm1, w2, bm2) = params
    b, t, d = x.shape
    dh = d // num_heads
    h = x.astype(jnp.float32)
    y = _layernorm(h, g1, b1).astype(compute_dtype)
    qkv = (jnp.dot(y, wqkv.astype(compute_dtype),
                   preferred_element_type=jnp.float32) + bqkv)
    q, k, v = jnp.split(qkv.reshape(b, t, 3, num_heads, dh), 3, axis=2)
    q = q[:, :, 0] * (dh ** -0.5)
    k = k[:, :, 0]
    v = v[:, :, 0]
    scores = (q[:, :, None] * k[:, None, :]).sum(-1)          # [B,Tq,Tk,H]
    probs = jax.nn.softmax(scores, axis=2)
    attn = (probs[..., None] * v[:, None]).sum(2)             # [B,Tq,H,dh]
    attn = attn.reshape(b, t, d).astype(compute_dtype)
    y = (jnp.dot(attn, wproj.astype(compute_dtype),
                 preferred_element_type=jnp.float32) + bproj)
    h = h + y
    y = _layernorm(h, g2, b2).astype(compute_dtype)
    y = (jnp.dot(y, w1.astype(compute_dtype),
                 preferred_element_type=jnp.float32) + bm1)
    y = jax.nn.gelu(y).astype(compute_dtype)
    y = (jnp.dot(y, w2.astype(compute_dtype),
                 preferred_element_type=jnp.float32) + bm2)
    return (h + y).astype(jnp.float32)


def _encoder_kernel(num_heads, t, d, compute_dtype, x_ref, *refs):
    """Mosaic-legal layer kernel: ONLY 2-D vectors.

    [R, T*D] <-> [R*T, D] reshapes are free layout reinterpretations
    (row-major contiguous); per-frame tensors are LANE slices of the
    window-major view at D-multiples (Mosaic-friendly); the T=10
    attention core is unrolled over (i, j) frame pairs with the per-head
    reduction done as a matmul against a [D, H] head-indicator matrix.
    ~1k small in-kernel ops replace ~90 separate XLA kernels per layer —
    the kernel-launch tax this runtime charges (BENCH_NOTES.md)."""
    (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bm1, w2, bm2) = \
        [r[:] for r in refs[:12]]
    out_ref = refs[12]
    r = x_ref.shape[0]                       # batch-tile rows
    dh = d // num_heads

    # head-indicator: E[c, h] = 1 iff lane c belongs to head h
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, num_heads), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (d, num_heads), 1)
    E = (lane // dh == head).astype(jnp.float32)              # [D, H]

    h = x_ref[:].astype(jnp.float32).reshape(r * t, d)
    y = _layernorm(h, g1[0], b1[0]).astype(compute_dtype)
    qkv = jnp.dot(y, wqkv.astype(compute_dtype),
                  preferred_element_type=jnp.float32) + bqkv[0]
    qkv_w = qkv.reshape(r, t * 3 * d)                         # window-major
    scale = dh ** -0.5

    def q_of(i):
        return qkv_w[:, i * 3 * d:i * 3 * d + d] * scale      # [R, D]

    def k_of(j):
        return qkv_w[:, j * 3 * d + d:j * 3 * d + 2 * d]

    def v_of(j):
        return qkv_w[:, j * 3 * d + 2 * d:j * 3 * d + 3 * d]

    outs = []
    for i in range(t):
        qi = q_of(i)
        scores = [jnp.dot(qi * k_of(j), E,
                          preferred_element_type=jnp.float32)  # [R, H]
                  for j in range(t)]
        m = scores[0]
        for s in scores[1:]:
            m = jnp.maximum(m, s)
        exps = [jnp.exp(s - m) for s in scores]
        z = exps[0]
        for e_ in exps[1:]:
            z = z + e_
        acc = jnp.zeros((r, d), jnp.float32)
        for j in range(t):
            p_full = jnp.dot(exps[j] / z, E.T,
                             preferred_element_type=jnp.float32)  # [R, D]
            acc = acc + p_full * v_of(j)
        outs.append(acc)
    attn = jnp.concatenate(outs, axis=1).reshape(r * t, d)    # [R*T, D]
    y = jnp.dot(attn.astype(compute_dtype), wproj.astype(compute_dtype),
                preferred_element_type=jnp.float32) + bproj[0]
    h = h + y
    y = _layernorm(h, g2[0], b2[0]).astype(compute_dtype)
    y = jnp.dot(y, w1.astype(compute_dtype),
                preferred_element_type=jnp.float32) + bm1[0]
    y = jax.nn.gelu(y).astype(compute_dtype)
    y = jnp.dot(y, w2.astype(compute_dtype),
                preferred_element_type=jnp.float32) + bm2[0]
    out_ref[:] = (h + y).reshape(r, t * d).astype(jnp.float32)


def encoder_layer_pallas(x: jax.Array, params: Tuple[jax.Array, ...],
                         num_heads: int, tile_rows: int = 64,
                         compute_dtype=jnp.bfloat16,
                         interpret: bool = False) -> jax.Array:
    """Fused encoder layer. x [B, T, d] f32 -> [B, T, d] f32.
    d and mlp width must be multiples of 128; B padded to tile_rows."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, d = x.shape
    if d % 128 != 0:
        raise ValueError(f'd_model {d} must be a multiple of 128')
    m = params[8].shape[1]
    grid_b = -(-b // tile_rows)
    b_pad = grid_b * tile_rows
    xf = x.reshape(b, t * d)
    if b_pad != b:
        xf = jnp.pad(xf, ((0, b_pad - b), (0, 0)))

    # biases / LN params as [1, n] rows for SMEM-free VMEM residence
    prep = []
    for p in params:
        prep.append(p[None, :] if p.ndim == 1 else p)

    kernel = functools.partial(_encoder_kernel, num_heads, t, d, compute_dtype)
    in_specs = [pl.BlockSpec((tile_rows, t * d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for p in prep:
        in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=(grid_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_rows, t * d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, t * d), jnp.float32),
        interpret=interpret,
    )(xf, *prep)
    return out[:b].reshape(b, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_encoder_layer(x, params, num_heads):
    """Trainable fused layer: pallas forward on TPU, jnp on CPU;
    backward recomputes through the jnp reference.

    Round-2 status (real TPU v5e, readback-verified): the 2-D-only
    kernel compiles on Mosaic and runs the 4-layer encoder forward at
    **1.56x** the XLA path (4.42 vs 6.88 ms at B=4096) by collapsing
    ~90 kernels/layer into one — the kernel-launch tax this runtime
    charges (BENCH_NOTES.md). For TRAINING the backward recomputes
    through the XLA reference, so the end-to-end step is ~neutral; use
    ``attn_impl='pallas'`` for inference/serving and ``'vpu'`` (default)
    for training."""
    if jax.default_backend() == 'cpu':
        return encoder_layer_reference(x, params, num_heads)
    return encoder_layer_pallas(x, params, num_heads)


def _fwd(x, params, num_heads):
    return fused_encoder_layer(x, params, num_heads), (x, params)


def _bwd(num_heads, res, g):
    x, params = res
    _, vjp = jax.vjp(lambda x_, p_: encoder_layer_reference(x_, p_, num_heads),
                     x, params)
    return vjp(g)


fused_encoder_layer.defvjp(_fwd, _bwd)
