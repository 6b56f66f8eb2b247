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


def _encoder_kernel_v2(num_heads, t, d, compute_dtype, x_ref, *refs):
    """v2 attention core: batched over key frames (round 3).

    v1 unrolled the T=10 attention over all (i, j) frame pairs — ~200
    skinny [R,D]x[D,H] / [R,H]x[H,D] matmuls plus ~[R,8] softmax smalls
    per tile; in-kernel op issue dominated the measured 1.1 ms/layer.
    v2 restructures:

    - Q/K/V are projected SEPARATELY (three matmuls on the [R*T, D]
      view), so each lands window-major [R, T*D] with no per-frame
      re-slicing of an interleaved qkv buffer.
    - Per query frame i, scores against ALL key frames come from ONE
      matmul: (tile(q_i) ⊙ K_all) @ BD, where BD [T*D, T*H] is the
      block-diagonal head indicator — T matmuls total for scores.
    - Probabilities expand back to lane space with one [R, T*H] @
      BD2 [T*H, T*D] matmul per i; value mixing is an elementwise
      multiply + a T-slice tree sum (pure VPU, no MXU padding).

    Padded MXU FLOPs are unchanged (N pads to 128 either way) but the
    matmul count drops 200 -> 20 and VPU op count roughly halves.
    """
    (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bm1, w2, bm2) = \
        [r[:] for r in refs[:12]]
    out_ref = refs[12]
    r = x_ref.shape[0]
    dh = d // num_heads
    f32 = jnp.float32

    # head indicator E[c, h] = 1 iff lane c belongs to head h
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, num_heads), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (d, num_heads), 1)
    E = (lane // dh == head).astype(f32)                       # [D, H]
    # block-diagonal over frames: BD[(j,c),(j',h)] = E[c,h] * (j == j')
    jlane = jax.lax.broadcasted_iota(jnp.int32, (t * d, t * num_heads), 0) // d
    jcol = jax.lax.broadcasted_iota(jnp.int32, (t * d, t * num_heads), 1) \
        // num_heads
    BD = jnp.where(jlane == jcol, jnp.tile(E, (t, t)), 0.0)    # [T*D, T*H]
    BD2 = BD.T                                                 # [T*H, T*D]

    h = x_ref[:].astype(f32).reshape(r * t, d)
    y = _layernorm(h, g1[0], b1[0]).astype(compute_dtype)
    wq, wk, wv = (wqkv[:, :d], wqkv[:, d:2 * d], wqkv[:, 2 * d:])
    bq, bk, bv = (bqkv[0, :d], bqkv[0, d:2 * d], bqkv[0, 2 * d:])
    scale = dh ** -0.5
    q = (jnp.dot(y, wq.astype(compute_dtype),
                 preferred_element_type=f32) + bq) * scale
    k = jnp.dot(y, wk.astype(compute_dtype), preferred_element_type=f32) + bk
    v = jnp.dot(y, wv.astype(compute_dtype), preferred_element_type=f32) + bv
    q_w = q.reshape(r, t * d)        # window-major: frame j at lanes [j*d, (j+1)*d)
    k_w = k.reshape(r, t * d)
    v_w = v.reshape(r, t * d)

    outs = []
    for i in range(t):
        qi = q_w[:, i * d:(i + 1) * d]                         # [R, D]
        qi_tile = jnp.concatenate([qi] * t, axis=1)            # [R, T*D]
        s = jnp.dot(qi_tile * k_w, BD,
                    preferred_element_type=f32)                # [R, T*H]
        # softmax over key frames j (strided groups of H lanes)
        cols = [s[:, j * num_heads:(j + 1) * num_heads] for j in range(t)]
        m = cols[0]
        for c in cols[1:]:
            m = jnp.maximum(m, c)
        e = jnp.exp(s - jnp.concatenate([m] * t, axis=1))      # [R, T*H]
        ecols = [e[:, j * num_heads:(j + 1) * num_heads] for j in range(t)]
        z = ecols[0]
        for c in ecols[1:]:
            z = z + c
        p = e * jnp.concatenate([1.0 / z] * t, axis=1)         # [R, T*H]
        p_exp = jnp.dot(p, BD2, preferred_element_type=f32)    # [R, T*D]
        pv = p_exp * v_w
        acc = pv[:, :d]
        for j in range(1, t):
            acc = acc + pv[:, j * d:(j + 1) * d]
        outs.append(acc)
    attn = jnp.concatenate(outs, axis=1).reshape(r * t, d)
    y = jnp.dot(attn.astype(compute_dtype), wproj.astype(compute_dtype),
                preferred_element_type=f32) + bproj[0]
    h = h + y
    y = _layernorm(h, g2[0], b2[0]).astype(compute_dtype)
    y = jnp.dot(y, w1.astype(compute_dtype), preferred_element_type=f32) + bm1[0]
    y = jax.nn.gelu(y).astype(compute_dtype)
    y = jnp.dot(y, w2.astype(compute_dtype), preferred_element_type=f32) + bm2[0]
    out_ref[:] = (h + y).reshape(r, t * d).astype(f32)


def encoder_layer_pallas(x: jax.Array, params: Tuple[jax.Array, ...],
                         num_heads: int, tile_rows: int = 64,
                         compute_dtype=jnp.bfloat16,
                         interpret: bool = False,
                         kernel_version: int = 1) -> jax.Array:
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

    kfn = _encoder_kernel_v2 if kernel_version == 2 else _encoder_kernel
    kernel = functools.partial(kfn, num_heads, t, d, compute_dtype)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_encoder_layer(x, params, num_heads, tile_rows=64,
                        kernel_version=1):
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
    return encoder_layer_pallas(x, params, num_heads, tile_rows=tile_rows,
                                kernel_version=kernel_version)


def _fwd(x, params, num_heads, tile_rows=64, kernel_version=1):
    return (fused_encoder_layer(x, params, num_heads, tile_rows,
                                kernel_version), (x, params))


def _bwd(num_heads, tile_rows, kernel_version, res, g):
    x, params = res
    _, vjp = jax.vjp(lambda x_, p_: encoder_layer_reference(x_, p_, num_heads),
                     x, params)
    return vjp(g)


fused_encoder_layer.defvjp(_fwd, _bwd)
