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
import os
from typing import NamedTuple, Tuple

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


class _V2Residuals(NamedTuple):
    """Forward intermediates the hand-derived VJP consumes."""
    h: jax.Array        # [R*T, D] f32 post-embedding input
    xhat1: jax.Array
    rs1: jax.Array
    y1c: jax.Array      # LN1 output, compute_dtype
    q_w: jax.Array      # [R, T*D] window-major q (scaled), k, v
    k_w: jax.Array
    v_w: jax.Array
    P_list: tuple       # per query frame i: softmax probs [R, T*H]
    attnc: jax.Array    # attention mix, compute_dtype
    h2: jax.Array       # post-attention residual stream
    xhat2: jax.Array
    rs2: jax.Array
    y2c: jax.Array      # LN2 output, compute_dtype
    z1: jax.Array       # MLP pre-activation
    m1a: jax.Array      # gelu(z1) f32
    m1c: jax.Array      # gelu(z1) compute_dtype


def _v2_forward_core(x2d, params, num_heads, t, d,
                     compute_dtype) -> _V2Residuals:
    """v2 attention core: batched over key frames (round 3).

    THE forward math — called from both `_encoder_kernel_v2` and the
    backward kernel's recompute (`_encoder_bwd_math`), so the
    hand-derived VJP can never silently desynchronize from the forward.
    Computes through the MLP activation m1c; the caller finishes the
    last matmul (`m1c @ w2 + bm2`) — the backward never needs it.

    v1 unrolled the T=10 attention over all (i, j) frame pairs — ~200
    skinny [R,D]x[D,H] / [R,H]x[H,D] matmuls plus ~[R,8] softmax smalls
    per tile; in-kernel op issue dominated the measured 1.1 ms/layer.
    v2 restructures:

    - Q/K/V come from the fused [R*T, D]x[D, 3D] matmul, then section
      slices of the multi-sublane result land each window-major
      [R, T*D] with no per-frame re-slicing of an interleaved buffer.
      (Slicing the [1, 3D] bias row at non-zero lane offsets instead
      crashes Mosaic's tpu_compile_helper on this runtime — only
      multi-sublane values tolerate offset lane slices.)
    - Per query frame i, scores against ALL key frames come from ONE
      matmul: (tile(q_i) ⊙ K_all) @ BD, where BD [T*D, T*H] is the
      block-diagonal head indicator — T matmuls total for scores.
    - Probabilities expand back to lane space with one [R, T*H] @
      BD2 [T*H, T*D] matmul per i; value mixing is an elementwise
      multiply + a T-slice tree sum (pure VPU, no MXU padding).

    Padded MXU FLOPs are unchanged (N pads to 128 either way) but the
    matmul count drops 200 -> 20 and VPU op count roughly halves.

    Pure jnp on 2-D values only, so the same function body runs inside
    a Mosaic kernel and under interpret mode / tests. Params are the
    [1, N]-shaped bias/LN rows (broadcast against [R*T, N]).
    """
    (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bm1, w2, bm2) = params
    r = x2d.shape[0]
    dh = d // num_heads
    f32 = jnp.float32
    scale = dh ** -0.5
    BD, BD2 = _head_indicators(num_heads, t, d)

    def tile_t(a):      # [R, W] -> [R, T*W]
        return jnp.concatenate([a] * t, axis=1)

    h = x2d.astype(f32).reshape(r * t, d)
    y1, xhat1, rs1 = _ln_fwd(h, g1, b1)
    y1c = y1.astype(compute_dtype)
    qkv = jnp.dot(y1c, wqkv.astype(compute_dtype),
                  preferred_element_type=f32) + bqkv
    q = qkv[:, :d] * scale
    k = qkv[:, d:2 * d]
    v = qkv[:, 2 * d:]
    q_w, k_w, v_w = (a.reshape(r, t * d) for a in (q, k, v))

    P_list = []
    outs = []
    for i in range(t):
        qi = q_w[:, i * d:(i + 1) * d]                         # [R, D]
        s = jnp.dot(tile_t(qi) * k_w, BD,
                    preferred_element_type=f32)                # [R, T*H]
        # softmax over key frames j (strided groups of H lanes)
        cols = [s[:, j * num_heads:(j + 1) * num_heads] for j in range(t)]
        m = cols[0]
        for c in cols[1:]:
            m = jnp.maximum(m, c)
        e = jnp.exp(s - tile_t(m))
        ecols = [e[:, j * num_heads:(j + 1) * num_heads] for j in range(t)]
        z = ecols[0]
        for c in ecols[1:]:
            z = z + c
        p = e * tile_t(1.0 / z)                                # [R, T*H]
        P_list.append(p)
        p_exp = jnp.dot(p, BD2, preferred_element_type=f32)    # [R, T*D]
        pv = p_exp * v_w
        acc = pv[:, :d]
        for j in range(1, t):
            acc = acc + pv[:, j * d:(j + 1) * d]
        outs.append(acc)
    attn = jnp.concatenate(outs, axis=1).reshape(r * t, d)
    attnc = attn.astype(compute_dtype)
    a = jnp.dot(attnc, wproj.astype(compute_dtype),
                preferred_element_type=f32) + bproj
    h2 = h + a
    y2, xhat2, rs2 = _ln_fwd(h2, g2, b2)
    y2c = y2.astype(compute_dtype)
    z1 = jnp.dot(y2c, w1.astype(compute_dtype),
                 preferred_element_type=f32) + bm1
    m1a = _gelu_tanh(z1)
    m1c = m1a.astype(compute_dtype)
    return _V2Residuals(h, xhat1, rs1, y1c, q_w, k_w, v_w, tuple(P_list),
                        attnc, h2, xhat2, rs2, y2c, z1, m1a, m1c)


def _head_indicators(num_heads, t, d):
    """BD [T*D, T*H] block-diagonal head indicator and its transpose:
    BD[(j,c),(j',h)] = 1 iff lane c belongs to head h and j == j'."""
    f32 = jnp.float32
    dh = d // num_heads
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, num_heads), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (d, num_heads), 1)
    E = (lane // dh == head).astype(f32)                       # [D, H]
    jlane = jax.lax.broadcasted_iota(jnp.int32, (t * d, t * num_heads), 0) // d
    jcol = jax.lax.broadcasted_iota(jnp.int32, (t * d, t * num_heads), 1) \
        // num_heads
    BD = jnp.where(jlane == jcol, jnp.tile(E, (t, t)), 0.0)    # [T*D, T*H]
    return BD, BD.T


def _encoder_kernel_v2(num_heads, t, d, compute_dtype, x_ref, *refs):
    """Pallas wrapper: v2 forward core + the final MLP matmul."""
    params = tuple(r[:] for r in refs[:12])
    out_ref = refs[12]
    r = x_ref.shape[0]
    w2, bm2 = params[10], params[11]
    res = _v2_forward_core(x_ref[:], params, num_heads, t, d, compute_dtype)
    y = jnp.dot(res.m1c, w2.astype(compute_dtype),
                preferred_element_type=jnp.float32) + bm2
    out_ref[:] = (res.h2 + y).reshape(r, t * d).astype(jnp.float32)


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


# ---------------------------------------------------------------------------
# Fused BACKWARD kernel (round 3): recompute-forward + hand-derived VJP in
# one Pallas kernel per layer, with parameter-gradient accumulation across
# batch tiles. This replaces the round-2 backward (jax.vjp through the XLA
# reference — the reason attn_impl='pallas' trained SLOWER than 'vpu').
# ---------------------------------------------------------------------------

_SQRT_2_OVER_PI = 0.7978845608028654
_GELU_C = 0.044715


def _gelu_tanh(z):
    u = _SQRT_2_OVER_PI * (z + _GELU_C * z * z * z)
    return 0.5 * z * (1.0 + jnp.tanh(u))


def _gelu_tanh_grad(z):
    u = _SQRT_2_OVER_PI * (z + _GELU_C * z * z * z)
    th = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * z * z)
    return 0.5 * (1.0 + th) + 0.5 * z * (1.0 - th * th) * du


def _ln_fwd(x, scale, bias, eps=1e-6):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    rs = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * rs
    return xhat * scale + bias, xhat, rs


def _ln_bwd(dy, xhat, rs, scale):
    """Standard LayerNorm VJP. Returns (dx, dscale, dbias[1,D])."""
    dxhat = dy * scale
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx = rs * (dxhat - m1 - xhat * m2)
    return dx, (dy * xhat).sum(axis=0, keepdims=True), \
        dy.sum(axis=0, keepdims=True)


# Internal bisect knob for Mosaic compile failures (scripts/debug_mosaic_*):
# when set to phase k (1=forward recompute, 2=+MLP backward, 3=+LN2/proj
# grads, 4=+attention backward), _encoder_bwd_math returns early with zero
# grads for everything not yet computed (outputs keep the partial
# computation live). Finer-grained stages used for the round-3 bisect
# (BENCH_NOTES.md "Mosaic compiler pitfalls") live in git history.
_BWD_DEBUG_STAGE = None


def _encoder_bwd_math(x2d, g2d, params, num_heads, t, d, compute_dtype):
    """Recompute the v2 forward and hand-derived VJP for one batch tile.

    x2d, g2d: [R, T*D] float32 (input and upstream cotangent).
    Returns (dx [R, T*D], 12 param grads — matmul grads [K, N], vector
    grads [1, N]). Pure jnp on 2-D values only, so the same function
    body runs inside a Mosaic kernel and under interpret mode / tests.
    Matches jax.vjp of encoder_layer_reference (same op order and
    compute_dtype casts on matmul inputs).
    """
    (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bm1, w2, bm2) = params
    r = x2d.shape[0]
    dh = d // num_heads
    f32 = jnp.float32
    scale = dh ** -0.5
    BD, BD2 = _head_indicators(num_heads, t, d)

    def tile_t(a):      # [R, W] -> [R, T*W]
        return jnp.concatenate([a] * t, axis=1)

    # ---- forward recompute (keep residency for the backward): THE SAME
    # function the forward kernel runs, so the VJP below can never
    # silently desynchronize from the forward math ----
    res = _v2_forward_core(x2d, params, num_heads, t, d, compute_dtype)
    (h, xhat1, rs1, y1c, q_w, k_w, v_w, P_list,
     attnc, h2, xhat2, rs2, y2c, z1, m1a, m1c) = res

    zero_grads = tuple(jnp.zeros(p.shape, f32) for p in params)
    if _BWD_DEBUG_STAGE == 1:      # forward recompute only
        return (m1a[:, :d] + h).reshape(r, t * d), zero_grads

    # ---- backward ----
    g_out = g2d.astype(f32).reshape(r * t, d)
    # out = h2 + m2;  m2 = m1c @ w2 + bm2
    dW2 = jnp.dot(m1c.T.astype(compute_dtype), g_out.astype(compute_dtype),
                  preferred_element_type=f32)
    dbm2 = g_out.sum(axis=0, keepdims=True)
    dm1 = jnp.dot(g_out.astype(compute_dtype),
                  w2.T.astype(compute_dtype), preferred_element_type=f32)
    dz1 = dm1 * _gelu_tanh_grad(z1)
    dW1 = jnp.dot(y2c.T, dz1.astype(compute_dtype),
                  preferred_element_type=f32)
    dbm1 = dz1.sum(axis=0, keepdims=True)
    dy2 = jnp.dot(dz1.astype(compute_dtype), w1.T.astype(compute_dtype),
                  preferred_element_type=f32)
    if _BWD_DEBUG_STAGE == 2:      # + MLP backward
        return dy2.reshape(r, t * d), \
            zero_grads[:8] + (dW1, dbm1, dW2, dbm2)
    dh2_ln, dg2, db2 = _ln_bwd(dy2, xhat2, rs2, g2)
    dh2 = g_out + dh2_ln
    # a = attnc @ wproj + bproj
    dWproj = jnp.dot(attnc.T, dh2.astype(compute_dtype),
                     preferred_element_type=f32)
    dbproj = dh2.sum(axis=0, keepdims=True)
    dattn = jnp.dot(dh2.astype(compute_dtype), wproj.T.astype(compute_dtype),
                    preferred_element_type=f32)
    dattn_w = dattn.reshape(r, t * d)
    if _BWD_DEBUG_STAGE == 3:      # + LN2 vjp + proj grads
        return dattn_w, zero_grads[:4] + (dWproj, dbproj, dg2, db2) + \
            zero_grads[8:]

    dq_list = []
    dk_w = jnp.zeros((r, t * d), f32)
    dv_w = jnp.zeros((r, t * d), f32)
    for i in range(t):
        di = dattn_w[:, i * d:(i + 1) * d]                     # [R, D]
        di_t = tile_t(di)
        p = P_list[i]
        p_exp = jnp.dot(p, BD2, preferred_element_type=f32)
        dv_w = dv_w + p_exp * di_t
        dp = jnp.dot(di_t * v_w, BD, preferred_element_type=f32)  # [R, T*H]
        # softmax vjp over key frames j (per head): dS = P*(dp - sum_j P*dp)
        pdp = p * dp
        cols = [pdp[:, j * num_heads:(j + 1) * num_heads] for j in range(t)]
        tot = cols[0]
        for c in cols[1:]:
            tot = tot + c
        dS = p * (dp - tile_t(tot))                            # [R, T*H]
        dS_exp = jnp.dot(dS, BD2, preferred_element_type=f32)  # [R, T*D]
        # s_ij = sum_d (q_i * k_j); q already carries `scale`
        qi = q_w[:, i * d:(i + 1) * d]
        dk_w = dk_w + dS_exp * tile_t(qi)
        dqk = dS_exp * k_w
        dqi = dqk[:, :d]
        for j in range(1, t):
            dqi = dqi + dqk[:, j * d:(j + 1) * d]
        dq_list.append(dqi)
    dq_w = jnp.concatenate(dq_list, axis=1)
    if _BWD_DEBUG_STAGE == 4:      # + attention backward loop
        return dq_w + dk_w + dv_w, zero_grads
    dq = dq_w.reshape(r * t, d) * scale
    dk = dk_w.reshape(r * t, d)
    dv = dv_w.reshape(r * t, d)
    dqkv = jnp.concatenate([dq, dk, dv], axis=1)               # [R*T, 3D]
    dWqkv = jnp.dot(y1c.T, dqkv.astype(compute_dtype),
                    preferred_element_type=f32)
    dbqkv = dqkv.sum(axis=0, keepdims=True)
    dy1 = jnp.dot(dqkv.astype(compute_dtype),
                  wqkv.T.astype(compute_dtype), preferred_element_type=f32)
    dh_ln, dg1, db1 = _ln_bwd(dy1, xhat1, rs1, g1)
    dx = (dh2 + dh_ln).reshape(r, t * d)
    return dx, (dg1, db1, dWqkv, dbqkv, dWproj, dbproj, dg2, db2,
                dW1, dbm1, dW2, dbm2)


def _encoder_bwd_kernel(num_heads, t, d, compute_dtype, x_ref, g_ref, *refs):
    """Pallas wrapper around _encoder_bwd_math with parameter-gradient
    accumulation across batch tiles (grid iterations run sequentially on
    a TensorCore, so read-modify-write on the shared grad blocks is
    race-free; tile 0 initializes)."""
    import jax.experimental.pallas as pl
    params = tuple(r[:] for r in refs[:12])
    dx_ref = refs[12]
    grad_refs = refs[13:25]
    dx, grads = _encoder_bwd_math(x_ref[:], g_ref[:], params,
                                  num_heads, t, d, compute_dtype)
    dx_ref[:] = dx
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        for gr, val in zip(grad_refs, grads):
            gr[:] = val

    @pl.when(jnp.logical_not(first))
    def _accum():
        for gr, val in zip(grad_refs, grads):
            gr[:] = gr[:] + val


def encoder_layer_bwd_pallas(x: jax.Array, g: jax.Array,
                             params: Tuple[jax.Array, ...],
                             num_heads: int, tile_rows: int = 64,
                             compute_dtype=jnp.bfloat16,
                             interpret: bool = False):
    """Fused backward: one kernel per layer computes dx AND all 12
    parameter grads by recompute + hand-derived VJP (validated against
    jax.vjp of the reference: f32-path grads ≈1e-7 relative; bf16
    compute adds ~4e-3 relative reordering noise because the recompute
    uses the fused qkv matmul while the reference splits it). Zero-padded tail rows
    contribute exactly zero to every gradient (g pads with zeros and
    every grad term is linear in the upstream cotangent).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, d = x.shape
    grid_b = -(-b // tile_rows)
    b_pad = grid_b * tile_rows
    xf = x.reshape(b, t * d)
    gf = g.reshape(b, t * d)
    if b_pad != b:
        xf = jnp.pad(xf, ((0, b_pad - b), (0, 0)))
        gf = jnp.pad(gf, ((0, b_pad - b), (0, 0)))
    prep = tuple(p[None, :] if p.ndim == 1 else p for p in params)

    kernel = functools.partial(_encoder_bwd_kernel, num_heads, t, d,
                               compute_dtype)
    tile_spec = pl.BlockSpec((tile_rows, t * d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [tile_spec, tile_spec]
    for p in prep:
        in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = [tile_spec]
    out_shapes = [jax.ShapeDtypeStruct((b_pad, t * d), jnp.float32)]
    for p in prep:
        out_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(grid_b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xf, gf, *prep)
    dx = outs[0][:b].reshape(b, t, d)
    dparams = tuple(dp.reshape(p.shape)
                    for dp, p in zip(outs[1:], params))
    return dx, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_encoder_layer(x, params, num_heads, tile_rows=64,
                        kernel_version=1, fused_bwd=False):
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
        if _interpret_override():
            return encoder_layer_pallas(x, params, num_heads,
                                        tile_rows=tile_rows,
                                        kernel_version=kernel_version,
                                        interpret=True)
        return encoder_layer_reference(x, params, num_heads)
    return encoder_layer_pallas(x, params, num_heads, tile_rows=tile_rows,
                                kernel_version=kernel_version)


def _interpret_override() -> bool:
    """``IB_PALLAS_INTERPRET=1``: on CPU, run the real Pallas kernels in
    interpret mode instead of falling back to the jnp reference — an
    end-to-end wiring check of the fused fwd/bwd paths that needs no TPU
    (slow; tests only)."""
    return os.environ.get('IB_PALLAS_INTERPRET', '') not in ('', '0')


def _fwd(x, params, num_heads, tile_rows=64, kernel_version=1,
         fused_bwd=False):
    return (fused_encoder_layer(x, params, num_heads, tile_rows,
                                kernel_version, fused_bwd), (x, params))


def _bwd(num_heads, tile_rows, kernel_version, fused_bwd, res, g):
    x, params = res
    if fused_bwd:
        on_cpu = jax.default_backend() == 'cpu'
        if not on_cpu or _interpret_override():
            # round-3 fused backward kernel (recompute + hand VJP in-kernel)
            return encoder_layer_bwd_pallas(x, g, params, num_heads,
                                            tile_rows=tile_rows,
                                            interpret=on_cpu)
    _, vjp = jax.vjp(lambda x_, p_: encoder_layer_reference(x_, p_, num_heads),
                     x, params)
    return vjp(g)


fused_encoder_layer.defvjp(_fwd, _bwd)
