"""Stage-wise bisect of the v2 Mosaic crash (follow-on to debug_mosaic_v2.py).

Individual constructs and the isolated attention core all compile; the
real `_encoder_kernel_v2` with 13 refs dies with `tpu_compile_helper
subprocess exit code 1`. Build the real kernel incrementally:

  stage 1: LN1 + separate QKV projections (slicing the [D,3D] weight)
  stage 2: + full attention core
  stage 3: + output projection + residual
  stage 4: + LN2 + MLP + residual  (== full v2 kernel)

Usage: python scripts/debug_mosaic_stages.py [stage ...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from inferbiomechanics_tpu.ops.pallas_encoder import (
    init_encoder_params, _layernorm)

T, D, H = 10, 256, 8
R = 64
f32 = jnp.float32
BF = jnp.bfloat16


def _bd():
    dh = D // H
    lane = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    E = (lane // dh == head).astype(f32)
    jlane = jax.lax.broadcasted_iota(jnp.int32, (T * D, T * H), 0) // D
    jcol = jax.lax.broadcasted_iota(jnp.int32, (T * D, T * H), 1) // H
    return jnp.where(jlane == jcol, jnp.tile(E, (T, T)), 0.0)


def kernel(stage, x_ref, *refs):
    (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bm1, w2, bm2) = \
        [r[:] for r in refs[:12]]
    out_ref = refs[12]
    dh = D // H
    scale = dh ** -0.5

    h = x_ref[:].astype(f32).reshape(R * T, D)
    y = _layernorm(h, g1[0], b1[0]).astype(BF)
    wq, wk, wv = (wqkv[:, :D], wqkv[:, D:2 * D], wqkv[:, 2 * D:])
    bq, bk, bv = (bqkv[0, :D], bqkv[0, D:2 * D], bqkv[0, 2 * D:])
    q = (jnp.dot(y, wq.astype(BF), preferred_element_type=f32) + bq) * scale
    k = jnp.dot(y, wk.astype(BF), preferred_element_type=f32) + bk
    v = jnp.dot(y, wv.astype(BF), preferred_element_type=f32) + bv
    if stage == 1:
        out_ref[:] = (q + k + v).reshape(R, T * D)
        return
    q_w = q.reshape(R, T * D)
    k_w = k.reshape(R, T * D)
    v_w = v.reshape(R, T * D)
    BD = _bd()
    BD2 = BD.T
    outs = []
    for i in range(T):
        qi = q_w[:, i * D:(i + 1) * D]
        qi_tile = jnp.concatenate([qi] * T, axis=1)
        s = jnp.dot(qi_tile * k_w, BD, preferred_element_type=f32)
        cols = [s[:, j * H:(j + 1) * H] for j in range(T)]
        m = cols[0]
        for c in cols[1:]:
            m = jnp.maximum(m, c)
        e = jnp.exp(s - jnp.concatenate([m] * T, axis=1))
        ecols = [e[:, j * H:(j + 1) * H] for j in range(T)]
        z = ecols[0]
        for c in ecols[1:]:
            z = z + c
        p = e * jnp.concatenate([1.0 / z] * T, axis=1)
        p_exp = jnp.dot(p, BD2, preferred_element_type=f32)
        pv = p_exp * v_w
        acc = pv[:, :D]
        for j in range(1, T):
            acc = acc + pv[:, j * D:(j + 1) * D]
        outs.append(acc)
    attn = jnp.concatenate(outs, axis=1).reshape(R * T, D)
    if stage == 2:
        out_ref[:] = attn.reshape(R, T * D)
        return
    y = jnp.dot(attn.astype(BF), wproj.astype(BF),
                preferred_element_type=f32) + bproj[0]
    h = h + y
    if stage == 3:
        out_ref[:] = h.reshape(R, T * D)
        return
    y = _layernorm(h, g2[0], b2[0]).astype(BF)
    y = jnp.dot(y, w1.astype(BF), preferred_element_type=f32) + bm1[0]
    y = jax.nn.gelu(y).astype(BF)
    y = jnp.dot(y, w2.astype(BF), preferred_element_type=f32) + bm2[0]
    out_ref[:] = (h + y).reshape(R, T * D)


def run(stage):
    params = init_encoder_params(jax.random.PRNGKey(0), D)
    prep = [p[None, :] if p.ndim == 1 else p for p in params]
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(R, T * D)).astype(np.float32))
    in_specs = [pl.BlockSpec((R, T * D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for p in prep:
        in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    fn = pl.pallas_call(
        functools.partial(kernel, stage),
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, T * D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, T * D), f32),
    )
    t0 = time.time()
    try:
        v = float(jnp.asarray(fn(x, *prep)).sum())
        print(f'stage {stage} OK   {time.time()-t0:6.1f}s  sum={v:.3e}',
              flush=True)
    except Exception as e:
        print(f'stage {stage} FAIL {time.time()-t0:6.1f}s  '
              f'{type(e).__name__}: {str(e)[:200]}', flush=True)


if __name__ == '__main__':
    stages = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4]
    for s in stages:
        run(s)
