"""Bisect which v2-kernel construct crashes the Mosaic compiler.

The v2 attention core (ops/pallas_encoder.py::_encoder_kernel_v2) is
interpret-mode correct but real Mosaic dies with `tpu_compile_helper
subprocess exit code 1` and no diagnostics. Each probe below compiles a
minimal pallas kernel containing ONE suspect construct; run them
individually to find the killer.

  python scripts/debug_mosaic_v2.py [probe ...]
  probes: bd_matmul strided_softmax lane_tile pexp_mul full_v2
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

T, D, H = 10, 256, 8
R = 64
f32 = jnp.float32


def _bd():
    dh = D // H
    lane = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    E = (lane // dh == head).astype(f32)
    jlane = jax.lax.broadcasted_iota(jnp.int32, (T * D, T * H), 0) // D
    jcol = jax.lax.broadcasted_iota(jnp.int32, (T * D, T * H), 1) // H
    return jnp.where(jlane == jcol, jnp.tile(E, (T, T)), 0.0)


def k_bd_matmul(x_ref, o_ref):
    # BD construction (iota + tile + where) and one [R,T*D]x[T*D,T*H] matmul
    BD = _bd()
    s = jnp.dot(x_ref[:], BD, preferred_element_type=f32)      # [R, T*H]
    o_ref[:] = jnp.concatenate([s] * (T * D // (T * H)), axis=1)


def k_strided_softmax(x_ref, o_ref):
    # softmax over key frames via strided 8-lane slices of [R, T*H]
    s = x_ref[:][:, :T * H]
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
    o_ref[:] = jnp.concatenate([p] * (T * D // (T * H)), axis=1)


def k_lane_tile(x_ref, o_ref):
    # qi tiling: concatenate a [R, D] slice 10x along lanes, multiply
    qi = x_ref[:][:, :D]
    o_ref[:] = jnp.concatenate([qi] * T, axis=1) * x_ref[:]


def k_pexp_mul(x_ref, o_ref):
    # p expansion back to lane space + T-slice tree sum
    BD2 = _bd().T
    p = x_ref[:][:, :T * H]
    p_exp = jnp.dot(p, BD2, preferred_element_type=f32)        # [R, T*D]
    pv = p_exp * x_ref[:]
    acc = pv[:, :D]
    for j in range(1, T):
        acc = acc + pv[:, j * D:(j + 1) * D]
    o_ref[:] = jnp.concatenate([acc] * T, axis=1)


def k_full_v2(x_ref, o_ref):
    from inferbiomechanics_tpu.ops.pallas_encoder import (
        _encoder_kernel_v2, init_encoder_params,
    )
    raise SystemExit('use bench_encoder_kernel.py for the full kernel')


def k_attn_core(n_i, x_ref, o_ref):
    # the full v2 attention core, unrolled over n_i query frames
    BD = _bd()
    BD2 = BD.T
    q_w = x_ref[:]
    k_w = x_ref[:] * 0.5
    v_w = x_ref[:] + 1.0
    outs = []
    for i in range(n_i):
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
    outs = outs + [outs[-1]] * (T - n_i)
    o_ref[:] = jnp.concatenate(outs, axis=1)


PROBES = {
    'bd_matmul': k_bd_matmul,
    'strided_softmax': k_strided_softmax,
    'lane_tile': k_lane_tile,
    'pexp_mul': k_pexp_mul,
}
for _n in (1, 2, 4, 10):
    PROBES[f'attn_core:{_n}'] = functools.partial(k_attn_core, _n)


def run(name):
    kern = PROBES[name]
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(R, T * D)).astype(np.float32))
    fn = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((R, T * D), f32))
    t0 = time.time()
    try:
        v = float(jnp.asarray(fn(x)).sum())
        print(f'{name:16s} OK   {time.time()-t0:6.1f}s  sum={v:.3e}',
              flush=True)
    except Exception as e:
        print(f'{name:16s} FAIL {time.time()-t0:6.1f}s  '
              f'{type(e).__name__}: {str(e)[:160]}', flush=True)


if __name__ == '__main__':
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        run(n)
