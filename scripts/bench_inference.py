"""Serving/inference throughput across model families (chained + readback).

Replaces the retracted round-1 inference table (which was measured with
unreliable sync). Chained: each forward consumes the previous output's
data (a feedback term), so dispatches serialize on device.

Run foreground on TPU:  python scripts/bench_inference.py [B]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def chain_bench(name, fwd, x0, n=30):
    """fwd: x -> output dict/array. The chain step (x', out) is computed
    IN-JIT so iterations serialize via data dependency without eager
    host-side arithmetic (which is slow over the tunnel)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def g(x):
        y = fwd(x)
        leaf = jax.tree_util.tree_leaves(y)[0].astype(jnp.float32)
        # tiny feedback term chains iteration i+1 to i's output
        return x + (1e-12 * leaf.reshape(-1)[0]).astype(x.dtype), y

    t0 = time.time()
    x, y = g(x0)
    _ = float(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32).sum())
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        x, y = g(x)
    _ = float(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32).sum())
    dt = (time.time() - t0) / n
    B = x0.shape[0]
    print(f'{name:34s}: {dt*1e3:7.2f} ms ({B/dt/1e6:6.2f}M w/s) compile {c:.0f}s',
          flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    import jax
    import jax.numpy as jnp
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.models import get_model
    from inferbiomechanics_tpu.models.transformer import (
        fused_transformer_forward,
    )

    tmp = '/tmp/ib_bench_tf'
    os.makedirs(tmp, exist_ok=True)
    p = os.path.join(tmp, 's.b3d')
    if not os.path.exists(p):
        write_synthetic_subject(p, num_trials=4, trial_length=4000, seed=0)
    ds = WindowDataset(tmp, window_size=50, stride=5,
                       skip_loading_skeletons=True)
    batch = ds.gather(np.arange(B))
    x = jnp.asarray(batch.inputs)

    ff = get_model('feedforward', num_dofs=23, num_contact_bodies=2,
                   history_len=50, stride=5, root_history_len=10)
    ff_params = ff.init(jax.random.PRNGKey(0), x, train=False)['params']
    chain_bench('feedforward XLA',
                lambda x: ff.apply({'params': ff_params}, x, train=False), x)

    gl = get_model('groundlink', num_dofs=23, num_contact_bodies=2,
                   history_len=50, stride=5, root_history_len=10)
    gl_params = gl.init(jax.random.PRNGKey(0), x, train=False)['params']
    chain_bench('groundlink XLA',
                lambda x: gl.apply({'params': gl_params}, x, train=False), x)

    tf = get_model('transformer', num_dofs=23, num_contact_bodies=2,
                   history_len=50, stride=5, root_history_len=10)
    tf_params = tf.init(jax.random.PRNGKey(0), x, train=False)['params']
    chain_bench('transformer vpu XLA',
                lambda x: tf.apply({'params': tf_params}, x, train=False), x)
    chain_bench('transformer fused Pallas encoder',
                lambda x: fused_transformer_forward(tf, tf_params, x), x)


if __name__ == '__main__':
    main()
