"""TPU micro-benchmark: fused encoder-layer kernel variants.

Chained 4-layer encoder FORWARD (iteration feeds iteration, trailing
scalar readback) for {xla reference, pallas v1, pallas v2} x tile_rows.
Round-2 context: v1 at tile_rows=64 ran 4.42 ms vs 6.88 ms XLA at
B=4096 (BENCH_NOTES.md); VERDICT r3 #2 asks for ~2x on the fused
forward. Levers measured here: kernel_version=2 (key-frame-batched
attention core, 10x fewer matmuls) and tile_rows (M-dimension MXU fill
+ per-batch op-issue count).

Run foreground on the TPU:
  python scripts/bench_encoder_kernel.py [B] [layers] [variants]
  variants: comma list of xla | v1:64 | v1:128 | v2:64 | v2:128 | v2:256
"""

from __future__ import annotations

import sys
import time


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    variants = (sys.argv[3].split(',') if len(sys.argv) > 3
                else ['xla', 'v1:64', 'v1:128', 'v2:64', 'v2:128', 'v2:256'])
    T, D, H = 10, 256, 8

    import jax
    import jax.numpy as jnp
    import numpy as np
    from inferbiomechanics_tpu.ops.pallas_encoder import (
        encoder_layer_pallas, encoder_layer_reference, init_encoder_params,
    )

    params = [init_encoder_params(jax.random.PRNGKey(i), D)
              for i in range(layers)]
    x0 = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, T, D)).astype(np.float32))

    for variant in variants:
        if variant == 'xla':
            def encoder(x):
                for p in params:
                    x = encoder_layer_reference(x, p, H)
                return x
        else:
            ver, rows = variant.split(':')
            ver, rows = int(ver[1:]), int(rows)
            def encoder(x, ver=ver, rows=rows):
                for p in params:
                    x = encoder_layer_pallas(x, p, H, tile_rows=rows,
                                             kernel_version=ver)
                return x

        @jax.jit
        def step(x):
            y = encoder(x)
            # keep magnitudes bounded so the chain can run forever
            return y / jnp.maximum(1.0, jnp.sqrt((y * y).mean()))

        try:
            t0 = time.time()
            x = step(x0)
            _ = float(x.sum())     # readback = the only reliable sync
            compile_s = time.time() - t0
            n = 30
            t0 = time.time()
            for _ in range(n):
                x = step(x)
            _ = float(x.sum())
            dt = (time.time() - t0) / n
            print(f'{variant:8s} B={B} L={layers}: {dt*1e3:7.2f} ms fwd '
                  f'(compile {compile_s:.0f}s)', flush=True)
        except Exception as e:
            print(f'{variant:8s} FAILED: {type(e).__name__}: '
                  f'{str(e)[:200]}', flush=True)


if __name__ == '__main__':
    main()
