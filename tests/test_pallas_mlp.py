"""Fused MLP kernel tests (CPU: reference path + interpret-mode kernel)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from inferbiomechanics_tpu.ops.pallas_mlp import (
    _fused_kernel, fused_mlp, mlp_reference,
)


def _params(dims, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for d0, d1 in zip(dims[:-1], dims[1:]):
        out.append((jnp.asarray(rng.normal(0, 0.05, (d0, d1)).astype(np.float32)),
                    jnp.asarray(rng.normal(0, 0.05, (d1,)).astype(np.float32))))
    return out


def test_fused_mlp_cpu_fallback_matches_reference():
    dims = [64, 32, 8]
    params = _params(dims)
    flat = tuple(p for pair in params for p in pair)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(16, 64)).astype(np.float32))
    out = fused_mlp(x, flat, 'sigmoid')
    ref = mlp_reference(x, params, 'sigmoid')
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_fused_mlp_gradients_flow():
    dims = [64, 32, 8]
    params = _params(dims)
    flat = tuple(p for pair in params for p in pair)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 64)).astype(np.float32))

    def loss(flat_params, x):
        return jnp.sum(fused_mlp(x, flat_params, 'relu') ** 2)

    grads = jax.grad(loss)(flat, x)
    assert len(grads) == 4
    for g, p in zip(grads, flat):
        assert g.shape == p.shape
        assert np.isfinite(np.asarray(g)).all()
    # matches gradient of the pure reference
    def ref_loss(flat_params, x):
        params = [(flat_params[2 * i], flat_params[2 * i + 1]) for i in range(2)]
        return jnp.sum(mlp_reference(x, params, 'relu') ** 2)
    ref_grads = jax.grad(ref_loss)(flat, x)
    for g, rg in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(rg), rtol=1e-4, atol=1e-5)


def test_kernel_interpret_mode_matches_reference():
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, dims = 128, [128, 128, 128]
    params = _params(dims, seed=3)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(B, dims[0])).astype(np.float32)).astype(jnp.bfloat16)
    Ws = [W.astype(jnp.bfloat16) for W, _ in params]
    bs = [b.reshape(1, -1) for _, b in params]
    kernel = functools.partial(_fused_kernel, 'tanh', 2)
    out = pl.pallas_call(
        kernel, grid=(1,),
        in_specs=[pl.BlockSpec((B, dims[0]), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((dims[0], dims[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((dims[1], dims[2]), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, dims[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, dims[2]), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, dims[2]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, dims[2]), jnp.float32),
        interpret=True,
    )(x, *Ws, *bs)
    ref = mlp_reference(x.astype(jnp.float32), params, 'tanh')
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_feedforward_use_pallas_param_sharing():
    """Train (jnp) and eval (fused) paths share one param tree."""
    from inferbiomechanics_tpu.models import get_model
    model = get_model('feedforward', num_dofs=23, num_contact_bodies=2,
                      history_len=20, stride=5, root_history_len=10,
                      use_pallas=True)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(4, 4, 177)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    assert 'W0' in v['params'] and 'b2' in v['params']
    out_eval = model.apply(v, x, train=False)
    out_train = model.apply(v, x, train=True)
    for k in out_eval:
        np.testing.assert_allclose(np.asarray(out_eval[k]),
                                   np.asarray(out_train[k]), atol=1e-5)
