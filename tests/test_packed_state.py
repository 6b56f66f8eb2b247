"""Packed-state train step (train/packed.py): parity with the standard step."""

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.loss import LossConfig
from inferbiomechanics_tpu.models import get_model
from inferbiomechanics_tpu.train import create_train_state, make_optimizer
from inferbiomechanics_tpu.train.device_data import (
    DeviceResidentData, make_device_train_step,
)
from inferbiomechanics_tpu.train.packed import (
    PackSpec, make_pack_spec, make_packed_device_train_step, pack, unpack,
)


def test_pack_unpack_roundtrip_mixed_dtypes():
    tree = {'a': jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            'b': {'c': jnp.asarray(7, jnp.int32),
                  'd': jnp.ones((4,), jnp.float32)},
            'e': jnp.zeros((2, 2), jnp.bfloat16)}
    spec = make_pack_spec(tree)
    bufs = pack(spec, tree)
    assert set(bufs) == {'float32', 'int32', 'bfloat16'}
    assert bufs['float32'].shape == (10,)
    out = jax.tree_util.tree_map(np.asarray, unpack(spec, bufs))
    np.testing.assert_array_equal(out['a'], np.arange(6).reshape(2, 3))
    assert out['b']['c'] == 7
    np.testing.assert_array_equal(out['e'], np.zeros((2, 2)))


def test_packed_step_matches_standard_step(tmp_path):
    d = tmp_path / 'data'
    d.mkdir()
    write_synthetic_subject(str(d / 's.b3d'), num_trials=1, trial_length=120,
                            seed=0)
    ds = WindowDataset(str(d), window_size=20, stride=5,
                       skip_loading_skeletons=True)
    data = DeviceResidentData(ds, feature_dtype=jnp.float32)
    model = get_model('transformer', num_dofs=23, num_contact_bodies=2,
                      history_len=20, stride=5, root_history_len=10,
                      d_model=32, num_layers=1, num_heads=4)
    sample = ds.gather(np.arange(8))

    def fresh():
        return create_train_state(model, jax.random.PRNGKey(0),
                                  jnp.asarray(sample.inputs),
                                  make_optimizer('adam', 1e-3))

    lc = LossConfig()
    idx = jnp.asarray(np.arange(8), jnp.int32)
    rng = jax.random.PRNGKey(1)

    state = fresh()
    std_step = make_device_train_step(model, data, lc, donate=False)
    losses_std = []
    for k in range(4):
        state, m = std_step(state, idx, jax.random.fold_in(rng, k))
        losses_std.append(float(m['loss']))

    template = fresh()
    pack_state, pstep, unpack_params = make_packed_device_train_step(
        model, data, lc, template)
    packed = pack_state(template)
    losses_packed = []
    for k in range(4):
        packed, m = pstep(packed, idx, jax.random.fold_in(rng, k))
        losses_packed.append(float(m['loss']))

    np.testing.assert_allclose(losses_packed, losses_std, rtol=1e-5)
    params_std = jax.tree_util.tree_leaves(state.params)
    params_packed = jax.tree_util.tree_leaves(unpack_params(packed))
    for a, b in zip(params_std, params_packed):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert int(packed.step) == 4
