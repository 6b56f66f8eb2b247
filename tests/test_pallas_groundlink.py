"""Fused GroundLink forward kernel (ops/pallas_groundlink.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.models.common import slice_output_heads
from inferbiomechanics_tpu.models.groundlink import Groundlink
from inferbiomechanics_tpu.ops.pallas_groundlink import (
    fused_groundlink_forward,
)


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp('plgl')
    write_synthetic_subject(str(d / 's.b3d'), num_trials=1,
                            trial_length=120, seed=0)
    return WindowDataset(str(d), window_size=20, stride=5,
                         skip_loading_skeletons=True)


def _setup(ds, fmt, dtype):
    model = Groundlink(num_dofs=ds.num_dofs,
                       num_contact_bodies=ds.num_contact_bodies,
                       root_history_len=ds.root_history_len,
                       output_data_format=fmt,
                       cnn_features=(16, 16, 24, 24),
                       compute_dtype=dtype)
    batch = ds.gather(np.arange(8))
    x = jnp.asarray(batch.inputs, jnp.float32)
    params = model.init({'params': jax.random.PRNGKey(0)}, x,
                        train=False)['params']
    return model, params, x


@pytest.mark.parametrize('fmt', ['all_frames', 'last_frame'])
def test_fused_matches_model_f32(ds, fmt):
    """CPU-fallback path (same math the kernel runs): f32 exactness vs
    the flax model — catches any conv tap / padding / layout mistake."""
    model, params, x = _setup(ds, fmt, jnp.float32)
    ref = model.apply({'params': params}, x, train=False)
    out = fused_groundlink_forward(x, params, output_data_format=fmt,
                                   compute_dtype=jnp.float32)
    got = slice_output_heads(out, ds.num_contact_bodies, out.shape[1])
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


@pytest.mark.parametrize('fmt', ['all_frames', 'last_frame'])
def test_fused_interpret_mode(ds, fmt):
    """The real pallas_call in interpret mode (BlockSpecs, padding,
    tiling) equals the plain-math fallback."""
    model, params, x = _setup(ds, fmt, jnp.float32)
    plain = fused_groundlink_forward(x, params, output_data_format=fmt,
                                     compute_dtype=jnp.float32)
    tiled = fused_groundlink_forward(x, params, output_data_format=fmt,
                                     compute_dtype=jnp.float32,
                                     tile_rows=4, interpret=True)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(plain),
                               rtol=1e-5, atol=1e-6)


def test_fused_bf16_tolerance(ds):
    """Default bf16 compute: matches the bf16 flax model at
    bf16-accumulation tolerance."""
    model, params, x = _setup(ds, 'all_frames', jnp.bfloat16)
    ref = model.apply({'params': params}, x, train=False)
    out = fused_groundlink_forward(x, params,
                                   output_data_format='all_frames')
    got = slice_output_heads(out, ds.num_contact_bodies, out.shape[1])
    for k in ref:
        a, b = np.asarray(got[k]), np.asarray(ref[k])
        scale = np.abs(b).max() + 1e-9
        assert np.abs(a - b).max() / scale < 5e-2, k
