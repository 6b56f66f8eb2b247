"""StableHLO model export (`main.py export`, cli/export_cmd.py).

The exported artifact must be callable from PURE jax (jax.export
deserialize) with no package/model/checkpoint machinery, match the live
model's outputs, and accept any batch size via the symbolic batch dim.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

MAIN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    'main.py')


def run_cmd(args, timeout=420):
    env = dict(os.environ, IB_PLATFORM='cpu')
    out = subprocess.run([sys.executable, MAIN, *args],
                         capture_output=True, text=True, env=env,
                         timeout=timeout)
    assert out.returncode == 0, f'{args[0]} failed:\n{out.stderr[-3000:]}'
    return out


@pytest.fixture(scope='module')
def trained(tmp_path_factory):
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    root = tmp_path_factory.mktemp('export')
    data = root / 'data'
    for split in ('train', 'dev'):
        os.makedirs(data / split)
        write_synthetic_subject(str(data / split / 's.b3d'), num_trials=1,
                                trial_length=150, seed=0)
    ck = root / 'ck'
    run_cmd(['train', '--dataset-home', str(data), '--checkpoint-dir',
             str(ck), '--no-wandb', '--epochs', '1', '--batch-size', '16',
             '--hidden-dims', '16'])
    return {'data': str(data), 'ck': str(ck), 'root': root}


def test_export_matches_live_model_and_symbolic_batch(trained, tmp_path):
    out_path = str(tmp_path / 'model.stablehlo')
    run_cmd(['export', '--dataset-home', trained['data'],
             '--checkpoint-dir', trained['ck'], '--hidden-dims', '16',
             '--out', out_path])
    sidecar = json.load(open(out_path + '.json'))
    assert sidecar['model_type'] == 'feedforward'
    assert sidecar['checkpoint']['epoch'] == 0
    assert sidecar['input']['shape'][0] == 'b'     # symbolic batch

    # consumer side: pure jax deserialize + call
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    fn = jexport.deserialize(open(out_path, 'rb').read())

    from inferbiomechanics_tpu.config import Config
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.train import (
        create_train_state, load_latest_checkpoint, make_optimizer,
    )
    from inferbiomechanics_tpu.train.loop import build_model_for_dataset
    ds = WindowDataset(os.path.join(trained['data'], 'dev'),
                       window_size=50, stride=5, skip_loading_skeletons=True)
    cfg = Config(hidden_dims=[16])
    model = build_model_for_dataset(cfg, ds)
    for b in (3, 7):                                # symbolic batch proof
        batch = ds.gather(np.arange(b))
        x = jnp.asarray(batch.inputs)
        got = fn.call(x)
        state = create_train_state(model, jax.random.PRNGKey(0), x,
                                   make_optimizer('rmsprop', 1e-4))
        state, _, _ = load_latest_checkpoint(
            state, os.path.join(trained['ck'], 'feedforward'))
        want = model.apply({'params': state.params}, x, train=False)
        for k in want:
            # bf16 compute path: the exported program is re-lowered, so
            # fusion differences add bf16-level reordering noise
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]),
                                       rtol=1e-2, atol=1e-3, err_msg=k)


def test_export_static_batch(trained, tmp_path):
    out_path = str(tmp_path / 'static.stablehlo')
    run_cmd(['export', '--dataset-home', trained['data'],
             '--checkpoint-dir', trained['ck'], '--hidden-dims', '16',
             '--out', out_path, '--static-batch', '4'])
    sidecar = json.load(open(out_path + '.json'))
    assert sidecar['input']['shape'][0] == 4


def test_export_diffusion_runtime_seed(trained, tmp_path):
    """Diffusion artifact takes the PRNG seed as a call-time argument:
    same seed -> bitwise-identical samples, different seed -> different."""
    out_path = str(tmp_path / 'diff.stablehlo')
    run_cmd(['export', '--dataset-home', trained['data'],
             '--checkpoint-dir', trained['ck'], '--model-type', 'diffusion',
             '--output-data-format', 'all_frames', '--d-model', '16',
             '--num-layers', '1', '--num-heads', '2',
             '--diffusion-timesteps', '8', '--sample-steps', '2',
             '--static-batch', '2', '--out', out_path])
    sidecar = json.load(open(out_path + '.json'))
    assert sidecar['extra_inputs'] == [{'name': 'seed', 'shape': [],
                                        'dtype': 'int32'}]
    import jax.numpy as jnp
    from jax import export as jexport
    fn = jexport.deserialize(open(out_path, 'rb').read())
    x = np.random.default_rng(0).normal(
        size=(2, sidecar['input']['shape'][1],
              sidecar['input']['shape'][2])).astype(np.float32)
    a = fn.call(x, jnp.int32(7))
    b = fn.call(x, jnp.int32(7))
    c = fn.call(x, jnp.int32(8))
    ka = sorted(a)[0]
    np.testing.assert_array_equal(np.asarray(a[ka]), np.asarray(b[ka]))
    assert not np.array_equal(np.asarray(a[ka]), np.asarray(c[ka]))


def test_export_rejects_analytical(trained, tmp_path):
    env = dict(os.environ, IB_PLATFORM='cpu')
    out = subprocess.run(
        [sys.executable, MAIN, 'export', '--dataset-home', trained['data'],
         '--checkpoint-dir', trained['ck'], '--model-type', 'analytical',
         '--out', str(tmp_path / 'x.stablehlo')],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode != 0
    assert 'analytical' in (out.stderr + out.stdout)


def test_export_quantized(trained, tmp_path):
    """export --quantize int8 serializes the quantized forward; outputs
    stay within quantization error of the f32 artifact and the int8
    weights shrink the blob."""
    f32_path = str(tmp_path / 'f32.stablehlo')
    q_path = str(tmp_path / 'q.stablehlo')
    common = ['export', '--dataset-home', trained['data'],
              '--checkpoint-dir', trained['ck'], '--hidden-dims', '16']
    run_cmd([*common, '--out', f32_path])
    run_cmd([*common, '--out', q_path, '--quantize', 'int8'])
    assert json.load(open(q_path + '.json'))['quantize'] == 'int8'
    from jax import export as jexport
    f32 = jexport.deserialize(open(f32_path, 'rb').read())
    q = jexport.deserialize(open(q_path, 'rb').read())
    sc = json.load(open(q_path + '.json'))
    x = np.random.default_rng(0).normal(
        size=(4, sc['input']['shape'][1],
              sc['input']['shape'][2])).astype(np.float32)
    a, b = f32.call(x), q.call(x)
    for k in a:
        scale = max(np.abs(np.asarray(a[k])).max(), 1e-6)
        assert np.abs(np.asarray(a[k]) - np.asarray(b[k])).max() / scale < 0.05


def test_export_diffusion_with_guidance(trained, tmp_path):
    """--guidance-scale lowers through jax.export (the [2B] CFG concat is
    part of the sampling program) and changes the samples."""
    plain = str(tmp_path / 'plain.stablehlo')
    guided = str(tmp_path / 'guided.stablehlo')
    common = ['export', '--dataset-home', trained['data'],
              '--checkpoint-dir', trained['ck'], '--model-type', 'diffusion',
              '--output-data-format', 'all_frames', '--d-model', '16',
              '--num-layers', '1', '--num-heads', '2',
              '--diffusion-timesteps', '8', '--sample-steps', '2',
              '--static-batch', '2']
    run_cmd(common + ['--out', plain])
    run_cmd(common + ['--guidance-scale', '2.0', '--out', guided])
    import jax.numpy as jnp
    from jax import export as jexport
    sidecar = json.load(open(plain + '.json'))
    x = np.random.default_rng(0).normal(
        size=(2, sidecar['input']['shape'][1],
              sidecar['input']['shape'][2])).astype(np.float32)
    fp = jexport.deserialize(open(plain, 'rb').read())
    fg = jexport.deserialize(open(guided, 'rb').read())
    a, b = fp.call(x, jnp.int32(7)), fg.call(x, jnp.int32(7))
    k = sorted(a)[0]
    assert np.isfinite(np.asarray(b[k])).all()
    assert not np.array_equal(np.asarray(a[k]), np.asarray(b[k]))
