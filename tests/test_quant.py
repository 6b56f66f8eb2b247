"""int8 quantized serving (ops/quant.py, serve --quantize int8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.config import Config
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.ops.quant import (
    qdense, quantize_feedforward_params, quantize_weight,
    quantized_feedforward_forward,
)
from inferbiomechanics_tpu.train import (
    create_train_state, make_optimizer, save_checkpoint,
)
from inferbiomechanics_tpu.train.loop import build_model_for_dataset


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp('quant')
    write_synthetic_subject(str(d / 's.b3d'), num_trials=2,
                            trial_length=200, seed=11)
    return WindowDataset(str(d), window_size=20, stride=5,
                         skip_loading_skeletons=True)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32)) * 3.0
    w_q, s_w = quantize_weight(w)
    assert w_q.dtype == jnp.int8
    assert np.abs(np.asarray(w_q)).max() <= 127
    back = np.asarray(w_q, np.float32) * np.asarray(s_w)[None, :]
    # per-column max error is one quantization step
    step = np.asarray(s_w)
    assert (np.abs(back - np.asarray(w)).max(axis=0) <= step + 1e-7).all()


def test_quantize_weight_zero_column():
    w = jnp.zeros((8, 4), jnp.float32)
    w_q, s_w = quantize_weight(w)
    assert np.asarray(w_q).max() == 0
    assert np.isfinite(np.asarray(s_w)).all()


def test_qdense_close_to_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96, 48)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
    w_q, s_w = quantize_weight(w)
    got = np.asarray(qdense(x, w_q, s_w, b))
    want = np.asarray(x @ w + b)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.02, f'int8 dense rel err {rel:.4f}'


def _trained_bits(ds):
    cfg = Config()
    cfg.model_type = 'feedforward'
    cfg.window_size, cfg.stride = 20, 5
    cfg.dropout = False
    model = build_model_for_dataset(cfg, ds)
    sample = ds.gather(np.arange(16))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(sample.inputs),
                               make_optimizer('adam', 1e-3))
    return cfg, model, state, sample


def test_quantized_forward_close_to_f32(ds):
    _, model, state, sample = _trained_bits(ds)
    x = jnp.asarray(sample.inputs)
    want = model.apply({'params': state.params}, x, train=False)
    fwd = jax.jit(quantized_feedforward_forward(model, state.params))
    got = fwd(x)
    assert set(got) == set(want)
    for k in want:
        w, g = np.asarray(want[k]), np.asarray(got[k])
        scale = max(np.abs(w).max(), 1e-6)
        rel = np.abs(g - w).max() / scale
        # two quantized layers compound: a few % of the output range
        assert rel < 0.05, f'{k}: rel err {rel:.4f}'


def test_quantize_params_layer_naming(ds):
    _, model, state, _ = _trained_bits(ds)
    q = quantize_feedforward_params(state.params)
    assert sorted(q) == ['Dense_0', 'Dense_1', 'Dense_2']
    for layer in q.values():
        assert layer['w_q'].dtype == jnp.int8


def test_quantized_service_predict(ds, tmp_path):
    """serve --quantize int8: predictions stay close to the f32 service
    and /schema reports the mode."""
    from inferbiomechanics_tpu.serve import InferenceService
    cfg, model, state, sample = _trained_bits(ds)
    ckpt = str(tmp_path / 'ck')
    save_checkpoint(ckpt, state, 0, 0)
    f32_svc = InferenceService(cfg, ckpt, ds, max_batch=64)
    q_svc = InferenceService(cfg, ckpt, ds, max_batch=64, quantize='int8')
    assert q_svc.schema()['quantize'] == 'int8'
    x = np.asarray(sample.inputs)
    want = f32_svc.predict_packed(x)
    got = q_svc.predict_packed(x)
    for k in want:
        scale = max(np.abs(want[k]).max(), 1e-6)
        assert np.abs(got[k] - want[k]).max() / scale < 0.05


def test_quantized_service_rejects_unsupported(ds, tmp_path):
    from inferbiomechanics_tpu.serve import InferenceService
    cfg, model, state, _ = _trained_bits(ds)
    ckpt = str(tmp_path / 'ck2')
    save_checkpoint(ckpt, state, 0, 0)
    with pytest.raises(ValueError, match='int8'):
        InferenceService(cfg, ckpt, ds, quantize='int4')
    cfg_t = Config()
    cfg_t.model_type = 'transformer'
    cfg_t.window_size, cfg_t.stride = 20, 5
    with pytest.raises(ValueError, match='feedforward'):
        InferenceService(cfg_t, str(tmp_path / 'nock'), ds, quantize='int8')


def test_analyze_quantized_cli(ds, tmp_path):
    """analyze --quantize int8 reports metrics close to the f32 analyze
    (quantifying serve --quantize's accuracy cost)."""
    import os
    import re
    import subprocess
    import sys
    cfg, model, state, _ = _trained_bits(ds)
    ckpt_root = tmp_path / 'ck'
    save_checkpoint(str(ckpt_root / 'feedforward'), state, 0, 0)
    data = tmp_path / 'data'
    os.makedirs(data / 'dev')
    os.makedirs(data / 'train')
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    for split in ('dev', 'train'):
        write_synthetic_subject(str(data / split / 's.b3d'), num_trials=2,
                                trial_length=200, seed=11)
    MAIN = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'main.py')
    env = dict(os.environ, IB_PLATFORM='cpu')
    base = ['analyze', '--dataset-home', str(data), '--checkpoint-dir',
            str(ckpt_root), '--no-wandb', '--history-len', '20',
            '--stride', '5', '--short']

    def force_err(extra):
        out = subprocess.run([sys.executable, MAIN, *base, *extra],
                             capture_output=True, text=True, env=env,
                             timeout=420)
        assert out.returncode == 0, out.stderr[-3000:]
        m = re.search(r'Force Avg Err: ([0-9.]+)', out.stdout)
        assert m, out.stdout[-2000:]
        return float(m.group(1)), out.stdout

    f32_err, _ = force_err([])
    q_err, q_out = force_err(['--quantize', 'int8'])
    assert 'evaluating int8-quantized forward' in q_out
    assert abs(q_err - f32_err) / max(f32_err, 1e-6) < 0.05
