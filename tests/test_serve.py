"""Batch-inference HTTP server tests (inferbiomechanics_tpu/serve.py)."""

import base64
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.config import Config
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.keys import OutputDataKeys
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.serve import InferenceService, serve
from inferbiomechanics_tpu.train import (
    create_train_state, make_optimizer, save_checkpoint,
)
from inferbiomechanics_tpu.train.loop import build_model_for_dataset


@pytest.fixture(scope='module')
def service(tmp_path_factory):
    d = tmp_path_factory.mktemp('servedata')
    write_synthetic_subject(str(d / 's.b3d'), num_trials=2,
                            trial_length=120, seed=0)
    cfg = Config()
    cfg.model_type = 'feedforward'
    cfg.window_size, cfg.stride = 20, 5
    ds = WindowDataset(str(d), window_size=20, stride=5,
                       skip_loading_skeletons=True)
    # write a checkpoint the service will pick up
    model = build_model_for_dataset(cfg, ds)
    sample = ds.gather(np.arange(4))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(sample.inputs),
                               make_optimizer('adam', 1e-3))
    ckpt = str(tmp_path_factory.mktemp('serveckpt'))
    save_checkpoint(ckpt, state, 3, 7)
    svc = InferenceService(cfg, ckpt, ds, max_batch=64)
    svc._test_file = str(d / 's.b3d')
    return svc


@pytest.fixture(scope='module')
def base_url(service):
    server = serve(service, host='127.0.0.1', port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f'http://127.0.0.1:{server.server_address[1]}'
    server.shutdown()
    server.server_close()


def _post(url, payload, timeout=60):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


def test_health_and_schema(base_url, service):
    h = _get(base_url + '/health')
    assert h['status'] == 'ok' and h['model'] == 'feedforward'
    assert h['epoch'] == 3 and h['batch'] == 7   # checkpoint provenance
    s = _get(base_url + '/schema')
    assert s['num_model_frames'] == 4
    assert s['num_input_channels'] == service.ds.num_input_channels
    assert {e['key'] for e in s['label_layout']} >= {
        OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME}
    # provenance block always present; None for pre-sidecar dirs
    assert 'run_config' in s and s['run_config'] is None


def test_schema_surfaces_run_config_sidecar(tmp_path, service):
    """A checkpoint dir trained with a run_config.json sidecar exposes it
    through GET /schema as provenance (serve.py _schema_run_config)."""
    from inferbiomechanics_tpu.train.run_config import save_run_config
    ckpt = str(tmp_path / 'ckpt')
    cfg = Config()
    cfg.model_type = 'feedforward'
    cfg.window_size, cfg.stride = 20, 5
    cfg.hidden_dims = [32]
    model = build_model_for_dataset(cfg, service.ds)
    sample = service.ds.gather(np.arange(4))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(sample.inputs),
                               make_optimizer('adam', 1e-3))
    save_checkpoint(ckpt, state, 0, 0)
    save_run_config(ckpt, cfg)
    svc = InferenceService(cfg, ckpt, service.ds, max_batch=16)
    rc = svc.schema()['run_config']
    assert rc is not None
    assert rc['model_type'] == 'feedforward'
    assert [int(h) for h in rc['hidden_dims']] == [32]
    assert rc['window_size'] == 20 and rc['stride'] == 5


def test_predict_raw_windows(base_url, service):
    batch = service.ds.gather(np.arange(5))
    x = np.asarray(batch.inputs)
    res = _post(base_url + '/predict', {'inputs': x.tolist()})
    assert res['batch'] == 5
    f = np.asarray(res['outputs'][
        OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME])
    assert f.shape == (5, 1, 6)                  # last_frame format
    assert np.isfinite(f).all()
    # padding to the bucket must not change results: same rows, B=2
    res2 = _post(base_url + '/predict', {'inputs': x[:2].tolist()})
    f2 = np.asarray(res2['outputs'][
        OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME])
    np.testing.assert_allclose(f2, f[:2], rtol=1e-5, atol=1e-5)


def test_predict_b64_roundtrip(base_url, service):
    batch = service.ds.gather(np.arange(3))
    x = np.ascontiguousarray(batch.inputs, '<f4')
    res = _post(base_url + '/predict', {
        'inputs_b64': base64.b64encode(x.tobytes()).decode(),
        'shape': list(x.shape), 'encoding': 'b64'})
    enc = res['outputs'][OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME]
    f = np.frombuffer(base64.b64decode(enc['b64']),
                      '<f4').reshape(enc['shape'])
    assert f.shape == (3, 1, 6) and np.isfinite(f).all()


def test_predict_file(base_url, service):
    res = _post(base_url + '/predict_file',
                {'file': service._test_file, 'trial': 1, 'max_windows': 7})
    assert len(res['window_starts']) == 7
    assert res['last_frame'][0] == res['window_starts'][0] + 3 * 5
    f = np.asarray(res['outputs'][
        OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME])
    assert f.shape[0] == 7


def test_error_paths(base_url, service):
    # wrong shape -> 400 with the schema hint
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base_url + '/predict',
              {'inputs': np.zeros((2, 3, 4)).tolist()})
    assert e.value.code == 400
    assert 'schema' in json.loads(e.value.read())['error']
    # oversized batch -> 400
    too_big = np.zeros((65, service.ds.num_model_frames,
                        service.ds.num_input_channels))
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base_url + '/predict', {'inputs': too_big.tolist()})
    assert e.value.code == 400
    # bad JSON -> 400
    req = urllib.request.Request(
        base_url + '/predict', data=b'{not json',
        headers={'Content-Type': 'application/json'})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # unknown path -> 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base_url + '/nope')
    assert e.value.code == 404
    # missing file -> 4xx
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base_url + '/predict_file', {'file': '/tmp/does/not/exist.b3d'})
    assert e.value.code in (400, 404)


def test_concurrent_clients(base_url, service):
    """ThreadingHTTPServer + the device lock: parallel clients all get
    correct, batch-matched responses (no cross-request mixups)."""
    import concurrent.futures

    batch = service.ds.gather(np.arange(8))
    x = np.asarray(batch.inputs)

    def one(i):
        n = 1 + (i % 4)
        res = _post(base_url + '/predict', {'inputs': x[:n].tolist()})
        f = np.asarray(res['outputs'][
            OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME])
        return n, res['batch'], f.shape

    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
        for n, b, shape in ex.map(one, range(12)):
            assert b == n and shape == (n, 1, 6)


def test_analytical_rejected(service):
    cfg = Config()
    cfg.model_type = 'analytical'
    with pytest.raises(ValueError, match='analytical'):
        InferenceService(cfg, '/tmp/nock', service.ds)


def test_transformer_service(service, tmp_path):
    """serve works for the transformer family too (no checkpoint: warns
    and serves the init model)."""
    cfg = Config()
    cfg.model_type = 'transformer'
    cfg.window_size, cfg.stride = 20, 5
    cfg.d_model, cfg.num_layers, cfg.num_heads = 64, 1, 4
    svc = InferenceService(cfg, str(tmp_path / 'none'), service.ds,
                           max_batch=32)
    batch = service.ds.gather(np.arange(3))
    out = svc.predict_packed(np.asarray(batch.inputs))
    f = out[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME]
    assert f.shape == (3, 1, 6) and np.isfinite(f).all()


def test_empty_schema_dataset_rejected(tmp_path):
    """A windowless schema dataset (trials shorter than the window) must
    raise a clear startup error, not IndexError in the init gather."""
    write_synthetic_subject(str(tmp_path / 'tiny.b3d'), num_trials=1,
                            trial_length=10, seed=0)   # < window 20
    ds = WindowDataset(str(tmp_path), window_size=20, stride=5,
                       skip_loading_skeletons=True)
    assert len(ds) == 0
    cfg = Config()
    cfg.window_size, cfg.stride = 20, 5
    with pytest.raises(ValueError, match='no complete windows'):
        InferenceService(cfg, '/tmp/nock2', ds)


# -----------------------------------------------------------------------------
# Ensemble serving
# -----------------------------------------------------------------------------


@pytest.fixture(scope='module')
def ensemble_service(service, tmp_path_factory):
    """Two checkpoints with DIFFERENT params served as one ensemble."""
    cfg = Config()
    cfg.model_type = 'feedforward'
    cfg.window_size, cfg.stride = 20, 5
    ds = service.ds
    model = build_model_for_dataset(cfg, ds)
    sample = ds.gather(np.arange(4))
    dirs = []
    for seed in (0, 1):
        st = create_train_state(model, jax.random.PRNGKey(seed),
                                jnp.asarray(sample.inputs),
                                make_optimizer('adam', 1e-3))
        d = str(tmp_path_factory.mktemp(f'ens{seed}'))
        save_checkpoint(d, st, seed, 0)
        dirs.append(d)
    svc = InferenceService(cfg, dirs[0], ds, max_batch=64, ensemble=dirs)
    svc._member_dirs = dirs
    return svc


def test_ensemble_mean_and_spread(ensemble_service, service):
    """Ensemble mean == average of per-member predictions; spread is the
    across-member std (here: |a-b|/2 for two members)."""
    ds = ensemble_service.ds
    batch = ds.gather(np.arange(4))
    x = np.asarray(batch.inputs)
    out, spread = ensemble_service.predict_packed(x, with_spread=True)
    key = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME

    # per-member predictions via single-model services
    cfg = ensemble_service.config
    singles = [InferenceService(cfg, d, ds, max_batch=64).predict_packed(x)
               for d in ensemble_service._member_dirs]
    np.testing.assert_allclose(
        out[key], (singles[0][key] + singles[1][key]) / 2,
        rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(
        spread[key], np.abs(singles[0][key] - singles[1][key]) / 2,
        rtol=2e-4, atol=1e-5)
    assert float(np.max(spread[key])) > 0   # members genuinely differ


def test_ensemble_http(ensemble_service):
    server = serve(ensemble_service, host='127.0.0.1', port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f'http://127.0.0.1:{server.server_address[1]}'
    try:
        h = _get(url + '/health')
        assert h['ensemble_size'] == 2
        s = _get(url + '/schema')
        assert s['ensemble']['size'] == 2
        assert len(s['ensemble']['members']) == 2
        batch = ensemble_service.ds.gather(np.arange(3))
        res = _post(url + '/predict', {'inputs': np.asarray(batch.inputs).tolist(),
                                       'spread': True})
        key = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
        assert np.asarray(res['outputs'][key]).shape == (3, 1, 6)
        assert np.asarray(res['spread'][key]).shape == (3, 1, 6)
        # spread is optional and off by default
        res2 = _post(url + '/predict',
                     {'inputs': np.asarray(batch.inputs).tolist()})
        assert 'spread' not in res2
    finally:
        server.shutdown()
        server.server_close()


def test_ensemble_single_model_spread_is_null(base_url, service):
    batch = service.ds.gather(np.arange(2))
    res = _post(base_url + '/predict',
                {'inputs': np.asarray(batch.inputs).tolist(), 'spread': True})
    assert res['spread'] is None


def test_ensemble_bad_member_rejected(service, tmp_path):
    cfg = Config()
    cfg.model_type = 'feedforward'
    cfg.window_size, cfg.stride = 20, 5
    empty = str(tmp_path / 'empty')
    import os
    os.makedirs(empty)
    with pytest.raises(ValueError, match='no\\s+checkpoints'):
        InferenceService(cfg, empty, service.ds, ensemble=[empty])
    with pytest.raises(FileNotFoundError):
        InferenceService(cfg, empty, service.ds,
                         ensemble=[str(tmp_path / 'nope.ckpt')])


# -----------------------------------------------------------------------------
# Dynamic batching
# -----------------------------------------------------------------------------


def test_dynamic_batching_coalesces_and_is_correct(tmp_path_factory, service):
    """Concurrent clients coalesce into fewer device forwards; every
    client still receives exactly its own rows' predictions."""
    import concurrent.futures

    cfg = Config()
    cfg.model_type = 'feedforward'
    cfg.window_size, cfg.stride = 20, 5
    ds = service.ds
    model = build_model_for_dataset(cfg, ds)
    sample = ds.gather(np.arange(4))
    state = create_train_state(model, jax.random.PRNGKey(2),
                               jnp.asarray(sample.inputs),
                               make_optimizer('adam', 1e-3))
    ckpt = str(tmp_path_factory.mktemp('dynckpt'))
    save_checkpoint(ckpt, state, 0, 0)
    svc = InferenceService(cfg, ckpt, ds, max_batch=64, batch_wait_ms=30.0)
    direct = InferenceService(cfg, ckpt, ds, max_batch=64)

    batch = ds.gather(np.arange(12))
    x = np.asarray(batch.inputs)
    key = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
    want = direct.predict_packed(x)[key]

    def one(i):
        rows = x[i:i + 2]                      # client i asks for rows i..i+1
        out = svc.predict(rows)
        return i, out[key]

    with concurrent.futures.ThreadPoolExecutor(max_workers=10) as ex:
        results = list(ex.map(one, range(10)))
    for i, got in results:
        np.testing.assert_allclose(got, want[i:i + 2], rtol=1e-5, atol=1e-6,
                                   err_msg=f'client {i} got wrong rows')
    # 10 concurrent 2-row requests must coalesce into FEWER forwards
    assert svc.batcher.forwards < 10, svc.batcher.forwards
    svc.batcher.close()


def test_dynamic_batching_error_isolation(tmp_path_factory, service):
    """A bad request fails fast at validation and never poisons a
    coalesced group."""
    cfg = Config()
    cfg.model_type = 'feedforward'
    cfg.window_size, cfg.stride = 20, 5
    ds = service.ds
    model = build_model_for_dataset(cfg, ds)
    sample = ds.gather(np.arange(4))
    state = create_train_state(model, jax.random.PRNGKey(2),
                               jnp.asarray(sample.inputs),
                               make_optimizer('adam', 1e-3))
    ckpt = str(tmp_path_factory.mktemp('dynckpt2'))
    save_checkpoint(ckpt, state, 0, 0)
    svc = InferenceService(cfg, ckpt, ds, max_batch=8, batch_wait_ms=5.0)
    with pytest.raises(ValueError, match='inputs must be'):
        svc.predict(np.zeros((2, 3, 4), np.float32))
    with pytest.raises(ValueError, match='exceeds max_batch'):
        svc.predict(np.zeros((9, ds.num_model_frames,
                              ds.num_input_channels), np.float32))
    # good request still works afterwards
    batch = ds.gather(np.arange(2))
    out = svc.predict(np.asarray(batch.inputs))
    key = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
    assert np.isfinite(np.asarray(out[key])).all()
    svc.batcher.close()


def test_metrics_endpoint(base_url, service):
    batch = service.ds.gather(np.arange(3))
    _post(base_url + '/predict', {'inputs': np.asarray(batch.inputs).tolist()})
    with pytest.raises(urllib.error.HTTPError):
        _post(base_url + '/predict', {'inputs': [[[0.0]]]})   # bad shape
    m = _get(base_url + '/metrics')
    assert m['requests'] >= 2
    assert m['rows'] >= 3
    assert m['errors'] >= 1
    assert m['device_forwards'] >= 1
    assert m['latency_ms']['p50'] >= 0
    assert m['latency_ms']['max'] >= m['latency_ms']['p50']


def test_diffusion_service(service, tmp_path):
    """Diffusion serving: /predict runs a DDIM sampling chain conditioned
    on the request windows and returns all_frames outputs."""
    cfg = Config()
    cfg.model_type = 'diffusion'
    cfg.output_data_format = 'all_frames'
    cfg.window_size, cfg.stride = 20, 5
    cfg.d_model, cfg.num_layers, cfg.num_heads = 32, 1, 4
    svc = InferenceService(cfg, str(tmp_path / 'none'), service.ds,
                           max_batch=8, sample_steps=4)
    batch = service.ds.gather(np.arange(2))
    out = svc.predict_packed(np.asarray(batch.inputs))
    k = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
    assert out[k].shape == (2, 4, 6)            # all frames, T=4
    assert np.isfinite(out[k]).all()
    s = svc.schema()
    assert s['diffusion_sample_steps'] == 4
    # deterministic: same request, same samples
    out2 = svc.predict_packed(np.asarray(batch.inputs))
    np.testing.assert_allclose(out[k], out2[k], rtol=1e-6)


def test_diffusion_partial_denoising_service(service, tmp_path):
    """serve --diffusion-partial: chains warm-start from an all-frames
    feedforward proposal; outputs stay finite and differ from the
    full-chain service; missing --init-checkpoint fails fast."""
    from inferbiomechanics_tpu.models import get_model
    from inferbiomechanics_tpu.train import (
        create_train_state, make_optimizer, save_checkpoint,
    )
    import jax

    ds = service.ds
    cfg = Config()
    cfg.model_type = 'diffusion'
    cfg.output_data_format = 'all_frames'
    cfg.window_size, cfg.stride = 20, 5
    cfg.d_model, cfg.num_layers, cfg.num_heads = 32, 1, 4

    # all-frames feedforward proposal checkpoint
    prop_cfg_model = get_model(
        'feedforward', num_dofs=ds.num_dofs,
        num_contact_bodies=ds.num_contact_bodies,
        history_len=20, stride=5, root_history_len=ds.root_history_len,
        output_data_format='all_frames', hidden_dims=list(cfg.hidden_dims))
    sample = ds.gather(np.arange(4))
    st = create_train_state(prop_cfg_model, jax.random.PRNGKey(3),
                            jnp.asarray(sample.inputs),
                            make_optimizer('adam', 1e-3))
    prop_dir = str(tmp_path / 'prop')
    save_checkpoint(prop_dir, st, 0, 0)

    svc = InferenceService(cfg, str(tmp_path / 'noned'), ds,
                           max_batch=8, sample_steps=4,
                           diffusion_partial=0.5, init_checkpoint=prop_dir)
    full = InferenceService(cfg, str(tmp_path / 'noned'), ds,
                            max_batch=8, sample_steps=4)
    x = np.asarray(ds.gather(np.arange(2)).inputs)
    out = svc.predict_packed(x)
    k = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
    assert out[k].shape == (2, 4, 6)
    assert np.isfinite(out[k]).all()
    out_full = full.predict_packed(x)
    assert float(np.abs(np.asarray(out[k])
                        - np.asarray(out_full[k])).max()) > 0

    with pytest.raises(ValueError, match='init-checkpoint'):
        InferenceService(cfg, str(tmp_path / 'noned'), ds, max_batch=8,
                         sample_steps=4, diffusion_partial=0.5)


def test_diffusion_service_rejections(service, tmp_path):
    cfg = Config()
    cfg.model_type = 'diffusion'
    cfg.window_size, cfg.stride = 20, 5
    with pytest.raises(ValueError, match='all_frames'):
        InferenceService(cfg, str(tmp_path / 'x'), service.ds)
    cfg.output_data_format = 'all_frames'
    with pytest.raises(ValueError, match='soup'):
        InferenceService(cfg, str(tmp_path / 'x'), service.ds,
                         ensemble=['a', 'b'])
    # partial-denoise flags fail fast instead of being silently ignored
    ff = Config()
    ff.window_size, ff.stride = 20, 5
    with pytest.raises(ValueError, match='diffusion-partial'):
        InferenceService(ff, str(tmp_path / 'x'), service.ds,
                         diffusion_partial=0.5,
                         init_checkpoint=str(tmp_path / 'p'))
    with pytest.raises(ValueError, match='init-checkpoint'):
        InferenceService(cfg, str(tmp_path / 'x'), service.ds,
                         init_checkpoint=str(tmp_path / 'p'))


def test_ensemble_with_dynamic_batching(ensemble_service, service):
    """The batcher coalesces mixed spread/no-spread ensemble requests and
    hands each client its own rows (tuple-output path)."""
    import concurrent.futures
    cfg = ensemble_service.config
    svc = InferenceService(cfg, ensemble_service._member_dirs[0], service.ds,
                           max_batch=64,
                           ensemble=ensemble_service._member_dirs,
                           batch_wait_ms=25.0)
    batch = service.ds.gather(np.arange(8))
    x = np.asarray(batch.inputs)
    key = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
    want, want_spread = ensemble_service.predict_packed(x, with_spread=True)

    def one(i):
        rows = x[i:i + 2]
        if i % 2:
            out, spread = svc.predict(rows, with_spread=True)
            return i, out[key], spread[key]
        return i, svc.predict(rows)[key], None

    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(one, range(6)))
    for i, got, spread in results:
        np.testing.assert_allclose(got, want[key][i:i + 2],
                                   rtol=1e-5, atol=1e-5)
        if spread is not None:
            np.testing.assert_allclose(spread, want_spread[key][i:i + 2],
                                       rtol=1e-4, atol=1e-5)
    assert svc.batcher.forwards < 6
    svc.batcher.close()


def test_multichip_serving_shards_batch(service):
    """On the 8-device mesh the service shards /predict batches across
    the data axis; results must match a direct (unsharded) forward and
    /schema reports the mesh size."""
    assert service.mesh is not None
    assert service.schema()['mesh_devices'] == 8
    ds = service.ds
    batch = ds.gather(np.arange(11))          # pads to 16 = 2 x 8
    x = np.asarray(batch.inputs)
    got = service.predict_packed(x)
    want = service.state.apply_fn({'params': service.state.params},
                                  jnp.asarray(x), train=False)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-2, atol=1e-3, err_msg=k)
    # sharded-input program really splits the batch: the compiled fwd
    # for the padded shape consumed a [16,...] input across 8 devices
    xj = jax.device_put(jnp.asarray(np.concatenate(
        [x, np.zeros((5,) + x.shape[1:], np.float32)])),
        service._x_sharding)
    assert len(xj.sharding.device_set) == 8


def test_multichip_max_batch_aligns_to_data_axis(service, tmp_path):
    """A max_batch that doesn't divide the data axis is aligned down so
    divisibility padding can never exceed the compile-bucket ceiling."""
    from inferbiomechanics_tpu.serve import InferenceService
    svc2 = InferenceService(service.config,
                            str(tmp_path / 'nock'), service.ds,
                            max_batch=100)
    assert svc2.mesh is not None
    assert svc2.max_batch == 96          # 100 -> 12 x 8


# ---------------------------------------------------------------------------
# Hot checkpoint reload
# ---------------------------------------------------------------------------


def test_hot_reload_swaps_params(tmp_path):
    d = tmp_path / 'data'
    d.mkdir()
    write_synthetic_subject(str(d / 's.b3d'), num_trials=1,
                            trial_length=120, seed=1)
    cfg = Config()
    cfg.model_type = 'feedforward'
    cfg.window_size, cfg.stride = 20, 5
    ds = WindowDataset(str(d), window_size=20, stride=5,
                       skip_loading_skeletons=True)
    model = build_model_for_dataset(cfg, ds)
    sample = ds.gather(np.arange(4))
    state0 = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.asarray(sample.inputs),
                                make_optimizer('adam', 1e-3))
    ckpt = str(tmp_path / 'ckpt')
    save_checkpoint(ckpt, state0, 0, 0)
    svc = InferenceService(cfg, ckpt, ds, max_batch=16)
    x = np.asarray(sample.inputs, np.float32)
    out0 = svc.predict_packed(x)

    # no newer checkpoint -> no-op
    r = svc.reload()
    assert r == {'reloaded': False, 'epoch': 0, 'batch': 0}

    # write a newer checkpoint with different params and reload
    state1 = create_train_state(model, jax.random.PRNGKey(9),
                                jnp.asarray(sample.inputs),
                                make_optimizer('adam', 1e-3))
    save_checkpoint(ckpt, state1, 1, 0)
    r = svc.reload()
    assert r == {'reloaded': True, 'epoch': 1, 'batch': 0}
    assert (svc.epoch, svc.batch) == (1, 0)
    out1 = svc.predict_packed(x)
    k = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
    assert not np.array_equal(out0[k], out1[k])


def test_reload_http_endpoint(base_url, service):
    # the module service already serves its newest checkpoint -> no-op,
    # and the endpoint reports the served (epoch, batch)
    r = _post(f'{base_url}/reload', {})
    assert r['reloaded'] is False
    assert (r['epoch'], r['batch']) == (service.epoch, service.batch)


def test_reload_rejected_for_ensembles(ensemble_service):
    with pytest.raises(ValueError, match='ensemble'):
        ensemble_service.reload()


def test_reload_poller_picks_up_new_checkpoint(tmp_path):
    import time

    d = tmp_path / 'data'
    d.mkdir()
    write_synthetic_subject(str(d / 's.b3d'), num_trials=1,
                            trial_length=120, seed=2)
    cfg = Config()
    cfg.model_type = 'feedforward'
    cfg.window_size, cfg.stride = 20, 5
    ds = WindowDataset(str(d), window_size=20, stride=5,
                       skip_loading_skeletons=True)
    model = build_model_for_dataset(cfg, ds)
    sample = ds.gather(np.arange(4))
    state0 = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.asarray(sample.inputs),
                                make_optimizer('adam', 1e-3))
    ckpt = str(tmp_path / 'ckpt')
    save_checkpoint(ckpt, state0, 0, 0)
    svc = InferenceService(cfg, ckpt, ds, max_batch=16)
    svc.start_reload_poller(0.1)
    try:
        save_checkpoint(ckpt, state0, 2, 0)
        deadline = time.time() + 10.0
        while time.time() < deadline and svc.epoch != 2:
            time.sleep(0.05)
        assert (svc.epoch, svc.batch) == (2, 0)
    finally:
        svc._poller_stop = True


def test_diffusion_multi_sample_uncertainty(service, tmp_path):
    """--diffusion-samples K: /predict returns the across-sample mean and
    std from K vmapped sampling chains."""
    cfg = Config()
    cfg.model_type = 'diffusion'
    cfg.output_data_format = 'all_frames'
    cfg.window_size, cfg.stride = 20, 5
    cfg.d_model, cfg.num_layers, cfg.num_heads = 32, 1, 4
    svc = InferenceService(cfg, str(tmp_path / 'none'), service.ds,
                           max_batch=8, sample_steps=4,
                           diffusion_samples=3)
    batch = service.ds.gather(np.arange(2))
    out, spread = svc.predict_packed(np.asarray(batch.inputs),
                                     with_spread=True)
    k = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
    assert out[k].shape == (2, 4, 6) and spread[k].shape == (2, 4, 6)
    assert np.isfinite(out[k]).all() and np.isfinite(spread[k]).all()
    # an untrained denoiser's chains genuinely differ -> nonzero spread
    assert float(np.abs(spread[k]).max()) > 0
    assert svc.schema()['diffusion_samples'] == 3
    # non-diffusion models reject the flag
    cfg2 = Config()
    cfg2.window_size, cfg2.stride = 20, 5
    with pytest.raises(ValueError, match='diffusion'):
        InferenceService(cfg2, str(tmp_path / 'none2'), service.ds,
                         diffusion_samples=2)


def test_warmup_compiles_all_buckets(service):
    before = service.stats['device_forwards']
    service.warmup()
    # buckets: 1,2,4,...,64 for max_batch=64 -> 7 forwards
    assert service.stats['device_forwards'] - before == 7
    # requests after warmup still answer correctly
    b = service.ds.gather(np.arange(3))
    out = service.predict_packed(np.asarray(b.inputs))
    k = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
    assert out[k].shape[0] == 3


def test_tta_mirror_service(service, tmp_path_factory):
    """serve --tta-mirror: the service prediction equals the half-sum of
    the plain and mirror-unmirrored forwards, and hot reload still works
    (params ride as jit arguments)."""
    from inferbiomechanics_tpu.train.augment import (
        mirror_outputs, spec_from_dataset)
    cfg = Config()
    cfg.model_type = 'feedforward'
    cfg.window_size, cfg.stride = 20, 5
    ckpt_dir = service._checkpoint_dir
    svc = InferenceService(cfg, ckpt_dir, service.ds,
                           max_batch=64, tta_mirror=True)
    b = service.ds.gather(np.arange(8))
    x = np.asarray(b.inputs, np.float32)
    out = svc.predict_packed(x)
    plain = InferenceService(cfg, ckpt_dir, service.ds, max_batch=64)
    o1 = plain.predict_packed(x)
    spec = spec_from_dataset(service.ds)
    o2 = plain.predict_packed(np.asarray(spec.mirror_inputs(x)))
    o2 = mirror_outputs(spec, service.ds.lab_offsets,
                        {k: jnp.asarray(v) for k, v in o2.items()})
    for k in o1:
        np.testing.assert_allclose(
            np.asarray(out[k]),
            0.5 * (np.asarray(o1[k]) + np.asarray(o2[k])),
            atol=2e-3)   # bf16 fusion noise between the fused/unfused programs

    # incompatible modes fail fast
    with pytest.raises(ValueError):
        InferenceService(cfg, ckpt_dir, service.ds,
                         max_batch=64, tta_mirror=True, quantize='int8')


def test_tta_mirror_composes_with_ensemble(ensemble_service):
    """serve --ensemble --tta-mirror: each member is symmetrized before
    the across-member mean, so the ensemble+TTA mean equals the average
    of the per-member single-model TTA predictions."""
    ds = ensemble_service.ds
    cfg = ensemble_service.config
    dirs = ensemble_service._member_dirs
    svc = InferenceService(cfg, dirs[0], ds, max_batch=64,
                           ensemble=dirs, tta_mirror=True)
    x = np.asarray(ds.gather(np.arange(4)).inputs, np.float32)
    out, spread = svc.predict_packed(x, with_spread=True)

    singles = [InferenceService(cfg, d, ds, max_batch=64,
                                tta_mirror=True).predict_packed(x)
               for d in dirs]
    key = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
    np.testing.assert_allclose(
        np.asarray(out[key]),
        (np.asarray(singles[0][key]) + np.asarray(singles[1][key])) / 2,
        rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(spread[key]),
        np.abs(np.asarray(singles[0][key])
               - np.asarray(singles[1][key])) / 2,
        rtol=2e-3, atol=2e-3)
    assert float(np.max(np.asarray(spread[key]))) > 0
