"""Reference .pt checkpoint conversion (inferbiomechanics_tpu/torch_compat.py).

The oracle is REAL torch: a torch model with the reference's module
naming (``net.{i}`` Sequential of Linears, DDP 'module.' prefix) and the
reference's output-head slicing is evaluated on the same windows as the
converted flax model — outputs must match per key.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')

from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.keys import OutputDataKeys
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.models.feedforward import FeedForwardBaseline
from inferbiomechanics_tpu.torch_compat import (
    convert_state_dict, convert_torch_checkpoint, output_permutation,
)
from inferbiomechanics_tpu.train import (
    create_train_state, load_latest_checkpoint, make_optimizer,
)


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp('tc')
    write_synthetic_subject(str(d / 's.b3d'), num_trials=1,
                            trial_length=120, seed=0)
    return WindowDataset(str(d), window_size=20, stride=5,
                         skip_loading_skeletons=True)


def _torch_net(in_size, hidden, out_size, seed=0):
    torch.manual_seed(seed)
    import torch.nn as tnn
    dims = [in_size] + hidden + [out_size]
    layers = []
    for i, (h0, h1) in enumerate(zip(dims[:-1], dims[1:])):
        layers.append(tnn.Linear(h0, h1))
        if i < len(dims) - 2:
            layers.append(tnn.Sigmoid())
    return tnn.Sequential(*layers)


def _ref_head_slices(y, F):
    """The reference's output slicing (FeedForwardRegressionBaseline
    .py:116-120): component blocks across frames."""
    B = y.shape[0]
    return {
        OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME:
            y[:, 0 * F:6 * F].reshape(B, F, 6),
        OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME:
            y[:, 6 * F:12 * F].reshape(B, F, 6),
        OutputDataKeys.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME:
            y[:, 12 * F:18 * F].reshape(B, F, 6),
        OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME:
            y[:, 18 * F:30 * F].reshape(B, F, 12),
    }


def test_output_permutation_is_bijective():
    for F in (1, 4, 10):
        p = output_permutation(F)
        assert sorted(p.tolist()) == list(range(30 * F))


@pytest.mark.parametrize('F_out,fmt', [(1, 'last_frame'), (4, 'all_frames')])
def test_converted_checkpoint_matches_torch_forward(ds, tmp_path, F_out, fmt):
    batch = ds.gather(np.arange(8))
    x = np.asarray(batch.inputs, np.float32)           # [B, T, C]
    B, T, C = x.shape
    in_size, out_size = T * C, 30 * F_out
    net = _torch_net(in_size, [64, 32], out_size, seed=F_out)

    # reference-format checkpoint, DDP-prefixed like torchrun runs
    sd = {'module.net.' + k: v for k, v in net.state_dict().items()}
    pt = str(tmp_path / 'epoch_3_batch_7.pt')
    torch.save({'epoch': 3, 'model_state_dict': sd}, pt)

    out_dir = str(tmp_path / 'converted')
    written = convert_torch_checkpoint(pt, out_dir)
    assert written.endswith('epoch_3_batch_7.ckpt')

    with torch.no_grad():
        y = net(torch.from_numpy(x.reshape(B, -1))).numpy()
    ref = _ref_head_slices(y, F_out)

    model = FeedForwardBaseline(
        num_dofs=ds.num_dofs, num_contact_bodies=ds.num_contact_bodies,
        history_len=20, stride=5, root_history_len=ds.root_history_len,
        output_data_format=fmt, activation='sigmoid', hidden_dims=(64, 32),
        compute_dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(x), make_optimizer('adam', 1e-3))
    state, epoch, b = load_latest_checkpoint(state, out_dir)
    assert (epoch, b) == (3, 7)
    out = model.apply({'params': state.params}, jnp.asarray(x), train=False)
    for k, v in ref.items():
        np.testing.assert_allclose(np.asarray(out[k]), v,
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_converted_groundlink_matches_torch_forward(ds, tmp_path):
    """GroundLink conversion oracle: a torch model with the reference's
    cnn.{i}/fc.{i} Sequential naming (Groundlink.py:41-62) and replicate-
    padded Conv1d stack vs the converted flax Groundlink on the same
    windows."""
    import torch.nn as tnn
    from inferbiomechanics_tpu.models.groundlink import Groundlink

    batch = ds.gather(np.arange(6))
    x = np.asarray(batch.inputs, np.float32)           # [B, T, C]
    C = x.shape[2]
    torch.manual_seed(0)
    feats = [C, 16, 16, 24, 24]
    cnn_layers = []
    for c_in, c_out in zip(feats[:-1], feats[1:]):
        cnn_layers += [tnn.Dropout(0.0),
                       tnn.Conv1d(c_in, c_out, 7, padding=3,
                                  padding_mode='replicate'),
                       tnn.ELU()]
    cnn = tnn.Sequential(*cnn_layers)
    # reference fc: [Transpose, (Dropout, Linear, ELU) x 2, Dropout,
    # Linear(no bias)] — Identity stands in for the param-free Transpose
    # so the saved key indices (fc.2, fc.5, fc.8) match the reference's
    fc = tnn.Sequential(tnn.Identity(), tnn.Dropout(0.2),
                        tnn.Linear(24, 24), tnn.ELU(), tnn.Dropout(0.2),
                        tnn.Linear(24, 24), tnn.ELU(), tnn.Dropout(0.2),
                        tnn.Linear(24, 30, bias=False))
    sd = {'cnn.' + k: v for k, v in cnn.state_dict().items()}
    sd.update({'fc.' + k: v for k, v in fc.state_dict().items()})
    pt = str(tmp_path / 'epoch_1_batch_2.pt')
    torch.save({'model_state_dict': sd}, pt)

    with torch.no_grad():
        cnn.eval(), fc.eval()
        h = cnn(torch.from_numpy(x).transpose(-2, -1))   # [B, C, T]
        y = fc(h.transpose(-2, -1)).numpy()              # [B, T, 30]
    ref = {
        OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME: y[:, :, 0:6],
        OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME: y[:, :, 6:12],
        OutputDataKeys.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME: y[:, :, 12:18],
        OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME: y[:, :, 18:30],
    }

    out_dir = str(tmp_path / 'converted')
    convert_torch_checkpoint(pt, out_dir)
    model = Groundlink(num_dofs=ds.num_dofs,
                       num_contact_bodies=ds.num_contact_bodies,
                       root_history_len=ds.root_history_len,
                       output_data_format='all_frames',
                       cnn_features=(16, 16, 24, 24),
                       compute_dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(x), make_optimizer('adam', 1e-3))
    state, epoch, b = load_latest_checkpoint(state, out_dir)
    assert (epoch, b) == (1, 2)
    out = model.apply({'params': state.params}, jnp.asarray(x), train=False)
    for k, v in ref.items():
        np.testing.assert_allclose(np.asarray(out[k]), v,
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_dropout_shifted_indices_convert(ds, tmp_path):
    """The reference inserts Dropout modules before each Linear when
    --dropout is set (FeedForwardRegressionBaseline.py:69-77), shifting
    the Sequential key indices (net.1, net.4, ...). Dropout has no
    params, so conversion must key on ORDER, not position."""
    import torch.nn as tnn
    batch = ds.gather(np.arange(4))
    x = np.asarray(batch.inputs, np.float32)
    B, T, C = x.shape
    torch.manual_seed(2)
    net = tnn.Sequential(
        tnn.Dropout(0.1), tnn.Linear(T * C, 32), tnn.Sigmoid(),
        tnn.Dropout(0.1), tnn.Linear(32, 30))
    pt = str(tmp_path / 'epoch_0_batch_0.pt')
    torch.save({'model_state_dict':
                {'net.' + k: v for k, v in net.state_dict().items()}}, pt)
    out_dir = str(tmp_path / 'conv')
    convert_torch_checkpoint(pt, out_dir)

    with torch.no_grad():
        net.eval()
        y = net(torch.from_numpy(x.reshape(B, -1))).numpy()
    ref = _ref_head_slices(y, 1)

    model = FeedForwardBaseline(
        num_dofs=ds.num_dofs, num_contact_bodies=ds.num_contact_bodies,
        history_len=20, stride=5, root_history_len=ds.root_history_len,
        output_data_format='last_frame', activation='sigmoid',
        hidden_dims=(32,), compute_dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(x), make_optimizer('adam', 1e-3))
    state, _, _ = load_latest_checkpoint(state, out_dir)
    out = model.apply({'params': state.params}, jnp.asarray(x), train=False)
    for k, v in ref.items():
        np.testing.assert_allclose(np.asarray(out[k]), v,
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_batchnorm_checkpoint_rejected():
    sd = {'net.0.weight': np.zeros((4, 4)), 'net.0.bias': np.zeros(4),
          'net.0.running_mean': np.zeros(4), 'net.0.running_var': np.ones(4)}
    with pytest.raises(ValueError, match='[Bb]atch[Nn]orm'):
        convert_state_dict(sd, 1)


def test_nonstandard_names_do_not_collide(ds, tmp_path):
    """Converting best.pt and final.pt into one --out-dir must produce
    TWO checkpoints (stem-named), not silently overwrite
    epoch_0_batch_0.ckpt twice."""
    in_size = ds.num_model_frames * ds.num_input_channels
    out_dir = str(tmp_path / 'out')
    written = []
    for name, seed in (('best.pt', 3), ('final.pt', 4)):
        net = _torch_net(in_size, [16], 30, seed=seed)
        pt = str(tmp_path / name)
        torch.save({'model_state_dict':
                    {'net.' + k: v for k, v in net.state_dict().items()}},
                   pt)
        written.append(convert_torch_checkpoint(pt, out_dir))
    assert sorted(os.path.basename(w) for w in written) == \
        ['best.ckpt', 'final.ckpt']
    assert sorted(os.listdir(out_dir)) == \
        ['best.ckpt', 'final.ckpt', 'run_config.json']
    # stem-named conversions are NOT resume points (like --keep-best)
    from inferbiomechanics_tpu.train.checkpoint import list_checkpoints
    assert list_checkpoints(out_dir) == []


def test_cli_convert_checkpoint(ds, tmp_path):
    net = _torch_net(ds.num_model_frames * ds.num_input_channels,
                     [16], 30, seed=1)
    pt = str(tmp_path / 'epoch_0_batch_0.pt')
    torch.save({'model_state_dict':
                {'net.' + k: v for k, v in net.state_dict().items()}}, pt)
    out_dir = str(tmp_path / 'out')
    import subprocess, sys
    r = subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(os.path.dirname(
                            os.path.abspath(__file__))), 'main.py'),
                        'convert-checkpoint', pt, '--out-dir', out_dir],
                       capture_output=True, text=True,
                       env={**os.environ, 'IB_PLATFORM': 'cpu'})
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out_dir, 'epoch_0_batch_0.ckpt'))


# -----------------------------------------------------------------------------
# Reverse direction: .ckpt -> reference .pt (export_*)
# -----------------------------------------------------------------------------


def test_export_feedforward_matches_reference_model(ds, tmp_path):
    """Two-way oracle: a flax feedforward checkpoint exported with
    --to-torch loads STRICTLY into a reference-shaped torch net and both
    models produce identical predictions on the same windows."""
    from inferbiomechanics_tpu.torch_compat import export_torch_checkpoint
    from inferbiomechanics_tpu.train.checkpoint import save_checkpoint

    batch = ds.gather(np.arange(6))
    x = np.asarray(batch.inputs, np.float32)
    B, T, C = x.shape
    F_out = 4
    model = FeedForwardBaseline(
        num_dofs=ds.num_dofs, num_contact_bodies=ds.num_contact_bodies,
        history_len=20, stride=5, root_history_len=ds.root_history_len,
        output_data_format='all_frames', activation='sigmoid',
        hidden_dims=(48, 24), compute_dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(5),
                               jnp.asarray(x), make_optimizer('adam', 1e-3))
    ckpt_dir = str(tmp_path / 'native')
    save_checkpoint(ckpt_dir, state, 2, 9)

    out = export_torch_checkpoint(
        os.path.join(ckpt_dir, 'epoch_2_batch_9.ckpt'),
        str(tmp_path / 'torch'))
    assert out.endswith('epoch_2_batch_9.pt')
    blob = torch.load(out, map_location='cpu', weights_only=True)
    assert blob['epoch'] == 2

    # reference-shaped torch net (Linear at 0, 2, 4 — no dropout/bn)
    net = _torch_net(T * C, [48, 24], 30 * F_out, seed=0)
    net.load_state_dict({k.replace('net.', ''): v
                         for k, v in blob['model_state_dict'].items()},
                        strict=True)
    with torch.no_grad():
        y = net(torch.from_numpy(x.reshape(B, -1))).numpy()
    ref = _ref_head_slices(y, F_out)
    ours = model.apply({'params': state.params}, jnp.asarray(x), train=False)
    for k, v in ref.items():
        np.testing.assert_allclose(np.asarray(ours[k]), v,
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_export_convert_roundtrip_is_identity(ds, tmp_path):
    """export (--to-torch) then convert back: parameters bit-identical."""
    from inferbiomechanics_tpu.torch_compat import export_torch_checkpoint
    from inferbiomechanics_tpu.train.checkpoint import save_checkpoint

    batch = ds.gather(np.arange(4))
    x = jnp.asarray(batch.inputs, jnp.float32)
    model = FeedForwardBaseline(
        num_dofs=ds.num_dofs, num_contact_bodies=ds.num_contact_bodies,
        history_len=20, stride=5, root_history_len=ds.root_history_len,
        output_data_format='last_frame', activation='sigmoid',
        hidden_dims=(32,), compute_dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(1), x,
                               make_optimizer('adam', 1e-3))
    d1 = str(tmp_path / 'a')
    save_checkpoint(d1, state, 0, 0)
    pt = export_torch_checkpoint(os.path.join(d1, 'epoch_0_batch_0.ckpt'),
                                 str(tmp_path / 'b'))
    d2 = str(tmp_path / 'c')
    convert_torch_checkpoint(pt, d2)
    state2 = create_train_state(model, jax.random.PRNGKey(2), x,
                                make_optimizer('adam', 1e-3))
    state2, _, _ = load_latest_checkpoint(state2, d2)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_groundlink_matches_reference_model(ds, tmp_path):
    """GroundLink reverse oracle: exported .pt loads strictly into the
    reference-shaped cnn/fc Sequentials; forwards match."""
    import torch.nn as tnn
    from inferbiomechanics_tpu.models.groundlink import Groundlink
    from inferbiomechanics_tpu.torch_compat import export_torch_checkpoint
    from inferbiomechanics_tpu.train.checkpoint import save_checkpoint

    batch = ds.gather(np.arange(5))
    x = np.asarray(batch.inputs, np.float32)
    C = x.shape[2]
    model = Groundlink(num_dofs=ds.num_dofs,
                       num_contact_bodies=ds.num_contact_bodies,
                       root_history_len=ds.root_history_len,
                       output_data_format='all_frames',
                       cnn_features=(16, 16, 24, 24),
                       compute_dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(3),
                               jnp.asarray(x), make_optimizer('adam', 1e-3))
    d1 = str(tmp_path / 'native')
    save_checkpoint(d1, state, 1, 0)
    pt = export_torch_checkpoint(os.path.join(d1, 'epoch_1_batch_0.ckpt'),
                                 str(tmp_path / 'torch'))

    feats = [C, 16, 16, 24, 24]
    cnn_layers = []
    for c_in, c_out in zip(feats[:-1], feats[1:]):
        cnn_layers += [tnn.Dropout(0.0),
                       tnn.Conv1d(c_in, c_out, 7, padding=3,
                                  padding_mode='replicate'),
                       tnn.ELU()]
    cnn = tnn.Sequential(*cnn_layers)
    fc = tnn.Sequential(tnn.Identity(), tnn.Dropout(0.2),
                        tnn.Linear(24, 24), tnn.ELU(), tnn.Dropout(0.2),
                        tnn.Linear(24, 24), tnn.ELU(), tnn.Dropout(0.2),
                        tnn.Linear(24, 30, bias=False))
    blob = torch.load(pt, map_location='cpu', weights_only=True)
    sd = blob['model_state_dict']
    cnn.load_state_dict({k[len('cnn.'):]: v for k, v in sd.items()
                         if k.startswith('cnn.')}, strict=True)
    fc.load_state_dict({k[len('fc.'):]: v for k, v in sd.items()
                        if k.startswith('fc.')}, strict=True)
    with torch.no_grad():
        cnn.eval(), fc.eval()
        h = cnn(torch.from_numpy(x).transpose(-2, -1))
        y = fc(h.transpose(-2, -1)).numpy()
    ours = model.apply({'params': state.params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(ours[OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME]),
        y[:, :, 6:12], rtol=1e-4, atol=1e-5)


def test_export_dropout_index_shift():
    from inferbiomechanics_tpu.torch_compat import export_state_dict
    params = {'Dense_0': {'kernel': np.zeros((4, 8), np.float32),
                          'bias': np.zeros(8, np.float32)},
              'Dense_1': {'kernel': np.zeros((8, 30), np.float32),
                          'bias': np.zeros(30, np.float32)}}
    plain = export_state_dict(params, 1)
    assert set(plain) == {'net.0.weight', 'net.0.bias',
                          'net.2.weight', 'net.2.bias'}
    shifted = export_state_dict(params, 1, dropout=True)
    assert set(shifted) == {'net.1.weight', 'net.1.bias',
                            'net.4.weight', 'net.4.bias'}


def test_cli_convert_checkpoint_to_torch(ds, tmp_path):
    import subprocess
    import sys
    from inferbiomechanics_tpu.train.checkpoint import save_checkpoint

    batch = ds.gather(np.arange(4))
    x = jnp.asarray(batch.inputs, jnp.float32)
    model = FeedForwardBaseline(
        num_dofs=ds.num_dofs, num_contact_bodies=ds.num_contact_bodies,
        history_len=20, stride=5, root_history_len=ds.root_history_len,
        output_data_format='last_frame', activation='sigmoid',
        hidden_dims=(16,), compute_dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x,
                               make_optimizer('adam', 1e-3))
    d = str(tmp_path / 'native')
    save_checkpoint(d, state, 4, 2)
    main = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'main.py')
    out = subprocess.run(
        [sys.executable, main, 'convert-checkpoint', d, '--to-torch',
         '--out-dir', str(tmp_path / 'pt')],
        capture_output=True, text=True,
        env=dict(os.environ, IB_PLATFORM='cpu'), timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    blob = torch.load(str(tmp_path / 'pt' / 'epoch_4_batch_2.pt'),
                      map_location='cpu', weights_only=True)
    assert blob['epoch'] == 4 and 'net.0.weight' in blob['model_state_dict']


def test_soup_checkpoints(ds, tmp_path):
    """Model soup: the merged checkpoint's params are the exact uniform
    mean of the members and the result loads + runs."""
    from inferbiomechanics_tpu.train.checkpoint import (
        load_checkpoint_file, save_checkpoint, soup_checkpoints,
    )
    batch = ds.gather(np.arange(4))
    x = jnp.asarray(batch.inputs, jnp.float32)
    model = FeedForwardBaseline(
        num_dofs=ds.num_dofs, num_contact_bodies=ds.num_contact_bodies,
        history_len=20, stride=5, root_history_len=ds.root_history_len,
        output_data_format='last_frame', activation='sigmoid',
        hidden_dims=(16,), compute_dtype=jnp.float32)
    states, files = [], []
    for seed in (0, 1, 2):
        st = create_train_state(model, jax.random.PRNGKey(seed), x,
                                make_optimizer('adam', 1e-3))
        states.append(st)
        files.append(save_checkpoint(str(tmp_path / f'm{seed}'), st, seed, 0))
    out = soup_checkpoints(files, str(tmp_path / 'soup.ckpt'))

    target = create_train_state(model, jax.random.PRNGKey(9), x,
                                make_optimizer('adam', 1e-3))
    souped, epoch, _ = load_checkpoint_file(target, out)
    assert epoch == 2                      # newest member's provenance
    mean = jax.tree_util.tree_map(
        lambda a, b, c: (np.asarray(a, np.float64) + np.asarray(b, np.float64)
                         + np.asarray(c, np.float64)) / 3,
        states[0].params, states[1].params, states[2].params)
    for a, b in zip(jax.tree_util.tree_leaves(souped.params),
                    jax.tree_util.tree_leaves(mean)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)
    out_fwd = model.apply({'params': souped.params}, x, train=False)
    k = OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME
    assert np.isfinite(np.asarray(out_fwd[k])).all()


def test_soup_rejects_mismatched_architectures(ds, tmp_path):
    from inferbiomechanics_tpu.train.checkpoint import (
        save_checkpoint, soup_checkpoints,
    )
    batch = ds.gather(np.arange(4))
    x = jnp.asarray(batch.inputs, jnp.float32)
    files = []
    for i, hidden in enumerate([(16,), (24,)]):
        model = FeedForwardBaseline(
            num_dofs=ds.num_dofs, num_contact_bodies=ds.num_contact_bodies,
            history_len=20, stride=5, root_history_len=ds.root_history_len,
            output_data_format='last_frame', activation='sigmoid',
            hidden_dims=hidden, compute_dtype=jnp.float32)
        st = create_train_state(model, jax.random.PRNGKey(i), x,
                                make_optimizer('adam', 1e-3))
        files.append(save_checkpoint(str(tmp_path / f'a{i}'), st, 0, 0))
    with pytest.raises(ValueError, match='shape mismatch|structure differs'):
        soup_checkpoints(files, str(tmp_path / 'bad.ckpt'))
    with pytest.raises(ValueError, match='at least 2'):
        soup_checkpoints(files[:1], str(tmp_path / 'bad2.ckpt'))


def test_export_to_torch_name_collisions(ds, tmp_path):
    """best.ckpt exports under its stem; same-named .ckpt files from two
    dirs disambiguate with the parent-dir name instead of overwriting."""
    from inferbiomechanics_tpu.torch_compat import export_torch_checkpoint
    from inferbiomechanics_tpu.train.checkpoint import save_checkpoint
    batch = ds.gather(np.arange(4))
    x = jnp.asarray(batch.inputs, jnp.float32)
    model = FeedForwardBaseline(
        num_dofs=ds.num_dofs, num_contact_bodies=ds.num_contact_bodies,
        history_len=20, stride=5, root_history_len=ds.root_history_len,
        output_data_format='last_frame', activation='sigmoid',
        hidden_dims=(16,), compute_dtype=jnp.float32)
    out_dir = str(tmp_path / 'pt')
    # same dir: epoch ckpt + best.ckpt must produce TWO .pt files
    st = create_train_state(model, jax.random.PRNGKey(0), x,
                            make_optimizer('adam', 1e-3))
    d = str(tmp_path / 'cfg0')
    save_checkpoint(d, st, 4, 0)
    save_checkpoint(d, st, 4, 0, filename='best.ckpt')
    w1 = export_torch_checkpoint(os.path.join(d, 'epoch_4_batch_0.ckpt'), out_dir)
    w2 = export_torch_checkpoint(os.path.join(d, 'best.ckpt'), out_dir)
    assert os.path.basename(w1) == 'epoch_4_batch_0.pt'
    assert os.path.basename(w2) == 'best.pt'
    # second dir with the SAME epoch name: disambiguated, not overwritten
    st2 = create_train_state(model, jax.random.PRNGKey(1), x,
                             make_optimizer('adam', 1e-3))
    d2 = str(tmp_path / 'cfg1')
    save_checkpoint(d2, st2, 4, 0)
    w3 = export_torch_checkpoint(os.path.join(d2, 'epoch_4_batch_0.ckpt'),
                                 out_dir)
    assert os.path.basename(w3) == 'cfg1_epoch_4_batch_0.pt'
    assert len(os.listdir(out_dir)) == 3
