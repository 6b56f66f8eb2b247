"""Pipeline parallelism (parallel/pipeline.py) on the virtual 8-device mesh.

Validates the GPipe-style shard_map pipeline against the plain
single-program transformer: forward parity, one-train-step parity
(gradients through the scheduled scan + ppermute), layout round-trip,
and the dp x pp composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.data.dataset import label_layout, _offsets
from inferbiomechanics_tpu.data.keys import total_input_width
from inferbiomechanics_tpu.loss import LossConfig
from inferbiomechanics_tpu.models.transformer import TransformerRegressor
from inferbiomechanics_tpu.parallel import shard_batch
from inferbiomechanics_tpu.parallel.pipeline import (
    create_pipeline_state, make_pipeline_forward, make_pipeline_mesh,
    make_pipeline_train_step, to_canonical_params, to_pipeline_params,
)
from inferbiomechanics_tpu.train import create_train_state, make_optimizer
from inferbiomechanics_tpu.train.step import make_train_step

NUM_DOFS, NB, WINDOW, STRIDE, RH = 23, 2, 50, 5, 10
T = WINDOW // STRIDE


def _model(**kw):
    kw.setdefault('compute_dtype', jnp.float32)   # tight parity tolerances
    kw.setdefault('d_model', 64)
    kw.setdefault('num_layers', 4)
    kw.setdefault('num_heads', 4)
    return TransformerRegressor(num_dofs=NUM_DOFS, num_contact_bodies=NB,
                                history_len=WINDOW, stride=STRIDE, **kw)


def _batch(b, seed=0):
    rng = np.random.default_rng(seed)
    c_in = total_input_width(NUM_DOFS, RH)
    c_lab = sum(w for _, w in label_layout(NUM_DOFS, NB))
    x = rng.normal(size=(b, T, c_in)).astype(np.float32)
    y = rng.normal(size=(b, 1, c_lab)).astype(np.float32)
    return x, y


LAB_OFFSETS = _offsets(label_layout(NUM_DOFS, NB))


def test_layout_roundtrip():
    model = _model()
    x, _ = _batch(4)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        train=False)['params']
    pp = to_pipeline_params(params, model.num_layers)
    back = to_canonical_params(pp, model.num_layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, back)


@pytest.mark.parametrize('pipe,dp', [(4, 2), (2, 4), (2, 1)])
def test_forward_parity(pipe, dp):
    mesh = make_pipeline_mesh(n_devices=dp * pipe, pipe=pipe)
    model = _model()
    x, _ = _batch(16)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        train=False)['params']
    ref = model.apply({'params': params}, jnp.asarray(x), train=False)

    from inferbiomechanics_tpu.parallel.pipeline import shard_pipeline_params
    pp = shard_pipeline_params(mesh,
                               to_pipeline_params(params, model.num_layers))
    fwd = make_pipeline_forward(model, mesh, num_microbatches=4)
    out = fwd(pp, shard_batch(mesh, x))
    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=2e-4, atol=2e-4)


def test_train_step_parity_vs_single_program():
    """One pipelined train step == one plain train step (params compared
    after unstacking back to the canonical layout)."""
    mesh = make_pipeline_mesh(n_devices=8, pipe=4)
    model = _model()
    x, y = _batch(16)
    # sgd: the param delta IS -lr * grad, so this compares gradients
    # through the pipelined scan/ppermute directly (adam's first step is
    # +-lr regardless of magnitude — sign-flips on ~0 grads make it a
    # poor parity probe)
    tx = make_optimizer('sgd', 1e-2)

    ref_state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.asarray(x), tx)
    ref_step = make_train_step(model, LAB_OFFSETS, LossConfig(),
                               donate=False)
    ref_state2, ref_metrics = ref_step(ref_state, jnp.asarray(x),
                                       jnp.asarray(y), jax.random.PRNGKey(1))

    pstate = create_pipeline_state(model, jax.random.PRNGKey(0),
                                   jnp.asarray(x),
                                   make_optimizer('sgd', 1e-2), mesh)
    step = make_pipeline_train_step(model, LAB_OFFSETS, LossConfig(), mesh,
                                    num_microbatches=4, donate=False)
    xs, ys = shard_batch(mesh, x, y)
    pstate2, metrics = step(pstate, xs, ys, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(metrics['loss']),
                               float(ref_metrics['loss']), rtol=1e-4)
    new_canon = to_canonical_params(pstate2.params, model.num_layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-6),
        ref_state2.params, new_canon)


def test_multi_step_training_decreases_loss():
    mesh = make_pipeline_mesh(n_devices=8, pipe=2)
    model = _model(num_layers=2)
    x, y = _batch(16, seed=3)
    pstate = create_pipeline_state(model, jax.random.PRNGKey(0),
                                   jnp.asarray(x),
                                   make_optimizer('adam', 1e-2), mesh)
    step = make_pipeline_train_step(model, LAB_OFFSETS, LossConfig(), mesh,
                                    num_microbatches=2, donate=False)
    xs, ys = shard_batch(mesh, x, y)
    losses = []
    for i in range(8):
        pstate, m = step(pstate, xs, ys, jax.random.PRNGKey(i))
        losses.append(float(m['loss']))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    assert int(pstate.step) == 8


def test_remat_matches_plain():
    mesh = make_pipeline_mesh(n_devices=4, pipe=4)
    model = _model()
    x, y = _batch(8, seed=5)
    mk = lambda: create_pipeline_state(model, jax.random.PRNGKey(0),
                                       jnp.asarray(x),
                                       make_optimizer('sgd', 1e-2), mesh)
    xs, ys = shard_batch(mesh, x, y)
    outs = []
    for remat in (False, True):
        step = make_pipeline_train_step(model, LAB_OFFSETS, LossConfig(),
                                        mesh, num_microbatches=2,
                                        remat=remat, donate=False)
        s, m = step(mk(), xs, ys, jax.random.PRNGKey(0))
        outs.append((float(m['loss']), s))
    assert outs[0][0] == pytest.approx(outs[1][0], rel=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-7),
        outs[0][1].params, outs[1][1].params)


def test_bf16_smoke():
    mesh = make_pipeline_mesh(n_devices=8, pipe=2)
    model = _model(compute_dtype=jnp.bfloat16)
    x, y = _batch(16, seed=7)
    pstate = create_pipeline_state(model, jax.random.PRNGKey(0),
                                   jnp.asarray(x),
                                   make_optimizer('adam', 1e-3), mesh)
    step = make_pipeline_train_step(model, LAB_OFFSETS, LossConfig(), mesh,
                                    num_microbatches=4, donate=False)
    xs, ys = shard_batch(mesh, x, y)
    _, m = step(pstate, xs, ys, jax.random.PRNGKey(0))
    assert np.isfinite(float(m['loss']))


def test_rejects_bad_configs():
    mesh = make_pipeline_mesh(n_devices=8, pipe=2)
    model = _model(num_layers=3)           # 3 layers, 2 stages
    x, y = _batch(16)
    step = make_pipeline_train_step(model, LAB_OFFSETS, LossConfig(), mesh,
                                    num_microbatches=2, donate=False)
    pstate = object()
    with pytest.raises(ValueError, match='not divisible'):
        step(pstate, jnp.asarray(x), jnp.asarray(y), jax.random.PRNGKey(0))

    model4 = _model(dropout=0.1)
    step4 = make_pipeline_train_step(model4, LAB_OFFSETS, LossConfig(), mesh,
                                     num_microbatches=2, donate=False)
    with pytest.raises(ValueError, match='dropout'):
        step4(pstate, jnp.asarray(x), jnp.asarray(y), jax.random.PRNGKey(0))

    # batch 10 not divisible by dp(4) x microbatches(2)
    mesh2 = make_pipeline_mesh(n_devices=8, pipe=2)
    model2 = _model(num_layers=2)
    x2, y2 = _batch(10)
    step2 = make_pipeline_train_step(model2, LAB_OFFSETS, LossConfig(),
                                     mesh2, num_microbatches=2, donate=False)
    with pytest.raises(ValueError, match='not divisible'):
        step2(pstate, jnp.asarray(x2), jnp.asarray(y2),
              jax.random.PRNGKey(0))


# ---------------------------------------------------------------------------
# CLI / train-loop integration (--pipeline-parallel)
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    d = tmp_path_factory.mktemp('pipedata')
    write_synthetic_subject(str(d / 's0.b3d'), num_trials=2,
                            trial_length=200, seed=0)
    return WindowDataset(str(d), window_size=20, stride=5)


def _train_cfg(tmp_path, tag, **kw):
    from inferbiomechanics_tpu.config import Config
    base = dict(window_size=20, stride=5, model_type='transformer',
                d_model=32, num_layers=2, num_heads=2,
                checkpoint_dir=str(tmp_path / tag), epochs=1, batch_size=16,
                opt_type='adam', learning_rate=1e-3, device_data='off',
                checkpoint_every_batches=1000, log_every_batches=1000,
                seed=11, pipeline_parallel=2)
    base.update(kw)
    return Config(**base)


@pytest.mark.slow
def test_train_loop_pipeline_end_to_end(ds, tmp_path):
    """--pipeline-parallel 2: the loop trains, dev-evals through the
    canonical view, and writes CANONICAL checkpoints that the plain
    (pp=1) stack can resume and evaluate."""
    from inferbiomechanics_tpu.train.loop import train

    cfg = _train_cfg(tmp_path, 'pp')
    res = train(cfg, ds, ds, max_batches_per_epoch=4)
    assert res.epochs_run == 1
    assert np.isfinite(res.final_dev_metrics['loss'])

    # the checkpoint must load into a CANONICAL state (plain stack)
    from inferbiomechanics_tpu.train import (
        create_train_state, load_latest_checkpoint, make_optimizer,
    )
    model = TransformerRegressor(num_dofs=ds.num_dofs,
                                 num_contact_bodies=ds.num_contact_bodies,
                                 history_len=20, stride=5, d_model=32,
                                 num_layers=2, num_heads=2)
    batch = ds.gather(np.arange(8))
    st = create_train_state(model, jax.random.PRNGKey(0),
                            jnp.asarray(batch.inputs),
                            make_optimizer('adam', 1e-3))
    st, e, b = load_latest_checkpoint(st, cfg.checkpoint_dir)
    assert (e, b) == (0, 0)
    assert int(st.step) > 0
    assert 'EncoderBlock_0' in st.params

    # and the pp run can RESUME from its own canonical checkpoint
    cfg2 = _train_cfg(tmp_path, 'pp', epochs=2)
    res2 = train(cfg2, ds, None, max_batches_per_epoch=4)
    assert res2.epochs_run == 1        # only epoch 1 left


def test_train_loop_pipeline_matches_plain_loss(ds, tmp_path):
    """Same seed/data: the pipelined first-epoch train loss tracks the
    plain run (bf16 reassociation tolerance)."""
    from inferbiomechanics_tpu.train.loop import train

    r_pp = train(_train_cfg(tmp_path, 'a'), ds, None,
                 max_batches_per_epoch=4)
    r_plain = train(_train_cfg(tmp_path, 'b', pipeline_parallel=1), ds,
                    None, max_batches_per_epoch=4)
    lp = r_pp.final_train_metrics['loss']
    lq = r_plain.final_train_metrics['loss']
    assert lp == pytest.approx(lq, rel=5e-2), (lp, lq)


def test_train_loop_pipeline_rejects_bad_combos(ds, tmp_path):
    from inferbiomechanics_tpu.train.loop import train
    with pytest.raises(ValueError, match='transformer'):
        train(_train_cfg(tmp_path, 'r1', model_type='feedforward'), ds)
    with pytest.raises(ValueError, match='host loader'):
        train(_train_cfg(tmp_path, 'r2', device_data='stream'), ds)
    with pytest.raises(ValueError, match='microbatches'):
        train(_train_cfg(tmp_path, 'r3', grad_accum_steps=2), ds)


def test_augmented_pipeline_step_matches_plain():
    """Augmentation runs at the jit level before the shard_map, so the
    draw is bit-identical to the plain step with the same rng: sgd param
    deltas must agree to pipeline-reduction tolerance."""
    from inferbiomechanics_tpu.train.augment import Augmenter

    mesh = make_pipeline_mesh(n_devices=8, pipe=2)
    model = _model(num_layers=2)
    x, y = _batch(16, seed=9)
    aug = Augmenter(noise_std=0.05)

    ref_state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.asarray(x), make_optimizer('sgd', 1e-2))
    ref_step = make_train_step(model, LAB_OFFSETS, LossConfig(),
                               donate=False, augment=aug)
    ref_state2, ref_m = ref_step(ref_state, jnp.asarray(x), jnp.asarray(y),
                                 jax.random.PRNGKey(5))

    pstate = create_pipeline_state(model, jax.random.PRNGKey(0),
                                   jnp.asarray(x),
                                   make_optimizer('sgd', 1e-2), mesh)
    step = make_pipeline_train_step(model, LAB_OFFSETS, LossConfig(), mesh,
                                    num_microbatches=2, donate=False,
                                    augment=aug)
    xs, ys = shard_batch(mesh, x, y)
    pstate2, m = step(pstate, xs, ys, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(m['loss']), float(ref_m['loss']),
                               rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-6),
        ref_state2.params,
        to_canonical_params(pstate2.params, model.num_layers))


def _trained_ln(params, seed=7):
    rng = np.random.default_rng(seed)
    ln = params['LayerNorm_0']
    params['LayerNorm_0'] = {
        'scale': jnp.asarray(1.0 + 0.5 * rng.normal(size=ln['scale'].shape),
                             jnp.float32),
        'bias': jnp.asarray(0.3 * rng.normal(size=ln['bias'].shape),
                            jnp.float32)}
    return params


def test_post_encoder_matches_flax_tail_bitwise():
    """The pipeline's hand-rolled final-LayerNorm + head tail must be
    BITWISE equal to the canonical flax modules in bf16 with a TRAINED
    (non-identity) LayerNorm — fresh init has scale=1/bias=0, where an
    affine-dtype mistake is invisible (round-4 near-regression: casting
    to bf16 before the affine deviates ~3e-2)."""
    import flax.linen as nn
    from inferbiomechanics_tpu.models.common import (
        output_head_size, slice_output_heads)
    from inferbiomechanics_tpu.parallel.pipeline import _post_encoder

    model = _model(compute_dtype=jnp.bfloat16, num_layers=2)
    x, _ = _batch(8, seed=3)
    params = _trained_ln(model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                                    train=False)['params'])
    rest = {k: v for k, v in params.items()
            if not k.startswith('EncoderBlock')}
    h = jnp.asarray(np.random.default_rng(4).normal(
        size=(8, T, model.d_model)), jnp.bfloat16)

    y = nn.LayerNorm(dtype=jnp.bfloat16).apply(
        {'params': params['LayerNorm_0']}, h)
    y = y[:, -1:, :]
    per_frame = output_head_size(NB, 1)

    def head(name, width):
        return nn.Dense(width, dtype=jnp.bfloat16).apply(
            {'params': params[name]}, y).astype(jnp.float32)

    ref = slice_output_heads(head('contact_head', per_frame), NB, 1)
    got = _post_encoder(model, rest, h)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(ref[k]),
                                      err_msg=f'tail bitwise: {k}')


def test_pipeline_forward_bf16_trained_layernorm_close():
    """End-to-end bf16 pipeline forward vs model.apply with trained LN:
    encoder-internal op reordering costs ~bf16-ulp (~0.5% relative,
    measured 0.016 on a 2-4 output scale) — bound it at 2.5e-2 so a
    tail-semantics mistake (~2x that) would trip."""
    model = _model(compute_dtype=jnp.bfloat16, num_layers=2)
    x, _ = _batch(8, seed=3)
    params = _trained_ln(model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                                    train=False)['params'])
    ref = model.apply({'params': params}, jnp.asarray(x), train=False)
    mesh = make_pipeline_mesh(n_devices=4, pipe=2)
    fwd = make_pipeline_forward(model, mesh, num_microbatches=2)
    got = fwd(to_pipeline_params(params, model.num_layers),
              shard_batch(mesh, jnp.asarray(x)))
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=2.5e-2, err_msg=f'bf16 e2e: {k}')
