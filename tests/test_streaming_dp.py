"""Streaming tier x data parallelism (VERDICT r4 #5).

The streaming (>HBM) tier composes with the data axis: segment rows
replicate across the mesh (each segment fits ONE device's HBM budget by
construction) while the gathered batch — and therefore the model
compute and gradient all-reduce — shard over it. Batch composition is
identical to the single-device tier, so these tests pin (a) exact loss
reproduction, (b) a real all-reduce in the compiled HLO (GSPMD could
otherwise keep the step fully replicated: zero dp speedup), and (c) the
diffusion variant training finite under the same composition.

Reference context: SURVEY §2.10.1 (DistributedSampler equivalent) —
the reference's torch DataLoader+DDP has no out-of-core tier at all.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.loss import LossConfig
from inferbiomechanics_tpu.models import get_model
from inferbiomechanics_tpu.parallel import batch_sharding, make_mesh, replicate
from inferbiomechanics_tpu.train import create_train_state, make_optimizer
from inferbiomechanics_tpu.train.streaming_data import (
    StreamingPlan, make_streaming_diffusion_epoch, make_streaming_epoch,
)


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp('stream_dp')
    for i in range(2):
        write_synthetic_subject(str(d / f's{i}.b3d'), num_trials=3,
                                trial_length=150, seed=10 + i)
    return WindowDataset(str(d), window_size=20, stride=5,
                         skip_loading_skeletons=True)


def _plan(ds, rows=320):
    bytes_per_row = (ds.features_all.shape[1] + ds.labels_all.shape[1]) * 4
    return StreamingPlan(ds, rows * bytes_per_row)


def _state(ds, model, seed=0):
    sample = ds.gather(np.arange(16))
    return create_train_state(model, jax.random.PRNGKey(seed),
                              jnp.asarray(sample.inputs),
                              make_optimizer('adam', 1e-3))


def test_streaming_dp_matches_single_device(ds):
    """8-way dp streaming epoch reproduces the single-device epoch:
    same rng -> same segment order, same window shuffle, same batch
    composition; the constraint only changes WHERE compute runs, so the
    results agree up to f32 reassociation (the sharded batch mean +
    gradient all-reduce sum in a different order)."""
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len)
    rng = jax.random.PRNGKey(3)

    run1 = make_streaming_epoch(model, ds, _plan(ds), LossConfig(),
                                batch_size=16, feature_dtype=jnp.float32)
    s1, m1 = run1(_state(ds, model), rng)

    mesh = make_mesh()
    assert mesh.shape['data'] == len(jax.devices())
    runN = make_streaming_epoch(model, ds, _plan(ds), LossConfig(),
                                batch_size=16, feature_dtype=jnp.float32,
                                batch_shard=batch_sharding(mesh))
    sN, mN = runN(replicate(mesh, _state(ds, model)), rng)

    np.testing.assert_allclose(float(mN['loss']), float(m1['loss']),
                               rtol=5e-4)
    # adam's g/sqrt(v) amplifies the per-step reassociation noise over
    # the epoch, so params agree absolutely (~1e-5 observed), not to a
    # tight relative tolerance on near-zero entries; a batch-composition
    # bug would diverge these O(1)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(sN.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=2e-3)


def test_streaming_dp_hlo_has_all_reduce(ds):
    """The compiled per-segment program must carry the gradient
    all-reduce — without the batch constraint GSPMD may compile the
    whole scan replicated (every device computing the full batch)."""
    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=ds.root_history_len)
    mesh = make_mesh()
    plan = _plan(ds)
    runN = make_streaming_epoch(model, ds, plan, LossConfig(),
                                batch_size=16, feature_dtype=jnp.float32,
                                batch_shard=batch_sharding(mesh))
    state = replicate(mesh, _state(ds, model))
    feats_np, labs_np = plan.segment_arrays(0)
    n_steps = plan.segments[0].win_base.shape[0] // 16
    idx = plan.segments[0].win_base[:n_steps * 16].reshape(n_steps, 16)
    hlo = runN.seg_runner.lower(
        state, jnp.asarray(feats_np), jnp.asarray(labs_np),
        jnp.asarray(idx, jnp.int32),
        jax.random.PRNGKey(0)).compile().as_text()
    assert 'all-reduce' in hlo, (
        'streaming dp segment runner compiled without a gradient '
        'all-reduce')


@pytest.mark.slow
def test_streaming_diffusion_dp_finite(tmp_path):
    """Diffusion streaming x dp: the eps-prediction segment runner
    trains finite with the gathered batch sharded over the data axis
    (EMA threaded through the scan, as shipped by train_diffusion)."""
    from inferbiomechanics_tpu.models.diffusion import DDPMSchedule
    for i in range(2):
        write_synthetic_subject(str(tmp_path / f's{i}.b3d'), num_trials=2,
                                trial_length=150, seed=20 + i)
    af = WindowDataset(str(tmp_path), window_size=20, stride=5,
                       output_data_format='all_frames',
                       skip_loading_skeletons=True)
    model = get_model('diffusion', num_dofs=af.num_dofs,
                      num_contact_bodies=af.num_contact_bodies,
                      history_len=20, stride=5,
                      root_history_len=af.root_history_len)
    sched = DDPMSchedule(model.timesteps)
    mesh = make_mesh()
    run = make_streaming_diffusion_epoch(
        model, af, _plan(af, rows=200), sched, batch_size=8,
        ema_decay=0.999, feature_dtype=jnp.float32,
        batch_shard=batch_sharding(mesh))
    sample = af.gather(np.arange(8))
    x0 = jnp.zeros((2, af.num_model_frames, model.target_channels))
    t0 = jnp.zeros((2,), jnp.int32)
    variables = model.init({'params': jax.random.PRNGKey(0)}, x0, t0,
                           jnp.asarray(sample.inputs[:2]), train=False)
    from inferbiomechanics_tpu.train import make_optimizer as mo
    from inferbiomechanics_tpu.train.state import TrainState
    tx = mo('adam', 1e-3)
    state = TrainState(step=jnp.asarray(0, jnp.int32),
                       params=variables['params'],
                       opt_state=tx.init(variables['params']),
                       batch_stats={}, tx=tx, apply_fn=model.apply)
    state = replicate(mesh, state)
    # EMA seeded through the host, as train_diffusion does — aliasing
    # the params leaves would donate the same buffer twice on a mesh
    ema = replicate(mesh, jax.device_get(state.params))
    state, ema, m = run(state, ema, jax.random.PRNGKey(1))
    assert np.isfinite(float(m['loss']))
