"""On-device augmentation: mirror spec derivation, involution, tier wiring.

The reference has no augmentation (its data path is
AddBiomechanicsDataset.__getitem__ only); these tests cover the
beyond-parity train/augment.py feature.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferbiomechanics_tpu.config import Config
from inferbiomechanics_tpu.data import keys as K
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
from inferbiomechanics_tpu.train.augment import (Augmenter, build_mirror_spec,
                                                 maybe_augment,
                                                 spec_from_dataset)


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp('aug_data')
    write_synthetic_subject(str(d / 's1.b3d'), num_trials=2,
                            trial_length=160, seed=3)
    return WindowDataset(str(d), window_size=10, stride=2,
                         output_data_format='all_frames')


@pytest.fixture(scope='module')
def spec(ds):
    return spec_from_dataset(ds)


def test_spec_fully_paired_on_synthetic_skeleton(ds, spec):
    assert spec.unpaired_names == []
    assert spec.approximate_dofs == []


def test_spec_is_involution(spec):
    for perm, sign in ((spec.in_perm, spec.in_sign),
                       (spec.lab_perm, spec.lab_sign)):
        assert (perm[perm] == np.arange(len(perm))).all()
        assert np.allclose(sign[perm] * sign, 1.0)
        assert np.all(np.abs(sign) == 1.0)


def test_dof_sign_table(ds, spec):
    """The derived per-DOF rules match the reflection math: euler x/y
    flip, euler z keeps, lateral translation flips, revolute signs come
    from the axis pair (subtalar axis x flips, knee/ankle axis z keep)."""
    names = ds.subjects[0].getDofNames()
    idx = {n: i for i, n in enumerate(names)}
    expect = {
        'ground_pelvis_rot_x': ('ground_pelvis_rot_x', -1),
        'ground_pelvis_rot_z': ('ground_pelvis_rot_z', +1),
        'ground_pelvis_tz': ('ground_pelvis_tz', -1),
        'ground_pelvis_tx': ('ground_pelvis_tx', +1),
        'hip_r_x': ('hip_l_x', -1),
        'hip_r_z': ('hip_l_z', +1),
        'walker_knee_r': ('walker_knee_l', +1),
        'subtalar_r': ('subtalar_l', -1),
        'mtp_l': ('mtp_r', +1),
        'back_y': ('back_y', -1),
    }
    for name, (src, sign) in expect.items():
        i = idx[name]
        assert spec.in_perm[i] == idx[src], name
        assert spec.in_sign[i] == sign, name


def test_label_mirror_swaps_bodies_and_signs(ds, spec):
    """Right-foot force lands in the left-foot channels with the lateral
    component negated; contact flags swap unsigned."""
    b = next(ds.batches(batch_size=4, shuffle=False))
    y = jnp.asarray(b.labels)
    my = spec.mirror_labels(y)
    off = ds.lab_offsets
    of, _ = off[K.OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME]
    ob, _ = off[K.OutputDataKeys.CONTACT]
    # contact_bodies order is [calcn_r, calcn_l] (synthetic.py)
    assert ds.contact_bodies == ['calcn_r', 'calcn_l']
    f = np.asarray(y[..., of:of + 6])
    mf = np.asarray(my[..., of:of + 6])
    np.testing.assert_allclose(mf[..., 0:2], f[..., 3:5], rtol=1e-6)   # x,y
    np.testing.assert_allclose(mf[..., 2], -f[..., 5], rtol=1e-6)      # z
    np.testing.assert_allclose(mf[..., 3:5], f[..., 0:2], rtol=1e-6)
    np.testing.assert_allclose(mf[..., 5], -f[..., 2], rtol=1e-6)
    c = np.asarray(y[..., ob:ob + 2])
    mc = np.asarray(my[..., ob:ob + 2])
    np.testing.assert_allclose(mc, c[..., ::-1], rtol=1e-6)


def test_mirror_twice_is_identity_on_batches(ds, spec):
    b = next(ds.batches(batch_size=8, shuffle=False))
    x, y = jnp.asarray(b.inputs), jnp.asarray(b.labels)
    np.testing.assert_allclose(spec.mirror_inputs(spec.mirror_inputs(x)), x,
                               atol=1e-6)
    np.testing.assert_allclose(spec.mirror_labels(spec.mirror_labels(y)), y,
                               atol=1e-6)


def test_augmenter_deterministic_and_seed_sensitive(ds, spec):
    b = next(ds.batches(batch_size=16, shuffle=False))
    x, y = jnp.asarray(b.inputs), jnp.asarray(b.labels)
    aug = Augmenter(mirror=spec, noise_std=0.05)
    a1, l1 = aug(x, y, jax.random.PRNGKey(7))
    a2, l2 = aug(x, y, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    a3, _ = aug(x, y, jax.random.PRNGKey(8))
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))


def test_mirror_prob_one_mirrors_every_sample(ds, spec):
    b = next(ds.batches(batch_size=8, shuffle=False))
    x, y = jnp.asarray(b.inputs), jnp.asarray(b.labels)
    aug = Augmenter(mirror=spec, mirror_prob=1.0)
    ax, ay = aug(x, y, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(ax),
                               np.asarray(spec.mirror_inputs(x)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ay),
                               np.asarray(spec.mirror_labels(y)), atol=1e-6)


def test_maybe_augment_none_passthrough(ds):
    b = next(ds.batches(batch_size=4, shuffle=False))
    x, y = jnp.asarray(b.inputs), jnp.asarray(b.labels)
    ax, ay = maybe_augment(None, x, y, jax.random.PRNGKey(0))
    assert ax is x and ay is y


def test_augmenter_rejects_noop_config():
    with pytest.raises(ValueError):
        Augmenter(mirror=None, noise_std=0.0)


def test_opensim_semantic_names_flip():
    """Rajagopal-style names (no axis suffix) use the convention table."""
    dofs = ['pelvis_tilt', 'pelvis_list', 'pelvis_rotation',
            'pelvis_tx', 'pelvis_ty', 'pelvis_tz',
            'hip_flexion_r', 'hip_adduction_r', 'hip_rotation_r',
            'hip_flexion_l', 'hip_adduction_l', 'hip_rotation_l',
            'lumbar_extension', 'lumbar_bending', 'lumbar_rotation']
    spec = build_mirror_spec(dofs, [f'j{i}' for i in range(12)],
                             ['calcn_r', 'calcn_l'], root_history_len=3)
    idx = {n: i for i, n in enumerate(dofs)}
    sign = {n: spec.in_sign[idx[n]] for n in dofs}
    assert sign['pelvis_tilt'] == +1 and sign['pelvis_list'] == -1
    assert sign['pelvis_rotation'] == -1 and sign['pelvis_tz'] == -1
    assert sign['hip_flexion_r'] == +1 and sign['hip_adduction_r'] == -1
    assert sign['hip_rotation_l'] == -1 and sign['lumbar_bending'] == -1
    assert sign['lumbar_extension'] == +1
    assert spec.in_perm[idx['hip_flexion_r']] == idx['hip_flexion_l']


def test_train_step_with_augmenter_runs_and_differs(ds, spec):
    """make_train_step(augment=...) trains; the augmented gradient stream
    differs from the unaugmented one under the same seed."""
    from inferbiomechanics_tpu.loss.evaluator import LossConfig
    from inferbiomechanics_tpu.models import get_model
    from inferbiomechanics_tpu.train.optimizers import make_optimizer
    from inferbiomechanics_tpu.train.state import create_train_state
    from inferbiomechanics_tpu.train.step import make_train_step

    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=10, stride=2,
                      root_history_len=ds.root_history_len,
                      output_data_format='all_frames',
                      hidden_dims=[32])
    b = next(ds.batches(batch_size=8, shuffle=False))
    x, y = jnp.asarray(b.inputs), jnp.asarray(b.labels)
    tx = make_optimizer('adam', 1e-3)

    def run(augment):
        state = create_train_state(model, jax.random.PRNGKey(0), x, tx)
        step = make_train_step(model, ds.lab_offsets, LossConfig(),
                               donate=False, augment=augment)
        state, metrics = step(state, x, y, jax.random.PRNGKey(1))
        return state, metrics

    s_plain, m_plain = run(None)
    s_aug, m_aug = run(Augmenter(mirror=spec, noise_std=0.02))
    assert np.isfinite(float(m_aug['loss']))
    # augmentation changed the batch, hence the loss and the update
    assert float(m_aug['loss']) != float(m_plain['loss'])
    leaves_p = jax.tree_util.tree_leaves(s_plain.params)
    leaves_a = jax.tree_util.tree_leaves(s_aug.params)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves_p, leaves_a))


def test_device_tier_with_augmenter(ds, spec):
    """The device-resident step compiles and runs with augmentation."""
    from inferbiomechanics_tpu.loss.evaluator import LossConfig
    from inferbiomechanics_tpu.models import get_model
    from inferbiomechanics_tpu.train.device_data import (
        DeviceResidentData, make_device_train_step)
    from inferbiomechanics_tpu.train.optimizers import make_optimizer
    from inferbiomechanics_tpu.train.state import create_train_state

    model = get_model('feedforward', num_dofs=ds.num_dofs,
                      num_contact_bodies=ds.num_contact_bodies,
                      history_len=10, stride=2,
                      root_history_len=ds.root_history_len,
                      output_data_format='all_frames',
                      hidden_dims=[32])
    data = DeviceResidentData(ds)
    step = make_device_train_step(
        model, data, LossConfig(), donate=False,
        augment=Augmenter(mirror=spec, noise_std=0.01))
    b = next(ds.batches(batch_size=8, shuffle=False))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(b.inputs),
                               make_optimizer('adam', 1e-3))
    idx = jnp.arange(8, dtype=jnp.int32)
    state, metrics = step(state, idx, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics['loss']))


@pytest.mark.slow
def test_diffusion_step_with_augmenter(ds, spec):
    """The diffusion ε-step augments the conditioning AND targets."""
    from inferbiomechanics_tpu.models.diffusion import (
        DDPMSchedule, DiffusionDenoiser, make_diffusion_train_step)
    from inferbiomechanics_tpu.train.optimizers import make_optimizer
    from inferbiomechanics_tpu.train.state import TrainState

    model = DiffusionDenoiser(num_dofs=ds.num_dofs,
                              num_contact_bodies=ds.num_contact_bodies,
                              history_len=10, stride=2, d_model=32,
                              num_layers=1, num_heads=2, timesteps=16)
    b = next(ds.batches(batch_size=8, shuffle=False))
    x, y = jnp.asarray(b.inputs), jnp.asarray(b.labels)
    x0 = jnp.zeros((8, x.shape[1], model.target_channels))
    t0 = jnp.zeros((8,), jnp.int32)
    variables = model.init({'params': jax.random.PRNGKey(0)}, x0, t0, x,
                           train=False)
    tx = make_optimizer('adam', 1e-3)

    def run(augment):
        state = TrainState(step=jnp.asarray(0, jnp.int32),
                           params=variables['params'],
                           opt_state=tx.init(variables['params']),
                           batch_stats={}, tx=tx, apply_fn=model.apply)
        step = make_diffusion_train_step(model, ds.lab_offsets,
                                         DDPMSchedule(16), donate=False,
                                         augment=augment)
        state, metrics = step(state, x, y, jax.random.PRNGKey(1))
        return metrics

    m_plain = run(None)
    m_aug = run(Augmenter(mirror=spec))
    assert np.isfinite(float(m_aug['loss']))
    assert float(m_aug['loss']) != float(m_plain['loss'])


def test_diffusion_loop_with_augment_config(ds, tmp_path):
    from inferbiomechanics_tpu.train.diffusion_loop import train_diffusion

    cfg = Config(window_size=10, stride=2, output_data_format='all_frames',
                 model_type='diffusion', d_model=32, num_layers=1,
                 num_heads=2, diffusion_timesteps=16, epochs=1,
                 batch_size=8, opt_type='adam', learning_rate=1e-3,
                 checkpoint_dir=str(tmp_path / 'ckpt'),
                 augment_mirror=True, no_wandb=True)
    res = train_diffusion(cfg, ds, dev_ds=None)
    assert res.epochs_run == 1
    assert np.isfinite(res.final_train_metrics['eps_mse'])


def test_sweep_with_augmenter(ds, tmp_path):
    """The vmapped sweep trains with augmentation: the shared batch is
    augmented once and feeds all K configs."""
    from inferbiomechanics_tpu.train.sweep import run_sweep

    cfg = Config(window_size=10, stride=2, output_data_format='all_frames',
                 model_type='feedforward', hidden_dims=[16], epochs=1,
                 batch_size=8, opt_type='adam',
                 checkpoint_dir=str(tmp_path / 'ckpt'),
                 augment_mirror=True, augment_noise_std=0.01,
                 no_wandb=True)
    res = run_sweep(cfg, ds, dev_ds=ds, lrs=[1e-3, 1e-2], seeds=[0],
                    max_batches_per_epoch=3)
    assert len(res.points) == 2
    assert all(np.isfinite(p.final_train_loss) for p in res.points)


def test_train_cli_flags_reach_the_loop(ds, tmp_path):
    """End to end: Config flags drive an augmented training run."""
    from inferbiomechanics_tpu.train.loop import train

    cfg = Config(window_size=10, stride=2, output_data_format='all_frames',
                 model_type='feedforward', hidden_dims=[16], epochs=1,
                 batch_size=8, opt_type='adam', learning_rate=1e-3,
                 checkpoint_dir=str(tmp_path / 'ckpt'),
                 augment_mirror=True, augment_noise_std=0.02,
                 device_data='off', no_wandb=True)
    res = train(cfg, ds, dev_ds=None, max_batches_per_epoch=3)
    assert res.epochs_run == 1
    assert np.isfinite(res.final_train_metrics['loss'])


def test_mirror_spec_involution_property_random_skeletons():
    """Property: for ANY name/axis soup the builder accepts, the mirror
    transform is an involution with unit signs (100 random skeletons)."""
    rng = np.random.default_rng(42)
    from inferbiomechanics_tpu.data.b3d import JointSpec

    semantic = ['pelvis_tilt', 'pelvis_list', 'pelvis_rotation',
                'lumbar_extension', 'lumbar_bending', 'knee_angle',
                'ankle_angle', 'wobble']
    for trial in range(100):
        dofs, joints = [], []
        # free root
        root = f'root{trial}'
        dofs += [f'{root}_rot_{a}' for a in 'xyz']
        dofs += [f'{root}_t{a}' for a in 'xyz']
        # paired revolute joints with random (shared or mirrored) axes
        for j in range(rng.integers(0, 4)):
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            for side in ('r', 'l'):
                name = f'j{j}_{side}'
                a = axis if side == 'r' else axis * rng.choice(
                    [1.0, -1.0], size=3)
                joints.append(JointSpec(name, 'revolute', -1, 0,
                                        [0.0, 0.0, 0.0], list(a)))
                dofs.append(name)
        # paired ball joints
        for j in range(rng.integers(0, 3)):
            for side in ('r', 'l'):
                dofs += [f'b{j}_{side}_{a}' for a in 'xyz']
        # semantic + unpaired leftovers
        dofs += list(rng.choice(semantic, size=rng.integers(0, 4),
                                replace=False))
        dofs.append(f'orphan_{trial}_r')      # partnerless
        jnames = [f'jc{i}_r' if i % 2 == 0 else f'jc{i - 1}_l'
                  for i in range(12)]
        bodies = ['calcn_r', 'calcn_l'] if trial % 2 else ['foot']
        lat = int(rng.integers(0, 3))
        spec = build_mirror_spec(dofs, jnames, bodies,
                                 root_history_len=int(rng.integers(1, 5)),
                                 lateral_axis=lat, joints=joints)
        for perm, sign in ((spec.in_perm, spec.in_sign),
                           (spec.lab_perm, spec.lab_sign)):
            assert (perm[perm] == np.arange(len(perm))).all(), trial
            assert np.allclose(sign[perm] * sign, 1.0), trial
            assert np.all(np.abs(sign) == 1.0), trial


def test_ball_joint_ordered_axes_mirror_signs():
    """Rajagopal-convention hips (ordered z,x,y rotation axes with the
    LEFT side's adduction/rotation axes negated so both sides read
    'toward midline positive') must mirror with sign +1 on ALL three hip
    coordinates — the euler-XYZ letter rule would wrongly flip two of
    them (round-4 osim fidelity interaction)."""
    from inferbiomechanics_tpu.data.b3d import JointSpec
    from inferbiomechanics_tpu.train.augment import _dof_signs

    zxy_r = [[0, 0, 1], [1, 0, 0], [0, 1, 0]]
    zxy_l = [[0, 0, 1], [-1, 0, 0], [0, -1, 0]]
    joints = [
        JointSpec('hip_r', 'ball', 0, 1, [0, 0, 0], rot_axes=zxy_r),
        JointSpec('hip_l', 'ball', 0, 2, [0, 0, 0], rot_axes=zxy_l),
    ]
    names = ['hip_r_x', 'hip_r_y', 'hip_r_z', 'hip_l_x', 'hip_l_y',
             'hip_l_z']
    signs, approx = _dof_signs(names, lateral_axis=2, joints=joints)
    np.testing.assert_array_equal(signs, np.ones(6, np.float32))
    assert approx == []

    # canonical (rot_axes None) keeps the legacy euler-XYZ rule: x and y
    # components flip under a z-mirror
    joints_c = [JointSpec('hip_r', 'ball', 0, 1, [0, 0, 0]),
                JointSpec('hip_l', 'ball', 0, 2, [0, 0, 0])]
    signs_c, _ = _dof_signs(names, lateral_axis=2, joints=joints_c)
    np.testing.assert_array_equal(signs_c,
                                  [-1, -1, 1, -1, -1, 1])

    # ONE-SIDED non-canonical pair: osim.py drops exactly-canonical
    # rot_axes, so a right joint rotating about x,y,z against a left
    # joint negating y/z arrives with only the left entry. The missing
    # side must default to the CANONICAL axes — copying the present side
    # would invert the y sign (regression, round-4 review).
    neg_l = [[1, 0, 0], [0, -1, 0], [0, 0, -1]]
    joints_o = [JointSpec('hip_r', 'ball', 0, 1, [0, 0, 0]),
                JointSpec('hip_l', 'ball', 0, 2, [0, 0, 0],
                          rot_axes=neg_l)]
    signs_o, approx_o = _dof_signs(names, lateral_axis=2, joints=joints_o)
    np.testing.assert_array_equal(signs_o, [-1, 1, -1, -1, 1, -1])
    assert approx_o == []


def test_mirror_outputs_involution_and_tta_math(ds, spec):
    """mirror_outputs is an involution on model-output dicts, and the
    TTA eval equals the manual half-sum of the plain and mirrored
    forwards (round 4, analyze/serve --tta-mirror)."""
    import jax
    import jax.numpy as jnp
    from inferbiomechanics_tpu.loss import LossConfig
    from inferbiomechanics_tpu.models.feedforward import FeedForwardBaseline
    from inferbiomechanics_tpu.train import create_train_state, make_optimizer
    from inferbiomechanics_tpu.train.augment import (
        make_tta_eval_step, mirror_outputs)

    # f32 compute: the assertions are exact-math properties (involution,
    # half-sum, equivariance) — bf16 in/out-of-jit fusion noise would
    # only blur them
    model = FeedForwardBaseline(num_dofs=ds.num_dofs,
                                num_contact_bodies=ds.num_contact_bodies,
                                history_len=10, stride=2,
                                root_history_len=ds.root_history_len,
                                output_data_format='all_frames',
                                hidden_dims=(16,),
                                compute_dtype=jnp.float32)
    b = ds.gather(np.arange(8))
    x = jnp.asarray(b.inputs)
    y = jnp.asarray(b.labels)
    state = create_train_state(model, jax.random.PRNGKey(0), x,
                               make_optimizer('adam', 1e-3))

    o = model.apply({'params': state.params}, x, train=False)
    o2 = mirror_outputs(spec, ds.lab_offsets,
                        mirror_outputs(spec, ds.lab_offsets, o))
    for k in o:
        np.testing.assert_allclose(np.asarray(o2[k]), np.asarray(o[k]),
                                   atol=1e-6)

    tta = make_tta_eval_step(model, ds.lab_offsets, LossConfig(), spec)
    outputs, metrics = tta(state, x, y)
    om = model.apply({'params': state.params}, spec.mirror_inputs(x),
                     train=False)
    om = mirror_outputs(spec, ds.lab_offsets, om)
    for k in outputs:
        np.testing.assert_allclose(
            np.asarray(outputs[k]),
            0.5 * (np.asarray(o[k]) + np.asarray(om[k])), atol=1e-5)
    assert np.isfinite(float(metrics['loss']))

    # equivariance: predicting the mirrored window gives the mirrored
    # prediction (the defining property of the TTA-symmetrized model)
    out_m, _ = tta(state, spec.mirror_inputs(x), y)
    back = mirror_outputs(spec, ds.lab_offsets, out_m)
    for k in outputs:
        np.testing.assert_allclose(np.asarray(back[k]),
                                   np.asarray(outputs[k]), atol=1e-5)
