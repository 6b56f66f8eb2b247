"""Multi-process (multi-host-style) distributed training test.

Spawns two REAL processes that form a jax.distributed cluster over
localhost (CPU backend, 2 virtual devices each → a 4-device global
mesh). Each process loads its own window shard (the DistributedSampler
replacement) and runs data-parallel train steps; the test asserts both
processes observe identical losses and parameters — the actual guarantee
multi-host SPMD must provide (SURVEY.md §2.10 / BASELINE config #5).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = r'''
import os, sys, json
proc_id = int(sys.argv[1]); num_procs = int(sys.argv[2])
coord = sys.argv[3]; data_dir = sys.argv[4]
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(coordinator_address=coord,
                           num_processes=num_procs, process_id=proc_id,
                           local_device_ids=[0, 1])
assert jax.process_count() == num_procs
assert len(jax.devices()) == num_procs * 2

import jax.numpy as jnp, numpy as np
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.data.loader import PrefetchLoader
from inferbiomechanics_tpu.loss import LossConfig
from inferbiomechanics_tpu.models import get_model
from inferbiomechanics_tpu.parallel import make_mesh, batch_sharding, replicate
from inferbiomechanics_tpu.train import create_train_state, make_optimizer, make_train_step

ds = WindowDataset(data_dir, window_size=20, stride=5, skip_loading_skeletons=True)
mesh = make_mesh()
model = get_model('feedforward', num_dofs=ds.num_dofs,
                  num_contact_bodies=ds.num_contact_bodies,
                  history_len=20, stride=5, root_history_len=ds.root_history_len)
B = 8   # per-process (DDP semantics: global batch = num_procs * B)
sample = ds.gather(np.arange(B))
state = create_train_state(model, jax.random.PRNGKey(0),
                           jnp.asarray(sample.inputs), make_optimizer('adam', 1e-3))
state = replicate(mesh, state)   # multi-host-safe replicate
step = make_train_step(model, ds.lab_offsets, LossConfig(), donate=False)

# THE REAL PIPELINE: per-process loader shard -> global sharded arrays
loader = PrefetchLoader(ds, B, sharding=batch_sharding(mesh),
                        shard_index=proc_id, num_shards=num_procs)
losses = []
for k, batch in enumerate(loader.epoch(seed=0)):
    if k >= 3:
        break
    assert batch.inputs.shape[0] == num_procs * B  # global batch
    state, m = step(state, batch.inputs, batch.labels, jax.random.PRNGKey(k))
    losses.append(float(m['loss']))

psum = float(np.sum([np.asarray(x).sum() for x in
                     jax.tree_util.tree_leaves(jax.device_get(
                         jax.tree_util.tree_map(
                             lambda a: a.addressable_data(0), state.params)))]))

# DEVICE-RESIDENT HBM branch (train/device_data.py:42-48): under
# process_count()>1 the packed matrices go through
# make_array_from_process_local_data. Same fixed window indices through
# (a) the host gather and (b) the on-device gather must give identical
# losses from identical states.
from inferbiomechanics_tpu.train.device_data import (
    DeviceResidentData, make_device_train_step,
)
data = DeviceResidentData(ds, sharding=replicate(mesh, jnp.zeros(())).sharding)
idx = np.arange(num_procs * B)
host_batch = ds.gather(idx)
state_h = create_train_state(model, jax.random.PRNGKey(5),
                             jnp.asarray(sample.inputs), make_optimizer('adam', 1e-3))
state_h = replicate(mesh, state_h)
state_d = create_train_state(model, jax.random.PRNGKey(5),
                             jnp.asarray(sample.inputs), make_optimizer('adam', 1e-3))
state_d = replicate(mesh, state_d)
host_step = make_train_step(model, ds.lab_offsets, LossConfig(), donate=False)
dev_step = make_device_train_step(model, data, LossConfig(), donate=False)
_, mh = host_step(state_h, jnp.asarray(host_batch.inputs),
                  jnp.asarray(host_batch.labels), jax.random.PRNGKey(9))
_, md = dev_step(state_d, jnp.asarray(idx, jnp.int32), jax.random.PRNGKey(9))
device_pair = [float(mh['loss']), float(md['loss'])]

# Device-resident dp TRAIN-LOOP semantics (train/loop.py device branch):
# each process ships a DIFFERENT index shard as its slice of a GLOBAL
# batch-sharded array. Regression: per-process numpy fed straight to the
# step is treated as replicated, and with differing values the
# "replicated" parameters silently diverge across processes.
from inferbiomechanics_tpu.parallel import shard_batch
dp_step = make_device_train_step(model, data, LossConfig(), donate=False,
                                 batch_shard=batch_sharding(mesh))
state_g = replicate(mesh, create_train_state(
    model, jax.random.PRNGKey(5), jnp.asarray(sample.inputs),
    make_optimizer('adam', 1e-3)))
dp_losses = []
for k in range(2):
    local = (np.arange(B, dtype=np.int32) + proc_id * B + 3 * k) % len(ds)
    state_g, mg = dp_step(state_g, shard_batch(mesh, local),
                          jax.random.PRNGKey(20 + k))
    dp_losses.append(float(mg['loss']))
def _psum(params):
    return float(np.sum([np.asarray(x).sum() for x in
                         jax.tree_util.tree_leaves(jax.device_get(
                             jax.tree_util.tree_map(
                                 lambda a: a.addressable_data(0), params)))]))
dp_param_sum = _psum(state_g.params)

# Pod-sharded residency on the multi-host mesh: each process fills only
# its addressable shards; the shard-local sample+gather epoch must keep
# the replicated params identical across processes. Construction is
# PROCESS-LOCAL: with materialize_features=False each process featurizes
# ONLY the trials its shards own (host RAM scales with process count).
from inferbiomechanics_tpu.train.sharded_data import (
    ShardedDeviceData, make_sharded_epoch_runner,
)
ds_lazy = WindowDataset(data_dir, window_size=20, stride=5,
                        skip_loading_skeletons=True,
                        materialize_features=False)
_feat_calls = []
_orig_ftf = ds_lazy.featurize_trial_features
ds_lazy.featurize_trial_features = \
    lambda ti: (_feat_calls.append(ti), _orig_ftf(ti))[1]
sdata = ShardedDeviceData(ds_lazy, mesh)
assert sdata.num_shards == len(jax.devices())
n_trials = int(ds_lazy.trial_row_offset.shape[0])
assert 0 < len(_feat_calls) < n_trials, (len(_feat_calls), n_trials)
runner = make_sharded_epoch_runner(model, sdata, LossConfig(),
                                   batch_size=8, steps_per_call=2)
state_s = replicate(mesh, create_train_state(
    model, jax.random.PRNGKey(5), jnp.asarray(sample.inputs),
    make_optimizer('adam', 1e-3)))
state_s, ms = runner(state_s, jax.random.PRNGKey(30))
sharded = [float(ms['loss']), _psum(state_s.params)]

# Config-sharded SWEEP on the multi-process mesh (train/sweep.py): 4
# configs on the 4-device global mesh, one per device. Metrics are
# pinned replicated (readable on every process) and the final state is
# all-gathered for checkpoint slicing.
from inferbiomechanics_tpu.train.sweep import (
    gather_replicated, init_sweep_states, make_sweep_train_step,
    shard_sweep_state, slice_config,
)
tx_u = make_optimizer('adam', 1.0)
sw = init_sweep_states(model, tx_u, jnp.asarray(sample.inputs), [0, 1, 2, 3])
sw = shard_sweep_state(sw, mesh)
sw_step = make_sweep_train_step(model, tx_u, ds.lab_offsets, LossConfig(),
                                [1e-3, 3e-4, 1e-4, 3e-5], donate=False,
                                mesh=mesh)
gb = ds.gather(np.arange(num_procs * B))
sw_losses = []
for kk in range(2):
    sw, sm = sw_step(sw, jnp.asarray(gb.inputs), jnp.asarray(gb.labels),
                     jax.random.PRNGKey(40 + kk))
    sw_losses.append([float(v) for v in np.asarray(sm['loss'])])
sw = gather_replicated(sw, mesh)
sweep_param_sums = [float(np.sum([np.asarray(x).sum() for x in
                                  jax.tree_util.tree_leaves(
                                      slice_config(sw, i).params)]))
                    for i in range(4)]

# 2-D (config, data) SWEEP mesh across processes (round 4): configs
# shard the 'config' axis (one mesh row per process here), pod-sharded
# trial blocks shard 'data' WITHIN each row; the replicated-metric pin
# makes the per-config losses readable on every process.
from inferbiomechanics_tpu.parallel import make_sweep_mesh
from inferbiomechanics_tpu.train.sweep import make_sweep_sharded_train_step
smesh2 = make_sweep_mesh(2)
assert dict(smesh2.shape) == {'config': 2, 'data': 2}
sdata2 = ShardedDeviceData(ds, smesh2)
sw2 = init_sweep_states(model, tx_u, jnp.asarray(sample.inputs), [0, 1])
sw2 = shard_sweep_state(sw2, smesh2)
sw2_step = make_sweep_sharded_train_step(model, tx_u, sdata2, LossConfig(),
                                         [1e-3, 3e-4], batch_size=8,
                                         donate=False, mesh=smesh2)
sw2_losses = []
for kk in range(2):
    sw2, sm2 = sw2_step(sw2, jax.random.PRNGKey(50 + kk))
    sw2_losses.append([float(v) for v in np.asarray(sm2['loss'])])
sw2 = gather_replicated(sw2, smesh2)
sweep2d_param_sums = [float(np.sum([np.asarray(x).sum() for x in
                                    jax.tree_util.tree_leaves(
                                        slice_config(sw2, i).params)]))
                      for i in range(2)]

print(json.dumps({'proc': proc_id, 'losses': losses, 'param_sum': psum,
                  'device_pair': device_pair, 'dp_losses': dp_losses,
                  'dp_param_sum': dp_param_sum, 'sharded': sharded,
                  'owned_trials': sorted(_feat_calls),
                  'sweep_losses': sw_losses,
                  'sweep_param_sums': sweep_param_sums,
                  'sweep2d_losses': sw2_losses,
                  'sweep2d_param_sums': sweep2d_param_sums}))
'''


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    data_dir = str(tmp_path / 'data')
    os.makedirs(data_dir)
    # 4 trials: the pod-sharded tier partitions trials across the
    # 4-device global mesh (one per shard)
    write_synthetic_subject(os.path.join(data_dir, 's.b3d'),
                            num_trials=4, trial_length=200, seed=0)
    worker_py = str(tmp_path / 'worker.py')
    with open(worker_py, 'w') as f:
        f.write(WORKER)

    coord = 'localhost:53421'
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    procs = [subprocess.Popen(
        [sys.executable, worker_py, str(i), '2', coord, data_dir],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=560)
        assert p.returncode == 0, f'worker failed:\n{err[-3000:]}'
        outs.append(out.strip().splitlines()[-1])

    import json
    r0, r1 = (json.loads(o) for o in outs)
    # both processes must observe identical losses and parameters
    np.testing.assert_allclose(r0['losses'], r1['losses'], rtol=1e-6)
    np.testing.assert_allclose(r0['param_sum'], r1['param_sum'], rtol=1e-6)
    assert len(r0['losses']) == 3
    # device-resident HBM gather == host gather, on both processes
    for r in (r0, r1):
        host_loss, dev_loss = r['device_pair']
        np.testing.assert_allclose(host_loss, dev_loss, rtol=2e-3)
    np.testing.assert_allclose(r0['device_pair'], r1['device_pair'], rtol=1e-6)
    # device-resident dp loop: DIFFERENT per-process index shards, yet
    # identical global losses and (critically) identical parameters
    np.testing.assert_allclose(r0['dp_losses'], r1['dp_losses'], rtol=1e-6)
    np.testing.assert_allclose(r0['dp_param_sum'], r1['dp_param_sum'], rtol=1e-6)
    # pod-sharded tier: identical loss and params across processes
    np.testing.assert_allclose(r0['sharded'], r1['sharded'], rtol=1e-6)
    # process-local construction: the two processes featurized DISJOINT
    # trial sets whose union is the whole dataset (host-RAM scaling)
    t0, t1 = set(r0['owned_trials']), set(r1['owned_trials'])
    assert t0 and t1 and not (t0 & t1)
    assert t0 | t1 == set(range(4))
    # config-sharded sweep: both processes read identical replicated
    # per-config losses and, after the final all-gather, identical
    # per-config parameters
    np.testing.assert_allclose(r0['sweep_losses'], r1['sweep_losses'],
                               rtol=1e-6)
    np.testing.assert_allclose(r0['sweep_param_sums'],
                               r1['sweep_param_sums'], rtol=1e-6)
    assert len(set(np.round(r0['sweep_param_sums'], 6))) == 4  # distinct configs
    # 2-D (config, data) sweep mesh: identical replicated per-config
    # losses on both processes, finite, distinct configs after gather
    np.testing.assert_allclose(r0['sweep2d_losses'], r1['sweep2d_losses'],
                               rtol=1e-6)
    assert np.isfinite(np.asarray(r0['sweep2d_losses'])).all()
    np.testing.assert_allclose(r0['sweep2d_param_sums'],
                               r1['sweep2d_param_sums'], rtol=1e-6)
    assert len(set(np.round(r0['sweep2d_param_sums'], 6))) == 2
