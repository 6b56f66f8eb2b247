"""Head-to-head learning-quality parity: reference-shaped torch model vs
this framework's feedforward, SAME synthetic train/dev split, SAME
hyperparameters, SAME batch composition per seed.

This anchors BASELINE.json's north star ("dev-split GRF and COM-acc
RMSE: parity with reference"), which until round 4 had no number on
either side. The torch side is a fresh re-implementation of the
reference's shipped configuration (NOT copied code):

- model shape:   src/models/FeedForwardRegressionBaseline.py:52-121
  (MLP over the flattened window concat, hidden [512,512], sigmoid,
  no dropout/batchnorm, output 30 sliced into CoPs/forces/torques/
  wrenches; torch default Linear init)
- optimizer:     src/cli/train.py:189-190 (torch.optim.RMSprop defaults,
  lr 1e-4)
- loss:          src/loss/RegressionLossEvaluator.py:160-221 (sum of
  ALL components of the four per-channel-MSE vectors — the train.py
  :58-65 defaults — with the CoP term masked to frames with >=10 N/kg
  contact force)
- training loop: src/cli/train.py:201-291 (batch 64, per-epoch shuffle,
  drop-last, 10 epochs default)

Both sides consume the identical packed window arrays from
WindowDataset (fair: the reference's own data semantics, one decode),
and both sides' dev predictions are scored by ONE shared numpy metric
function replicating the reference's reported "Avg Err" metrics
(last-frame mean vector-norm error, RegressionLossEvaluator.py:119-158,
232-263). Per seed, both sides see byte-identical batch index
sequences, so the only differences are framework-shipped ones: weight
init (torch kaiming-uniform vs flax lecun-normal), rmsprop decay
(torch alpha=0.99 vs optax decay=0.9), and our bf16 MXU matmuls.

Run on CPU:  IB_PLATFORM=cpu python scripts/parity_rmse.py \
                 --epochs 10 --seeds 0 1 2 --out /tmp/parity_rmse.json

``--model groundlink`` runs the same study on the reference's GroundLink
CNN (src/models/Groundlink.py:19-107: cnn_features [C,128,128,256,256],
kernel 7 replicate-padded Conv1d + ELU, fc_depth 3 with dropout 0.2,
final Linear(256,30,bias=False), xavier-normal relu-gain init on every
layer followed by an activation — the final un-activated Linear keeps
torch's default init — output_data_format 'all_frames', the train.py
default). Dropout makes both sides stochastic beyond init, so parity is
judged across seeds, not per-seed.

Results are summarized in PARITY_RMSE.md and BASELINE.json "measured".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

WINDOW, STRIDE, BATCH, LR = 50, 5, 64, 1e-4
HIDDEN = (512, 512)


# ---------------------------------------------------------------------------
# Shared, framework-neutral dev metrics (numpy)
# ---------------------------------------------------------------------------

def _mean_norm_err(out: np.ndarray, lab: np.ndarray, vec: int = 3) -> float:
    """Reference get_mean_norm_error (:119-141): last-frame-only norms."""
    b, t, c = out.shape
    d = (out - lab).reshape(b, t, c // vec, vec)
    return float(np.linalg.norm(d[:, -1:, :, :], axis=3).mean())


def dev_metrics(pred: dict, lab: dict) -> dict:
    """Force / CoP / COM-acc Avg Err exactly as the reference reports them
    (RegressionLossEvaluator.py:232-263)."""
    f_o, f_l = pred['forces'], lab['forces']
    # CoP masked to >=10 N/kg contact frames (ref :203-214)
    b, t, c = f_l.shape
    norms = np.linalg.norm(f_l.reshape(b, t, c // 3, 3), axis=-1)
    mask = (norms > 10.0).astype(f_l.dtype)
    mask = np.broadcast_to(mask[..., None], (b, t, c // 3, 3)).reshape(b, t, c)
    com_o = f_o[:, :, :3] + f_o[:, :, 3:]
    com_l = f_l[:, :, :3] + f_l[:, :, 3:]
    return {
        'force_avg_err': _mean_norm_err(f_o, f_l),
        'cop_avg_err': _mean_norm_err(pred['cops'] * mask, lab['cops'] * mask),
        'com_acc_avg_err': _mean_norm_err(com_o, com_l),
    }


def label_slices(lab_offsets) -> dict:
    from inferbiomechanics_tpu.data import keys as K
    names = {
        'forces': K.OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME,
        'cops': K.OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME,
        'torques': K.OutputDataKeys.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME,
        'wrenches': K.OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME,
    }
    return {short: lab_offsets[full] for short, full in names.items()}


def slice_labels(y: np.ndarray, sl: dict) -> dict:
    return {k: y[..., o:o + w] for k, (o, w) in sl.items()}


def batch_schedule(n: int, seed: int, epochs: int) -> list:
    """One shared permutation stream per seed -> identical batches on
    both sides (reference shuffles per epoch, train.py:143-150)."""
    rng = np.random.default_rng(seed)
    per_epoch = []
    for _ in range(epochs):
        order = rng.permutation(n)
        nb = n // BATCH
        per_epoch.append([order[i * BATCH:(i + 1) * BATCH] for i in range(nb)])
    return per_epoch


# ---------------------------------------------------------------------------
# Torch side (reference-shaped, written fresh)
# ---------------------------------------------------------------------------

def _torch_groundlink(c_in: int):
    """Reference-shaped GroundLink (Groundlink.py:19-107), written fresh:
    [Dropout(0), replicate-pad Conv1d(k=7), ELU] x 4 over channels
    [c_in,128,128,256,256], then [Dropout(.2), Linear(256,256), ELU] x 2
    + Dropout(.2) + Linear(256,30,bias=False). Xavier-normal with relu
    gain on every layer followed by an activation (the reference's
    initialize() walks (layer, next) pairs, so the final Linear keeps
    torch's default init)."""
    import torch

    feats = [c_in, 128, 128, 256, 256]
    cnn = []
    for ci, co in zip(feats[:-1], feats[1:]):
        conv = torch.nn.Conv1d(ci, co, 7, padding=3,
                               padding_mode='replicate')
        torch.nn.init.xavier_normal_(
            conv.weight, torch.nn.init.calculate_gain('relu'))
        torch.nn.init.zeros_(conv.bias)
        cnn += [torch.nn.Dropout(0.0), conv, torch.nn.ELU()]
    fc = []
    for _ in range(2):
        lin = torch.nn.Linear(256, 256)
        torch.nn.init.xavier_normal_(
            lin.weight, torch.nn.init.calculate_gain('relu'))
        torch.nn.init.zeros_(lin.bias)
        fc += [torch.nn.Dropout(0.2), lin, torch.nn.ELU()]
    fc += [torch.nn.Dropout(0.2), torch.nn.Linear(256, 30, bias=False)]
    return torch.nn.Sequential(*cnn), torch.nn.Sequential(*fc)


def run_torch(x_tr, y_tr, x_dev, lab_dev, sl, seed, epochs, schedule,
              model_type='feedforward'):
    import torch

    torch.manual_seed(seed)
    n, t, c = x_tr.shape
    if model_type == 'groundlink':
        cnn, fc = _torch_groundlink(c)

        def forward(xb):             # [B,T,C] -> [B,T,30] (all_frames)
            h = cnn(xb.transpose(-2, -1))
            return fc(h.transpose(-2, -1))

        params = list(cnn.parameters()) + list(fc.parameters())
        modules = [cnn, fc]
        xt = torch.from_numpy(np.ascontiguousarray(x_tr))
        xd_np = x_dev
    else:
        layers, d = [], t * c
        for h in HIDDEN:
            layers += [torch.nn.Linear(d, h), torch.nn.Sigmoid()]
            d = h
        layers.append(torch.nn.Linear(d, 30))
        model = torch.nn.Sequential(*layers)
        forward = model
        params = list(model.parameters())
        modules = [model]
        xt = torch.from_numpy(np.ascontiguousarray(x_tr.reshape(n, t * c)))
        xd_np = x_dev.reshape(x_dev.shape[0], t * c)
    opt = torch.optim.RMSprop(params, lr=LR)

    yt = {k: torch.from_numpy(np.ascontiguousarray(y_tr[..., o:o + w]))
          for k, (o, w) in sl.items()}

    def heads(out):
        # ff: [B,30] -> [B,1,w] (ref FFN forward :116-120);
        # groundlink: [B,T,30] -> [B,T,w] (ref Groundlink forward :151-157)
        if out.ndim == 2:
            out = out.reshape(out.shape[0], 1, 30)
        return {'cops': out[..., 0:6], 'forces': out[..., 6:12],
                'torques': out[..., 12:18], 'wrenches': out[..., 18:30]}

    def sq_mean_vec(o, l):  # ref get_squared_diff_mean_vector (:73-83)
        return ((o - l) ** 2).mean(dim=(0, 1))

    curve = []
    for ep in range(epochs):
        for m in modules:
            m.train()
        for idx in schedule[ep]:
            bi = torch.from_numpy(idx.astype(np.int64))
            pred = heads(forward(xt[bi]))
            lab = {k: v[bi] for k, v in yt.items()}
            f_l = lab['forces']
            b, tt, cc = f_l.shape
            with torch.no_grad():  # mask under no_grad (ref :203-214)
                norms = f_l.reshape(b, tt, cc // 3, 3).norm(dim=-1)
                mask = (norms > 10.0).float().unsqueeze(-1) \
                    .expand(b, tt, cc // 3, 3).reshape(b, tt, cc)
            loss = (sq_mean_vec(pred['forces'], lab['forces']).sum()
                    + sq_mean_vec(pred['cops'] * mask, lab['cops'] * mask).sum()
                    + sq_mean_vec(pred['torques'], lab['torques']).sum()
                    + sq_mean_vec(pred['wrenches'], lab['wrenches']).sum())
            opt.zero_grad()
            loss.backward()
            opt.step()
        with torch.no_grad():
            for m in modules:
                m.eval()
            outs = []
            xd = torch.from_numpy(np.ascontiguousarray(xd_np))
            for i in range(0, len(xd), 512):
                outs.append(forward(xd[i:i + 512]))
            pred = heads(torch.cat(outs))
        pred = {k: v.numpy() for k, v in pred.items()}
        curve.append(dev_metrics(pred, lab_dev))
    return curve


# ---------------------------------------------------------------------------
# JAX side (this framework's shipped training path)
# ---------------------------------------------------------------------------

def run_jax(ds, x_tr, y_tr, x_dev, lab_dev, sl, seed, epochs, schedule,
            model_type='feedforward'):
    import jax
    import jax.numpy as jnp
    from inferbiomechanics_tpu.data import keys as K
    from inferbiomechanics_tpu.loss import LossConfig
    from inferbiomechanics_tpu.models import get_model
    from inferbiomechanics_tpu.train import (
        create_train_state, make_eval_step, make_optimizer, make_train_step)

    if model_type == 'groundlink':
        model = get_model('groundlink', num_dofs=ds.num_dofs,
                          num_contact_bodies=ds.num_contact_bodies,
                          history_len=WINDOW, stride=STRIDE,
                          root_history_len=ds.root_history_len,
                          output_data_format='all_frames')
    elif model_type == 'transformer':
        # shipped defaults (models/__init__.py): d_model 256, 4 layers,
        # 8 heads, vpu attention, aux tau/com-acc/contact heads on.
        # No torch side exists for this family (the reference's
        # TransformerBaseline is dead code, SURVEY.md §2.8) — it is
        # anchored against the feedforward numbers by
        # scripts/anchor_quality.py.
        model = get_model('transformer', num_dofs=ds.num_dofs,
                          num_contact_bodies=ds.num_contact_bodies,
                          history_len=WINDOW, stride=STRIDE,
                          root_history_len=ds.root_history_len,
                          output_data_format='all_frames')
    else:
        model = get_model('feedforward', num_dofs=ds.num_dofs,
                          num_contact_bodies=ds.num_contact_bodies,
                          history_len=WINDOW, stride=STRIDE,
                          root_history_len=ds.root_history_len,
                          hidden_dims=list(HIDDEN), activation='sigmoid')
    cfg = LossConfig(predict_grf_components=tuple(range(6)),
                     predict_cop_components=tuple(range(6)),
                     predict_moment_components=tuple(range(6)),
                     predict_wrench_components=tuple(range(12)))
    state = create_train_state(model, jax.random.PRNGKey(seed),
                               jnp.asarray(x_tr[:2]),
                               make_optimizer('rmsprop', LR))
    step = make_train_step(model, ds.lab_offsets, cfg, donate=False)
    eval_step = make_eval_step(model, ds.lab_offsets, cfg)

    x = jnp.asarray(x_tr)
    y = jnp.asarray(y_tr)
    xd = jnp.asarray(x_dev)
    yd_dummy = jnp.zeros((x_dev.shape[0], y_tr.shape[1], y_tr.shape[2]),
                         y.dtype)
    rng = jax.random.PRNGKey(seed + 1000)
    short = {'cops': K.OutputDataKeys.GROUND_CONTACT_COPS_IN_ROOT_FRAME,
             'forces': K.OutputDataKeys.GROUND_CONTACT_FORCES_IN_ROOT_FRAME,
             'torques': K.OutputDataKeys.GROUND_CONTACT_TORQUES_IN_ROOT_FRAME,
             'wrenches': K.OutputDataKeys.GROUND_CONTACT_WRENCHES_IN_ROOT_FRAME}

    curve = []
    it = 0
    for ep in range(epochs):
        for idx in schedule[ep]:
            bi = jnp.asarray(idx.astype(np.int32))
            state, _ = step(state, x[bi], y[bi], jax.random.fold_in(rng, it))
            it += 1
        preds = []
        for i in range(0, x_dev.shape[0], 512):
            outputs, _ = eval_step(state, xd[i:i + 512], yd_dummy[i:i + 512])
            preds.append({k: np.asarray(outputs[full], np.float32)
                          for k, full in short.items()})
        pred = {k: np.concatenate([p[k] for p in preds]) for k in short}
        curve.append(dev_metrics(pred, lab_dev))
    return curve


# ---------------------------------------------------------------------------
# Study data (shared with scripts/anchor_quality.py so the transformer /
# diffusion anchors score against the SAME split as the feedforward /
# GroundLink head-to-heads)
# ---------------------------------------------------------------------------

def build_study_data(data_dir: str, trial_length: int, fmt: str):
    """Build (or reuse) the study's synthetic split and return
    ``(ds_tr, ds_dev, x_tr, y_tr, x_dev, lab_dev, sl)`` packed arrays.

    Refuses a --data dir written at a different --trial-length (stale
    files would silently change the corpus)."""
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject

    tr_dir = os.path.join(data_dir, 'train')
    dev_dir = os.path.join(data_dir, 'dev')
    os.makedirs(tr_dir, exist_ok=True)
    os.makedirs(dev_dir, exist_ok=True)
    marker = os.path.join(data_dir, '.trial_length')
    have_files = any(
        os.path.exists(os.path.join(d, n))
        for d, n in [(tr_dir, 'train_s0.b3d'), (dev_dir, 'dev_s0.b3d')])
    if os.path.exists(marker):
        prev = int(open(marker).read().strip())
        if prev != trial_length:
            raise SystemExit(
                f'{data_dir} holds trials of length {prev}, not '
                f'{trial_length}; pass a fresh --data dir')
    elif have_files:
        raise SystemExit(
            f'{data_dir} holds subject files of unknown trial length '
            f'(no .trial_length marker); pass a fresh --data dir')
    else:
        with open(marker, 'w') as f:
            f.write(str(trial_length))
    for i in range(2):
        p = os.path.join(tr_dir, f'train_s{i}.b3d')
        if not os.path.exists(p):
            write_synthetic_subject(p, num_trials=2,
                                    trial_length=trial_length,
                                    seed=100 + i)
    p = os.path.join(dev_dir, 'dev_s0.b3d')
    if not os.path.exists(p):
        write_synthetic_subject(p, num_trials=2,
                                trial_length=trial_length, seed=200)

    ds_tr = WindowDataset(tr_dir, window_size=WINDOW, stride=STRIDE,
                          output_data_format=fmt)
    ds_dev = WindowDataset(dev_dir, window_size=WINDOW, stride=STRIDE,
                           output_data_format=fmt)
    b_tr = ds_tr.gather(np.arange(len(ds_tr)))
    b_dev = ds_dev.gather(np.arange(len(ds_dev)))
    x_tr = np.asarray(b_tr.inputs, np.float32)
    y_tr = np.asarray(b_tr.labels, np.float32)
    x_dev = np.asarray(b_dev.inputs, np.float32)
    y_dev = np.asarray(b_dev.labels, np.float32)
    sl = label_slices(ds_tr.lab_offsets)
    lab_dev = slice_labels(y_dev, sl)
    return ds_tr, ds_dev, x_tr, y_tr, x_dev, lab_dev, sl


# ---------------------------------------------------------------------------

def main():
    # CPU venue by default: the reference trained on CPU SLURM partitions
    # (BASELINE.md), torch here is CPU-only, and batch-64 dispatch over
    # the axon tunnel would measure the tunnel. IB_PLATFORM=axon opts out.
    if os.environ.get('IB_PLATFORM', 'cpu') == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=10)
    ap.add_argument('--seeds', type=int, nargs='+', default=[0, 1, 2])
    ap.add_argument('--model', choices=('feedforward', 'groundlink'),
                    default='feedforward')
    ap.add_argument('--out', default='/tmp/parity_rmse.json')
    ap.add_argument('--data', default='/tmp/ib_parity_data')
    ap.add_argument('--trial-length', type=int, default=1500,
                    help='frames per synthetic trial (small values make '
                         'a fast smoke run; the study used 1500)')
    args = ap.parse_args()

    fmt = 'all_frames' if args.model == 'groundlink' else 'last_frame'
    ds_tr, ds_dev, x_tr, y_tr, x_dev, lab_dev, sl = build_study_data(
        args.data, args.trial_length, fmt)
    print(f'train windows {len(ds_tr)}  dev windows {len(ds_dev)}  '
          f'input [{x_tr.shape[1]}x{x_tr.shape[2]}]', flush=True)

    results = {'config': {'window': WINDOW, 'stride': STRIDE, 'batch': BATCH,
                          'lr': LR, 'hidden': list(HIDDEN),
                          'model': args.model,
                          'epochs': args.epochs, 'seeds': args.seeds,
                          'n_train': len(ds_tr), 'n_dev': len(ds_dev),
                          'trial_length': args.trial_length},
               'torch': {}, 'jax': {}}
    for seed in args.seeds:
        schedule = batch_schedule(len(ds_tr), seed, args.epochs)
        t0 = time.time()
        results['torch'][str(seed)] = run_torch(
            x_tr, y_tr, x_dev, lab_dev, sl, seed, args.epochs, schedule,
            model_type=args.model)
        tt = time.time() - t0
        t0 = time.time()
        results['jax'][str(seed)] = run_jax(
            ds_tr, x_tr, y_tr, x_dev, lab_dev, sl, seed, args.epochs, schedule,
            model_type=args.model)
        tj = time.time() - t0
        ft = results['torch'][str(seed)][-1]
        fj = results['jax'][str(seed)][-1]
        print(f'seed {seed}: torch {tt:.0f}s  force {ft["force_avg_err"]:.4f} '
              f'cop {ft["cop_avg_err"]:.4f} com {ft["com_acc_avg_err"]:.4f} | '
              f'jax {tj:.0f}s  force {fj["force_avg_err"]:.4f} '
              f'cop {fj["cop_avg_err"]:.4f} com {fj["com_acc_avg_err"]:.4f}',
              flush=True)

    with open(args.out, 'w') as f:
        json.dump(results, f, indent=1)
    print(f'wrote {args.out}')

    for m in ('force_avg_err', 'cop_avg_err', 'com_acc_avg_err'):
        tv = [results['torch'][str(s)][-1][m] for s in args.seeds]
        jv = [results['jax'][str(s)][-1][m] for s in args.seeds]
        print(f'{m}: torch {np.mean(tv):.4f} (range {min(tv):.4f}-{max(tv):.4f})'
              f'  jax {np.mean(jv):.4f} (range {min(jv):.4f}-{max(jv):.4f})')


if __name__ == '__main__':
    sys.exit(main())
