"""``visualize-file`` subcommand.

Capability parity: reference ``src/cli/visualize_file.py`` — single
``.b3d`` viewer on port 8080: sliding-window model predictions per frame,
label vs predicted forces at CoPs, frames with missing GRF flagged red,
predicted forces zeroed when a foot's share of total force < 0.3
(ref :267-277). TPU-native: all windows of the trial are predicted in one
batched pass, then exported to the HTML viewer (optionally served).
"""

from __future__ import annotations

import argparse
import os

from inferbiomechanics_tpu.config import add_config_flags, config_from_args
from inferbiomechanics_tpu.data.b3d import MissingGRFReason
from inferbiomechanics_tpu.data.dataset import WindowDataset
from inferbiomechanics_tpu.inference import Predictor
from inferbiomechanics_tpu.viz.viewer import STANDARD_BONES, export_html, serve_file


def build_viz_payload(ds: WindowDataset, subject_index: int, trial: int,
                      predictor=None, geometry_folder: str = ''):
    """Assemble viewer frames for one trial (joints, forces, missing flags,
    and — when the subject carries a skeleton — FK-posed Geometry meshes
    like the live viewer)."""
    subject = ds.subjects[subject_index]
    kin = subject.trial_pass_matrix(trial, 0)
    offs = subject.field_offsets

    fk_fn = None
    body_names = []
    meshes = {}
    try:
        import jax
        from inferbiomechanics_tpu.ops.skeleton import compile_skeleton
        from inferbiomechanics_tpu.viz.mesh import load_body_meshes
        skel = compile_skeleton(subject.readSkel(
            subject.getNumProcessingPasses() - 1, geometry_folder))
        body_names = skel.body_names
        meshes = load_body_meshes(geometry_folder, body_names)
        if meshes:
            fk_fn = jax.jit(jax.vmap(skel.fk))
    except (ValueError, KeyError):
        pass
    missing = [int(r) != int(MissingGRFReason.notMissingGRF)
               for r in subject.getMissingGRF(trial)]
    o_jc, w_jc = offs['jointCentersInRootFrame']
    o_cop, w_cop = offs['groundContactCenterOfPressureInRootFrame']
    o_f, w_f = offs['groundContactForceInRootFrame']
    o_rv, _ = offs['rootLinearVelInRootFrame']
    o_rh, w_rh = offs['rootPosHistoryInRootFrame']
    mass = subject.getMassKg()
    nb = w_f // 3

    pred_f = pred_c = None
    pred_at = {}
    if predictor is not None:
        pred = predictor.predict_trial(subject_index, trial)
        if pred is not None:
            forces, cops = predictor.predict_forces_at_frames(pred)
            for i, fr in enumerate(pred.last_frame):
                pred_at[int(fr)] = (forces[i], cops[i])

    frames = []
    T = kin.shape[0]
    all_bodies = None
    if fk_fn is not None:
        import numpy as np
        o_p, w_p = offs['pos']
        qs = np.array(kin[:, o_p:o_p + w_p], np.float64)
        qs[:, :6] = 0.0   # root-zeroed like the live viewer
        Rs, ps = fk_fn(qs)
        Rs, ps = np.asarray(Rs), np.asarray(ps)
        all_bodies = [
            {name: {'R': Rs[i, bi].reshape(-1).round(4).tolist(),
                    'p': ps[i, bi].round(4).tolist()}
             for bi, name in enumerate(body_names) if name in meshes}
            for i in range(T)]
    for i in range(T):
        joints = kin[i, o_jc:o_jc + w_jc].reshape(12, 3).tolist()
        label_forces = []
        for b in range(nb):
            cop = kin[i, o_cop + 3 * b:o_cop + 3 * b + 3]
            f = kin[i, o_f + 3 * b:o_f + 3 * b + 3] / mass
            label_forces.append([cop.tolist(), f.tolist()])
        fr = {'joints': joints, 'bones': STANDARD_BONES,
              'label_forces': label_forces, 'missing_grf': bool(missing[i]),
              # parity with visualize.py:218-253: root velocity line +
              # root position-history markers, both in the root frame
              'root_vel': kin[i, o_rv:o_rv + 3].tolist(),
              'root_history': kin[i, o_rh:o_rh + w_rh].reshape(-1, 3).tolist()}
        if i in pred_at:
            pf, pc = pred_at[i]
            pf = pf.reshape(nb, 3)
            pc = pc.reshape(nb, 3)
            fr['pred_forces'] = [[pc[b].tolist(), pf[b].tolist()]
                                 for b in range(nb)]
        if all_bodies is not None:
            fr['bodies'] = all_bodies[i]
        frames.append(fr)
    payload = {'dt': subject.getTrialTimestep(trial), 'frames': frames}
    if meshes:
        payload['meshes'] = {name: {'v': v.round(4).tolist(),
                                    'e': e.tolist()}
                             for name, (v, e) in meshes.items()}
    return payload


class VisualizeFileCommand:
    name = 'visualize-file'

    def register_subcommand(self, subparsers) -> None:
        parser = subparsers.add_parser(
            'visualize-file', help='Visualize a single .b3d subject file')
        parser.add_argument('--file', type=str, required=True,
                            help='Path to the .b3d file to visualize')
        parser.add_argument('--trial', type=int, default=0)
        parser.add_argument('--out', type=str, default='outputs/visualize_file.html')
        parser.add_argument('--serve', action='store_true',
                            help='Serve the viewer on port 8080')
        parser.add_argument('--live', action='store_true',
                            help='Live model-in-the-loop WebSocket viewer')
        parser.add_argument('--port', type=int, default=8080)
        parser.add_argument('--host', type=str, default='127.0.0.1',
                            help='Bind address (default loopback; use '
                                 '0.0.0.0 to allow remote access)')
        parser.add_argument('--no-model', action='store_true',
                            help='Skip model predictions (labels only)')
        parser.add_argument('--tta-mirror', action='store_true',
                            help='Mirror test-time augmentation: '
                                 'average each prediction with the '
                                 'un-mirrored prediction of the '
                                 'sagittally mirrored window')
        add_config_flags(parser)
        from inferbiomechanics_tpu.train.run_config import add_run_config_flag
        add_run_config_flag(parser)

    def run(self, args: argparse.Namespace) -> bool:
        if args.command != 'visualize-file':
            return False
        from inferbiomechanics_tpu.train.run_config import (
            use_run_config_if_requested,
        )
        config = use_run_config_if_requested(config_from_args(args), args)
        ds = WindowDataset(args.file, window_size=config.window_size,
                           stride=config.stride, skip_loading_skeletons=True)
        predictor = None
        if not args.no_model and config.model_type != 'analytical':
            checkpoint_dir = os.path.join(os.path.abspath(config.checkpoint_dir),
                                          config.model_type)
            predictor = Predictor(config, checkpoint_dir, ds,
                                  tta_mirror=args.tta_mirror)
            if predictor.epoch < 0:
                print('WARNING: no checkpoint found; predictions come from '
                      'an untrained model')
        if args.live:
            import numpy as np
            from inferbiomechanics_tpu.utils.geometry import ensure_geometry
            from inferbiomechanics_tpu.viz.live_model import serve_live
            win_idx = np.nonzero((ds.win_subject == 0)
                                 & (ds.win_trial == args.trial))[0]
            serve_live(ds, predictor, None, window_indices=win_idx,
                       geometry_folder=ensure_geometry(config.geometry_folder),
                       title=os.path.basename(args.file), port=args.port,
                       host=args.host)
            return True
        from inferbiomechanics_tpu.utils.geometry import ensure_geometry
        payload = build_viz_payload(ds, 0, args.trial, predictor,
                                    geometry_folder=ensure_geometry(
                                        config.geometry_folder))
        path = export_html(args.out, payload,
                           title=os.path.basename(args.file))
        print(f'wrote viewer: {path}')
        if args.serve:
            serve_file(path, args.port, host=args.host)
        return True
