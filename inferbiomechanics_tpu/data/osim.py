"""Best-effort OpenSim ``.osim`` model XML -> :class:`SkeletonSpec` parser.

Capability parity: real AddBiomechanics ``.b3d`` files carry the subject's
scaled OpenSim model as raw XML in each processing-pass header
(``model_osim_text``); the reference hands it to nimblephysics'
``readSkel`` (AddBiomechanicsDataset.py:127), which parses the full
OpenSim model. This module extracts the subset the TPU framework's
rigid-body kernels consume (ops/skeleton.py): the body tree (mass / COM /
inertia) and joint topology (type, axis, parent-frame offset).

Fidelity notes (documented approximations):
- CustomJoint spatial transforms are classified by their *coordinate
  count*: 6 (3 rotational + 3 translational) -> 'free', 3 rotational ->
  'ball', 1 -> 'revolute' about that TransformAxis' axis. Coordinate
  coupling functions (e.g. Rajagopal knee translation splines) are NOT
  reproduced — the joint becomes a pure rotation, which matches how the
  reference's feature schema treats DOFs (one channel per coordinate).
- WeldJoint -> 'fixed' (0 DOF).
- Frame orientations on offset frames are folded into the translation
  only when zero; non-zero orientations are ignored with the translation
  kept (a small frame error, flagged via ``warnings`` in the result).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

from inferbiomechanics_tpu.data.b3d import BodySpec, JointSpec, SkeletonSpec


def _floats(text: Optional[str]) -> List[float]:
    return [float(v) for v in (text or '').split()]


def _find_text(el, tag: str, default: str = '') -> str:
    child = el.find(tag)
    return child.text.strip() if child is not None and child.text else default


def parse_osim(xml_text: str) -> Tuple[SkeletonSpec, List[str]]:
    """Parse an OpenSim model XML string. Returns (spec, warnings)."""
    warnings: List[str] = []
    root = ET.fromstring(xml_text)
    model = root.find('Model') if root.tag == 'OpenSimDocument' else root
    if model is None:
        raise ValueError('no <Model> element in osim XML')

    # -- bodies ---------------------------------------------------------
    bodies: List[BodySpec] = []
    body_index: Dict[str, int] = {}
    bodyset = model.find('BodySet/objects')
    for b in (bodyset if bodyset is not None else []):
        if b.tag != 'Body':
            continue
        name = b.get('name', f'body_{len(bodies)}')
        mass = float(_find_text(b, 'mass', '0') or 0)
        com = _floats(_find_text(b, 'mass_center', '0 0 0')) or [0, 0, 0]
        inertia = _floats(_find_text(b, 'inertia', ''))
        if not inertia:  # OpenSim 3.x style: six scalar elements
            inertia = [float(_find_text(b, f'inertia_{k}', '0') or 0)
                       for k in ('xx', 'yy', 'zz', 'xy', 'xz', 'yz')]
        if len(inertia) != 6:
            inertia = (inertia + [0.0] * 6)[:6]
        body_index[name] = len(bodies)
        bodies.append(BodySpec(name=name, mass=mass, com=com[:3],
                               inertia=inertia))

    # -- joints ---------------------------------------------------------
    def frame_of(joint_el, socket_tag: str):
        """Resolve a joint's parent/child socket to (body name, offset)."""
        ref = _find_text(joint_el, socket_tag)
        frame_name = ref.split('/')[-1]
        for fr in joint_el.findall('frames/PhysicalOffsetFrame'):
            if fr.get('name') == frame_name:
                parent = _find_text(fr, 'socket_parent')
                trans = _floats(_find_text(fr, 'translation', '0 0 0'))
                orient = _floats(_find_text(fr, 'orientation', '0 0 0'))
                if any(abs(v) > 1e-9 for v in orient):
                    warnings.append(
                        f'{joint_el.get("name")}: non-zero frame orientation '
                        f'{orient} ignored')
                body = parent.split('/')[-1]
                return body, (trans + [0, 0, 0])[:3]
        # direct socket to a body/ground (no offset frame)
        return frame_name, [0.0, 0.0, 0.0]

    joints: List[JointSpec] = []
    jointset = model.find('JointSet/objects')
    for j in (jointset if jointset is not None else []):
        name = j.get('name', f'joint_{len(joints)}')
        parent_body, translation = frame_of(j, 'socket_parent_frame')
        child_body, child_off = frame_of(j, 'socket_child_frame')
        if any(abs(v) > 1e-9 for v in child_off):
            warnings.append(f'{name}: child-frame offset {child_off} ignored')
        parent_idx = body_index.get(parent_body, -1)  # ground -> -1
        if child_body not in body_index:
            warnings.append(f'{name}: unknown child body {child_body}, skipped')
            continue
        child_idx = body_index[child_body]

        if j.tag == 'WeldJoint':
            jtype, axis = 'fixed', [0.0, 0.0, 1.0]
        elif j.tag == 'PinJoint':
            jtype, axis = 'revolute', [0.0, 0.0, 1.0]
        elif j.tag in ('BallJoint', 'GimbalJoint'):
            jtype, axis = 'ball', [0.0, 0.0, 1.0]
        elif j.tag == 'FreeJoint':
            jtype, axis = 'free', [0.0, 0.0, 1.0]
        elif j.tag == 'CustomJoint':
            coords = [c.get('name') for c in j.findall('coordinates/Coordinate')]
            rot_axes = []
            coupled_translations = 0
            for ta in j.findall('SpatialTransform/TransformAxis'):
                ta_name = ta.get('name', '')
                has_coord = bool(_find_text(ta, 'coordinates'))
                if ta_name.startswith('rotation') and has_coord:
                    rot_axes.append(_floats(_find_text(ta, 'axis', '0 0 1')))
                elif ta_name.startswith('translation') and has_coord:
                    coupled_translations += 1
            if len(coords) >= 6:
                jtype, axis = 'free', [0.0, 0.0, 1.0]
            elif len(coords) == 3 and len(rot_axes) == 3:
                jtype, axis = 'ball', [0.0, 0.0, 1.0]
            elif len(coords) == 1:
                jtype = 'revolute'
                axis = (rot_axes[0] if rot_axes else [0.0, 0.0, 1.0])
                if coupled_translations or len(rot_axes) != 1:
                    warnings.append(
                        f'{name}: coupled transform functions approximated '
                        f'as pure rotation about {axis}')
            elif len(coords) == 0:
                jtype, axis = 'fixed', [0.0, 0.0, 1.0]
            else:
                jtype, axis = 'ball', [0.0, 0.0, 1.0]
                warnings.append(
                    f'{name}: {len(coords)} coordinates approximated as ball')
        else:
            warnings.append(f'{name}: joint tag {j.tag} treated as fixed')
            jtype, axis = 'fixed', [0.0, 0.0, 1.0]
        joints.append(JointSpec(name=name, type=jtype, parent_body=parent_idx,
                                child_body=child_idx,
                                translation=(translation + [0, 0, 0])[:3],
                                axis=(axis + [0, 0, 1])[:3]))

    # topological order: parents before children (FK unrolls in order)
    ordered: List[JointSpec] = []
    placed = {-1}
    pending = list(joints)
    while pending:
        progress = False
        for j in list(pending):
            if j.parent_body in placed:
                ordered.append(j)
                placed.add(j.child_body)
                pending.remove(j)
                progress = True
        if not progress:
            warnings.append(f'{len(pending)} joints form no tree from '
                            f'ground; appended as-is')
            ordered.extend(pending)
            break
    return SkeletonSpec(joints=ordered, bodies=bodies), warnings
