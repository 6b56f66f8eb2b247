"""Live viewer stack: WebSocket framing, mesh parsing, end-to-end server.

Parity surface: reference visualize.py:123-263 (per-tick GUI with
transport keys) / visualize_file.py:174-292, NimbleGUI replaced by
viz/ws.py + viz/live.py + viz/mesh.py.
"""

import json
import os
import socket
import time

import numpy as np

from inferbiomechanics_tpu.viz import ws
from inferbiomechanics_tpu.viz.live import LiveSession, LiveViewerServer
from inferbiomechanics_tpu.viz.mesh import (
    decimate, load_body_meshes, parse_obj, parse_ply_ascii,
)


# -- RFC 6455 framing ---------------------------------------------------------

def test_accept_key_rfc_vector():
    # the worked example from RFC 6455 §1.3
    assert ws.accept_key('dGhlIHNhbXBsZSBub25jZQ==') == \
        's3pPLMBiTxaQ9kYGzzhZRbK+xOo='


def test_frame_roundtrip_sizes():
    for n in [0, 1, 125, 126, 300, 70000]:
        payload = bytes(i % 251 for i in range(n))
        server_frame = ws.encode_frame(payload)
        msgs, rest = ws.decode_frames(server_frame)
        assert rest == b'' and msgs == [(ws.OP_TEXT, payload)]
        client_frame = ws.encode_client_frame(payload)
        msgs, rest = ws.decode_frames(client_frame)
        assert rest == b'' and msgs == [(ws.OP_TEXT, payload)]


def test_partial_and_concatenated_frames():
    a = ws.encode_client_frame(b'first')
    b = ws.encode_client_frame(b'second', opcode=ws.OP_PING)
    msgs, rest = ws.decode_frames(a + b[:3])
    assert msgs == [(ws.OP_TEXT, b'first')] and rest == b[:3]
    msgs2, rest2 = ws.decode_frames(rest + b[3:])
    assert msgs2 == [(ws.OP_PING, b'second')] and rest2 == b''


# -- mesh parsing -------------------------------------------------------------

OBJ = """# tiny tetra
v 0 0 0
v 1 0 0
v 0 1 0
v 0 0 1
f 1 2 3
f 1 2 4
f 1/1 3/2 4/3
"""

PLY = """ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
0 1 0
3 0 1 2
"""


def test_parse_obj(tmp_path):
    p = tmp_path / 'm.obj'
    p.write_text(OBJ)
    verts, edges = parse_obj(str(p))
    assert verts.shape == (4, 3)
    assert len(edges) == 6  # tetra minus one face's unique edges
    assert edges.max() == 3


def test_parse_ply(tmp_path):
    p = tmp_path / 'm.ply'
    p.write_text(PLY)
    verts, edges = parse_ply_ascii(str(p))
    assert verts.shape == (3, 3)
    assert len(edges) == 3


def test_decimate_compacts_vertices():
    verts = np.arange(30, dtype=np.float32).reshape(10, 3)
    edges = np.array([[0, 9], [1, 8], [2, 7], [3, 6]], np.int32)
    v2, e2 = decimate((verts, edges), max_edges=2)
    assert len(e2) == 2
    assert len(v2) == len(np.unique(e2))


def test_load_body_meshes_name_matching(tmp_path):
    (tmp_path / 'pelvis.obj').write_text(OBJ)
    (tmp_path / 'femur.obj').write_text(OBJ)
    meshes = load_body_meshes(str(tmp_path), ['pelvis', 'femur_l', 'femur_r',
                                              'missing'])
    assert set(meshes) == {'pelvis', 'femur_l', 'femur_r'}
    # left-side fallback mirrors z
    assert np.allclose(meshes['femur_l'][0][:, 2], -meshes['femur_r'][0][:, 2])


# -- session transport semantics (visualize.py:139-154) -----------------------

def test_session_transport():
    seen = []
    s = LiveSession(20, lambda f: {'f': f}, on_report=lambda: seen.append(1))
    assert s.tick()['frame'] == 0 and s.frame == 1   # playing advances
    s.key(' ')
    assert not s.playing
    assert s.tick()['frame'] == 1 and s.frame == 1   # paused holds
    s.key('e'); assert s.frame == 2
    s.key('a'); assert s.frame == 1
    s.key('r'); assert seen == [1]
    s.frame = 14                                     # wrap at num_frames-5
    s.key('e'); assert s.frame == 0
    s.key('a'); assert s.frame == 14


# -- end-to-end server --------------------------------------------------------

def _ws_client(port):
    """Minimal stdlib WebSocket client: handshake + framed socket."""
    c = socket.create_connection(('127.0.0.1', port), timeout=10)
    c.sendall(b'GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n'
              b'Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n'
              b'Sec-WebSocket-Version: 13\r\n\r\n')
    buf = b''
    while b'\r\n\r\n' not in buf:
        buf += c.recv(4096)
    head, buf = buf.split(b'\r\n\r\n', 1)
    assert b'101' in head.split(b'\r\n')[0]
    assert b's3pPLMBiTxaQ9kYGzzhZRbK+xOo=' in head
    return c, buf


def _recv_messages(c, buf, n, timeout=15):
    msgs = []
    deadline = time.time() + timeout
    while len(msgs) < n and time.time() < deadline:
        got, buf = ws.decode_frames(buf)
        msgs.extend(json.loads(p) for op, p in got if op == ws.OP_TEXT)
        if len(msgs) >= n:
            break
        try:
            chunk = c.recv(65536)
        except socket.timeout:
            continue
        if not chunk:
            break
        buf += chunk
    assert len(msgs) >= n, f'got {len(msgs)} messages'
    return msgs, buf


def test_live_server_end_to_end(tmp_path):
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.viz.live_model import build_live_session

    d = tmp_path / 'data'
    d.mkdir()
    write_synthetic_subject(str(d / 's.b3d'), num_trials=1, trial_length=60,
                            seed=0)
    geom = tmp_path / 'Geometry'
    geom.mkdir()
    (geom / 'pelvis.obj').write_text(OBJ)
    ds = WindowDataset(str(d), window_size=20, stride=5)
    session, init = build_live_session(ds, geometry_folder=str(geom))
    server = LiveViewerServer(session, init, title='test', port=0,
                              tick_interval=0.02)
    port = server.start()
    try:
        # plain HTTP GET serves the client page
        h = socket.create_connection(('127.0.0.1', port), timeout=10)
        h.sendall(b'GET / HTTP/1.1\r\nHost: x\r\n\r\n')
        page = b''
        while b'</html>' not in page:
            chunk = h.recv(65536)
            if not chunk:
                break
            page += chunk
        assert b'WebSocket' in page
        h.close()

        c, buf = _ws_client(port)
        msgs, buf = _recv_messages(c, buf, 3)
        assert msgs[0]['type'] == 'init'
        assert 'pelvis' in msgs[0]['meshes']
        assert msgs[0]['bones']
        frames = [m for m in msgs if m['type'] == 'frame']
        assert frames, 'no frame packets received'
        f = frames[0]
        assert len(f['joints']) == 12
        assert len(f['label_forces']) == 2
        assert 'bodies' in f and 'pelvis' in f['bodies']
        assert len(f['bodies']['pelvis']['R']) == 9

        # key event: pause playback server-side
        c.sendall(ws.encode_client_frame(
            json.dumps({'type': 'key', 'key': ' '}).encode()))
        deadline = time.time() + 5
        while session.playing and time.time() < deadline:
            time.sleep(0.02)
        assert not session.playing
        c.close()
    finally:
        server.stop()


# -- review-file segment loop (ref review_file.py:289-366) --------------------

def test_segment_review_session_semantics():
    from inferbiomechanics_tpu.cli.review_file_cmd import SegmentReviewSession
    segs = [(0, 10, 14, 'WIP'), (1, 50, 52, 'BAD')]
    s = SegmentReviewSession(segs, lambda t, f: {'t': t, 'f': f})
    p = s.tick()
    assert (p['t'], p['f']) == (0, 10) and s.frame == 11
    s.key(' ')                      # pause
    assert s.tick()['f'] == 11 and s.frame == 11
    s.key('e'); s.key('e'); s.key('e')   # 12, 13, wrap -> 10
    assert s.frame == 10
    s.key('a')                      # wrap back to end-1
    assert s.frame == 13
    s.key('n')                      # next segment
    assert s.segment_index == 1 and s.frame == 50
    p = s.tick()
    assert p['t'] == 1 and 'segment 2/2' in p['hud']
    s.key('n')                      # wraps to first
    assert s.segment_index == 0


def test_segment_review_server_end_to_end(tmp_path):
    from inferbiomechanics_tpu.cli.review_file_cmd import serve_segment_review
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    d = tmp_path / 'data'
    d.mkdir()
    write_synthetic_subject(str(d / 's.b3d'), num_trials=1, trial_length=60,
                            seed=0)
    ds = WindowDataset(str(d), window_size=20, stride=5)
    server = serve_segment_review(ds, [(0, 5, 15, 'WIP'), (0, 30, 40, 'GOOD')],
                                  port=0, block=False)
    try:
        c, buf = _ws_client(server.port)
        msgs, buf = _recv_messages(c, buf, 3)
        assert msgs[0]['type'] == 'init'
        frames = [m for m in msgs if m['type'] == 'frame']
        assert frames and 5 <= frames[0]['frame'] < 15
        assert 'segment 1/2' in frames[0]['hud']
        assert len(frames[0]['label_forces']) == 2   # raw plate forces
        # 'n' advances the segment server-side
        c.sendall(ws.encode_client_frame(
            json.dumps({'type': 'key', 'key': 'n'}).encode()))
        deadline = time.time() + 5
        while server.session.segment_index == 0 and time.time() < deadline:
            time.sleep(0.02)
        assert server.session.segment_index == 1
        c.close()
    finally:
        server.stop()


def test_fragmented_message_reassembly():
    """RFC 6455 §5.4: a text message split across TEXT(fin=0) + CONT(fin=1)
    frames surfaces once, whole, with the TEXT opcode."""
    import struct

    def frame(fin, opcode, payload, mask=b'\x01\x02\x03\x04'):
        head = bytes([(0x80 if fin else 0) | opcode, 0x80 | len(payload)])
        return head + mask + bytes(c ^ mask[i % 4]
                                   for i, c in enumerate(payload))

    a = frame(False, ws.OP_TEXT, b'hello ')
    b = frame(True, ws.OP_CONT, b'world')
    # complete in one buffer
    msgs, rest = ws.decode_frames(a + b)
    assert msgs == [(ws.OP_TEXT, b'hello world')] and rest == b''
    # split across reads: first call holds the fragment in the remainder
    msgs, rest = ws.decode_frames(a)
    assert msgs == [] and rest == a
    msgs, rest = ws.decode_frames(rest + b)
    assert msgs == [(ws.OP_TEXT, b'hello world')] and rest == b''
    # three-part fragmentation
    c1 = frame(False, ws.OP_TEXT, b'a')
    c2 = frame(False, ws.OP_CONT, b'b')
    c3 = frame(True, ws.OP_CONT, b'c')
    msgs, rest = ws.decode_frames(c1 + c2 + c3)
    assert msgs == [(ws.OP_TEXT, b'abc')] and rest == b''


def test_no_duplicate_delivery_across_fragment_boundary():
    """A complete control/data frame arriving between a fragment's start
    and its continuation must be delivered exactly once (it is withheld
    with the fragment and emitted on the completing call)."""
    import struct

    def frame(fin, opcode, payload, mask=b'\x01\x02\x03\x04'):
        head = bytes([(0x80 if fin else 0) | opcode, 0x80 | len(payload)])
        return head + mask + bytes(c ^ mask[i % 4]
                                   for i, c in enumerate(payload))

    a = frame(False, ws.OP_TEXT, b'par')       # fragment start
    ping = frame(True, ws.OP_PING, b'hb')      # interleaved control frame
    b = frame(True, ws.OP_CONT, b'tial')       # completes the message
    msgs1, rest = ws.decode_frames(a + ping)   # continuation not yet here
    assert msgs1 == []                         # ping withheld, no dupes
    msgs2, rest2 = ws.decode_frames(rest + b)
    assert rest2 == b''
    assert msgs2 == [(ws.OP_PING, b'hb'), (ws.OP_TEXT, b'partial')]


def test_live_session_multi_subject_skeletons(tmp_path):
    """Multi-subject dev sets pose meshes with each window's own (scaled)
    skeleton: the per-subject FK branch selects parameters by subject."""
    from inferbiomechanics_tpu.data.b3d import write_subject
    from inferbiomechanics_tpu.data.synthetic import (
        CONTACT_BODIES, standard_skeleton, synthetic_trial,
    )
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.viz.live_model import build_live_session

    d = tmp_path / 'data'
    d.mkdir()
    for i, leg_scale in enumerate([1.0, 1.3]):
        sk = standard_skeleton()
        for j in sk.joints:          # scale segment offsets -> FK differs
            j.translation = [t * leg_scale for t in j.translation]
        rng = np.random.default_rng(i)
        write_subject(str(d / f's{i}.b3d'), num_dofs=23,
                      ground_force_bodies=list(CONTACT_BODIES),
                      root_history_len=10,
                      trials=[synthetic_trial('t', 60, rng=rng)],
                      skeleton=sk, mass_kg=70.0)
    geom = tmp_path / 'Geometry'
    geom.mkdir()
    (geom / 'pelvis.obj').write_text(OBJ)
    (geom / 'femur.obj').write_text(OBJ)
    ds = WindowDataset(str(d), window_size=20, stride=5)
    session, init = build_live_session(ds, geometry_folder=str(geom))
    w0 = int(np.nonzero(ds.win_subject == 0)[0][0])
    w1 = int(np.nonzero(ds.win_subject == 1)[0][0])
    p0 = session.packet_for_frame(int(np.where(np.arange(len(ds)) == w0)[0][0]))
    p1 = session.packet_for_frame(int(np.where(np.arange(len(ds)) == w1)[0][0]))
    assert 'bodies' in p0 and 'bodies' in p1
    # femur body origin = hip offset, scaled 1.3x for subject 1
    f0 = np.asarray(p0['bodies']['femur_r']['p'])
    f1 = np.asarray(p1['bodies']['femur_r']['p'])
    assert not np.allclose(f0, f1)
    np.testing.assert_allclose(f1, f0 * 1.3, rtol=1e-3)


def test_static_payload_includes_meshes(tmp_path):
    """The static export carries FK-posed meshes per frame when a Geometry
    folder exists (parity with the live viewer's mesh rendering)."""
    from inferbiomechanics_tpu.cli.visualize_file_cmd import build_viz_payload
    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.viz.viewer import export_html

    d = tmp_path / 'data'
    d.mkdir()
    write_synthetic_subject(str(d / 's.b3d'), num_trials=1, trial_length=40,
                            seed=0)
    geom = tmp_path / 'Geometry'
    geom.mkdir()
    (geom / 'pelvis.obj').write_text(OBJ)
    ds = WindowDataset(str(d), window_size=20, stride=5)
    payload = build_viz_payload(ds, 0, 0, geometry_folder=str(geom))
    assert 'meshes' in payload and 'pelvis' in payload['meshes']
    fr = payload['frames'][0]
    assert 'bodies' in fr and 'pelvis' in fr['bodies']
    assert len(fr['bodies']['pelvis']['R']) == 9
    # and the exported HTML splices the camera + mesh renderer
    html_path = export_html(str(tmp_path / 'v.html'), payload, 'm')
    html = open(html_path).read()
    assert 'function P(v)' in html and 'DATA.meshes' in html


def test_session_subject_cycling():
    """'s' jumps to the next subject start (wrapping) — VERDICT r2 #8."""
    s = LiveSession(30, lambda f: {'f': f}, jump_points=[0, 10, 22])
    s.key(' ')                       # pause for deterministic frames
    assert s.frame == 0
    s.key('s'); assert s.frame == 10
    s.key('s'); assert s.frame == 22
    s.key('s'); assert s.frame == 0  # wrap
    s.frame = 15
    s.key('s'); assert s.frame == 22
    # no jump points: 's' is a no-op
    s2 = LiveSession(10, lambda f: {'f': f})
    s2.key(' '); s2.key('s')
    assert s2.frame == 0


def test_live_session_multi_subject_metadata(tmp_path):
    """build_live_session exposes per-frame subject + subject-start jump
    points for a 2-subject dev split; packets carry 'subject'."""
    import numpy as np

    from inferbiomechanics_tpu.data.dataset import WindowDataset
    from inferbiomechanics_tpu.data.synthetic import write_synthetic_subject
    from inferbiomechanics_tpu.viz.live_model import build_live_session
    for i in range(2):
        write_synthetic_subject(str(tmp_path / f's{i}.b3d'), num_trials=1,
                                trial_length=60, seed=i)
    ds = WindowDataset(str(tmp_path), window_size=20, stride=5,
                       skip_loading_skeletons=True)
    session, init = build_live_session(ds, None, None)
    assert session.jump_points and session.jump_points[0] == 0
    assert len(session.jump_points) == 2      # one start per subject
    p0 = session.packet_for_frame(0)
    p1 = session.packet_for_frame(session.jump_points[1])
    assert p0['subject'] == 0 and p1['subject'] == 1


def test_camera_framing_js_present():
    """Both viewer clients ship the mesh-aware frameCamera helper and
    bind the 'f' key."""
    from inferbiomechanics_tpu.viz.live import _PAGE
    from inferbiomechanics_tpu.viz.viewer import CAMERA_JS, _TEMPLATE
    assert 'function frameCamera' in CAMERA_JS
    assert 'frameCamera(framePoints' in _PAGE
    assert "'s'" in _PAGE                       # subject-cycle key forwarded
    assert 'frameCamera(pts)' in _TEMPLATE
