"""Live progressive viewer: browser-based, zero dependencies.

The reference's viewer is a desktop GLFW/ImGui app whose load-bearing
behavior is: render progressive passes continuously, show the refining
image, restart accumulation on any scene/camera/param edit
(AppViewer.cxx:979-984), accept commands in a console, orbit the camera
with the mouse (OrbitControls.cxx:70-158), select objects by click to
edit their material (AppGui.cxx onSelectionEvent), and pause/resume the
progressive loop (AppViewer.cxx:916-920). The ~25 kLoC vendored ImGui
layer is explicitly not worth rebuilding (SURVEY.md §7.1 step 9); this
page covers its function.

    python -m cadrays_tpu.cli.viewer scene.crt [--port 8790] [--res 512]

Serves:
  GET  /           viewer page (live image + console + mouse controls)
  GET  /frame.png  current tone-mapped accumulation
  GET  /status     JSON {spp, width, height, mode, paused}
  POST /exec       body = command line; executes on the session (edits
                   invalidate the accumulator via the state fingerprint)
  POST /orbit      JSON {op: rotate|pan|zoom, dx, dy} — mutates the
                   camera via cli/controls.OrbitControls; accumulation
                   restarts automatically (camera is in the fingerprint)
  POST /pick       JSON {x, y} in image pixels — returns the vpick line
                   (hit node name + position) for the selection flow
  POST /pause      toggles the progressive loop; returns "paused"/"running"
  GET  /scripts    JSON list of *.crt/*.tcl script names in the session
                   script dir (ScriptEditor.cxx:48-64)
  GET  /script?name=N  script source
  POST /script     JSON {name, text[, run]} — save (and optionally run)
                   the script (ScriptEditor.cxx:134-263)
  POST /script_delete  JSON {name}

Mouse on the image: drag = orbit, shift-drag = pan, wheel = zoom,
click = pick (fills the command box with `vbsdf <name> ` ready to edit).

The render loop runs in the main thread; HTTP handling in a daemon
thread. This is deliberately simple — the command surface does the rest.
"""
from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = """<!doctype html>
<html><head><title>cadrays_tpu viewer</title><style>
body { background:#222; color:#ddd; font-family:monospace; margin:16px }
img { image-rendering:pixelated; border:1px solid #555; max-width:90vw;
      cursor:crosshair; user-select:none; -webkit-user-drag:none }
input { width:60%; background:#333; color:#eee; border:1px solid #555;
        padding:4px }
button { background:#333; color:#eee; border:1px solid #555; padding:4px }
#log { white-space:pre-wrap; color:#9c9 } .err { color:#c99 }
</style></head><body>
<h3>cadrays_tpu <span id="st"></span>
    <button id="pause" onclick="pause()">pause</button>
    <select id="mode">
      <option value="orbit">orbit</option>
      <option value="fly">fly (WASDQE + drag look)</option>
      <option value="move">move object</option>
      <option value="rotate">rotate object</option>
      <option value="scale">scale object</option>
    </select>
    <span id="sel"></span></h3>
<img id="view" src="/frame.png" draggable="false"/>
<p><input id="cmd" placeholder="command (e.g. vbsdf s -kd 1 0 0)"
   onkeydown="if(event.key=='Enter')run()"/></p>
<details><summary>script editor</summary>
<p><select id="scripts" onchange="loadScript()"></select>
   <input id="sname" style="width:20%" placeholder="name.crt"/>
   <button onclick="saveScript(false)">save</button>
   <button onclick="saveScript(true)">save+run</button>
   <button onclick="delScript()">delete</button></p>
<textarea id="stext" rows="14" style="width:90vw;background:#2a2a2a;
  color:#dfd;border:1px solid #555;font-family:monospace"></textarea>
</details>
<div id="log"></div>
<script>
async function refreshScripts(){
  const names = await (await fetch('/scripts')).json();
  const sel = document.getElementById('scripts');
  sel.innerHTML = '<option value="">-- scripts --</option>' +
    names.map(n => `<option>${n}</option>`).join('');
}
refreshScripts();
async function loadScript(){
  const n = document.getElementById('scripts').value;
  if (!n) return;
  document.getElementById('sname').value = n;
  document.getElementById('stext').value =
    await (await fetch('/script?name=' + encodeURIComponent(n))).text();
}
async function saveScript(run){
  const name = document.getElementById('sname').value;
  if (!name) return;
  const r = await fetch('/script', {method:'POST', body: JSON.stringify(
    {name: name, text: document.getElementById('stext').value, run: run})});
  logLine((run ? 'run ' : 'save ') + name, await r.text());
  refreshScripts();
}
async function delScript(){
  const name = document.getElementById('sname').value;
  if (!name) return;
  const r = await fetch('/script_delete', {method:'POST',
    body: JSON.stringify({name: name})});
  logLine('delete ' + name, await r.text());
  refreshScripts();
}
const img = document.getElementById('view');
let drag = null, moved = false, selected = null;
const keys = new Set();
function mode(){ return document.getElementById('mode').value; }
function imgXY(e){
  const r = img.getBoundingClientRect();
  return [ (e.clientX - r.left) * img.naturalWidth / r.width,
           (e.clientY - r.top) * img.naturalHeight / r.height ];
}
img.addEventListener('mousedown', e => {
  drag = {x: e.clientX, y: e.clientY, pan: e.shiftKey || e.button === 1};
  moved = false; e.preventDefault();
});
window.addEventListener('mousemove', e => {
  if (!drag) return;
  const dx = e.clientX - drag.x, dy = e.clientY - drag.y;
  if (Math.abs(dx) + Math.abs(dy) < 2) return;
  moved = true;
  const m = mode();
  if (m === 'fly') {
    fetch('/fly', {method:'POST', body: JSON.stringify({dx: dx, dy: dy})});
  } else if (m !== 'orbit' && selected) {
    const op = m === 'move' ? 'translate' : m;
    fetch('/manip', {method:'POST', body: JSON.stringify(
      {name: selected, op: op, dx: dx, dy: dy})});
  } else {
    fetch('/orbit', {method:'POST', body: JSON.stringify(
      {op: drag.pan ? 'pan' : 'rotate', dx: dx, dy: dy})});
  }
  drag.x = e.clientX; drag.y = e.clientY;
});
window.addEventListener('mouseup', async e => {
  if (!drag) return;
  const wasDrag = moved; drag = null;
  if (wasDrag) return;
  const [x, y] = imgXY(e);
  const r = await fetch('/pick', {method:'POST',
                                  body: JSON.stringify({x: x, y: y})});
  const t = await r.text();
  logLine('pick ' + Math.round(x) + ' ' + Math.round(y), t);
  const m = t.match(/^hit (\\S+)/);
  if (m) {
    selected = m[1];
    document.getElementById('sel').textContent = '[' + selected + ']';
    const box = document.getElementById('cmd');
    box.value = 'vbsdf ' + m[1] + ' ';
    box.focus();
  } else {
    selected = null;
    document.getElementById('sel').textContent = '';
  }
});
window.addEventListener('keydown', e => {
  if (e.target.tagName === 'INPUT' || e.target.tagName === 'TEXTAREA')
    return;
  keys.add(e.key.toLowerCase());
});
window.addEventListener('keyup', e => keys.delete(e.key.toLowerCase()));
setInterval(() => {
  if (mode() !== 'fly' || keys.size === 0) return;
  fetch('/fly', {method:'POST', body: JSON.stringify(
    {keys: [...keys], dt: 0.1})});
}, 100);
img.addEventListener('wheel', e => {
  e.preventDefault();
  fetch('/orbit', {method:'POST', body: JSON.stringify(
    {op: 'zoom', dx: 0, dy: e.deltaY > 0 ? -1 : 1})});
}, {passive: false});
async function pause(){
  const r = await fetch('/pause', {method:'POST'});
  document.getElementById('pause').textContent =
      (await r.text()) === 'paused' ? 'resume' : 'pause';
}
function logLine(cmd, out){
  const log = document.getElementById('log');
  log.textContent = '> ' + cmd + '\\n' + out + '\\n' + log.textContent;
}
async function tick(){
  const s = await (await fetch('/status')).json();
  document.getElementById('st').textContent =
      ` ${s.width}x${s.height} spp=${s.spp}` + (s.paused ? ' [paused]' : '');
  img.src = '/frame.png?' + Date.now();
}
setInterval(tick, 1000);
async function run(){
  const box = document.getElementById('cmd');
  const r = await fetch('/exec', {method:'POST', body: box.value});
  logLine(box.value, await r.text());
  box.value='';
}
</script></body></html>"""


class ViewerState:
    def __init__(self, session):
        self.session = session
        self.lock = threading.Lock()
        self.png_bytes = b""
        self.spp = 0
        self.running = True
        self.paused = False


def _make_handler(state: ViewerState, console):
    import os
    import urllib.parse

    import numpy as np

    from cadrays_tpu.cli.controls import FlightControls, OrbitControls

    orbit = OrbitControls()
    flight = FlightControls(move_speed=2.0)

    def _manipulate(req):
        """Drag-manipulate a picked node: screen-space translate, view-
        axis rotate, or uniform scale about its bbox center — the
        ImGuizmo/TransformWidget contract (ImRaytraceControls.cxx:32-91,
        TransformWidget.cxx:112-246). Mutating the transform bumps the
        scene version, so accumulation restarts."""
        s = state.session
        node = s.scene.model.get(req["name"])
        if node is None:
            raise ValueError(f"no node '{req['name']}'")
        cam = s.camera
        right, up, fwd = cam.basis_np()
        dx = float(req.get("dx", 0.0))
        dy = float(req.get("dy", 0.0))
        op = req.get("op", "translate")
        if op == "translate":
            dist = float(np.linalg.norm(np.asarray(cam.at)
                                        - np.asarray(cam.eye)))
            fov = np.deg2rad(float(cam.fovy_deg))
            wpp = 2.0 * dist * np.tan(fov / 2) / max(s.height, 1)
            delta = (dx * right - dy * up) * wpp
            m = np.eye(4, dtype=np.float32)
            m[:3, 3] = delta
            node.transform = (m @ node.transform).astype(np.float32)
        else:
            # rotate/scale about the subtree bbox center
            los, his = [], []
            for n in node.traverse():
                if n.mesh is not None:
                    mm = n.mesh.transformed(n.world_transform())
                    lo, hi = mm.bounds()
                    los.append(lo)
                    his.append(hi)
            c = ((np.min(los, axis=0) + np.max(his, axis=0)) / 2
                 if los else np.zeros(3))
            t0 = np.eye(4, dtype=np.float32)
            t0[:3, 3] = -c
            t1 = np.eye(4, dtype=np.float32)
            t1[:3, 3] = c
            if op == "rotate":
                ang = dx * 0.01
                ca, sa = np.cos(ang), np.sin(ang)
                a = np.asarray(fwd, np.float64)
                x, y, z = a
                r = np.eye(4, dtype=np.float32)
                r[:3, :3] = np.array([
                    [ca + x * x * (1 - ca), x * y * (1 - ca) - z * sa,
                     x * z * (1 - ca) + y * sa],
                    [y * x * (1 - ca) + z * sa, ca + y * y * (1 - ca),
                     y * z * (1 - ca) - x * sa],
                    [z * x * (1 - ca) - y * sa, z * y * (1 - ca) + x * sa,
                     ca + z * z * (1 - ca)]], np.float32)
            elif op == "scale":
                sf = float(np.exp(-dy * 0.005))
                r = np.diag([sf, sf, sf, 1.0]).astype(np.float32)
            else:
                raise ValueError(f"unknown manip op {op!r}")
            node.transform = (t1 @ r @ t0 @ node.transform).astype(
                np.float32)
        s.scene.touch()

    def script_dir():
        d = os.path.join(state.session.cwd or ".", "scripts")
        os.makedirs(d, exist_ok=True)
        return d

    def script_path(name):
        # keep names inside the script dir (no path traversal)
        base = os.path.basename(name)
        if not base or os.path.splitext(base)[1] not in (".crt", ".tcl"):
            raise ValueError(f"script name must end in .crt/.tcl: {name!r}")
        return os.path.join(script_dir(), base)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/frame.png"):
                with state.lock:
                    body = state.png_bytes
                self._send(200, "image/png", body or b"")
            elif self.path.startswith("/status"):
                s = state.session
                body = json.dumps({
                    "spp": state.spp, "width": s.width, "height": s.height,
                    "mode": s.params.mode, "paused": state.paused,
                }).encode()
                self._send(200, "application/json", body)
            elif self.path.startswith("/scripts"):
                names = sorted(f for f in os.listdir(script_dir())
                               if f.endswith((".crt", ".tcl")))
                self._send(200, "application/json",
                           json.dumps(names).encode())
            elif self.path.startswith("/script?"):
                q = urllib.parse.parse_qs(
                    urllib.parse.urlparse(self.path).query)
                try:
                    with open(script_path(q["name"][0])) as f:
                        self._send(200, "text/plain", f.read().encode())
                except Exception as e:
                    self._send(404, "text/plain", f"[error] {e}".encode())
            else:
                self._send(200, "text/html", _PAGE.encode())

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n).decode()

        def do_POST(self):
            s = state.session
            if self.path.startswith("/exec"):
                cmd = self._body()
                try:
                    with state.lock:
                        out = console.exec(cmd)
                    self._send(200, "text/plain", (out or "ok").encode())
                except Exception as e:
                    self._send(200, "text/plain",
                               f"[error] {e}".encode())
            elif self.path.startswith("/orbit"):
                # camera edit -> fingerprint change -> accumulation
                # restart in the render loop (AppViewer.cxx:979-984)
                try:
                    req = json.loads(self._body())
                    with state.lock:
                        cam = s.camera
                        if req["op"] == "rotate":
                            cam = orbit.rotate(cam, req["dx"], req["dy"])
                        elif req["op"] == "pan":
                            cam = orbit.pan(cam, req["dx"], req["dy"],
                                            s.height)
                        elif req["op"] == "zoom":
                            cam = orbit.zoom(cam, req["dy"])
                        s.camera = cam
                    self._send(200, "text/plain", b"ok")
                except Exception as e:
                    self._send(200, "text/plain", f"[error] {e}".encode())
            elif self.path.startswith("/manip"):
                # drag-gizmo: translate/rotate/scale the picked node
                try:
                    req = json.loads(self._body())
                    with state.lock:
                        _manipulate(req)
                    self._send(200, "text/plain", b"ok")
                except Exception as e:
                    self._send(200, "text/plain", f"[error] {e}".encode())
            elif self.path.startswith("/fly"):
                # WASD flight + mouse look (FlightControls.cxx:223-263)
                try:
                    req = json.loads(self._body())
                    with state.lock:
                        cam = s.camera
                        if req.get("dx") or req.get("dy"):
                            cam = flight.look(cam, req.get("dx", 0.0),
                                              req.get("dy", 0.0))
                        keys = set(req.get("keys", []))
                        dt = float(req.get("dt", 1 / 30))
                        fwd = (("w" in keys) - ("s" in keys))
                        strafe = (("d" in keys) - ("a" in keys))
                        lift = (("e" in keys) - ("q" in keys))
                        if fwd or strafe or lift:
                            cam = flight.move(cam, fwd, strafe, lift, dt)
                        s.camera = cam
                        s.scene.camera = cam
                    self._send(200, "text/plain", b"ok")
                except Exception as e:
                    self._send(200, "text/plain", f"[error] {e}".encode())
            elif self.path.startswith("/pick"):
                try:
                    req = json.loads(self._body())
                    with state.lock:
                        out = console.exec(
                            f"vpick {float(req['x'])} {float(req['y'])}")
                    self._send(200, "text/plain", out.encode())
                except Exception as e:
                    self._send(200, "text/plain", f"[error] {e}".encode())
            elif self.path.startswith("/pause"):
                state.paused = not state.paused
                self._send(200, "text/plain",
                           b"paused" if state.paused else b"running")
            elif self.path.startswith("/script_delete"):
                try:
                    req = json.loads(self._body())
                    os.remove(script_path(req["name"]))
                    self._send(200, "text/plain", b"deleted")
                except Exception as e:
                    self._send(200, "text/plain", f"[error] {e}".encode())
            elif self.path.startswith("/script"):
                # save (+ optionally run) — ScriptEditor.cxx:134-263
                try:
                    req = json.loads(self._body())
                    path = script_path(req["name"])
                    with open(path, "w") as f:
                        f.write(req.get("text", ""))
                    out = "saved"
                    if req.get("run"):
                        with state.lock:
                            res = console.source(path)
                        out = f"saved + run\n{res or ''}".rstrip()
                    self._send(200, "text/plain", out.encode())
                except Exception as e:
                    self._send(200, "text/plain", f"[error] {e}".encode())
            else:
                self._send(404, "text/plain", b"")

    return Handler


def _encode_png(session) -> bytes:
    import numpy as np

    from cadrays_tpu.core.tonemap import apply_tonemap, linear_to_srgb
    from cadrays_tpu.utils.image import write_png

    hdr = np.asarray(session.progressive.image)
    ldr = np.asarray(linear_to_srgb(apply_tonemap(hdr,
                                                  session.params.tonemap)))
    buf = io.BytesIO()
    write_png(buf, ldr)
    return buf.getvalue()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("script", nargs="?", default=None)
    ap.add_argument("--port", type=int, default=8790)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--spp-per-pass", type=int, default=1)
    args = ap.parse_args(argv)

    from cadrays_tpu.cli.commands import Session, make_console
    from cadrays_tpu.integrator.progressive import progressive_step

    session = Session()
    console = make_console(session)
    if args.script:
        import os

        session.cwd = os.path.dirname(os.path.abspath(args.script)) or "."
        console.source(args.script)
    session.width = session.height = args.res

    state = ViewerState(session)
    server = ThreadingHTTPServer(("127.0.0.1", args.port),
                                 _make_handler(state, console))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    print(f"viewer at http://127.0.0.1:{args.port}  (ctrl-C stops)")

    try:
        while True:
            if state.paused:
                time.sleep(0.1)
                continue
            with state.lock:
                data = session.scene.flatten(session.camera)
                cam, params = session.camera, session.params
                w, h, prog = session.width, session.height, session.progressive
            st = progressive_step(data, cam, params, w, h, prog,
                                  samples_per_step=args.spp_per_pass)
            with state.lock:
                session.progressive = st
                state.spp = int(st.spp)
                state.png_bytes = _encode_png(session)
    except KeyboardInterrupt:
        print("bye")
        return 0


if __name__ == "__main__":
    raise SystemExit(main())
