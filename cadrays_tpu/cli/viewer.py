"""Live progressive viewer: browser-based, zero dependencies.

The reference's viewer is a desktop GLFW/ImGui app whose load-bearing
behavior is: render progressive passes continuously, show the refining
image, restart accumulation on any scene/camera/param edit, accept
commands in a console (SURVEY.md §7.1 step 9 — the ~25 kLoC vendored UI
layer is explicitly not worth rebuilding; this covers its function).

    python -m cadrays_tpu.cli.viewer scene.crt [--port 8790] [--res 512]

Serves:
  GET  /           viewer page (auto-refreshing image + console box)
  GET  /frame.png  current tone-mapped accumulation
  GET  /status     JSON {spp, width, height, mode}
  POST /exec       body = command line; executes on the session (edits
                   invalidate the accumulator via the state fingerprint)

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
img { image-rendering:pixelated; border:1px solid #555; max-width:90vw }
input { width:60%%; background:#333; color:#eee; border:1px solid #555;
        padding:4px }
#log { white-space:pre-wrap; color:#9c9 } .err { color:#c99 }
</style></head><body>
<h3>cadrays_tpu <span id="st"></span></h3>
<img id="view" src="/frame.png"/>
<p><input id="cmd" placeholder="command (e.g. vbsdf s -kd 1 0 0)"
   onkeydown="if(event.key=='Enter')run()"/></p>
<div id="log"></div>
<script>
async function tick(){
  const s = await (await fetch('/status')).json();
  document.getElementById('st').textContent =
      ` ${s.width}x${s.height} spp=${s.spp}`;
  const img = document.getElementById('view');
  img.src = '/frame.png?' + Date.now();
}
setInterval(tick, 1000);
async function run(){
  const box = document.getElementById('cmd');
  const r = await fetch('/exec', {method:'POST', body: box.value});
  const t = await r.text();
  const log = document.getElementById('log');
  log.textContent = '> ' + box.value + '\\n' + t + '\\n' + log.textContent;
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


def _make_handler(state: ViewerState, console):
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
                    "mode": s.params.mode,
                }).encode()
                self._send(200, "application/json", body)
            else:
                self._send(200, "text/html", _PAGE.encode())

        def do_POST(self):
            if self.path.startswith("/exec"):
                n = int(self.headers.get("Content-Length", 0))
                cmd = self.rfile.read(n).decode()
                try:
                    with state.lock:
                        out = console.exec(cmd)
                    self._send(200, "text/plain", (out or "ok").encode())
                except Exception as e:
                    self._send(200, "text/plain",
                               f"[error] {e}".encode())
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
