"""Interactive browser viewer served from the TPU host.

The reference IS a browser app (canvas + WASD/pointer controls,
src/main.ts); here the render loop runs on the TPU and a minimal zero-
dependency HTTP server streams JPEG frames to a canvas page with the same
controls (WASD/Space/Ctrl move, Q/E roll, drag to look, wheel to dolly —
handled by render/camera_control.py with the reference's constants).

    python -m webdgs_tpu serve scene.ply --port 8000
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

PAGE = """<!doctype html>
<html><head><title>webdgs_tpu viewer</title><style>
body { margin:0; background:#111; color:#ccc; font-family:monospace; }
#hud { position:fixed; top:8px; left:8px; }
canvas { display:block; margin:0 auto; }
</style></head><body>
<div id="hud">webdgs_tpu &mdash; WASD/Space/Ctrl move &middot; drag look
&middot; Q/E roll &middot; wheel dolly &middot; P point mode
<span id="stats"></span></div>
<canvas id="c"></canvas>
<script>
const c = document.getElementById('c'), ctx = c.getContext('2d');
let keys = {}, drag = null, wheel = 0;
onkeydown = e => { keys[e.code] = true; if(e.code=='KeyP') post({toggle_mode:1}); };
onkeyup = e => keys[e.code] = false;
c.onpointerdown = e => { drag = [e.pageX, e.pageY]; c.setPointerCapture(e.pointerId); };
c.onpointerup = () => drag = null;
c.onpointermove = e => {
  if (drag) { post({drag:[e.pageX-drag[0], e.pageY-drag[1]]}); drag=[e.pageX,e.pageY]; }
};
c.onwheel = e => { e.preventDefault(); post({wheel: e.deltaY}); };
function post(o) { fetch('/control', {method:'POST', body:JSON.stringify(o)}); }
setInterval(() => {
  const m = {move:[!!keys.KeyW,!!keys.KeyS,!!keys.KeyA,!!keys.KeyD,
                   !!keys.Space,!!keys.ControlLeft||!!keys.ControlRight],
             roll:[!!keys.KeyQ,!!keys.KeyE], dt:0.05};
  if (m.move.some(x=>x) || m.roll.some(x=>x)) post(m);
}, 50);
async function loop() {
  while (true) {
    const r = await fetch('/frame.jpg?' + Date.now());
    const b = await r.blob();
    const img = await createImageBitmap(b);
    c.width = img.width; c.height = img.height;
    ctx.drawImage(img, 0, 0);
  }
}
loop();
setInterval(async () => {
  const s = await (await fetch('/stats')).json();
  document.getElementById('stats').textContent =
    ` | ${s.points} pts | ${s.fps.toFixed(1)} fps | ${s.render_mode}`;
}, 1000);
</script></body></html>
"""


class ViewerServer:
    def __init__(self, viewer, quality: int = 85):
        self.viewer = viewer
        self.quality = quality
        self.lock = threading.Lock()
        self.fps = 0.0  # EMA like the reference HUD (main.ts:550-561)

    def handle_control(self, msg: dict) -> None:
        ctl = self.viewer.control
        with self.lock:
            if "move" in msg:
                f, b, l, r, u, d = msg["move"]
                ctl.move(msg.get("dt", 0.05), forward=f, backward=b,
                         left=l, right=r, up=u, down=d)
            if "roll" in msg:
                ql, qe = msg["roll"]
                ctl.roll(msg.get("dt", 0.05), left=ql, right=qe)
            if "drag" in msg:
                dx, dy = msg["drag"]
                ctl.drag(dx, dy)
            if "wheel" in msg:
                ctl.wheel(float(msg["wheel"]))
            if "toggle_mode" in msg:
                self.viewer.set_render_mode(
                    "pointcloud" if self.viewer.render_mode == "gaussian"
                    else "gaussian")

    def stats(self) -> dict:
        """HUD stats, the analogue of the reference's live widget
        (main.ts:130-167): fps, point count, render mode."""
        return {
            "fps": self.fps,
            "points": int(self.viewer.scene.num_alive()),
            "render_mode": self.viewer.render_mode,
            "width": self.viewer.width,
            "height": self.viewer.height,
        }

    def frame_jpeg(self) -> bytes:
        from PIL import Image
        t0 = time.perf_counter()
        with self.lock:
            img = self.viewer.render()
        dt = time.perf_counter() - t0
        inst = 1.0 / dt if dt > 0 else 0.0
        self.fps = inst if self.fps == 0 else 0.9 * self.fps + 0.1 * inst
        arr = (np.clip(img, 0, 1) * 255.0 + 0.5).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=self.quality)
        return buf.getvalue()

    def serve(self, port: int = 8000, host: str = "127.0.0.1") -> None:
        server = make_http_server(self, host, port)
        print(f"viewer at http://{host}:{port}/")
        server.serve_forever()


def make_http_server(vs: ViewerServer, host: str, port: int):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/frame.jpg"):
                self._send(200, vs.frame_jpeg(), "image/jpeg")
            elif self.path.startswith("/stats"):
                self._send(200, json.dumps(vs.stats()).encode(),
                           "application/json")
            elif self.path == "/" or self.path.startswith("/index"):
                self._send(200, PAGE.encode(), "text/html")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path == "/control":
                length = int(self.headers.get("Content-Length", 0))
                msg = json.loads(self.rfile.read(length) or b"{}")
                vs.handle_control(msg)
                self._send(200, b"{}", "application/json")
            else:
                self._send(404, b"not found", "text/plain")

    return ThreadingHTTPServer((host, port), Handler)
