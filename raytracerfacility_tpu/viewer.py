"""Interactive progressive preview — the minimal TPU-native analog of
the reference's live editor viewport.

The reference renders the live editor scene every frame with dirty-state
sync and ImGui camera inspectors (ref RayTracerLayer.cpp:454-712); the
display path is a zero-copy CUDA-GL blit (ref RayTracer.cu:2232-2256).
A TPU behind a tunnel has neither a window system nor display-adjacent
memory, so the equivalent loop is headless: a background render thread
accumulates progressive frames through the SAME public camera/scene API
a script would use, and a tiny in-process HTTP server streams the
result to any browser —

* frames leave the device as uint8 (``utils/display.encode_u8``) —
  the smallest-copy display path;
* the browser long-polls ``/frame.png?after=<seq>``: unchanged frames
  answer 304 with no image bytes, so a converged (fully accumulated)
  view costs no transfer at all;
* dragging orbits the camera around its target, the wheel dollies —
  pose edits go through ``CameraProperties`` setters, whose modification
  tracking resets accumulation exactly like any other camera move
  (ref RayTracer.cu:266-269);
* scene edits through the normal ``RayTracerScene`` upsert API show up
  on the next frame — the render loop calls ``scene.build()`` each
  frame, which is the mark-sweep dirty sync (incremental, cached).

Usage::

    viewer = ProgressiveViewer(scene)                    # or (scene, env, ray)
    port = viewer.start(port=8000)                       # non-blocking
    ...                                                  # edit scene live
    viewer.stop()

No dependencies beyond the standard library and Pillow (already used by
utils/image).
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from raytracerfacility_tpu.models.renderer import (
    EnvironmentProperties,
    RayProperties,
    RayTracerCamera,
)

_PAGE = """<!doctype html>
<html><head><title>raytracerfacility_tpu</title><style>
 body{margin:0;background:#111;color:#ccc;font:13px monospace;
      display:flex;flex-direction:column;align-items:center}
 #v{image-rendering:pixelated;margin-top:12px;cursor:grab}
 #s{margin:8px}
</style></head><body>
<img id="v" draggable="false"><div id="s"></div>
<script>
const v=document.getElementById('v'),s=document.getElementById('s');
let seq=-1,drag=null;
async function poll(){
  try{
    const r=await fetch('/frame.png?after='+seq);
    if(r.status==200){
      seq=+r.headers.get('X-Seq');
      s.textContent='frame '+r.headers.get('X-Frame-Id')+' seq '+seq;
      const b=await r.blob();
      const u=URL.createObjectURL(b);
      v.onload=()=>URL.revokeObjectURL(u);
      v.src=u;
    }
  }catch(e){await new Promise(t=>setTimeout(t,500));}
  setTimeout(poll,30);
}
function send(o){fetch('/camera',{method:'POST',body:JSON.stringify(o)});}
v.onpointerdown=e=>{drag=[e.clientX,e.clientY];v.setPointerCapture(e.pointerId);};
v.onpointerup=e=>{drag=null;};
v.onpointermove=e=>{
  if(!drag)return;
  const dx=e.clientX-drag[0],dy=e.clientY-drag[1];drag=[e.clientX,e.clientY];
  send({orbit:[dx,dy]});
};
v.onwheel=e=>{e.preventDefault();send({dolly:e.deltaY>0?1.1:0.9});};
poll();
</script></body></html>"""


class ProgressiveViewer:
    """Background progressive renderer + HTTP preview for a scene.

    ``max_accum`` bounds the progressive frame count; once reached the
    render thread idles (and the long-poll stops transferring) until a
    camera or scene edit resets accumulation.
    """

    def __init__(self, scene, env: EnvironmentProperties | None = None,
                 ray: RayProperties | None = None,
                 camera: RayTracerCamera | None = None,
                 eye=(0.0, 1.0, 3.0), target=(0.0, 0.5, 0.0),
                 max_accum: int = 256) -> None:
        self.cam = camera or RayTracerCamera(scene)
        self.env = env or EnvironmentProperties()
        self.ray = ray or RayProperties()
        self.max_accum = max_accum
        self._eye = np.asarray(eye, np.float64)
        self._target = np.asarray(target, np.float64)
        self.cam.camera.look_at_target(self._eye, self._target)
        self._lock = threading.Lock()       # camera pose + frame swap
        self._frame_event = threading.Event()  # new frame published
        self._wake = threading.Event()      # camera moved / stop
        self._stop = False
        self._png: bytes = b""
        self._seq = 0
        self._frame_id = 0
        self._threads: list[threading.Thread] = []
        self._server: ThreadingHTTPServer | None = None

    # ---- camera controls (thread-safe) ----------------------------------

    def orbit(self, dx_px: float, dy_px: float) -> None:
        """Rotate the eye around the target (drag analog: ~0.4 deg/px)."""
        with self._lock:
            off = self._eye - self._target
            r = np.linalg.norm(off)
            az = np.arctan2(off[0], off[2]) - dx_px * 0.007
            el = np.arcsin(np.clip(off[1] / max(r, 1e-9), -1, 1))
            el = np.clip(el + dy_px * 0.007, -1.45, 1.45)
            self._eye = self._target + r * np.array(
                [np.cos(el) * np.sin(az), np.sin(el),
                 np.cos(el) * np.cos(az)])
            self.cam.camera.look_at_target(self._eye, self._target)
        self._wake.set()

    def dolly(self, factor: float) -> None:
        with self._lock:
            self._eye = self._target + (self._eye - self._target) * factor
            self.cam.camera.look_at_target(self._eye, self._target)
        self._wake.set()

    def refresh(self) -> None:
        """Wake the render loop (e.g. after an external scene edit)."""
        self._wake.set()

    # ---- render loop -----------------------------------------------------

    def _render_loop(self) -> None:
        from PIL import Image

        while not self._stop:
            with self._lock:
                converged = (self.cam.frame is not None
                             and not self.cam.camera.modified
                             and not self.cam.scene.dirty
                             and self._frame_id >= self.max_accum)
            if converged:
                self._wake.wait(timeout=0.25)
                self._wake.clear()
                continue
            with self._lock:
                img = self.cam.render_u8(self.env, self.ray)
                fid = int(self.cam.frame.frame_id)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            with self._lock:
                self._png = buf.getvalue()
                self._seq += 1
                self._frame_id = fid
            self._frame_event.set()

    # ---- HTTP ------------------------------------------------------------

    def _handler(viewer):  # noqa: N805 — bound-class factory
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                url = urlparse(self.path)
                if url.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if url.path == "/frame.png":
                    after = int(parse_qs(url.query).get(
                        "after", ["-1"])[0])
                    deadline = time.time() + 10.0
                    while (viewer._seq <= after
                           and time.time() < deadline
                           and not viewer._stop):
                        viewer._frame_event.wait(timeout=0.2)
                        viewer._frame_event.clear()
                    with viewer._lock:
                        png, seq, fid = (viewer._png, viewer._seq,
                                         viewer._frame_id)
                    if seq <= after or not png:
                        self.send_response(304)
                        self.send_header("X-Seq", str(seq))
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(png)))
                    self.send_header("X-Seq", str(seq))
                    self.send_header("X-Frame-Id", str(fid))
                    self.end_headers()
                    self.wfile.write(png)
                    return
                if url.path == "/state":
                    with viewer._lock:
                        body = json.dumps({
                            "seq": viewer._seq,
                            "frame_id": viewer._frame_id,
                            "size": list(viewer.cam.camera.size),
                            "eye": list(map(float, viewer._eye)),
                            "target": list(map(float, viewer._target)),
                        }).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                self.send_response(404)
                self.end_headers()

            def do_POST(self):
                if urlparse(self.path).path != "/camera":
                    self.send_response(404)
                    self.end_headers()
                    return
                n = int(self.headers.get("Content-Length", "0"))
                try:
                    msg = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    self.send_response(400)
                    self.end_headers()
                    return
                if "orbit" in msg:
                    dx, dy = msg["orbit"]
                    viewer.orbit(float(dx), float(dy))
                if "dolly" in msg:
                    viewer.dolly(float(msg["dolly"]))
                self.send_response(204)
                self.end_headers()

        return Handler

    # ---- lifecycle ---------------------------------------------------------

    def start(self, port: int = 0, host: str = "127.0.0.1") -> int:
        """Start the render thread + HTTP server; returns the bound port."""
        self._server = ThreadingHTTPServer((host, port), self._handler())
        self._server.daemon_threads = True
        t1 = threading.Thread(target=self._render_loop, daemon=True)
        t2 = threading.Thread(target=self._server.serve_forever,
                              daemon=True)
        t1.start()
        t2.start()
        self._threads = [t1, t2]
        return self._server.server_address[1]

    def stop(self) -> None:
        self._stop = True
        self._wake.set()
        self._frame_event.set()
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
        for t in self._threads:
            t.join(timeout=10.0)
