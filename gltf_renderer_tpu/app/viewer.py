"""Interactive live viewer — the app-shell analogue of the reference's SDL3 +
ImGui window (Main.cpp:159-406) for display-less TPU hosts: the browser is
the window.

  python -m gltf_renderer_tpu.app.viewer scene.glb [--port 8008] [...]

A render thread runs the same Renderer event loop the reference drives per
frame (camera input -> reset accumulation -> progressive PT / raster draw),
and a stdlib HTTP server blits frames and feeds input back:

  GET  /            small HTML page (canvas + drag/wheel handlers)
  GET  /frame.png   latest rendered frame (+ X-Frame-Seq header)
  GET  /state       JSON {frame, spp, backend, scene}
  POST /input       JSON {type: "orbit"|"dolly"|"pan"|"key"|"backend"|
                          "load", ...} — mouse orbit/dolly (the reference's
                          CameraController), backend toggle (its Graphics
                          tab), load-by-path (its drag-drop).

Parity map: window/event loop = Main.cpp:159-226; orbit/dolly input =
CameraController.h:9-243; backend + settings toggles = the ImGui Graphics
tab; drag-drop load = Main.cpp:238-254.
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>gltf-renderer-tpu</title><style>
 body { margin:0; background:#111; color:#ccc; font:13px monospace; }
 #hud { position:fixed; top:8px; left:8px; background:#0008; padding:6px; }
 img { display:block; margin:auto; image-rendering:pixelated; }
</style></head><body>
<div id="hud">drag: orbit &middot; wheel: dolly &middot; shift-drag: pan
 &middot; <span id="stat"></span></div>
<img id="v" draggable="false">
<script>
const img = document.getElementById('v');
const stat = document.getElementById('stat');
let seq = 0, busy = false;
async function tick() {
  if (!busy) {
    busy = true;
    try {
      const r = await fetch('/frame.png?seq=' + seq);
      seq = r.headers.get('X-Frame-Seq') || seq;
      const b = await r.blob();
      img.src = URL.createObjectURL(b);
      const s = await (await fetch('/state')).json();
      stat.textContent = s.backend + ' spp=' + s.spp;
    } catch (e) {}
    busy = false;
  }
  setTimeout(tick, 60);
}
tick();
let drag = null;
img.addEventListener('pointerdown', e => { drag = [e.clientX, e.clientY, e.shiftKey]; });
window.addEventListener('pointerup', () => { drag = null; });
window.addEventListener('pointermove', e => {
  if (!drag) return;
  const [x0, y0, pan] = drag;
  drag = [e.clientX, e.clientY, pan];
  fetch('/input', {method:'POST', body: JSON.stringify(
    {type: pan ? 'pan' : 'orbit', dx: e.clientX - x0, dy: e.clientY - y0})});
});
img.addEventListener('wheel', e => {
  e.preventDefault();
  fetch('/input', {method:'POST', body: JSON.stringify(
    {type:'dolly', amount: e.deltaY})});
}, {passive: false});
</script></body></html>"""


class ViewerState:
    """Shared state between the HTTP threads and the render thread."""

    def __init__(self, renderer, orbit, width, height):
        self.renderer = renderer
        self.orbit = orbit
        self.width = width
        self.height = height
        self.lock = threading.Lock()
        self.pending = []          # input events (applied on the render thread)
        self.frame_png = b""
        self.frame_seq = 0
        self.spp = 0
        self.running = True
        self.scene_path = ""

    def post_input(self, ev):
        with self.lock:
            self.pending.append(ev)

    def take_inputs(self):
        with self.lock:
            evs, self.pending = self.pending, []
        return evs

    def publish(self, png, spp):
        with self.lock:
            self.frame_png = png
            self.frame_seq += 1
            self.spp = spp


def _apply_inputs(state: ViewerState, evs) -> bool:
    """Reference CameraController semantics: yaw/pitch per pixel dragged,
    exponential dolly, pan in view plane. Returns True if the camera moved."""
    moved = False
    orbit = state.orbit
    for ev in evs:
        t = ev.get("type")
        if t == "orbit":
            orbit.rotate(float(ev.get("dx", 0)) * 0.005,
                         float(ev.get("dy", 0)) * 0.005)
            moved = True
        elif t == "dolly":
            orbit.zoom(0.001 * float(ev.get("amount", 0)) * max(orbit.radius, 1e-3))
            moved = True
        elif t == "pan":
            orbit.pan(float(ev.get("dx", 0)) * 0.002,
                      float(ev.get("dy", 0)) * 0.002)
            moved = True
        elif t == "backend":
            import dataclasses
            st = state.renderer.settings
            state.renderer.settings = dataclasses.replace(
                st, backend=("rasterizer" if st.backend == "pathtracer"
                             else "pathtracer"))
            moved = True
        elif t == "load":
            try:
                state.renderer.load_scene(str(ev.get("path", "")))
                state.scene_path = str(ev.get("path", ""))
                moved = True
            except Exception as e:  # drag-drop of a bad file must not kill the loop
                logging.error("load failed: %s", e)
    if moved:
        state.renderer.camera.world_to_view = orbit.world_to_view()
    return moved


def render_loop(state: ViewerState, max_spp: int = 512):
    """The Main.cpp frame loop: poll input -> update camera -> draw -> blit.
    Progressive accumulation continues while the camera is still; input
    resets it (the Renderer's reset-on-change key does this automatically)."""
    from PIL import Image

    while state.running:
        evs = state.take_inputs()
        _apply_inputs(state, evs)
        if state.renderer.accumulated_frames >= max_spp and not evs:
            time.sleep(0.05)
            continue
        img = state.renderer.draw_frame(delta=0.0)
        buf = io.BytesIO()
        Image.fromarray(np.asarray(img)).save(buf, format="PNG")
        state.publish(buf.getvalue(), state.renderer.accumulated_frames)


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype, headers=()):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in headers:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/":
                self._send(200, _PAGE.encode(), "text/html")
            elif path == "/frame.png":
                with state.lock:
                    png, seq = state.frame_png, state.frame_seq
                if not png:
                    self._send(503, b"no frame yet", "text/plain")
                else:
                    self._send(200, png, "image/png",
                               [("X-Frame-Seq", str(seq))])
            elif path == "/state":
                body = json.dumps({
                    "frame": state.frame_seq,
                    "spp": int(state.spp),
                    "backend": state.renderer.settings.backend,
                    "scene": state.scene_path,
                }).encode()
                self._send(200, body, "application/json")
            else:
                self._send(404, b"", "text/plain")

        def do_POST(self):
            if self.path.split("?")[0] != "/input":
                self._send(404, b"", "text/plain")
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                ev = json.loads(self.rfile.read(n) or b"{}")
            except ValueError:
                ev = {}
            state.post_input(ev)
            self._send(200, b"ok", "text/plain")

    return Handler


def serve(gltf_path, width=960, height=540, port=8008, backend="pathtracer",
          env_path=None, block=True):
    """Build the renderer, start the render thread + HTTP server.

    Returns (server, state, thread) when block=False (tests drive it)."""
    import jax
    import jax.numpy as jnp

    from gltf_renderer_tpu.camera import OrbitController
    from gltf_renderer_tpu.render import settings as S
    from gltf_renderer_tpu.render.renderer import Renderer
    from gltf_renderer_tpu.scene import flatten
    from gltf_renderer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    settings = S.RenderSettings(backend=backend, width=width, height=height)
    renderer = Renderer(settings)
    scene = renderer.load_scene(gltf_path)
    if env_path:
        renderer.load_environment(env_path)

    # Frame the scene like the CLI does (bounds of the flattened world).
    tf = flatten.compute_global_transforms(scene)
    plan = flatten.build_instance_plan(scene)
    if len(plan.vertex_map):
        pools = jax.tree.map(jnp.asarray, scene.pools)
        world = flatten.build_world_geometry(
            pools, plan, jnp.asarray(tf),
            jnp.asarray(flatten.normal_transforms(tf)),
            flatten.plan_tri_flags(plan, scene.primitives),
        )
        wp = np.asarray(world.position)
        center = 0.5 * (wp.min(0) + wp.max(0))
        radius = float(np.linalg.norm(wp - center, axis=-1).max())
    else:
        center, radius = np.zeros(3), 1.0
    orbit = OrbitController(centre=center, radius=2.5 * radius)
    renderer.camera.aspect_ratio = width / height
    renderer.camera.z_near = max(1e-3, 0.01 * radius)
    renderer.camera.world_to_view = orbit.world_to_view()

    state = ViewerState(renderer, orbit, width, height)
    state.scene_path = str(gltf_path)
    thread = threading.Thread(target=render_loop, args=(state,), daemon=True)
    thread.start()
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(state))
    logging.info("viewer on http://localhost:%d (scene: %s)", port, gltf_path)
    if not block:
        srv_thread = threading.Thread(target=server.serve_forever, daemon=True)
        srv_thread.start()
        return server, state, thread
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        state.running = False
    return None


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("gltf")
    parser.add_argument("--port", type=int, default=8008)
    parser.add_argument("--width", type=int, default=960)
    parser.add_argument("--height", type=int, default=540)
    parser.add_argument("--backend", default="pathtracer",
                        choices=["pathtracer", "rasterizer"])
    parser.add_argument("--environment-map", default=None)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    serve(args.gltf, args.width, args.height, args.port, args.backend,
          args.environment_map)


if __name__ == "__main__":
    main()
