"""Interactive viewer (app/viewer.py): render loop + HTTP blit + input."""

import json
import time
import urllib.request

import numpy as np

from tests.scenes import write_box_gltf


def test_viewer_serves_frames_and_input(tmp_path):
    from gltf_renderer_tpu.app import viewer

    path = str(tmp_path / "box.gltf")
    write_box_gltf(path)
    server, state, thread = viewer.serve(
        path, width=64, height=32, port=0, block=False
    )
    try:
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"

        # Wait for the first frame.
        deadline = time.time() + 120
        png = b""
        while time.time() < deadline:
            try:
                r = urllib.request.urlopen(base + "/frame.png", timeout=5)
                png = r.read()
                break
            except Exception:
                time.sleep(0.5)
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        page = urllib.request.urlopen(base + "/", timeout=5).read()
        assert b"pointerdown" in page

        st = json.loads(urllib.request.urlopen(base + "/state", timeout=5).read())
        assert st["backend"] == "pathtracer"
        assert st["spp"] >= 1

        # Orbit input moves the camera and resets progressive accumulation
        # (reference CameraController -> accumulation reset semantics).
        # The reset is observed deterministically via the renderer's
        # reset-on-change key (HTTP polling can miss the brief low-spp
        # window on a fast CPU render).
        key0 = state.renderer._last_reset_key
        azi0 = state.orbit.azimuth
        req = urllib.request.Request(
            base + "/input", data=json.dumps({"type": "orbit", "dx": 80, "dy": 0}).encode(),
            method="POST",
        )
        assert urllib.request.urlopen(req, timeout=5).read() == b"ok"
        deadline = time.time() + 60
        while time.time() < deadline and (
            state.orbit.azimuth == azi0 or state.renderer._last_reset_key == key0
        ):
            time.sleep(0.2)
        assert state.orbit.azimuth != azi0
        assert state.renderer._last_reset_key != key0
    finally:
        state.running = False
        server.shutdown()
