"""Interactive browser viewer: the TPU-native §2.6 UI layer.

Serves a single-page viewer over HTTP (stdlib only) that drives a live
:class:`~tbraymarcherplugin_tpu.renderer.Renderer` with the same control set
as the reference's runtime menus and VR grab loop:

- TF combo box + save (`TransferFuncMenu.h:21-105`; stock TFs stand in for
  the 22 `TF_CT-*` curve assets),
- window center/width sliders denormalized through `VolumeInfo` exactly like
  `UTransferFuncMenu::OnCenterChanged` (`TransferFuncMenu.cpp:63-70`),
- low/high cutoff checkboxes,
- volume load by path (`VolumeLoadMenu.cpp:54-78`),
- camera orbit/zoom by mouse drag/wheel and clip-plane + light-direction
  manipulation (the mouse stand-in for `AVRMotionController` grabs,
  `VRMotionController.cpp:47-99`).

Every control routes through the renderer's change-notification setters, so
interacting with the viewer exercises the dirty-flag reactivity model
(selective light updates included) end-to-end.

Run::

    python -m tbraymarcherplugin_tpu.tools.viewer scan.mhd --port 8000
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

log = logging.getLogger("tbraymarcher.viewer")

_PAGE = """<!DOCTYPE html>
<html><head><title>tbraymarcher viewer</title><style>
body { font-family: sans-serif; background: #161616; color: #ddd;
       display: flex; gap: 16px; margin: 16px; }
#panel { width: 300px; display: flex; flex-direction: column; gap: 8px; }
#panel label { display: flex; justify-content: space-between;
               align-items: center; gap: 8px; font-size: 13px; }
#panel input[type=range] { flex: 1; }
#view { image-rendering: auto; cursor: grab; border: 1px solid #333; }
select, input, button { background: #222; color: #ddd; border: 1px solid #444; }
h3 { margin: 8px 0 2px; font-size: 14px; color: #8ad; }
#status { font-size: 12px; color: #888; min-height: 2em; }
</style></head><body>
<div id="panel">
  <h3>Volume</h3>
  <label>path <input id="path" size="18"><button onclick="loadVolume()">load</button></label>
  <div id="vinfo" style="font-size:12px;color:#999"></div>
  <h3>Transfer function</h3>
  <label>TF <select id="tf" onchange="upd({tf: this.value})"></select></label>
  <label>save <input id="savepath" size="14" value="asset.npz">
    <button onclick="saveAsset()">save</button></label>
  <h3>Windowing</h3>
  <label>center <input type="range" id="wc" min="0" max="1" step="0.002"
    oninput="upd({window_center: +this.value})"><span id="wcv"></span></label>
  <label>width <input type="range" id="ww" min="0.01" max="2" step="0.002"
    oninput="upd({window_width: +this.value})"><span id="wwv"></span></label>
  <label>low cutoff <input type="checkbox" id="lc"
    onchange="upd({low_cutoff: this.checked})"></label>
  <label>high cutoff <input type="checkbox" id="hc"
    onchange="upd({high_cutoff: this.checked})"></label>
  <h3>Render</h3>
  <label>mode <select id="mode" onchange="upd({mode: this.value})">
    <option>lit</option><option>intensity</option><option>octree</option>
  </select></label>
  <label>impl <select id="march_impl"
    onchange="upd({march_impl: this.value})">
    <option>auto</option><option>shearwarp</option><option>blocked</option>
  </select></label>
  <label>steps <input type="range" id="steps" min="16" max="400" step="1"
    onchange="upd({steps: +this.value})"><span id="stepsv"></span></label>
  <h3>Light</h3>
  <label>azimuth <input type="range" id="laz" min="-180" max="180" step="2"
    onchange="upd({light_az: +this.value})"></label>
  <label>elevation <input type="range" id="lel" min="-89" max="89" step="2"
    onchange="upd({light_el: +this.value})"></label>
  <label>intensity <input type="range" id="lint" min="0" max="2" step="0.05"
    onchange="upd({light_intensity: +this.value})"></label>
  <h3>Clip plane</h3>
  <label>enabled <input type="checkbox" id="clip"
    onchange="upd({clip_enabled: this.checked})"></label>
  <label>offset <input type="range" id="coff" min="0" max="1" step="0.01"
    onchange="upd({clip_offset: +this.value})"></label>
  <label>yaw <input type="range" id="cyaw" min="-180" max="180" step="5"
    onchange="upd({clip_yaw: +this.value})"></label>
  <label>pitch <input type="range" id="cpitch" min="-90" max="90" step="5"
    onchange="upd({clip_pitch: +this.value})"></label>
  <div id="status"></div>
</div>
<img id="view" width="512" height="512">
<script>
let cam = {az: 30, el: 15, dist: 2.2};
let pending = false, queued = false;
async function refresh() {
  if (pending) { queued = true; return; }
  pending = true;
  const t0 = performance.now();
  const u = `/api/frame?az=${cam.az}&el=${cam.el}&dist=${cam.dist}&t=${Date.now()}`;
  const r = await fetch(u);
  const blob = await r.blob();
  document.getElementById('view').src = URL.createObjectURL(blob);
  document.getElementById('status').textContent =
    `frame ${(performance.now() - t0).toFixed(0)} ms`;
  pending = false;
  if (queued) { queued = false; refresh(); }
}
async function upd(delta) {
  await fetch('/api/update', {method: 'POST', body: JSON.stringify(delta)});
  await syncState(); refresh();
}
async function saveAsset() {
  const path = document.getElementById('savepath').value;
  const r = await fetch('/api/save', {method: 'POST',
    body: JSON.stringify({path})});
  const j = await r.json();
  document.getElementById('status').textContent =
    j.error || ('saved ' + j.saved);
}
async function loadVolume() {
  const path = document.getElementById('path').value;
  const r = await fetch('/api/load', {method: 'POST',
    body: JSON.stringify({path})});
  const j = await r.json();
  document.getElementById('status').textContent = j.error || 'loaded';
  await syncState(); refresh();
}
async function syncState() {
  const s = await (await fetch('/api/state')).json();
  const g = id => document.getElementById(id);
  g('tf').innerHTML = s.tf_options.map(
    o => `<option ${o === s.tf ? 'selected' : ''}>${o}</option>`).join('');
  g('wc').value = s.window_center; g('wcv').textContent =
    s.window_center_display;
  g('ww').value = s.window_width; g('wwv').textContent =
    s.window_width_display;
  g('lc').checked = s.low_cutoff; g('hc').checked = s.high_cutoff;
  g('mode').value = s.mode; g('steps').value = s.steps;
  g('march_impl').value = s.march_impl;
  g('stepsv').textContent = s.steps;
  g('laz').value = s.light_az; g('lel').value = s.light_el;
  g('lint').value = s.light_intensity;
  g('clip').checked = s.clip_enabled; g('coff').value = s.clip_offset;
  g('cyaw').value = s.clip_yaw; g('cpitch').value = s.clip_pitch;
  g('vinfo').textContent = s.volume_info;
}
const view = document.getElementById('view');
let drag = null;
view.addEventListener('mousedown', e => drag = [e.clientX, e.clientY]);
window.addEventListener('mouseup', () => drag = null);
window.addEventListener('mousemove', e => {
  if (!drag) return;
  cam.az += (e.clientX - drag[0]) * 0.5;
  cam.el = Math.max(-89, Math.min(89, cam.el + (e.clientY - drag[1]) * 0.5));
  drag = [e.clientX, e.clientY];
  refresh();
});
view.addEventListener('wheel', e => {
  e.preventDefault();
  cam.dist = Math.max(1.2, Math.min(6, cam.dist * (1 + e.deltaY * 0.001)));
  refresh();
});
syncState().then(refresh);
</script></body></html>
"""


class ViewerState:
    """Server-side scene state; every mutation goes through Renderer setters."""

    def __init__(self, volume_path=None, image_size=512,
                 synthetic_dims=(128, 128, 128)):
        from ..ops import synthetic
        from ..ops.transfer import default_grayscale_tf
        from ..renderer import Renderer, RendererConfig
        from ..scene import DirLight

        self.lock = threading.Lock()
        self.image_size = image_size
        self.tf_name = "grayscale"
        self.light_az, self.light_el, self.light_intensity = 30.0, 40.0, 1.0
        self.clip_enabled = False
        self.clip_offset, self.clip_yaw, self.clip_pitch = 0.5, 0.0, 0.0
        self.volume_label = (
            f"synthetic phantom {synthetic_dims[0]}^3"
        )

        if volume_path:
            from ..io import load_volume

            loaded = load_volume(volume_path)
            data, info = loaded.data, loaded.info
            self.volume_label = f"{volume_path} {info.dimensions}"
        else:
            data, info = synthetic.ct_like_phantom(synthetic_dims, seed=0), None
        self.renderer = Renderer(
            data, info=info, tf_table=default_grayscale_tf(),
            config=RendererConfig(light_volume_half_resolution=True),
        )
        self.renderer.add_light("main", self._light())

    def _light(self):
        from ..scene import DirLight

        az, el = np.radians(self.light_az), np.radians(self.light_el)
        d = [np.cos(el) * np.sin(az), np.cos(el) * np.cos(az), -np.sin(el)]
        return DirLight.create(d, self.light_intensity)

    def _clip(self):
        from ..scene import ClipPlane

        if not self.clip_enabled:
            return ClipPlane.disabled()
        yaw, pitch = np.radians(self.clip_yaw), np.radians(self.clip_pitch)
        n = np.array([
            np.cos(pitch) * np.sin(yaw),
            np.cos(pitch) * np.cos(yaw),
            np.sin(pitch),
        ])
        center = 0.5 + (self.clip_offset - 0.5) * n
        return ClipPlane.create(center, n)

    # -- API ------------------------------------------------------------

    def state(self):
        from ..ops.transfer import STOCK_TRANSFER_FUNCTIONS

        r = self.renderer
        info = r.info
        # Display values denormalized via VolumeInfo, like the reference menu.
        c = r.get_window_center()
        w = r.get_window_width()
        try:
            cd = info.denormalize_value(c)
            wd = info.denormalize_range(w)
            c_disp, w_disp = f"{cd:.0f}", f"{wd:.0f}"
        except Exception:
            c_disp, w_disp = f"{c:.3f}", f"{w:.3f}"
        return {
            "tf": self.tf_name,
            "tf_options": sorted(STOCK_TRANSFER_FUNCTIONS),
            "window_center": c,
            "window_width": w,
            "window_center_display": c_disp,
            "window_width_display": w_disp,
            "low_cutoff": bool(r.windowing.low_cutoff),
            "high_cutoff": bool(r.windowing.high_cutoff),
            "mode": r.config.render_mode,
            "march_impl": r.config.march_impl,
            "steps": r.config.step_count,
            "light_az": self.light_az,
            "light_el": self.light_el,
            "light_intensity": self.light_intensity,
            "clip_enabled": self.clip_enabled,
            "clip_offset": self.clip_offset,
            "clip_yaw": self.clip_yaw,
            "clip_pitch": self.clip_pitch,
            "volume_info": self.volume_label,
        }

    def update(self, delta: dict):
        r = self.renderer
        if "tf" in delta:
            from ..ops.transfer import STOCK_TRANSFER_FUNCTIONS

            self.tf_name = delta["tf"]
            r.set_tf(STOCK_TRANSFER_FUNCTIONS[self.tf_name]())
        if "window_center" in delta:
            r.set_window_center(float(delta["window_center"]))
        if "window_width" in delta:
            r.set_window_width(float(delta["window_width"]))
        if "low_cutoff" in delta:
            r.set_low_cutoff(bool(delta["low_cutoff"]))
        if "high_cutoff" in delta:
            r.set_high_cutoff(bool(delta["high_cutoff"]))
        if "mode" in delta:
            r.set_render_mode(delta["mode"])
        if "march_impl" in delta:
            assert delta["march_impl"] in ("auto", "shearwarp", "blocked",
                                           "pallas", "scan")
            r.config.march_impl = delta["march_impl"]
        if "steps" in delta:
            r.set_raymarch_steps(int(delta["steps"]))
        light_keys = {"light_az", "light_el", "light_intensity"}
        if light_keys & set(delta):
            for k in light_keys & set(delta):
                setattr(self, k, float(delta[k]))
            # Selective single-light update path (`UpdateSingleLight`).
            r.update_light("main", self._light())
        clip_keys = {"clip_enabled", "clip_offset", "clip_yaw", "clip_pitch"}
        if clip_keys & set(delta):
            for k in clip_keys & set(delta):
                v = delta[k]
                setattr(self, k, bool(v) if k == "clip_enabled" else float(v))
            r.set_clip_plane(self._clip())

    def load(self, path: str):
        from ..io import load_volume

        loaded = load_volume(path)
        self.renderer.set_volume(loaded.data, info=loaded.info)
        self.volume_label = f"{path} {loaded.info.dimensions}"

    def save(self, path: str):
        """Write the LIVE TF table + windowing back into an asset on disk —
        the reference's save button (`TransferFuncMenu.h:21-105`) routing to
        `SaveCurrentParamsToVolumeAsset` (`RaymarchVolume.cpp:579-594`)."""
        import dataclasses

        from ..io.volume_asset import VolumeAsset

        r = self.renderer
        info = dataclasses.replace(r.info, default_windowing=r.windowing)
        VolumeAsset.create_transient(
            np.asarray(r.volume), info=info,
            tf_table=np.asarray(r.tf_table),
        ).save(path)
        return path if path.endswith(".npz") else path + ".npz"

    def frame_png(self, az, el, dist) -> bytes:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from .render_cli import _orbit_camera

        # dist is in cube units; scale by the proxy cube's world size so
        # real-metadata volumes (world-unit transforms) stay in frame
        # (same contract as render_cli --distance).
        world_size = float(np.max(np.asarray(self.renderer.transform.scale)))
        cam = _orbit_camera(az, el, dist * world_size, fov=40.0)
        rgba = np.asarray(
            self.renderer.render(cam, self.image_size, self.image_size)
        )
        rgb = np.clip(rgba[..., :3], 0.0, 1.0)
        buf = io.BytesIO()
        plt.imsave(buf, rgb, format="png")
        return buf.getvalue()


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            log.debug(fmt, *args)

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/" or self.path.startswith("/index"):
                self._send(200, _PAGE.encode(), "text/html")
            elif self.path.startswith("/api/state"):
                with state.lock:
                    self._send(200, json.dumps(state.state()).encode())
            elif self.path.startswith("/api/frame"):
                from urllib.parse import parse_qs, urlparse

                q = parse_qs(urlparse(self.path).query)
                az = float(q.get("az", ["30"])[0])
                el = float(q.get("el", ["15"])[0])
                dist = float(q.get("dist", ["2.2"])[0])
                with state.lock:
                    png = state.frame_png(az, el, dist)
                self._send(200, png, "image/png")
            else:
                self._send(404, b"{}")

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            try:
                if self.path == "/api/update":
                    with state.lock:
                        state.update(body)
                    self._send(200, b"{}")
                elif self.path == "/api/load":
                    with state.lock:
                        state.load(body["path"])
                    self._send(200, b"{}")
                elif self.path == "/api/save":
                    with state.lock:
                        saved = state.save(body["path"])
                    self._send(200, json.dumps({"saved": saved}).encode())
                else:
                    self._send(404, b"{}")
            except Exception as e:  # surface errors to the UI status line
                self._send(200, json.dumps({"error": str(e)}).encode())

    return Handler


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="tbraymarcher browser viewer")
    p.add_argument("volume", nargs="?", default=None,
                   help="volume to load at startup (default: synthetic)")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--size", type=int, default=512, help="frame size (px)")
    p.add_argument("-v", "--verbose", action="store_true")
    args = p.parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO)

    state = ViewerState(args.volume, image_size=args.size)
    server = ThreadingHTTPServer(("127.0.0.1", args.port),
                                 make_handler(state))
    log.info("viewer at http://127.0.0.1:%d", args.port)
    print(f"viewer at http://127.0.0.1:{args.port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
