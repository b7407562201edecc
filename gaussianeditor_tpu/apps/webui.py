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
  GET  /poses?theta&phi&radius&size           training-camera frustum
                                              segments for the overlay
  POST /trace   {prompt, threshold}           mask stats
  POST /threshold {threshold, group?}         instant re-threshold on the
                                              cached trace weights
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
<div id=view><div style="position:relative">
<img id=frame><canvas id=fov width=512 height=512
 style="position:absolute;left:0;top:0;pointer-events:none"></canvas>
</div></div>
<div id=panel>
<h3>gaussianeditor_tpu</h3>
<label>semantic prompt</label><input id=segp placeholder="e.g. the bear">
<label>mask threshold (live after a trace)</label>
<input id=thres type=number value=0.5 step=0.1 onchange="rethres()">
<button onclick="trace()">trace mask</button>
<label>semantic group</label><select id=groups onchange="setGroup()"></select>
<label><input id=overlay type=checkbox style="width:auto"> semantic overlay</label>
<label><input id=cams type=checkbox style="width:auto" onchange="refresh()">
 show training cameras</label>
<label>edited-frame view</label><input id=efv type=number value=0>
<button onclick="showFrame()">show edited frame</button>
<hr><label>edit prompt</label><input id=editp placeholder="make it golden">
<label>inpaint prompt (delete)</label><input id=inpp placeholder="background">
<label>steps</label><input id=steps type=number value=400>
<select id=mode><option value=edit>edit</option><option value=del>delete</option></select>
<button onclick="startEdit()">start training</button>
<button onclick="post('/stop',{})">stop</button>
<hr><label>add: prompt + bbox x0,y0,x1,y1 + view</label>
<input id=addp placeholder="a stone statue">
<input id=addb placeholder="128,128,384,384" value="128,128,384,384">
<input id=addv type=number value=0>
<button onclick="startAdd()">add object</button>
<hr><details><summary>training settings</summary>
<label>densify interval</label><input id=c_di type=number value=100>
<label>densify grad threshold</label><input id=c_dg type=number value=0.01 step=0.001>
<label>max densify %</label><input id=c_dp type=number value=0.01 step=0.001>
<label>min opacity</label><input id=c_mo type=number value=0.005 step=0.001>
<label>per-editing step</label><input id=c_pe type=number value=10>
<label>lambda L1</label><input id=c_l1 type=number value=10>
<label>lambda perceptual</label><input id=c_lp type=number value=10>
<label>lambda anchor geo</label><input id=c_ag type=number value=50>
<label>lambda anchor color</label><input id=c_ac type=number value=5>
<button onclick="applyCfg()">apply settings</button></details>
<button onclick="post('/save',{path:'webui_output.ply'})">save ply</button>
<div id=log></div></div>
<script>
let th=0.6, ph=0.3, r=4.0, drag=null;
const img=document.getElementById('frame');
function refresh(){img.src=`/render?theta=${th}&phi=${ph}&radius=${r}&size=512`+
  `&overlay=${document.getElementById('overlay').checked?1:0}&t=${Date.now()}`;
  drawCams();}
async function drawCams(){
  const cv=document.getElementById('fov'),ctx=cv.getContext('2d');
  ctx.clearRect(0,0,cv.width,cv.height);
  if(!document.getElementById('cams').checked)return;
  const d=await (await fetch(`/poses?theta=${th}&phi=${ph}&radius=${r}&size=512`)).json();
  ctx.strokeStyle='#4cf';ctx.fillStyle='#4cf';ctx.font='11px sans-serif';
  for(const f of d.frustums){if(!f.visible)continue;
    ctx.beginPath();
    for(const s of f.segments){ctx.moveTo(s[0],s[1]);ctx.lineTo(s[2],s[3]);}
    ctx.stroke();
    ctx.fillText(String(f.view),f.apex[0]+3,f.apex[1]-3);}}
function rethres(){post('/threshold',
  {threshold:+document.getElementById('thres').value});}
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
  threshold:+document.getElementById('thres').value});loadGroups();}
async function loadGroups(){const g=await (await fetch('/groups')).json();
  const sel=document.getElementById('groups');sel.innerHTML='';
  for(const n of g.groups){const o=document.createElement('option');
    o.value=o.textContent=n;if(n===g.active)o.selected=true;sel.appendChild(o);}}
function setGroup(){post('/group',{name:document.getElementById('groups').value});}
function showFrame(){img.src=`/editframe?view=${+document.getElementById('efv').value}`+
  `&t=${Date.now()}`;}
function startEdit(){post('/edit',{prompt:document.getElementById('editp').value,
  steps:+document.getElementById('steps').value,mode:document.getElementById('mode').value,
  inpaint_prompt:document.getElementById('inpp').value});
  poll();}
function startAdd(){const b=document.getElementById('addb').value.split(',').map(Number);
  post('/add',{prompt:document.getElementById('addp').value,bbox:b,
  view:+document.getElementById('addv').value});poll();}
function applyCfg(){const v=id=>+document.getElementById(id).value;
  post('/config',{densification_interval:v('c_di'),densify_grad_threshold:v('c_dg'),
  max_densify_percent:v('c_dp'),min_opacity:v('c_mo'),per_editing_step:v('c_pe'),
  'loss.lambda_l1':v('c_l1'),'loss.lambda_p':v('c_lp'),
  'loss.lambda_anchor_geo':v('c_ag'),'loss.lambda_anchor_color':v('c_ac')});}
async function poll(){const s=await (await fetch('/status')).json();log(JSON.stringify(s));
  refresh(); if(s.training) setTimeout(poll, 1500);}
function log(m){document.getElementById('log').textContent=m;}
refresh();
</script></body></html>"""


class WebUIState:
    def __init__(self, scene, cameras, cameras_extent: float,
                 guidance=None, segmentor=None, inpainter=None,
                 edit_config=None, object_generator=None,
                 depth_estimator=None, point_segmentor=None):
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
        self.object_generator = object_generator
        self.depth_estimator = depth_estimator
        self.point_segmentor = point_segmentor
        self.edit_config = edit_config or EditConfig(
            batch_size=2, cameras_extent=cameras_extent
        )
        self.lock = threading.Lock()
        self.training = False
        self.stop_flag = False
        self.last_metrics = {}
        self._render_cache = {}
        # named semantic groups (reference webui.py:540-558): every
        # trace stores its Gaussian mask under the prompt; switching
        # groups re-installs mask + grad gating instantly
        self.semantic_masks = {}
        # cached per-Gaussian CONTINUOUS weight accumulators per group:
        # moving the mask threshold re-applies `weights > thres` without
        # re-running the apply_weights splat (reference caches the
        # weights the same way for its thres slider, webui.py:782-793)
        self.semantic_weights = {}
        self.active_group = ""
        # the live training system, for the edited-frame browser
        # (reference edit_frame_show, webui.py:560-566)
        self._active_system = None
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
                     size: int, overlay: bool,
                     pose=None, fovx: float = 0.8,
                     fovy: float = 0.8) -> bytes:
        from gaussianeditor_tpu.core.cameras import Camera, lookat_camera

        if pose is not None:
            # client-supplied camera-to-world pose (reference camera
            # property from the viser client, webui.py:799-829)
            c2w = np.asarray(pose, np.float64).reshape(4, 4)
            cam = Camera.from_c2w(c2w, fovx, fovy, size, size)
        else:
            eye = self.center + radius * np.array(
                [np.cos(theta) * np.cos(phi), np.sin(phi),
                 np.sin(theta) * np.cos(phi)]
            )
            cam = lookat_camera(eye, self.center, np.array([0.0, 1.0, 0.0]),
                                fovx, fovy, size, size)
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
            self.semantic_masks[prompt] = np.asarray(self.scene.mask)
            self.semantic_weights[prompt] = np.asarray(norm)
            self.active_group = prompt
        return {"selected": n_sel, "total": int(self.scene.n_alive),
                "group": prompt, "groups": list(self.semantic_masks)}

    def click_trace(self, view: int, x: float, y: float,
                    threshold: float, group: str = "") -> dict:
        """Click-prompt tracing (webui.py:890-958) with the pluggable
        point segmentor (falls back to the text segmentor's color logic)."""
        from gaussianeditor_tpu.edit.tracing import trace_from_click
        from gaussianeditor_tpu.guidance.fake import FakePointSegmentor

        seg = getattr(self, "point_segmentor", None) or FakePointSegmentor()
        with self.lock:
            self.scene, norm = trace_from_click(
                self.scene, self.cameras, int(view), (float(x), float(y)),
                seg, threshold,
                tile_cap=self.edit_config.tile_cap,
                chunk=self.edit_config.chunk,
            )
            self.scene = self.scene.update_anchor()
            n_sel = int(np.asarray(self.scene.mask).sum())
            name = group or f"click@{int(view)}"
            self.semantic_masks[name] = np.asarray(self.scene.mask)
            self.semantic_weights[name] = np.asarray(norm)
            self.active_group = name
        return {"selected": n_sel, "total": int(self.scene.n_alive),
                "group": name, "groups": list(self.semantic_masks)}

    def set_group(self, name: str) -> dict:
        """Switch the active semantic group: re-install its stored mask
        (and thereby the optimizer grad gating — scene.mask IS the grad
        mask) without re-tracing (reference semantic_groups.on_update,
        webui.py:554-558)."""
        if name not in self.semantic_masks:
            return {"error": f"unknown group '{name}'",
                    "groups": list(self.semantic_masks)}
        jnp = self._jnp
        with self.lock:
            self.scene = self.scene.set_mask(
                jnp.asarray(self.semantic_masks[name]))
            self.scene = self.scene.update_anchor()
            self.active_group = name
            n_sel = int(np.asarray(self.scene.mask).sum())
        return {"group": name, "selected": n_sel,
                "groups": list(self.semantic_masks)}

    def groups(self) -> dict:
        return {"groups": list(self.semantic_masks),
                "active": self.active_group}

    def rethreshold(self, threshold: float, group: str = "") -> dict:
        """Instant mask re-threshold WITHOUT re-splatting: re-apply
        `weights > threshold` on the cached per-Gaussian weight
        accumulators of a traced group (the reference keeps the
        accumulators and lets the thres slider loop over them,
        webui.py:782-793; our splat analog is ops/apply_weights — this
        skips it entirely)."""
        name = group or self.active_group
        if name not in self.semantic_weights:
            return {"error": f"no cached trace weights for '{name}'",
                    "groups": list(self.semantic_weights)}
        jnp = self._jnp
        with self.lock:
            w = self.semantic_weights[name]
            sel = jnp.asarray(w > float(threshold)) & self.scene.alive
            self.scene = self.scene.set_mask(sel)
            self.scene = self.scene.update_anchor()
            self.semantic_masks[name] = np.asarray(self.scene.mask)
            self.active_group = name
            n_sel = int(np.asarray(self.scene.mask).sum())
        return {"group": name, "threshold": float(threshold),
                "selected": n_sel, "total": int(self.scene.n_alive)}

    def poses(self, theta: float, phi: float, radius: float,
              size: int, depth: float = 0.0) -> dict:
        """Training-camera frustums projected into the CURRENT orbit
        view — the stdlib-UI analog of the reference's in-scene viser
        frustum gizmos (webui.py:560-566, ui_utils.py:9-60). Returns 2D
        line segments per training view for the client's overlay canvas;
        projection reuses the exact server camera math, so the markers
        land where a render from that pose would."""
        from gaussianeditor_tpu.core.cameras import lookat_camera

        eye = self.center + radius * np.array(
            [np.cos(theta) * np.cos(phi), np.sin(phi),
             np.sin(theta) * np.cos(phi)]
        )
        cur = lookat_camera(eye, self.center, np.array([0.0, 1.0, 0.0]),
                            0.8, 0.8, size, size)
        full_proj = np.asarray(cur.full_proj)
        if depth <= 0.0:
            depth = 0.12 * float(self.cameras_extent or radius)

        def project(pts):  # [N,3] world -> ([N,2] pixels, [N] front)
            ph = pts @ full_proj[:3, :3].T + full_proj[:3, 3]
            w = pts @ full_proj[3, :3].T + full_proj[3, 3]
            front = w > 1e-3
            w = np.where(front, w, 1.0)
            ndc = ph[:, :2] / w[:, None]
            pix = ((ndc + 1.0) * size - 1.0) * 0.5  # ndc2Pix convention
            return pix, front

        frustums = []
        for i, cam in enumerate(self.cameras):
            c2w = np.linalg.inv(np.asarray(cam.world_view))
            tx, ty = float(cam.tan_fovx), float(cam.tan_fovy)
            # apex + 4 image-plane corners at `depth` (+z forward)
            local = np.array([
                [0.0, 0.0, 0.0],
                [-tx * depth, -ty * depth, depth],
                [tx * depth, -ty * depth, depth],
                [tx * depth, ty * depth, depth],
                [-tx * depth, ty * depth, depth],
            ])
            world = local @ c2w[:3, :3].T + c2w[:3, 3]
            pix, front = project(world)
            if not bool(front.all()):
                frustums.append({"view": i, "visible": False,
                                 "segments": []})
                continue
            edges = [(0, 1), (0, 2), (0, 3), (0, 4),
                     (1, 2), (2, 3), (3, 4), (4, 1)]
            segs = [[float(pix[a, 0]), float(pix[a, 1]),
                     float(pix[b, 0]), float(pix[b, 1])] for a, b in edges]
            frustums.append({
                "view": i, "visible": True, "segments": segs,
                "apex": [float(pix[0, 0]), float(pix[0, 1])],
            })
        return {"size": size, "frustums": frustums}

    def edit_frame_png(self, view: int):
        """Current edited TARGET image for a view — the per-view frame
        preview (reference edit_frame_show + per-frustum frames,
        webui.py:560-566). Falls back to the origin render when the view
        has no edited target yet; None when no training has started."""
        sys_ = self._active_system
        if sys_ is None:
            return None
        frame = sys_.edit_frames.get(int(view))
        if frame is None:
            frame = sys_.origin_frames.get(int(view))
        if frame is None:
            return None
        import imageio.v2 as imageio

        buf = io.BytesIO()
        imageio.imwrite(buf, (np.clip(frame, 0, 1) * 255).astype(np.uint8),
                        format="png")
        return buf.getvalue()

    def update_config(self, updates: dict) -> dict:
        """Densify / LR / loss / anchor / schedule knobs — the sliders of
        the reference GUI tree (webui.py:224-391). Top-level EditConfig
        fields plus `loss.*` lambdas; applied to subsequent trainings."""
        import dataclasses

        from gaussianeditor_tpu.train.trainer import LossWeights

        cfg = self.edit_config
        loss_updates = {}
        top_updates = {}
        for k, v in updates.items():
            if k.startswith("loss."):
                loss_updates[k[5:]] = v
            else:
                top_updates[k] = v
        bad = [k for k in top_updates
               if k not in {f.name for f in dataclasses.fields(cfg)}]
        bad += [f"loss.{k}" for k in loss_updates
                if k not in {f.name for f in dataclasses.fields(LossWeights)}]
        if bad:
            return {"error": f"unknown config keys: {bad}"}
        loss = (cfg.loss.replace(**loss_updates) if loss_updates
                else cfg.loss)
        with self.lock:
            self.edit_config = dataclasses.replace(
                cfg, loss=loss, **top_updates
            )
        out = dataclasses.asdict(self.edit_config)
        out["loss"] = {f.name: getattr(self.edit_config.loss, f.name)
                       for f in dataclasses.fields(LossWeights)}
        return out

    def _run_in_thread(self, build_and_fit) -> dict:
        if self.training:
            return {"error": "already training"}
        self.stop_flag = False

        def run():
            self.training = True
            try:
                build_and_fit()
            except Exception as e:  # surface errors to /status
                with self.lock:
                    self.last_metrics = {"error": f"{type(e).__name__}: {e}"}
            finally:
                self.training = False

        threading.Thread(target=run, daemon=True).start()
        return {"started": True}

    def _fit_callbacks(self):
        def cb(step, metrics):
            with self.lock:
                self.last_metrics = {
                    "step": int(step),
                    "loss": float(metrics["loss"]),
                    "loss_l1": float(metrics.get("loss_l1", 0.0)),
                    "loss_p": float(metrics.get("loss_p", 0.0)),
                }

        return cb, (lambda: self.stop_flag)

    def start_training(self, prompt: str, steps: int, mode: str,
                       inpaint_prompt: str = "") -> dict:
        """Edit / delete training (reference edit() webui.py:1129-1193 /
        delete() :1038-1126). Runs through the systems' fit() loops, so
        the C()-scheduled loss weights, the default perceptual term and
        densification all apply exactly as in the CLI path."""
        import dataclasses

        if mode == "del":
            if self.inpainter is None or self.segmentor is None:
                return {"error": "delete needs an inpainter and a segmentor"}

            from gaussianeditor_tpu.edit.del_system import (
                DelConfig,
                DelSystem,
            )

            base = {
                f.name: getattr(self.edit_config, f.name)
                for f in dataclasses.fields(self.edit_config)
            }
            cfg = DelConfig(**base)
            cfg = dataclasses.replace(
                cfg, seg_prompt=prompt or cfg.seg_prompt,
                inpaint_prompt=inpaint_prompt, max_steps=int(steps),
            )

            def run_del():
                system = DelSystem(self.scene, self.cameras, cfg,
                                   inpainter=self.inpainter,
                                   segmentor=self.segmentor)
                self._active_system = system
                cb, stop = self._fit_callbacks()

                def cb_sync(step, metrics):
                    cb(step, metrics)
                    with self.lock:
                        self.scene = system.state.scene

                system.fit(callback=cb_sync, should_stop=stop)
                with self.lock:
                    self.scene = system.scene

            return {**self._run_in_thread(run_del), "mode": mode,
                    "steps": steps}

        from gaussianeditor_tpu.edit.edit_system import EditSystem

        cfg = dataclasses.replace(
            self.edit_config, prompt=prompt, max_steps=int(steps)
        )

        def run_edit():
            system = EditSystem(self.scene, self.cameras, cfg,
                                guidance=self.guidance,
                                segmentor=self.segmentor)
            self._active_system = system
            cb, stop = self._fit_callbacks()

            def cb_sync(step, metrics):
                cb(step, metrics)
                with self.lock:
                    self.scene = system.state.scene

            system.fit(callback=cb_sync, should_stop=stop)
            with self.lock:
                self.scene = system.scene

        return {**self._run_in_thread(run_edit), "mode": mode,
                "steps": steps}

    def start_add(self, prompt: str, bbox, view: int = 0) -> dict:
        """Object insertion (reference add(), webui.py:1195-1475):
        inpaint the bbox, generate the object (Wonder3D adapter or any
        ObjectGenerator), depth-align, concat."""
        if self.inpainter is None or self.object_generator is None:
            return {"error": "add needs an inpainter and an object_generator"}
        import dataclasses

        from gaussianeditor_tpu.edit.add_system import AddConfig, AddSystem

        base = {
            f.name: getattr(self.edit_config, f.name)
            for f in dataclasses.fields(self.edit_config)
        }
        cfg = AddConfig(**base)
        cfg = dataclasses.replace(
            cfg, inpaint_prompt=prompt,
            bbox=tuple(int(v) for v in bbox),
            anchor_view_id=int(view),
        )

        def run_add():
            system = AddSystem(
                self.scene, self.cameras, cfg,
                inpainter=self.inpainter,
                object_generator=self.object_generator,
                depth_estimator=self.depth_estimator,
            )
            merged = system.run()
            with self.lock:
                self.scene = merged
                self.last_metrics = {
                    "added": True, "n_alive": int(merged.n_alive),
                }

        return {**self._run_in_thread(run_add), "mode": "add"}

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
                pose = None
                if "pose" in q:
                    vals = [float(v) for v in q["pose"][0].split(",")]
                    if len(vals) != 16:
                        return self._json(
                            {"error": "pose must be 16 floats (c2w)"}, 400)
                    pose = vals
                png = state.render_frame(
                    float(q.get("theta", [0.6])[0]),
                    float(q.get("phi", [0.3])[0]),
                    float(q.get("radius", [4.0])[0]),
                    int(q.get("size", [512])[0]),
                    q.get("overlay", ["0"])[0] == "1",
                    pose=pose,
                    fovx=float(q.get("fovx", [0.8])[0]),
                    fovy=float(q.get("fovy", [0.8])[0]),
                )
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
            elif url.path == "/status":
                self._json({"training": state.training, **state.last_metrics})
            elif url.path == "/config":
                self._json(state.update_config({}))
            elif url.path == "/groups":
                self._json(state.groups())
            elif url.path == "/poses":
                q = parse_qs(url.query)
                self._json(state.poses(
                    float(q.get("theta", [0.6])[0]),
                    float(q.get("phi", [0.3])[0]),
                    float(q.get("radius", [4.0])[0]),
                    int(q.get("size", [512])[0]),
                ))
            elif url.path == "/editframe":
                q = parse_qs(url.query)
                png = state.edit_frame_png(int(q.get("view", [0])[0]))
                if png is None:
                    return self._json({"error": "no frames yet"}, 404)
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
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
                    group=payload.get("group", ""),
                ))
            elif url.path == "/group":
                self._json(state.set_group(payload.get("name", "")))
            elif url.path == "/threshold":
                self._json(state.rethreshold(
                    float(payload.get("threshold", 0.5)),
                    group=payload.get("group", ""),
                ))
            elif url.path == "/edit":
                self._json(state.start_training(
                    payload.get("prompt", ""),
                    int(payload.get("steps", 100)),
                    payload.get("mode", "edit"),
                    inpaint_prompt=payload.get("inpaint_prompt", ""),
                ))
            elif url.path == "/add":
                self._json(state.start_add(
                    payload.get("prompt", ""),
                    payload.get("bbox", [0, 0, 0, 0]),
                    int(payload.get("view", 0)),
                ))
            elif url.path == "/config":
                self._json(state.update_config(payload))
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
    p.add_argument("--dispatch_burst", type=int, default=1,
                   help="train steps per device program during "
                        "background training (see EditConfig."
                        "dispatch_burst); 1 = live per-step status")
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
                               cameras_extent=cams.cameras_extent,
                               dispatch_burst=args.dispatch_burst),
    )
    serve(state, args.port)


if __name__ == "__main__":
    main()
