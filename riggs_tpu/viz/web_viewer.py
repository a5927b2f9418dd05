"""Interactive web viewer/editor — the GUI surface (L8) for headless TPU hosts.

Replaces the reference's dearpygui windows (train_gui.py / interactive_GUI.py)
and SIBR socket viewer (gaussian_renderer/network_gui.py) with a zero-
dependency HTTP viewer: a canvas page with mouse orbit/pan/zoom, a time
slider, render-mode toggles (RGB / skinning weights / motion mask), joint
pose editing (select joint, rotate about the view axis), drag-keypoint ARAP
editing (shift-click to pick a control point, drag to deform —
interactive_GUI.py:1268 workflow via edit/session.py), a pose library with
SLERP playback (interactive_GUI.py:1216-1261), and reference-skeleton
retargeting — all driven by the same deform_by_pose / deform_arap APIs as the
offline synthesis tools.

Endpoints beyond ``/`` and ``/render``:
    /pose/save?name=X         capture current pose (incl. joint edit) to the library
    /pose/list                saved pose names
    /pose/play?names=a,b&frames=20   build a SLERP playback sequence -> {"frames": F}
        then  /render?...&seq=i      renders frame i of the sequence
    /retarget?path=DIR&name=X load DIR/skeleton_tree.npz + DIR/poses.json and
                              retarget pose X onto this skeleton (sets the pose override)
    /pose/clear               drop pose override / sequence
    /edit/init?n=256          build the ARAP drag-edit session (FPS control points)
    /edit/pick?x=&y=&az=&el=&r=[&expand=1]   select control point near pixel
    /edit/drag?dx=&dy=&az=&el=&r=            drag selected handles (pixels), re-solve
    /edit/clear               reset the edit session
        edited cloud renders with  /render?...&mode=edited

Usage:
    from riggs_tpu.viz.web_viewer import ViewerServer
    ViewerServer(gs, skel=skel).serve(port=8080)   # skeleton (stage-2) model
    ViewerServer(gs, warp=warp).serve(port=8080)   # node (stage-1) model
"""
from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>riggs_tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font-family:monospace}
#c{display:block;margin:8px auto;border:1px solid #333}
#bar{ text-align:center; padding:4px }
button,input,select{background:#222;color:#ddd;border:1px solid #444;margin:2px}
</style></head><body>
<div id="bar">
 t:<input id="t" type="range" min="0" max="1" step="0.01" value="0" style="width:200px">
 mode:<select id="mode"><option>rgb</option><option>skinning</option><option>motion</option><option>edited</option></select>
 joint:<input id="joint" type="number" value="-1" style="width:50px">
 angle:<input id="angle" type="range" min="-180" max="180" value="0" style="width:150px">
 <button onclick="reset()">reset pose</button>
 <label><input id="edit" type="checkbox">edit</label>
 <button onclick="editInit()">init edit</button>
 <button onclick="editClear()">clear edit</button>
 <button onclick="poseSave()">save pose</button>
 <button onclick="posePlay()">play</button>
 <span id="stat"></span>
</div>
<canvas id="c" width="512" height="512"></canvas>
<script>
let az=0, el=0.3, radius=3.0, drag=false, lx=0, ly=0, pending=false, seq=-1, playing=null;
const c=document.getElementById('c'), ctx=c.getContext('2d');
const v=id=>document.getElementById(id).value;
const editOn=()=>document.getElementById('edit').checked;
function refresh(){
  if(pending) return; pending=true;
  const img=new Image();
  const t0=performance.now();
  img.onload=()=>{ctx.drawImage(img,0,0,c.width,c.height);pending=false;
    document.getElementById('stat').textContent=(performance.now()-t0).toFixed(0)+' ms';};
  img.onerror=()=>{pending=false};
  const s=seq>=0?`&seq=${seq}`:'';
  img.src=`/render?az=${az}&el=${el}&r=${radius}&t=${v('t')}&mode=${v('mode')}&joint=${v('joint')}&angle=${v('angle')}${s}&_=${Date.now()}`;
}
function reset(){document.getElementById('angle').value=0;document.getElementById('joint').value=-1;seq=-1;
  fetch('/pose/clear').then(refresh);}
function editInit(){fetch('/edit/init').then(()=>{document.getElementById('edit').checked=true;
  document.getElementById('mode').value='edited';refresh();});}
function editClear(){fetch('/edit/clear').then(refresh);}
function poseSave(){const n=prompt('pose name'); if(n) fetch(`/pose/save?name=${n}`);}
function posePlay(){
  fetch('/pose/list').then(r=>r.json()).then(names=>{
    const ns=prompt('poses to play (comma-sep)', names.join(','));
    if(!ns) return;
    fetch(`/pose/play?names=${ns}&frames=15`).then(r=>r.json()).then(o=>{
      let i=0; if(playing) clearInterval(playing);
      playing=setInterval(()=>{seq=i++%o.frames; refresh();}, 120);
    });});
}
c.onmousedown=e=>{
  drag=true;lx=e.clientX;ly=e.clientY;
  if(editOn()&&e.shiftKey){
    const r=c.getBoundingClientRect();
    const x=(e.clientX-r.left)*(c.width/r.width), y=(e.clientY-r.top)*(c.height/r.height);
    fetch(`/edit/pick?x=${x}&y=${y}&az=${az}&el=${el}&r=${radius}`).then(refresh);
  }};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return;
  const dx=e.clientX-lx, dy=e.clientY-ly; lx=e.clientX; ly=e.clientY;
  if(editOn()){fetch(`/edit/drag?dx=${dx}&dy=${dy}&az=${az}&el=${el}&r=${radius}`).then(refresh);}
  else{az+=dx*0.01;el+=dy*0.01;refresh();}};
c.onwheel=e=>{e.preventDefault();radius*=Math.pow(1.1,e.deltaY>0?1:-1);refresh()};
document.getElementById('t').oninput=refresh;
document.getElementById('mode').onchange=refresh;
document.getElementById('angle').oninput=refresh;
setInterval(()=>{},1000); refresh();
</script></body></html>"""


class ViewerServer:
    def __init__(
        self,
        gs=None,
        skel=None,
        warp=None,
        width: int = 512,
        height: int = 512,
        fov: float = 0.9,
        state_fn=None,
        pose_lib_path=None,
    ):
        """Static model: pass gs (+skel or warp). Live training: pass
        ``state_fn() -> (gs, skel, warp)`` and the viewer renders the current
        training state on every request (the train-while-viewing mode of the
        reference train_gui)."""
        import tempfile

        import jax
        import jax.numpy as jnp

        from riggs_tpu.edit.pose_edit import PoseLibrary

        self._static = (gs, skel, warp)
        self.state_fn = state_fn
        self.width = width
        self.height = height
        self.fov = fov
        self._lock = threading.Lock()
        self._jnp = jnp
        self._jax = jax
        if pose_lib_path is None:
            pose_lib_path = Path(tempfile.gettempdir()) / "riggs_viewer_poses.json"
        self.pose_lib = PoseLibrary(pose_lib_path)
        self.edit = None  # EditSession after /edit/init
        self._seq = None  # (rotations (F,J,4), translations (F,3)) playback
        self._pose_override = None  # (local_rotation, global_trans) from retarget

    @property
    def _state(self):
        return self.state_fn() if self.state_fn is not None else self._static

    @property
    def gs(self):
        return self._state[0]

    @property
    def skel(self):
        return self._state[1]

    @property
    def warp(self):
        return self._state[2]

    # ---- rendering -------------------------------------------------------
    def _camera(self, az: float, el: float, radius: float):
        from riggs_tpu.camera.camera import make_camera

        pos = radius * np.array(
            [np.cos(el) * np.cos(az), np.sin(el), np.cos(el) * np.sin(az)]
        )
        z = -pos / np.linalg.norm(pos)
        up = np.array([0.0, -1.0, 0.0])
        x = np.cross(up, z)
        x /= max(np.linalg.norm(x), 1e-9)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=1)
        T = -R.T @ pos
        return make_camera(R, T, self.width, self.height, fovx=self.fov, fovy=self.fov)

    def current_pose(self, az, el, radius, t, joint=-1, angle=0.0, seq=-1):
        """(local_rotation, global_trans) after seq/override/joint-edit
        composition — what /render would pose with."""
        jnp = self._jnp
        from riggs_tpu.models import skeleton_warp as SW
        from riggs_tpu.edit.pose_edit import rotate_joint

        cam = self._camera(az, el, radius)
        if self._seq is not None and 0 <= seq < self._seq[0].shape[0]:
            rot, trans = jnp.asarray(self._seq[0][seq]), jnp.asarray(self._seq[1][seq])
        elif self._pose_override is not None:
            rot, trans = (jnp.asarray(a) for a in self._pose_override)
        else:
            pose = SW.pose_at(self.skel, jnp.asarray(float(t)))
            rot, trans = pose["local_rotation"], pose["global_trans"]
        if 0 <= joint < self.skel.net.n_joints and abs(angle) > 1e-3:
            view_axis = np.asarray(cam.w2c)[2, :3]  # camera forward in world
            rot = rotate_joint(rot, int(joint), view_axis, float(np.deg2rad(angle)))
        return rot, trans

    def render_frame(self, az, el, radius, t, mode="rgb", joint=-1, angle=0.0, seq=-1) -> np.ndarray:
        jnp = self._jnp
        from riggs_tpu.render.api import render
        from riggs_tpu.eval.synthesis import skinning_colors

        cam = self._camera(az, el, radius)
        bg = jnp.zeros(3)
        kwargs = dict(active_sh_degree=self.gs.max_sh_degree, max_per_tile=512)
        if mode == "edited" and self.edit is not None:
            d_xyz = jnp.asarray(self.edit.d_xyz)
            out = render(cam, self.gs, bg, d_xyz=d_xyz, **kwargs)
            return np.asarray(out["render"])
        if self.skel is not None:
            from riggs_tpu.models import skeleton_warp as SW

            rot, trans = self.current_pose(az, el, radius, t, joint, angle, seq)
            d = SW.deform_by_pose(self.skel, self.gs.xyz, rot, trans, self.gs.motion_mask)
        elif self.warp is not None:
            from riggs_tpu.models import node_warp as NW

            d = NW.warp_forward(
                self.warp, self.gs.xyz, jnp.asarray(float(t)), self.gs.feature, self.gs.motion_mask
            )
        else:
            d = None

        common = {} if d is None else dict(
            d_xyz=d["d_xyz"], d_rotation=d["d_rotation"], d_scaling=jnp.zeros_like(d["d_scaling"])
        )
        if mode == "skinning" and d is not None and "nn_idx" in d and self.skel is not None:
            colors = skinning_colors(d["nn_idx"], d["nn_weight"], self.skel.net.n_joints)
            out = render(cam, self.gs, bg, override_color=colors, **common, **{k: v for k, v in kwargs.items() if k != "active_sh_degree"})
        elif mode == "motion":
            out = render(cam, self.gs, bg, render_motion=True, **common, max_per_tile=512)
        else:
            out = render(cam, self.gs, bg, **common, **kwargs)
        return np.asarray(out["render"])

    # ---- editing / pose API ---------------------------------------------
    def handle_api(self, path: str, q: dict):
        """JSON endpoints (see module docstring). Returns a JSON-able dict, or
        None for unknown paths (-> 404); raises for bad requests (-> 400)."""
        if path == "/pose/save":
            rot, trans = self.current_pose(
                float(q.get("az", 0)), float(q.get("el", 0.3)), float(q.get("r", 3.0)),
                float(q.get("t", 0.0)), int(float(q.get("joint", -1))),
                float(q.get("angle", 0)), int(float(q.get("seq", -1))),
            )
            self.pose_lib.add(q["name"], rot, trans)
            self.pose_lib.save()
            return {"saved": q["name"]}
        if path == "/pose/list":
            return sorted(self.pose_lib.poses)
        if path == "/pose/play":
            names = [n for n in q.get("names", "").split(",") if n]
            rots, trans = self.pose_lib.interpolate(names, int(q.get("frames", 15)))
            self._seq = (np.asarray(rots), np.asarray(trans))
            return {"frames": int(self._seq[0].shape[0])}
        if path == "/pose/clear":
            self._seq = None
            self._pose_override = None
            return {"ok": True}
        if path == "/retarget":
            from riggs_tpu.edit.pose_edit import PoseLibrary, retarget_pose

            src_dir = Path(q["path"])
            tree = np.load(src_dir / "skeleton_tree.npz")
            lib = PoseLibrary(src_dir / "poses.json")
            rot, trans = lib.get(q["name"])
            rot, trans = retarget_pose(
                tree["joints"], np.asarray(self.skel.joints), rot, trans
            )
            self._pose_override = (rot, trans)
            return {"joints_src": int(tree["joints"].shape[0]), "joints_dst": int(self.skel.joints.shape[0])}
        if path == "/edit/init":
            from riggs_tpu.edit.session import EditSession

            ctrl = None
            if self.warp is not None:
                ctrl = np.asarray(self.warp.nodes[:, :3])
            self.edit = EditSession(
                np.asarray(self.gs.xyz), n_ctrl=int(q.get("n", 256)), ctrl_points=ctrl
            )
            return {"n_ctrl": int(self.edit.ctrl_rest.shape[0])}
        if path == "/edit/pick":
            if self.edit is None:
                raise ValueError("call /edit/init first")
            cam = self._camera(float(q.get("az", 0)), float(q.get("el", 0.3)), float(q.get("r", 3.0)))
            i = self.edit.pick(
                cam, float(q["x"]), float(q["y"]), expand=bool(int(q.get("expand", 0)))
            )
            return {"picked": i, "n_keypoints": len(self.edit.kps)}
        if path == "/edit/drag":
            if self.edit is None:
                raise ValueError("call /edit/init first")
            cam = self._camera(float(q.get("az", 0)), float(q.get("el", 0.3)), float(q.get("r", 3.0)))
            self.edit.drag(cam, float(q["dx"]), float(q["dy"]))
            return {"n_keypoints": len(self.edit.kps)}
        if path == "/edit/clear":
            if self.edit is not None:
                self.edit.clear()
            return {"ok": True}
        return None

    # ---- http ------------------------------------------------------------
    def serve(self, port: int = 8080, blocking: bool = True):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if u.path == "/render":
                    q = {k: v[0] for k, v in parse_qs(u.query).items()}
                    with viewer._lock:
                        img = viewer.render_frame(
                            float(q.get("az", 0)),
                            float(q.get("el", 0.3)),
                            float(q.get("r", 3.0)),
                            float(q.get("t", 0.0)),
                            q.get("mode", "rgb"),
                            int(float(q.get("joint", -1))),
                            float(q.get("angle", 0)),
                            int(float(q.get("seq", -1))),
                        )
                    from PIL import Image

                    buf = io.BytesIO()
                    Image.fromarray(np.clip(img * 255, 0, 255).astype(np.uint8)).save(buf, "PNG")
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.end_headers()
                    self.wfile.write(buf.getvalue())
                    return
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                try:
                    with viewer._lock:
                        out = viewer.handle_api(u.path, q)
                except Exception as e:  # noqa: BLE001
                    self.send_response(400)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(json.dumps({"error": str(e)}).encode())
                    return
                if out is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps(out).encode())

        server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
        print(f"viewer at http://localhost:{port}/")
        if blocking:
            server.serve_forever()
        else:
            threading.Thread(target=server.serve_forever, daemon=True).start()
        return server
