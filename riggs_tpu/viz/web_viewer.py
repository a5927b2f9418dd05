"""Interactive web viewer/editor — the GUI surface (L8) for headless TPU hosts.

Replaces the reference's dearpygui windows (train_gui.py / interactive_GUI.py)
and SIBR socket viewer (gaussian_renderer/network_gui.py) with a zero-
dependency HTTP viewer: a canvas page with mouse orbit/pan/zoom, a time
slider, render-mode toggles (RGB / skinning weights / motion mask), and
joint pose editing (select joint, rotate about the view axis) driven by the
same deform_by_pose API as the offline synthesis tools.

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
 mode:<select id="mode"><option>rgb</option><option>skinning</option><option>motion</option></select>
 joint:<input id="joint" type="number" value="-1" style="width:50px">
 angle:<input id="angle" type="range" min="-180" max="180" value="0" style="width:150px">
 <button onclick="reset()">reset pose</button>
 <span id="stat"></span>
</div>
<canvas id="c" width="512" height="512"></canvas>
<script>
let az=0, el=0.3, radius=3.0, drag=false, lx=0, ly=0, pending=false;
const c=document.getElementById('c'), ctx=c.getContext('2d');
function refresh(){
  if(pending) return; pending=true;
  const t=document.getElementById('t').value, m=document.getElementById('mode').value;
  const j=document.getElementById('joint').value, a=document.getElementById('angle').value;
  const img=new Image();
  const t0=performance.now();
  img.onload=()=>{ctx.drawImage(img,0,0,c.width,c.height);pending=false;
    document.getElementById('stat').textContent=(performance.now()-t0).toFixed(0)+' ms';};
  img.onerror=()=>{pending=false};
  img.src=`/render?az=${az}&el=${el}&r=${radius}&t=${t}&mode=${m}&joint=${j}&angle=${a}&_=${Date.now()}`;
}
function reset(){document.getElementById('angle').value=0;document.getElementById('joint').value=-1;refresh();}
c.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return;az+=(e.clientX-lx)*0.01;el+=(e.clientY-ly)*0.01;lx=e.clientX;ly=e.clientY;refresh()};
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
    ):
        """Static model: pass gs (+skel or warp). Live training: pass
        ``state_fn() -> (gs, skel, warp)`` and the viewer renders the current
        training state on every request (the train-while-viewing mode of the
        reference train_gui)."""
        import jax
        import jax.numpy as jnp

        self._static = (gs, skel, warp)
        self.state_fn = state_fn
        self.width = width
        self.height = height
        self.fov = fov
        self._lock = threading.Lock()
        self._jnp = jnp
        self._jax = jax

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

    def render_frame(self, az, el, radius, t, mode="rgb", joint=-1, angle=0.0) -> np.ndarray:
        jnp = self._jnp
        from riggs_tpu.render.api import render
        from riggs_tpu.eval.synthesis import skinning_colors

        cam = self._camera(az, el, radius)
        bg = jnp.zeros(3)
        kwargs = dict(active_sh_degree=self.gs.max_sh_degree, max_per_tile=512)
        if self.skel is not None:
            from riggs_tpu.models import skeleton_warp as SW
            from riggs_tpu.edit.pose_edit import rotate_joint

            pose = SW.pose_at(self.skel, jnp.asarray(float(t)))
            rot = pose["local_rotation"]
            if 0 <= joint < self.skel.net.n_joints and abs(angle) > 1e-3:
                view_axis = np.asarray(cam.w2c)[2, :3]  # camera forward in world
                rot = rotate_joint(rot, int(joint), view_axis, float(np.deg2rad(angle)))
            d = SW.deform_by_pose(self.skel, self.gs.xyz, rot, pose["global_trans"], self.gs.motion_mask)
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
                        )
                    from PIL import Image

                    buf = io.BytesIO()
                    Image.fromarray(np.clip(img * 255, 0, 255).astype(np.uint8)).save(buf, "PNG")
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.end_headers()
                    self.wfile.write(buf.getvalue())
                    return
                self.send_response(404)
                self.end_headers()

        server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
        print(f"viewer at http://localhost:{port}/")
        if blocking:
            server.serve_forever()
        else:
            threading.Thread(target=server.serve_forever, daemon=True).start()
        return server
