"""Live interactive map viewer over HTTP (the rebuild's stand-in for the
reference's Pangolin window, ref src/Viewer.cc + MapDrawer.cc — this box has
no GL, so the browser is the render client).

Serves a self-contained WebGL page (no external JS) that polls
``/state.json`` once a second and draws:

  * the camera trajectory (``FrameTrajectory.txt``, TUM format) as a line
  * the sparse map cloud (``map_points.txt``, one ``x y z`` per line)
  * object cuboids (``objects.txt``: ``id class t q a1 a2 a3``)
  * NeRF meshes (``<objId>/obj.ply``) as wireframe + vertex-color points

mono_tum --live-dump N rewrites these files every N frames, making the page
a live view of a running session; pointed at a finished output directory it
is a replay/inspection tool.

CLI: python -m romap_tpu.utils.webviewer <out_dir> [--port 8642]
"""

from __future__ import annotations

import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>romap_tpu map viewer</title>
<style>
 body{margin:0;background:#101014;color:#cfcfd8;font:13px sans-serif;overflow:hidden}
 #hud{position:fixed;left:10px;top:8px;pointer-events:none;line-height:1.5}
 .sw{display:inline-block;width:10px;height:10px;margin-right:6px;border-radius:2px}
</style></head>
<body>
<canvas id="c"></canvas>
<div id="hud">
 <div><span class="sw" style="background:#58a6ff"></span>trajectory
      <span class="sw" style="background:#8b949e;margin-left:10px"></span>map points
      <span class="sw" style="background:#f0883e;margin-left:10px"></span>cuboids
      <span class="sw" style="background:#3fb950;margin-left:10px"></span>meshes</div>
 <div id="stats"></div>
 <div style="opacity:.6">drag orbit &middot; wheel zoom &middot; shift-drag pan</div>
</div>
<img id="frame" style="position:fixed;right:10px;top:8px;max-width:320px;
 border:1px solid #333;border-radius:4px;display:none" alt="">
<script>
// current-frame overlay (keypoints + detections), the FrameDrawer panel:
// refresh frame.jpg while the producer keeps rewriting it
const fimg=document.getElementById('frame');
setInterval(()=>{const probe=new Image();
 probe.onload=()=>{fimg.src=probe.src;fimg.style.display='block';};
 probe.onerror=()=>{fimg.style.display='none';};
 probe.src='/frame.jpg?'+Date.now();},1000);
</script>
<script>
const cv=document.getElementById('c');const gl=cv.getContext('webgl');
const VS=`attribute vec3 p;attribute vec3 col;uniform mat4 mvp;uniform float ps;
 varying vec3 vc;void main(){gl_Position=mvp*vec4(p,1.);gl_PointSize=ps;vc=col;}`;
const FS=`precision mediump float;varying vec3 vc;void main(){gl_FragColor=vec4(vc,1.);}`;
function sh(t,s){const o=gl.createShader(t);gl.shaderSource(o,s);gl.compileShader(o);return o;}
const pr=gl.createProgram();gl.attachShader(pr,sh(gl.VERTEX_SHADER,VS));
gl.attachShader(pr,sh(gl.FRAGMENT_SHADER,FS));gl.linkProgram(pr);gl.useProgram(pr);
const locP=gl.getAttribLocation(pr,'p'),locC=gl.getAttribLocation(pr,'col');
const locM=gl.getUniformLocation(pr,'mvp'),locS=gl.getUniformLocation(pr,'ps');
gl.enableVertexAttribArray(locP);gl.enableVertexAttribArray(locC);
gl.enable(gl.DEPTH_TEST);
let bufs=[];  // {vbo, n, mode, ps}
function setBuf(verts,cols,mode,ps){
 const v=new Float32Array(verts.length*2);
 for(let i=0;i<verts.length/3;i++){v.set(verts.slice(3*i,3*i+3),6*i);v.set(cols.slice(3*i,3*i+3),6*i+3);}
 const b=gl.createBuffer();gl.bindBuffer(gl.ARRAY_BUFFER,b);
 gl.bufferData(gl.ARRAY_BUFFER,v,gl.STATIC_DRAW);
 bufs.push({vbo:b,n:verts.length/3,mode:mode,ps:ps||1});}
// --- tiny mat4 ---
function mul(a,b){const o=new Float32Array(16);for(let i=0;i<4;i++)for(let j=0;j<4;j++){let s=0;for(let k=0;k<4;k++)s+=a[k*4+j]*b[i*4+k];o[i*4+j]=s;}return o;}
function persp(f,asp,n,fr){const t=1/Math.tan(f/2);return new Float32Array([t/asp,0,0,0,0,t,0,0,0,0,(fr+n)/(n-fr),-1,0,0,2*fr*n/(n-fr),0]);}
function lookAt(e,c,u){
 let z=[e[0]-c[0],e[1]-c[1],e[2]-c[2]];let zl=Math.hypot(...z);z=z.map(v=>v/zl);
 let x=[u[1]*z[2]-u[2]*z[1],u[2]*z[0]-u[0]*z[2],u[0]*z[1]-u[1]*z[0]];
 let xl=Math.hypot(...x);x=x.map(v=>v/xl);
 const y=[z[1]*x[2]-z[2]*x[1],z[2]*x[0]-z[0]*x[2],z[0]*x[1]-z[1]*x[0]];
 return new Float32Array([x[0],y[0],z[0],0,x[1],y[1],z[1],0,x[2],y[2],z[2],0,
  -(x[0]*e[0]+x[1]*e[1]+x[2]*e[2]),-(y[0]*e[0]+y[1]*e[1]+y[2]*e[2]),-(z[0]*e[0]+z[1]*e[1]+z[2]*e[2]),1]);}
// --- orbit state ---
let az=0.8,el=0.5,dist=8,tgt=[0,0,4];
cv.onmousedown=e=>{const sx=e.clientX,sy=e.clientY,a0=az,e0=el,t0=tgt.slice(),shift=e.shiftKey;
 document.onmousemove=m=>{const dx=(m.clientX-sx)/200,dy=(m.clientY-sy)/200;
  if(shift){const s=dist*0.3;tgt=[t0[0]-dx*s*Math.cos(a0),t0[1]+dy*s,t0[2]+dx*s*Math.sin(a0)];}
  else{az=a0+dx;el=Math.max(-1.5,Math.min(1.5,e0+dy));}};
 document.onmouseup=()=>document.onmousemove=null;};
cv.onwheel=e=>{dist*=Math.exp(e.deltaY*0.001);e.preventDefault();};
function draw(){
 cv.width=innerWidth;cv.height=innerHeight;gl.viewport(0,0,cv.width,cv.height);
 gl.clearColor(0.063,0.063,0.078,1);gl.clear(gl.COLOR_BUFFER_BIT|gl.DEPTH_BUFFER_BIT);
 const eye=[tgt[0]+dist*Math.cos(el)*Math.sin(az),tgt[1]+dist*Math.sin(el),
            tgt[2]+dist*Math.cos(el)*Math.cos(az)];
 const mvp=mul(persp(0.9,cv.width/cv.height,0.05,500),lookAt(eye,tgt,[0,-1,0]));
 gl.uniformMatrix4fv(locM,false,mvp);
 for(const b of bufs){gl.bindBuffer(gl.ARRAY_BUFFER,b.vbo);
  gl.vertexAttribPointer(locP,3,gl.FLOAT,false,24,0);
  gl.vertexAttribPointer(locC,3,gl.FLOAT,false,24,12);
  gl.uniform1f(locS,b.ps);gl.drawArrays(b.mode,0,b.n);}
 requestAnimationFrame(draw);}
draw();
async function poll(){
 try{
  const s=await (await fetch('state.json')).json();
  for(const b of bufs)gl.deleteBuffer(b.vbo);bufs=[];
  if(s.traj.length)setBuf(s.traj.flat(),s.traj.flat().map(()=>0).map((_,i)=>[0.35,0.65,1][i%3]),gl.LINE_STRIP);
  if(s.points.length)setBuf(s.points.flat(),s.points.flat().map((_,i)=>0.57),gl.POINTS,2);
  for(const e of s.cuboid_edges){setBuf(e.flat(),e.flat().map((_,i)=>[0.94,0.53,0.24][i%3]),gl.LINES);}
  for(const m of s.meshes){
   setBuf(m.verts.flat(),m.colors.flat(),gl.POINTS,3);
   if(m.edges.length)setBuf(m.edges.flat(),m.edges.flat().map(()=>0.25),gl.LINES);}
  document.getElementById('stats').textContent=
   `${s.traj.length} poses | ${s.points.length} map pts | `+
   `${s.cuboid_edges.length} objects | ${s.meshes.length} meshes (${s.stamp})`;
 }catch(e){}
 setTimeout(poll,1000);}
poll();
</script></body></html>
"""

_CUBE_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7), (6, 7),
               (0, 4), (1, 5), (2, 6), (3, 7)]


def _read_xyz(path: str, max_n: int = 60000) -> list:
    if not os.path.exists(path):
        return []
    rows = []
    for ln in open(path):
        p = ln.split()
        if len(p) >= 3:
            rows.append([float(p[0]), float(p[1]), float(p[2])])
    if len(rows) > max_n:
        rows = rows[:: len(rows) // max_n + 1]
    return rows


def build_state(out_dir: str) -> dict:
    from romap_tpu.utils.camera import quat_to_rot
    from romap_tpu.utils.mesh_io import load_ply

    state = {"traj": [], "points": [], "cuboid_edges": [], "meshes": [],
             "stamp": time.strftime("%H:%M:%S")}
    tj = os.path.join(out_dir, "FrameTrajectory.txt")
    if os.path.exists(tj):
        for ln in open(tj):
            p = ln.split()
            if len(p) >= 8 and not ln.startswith("#"):
                state["traj"].append([float(p[1]), float(p[2]), float(p[3])])
    state["points"] = _read_xyz(os.path.join(out_dir, "map_points.txt"))

    objp = os.path.join(out_dir, "objects.txt")
    obj_ids = []
    if os.path.exists(objp):
        for ln in open(objp):
            p = [float(x) for x in ln.split()]
            if len(p) < 12:
                continue
            obj_ids.append(int(p[0]))
            t, q, half = p[2:5], p[5:9], p[9:12]
            r = quat_to_rot(*q)
            corners = []
            for k in range(8):
                local = np.array([half[0] if k & 1 else -half[0],
                                  half[1] if k & 2 else -half[1],
                                  half[2] if k & 4 else -half[2]])
                corners.append((r @ local + np.asarray(t)).tolist())
            edges = []
            for a, b in _CUBE_EDGES:
                edges += [corners[a], corners[b]]
            state["cuboid_edges"].append(edges)

    for oid in obj_ids or range(8):
        mp = os.path.join(out_dir, str(oid), "obj.ply")
        if not os.path.exists(mp):
            continue
        try:
            mesh = load_ply(mp)
        except Exception:
            continue
        step = max(1, len(mesh.verts) // 8000)
        verts = mesh.verts[::step]
        cols = (mesh.colors[::step] if mesh.colors is not None
                else np.ones_like(verts))
        edges = []
        fstep = max(1, len(mesh.faces) // 3000)
        for f in mesh.faces[::fstep]:
            edges += [mesh.verts[f[0]].tolist(), mesh.verts[f[1]].tolist()]
        state["meshes"].append({"verts": verts.tolist(),
                                "colors": np.clip(cols, 0, 1).tolist(),
                                "edges": edges})
    return state


class _Handler(BaseHTTPRequestHandler):
    out_dir = "."
    _cache: tuple[float, bytes] = (0.0, b"")

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            body = _PAGE.encode()
            ctype = "text/html"
        elif self.path.startswith("/state.json"):
            now = time.time()
            if now - _Handler._cache[0] > 0.9:
                try:
                    body = json.dumps(build_state(_Handler.out_dir)).encode()
                except Exception as e:
                    body = json.dumps({"error": str(e), "traj": [], "points": [],
                                       "cuboid_edges": [], "meshes": [],
                                       "stamp": ""}).encode()
                _Handler._cache = (now, body)
            body = _Handler._cache[1]
            ctype = "application/json"
        elif self.path.startswith("/frame.jpg"):
            # live current-frame overlay written by mono_tum's dump_frame
            path = os.path.join(_Handler.out_dir, "frame.jpg")
            try:
                with open(path, "rb") as f:
                    body = f.read()
            except OSError:
                self.send_response(404)
                self.end_headers()
                return
            ctype = "image/jpeg"
        else:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def serve(out_dir: str, port: int = 8642, background: bool = False,
          host: str = "127.0.0.1"):
    # loopback by default: the artifact tree (trajectory, map, meshes) should
    # not be exposed network-wide unless the user passes --host explicitly
    _Handler.out_dir = out_dir
    srv = ThreadingHTTPServer((host, port), _Handler)
    if background:
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv
    print(f"viewer: http://localhost:{port}/  (dir: {out_dir})")
    srv.serve_forever()


def cli():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--port", type=int, default=8642)
    ap.add_argument("--host", default="127.0.0.1",
                    help="bind address (0.0.0.0 to expose on the network)")
    args = ap.parse_args()
    serve(args.out_dir, args.port, host=args.host)


if __name__ == "__main__":
    cli()
