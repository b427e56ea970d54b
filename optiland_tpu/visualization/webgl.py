"""Interactive 3D system viewer: self-contained WebGL/HTML export.

Capability analog of the reference's VTK interactive viewer
(reference: optiland/visualization/system/optic_viewer_3d.py:22 — camera
orbit/zoom/pan — and system/interaction.py:18 — pickable surfaces with an
event system). VTK is not installable in this environment, so the
interactive path is a dependency-free WebGL page: ``OpticViewer3DHTML``
extracts the surface meshes and traced ray polylines from the compiled
system and embeds them, together with a hand-written orbit-control +
color-ID-picking renderer, in ONE standalone .html file that any browser
opens offline.

Interaction model (matching the VTK viewer's affordances):
  * left-drag   — orbit the camera around the target
  * wheel       — zoom (dolly)
  * right-drag / shift+left-drag — pan the target in the view plane
  * click a surface — pick: the surface highlights and an info overlay
    shows index / type / radius / conic / material / semi-aperture
    (reference: system/interaction.py pick callbacks)
  * "R" — reset camera

The scene data (meshes, rays, prescriptions) is plain JSON inside the
page, so the export doubles as a machine-readable scene dump.
"""

from __future__ import annotations

import json

import numpy as np

from optiland_tpu.core import geometry as geom_mod
from optiland_tpu.visualization.viewer import _semi_apertures
from optiland_tpu.visualization.viewer3d import Surface3D

_GEOM_NAMES = {
    geom_mod.PLANE: "plane",
    geom_mod.STANDARD: "standard",
    geom_mod.EVEN_ASPHERE: "even_asphere",
    geom_mod.ODD_ASPHERE: "odd_asphere",
    geom_mod.POLYNOMIAL_XY: "polynomial_xy",
    geom_mod.CHEBYSHEV: "chebyshev",
    geom_mod.ZERNIKE_SAG: "zernike",
    geom_mod.TOROIDAL: "toroidal",
    geom_mod.BICONIC: "biconic",
    geom_mod.FORBES_QBFS: "forbes_qbfs",
    geom_mod.GRID_SAG: "grid_sag",
    geom_mod.NURBS: "nurbs",
}
_GEOM_NAMES.setdefault(getattr(geom_mod, "FORBES_Q2D", -1), "forbes_q2d")

_FIELD_COLORS = ["#4477aa", "#ee6677", "#228833", "#ccbb44",
                 "#66ccee", "#aa3377", "#bbbbbb"]


def _grid_mesh(X, Y, Z):
    """Triangulate an (n_t, n_r) surface grid.

    Returns (vertices[N,3], normals[N,3], indices[M]) with z-forward
    optical coordinates kept as (x, y, z).
    """
    nt, nr = X.shape
    V = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    # per-vertex normals from grid partials (central differences)
    dXt = np.gradient(X, axis=0)
    dYt = np.gradient(Y, axis=0)
    dZt = np.gradient(Z, axis=0)
    dXr = np.gradient(X, axis=1)
    dYr = np.gradient(Y, axis=1)
    dZr = np.gradient(Z, axis=1)
    nx = dYt * dZr - dZt * dYr
    ny = dZt * dXr - dXt * dZr
    nz = dXt * dYr - dYt * dXr
    nrm = np.sqrt(nx * nx + ny * ny + nz * nz)
    nrm = np.where(nrm < 1e-12, 1.0, nrm)
    Nv = np.stack([nx / nrm, ny / nrm, nz / nrm], axis=-1).reshape(-1, 3)
    idx = []
    for i in range(nt - 1):
        for j in range(nr - 1):
            a = i * nr + j
            b = a + 1
            c = a + nr
            d = c + 1
            idx.extend((a, c, b, b, c, d))
    return V, Nv, np.asarray(idx, np.uint32)


def _wall_mesh(ring_a, ring_b):
    """Edge wall between two outer rings (each (n_t, 3))."""
    nt = ring_a.shape[0]
    V = np.concatenate([ring_a, ring_b], axis=0)
    # radial-ish outward normals
    ctr_a = ring_a.mean(axis=0)
    ctr_b = ring_b.mean(axis=0)
    Na = ring_a - ctr_a
    Nb = ring_b - ctr_b
    Nrm = np.concatenate([Na, Nb], axis=0)
    ln = np.linalg.norm(Nrm, axis=1, keepdims=True)
    Nrm = Nrm / np.where(ln < 1e-12, 1.0, ln)
    idx = []
    for i in range(nt - 1):
        a, b = i, i + 1
        c, d = nt + i, nt + i + 1
        idx.extend((a, c, b, b, c, d))
    return V, Nrm, np.asarray(idx, np.uint32)


def _round(arr, nd=4):
    return np.round(np.asarray(arr, np.float64), nd).ravel().tolist()


class OpticViewer3DHTML:
    """Interactive WebGL 3D viewer exported as a standalone HTML page
    (reference: visualization/system/optic_viewer_3d.py:22 + the
    InteractionManager pick API of system/interaction.py:18)."""

    def __init__(self, optic):
        self.optic = optic

    # ---------------- scene extraction ----------------

    def _surface_info(self, idx):
        srf = self.optic.surfaces.surfaces[idx]
        cfg = self.optic.system.cfg
        mat = getattr(srf, "material", None)
        info = {
            "index": idx,
            "type": _GEOM_NAMES.get(cfg.geom_codes[idx], "unknown"),
            "radius": float(np.asarray(srf.radius))
            if np.isfinite(np.asarray(srf.radius, float)) else None,
            "conic": float(getattr(srf, "conic", 0.0) or 0.0),
            "thickness": float(np.asarray(srf.thickness))
            if np.isfinite(np.asarray(srf.thickness, float)) else None,
            "material": mat if isinstance(mat, str) else (
                getattr(mat, "name", None) if mat is not None else "air"
            ),
            "is_stop": bool(getattr(srf, "is_stop", False)),
            "reflective": bool(cfg.reflective[idx]),
        }
        return info

    def scene(self, fields="all", wavelengths="primary", num_rays=24,
              distribution="hexapolar"):
        """Extract the JSON-serializable scene dict."""
        optic = self.optic
        cfg = optic.system.cfg
        semis = _semi_apertures(optic)
        from optiland_tpu.materials import AIR

        mats = [s._material_obj for s in optic.surfaces.surfaces]
        n_surf = optic.surfaces.num_surfaces

        meshes = []

        def add_mesh(sid, V, N, I, color, alpha, kind):
            meshes.append({
                "id": int(sid),
                "kind": kind,
                "v": _round(V),
                "n": _round(N, 3),
                "i": np.asarray(I, np.int64).tolist(),
                "color": color,
                "alpha": alpha,
                "info": self._surface_info(sid),
            })

        def surf_grids(idx, semi):
            X, Y, Z = Surface3D(optic, idx, max(semi, 1e-6)).mesh()
            return _grid_mesh(X, Y, Z), (X, Y, Z)

        idx = 1
        while idx < n_surf:
            semi = float(semis[idx]) * 1.1 if idx < len(semis) else 1.0
            if cfg.reflective[idx]:
                (V, N, I), _ = surf_grids(idx, semi)
                add_mesh(idx, V, N, I, "#c9c9cf", 0.95, "mirror")
                idx += 1
            elif idx + 1 < n_surf and mats[idx] is not AIR:
                semi2 = (
                    float(semis[idx + 1]) * 1.1
                    if idx + 1 < len(semis) else semi
                )
                s = max(semi, semi2)
                (Vf, Nf, If), (Xf, Yf, Zf) = surf_grids(idx, s)
                (Vb, Nb, Ib), (Xb, Yb, Zb) = surf_grids(idx + 1, s)
                add_mesh(idx, Vf, Nf, If, "#9eccf2", 0.35, "lens")
                add_mesh(idx + 1, Vb, Nb, Ib, "#9eccf2", 0.35, "lens")
                ring_f = np.stack(
                    [Xf[:, -1], Yf[:, -1], Zf[:, -1]], axis=-1
                )
                ring_b = np.stack(
                    [Xb[:, -1], Yb[:, -1], Zb[:, -1]], axis=-1
                )
                Vw, Nw, Iw = _wall_mesh(ring_f, ring_b)
                add_mesh(idx, Vw, Nw, Iw, "#9eccf2", 0.35, "wall")
                idx += 2
            else:
                (V, N, I), _ = surf_grids(idx, semi)
                if idx < n_surf - 1:
                    add_mesh(idx, V, N, I, "#b0c4d8", 0.15, "surface")
                else:
                    add_mesh(idx, V, N, I, "#666666", 0.30, "image")
                idx += 1

        # traced ray polylines
        if fields == "all":
            fields = optic.fields.get_field_coords()
        if wavelengths == "primary":
            wavelengths = [optic.primary_wavelength]
        elif wavelengths == "all":
            wavelengths = optic.wavelengths.get_wavelengths()
        rays = []
        for fi, (Hx, Hy) in enumerate(fields):
            for wl in wavelengths:
                res = optic.trace(
                    Hx=Hx, Hy=Hy, wavelength=wl, num_rays=num_rays,
                    distribution=distribution,
                )
                xs = np.asarray(res.history["x"])[1:]
                ys = np.asarray(res.history["y"])[1:]
                zs = np.asarray(res.history["z"])[1:]
                ii = np.asarray(res.history["intensity"])[1:]
                n_plot = min(xs.shape[1], 32)
                sel = np.linspace(0, xs.shape[1] - 1, n_plot).astype(int)
                for r in sel:
                    alive = ii[:, r] > 0
                    # keep prefix of surfaces where the ray is alive
                    keep = np.maximum.accumulate(~alive) == 0
                    if keep.sum() < 2:
                        continue
                    rays.append({
                        "field": fi,
                        "color": _FIELD_COLORS[fi % len(_FIELD_COLORS)],
                        "pts": _round(np.stack(
                            [xs[keep, r], ys[keep, r], zs[keep, r]],
                            axis=-1,
                        )),
                    })

        all_pts = np.concatenate(
            [np.asarray(m["v"], float).reshape(-1, 3) for m in meshes]
        )
        lo = all_pts.min(axis=0)
        hi = all_pts.max(axis=0)
        return {
            "meshes": meshes,
            "rays": rays,
            "bounds": {"lo": lo.tolist(), "hi": hi.tolist()},
            "title": type(self.optic).__name__,
        }

    # ---------------- HTML emission ----------------

    def to_html(self, path=None, **scene_kwargs) -> str:
        """Render the scene into a standalone HTML string (and optionally
        write it to ``path``)."""
        scene_json = json.dumps(self.scene(**scene_kwargs))
        html = _PAGE_TEMPLATE.replace("__SCENE_JSON__", scene_json)
        if path is not None:
            with open(path, "w") as fh:
                fh.write(html)
        return html

    def view(self, path=None, open_browser=False, **scene_kwargs) -> str:
        """Write the interactive page and (optionally) open it.

        Returns the file path. Headless-safe: with ``open_browser=False``
        nothing is launched.
        """
        import tempfile
        import webbrowser

        if path is None:
            path = tempfile.mktemp(suffix="_optic3d.html")
        self.to_html(path, **scene_kwargs)
        if open_browser:  # pragma: no cover - needs a display
            webbrowser.open("file://" + path)
        return path


_PAGE_TEMPLATE = r"""<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>optiland_tpu 3D viewer</title>
<style>
  html, body { margin:0; height:100%; overflow:hidden;
               background:#16181d; font-family:system-ui,sans-serif; }
  #gl { width:100%; height:100%; display:block; cursor:grab; }
  #hud { position:absolute; top:10px; left:12px; color:#aab;
         font-size:12px; pointer-events:none; }
  #info { position:absolute; bottom:12px; left:12px; color:#dde;
          background:rgba(25,28,36,.88); border:1px solid #445;
          border-radius:6px; padding:8px 12px; font-size:12px;
          display:none; max-width:320px; }
  #info b { color:#8cf; }
</style>
</head>
<body>
<canvas id="gl"></canvas>
<div id="hud"></div>
<div id="info"></div>
<script>
"use strict";
const SCENE = __SCENE_JSON__;

// ---------- tiny mat4 ----------
function mat4mul(a,b){const o=new Float32Array(16);
 for(let i=0;i<4;i++)for(let j=0;j<4;j++){let s=0;
  for(let k=0;k<4;k++)s+=a[k*4+j]*b[i*4+k];o[i*4+j]=s;}return o;}
function perspective(fov,asp,n,f){const t=1/Math.tan(fov/2);
 return new Float32Array([t/asp,0,0,0, 0,t,0,0,
  0,0,(f+n)/(n-f),-1, 0,0,2*f*n/(n-f),0]);}
function lookAt(eye,ctr,up){
 let z=[eye[0]-ctr[0],eye[1]-ctr[1],eye[2]-ctr[2]];
 let zl=Math.hypot(...z);z=z.map(v=>v/zl);
 let x=[up[1]*z[2]-up[2]*z[1],up[2]*z[0]-up[0]*z[2],up[0]*z[1]-up[1]*z[0]];
 let xl=Math.hypot(...x)||1;x=x.map(v=>v/xl);
 const y=[z[1]*x[2]-z[2]*x[1],z[2]*x[0]-z[0]*x[2],z[0]*x[1]-z[1]*x[0]];
 return new Float32Array([x[0],y[0],z[0],0, x[1],y[1],z[1],0,
  x[2],y[2],z[2],0,
  -(x[0]*eye[0]+x[1]*eye[1]+x[2]*eye[2]),
  -(y[0]*eye[0]+y[1]*eye[1]+y[2]*eye[2]),
  -(z[0]*eye[0]+z[1]*eye[1]+z[2]*eye[2]),1]);}
function hex2rgb(h){return [parseInt(h.slice(1,3),16)/255,
 parseInt(h.slice(3,5),16)/255,parseInt(h.slice(5,7),16)/255];}

// ---------- GL setup ----------
const canvas=document.getElementById("gl");
const gl=canvas.getContext("webgl",{antialias:true,preserveDrawingBuffer:true});
function compile(vsrc,fsrc){
 function sh(t,s){const o=gl.createShader(t);gl.shaderSource(o,s);
  gl.compileShader(o);
  if(!gl.getShaderParameter(o,gl.COMPILE_STATUS))
   throw gl.getShaderInfoLog(o);return o;}
 const p=gl.createProgram();
 gl.attachShader(p,sh(gl.VERTEX_SHADER,vsrc));
 gl.attachShader(p,sh(gl.FRAGMENT_SHADER,fsrc));
 gl.linkProgram(p);return p;}

const meshProg=compile(`
 attribute vec3 aPos; attribute vec3 aNrm;
 uniform mat4 uMVP; uniform mat4 uView;
 varying vec3 vN; varying vec3 vP;
 void main(){ gl_Position=uMVP*vec4(aPos,1.0);
  vN=aNrm; vP=aPos; }`,`
 precision mediump float;
 varying vec3 vN; varying vec3 vP;
 uniform vec3 uColor; uniform float uAlpha;
 uniform vec3 uEye; uniform float uFlat;
 void main(){
  vec3 N=normalize(vN);
  vec3 L=normalize(uEye-vP);
  float d=abs(dot(N,L));
  vec3 c=uFlat>0.5 ? uColor : uColor*(0.35+0.65*d);
  gl_FragColor=vec4(c,uAlpha);}`);

const lineProg=compile(`
 attribute vec3 aPos; uniform mat4 uMVP;
 void main(){ gl_Position=uMVP*vec4(aPos,1.0); }`,`
 precision mediump float; uniform vec3 uColor;
 void main(){ gl_FragColor=vec4(uColor,0.85); }`);

// ---------- buffers ----------
function buf(target,data){const b=gl.createBuffer();
 gl.bindBuffer(target,b);gl.bufferData(target,data,gl.STATIC_DRAW);return b;}
const meshes=SCENE.meshes.map(m=>({
 id:m.id, info:m.info, kind:m.kind,
 color:hex2rgb(m.color), alpha:m.alpha,
 vb:buf(gl.ARRAY_BUFFER,new Float32Array(m.v)),
 nb:buf(gl.ARRAY_BUFFER,new Float32Array(m.n)),
 ib:buf(gl.ELEMENT_ARRAY_BUFFER,new Uint16Array(m.i)),
 count:m.i.length, picked:false}));
const rays=SCENE.rays.map(r=>({
 color:hex2rgb(r.color),
 vb:buf(gl.ARRAY_BUFFER,new Float32Array(r.pts)),
 count:r.pts.length/3}));

// ---------- camera (orbit/zoom/pan, reference: VTK interactor) ----------
const lo=SCENE.bounds.lo, hi=SCENE.bounds.hi;
const ctr0=[(lo[0]+hi[0])/2,(lo[1]+hi[1])/2,(lo[2]+hi[2])/2];
const diag=Math.hypot(hi[0]-lo[0],hi[1]-lo[1],hi[2]-lo[2])||1;
let cam={theta:1.1, phi:0.35, r:diag*1.6, ctr:ctr0.slice()};
function camReset(){cam={theta:1.1,phi:0.35,r:diag*1.6,ctr:ctr0.slice()};}
function eyePos(){
 // optical axis is +z; orbit around it
 const ct=Math.cos(cam.theta),st=Math.sin(cam.theta);
 const cp=Math.cos(cam.phi),sp=Math.sin(cam.phi);
 return [cam.ctr[0]+cam.r*cp*st, cam.ctr[1]+cam.r*sp,
         cam.ctr[2]+cam.r*cp*ct];}

let drag=null;
canvas.addEventListener("mousedown",e=>{
 drag={x:e.clientX,y:e.clientY,btn:e.button,shift:e.shiftKey,moved:false};
 canvas.style.cursor="grabbing";});
window.addEventListener("mouseup",e=>{
 if(drag&&!drag.moved&&drag.btn===0)pick(e.clientX,e.clientY);
 drag=null;canvas.style.cursor="grab";});
window.addEventListener("mousemove",e=>{
 if(!drag)return;
 const dx=e.clientX-drag.x, dy=e.clientY-drag.y;
 if(Math.abs(dx)+Math.abs(dy)>3)drag.moved=true;
 if(drag.btn===2||drag.shift){
  // pan in view plane
  const s=cam.r*0.0016;
  const ct=Math.cos(cam.theta),st=Math.sin(cam.theta);
  const right=[ct,0,-st];
  const cp=Math.cos(cam.phi),sp=Math.sin(cam.phi);
  const up=[-sp*st,cp,-sp*ct];
  for(let k=0;k<3;k++)cam.ctr[k]+=(-dx*right[k]+dy*up[k])*s;
 }else{
  cam.theta-=dx*0.008; cam.phi+=dy*0.008;
  cam.phi=Math.max(-1.45,Math.min(1.45,cam.phi));
 }
 drag.x=e.clientX;drag.y=e.clientY;render();});
canvas.addEventListener("wheel",e=>{
 e.preventDefault();
 cam.r*=Math.exp(e.deltaY*0.0012);
 cam.r=Math.max(diag*0.1,Math.min(diag*12,cam.r));render();});
canvas.addEventListener("contextmenu",e=>e.preventDefault());
window.addEventListener("keydown",e=>{
 if(e.key==="r"||e.key==="R"){camReset();render();}});

// ---------- picking via color-ID framebuffer ----------
function idColor(i){return [((i+1)&255)/255,(((i+1)>>8)&255)/255,0];}
function pick(cx,cy){
 const rect=canvas.getBoundingClientRect();
 const px=(cx-rect.left)*canvas.width/rect.width;
 const py=canvas.height-(cy-rect.top)*canvas.height/rect.height;
 drawScene(true);
 const data=new Uint8Array(4);
 gl.readPixels(px|0,py|0,1,1,gl.RGBA,gl.UNSIGNED_BYTE,data);
 const id=data[0]+(data[1]<<8)-1;
 meshes.forEach(m=>m.picked=false);
 const hit=meshes.filter(m=>meshes.indexOf(m)===id)[0];
 const info=document.getElementById("info");
 if(hit){
  hit.picked=true;
  const i=hit.info;
  info.style.display="block";
  info.innerHTML="<b>surface "+i.index+"</b> ("+hit.kind+")<br>"+
   "type: "+i.type+"<br>"+
   "radius: "+(i.radius===null?"&infin;":i.radius.toFixed(4))+
   " &nbsp; conic: "+i.conic.toFixed(4)+"<br>"+
   "thickness: "+(i.thickness===null?"&infin;":i.thickness.toFixed(4))+
   " &nbsp; material: "+(i.material||"air")+
   (i.is_stop?"<br><b>aperture stop</b>":"")+
   (i.reflective?"<br>reflective":"");
 }else{ info.style.display="none"; }
 render();
}

// ---------- draw ----------
function drawScene(forPick){
 const w=canvas.clientWidth,h=canvas.clientHeight;
 if(canvas.width!==w||canvas.height!==h){canvas.width=w;canvas.height=h;}
 gl.viewport(0,0,canvas.width,canvas.height);
 gl.clearColor(forPick?0:0.086,forPick?0:0.094,forPick?0:0.113,1);
 gl.clear(gl.COLOR_BUFFER_BIT|gl.DEPTH_BUFFER_BIT);
 gl.enable(gl.DEPTH_TEST);
 const eye=eyePos();
 const view=lookAt(eye,cam.ctr,[0,1,0]);
 const proj=perspective(0.7,canvas.width/canvas.height,
                        diag*0.01,diag*40);
 const mvp=mat4mul(proj,view);

 // rays first (opaque lines), skipped in pick pass
 if(!forPick){
  gl.useProgram(lineProg);
  gl.uniformMatrix4fv(gl.getUniformLocation(lineProg,"uMVP"),false,mvp);
  const aP=gl.getAttribLocation(lineProg,"aPos");
  gl.enableVertexAttribArray(aP);
  for(const r of rays){
   gl.bindBuffer(gl.ARRAY_BUFFER,r.vb);
   gl.vertexAttribPointer(aP,3,gl.FLOAT,false,0,0);
   gl.uniform3fv(gl.getUniformLocation(lineProg,"uColor"),r.color);
   gl.drawArrays(gl.LINE_STRIP,0,r.count);
  }
 }

 gl.useProgram(meshProg);
 gl.uniformMatrix4fv(gl.getUniformLocation(meshProg,"uMVP"),false,mvp);
 gl.uniform3fv(gl.getUniformLocation(meshProg,"uEye"),eye);
 gl.uniform1f(gl.getUniformLocation(meshProg,"uFlat"),forPick?1:0);
 const aPos=gl.getAttribLocation(meshProg,"aPos");
 const aNrm=gl.getAttribLocation(meshProg,"aNrm");
 gl.enableVertexAttribArray(aPos);
 gl.enableVertexAttribArray(aNrm);
 const ordered=meshes.slice().sort((a,b)=>b.alpha-a.alpha);
 for(const m of ordered){
  gl.bindBuffer(gl.ARRAY_BUFFER,m.vb);
  gl.vertexAttribPointer(aPos,3,gl.FLOAT,false,0,0);
  gl.bindBuffer(gl.ARRAY_BUFFER,m.nb);
  gl.vertexAttribPointer(aNrm,3,gl.FLOAT,false,0,0);
  gl.bindBuffer(gl.ELEMENT_ARRAY_BUFFER,m.ib);
  if(forPick){
   gl.disable(gl.BLEND);
   gl.uniform3fv(gl.getUniformLocation(meshProg,"uColor"),
                 idColor(meshes.indexOf(m)));
   gl.uniform1f(gl.getUniformLocation(meshProg,"uAlpha"),1.0);
  }else{
   gl.enable(gl.BLEND);
   gl.blendFunc(gl.SRC_ALPHA,gl.ONE_MINUS_SRC_ALPHA);
   const c=m.picked?[1.0,0.78,0.25]:m.color;
   gl.uniform3fv(gl.getUniformLocation(meshProg,"uColor"),c);
   gl.uniform1f(gl.getUniformLocation(meshProg,"uAlpha"),
                m.picked?Math.max(m.alpha,0.75):m.alpha);
  }
  gl.drawElements(gl.TRIANGLES,m.count,gl.UNSIGNED_SHORT,0);
 }
}
function render(){drawScene(false);}
document.getElementById("hud").textContent=
 SCENE.title+" — drag: orbit · wheel: zoom · right-drag: pan · "+
 "click: pick surface · R: reset";
window.addEventListener("resize",render);
render();
</script>
</body>
</html>
"""

__all__ = ["OpticViewer3DHTML"]
