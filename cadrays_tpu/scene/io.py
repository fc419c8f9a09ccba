"""Scene export/import: serialize a Session to a re-runnable script + assets.

Capability contract (reference ie::ImportExport, ImportExport.cxx:350-612):
export writes a directory with `model.tcl` + `meshes/*.ply` +
`textures/*` such that sourcing the script reconstructs the scene —
shapes, full vbsdf material dumps, transforms, hierarchy (rtgroup),
camera, env map and lights. That *is* the checkpoint format (SURVEY.md §5
"checkpoint/resume"). Here the script is our command language
(cli/commands.py), file `model.crt`; meshes go to binary PLY.
"""
from __future__ import annotations

import os
import shutil
from typing import List

import numpy as np

from cadrays_tpu.core.bsdf import Material
from cadrays_tpu.core.camera import ORTHOGRAPHIC
from cadrays_tpu.core.fresnel import (
    FRESNEL_CONDUCTOR,
    FRESNEL_CONSTANT,
    FRESNEL_DIELECTRIC,
    FRESNEL_SCHLICK,
)
from cadrays_tpu.core.tonemap import TONE_FILMIC
from cadrays_tpu.geometry.loaders.ply import save_ply
from cadrays_tpu.integrator.params import RenderMode
from cadrays_tpu.scene.model import DataNode
from cadrays_tpu.utils.image import write_hdr


def _fmt(x) -> str:
    return f"{float(x):.6g}"


def _fmt3(v) -> str:
    a = np.asarray(v).reshape(-1)
    return " ".join(_fmt(x) for x in a[:3])


def _fresnel_str(ftype: int, fparams: np.ndarray) -> str:
    p = np.asarray(fparams).reshape(-1)
    if ftype == FRESNEL_CONSTANT:
        return f"Constant {_fmt(p[0])}"
    if ftype == FRESNEL_SCHLICK:
        return f"Schlick {_fmt(p[0])} {_fmt(p[1])} {_fmt(p[2])}"
    if ftype == FRESNEL_CONDUCTOR:
        return f"Conductor {_fmt(p[0])} {_fmt(p[1])}"
    return f"Dielectric {_fmt(p[0])}"


def bsdf_commands(name: str, m: Material) -> List[str]:
    """Full lobe dump — mirrors ImportExport.cxx:155-231 flag-for-flag."""
    out = [
        f"vbsdf {name} -Kc {_fmt3(m.kc)}",
        f"vbsdf {name} -Kd {_fmt3(m.kd)}",
        f"vbsdf {name} -Ks {_fmt3(m.ks)}",
        f"vbsdf {name} -Kt {_fmt3(m.kt)}",
        f"vbsdf {name} -baseRoughness {_fmt(np.asarray(m.base_rough)[0])}",
        f"vbsdf {name} -coatRoughness {_fmt(np.asarray(m.coat_rough)[0])}",
        f"vbsdf {name} -Le {_fmt3(m.le)}",
        f"vbsdf {name} -absorpColor {_fmt3(m.absorp_color)}",
        f"vbsdf {name} -absorpCoeff {_fmt(np.asarray(m.absorp_coeff)[0])}",
        f"vbsdf {name} -coatFresnel "
        + _fresnel_str(int(np.asarray(m.coat_ftype)[0]), m.coat_fparams),
        f"vbsdf {name} -baseFresnel "
        + _fresnel_str(int(np.asarray(m.base_ftype)[0]), m.base_fparams),
    ]
    return out


def _transform_commands(name: str, node: DataNode) -> List[str]:
    """Decompose the node transform into -rotation quat / -scale /
    -location (ImportExport.cxx:276-305 serialization shape)."""
    m = np.asarray(node.transform, np.float64)
    loc = m[:3, 3]
    rs = m[:3, :3]
    scale = float(np.cbrt(max(np.linalg.det(rs), 1e-12)))
    r = rs / scale
    # rotation matrix -> quaternion
    tr = np.trace(r)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        qw = 0.25 * s
        qx = (r[2, 1] - r[1, 2]) / s
        qy = (r[0, 2] - r[2, 0]) / s
        qz = (r[1, 0] - r[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(r)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + r[i, i] - r[j, j] - r[k, k], 1e-12)) * 2
        q = [0.0, 0.0, 0.0]
        q[i] = 0.25 * s
        q[j] = (r[j, i] + r[i, j]) / s
        q[k] = (r[k, i] + r[i, k]) / s
        qw = (r[k, j] - r[j, k]) / s
        qx, qy, qz = q
    out = []
    out.append(f"vlocation {name} -rotation {_fmt(qx)} {_fmt(qy)} "
               f"{_fmt(qz)} {_fmt(qw)}")
    if abs(scale - 1.0) > 1e-6:
        out.append(f"vlocation {name} -scale {_fmt(scale)}")
    out.append(f"vlocation {name} -setLocation {_fmt3(loc)}")
    return out


def export_scene(session, directory: str,
                 save_accumulator: bool = False,
                 draw_compat: bool = False) -> str:
    """Write `<dir>/model.crt` + assets; returns the script path.

    Nodes displayed from the modeling kernel (or `restore`) carry their
    parametric shape and are persisted as `shapes/<name>.brep` +
    `restore` lines instead of baked triangles
    (ImportExport.cxx:69-81); meshes and curved shapes fall back to PLY.
    draw_compat=True writes ONLY shapes + display + materials (no
    meshes, groups, textures, view) so the script loads in a bare DRAW
    session — ImportExport.cxx:124-128 parity."""
    os.makedirs(directory, exist_ok=True)
    mesh_dir = os.path.join(directory, "meshes")
    os.makedirs(mesh_dir, exist_ok=True)
    sc = session.scene
    lines: List[str] = ["# cadrays_tpu scene export", "vclear",
                       "vlight clear"]

    # lights (ImportExport.cxx:530-607)
    for lt in sc.lights:
        kind = "directional" if int(np.asarray(lt.kind)[0]) == 0 \
            else "positional"
        key = "dir" if kind == "directional" else "pos"
        head = " head 1" if float(np.asarray(lt.headlight)[0]) > 0 else ""
        lines.append(
            f"vlight add {kind}{head} {key} {_fmt3(lt.vec)} "
            f"sm {_fmt(np.asarray(lt.smooth)[0])} "
            f"int {_fmt(np.asarray(lt.intensity)[0])} "
            f"color {_fmt3(lt.color)}")

    # nodes: leaves as PLY + vdisplay + vbsdf + transform; groups by rtgroup
    group_cmds: List[str] = []
    exported_tex: dict = {}  # tid -> exported relative name

    def export_texture(tid: int) -> str:
        """Copy/encode texture `tid` into textures/, once, collision-safe
        (two sources sharing a basename must not overwrite each other —
        TextureManager unique-name registry, TextureManager.cxx:63-152)."""
        if tid in exported_tex:
            return exported_tex[tid]
        tex_dir = os.path.join(directory, "textures")
        os.makedirs(tex_dir, exist_ok=True)
        key = next((k for k, t in sc._texture_ids.items() if t == tid), None)
        if key is not None and os.path.isfile(key):
            base = os.path.basename(key)
            tname = "textures/" + base
            if tname in exported_tex.values():
                tname = f"textures/tex_{tid}_{base}"
            shutil.copyfile(key, os.path.join(directory, tname))
        else:
            tname = f"textures/tex_{tid}.hdr"
            write_hdr(os.path.join(directory, tname), sc._textures[tid])
        exported_tex[tid] = tname
        return tname

    def export_shape(node: DataNode) -> bool:
        """Persist the node's parametric shape as .brep; False when the
        shape has curved faces (caller falls back to PLY)."""
        shape = getattr(node, "source_shape", None)
        if shape is None:
            return False
        from cadrays_tpu.geometry.brep_writer import save_brep

        shape_dir = os.path.join(directory, "shapes")
        os.makedirs(shape_dir, exist_ok=True)
        fname = f"shapes/{node.name}.brep"
        if not save_brep(shape, os.path.join(directory, fname)):
            return False
        lines.append(f"restore {fname} {node.name}")
        lines.append(f"vdisplay {node.name}")
        return True

    def walk(node: DataNode):
        child_names = []
        for c in node.children:
            child_names.extend(walk(c))
        def emit_textures(node):
            scale = float(np.asarray(node.material.uv_scale)[0])
            tid = int(np.asarray(node.material.tex_id)[0])
            if tid >= 0 and not draw_compat:
                lines.append(f"rttexture {node.name} {export_texture(tid)} "
                             f"-scale {_fmt(scale)}")
            ks_tid = int(np.asarray(node.material.ks_tex_id)[0])
            if ks_tid >= 0 and not draw_compat:
                lines.append(
                    f"rttexture {node.name} {export_texture(ks_tid)} "
                    f"-scale {_fmt(scale)} -ks")

        if node.mesh is not None:
            if export_shape(node):
                if not node.visible:
                    lines.append(f"rterase {node.name}")
                lines.extend(bsdf_commands(node.name, node.material))
                emit_textures(node)
                lines.extend(_transform_commands(node.name, node))
                return [node.name]
            if draw_compat:
                return []  # DRAW-compat drops mesh nodes entirely
            fname = f"meshes/{node.name}.ply"
            save_ply(os.path.join(directory, fname), node.mesh)
            lines.append(f"rtmeshread {fname} {node.name} -group")
            if not node.visible:
                lines.append(f"rterase {node.name}")
            lines.extend(bsdf_commands(node.name, node.material))
            emit_textures(node)
            lines.extend(_transform_commands(node.name, node))
            return [node.name]
        if child_names and node.parent is not None:
            group_cmds.append("rtgroup " + " ".join(child_names)
                              + f" -name {node.name}")
            # group-node transforms must survive the round-trip
            # (ImportExport.cxx:276-305 applies to every node)
            if not np.allclose(node.transform, np.eye(4), atol=1e-12):
                group_cmds.extend(_transform_commands(node.name, node))
            # inner groups are children of their parent group: return the
            # group NAME so nesting and cumulative transforms round-trip
            # (inner rtgroup lines are emitted first — depth-first walk)
            return [node.name]
        return child_names

    for root in (sc.model.shapes_root, sc.model.meshes_root):
        for top in root.children:
            walk(top)
    if not draw_compat:
        lines.extend(group_cmds)
        # material link groups survive the round-trip
        # (MaterialEditor.cxx:512-529 shared-aspect semantics)
        for grp in sc.model.link_groups():
            lines.append("rtmatlink " + " ".join(grp))

    # environment (ImportExport.cxx:501-511)
    if sc.envmap is not None and not draw_compat:
        env_path = os.path.join(directory, "textures")
        os.makedirs(env_path, exist_ok=True)
        write_hdr(os.path.join(env_path, "environment.hdr"),
                  np.asarray(sc.envmap.image))
        lines.append("vtextureenv on textures/environment.hdr")
        if not sc.envmap.background:
            lines.append("vbackground -env 0")

    if draw_compat:
        # DRAW-compatible script: shapes + materials only
        # (ImportExport.cxx:124-128 drops meshes/hierarchy/view state)
        script = os.path.join(directory, "model.crt")
        with open(script, "w") as f:
            f.write("\n".join(lines) + "\n")
        return script

    # camera (ImportExport.cxx:436-499)
    cam = session.camera
    if cam.projection == ORTHOGRAPHIC:
        lines.append("vcamera -orthographic")
        lines.append(f"vviewparams -size {_fmt(2 * float(cam.ortho_scale))}")
    else:
        lines.append(f"vcamera -perspective -fovy {_fmt(cam.fovy_deg)}")
        if float(cam.aperture) > 0:
            lines.append(f"vcamera -aperture {_fmt(cam.aperture)} "
                         f"-focus {_fmt(cam.focal_dist)}")
    lines.append(f"vviewparams -eye {_fmt3(cam.eye)} -at {_fmt3(cam.at)} "
                 f"-up {_fmt3(cam.up)}")

    # render params
    p = session.params
    mode = {RenderMode.GI: "-gi", RenderMode.RT: "-ray",
            RenderMode.RASTER: "-rast"}[p.mode]
    lines.append(f"vrenderparams {mode} -rayDepth {p.ray_depth} "
                 f"-clamping {_fmt(p.radiance_clamp)}")
    if p.tonemap.method == TONE_FILMIC:
        lines.append(f"vrenderparams -tonemapping filmic "
                     f"-exposure {_fmt(p.tonemap.exposure)} "
                     f"-whitepoint {_fmt(p.tonemap.white_point)}")
    lines.append(f"vrtsize {session.width} {session.height}")

    if save_accumulator and session.progressive is not None:
        from cadrays_tpu.integrator.progressive import save_state

        save_state(session.progressive,
                   os.path.join(directory, "accumulator.npz"))

    script = os.path.join(directory, "model.crt")
    with open(script, "w") as f:
        f.write("\n".join(lines) + "\n")
    return script


def import_scene(session, script_path: str):
    """Re-run an exported scene script (the reference's `vclear; source`
    re-import flow, ImportSettingsEditor.cxx:371-391)."""
    from cadrays_tpu.cli.commands import make_console

    console = make_console(session)
    old_cwd = session.cwd
    session.cwd = os.path.dirname(os.path.abspath(script_path))
    try:
        console.source(script_path)
    finally:
        session.cwd = old_cwd
    acc = os.path.join(os.path.dirname(script_path), "accumulator.npz")
    if os.path.exists(acc):
        from cadrays_tpu.integrator.progressive import load_state

        session.progressive = load_state(acc)
    return session
