"""Scriptable command surface — the framework's "TCL layer".

The reference's entire runtime API is an embedded OCCT DRAW interpreter:
scene scripts, the in-app console, import/export and the benchmark
harness all speak the same command set (SURVEY.md §2.2/§5 "config/flag
system"; commands registered in ImportExportPlugin.cxx:973-994 plus the
OCCT v-commands the scripts drive). This module re-implements that
surface natively: `Console.exec()` parses one command line, mutates a
`Session` (scene + camera + render params + progressive state), and the
same command language is what scene exports are written in — so a scene
file is an executable script here too (ImportExport.cxx:350-612
semantics).

Command syntax is kept deliberately compatible with the reference's
scripts (see data/scripts/CornellBox.tcl) so scenes translate 1:1.
"""
from __future__ import annotations

import math
import os
import shlex
from typing import Callable, Dict, List, Optional

import numpy as np

from cadrays_tpu.core.bsdf import Material, material, normalize_energy
from cadrays_tpu.core.camera import ORTHOGRAPHIC, PERSPECTIVE, Camera
from cadrays_tpu.core.fresnel import (
    FRESNEL_CONDUCTOR,
    FRESNEL_CONSTANT,
    FRESNEL_DIELECTRIC,
    FRESNEL_SCHLICK,
    fresnel,
)
from cadrays_tpu.core.lights import directional_light, positional_light
from cadrays_tpu.core.tonemap import TONE_DISABLED, TONE_FILMIC
from cadrays_tpu.geometry import primitives
from cadrays_tpu.geometry.mesh import TriangleMesh
from cadrays_tpu.integrator.params import RenderMode, RenderParams
from cadrays_tpu.scene.materials import preset, preset_names
from cadrays_tpu.cli.modeling import ModelingMixin
from cadrays_tpu.modeling.topo import Shape as ModelingShape
from cadrays_tpu.modeling.topo import to_triangle_mesh
from cadrays_tpu.scene.model import DataNode, NodeType
from cadrays_tpu.scene.scene import Scene


class CommandError(Exception):
    pass


def _floats(tokens: List[str], i: int, maxn: int) -> List[float]:
    """Consume up to maxn floats starting at tokens[i]."""
    out = []
    while i < len(tokens) and len(out) < maxn:
        try:
            out.append(float(tokens[i]))
        except ValueError:
            break
        i += 1
    return out


def _rgb(vals: List[float]):
    if len(vals) >= 3:
        return tuple(vals[:3])
    if len(vals) == 1:
        return (vals[0],) * 3
    raise CommandError("expected 1 or 3 color components")


def _translate(v):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = v
    return m


def _axis_angle(axis, deg):
    a = np.asarray(axis, np.float64)
    n = np.linalg.norm(a)
    if n < 1e-12:
        raise CommandError("zero rotation axis")
    a /= n
    t = math.radians(deg)
    c, s = math.cos(t), math.sin(t)
    x, y, z = a
    r = np.array([
        [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
        [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
        [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
    ])
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = r.astype(np.float32)
    return m


def _quat_matrix(qx, qy, qz, qw):
    n = math.sqrt(qx * qx + qy * qy + qz * qz + qw * qw) or 1.0
    x, y, z, w = qx / n, qy / n, qz / n, qw / n
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], np.float32)
    return m


class Session:
    """Everything a script can touch: scene, camera, params, view size."""

    def __init__(self):
        self.scene = Scene()
        self.camera = Camera.look_at(eye=(2.0, -2.0, 1.5), at=(0, 0, 0),
                                     up=(0, 0, 1), fovy_deg=45.0)
        self.params = RenderParams()
        self.width = 512
        self.height = 512
        # staging area: modeling commands create meshes here; vdisplay
        # moves them into the scene (DRAW's shape map -> AIS display).
        self.staging: Dict[str, tuple] = {}  # name -> (mesh|Shape, NodeType)
        self.vars: Dict[str, float] = {}  # DRAW numeric variables (dset)
        self.sweep = None  # mksweep pipeline state
        self.bop_operands = None
        self.progressive = None
        self.cwd = os.getcwd()

    def resolve(self, path: str) -> str:
        return path if os.path.isabs(path) else os.path.join(self.cwd, path)


class Console(ModelingMixin):
    """Command interpreter over a Session (AppConsole analogue)."""

    def __init__(self, session: Optional[Session] = None):
        self.session = session or Session()
        self.history: List[str] = []
        h: Dict[str, Callable[[List[str]], str]] = {}
        for name in dir(self):
            if name.startswith("cmd_"):
                h[name[4:]] = getattr(self, name)
        self._handlers = h

    # -- driver ------------------------------------------------------------
    @staticmethod
    def _split_commands(line: str) -> List[str]:
        """Split on `;` OUTSIDE quotes/escapes (a naive split broke
        quoted arguments containing semicolons — round-2 review)."""
        pieces = []
        cur = []
        quote = None
        esc = False
        for ch in line:
            if esc:
                cur.append(ch)
                esc = False
            elif ch == "\\":
                cur.append(ch)
                esc = True
            elif quote:
                cur.append(ch)
                if ch == quote:
                    quote = None
            elif ch in "'\"":
                cur.append(ch)
                quote = ch
            elif ch == ";":
                pieces.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        pieces.append("".join(cur))
        return pieces

    def exec(self, line: str) -> str:
        """Execute one line (possibly `;`-separated commands)."""
        out = []
        for piece in self._split_commands(line):
            piece = piece.strip()
            if not piece or piece.startswith("#"):
                continue
            self.history.append(piece)
            toks = shlex.split(piece)
            cmd = toks[0]
            handler = self._handlers.get(cmd)
            if handler is None:
                raise CommandError(f"unknown command '{cmd}' "
                                   f"(try 'help')")
            res = handler(toks[1:])
            if res:
                out.append(res)
        return "\n".join(out)

    def source(self, path: str) -> str:
        with open(path, "r") as f:
            outs = []
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                r = self.exec(line)
                if r:
                    outs.append(r)
        return "\n".join(outs)

    # -- helpers -----------------------------------------------------------
    def _node(self, name: str) -> DataNode:
        node = self.session.scene.model.get(name)
        if node is None:
            raise CommandError(f"no displayed object '{name}'")
        return node

    def _strip_noupdate(self, args: List[str]) -> List[str]:
        return [a for a in args if a != "-noupdate"]

    # =======================================================================
    # modeling commands (DRAW kernel analogues)
    # =======================================================================
    def cmd_psphere(self, args):
        """psphere name r — a modeling SOLID with one spherical face
        (OCCT parity: typed `explode s f` yields one part; previously a
        raw TriangleMesh whose explode fell back to components)."""
        from cadrays_tpu.modeling.topo import SolidShape

        name, r = args[0], float(args[1])
        m = primitives.sphere(r, 64, 32)
        self.session.staging[name] = (SolidShape(m.vertices, m.indices),
                                      NodeType.CAD_SHAPE)
        return ""

    def cmd_ptorus(self, args):
        """ptorus name r1 r2 — modeling solid with one toroidal face."""
        from cadrays_tpu.modeling.topo import SolidShape

        name, r1, r2 = args[0], float(args[1]), float(args[2])
        m = primitives.torus(r1, r2)
        self.session.staging[name] = (SolidShape(m.vertices, m.indices),
                                      NodeType.CAD_SHAPE)
        return ""

    def cmd_explode(self, args):
        """explode name [FACE] — stage per-face/per-component parts as
        name_1..name_N (DRAW semantics used by CornellBox.tcl:21)."""
        name = args[0]
        staged = self.session.staging.get(name)
        if staged is None:
            raise CommandError(f"no staged shape '{name}'")
        mesh, ntype = staged
        if isinstance(mesh, ModelingShape):
            return self._explode_shape(
                name, mesh, args[1] if len(args) > 1 else None)
        typed = len(args) > 1
        # un-typed explode on a compound -> its recorded sub-shapes
        # (DRAW compound semantics, Materials.tcl:22-23); box faces
        # explode to the 6 canonical faces; other meshes to connected
        # components.
        if not typed and mesh.part_ranges is not None:
            parts = []
            for t0, t1 in mesh.part_ranges:
                tris = mesh.indices[t0:t1]
                used = np.unique(tris)
                remap = np.full(mesh.num_vertices, -1, np.int32)
                remap[used] = np.arange(used.size, dtype=np.int32)
                parts.append(TriangleMesh(
                    mesh.vertices[used], remap[tris],
                    None if mesh.normals is None else mesh.normals[used],
                    None if mesh.uvs is None else mesh.uvs[used]))
        elif mesh.num_triangles == 12 and mesh.num_vertices == 24:
            parts = [primitives_face(mesh, k) for k in range(6)]
        else:
            from cadrays_tpu.scene.model import split_by_connectivity

            parts = split_by_connectivity(mesh)
        for i, p in enumerate(parts):
            self.session.staging[f"{name}_{i + 1}"] = (p, ntype)
        return " ".join(f"{name}_{i + 1}" for i in range(len(parts)))

    def _affine(self, name: str, m: np.ndarray,
                flip_winding: bool = False) -> None:
        """Apply a 4x4 transform: modeling shapes compose their location
        (so DRAW `reset` can undo it); legacy meshes bake into vertices;
        displayed nodes update their instance transform."""
        staged = self.session.staging.get(name)
        if staged is not None:
            mesh, t = staged
            if isinstance(mesh, ModelingShape):
                mesh.apply_loc(np.asarray(m, np.float64))
                return
            mesh = mesh.transformed(m)
            if flip_winding:
                mesh.indices = mesh.indices[:, [0, 2, 1]].copy()
            self.session.staging[name] = (mesh, t)
            return
        node = self._node(name)
        node.transform = (m @ node.transform).astype(np.float32)
        self.session.scene.touch()

    def cmd_ttranslate(self, args):
        name = args[0]
        v = self._nums(args[1:4])
        self._affine(name, _translate(v))
        return ""

    def cmd_trotate(self, args):
        """trotate name x y z dx dy dz angle — rotate about an axis
        through a point (DRAW transform commands used by Shape.tcl)."""
        name = args[0]
        vals = self._nums(args[1:8])
        p, axis, ang = vals[0:3], vals[3:6], vals[6]
        m = (_translate(p) @ _axis_angle(axis, ang)
             @ _translate([-p[0], -p[1], -p[2]]))
        self._affine(name, m)
        return ""

    def cmd_tscale(self, args):
        """tscale name x y z factor — scale about a point."""
        name = args[0]
        vals = self._nums(args[1:5])
        p, s = vals[0:3], vals[3]
        m = _translate(p) @ np.diag([s, s, s, 1.0]).astype(np.float32) \
            @ _translate([-p[0], -p[1], -p[2]])
        self._affine(name, m)
        return ""

    def cmd_tmirror(self, args):
        """tmirror name x y z dx dy dz — mirror through the plane with
        point (x,y,z) and normal (dx,dy,dz); winding is flipped so faces
        stay outward."""
        name = args[0]
        vals = self._nums(args[1:7])
        p = np.asarray(vals[0:3], np.float64)
        n = np.asarray(vals[3:6], np.float64)
        ln = np.linalg.norm(n)
        if ln < 1e-12:
            raise CommandError("tmirror: zero plane normal")
        n /= ln
        refl = np.eye(4, dtype=np.float32)
        refl[:3, :3] = (np.eye(3) - 2.0 * np.outer(n, n)).astype(np.float32)
        m = _translate(p) @ refl @ _translate(-p)
        self._affine(name, m, flip_winding=True)
        return ""

    def cmd_compound(self, args):
        """compound s1 s2 ... result — merge staged shapes (DRAW)."""
        if len(args) < 2:
            raise CommandError("compound: need sources and a result name")
        *srcs, dst = args
        meshes, ntype = [], NodeType.CAD_SHAPE
        for s in srcs:
            staged = self.session.staging.get(s)
            if staged is None:
                raise CommandError(f"no staged shape '{s}'")
            meshes.append(staged[0])
            ntype = staged[1]
        if any(isinstance(m, ModelingShape) for m in meshes):
            from cadrays_tpu.modeling.topo import (CompoundShape,
                                                   SolidShape)
            parts = []
            for m in meshes:
                if isinstance(m, ModelingShape):
                    parts.append(m.copy())
                else:
                    parts.append(SolidShape(
                        np.asarray(m.vertices, np.float64), m.indices))
            self.session.staging[dst] = (CompoundShape(parts), ntype)
            return ""
        merged = TriangleMesh.merge(meshes)
        ranges, t0 = [], 0
        for m in meshes:
            ranges.append((t0, t0 + m.num_triangles))
            t0 += m.num_triangles
        merged.part_ranges = np.asarray(ranges, np.int32)
        self.session.staging[dst] = (merged, ntype)
        return ""

    def cmd_copy(self, args):
        """copy src dst (DRAW tcopy/copy: duplicate a staged shape)."""
        src, dst = args[0], args[1]
        staged = self.session.staging.get(src)
        if staged is None:
            raise CommandError(f"no staged shape '{src}'")
        mesh, t = staged
        if isinstance(mesh, ModelingShape):
            self.session.staging[dst] = (mesh.copy(), t)
            return ""
        self.session.staging[dst] = (TriangleMesh(
            mesh.vertices.copy(), mesh.indices.copy(),
            None if mesh.normals is None else mesh.normals.copy(),
            None if mesh.uvs is None else mesh.uvs.copy(),
            None if mesh.part_ranges is None else mesh.part_ranges.copy()), t)
        return ""

    def cmd_tcopy(self, args):
        return self.cmd_copy(args)

    def cmd_renamevar(self, args):
        """renamevar old new — rename a staged shape variable."""
        src, dst = args[0], args[1]
        staged = self.session.staging.pop(src, None)
        if staged is None:
            raise CommandError(f"no staged shape '{src}'")
        self.session.staging[dst] = staged
        return ""

    def cmd_incmesh(self, args):
        return ""  # tessellation happens at primitive creation here

    def cmd_donly(self, args):
        """donly/vdonly name... — display only the named objects
        (hide everything else)."""
        names = set(self._strip_noupdate(args))
        sc = self.session.scene
        for leaf in sc.model.leaves(visible_only=False):
            if leaf.name not in names:
                leaf.hide()
        self.cmd_vdisplay(list(names))
        sc.touch()
        return ""

    def cmd_vdonly(self, args):
        return self.cmd_donly(args)

    # =======================================================================
    # display / scene commands
    # =======================================================================
    def cmd_vclear(self, args):
        # Clears the *viewer* only — DRAW variables survive (the modeling
        # scripts do `vclear; vdisplay result`, Bottle.tcl:97-98).
        self.session.scene.clear()
        return ""

    def cmd_vdisplay(self, args):
        names = self._strip_noupdate(args)
        sc = self.session.scene
        for name in names:
            if sc.model.has(name):
                sc.model.get(name).show()
                sc.touch()
                continue
            staged = self.session.staging.get(name)
            if staged is None:
                raise CommandError(f"nothing named '{name}' to display")
            mesh, ntype = staged
            shape = None
            if isinstance(mesh, ModelingShape):
                shape = mesh
                try:
                    mesh = to_triangle_mesh(mesh)
                except (ValueError, TypeError):
                    continue  # wires/curves have no render surface
            sc.add_mesh(name, mesh, preset("default"), node_type=ntype)
            node = sc.model.get(name)
            if node is not None:
                node.source_shape = shape
        return ""

    def cmd_verase(self, args):
        for name in self._strip_noupdate(args):
            self._node(name).hide()
        self.session.scene.touch()
        return ""

    def cmd_vremove(self, args):
        for name in self._strip_noupdate(args):
            self.session.scene.remove(name)
        return ""

    def cmd_vsetmaterial(self, args):
        args = self._strip_noupdate(args)
        name, mat_name = args[0], args[1]
        self.session.scene.set_material(name, preset(mat_name))
        return ""

    def cmd_vsetdispmode(self, args):
        return ""  # tessellated display is implicit here

    def cmd_vaspects(self, args):
        return ""  # GL aspect tweaks: accepted, no-op

    def cmd_vbsdf(self, args):
        """Edit BSDF lobes of a displayed object — full serialization
        surface of ImportExport.cxx:155-231."""
        name = args[0]
        node = self._node(name)
        m: Material = node.material
        i = 1
        normalize = False
        updates = {}
        ftype_map = {"constant": FRESNEL_CONSTANT, "schlick": FRESNEL_SCHLICK,
                     "conductor": FRESNEL_CONDUCTOR,
                     "dielectric": FRESNEL_DIELECTRIC}
        while i < len(args):
            a = args[i].lower()
            i += 1
            if a in ("-kd", "-ks", "-kt", "-kc", "-le", "-absorpcolor"):
                vals = _floats(args, i, 3)
                i += len(vals)
                key = {"-kd": "kd", "-ks": "ks", "-kt": "kt", "-kc": "kc",
                       "-le": "le", "-absorpcolor": "absorp_color"}[a]
                updates[key] = np.asarray(_rgb(vals), np.float32).reshape(1, 3)
            elif a in ("-baseroughness", "-roughness"):
                updates["base_rough"] = np.float32([float(args[i])])
                i += 1
            elif a == "-coatroughness":
                updates["coat_rough"] = np.float32([float(args[i])])
                i += 1
            elif a == "-absorpcoeff":
                updates["absorp_coeff"] = np.float32([float(args[i])])
                i += 1
            elif a in ("-basefresnel", "-coatfresnel"):
                kind = ftype_map.get(args[i].lower())
                if kind is None:
                    raise CommandError(f"unknown Fresnel type {args[i]}")
                i += 1
                need = {FRESNEL_CONSTANT: 1, FRESNEL_SCHLICK: 3,
                        FRESNEL_CONDUCTOR: 2, FRESNEL_DIELECTRIC: 1}[kind]
                vals = _floats(args, i, need)
                i += len(vals)
                if kind == FRESNEL_SCHLICK and len(vals) == 1:
                    vals = vals * 3
                t, p = fresnel(kind, *((vals,) if kind == FRESNEL_SCHLICK
                                       else tuple(vals)))
                pre = "base" if a == "-basefresnel" else "coat"
                updates[f"{pre}_ftype"] = np.int32([t])
                updates[f"{pre}_fparams"] = p.reshape(1, 4)
            elif a == "-n":
                normalize = True
            else:
                raise CommandError(f"vbsdf: unknown flag {a}")
        m = m.replace(**updates)
        if normalize:
            import jax

            m = jax.tree.map(np.asarray, normalize_energy(m))
        # propagates through the material link group (rtmatlink)
        self.session.scene.set_material(name, m)
        return ""

    def cmd_rtmatlink(self, args):
        """rtmatlink src dst... | rtmatlink -print — share src's material
        with dst nodes so one edit updates all (the reference's material
        link button, MaterialEditor.cxx:512-529). `-print` lists groups."""
        model = self.session.scene.model
        if args and args[0] == "-print":
            groups = model.link_groups()
            return "\n".join(" ".join(g) for g in groups) or "(no links)"
        if len(args) < 2:
            raise CommandError("rtmatlink: expected src dst [dst2 ...]")
        src = args[0]
        if model.get(src) is None:
            raise CommandError(f"no displayed object '{src}'")
        for dst in args[1:]:
            if model.get(dst) is None:
                raise CommandError(f"no displayed object '{dst}'")
            model.link_materials(src, dst)
        self.session.scene.touch()
        return ""

    def cmd_rtmatunlink(self, args):
        """rtmatunlink name... — detach from the material link group;
        the node keeps a private copy (MaterialEditor.cxx:548-563)."""
        model = self.session.scene.model
        for name in args:
            if model.get(name) is None:
                raise CommandError(f"no displayed object '{name}'")
            model.unlink_material(name)
        return ""

    def cmd_vlocation(self, args):
        args = self._strip_noupdate(args)
        name = args[0]
        node = self._node(name)
        i = 1
        while i < len(args):
            a = args[i].lower()
            i += 1
            if a in ("-setlocation", "-location"):
                v = _floats(args, i, 3)
                i += 3
                if a == "-setlocation":
                    m = node.transform.copy()
                    m[:3, 3] = v
                    node.transform = m
                else:
                    node.transform = _translate(v) @ node.transform
            elif a == "-rotate":
                vals = _floats(args, i, 7)
                i += len(vals)
                origin, axis, ang = vals[0:3], vals[3:6], vals[6]
                rot = (_translate(origin) @ _axis_angle(axis, ang)
                       @ _translate([-origin[0], -origin[1], -origin[2]]))
                node.transform = rot @ node.transform
            elif a == "-rotation":
                vals = _floats(args, i, 4)
                i += 4
                m = _quat_matrix(*vals)
                m[:3, 3] = node.transform[:3, 3]
                node.transform = m.astype(np.float32)
            elif a == "-scale":
                s = float(args[i])
                i += 1
                m = np.diag([s, s, s, 1.0]).astype(np.float32)
                node.transform = node.transform @ m
            elif a == "-reset":
                node.transform = np.eye(4, dtype=np.float32)
            else:
                raise CommandError(f"vlocation: unknown flag {a}")
        self.session.scene.touch()
        return ""

    # =======================================================================
    # lights
    # =======================================================================
    def _parse_light_kv(self, args, i, current=None):
        """Parse `pos x y z`, `dir(ection) x y z`, `sm v`, `int v`,
        `color r g b`, `head 0/1` key-value runs (vlight syntax of
        CornellBox.tcl:11-14, AppGui.cxx:957)."""
        fields = {}
        while i < len(args):
            k = args[i].lower()
            i += 1
            if k in ("pos", "position"):
                fields["vec"] = _floats(args, i, 3)
                i += 3
            elif k in ("dir", "direction"):
                fields["vec"] = _floats(args, i, 3)
                i += 3
            elif k in ("sm", "smoothness", "smoothangle", "smoothradius"):
                fields["smooth"] = float(args[i])
                i += 1
            elif k in ("int", "intensity"):
                fields["intensity"] = float(args[i])
                i += 1
            elif k == "color":
                vals = _floats(args, i, 3)
                i += len(vals)
                fields["color"] = _rgb(vals)
            elif k in ("head", "headlight"):
                fields["headlight"] = float(args[i])
                i += 1
            else:
                raise CommandError(f"vlight: unknown field {k}")
        return fields

    def cmd_vlight(self, args):
        sc = self.session.scene
        if not args:
            lines = []
            for i, lt in enumerate(sc.lights):
                kind = "directional" if int(lt.kind[0]) == 0 else "positional"
                lines.append(
                    f"{i}: {kind} int={float(lt.intensity[0]):g} "
                    f"sm={float(lt.smooth[0]):g} vec={np.asarray(lt.vec[0])}")
            return "\n".join(lines)
        sub = args[0].lower()
        if sub == "clear":
            sc.clear_lights()
            return ""
        if sub == "add":
            kind = args[1].lower()
            rest = args[2:]
            head = False
            if rest and rest[0].lower() == "head":
                head = bool(int(rest[1]))
                rest = rest[2:]
            fields = self._parse_light_kv(rest, 0)
            if kind.startswith("dir"):
                lt = directional_light(
                    direction=fields.get("vec", (0, 0, -1)),
                    color=fields.get("color", (1, 1, 1)),
                    intensity=fields.get("intensity", 1.0),
                    smooth_angle_deg=np.rad2deg(fields.get("smooth", 0.0)),
                    headlight=head or bool(fields.get("headlight", 0)))
            elif kind.startswith("pos"):
                lt = positional_light(
                    position=fields.get("vec", (0, 0, 1)),
                    color=fields.get("color", (1, 1, 1)),
                    intensity=fields.get("intensity", 1.0),
                    smooth_radius=fields.get("smooth", 0.0))
            else:
                raise CommandError(
                    f"vlight add: unsupported type {kind} (the path tracer "
                    "supports directional/positional, LightSourcesEditor.cxx:155-179)")
            sc.add_light(lt)
            return ""
        if sub in ("del", "delete", "remove"):
            sc.remove_light(int(args[1]))
            return ""
        if sub == "change":
            idx = int(args[1])
            fields = self._parse_light_kv(args[2:], 0)
            sc.change_light(idx, **fields)
            return ""
        raise CommandError(f"vlight: unknown subcommand {sub}")

    def cmd_rtlight(self, args):
        """rtlight idx -color r g b (ImportExportPlugin.cxx:758-856)."""
        idx = int(args[0])
        if args[1].lower() != "-color":
            raise CommandError("rtlight: expected -color")
        self.session.scene.change_light(idx, color=_rgb(_floats(args, 2, 3)))
        return ""

    # =======================================================================
    # camera / view
    # =======================================================================
    def cmd_vcamera(self, args):
        cam = self.session.camera
        i = 0

        while i < len(args):
            a = args[i].lower()
            i += 1
            if a in ("-persp", "-perspective"):
                cam = cam.replace(projection=PERSPECTIVE)
            elif a in ("-ortho", "-orthographic"):
                cam = cam.replace(projection=ORTHOGRAPHIC)
            elif a == "-fovy":
                cam = cam.replace(fovy_deg=np.float32(float(args[i])))
                i += 1
            elif a == "-aperture":
                cam = cam.replace(aperture=np.float32(float(args[i])))
                i += 1
            elif a in ("-focus", "-focal"):
                cam = cam.replace(focal_dist=np.float32(float(args[i])))
                i += 1
            elif a == "-distance":
                fwd = cam.basis_np()[2]
                at = np.asarray(cam.at)
                cam = cam.replace(
                    eye=np.asarray(at - fwd * float(args[i]), np.float32))
                i += 1
            else:
                raise CommandError(f"vcamera: unknown flag {a}")
        self.session.camera = cam
        self.session.scene.camera = cam
        return ""

    def cmd_vviewparams(self, args):
        cam = self.session.camera

        i = 0
        while i < len(args):
            a = args[i].lower()
            i += 1
            if a == "-eye":
                cam = cam.replace(eye=np.asarray(_floats(args, i, 3),
                                                 np.float32))
                i += 3
            elif a == "-at":
                cam = cam.replace(at=np.asarray(_floats(args, i, 3),
                                                np.float32))
                i += 3
            elif a == "-up":
                cam = cam.replace(up=np.asarray(_floats(args, i, 3),
                                                np.float32))
                i += 3
            elif a == "-proj":
                # direction from at to eye
                v = np.asarray(_floats(args, i, 3), np.float32)
                i += 3
                dist = float(np.linalg.norm(
                    np.asarray(cam.eye) - np.asarray(cam.at)))
                v = v / max(np.linalg.norm(v), 1e-9)
                cam = cam.replace(eye=np.asarray(
                    np.asarray(cam.at) + v * dist, np.float32))
            elif a == "-size":
                cam = cam.replace(ortho_scale=np.float32(float(args[i]) / 2))
                i += 1
            else:
                raise CommandError(f"vviewparams: unknown flag {a}")
        self.session.camera = cam
        self.session.scene.camera = cam
        return ""

    def _scene_bounds(self):
        import numpy as np

        leaves = self.session.scene.model.leaves(visible_only=True)
        if not leaves:
            return np.zeros(3), np.ones(3)
        los, his = [], []
        for n in leaves:
            m = n.mesh.transformed(n.world_transform())
            lo, hi = m.bounds()
            los.append(lo)
            his.append(hi)
        return np.min(los, axis=0), np.max(his, axis=0)

    def _view_preset(self, direction, up):
        lo, hi = self._scene_bounds()
        center = (lo + hi) / 2
        radius = float(np.linalg.norm(hi - lo)) / 2 + 1e-6
        d = np.array(direction, np.float32)  # copy: jax arrays are read-only
        d /= np.linalg.norm(d)
        fov = float(self.session.camera.fovy_deg)
        dist = radius / math.tan(math.radians(fov) / 2) * 1.2
        cam = self.session.camera.replace(
            eye=np.asarray(center - d * dist, np.float32),
            at=np.asarray(center, np.float32),
            up=np.asarray(up, np.float32),
            ortho_scale=np.float32(radius * 1.2),
        )
        self.session.camera = cam
        self.session.scene.camera = cam

    def cmd_vfront(self, args):
        self._view_preset((0, 1, 0), (0, 0, 1))
        return ""

    def cmd_vback(self, args):
        self._view_preset((0, -1, 0), (0, 0, 1))
        return ""

    def cmd_vtop(self, args):
        self._view_preset((0, 0, -1), (0, 1, 0))
        return ""

    def cmd_vbottom(self, args):
        self._view_preset((0, 0, 1), (0, 1, 0))
        return ""

    def cmd_vleft(self, args):
        self._view_preset((1, 0, 0), (0, 0, 1))
        return ""

    def cmd_vright(self, args):
        self._view_preset((-1, 0, 0), (0, 0, 1))
        return ""

    def cmd_vaxo(self, args):
        self._view_preset((1, 1, -1), (0, 0, 1))
        return ""

    def cmd_vfit(self, args):
        cam = self.session.camera
        self._view_preset(cam.basis_np()[2], np.asarray(cam.up))
        return ""

    # =======================================================================
    # render params
    # =======================================================================
    def cmd_vrenderparams(self, args):

        p = self.session.params
        tm = p.tonemap
        i = 0
        while i < len(args):
            a = args[i].lower()
            i += 1
            if a == "-ray":
                p = p.replace(mode=RenderMode.RT)
            elif a == "-gi":
                p = p.replace(mode=RenderMode.GI)
            elif a in ("-rast", "-raster"):
                p = p.replace(mode=RenderMode.RASTER)
            elif a == "-raydepth":
                p = p.replace(ray_depth=int(args[i]))
                i += 1
            elif a in ("-clamping", "-radianceclamping"):
                p = p.replace(radiance_clamp=np.float32(float(args[i])))
                i += 1
            elif a == "-iss":
                p = p.replace(adaptive=True)
            elif a == "-issd":
                # debug tile display (SettingsWidget.cxx:443-449)
                p = p.replace(adaptive_debug=_onoff(args, i))
                i += 1
            elif a == "-persistent":
                # lane-regenerating progressive accumulation
                # (integrator/persistent.py, ~1.5x sample throughput)
                p = p.replace(persistent=_onoff(args, i))
                i += 1
            elif a == "-nbtiles":
                p = p.replace(tile_size=max(8, int(math.sqrt(
                    self.session.width * self.session.height
                    / max(int(args[i]), 1)))))
                i += 1
            elif a == "-twoside":
                p = p.replace(two_sided=_onoff(args, i))
                i += 1
            elif a == "-coherent":
                p = p.replace(coherent=_onoff(args, i))
                i += 1
            elif a == "-aa":
                # RT-mode adaptive anti-aliasing
                # (SettingsWidget.cxx:575-607; integrator/whitted.py)
                p = p.replace(rt_aa=_onoff(args, i))
                i += 1
            elif a == "-shadows":
                p = p.replace(rt_shadows=_onoff(args, i))
                i += 1
            elif a == "-reflections":
                p = p.replace(rt_reflections=_onoff(args, i))
                i += 1
            elif a == "-tonemapping":
                val = args[i].lower()
                i += 1
                tm = tm.replace(method=TONE_FILMIC if val == "filmic"
                                else TONE_DISABLED)
            elif a == "-exposure":
                tm = tm.replace(exposure=np.float32(float(args[i])))
                i += 1
            elif a == "-whitepoint":
                tm = tm.replace(white_point=np.float32(float(args[i])))
                i += 1
            elif a == "-msaa":
                i += 1  # accepted for script parity; raster AA is spp here
            else:
                raise CommandError(f"vrenderparams: unknown flag {a}")
        self.session.params = p.replace(tonemap=tm)
        return ""

    def cmd_vtextureenv(self, args):
        sc = self.session.scene
        if args[0].lower() == "off":
            sc.clear_envmap()
            return ""
        if args[0].lower() == "on":
            from cadrays_tpu.utils.image import load_image

            img = load_image(self.session.resolve(args[1]))
            sc.set_envmap(img)
            return ""
        raise CommandError("vtextureenv: expected on <file> | off")

    def cmd_vbackground(self, args):

        if args and args[0].lower() == "-env":
            self.session.scene.set_env_background(bool(int(args[1])))
            return ""
        vals = _floats(args, 0, 3)
        self.session.params = self.session.params.replace(
            background_color=np.asarray(_rgb(vals), np.float32))
        return ""

    def cmd_vrtsize(self, args):
        self.session.width = int(args[0])
        self.session.height = int(args[1]) if len(args) > 1 else int(args[0])
        return ""

    # =======================================================================
    # rt* commands (ImportExport plugin surface)
    # =======================================================================
    def cmd_rtmeshread(self, args):
        """rtmeshread file [name] [-group] [-gensmooth] [-pretrans]
        [-fixnorms] [-genuv] [-upaxis X|Y|Z]
        (ImportExportPlugin.cxx:132-354)."""
        path = self.session.resolve(args[0])
        name = None
        flags = set()
        up_axis = "Z"
        i = 1
        while i < len(args):
            a = args[i]
            if a.startswith("-"):
                key = a[1:].lower()
                if key == "upaxis":
                    i += 1
                    up_axis = args[i].upper()
                else:
                    flags.add(key)
            elif name is None:
                name = a
            i += 1
        if name is None:
            name = os.path.splitext(os.path.basename(path))[0]

        parts = _load_mesh_file(path)
        sc = self.session.scene
        group = "group" in flags or len(parts) == 1

        def prep(mesh: TriangleMesh) -> TriangleMesh:
            if "pretrans" in flags:
                pass  # transforms already baked by our loaders
            if up_axis == "Y":
                # rotate Y-up -> Z-up (MeshImporter Flipper semantics,
                # MeshImporter.cxx:24-38)
                rot = np.eye(4, dtype=np.float32)
                rot[:3, :3] = np.float32([[1, 0, 0], [0, 0, -1], [0, 1, 0]])
                mesh = mesh.transformed(rot)
            if "gensmooth" in flags or mesh.normals is None:
                mesh.compute_vertex_normals()
            if "genuv" in flags:
                # Assimp GenUVCoords analogue (MeshImporter.cxx:73-97):
                # generate/normalize texture coordinates on import.
                from cadrays_tpu.geometry.parameterize import (
                    has_valid_uvs, parameterize_mesh)

                if not has_valid_uvs(mesh):
                    mesh = parameterize_mesh(mesh)
            return mesh

        if len(parts) == 1 or not group:
            created = []
            base = name
            for k, part in enumerate(parts):
                nm = base if len(parts) == 1 else f"{base}_{k + 1}"
                mat = _material_from_part(part)
                node = sc.add_mesh(nm, prep(part.mesh), mat)
                _attach_part_textures(self.session, node.name, part)
                created.append(node.name)
            return " ".join(created)

        # -group: one parent node with per-material children
        # (ImportExportPlugin.cxx:318-351)
        parent = DataNode(sc.model.unique_name(name), NodeType.POLY_MESH)
        sc.model.register(parent)
        sc.model.meshes_root.add_child(parent)
        for k, part in enumerate(parts):
            child = DataNode(sc.model.unique_name(f"{name}_{k + 1}"),
                             NodeType.POLY_MESH, prep(part.mesh),
                             _material_from_part(part))
            sc.model.register(child)
            parent.add_child(child)
            _attach_part_textures(self.session, child.name, part)
        sc.touch()
        return parent.name

    def cmd_rtdisplay(self, args):
        for name in args:
            self._node(name).show()
        self.session.scene.touch()
        return ""

    def cmd_rterase(self, args):
        for name in args:
            self._node(name).hide()
        self.session.scene.touch()
        return ""

    def cmd_rtmodel(self, args):
        """rtmodel [-print] [-sync name] (ImportExportPlugin.cxx:44-126)."""
        if not args or args[0] == "-print":
            lines = []

            def rec(node, depth):
                vis = {0: " (hidden)", 1: "", 2: " (partial)"}[
                    node.visibility().value]
                lines.append("  " * depth + node.name + vis)
                for c in node.children:
                    rec(c, depth + 1)

            for root in (self.session.scene.model.shapes_root,
                         self.session.scene.model.meshes_root):
                rec(root, 0)
            return "\n".join(lines)
        if args[0] == "-sync":
            return ""  # model and display are always in sync here
        if args[0] == "-textures":
            return "\n".join(self.session.scene._texture_ids)
        return ""

    def cmd_rtgroup(self, args):
        """rtgroup name1 name2 ... [-name groupName]
        (ImportExportPlugin.cxx:464-602; -name is our extension so scene
        exports can round-trip group identity + transforms)."""
        args = list(args)
        gname = "Group"
        if "-name" in args:
            i = args.index("-name")
            if i + 1 >= len(args):
                raise CommandError("rtgroup: -name requires a value")
            gname = args[i + 1]
            del args[i:i + 2]
        grp = self.session.scene.model.group(args, group_name=gname)
        if grp is None:
            raise CommandError("rtgroup: nodes must be existing siblings")
        self.session.scene.touch()
        return grp.name

    def cmd_rttexture(self, args):
        """rttexture name file [-scale s] [-ks] | name off [-ks]
        (ImportExportPlugin.cxx:608-752). -ks targets the glossy-lobe
        map slot so Ks textures survive export round-trips."""
        name = args[0]
        slot = "ks" if "-ks" in args else "kd"
        field = "ks_tex_id" if slot == "ks" else "tex_id"
        if len(args) > 1 and args[1].lower() == "off":
            node = self._node(name)
            for n in node.traverse():
                n.material = n.material.replace(**{field: np.int32([-1])})
            self.session.scene.touch()
            return ""
        path = self.session.resolve(args[1])
        scale = 1.0
        if "-scale" in args:
            scale = float(args[args.index("-scale") + 1])
        _attach_texture(self.session, name, path, scale, slot=slot)
        return ""

    def cmd_rtrotate(self, args):
        """rtrotate name ax ay az angle — rotate about subtree bbox center
        (ImportExportPlugin.cxx:862-967)."""
        name = args[0]
        vals = _floats(args, 1, 4)
        node = self._node(name)
        los, his = [], []
        for n in node.traverse():
            if n.mesh is not None:
                m = n.mesh.transformed(n.world_transform())
                lo, hi = m.bounds()
                los.append(lo)
                his.append(hi)
        center = ((np.min(los, axis=0) + np.max(his, axis=0)) / 2
                  if los else np.zeros(3))
        rot = (_translate(center) @ _axis_angle(vals[0:3], vals[3])
               @ _translate(-center))
        node.transform = rot @ node.transform
        self.session.scene.touch()
        return ""

    # =======================================================================
    # rendering / io
    # =======================================================================
    def cmd_render(self, args):
        """render [spp] — progressive render at the session view size."""
        spp = int(args[0]) if args else 16
        from cadrays_tpu.integrator.progressive import progressive_step

        s = self.session
        data = s.scene.flatten(s.camera)
        s.progressive = progressive_step(data, s.camera, s.params,
                                         s.width, s.height, s.progressive,
                                         samples_per_step=spp)
        return f"spp={int(s.progressive.spp)}"

    def cmd_vdump(self, args):
        """vdump file [spp] — render + save (LDR png / HDR hdr/pfm,
        AppGui.cxx:337-509)."""
        from cadrays_tpu.core.tonemap import apply_tonemap, linear_to_srgb
        from cadrays_tpu.integrator.progressive import progressive_step
        from cadrays_tpu.utils.image import save_image

        path = self.session.resolve(args[0])
        spp = int(args[1]) if len(args) > 1 else 16
        s = self.session
        data = s.scene.flatten(s.camera)
        s.progressive = progressive_step(data, s.camera, s.params, s.width,
                                         s.height, s.progressive,
                                         samples_per_step=max(
                                             spp - (int(s.progressive.spp)
                                                    if s.progressive else 0),
                                             1))
        hdr = np.asarray(s.progressive.image)
        if path.lower().endswith((".hdr", ".pfm", ".exr")):
            save_image(path, hdr)
        else:
            ldr = linear_to_srgb(apply_tonemap(hdr, s.params.tonemap))
            save_image(path, np.asarray(ldr))
        return path

    def cmd_vreadpixel(self, args):
        x, y = int(args[0]), int(args[1])
        s = self.session
        if s.progressive is None:
            raise CommandError("no rendered image; run 'render' first")
        px = np.asarray(s.progressive.image)[y, x]
        return f"{px[0]:.6g} {px[1]:.6g} {px[2]:.6g}"

    def cmd_source(self, args):
        return self.source(self.session.resolve(args[0]))

    def cmd_rtexport(self, args):
        """rtexport dir [-draw] [-accum] — serialize the scene to a
        re-runnable script + assets (AppGui.cxx:199-213 export menu).
        -draw writes the DRAW-compatible shapes-only script
        (ImportExport.cxx:124-128); -accum checkpoints the accumulator."""
        from cadrays_tpu.scene.io import export_scene

        if not args:
            raise CommandError("rtexport: expected a directory")
        out = export_scene(
            self.session, self.session.resolve(args[0]),
            save_accumulator="-accum" in args,
            draw_compat="-draw" in args)
        return out

    def cmd_restore(self, args):
        """restore file.(brep|ply|obj|stl) [name] — DRAW's BREP restore
        (ImportSettingsEditor.cxx:290-316). .brep restores PARAMETRIC
        identity: a modeling SolidShape with per-face ids (typed explode,
        booleans and .brep re-export keep working); mesh formats stage
        plain triangles."""
        path = self.session.resolve(args[0])
        name = args[1] if len(args) > 1 else \
            os.path.splitext(os.path.basename(path))[0]
        if path.lower().endswith(".brep"):
            from cadrays_tpu.geometry.brep_writer import load_brep_solid

            try:
                self.session.staging[name] = (load_brep_solid(path),
                                              NodeType.CAD_SHAPE)
                return name
            except (ValueError, OSError):
                pass  # fall through to the mesh reader
        parts = _load_mesh_file(path)
        mesh = TriangleMesh.merge([p.mesh for p in parts])
        self.session.staging[name] = (mesh, NodeType.CAD_SHAPE)
        return name

    def cmd_vautofocus(self, args):
        """vautofocus [x y] — focal distance from pick depth
        (AppGui.cxx:78-94)."""
        from cadrays_tpu.ops.picking import autofocus

        s = self.session
        data = s.scene.flatten(s.camera)
        px = float(args[0]) if args else None
        py = float(args[1]) if len(args) > 1 else None
        s.camera = autofocus(data, s.camera, s.width, s.height, px, py)
        s.scene.camera = s.camera
        return f"focus {float(s.camera.focal_dist):.6g}"

    def cmd_vpick(self, args):
        """vpick x y — intersect the camera ray at a pixel; prints hit
        info (the selection primitive)."""
        from cadrays_tpu.ops.picking import pick

        s = self.session
        data = s.scene.flatten(s.camera)
        info = pick(data, s.camera, float(args[0]), float(args[1]),
                    s.width, s.height)
        if not info["hit"]:
            return "miss"
        p = info["position"]
        # mat_id indexes the flatten order of visible leaves -> resolve
        # the node name for the selection->edit flow
        # (AppGui.cxx onSelectionEvent:78-94)
        leaves = s.scene.model.leaves(visible_only=True)
        name = leaves[info["mat_id"]].name \
            if 0 <= info["mat_id"] < len(leaves) else "?"
        return (f"hit {name} t={info['t']:.6g} at {p[0]:.4g} {p[1]:.4g} "
                f"{p[2]:.4g} mat={info['mat_id']} tri={info['tri']}")

    def cmd_help(self, args):
        names = sorted(self._handlers)
        return "commands: " + " ".join(names) + \
            "\nmaterials: " + " ".join(preset_names())


def _onoff(args, i) -> bool:
    return args[i].lower() in ("1", "on", "true", "yes")


def primitives_face(mesh: TriangleMesh, k: int) -> TriangleMesh:
    """Extract box face k (0..5) from a 24-vertex box mesh."""
    v = mesh.vertices[4 * k:4 * (k + 1)]
    n = mesh.normals[4 * k:4 * (k + 1)]
    uv = mesh.uvs[4 * k:4 * (k + 1)] if mesh.uvs is not None else None
    return TriangleMesh(v, np.int32([[0, 1, 2], [0, 2, 3]]), n, uv)


def _load_mesh_file(path: str):
    from cadrays_tpu.geometry.loaders.obj import LoadedPart, load_obj
    from cadrays_tpu.geometry.loaders.ply import load_ply
    from cadrays_tpu.geometry.loaders.stl import load_stl

    low = path.lower()
    if low.endswith(".obj"):
        return load_obj(path)
    if low.endswith(".ply"):
        return [LoadedPart(mesh=load_ply(path))]
    if low.endswith(".stl"):
        return [LoadedPart(mesh=load_stl(path))]
    if low.endswith((".gltf", ".glb")):
        from cadrays_tpu.geometry.loaders.gltf import load_gltf

        return load_gltf(path)
    if low.endswith(".3ds"):
        from cadrays_tpu.geometry.loaders.t3ds import load_3ds

        return load_3ds(path)
    if low.endswith(".dxf"):
        from cadrays_tpu.geometry.loaders.dxf import load_dxf

        return load_dxf(path)
    from cadrays_tpu.geometry.cad import CAD_EXTENSIONS

    if low.endswith(CAD_EXTENSIONS):
        from cadrays_tpu.geometry.cad import load_cad

        try:
            return [LoadedPart(mesh=m) for m in load_cad(path)]
        except (RuntimeError, ValueError) as e:
            raise CommandError(str(e)) from e
    if low.endswith(".fbx"):
        from cadrays_tpu.geometry.loaders.fbx import load_fbx

        try:
            return load_fbx(path)
        except ValueError as e:
            raise CommandError(str(e)) from e
    if low.endswith(".blend"):
        # Native DNA-driven reader, classic MVert/MPoly/MLoop layout;
        # object transforms auto-pre-baked into the meshes — the
        # BLEND-specific semantics of ImportSettingsEditor.cxx:62-65.
        from cadrays_tpu.geometry.loaders.blend import load_blend

        try:
            return load_blend(path)
        except ValueError as e:
            raise CommandError(str(e)) from e
    raise CommandError(
        f"unsupported mesh format: {path} (obj/ply/stl/gltf/glb/3ds/dxf "
        "native; STEP/IGES/BREP via a CAD tessellation backend, "
        "geometry/cad.py)")


def _material_from_part(part) -> Material:
    """Assimp-material -> BSDF conversion semantics (AisMesh.cxx:304-346:
    diffuse/specular/emission colors, shininess -> roughness sqrt(2/(e+2)))."""
    kd = part.diffuse or (0.7, 0.7, 0.7)
    ks = part.specular or (0.0, 0.0, 0.0)
    le = part.emission or (0.0, 0.0, 0.0)
    rough = math.sqrt(2.0 / (max(part.shininess or 2.0, 0.0) + 2.0))
    return material(kd=kd, ks=ks, le=le, base_rough=rough)


def _attach_texture(session: Session, name: str, path: str,
                    scale: float = 1.0, slot: str = "kd") -> None:
    from cadrays_tpu.utils.image import load_image

    img = load_image(path)
    session.scene.set_texture(name, path, img, uv_scale=scale, slot=slot)


def _attach_part_textures(session: Session, name: str, part) -> None:
    """Kd + Ks texture pickup on import (AisMesh.cxx:321-332)."""
    if part.texture_path:
        _attach_texture(session, name, part.texture_path)
    ks_path = getattr(part, "ks_texture_path", None)
    if ks_path:
        _attach_texture(session, name, ks_path, slot="ks")


def make_console(session: Optional[Session] = None):
    """Best console for this interpreter: a real Tcl 8.6 interpreter
    (`cli/tcl.py`, matching the reference's embedded DRAW Tcl,
    main.cxx:44-55) when CPython's tkinter is present, else the plain
    line-by-line `Console`. Both expose `.exec(line)` / `.source(path)`."""
    try:
        from cadrays_tpu.cli.tcl import TclConsole

        return TclConsole(session)
    except Exception:
        return Console(session)
