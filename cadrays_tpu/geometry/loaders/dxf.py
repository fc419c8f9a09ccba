"""AutoCAD DXF loader (own implementation, no assimp).

Capability contract: the reference's import dialog offers .dxf through
Assimp (ImportSettingsEditor.cxx:199-277). Covered here: ASCII DXF
ENTITIES section with `3DFACE` entities (tri/quad faces, quads fan-split)
and `POLYLINE` polyface meshes (flag 64: VERTEX records carrying either
mesh vertices (flag 128+64) or face indices (flag 128)); faces are
grouped per layer into LoadedParts (Assimp groups DXF by layer too).
Smooth normals are generated — DXF stores none.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from cadrays_tpu.geometry.loaders.obj import LoadedPart
from cadrays_tpu.geometry.mesh import TriangleMesh


def _pairs(path: str):
    with open(path, "r", errors="replace") as f:
        lines = [ln.rstrip("\r\n") for ln in f]
    for i in range(0, len(lines) - 1, 2):
        try:
            code = int(lines[i].strip())
        except ValueError:
            continue
        yield code, lines[i + 1].strip()


def load_dxf(path: str) -> List[LoadedPart]:
    # per-layer triangle soup
    layers: Dict[str, List[np.ndarray]] = {}

    it = iter(_pairs(path))
    in_entities = False
    cur: Dict = {}

    def flush_3dface(e: Dict) -> None:
        pts = []
        for k in range(4):
            try:
                pts.append((float(e.get((10 + k), 0.0)),
                            float(e.get((20 + k), 0.0)),
                            float(e.get((30 + k), 0.0))))
            except (TypeError, ValueError):
                return
        layer = e.get("layer", "0")
        tris = layers.setdefault(layer, [])
        p = np.asarray(pts, np.float32)
        tris.append(p[[0, 1, 2]])
        # 4th corner distinct -> quad, fan-split
        if not np.allclose(p[2], p[3]):
            tris.append(p[[0, 2, 3]])

    def parse_polyline(first: Dict):
        """POLYLINE ... VERTEX* ... SEQEND (polyface mesh)."""
        verts: List[Tuple[float, float, float]] = []
        faces: List[Tuple[int, ...]] = []
        layer = first.get("layer", "0")
        e: Dict = {}
        kind = None
        for code, val in it:
            if code == 0:
                if kind == "VERTEX":
                    flags = int(float(e.get(70, 0)))
                    if flags & 128 and not flags & 64:  # face record
                        idx = [int(float(e.get(c, 0))) for c in (71, 72, 73, 74)]
                        idx = [abs(i) for i in idx if int(i) != 0]
                        if len(idx) >= 3:
                            faces.append(tuple(i - 1 for i in idx))
                    else:
                        verts.append((float(e.get(10, 0.0)),
                                      float(e.get(20, 0.0)),
                                      float(e.get(30, 0.0))))
                e = {}
                kind = val.upper()
                if kind == "SEQEND":
                    break
                if kind != "VERTEX":
                    break
            else:
                e[code] = val
        if verts and faces:
            v = np.asarray(verts, np.float32)
            tris = layers.setdefault(layer, [])
            for fc in faces:
                if max(fc) >= len(v):
                    continue
                tris.append(v[list(fc[:3])])
                if len(fc) == 4:
                    tris.append(v[[fc[0], fc[2], fc[3]]])

    kind = None
    for code, val in it:
        if code == 0:
            if kind == "3DFACE" and in_entities:
                flush_3dface(cur)
            up = val.upper()
            if up == "SECTION":
                cur = {}
                kind = "SECTION"
                continue
            if up == "ENDSEC":
                in_entities = False
                kind = None
                continue
            kind = up
            cur = {}
            if in_entities and up == "POLYLINE":
                parse_polyline(cur)
                kind = None
        elif code == 2 and kind == "SECTION":
            in_entities = val.upper() == "ENTITIES"
        elif code == 8:
            cur["layer"] = val
        elif kind == "3DFACE":
            cur[code] = val
    if kind == "3DFACE" and in_entities:
        flush_3dface(cur)

    parts: List[LoadedPart] = []
    for layer in sorted(layers):
        soup = np.stack(layers[layer])  # (T, 3, 3)
        # weld identical corners so normals smooth across shared edges
        flat = soup.reshape(-1, 3)
        uniq, inv = np.unique(flat.round(6), axis=0, return_inverse=True)
        mesh = TriangleMesh(uniq.astype(np.float32),
                            inv.reshape(-1, 3).astype(np.int32))
        mesh.compute_vertex_normals()
        parts.append(LoadedPart(mesh=mesh, material_name=layer))
    if not parts:
        raise ValueError(
            f"{path}: no 3DFACE/polyface-mesh entities found (2D-only DXF?)")
    return parts


def save_dxf(path: str, mesh: TriangleMesh, layer: str = "0") -> None:
    """Minimal 3DFACE writer (round-trip/testing aid)."""
    out = ["0", "SECTION", "2", "ENTITIES"]
    v = mesh.vertices
    for tri in mesh.indices:
        out += ["0", "3DFACE", "8", layer]
        corners = [v[tri[0]], v[tri[1]], v[tri[2]], v[tri[2]]]
        for k, p in enumerate(corners):
            out += [str(10 + k), repr(float(p[0])),
                    str(20 + k), repr(float(p[1])),
                    str(30 + k), repr(float(p[2]))]
    out += ["0", "ENDSEC", "0", "EOF"]
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
