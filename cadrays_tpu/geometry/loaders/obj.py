"""Wavefront OBJ loader (own implementation, no assimp).

Capability contract (reference MeshImporter.cxx:44-177 via Assimp):
triangulated import, polygon fan-triangulation, per-vertex normals/UVs,
material grouping (usemtl ranges -> separate meshes sorted/merged by
material like MeshImporter.cxx:112-145), optional MTL diffuse color and
map_Kd texture path pickup (AisMesh.cxx:304-346 semantics).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from cadrays_tpu.geometry.mesh import TriangleMesh


@dataclasses.dataclass
class LoadedPart:
    """One material group: mesh + resolved material hints."""

    mesh: TriangleMesh
    material_name: str = ""
    diffuse: Optional[Tuple[float, float, float]] = None
    specular: Optional[Tuple[float, float, float]] = None
    emission: Optional[Tuple[float, float, float]] = None
    shininess: Optional[float] = None
    texture_path: Optional[str] = None  # Kd map
    ks_texture_path: Optional[str] = None  # Ks map (AisMesh.cxx:321-332)


def _parse_mtl(path: str) -> Dict[str, dict]:
    mats: Dict[str, dict] = {}
    cur = None
    try:
        with open(path, "r", errors="replace") as f:
            for line in f:
                parts = line.split()
                if not parts or parts[0].startswith("#"):
                    continue
                key = parts[0].lower()
                if key == "newmtl":
                    cur = parts[1] if len(parts) > 1 else ""
                    mats[cur] = {}
                elif cur is None:
                    continue
                elif key in ("kd", "ks", "ke") and len(parts) >= 4:
                    mats[cur][key] = tuple(float(x) for x in parts[1:4])
                elif key == "ns" and len(parts) >= 2:
                    mats[cur]["ns"] = float(parts[1])
                elif key in ("map_kd", "map_ks") and len(parts) >= 2:
                    mats[cur][key] = parts[-1]
    except OSError:
        pass
    return mats


def load_obj(path: str, group_by_material: bool = True) -> List[LoadedPart]:
    positions: List[Tuple[float, float, float]] = []
    normals: List[Tuple[float, float, float]] = []
    uvs: List[Tuple[float, float]] = []
    mtl_defs: Dict[str, dict] = {}
    # faces per material: list of (pos_idx, uv_idx, nrm_idx) triangles
    faces: Dict[str, list] = {}
    cur_mat = ""

    def resolve(idx: int, n: int) -> int:
        return idx - 1 if idx > 0 else n + idx

    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            tag = parts[0]
            if tag == "v":
                positions.append(tuple(float(x) for x in parts[1:4]))
            elif tag == "vn":
                normals.append(tuple(float(x) for x in parts[1:4]))
            elif tag == "vt":
                uvs.append((float(parts[1]), float(parts[2]) if len(parts) > 2 else 0.0))
            elif tag == "usemtl":
                cur_mat = parts[1] if len(parts) > 1 else ""
            elif tag == "mtllib" and len(parts) > 1:
                mtl_defs.update(_parse_mtl(
                    os.path.join(os.path.dirname(path), parts[1])))
            elif tag == "f":
                corners = []
                for vert in parts[1:]:
                    toks = vert.split("/")
                    vi = resolve(int(toks[0]), len(positions))
                    ti = resolve(int(toks[1]), len(uvs)) \
                        if len(toks) > 1 and toks[1] else -1
                    ni = resolve(int(toks[2]), len(normals)) \
                        if len(toks) > 2 and toks[2] else -1
                    corners.append((vi, ti, ni))
                key = cur_mat if group_by_material else ""
                tris = faces.setdefault(key, [])
                for k in range(1, len(corners) - 1):  # fan triangulation
                    tris.append((corners[0], corners[k], corners[k + 1]))

    pos = np.asarray(positions, np.float32)
    nrm = np.asarray(normals, np.float32) if normals else None
    tex = np.asarray(uvs, np.float32) if uvs else None

    parts_out: List[LoadedPart] = []
    for mat_name, tris in faces.items():
        # de-duplicate (v, vt, vn) corner tuples into vertices
        corner_map: Dict[Tuple[int, int, int], int] = {}
        verts, vnorm, vuv, idx = [], [], [], []
        for tri in tris:
            face_idx = []
            for c in tri:
                if c not in corner_map:
                    corner_map[c] = len(verts)
                    verts.append(pos[c[0]])
                    vuv.append(tex[c[1]] if (tex is not None and c[1] >= 0)
                               else (0.0, 0.0))
                    vnorm.append(nrm[c[2]] if (nrm is not None and c[2] >= 0)
                                 else (0.0, 0.0, 0.0))
                face_idx.append(corner_map[c])
            idx.append(face_idx)
        v = np.asarray(verts, np.float32)
        n = np.asarray(vnorm, np.float32)
        has_normals = bool(np.any(np.abs(n) > 1e-12))
        mesh = TriangleMesh(
            v, np.asarray(idx, np.int32),
            n if has_normals else None,
            np.asarray(vuv, np.float32) if tex is not None else None,
        )
        if not has_normals:
            mesh.compute_vertex_normals()
        d = mtl_defs.get(mat_name, {})
        parts_out.append(LoadedPart(
            mesh=mesh,
            material_name=mat_name,
            diffuse=d.get("kd"),
            specular=d.get("ks"),
            emission=d.get("ke"),
            shininess=d.get("ns"),
            texture_path=(os.path.join(os.path.dirname(path), d["map_kd"])
                          if "map_kd" in d else None),
            ks_texture_path=(os.path.join(os.path.dirname(path), d["map_ks"])
                             if "map_ks" in d else None),
        ))
    # deterministic material order (reference sorts by material index,
    # MeshImporter.cxx:112-121)
    parts_out.sort(key=lambda p: p.material_name)
    return parts_out
