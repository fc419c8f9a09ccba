"""Host-side triangle mesh container (numpy).

Device code never sees this class: scenes are flattened into SoA jnp
arrays (scene/flatten.py). Mirrors the capability of the reference's mesh
pipeline (MeshImporter.cxx:44-177, AisMesh.cxx:357-423): indexed triangles
with optional per-vertex normals and UVs, material grouping handled one
level up (one mesh = one material range).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class TriangleMesh:
    vertices: np.ndarray  # (V, 3) float32
    indices: np.ndarray  # (T, 3) int32
    normals: Optional[np.ndarray] = None  # (V, 3) float32 (per-vertex)
    uvs: Optional[np.ndarray] = None  # (V, 2) float32
    # Optional top-level sub-shape boundaries as (P, 2) triangle ranges:
    # set by `compound`, consumed by un-typed `explode` (DRAW splits a
    # compound into its sub-shapes, Materials.tcl:22-23).
    part_ranges: Optional[np.ndarray] = None
    # True when `uvs` holds RAW CAD surface parameters (STEP/IGES/BREP
    # tessellation) that need per-part [0,1] normalization at texture
    # attach; imported artist UVs (possibly intentionally tiled outside
    # [0,1]) keep this False and are never rewritten.
    raw_uvs: bool = False

    def __post_init__(self):
        self.vertices = np.ascontiguousarray(self.vertices, np.float32)
        self.indices = np.ascontiguousarray(self.indices, np.int32)
        if self.normals is not None:
            self.normals = np.ascontiguousarray(self.normals, np.float32)
        if self.uvs is not None:
            self.uvs = np.ascontiguousarray(self.uvs, np.float32)

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]

    def face_normals(self) -> np.ndarray:
        v = self.vertices
        i = self.indices
        e1 = v[i[:, 1]] - v[i[:, 0]]
        e2 = v[i[:, 2]] - v[i[:, 0]]
        fn = np.cross(e1, e2)
        n = np.linalg.norm(fn, axis=-1, keepdims=True)
        return (fn / np.maximum(n, 1e-20)).astype(np.float32)

    def areas(self) -> np.ndarray:
        v = self.vertices
        i = self.indices
        e1 = v[i[:, 1]] - v[i[:, 0]]
        e2 = v[i[:, 2]] - v[i[:, 0]]
        return (0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)).astype(np.float32)

    def compute_vertex_normals(self, angle_weighted: bool = False) -> "TriangleMesh":
        """Area-weighted smooth vertex normals (gensmooth semantics,
        MeshImporter.cxx:84-90 aiProcess_GenSmoothNormals analogue)."""
        fn = np.cross(
            self.vertices[self.indices[:, 1]] - self.vertices[self.indices[:, 0]],
            self.vertices[self.indices[:, 2]] - self.vertices[self.indices[:, 0]],
        )  # un-normalized = area-weighted
        vn = np.zeros_like(self.vertices)
        for k in range(3):
            np.add.at(vn, self.indices[:, k], fn)
        n = np.linalg.norm(vn, axis=-1, keepdims=True)
        self.normals = (vn / np.maximum(n, 1e-20)).astype(np.float32)
        return self

    def flip_normals(self) -> "TriangleMesh":
        self.indices = self.indices[:, [0, 2, 1]].copy()
        if self.normals is not None:
            self.normals = -self.normals
        return self

    def transformed(self, matrix: np.ndarray) -> "TriangleMesh":
        """Return a copy with a 4x4 affine transform applied."""
        m = np.asarray(matrix, np.float32)
        v = self.vertices @ m[:3, :3].T + m[:3, 3]
        n = None
        if self.normals is not None:
            inv = np.linalg.inv(m[:3, :3])
            n = self.normals @ inv  # inverse-transpose: N @ inv(M) == (inv(M).T @ N.T).T
            ln = np.linalg.norm(n, axis=-1, keepdims=True)
            n = (n / np.maximum(ln, 1e-20)).astype(np.float32)
        return TriangleMesh(v, self.indices.copy(), n,
                            None if self.uvs is None else self.uvs.copy(),
                            None if self.part_ranges is None
                            else self.part_ranges.copy())

    def bounds(self):
        return self.vertices.min(axis=0), self.vertices.max(axis=0)

    @staticmethod
    def merge(meshes) -> "TriangleMesh":
        vs, idx, ns, uvs = [], [], [], []
        off = 0
        has_n = all(m.normals is not None for m in meshes)
        has_uv = all(m.uvs is not None for m in meshes)
        for m in meshes:
            vs.append(m.vertices)
            idx.append(m.indices + off)
            if has_n:
                ns.append(m.normals)
            if has_uv:
                uvs.append(m.uvs)
            off += m.num_vertices
        return TriangleMesh(
            np.concatenate(vs),
            np.concatenate(idx),
            np.concatenate(ns) if has_n else None,
            np.concatenate(uvs) if has_uv else None,
        )
