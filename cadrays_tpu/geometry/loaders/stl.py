"""STL loader (binary + ascii) — triangle soup with face normals."""
from __future__ import annotations

import numpy as np

from cadrays_tpu.geometry.mesh import TriangleMesh


def load_stl(path: str) -> TriangleMesh:
    with open(path, "rb") as f:
        head = f.read(80)
        rest = f.read()
    if head[:5].lower() == b"solid" and b"facet" in rest[:2000]:
        try:
            return _load_ascii(path)
        except ValueError:
            pass
    n_tri = int(np.frombuffer(rest[:4], "<u4")[0])
    dt = np.dtype([("n", "<f4", 3), ("v", "<f4", (3, 3)), ("attr", "<u2")])
    data = np.frombuffer(rest[4:4 + dt.itemsize * n_tri], dt)
    verts = data["v"].reshape(-1, 3).astype(np.float32)
    idx = np.arange(verts.shape[0], dtype=np.int32).reshape(-1, 3)
    mesh = _weld(verts, idx)
    mesh.compute_vertex_normals()
    return mesh


def _load_ascii(path: str) -> TriangleMesh:
    verts = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            toks = line.split()
            if toks and toks[0] == "vertex":
                verts.append([float(toks[1]), float(toks[2]), float(toks[3])])
    if not verts or len(verts) % 3:
        raise ValueError(f"{path}: malformed ascii STL")
    v = np.asarray(verts, np.float32)
    idx = np.arange(v.shape[0], dtype=np.int32).reshape(-1, 3)
    mesh = _weld(v, idx)
    mesh.compute_vertex_normals()
    return mesh


def _weld(verts: np.ndarray, idx: np.ndarray) -> TriangleMesh:
    """Merge exactly-equal vertices so smooth normals work."""
    uniq, inverse = np.unique(verts.round(6), axis=0, return_inverse=True)
    return TriangleMesh(uniq.astype(np.float32),
                        inverse[idx.reshape(-1)].reshape(-1, 3).astype(np.int32))
