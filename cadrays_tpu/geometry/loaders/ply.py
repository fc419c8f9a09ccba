"""PLY loader/writer (ascii + binary_little_endian).

The reference round-trips meshes through binary PLY on scene export
(AisMesh::ExportToFile via Assimp "plyb", AisMesh.cxx:431-495;
re-imported by rtmeshread on scene load, ImportExport.cxx:84-93). This
module provides the same round-trip natively.
"""
from __future__ import annotations

import struct
from typing import List, Optional

import numpy as np

from cadrays_tpu.geometry.mesh import TriangleMesh

_PLY_TYPES = {
    "char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1",
    "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
    "int": "i4", "uint": "u4", "int32": "i4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def load_ply(path: str) -> TriangleMesh:
    with open(path, "rb") as f:
        line = f.readline().strip()
        if line != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype) | ('list', idx_t, cnt_t, name)])
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unterminated PLY header")
            toks = line.decode("ascii", "replace").split()
            if not toks:
                continue
            if toks[0] == "comment":
                continue
            if toks[0] == "format":
                fmt = toks[1]
            elif toks[0] == "element":
                elements.append([toks[1], int(toks[2]), []])
            elif toks[0] == "property":
                if toks[1] == "list":
                    elements[-1][2].append(("list", _PLY_TYPES[toks[2]],
                                            _PLY_TYPES[toks[3]], toks[4]))
                else:
                    elements[-1][2].append((toks[2], _PLY_TYPES[toks[1]]))
            elif toks[0] == "end_header":
                break

        verts = norms = uvs = None
        tris: List[List[int]] = []

        for name, count, props in elements:
            if fmt == "ascii":
                rows = [f.readline().split() for _ in range(count)]
                if name == "vertex":
                    names = [p[0] for p in props]
                    data = np.asarray(rows, np.float64)
                    verts, norms, uvs = _vertex_arrays(names, data)
                elif name == "face":
                    for r in rows:
                        n = int(r[0])
                        poly = [int(x) for x in r[1:1 + n]]
                        for k in range(1, n - 1):
                            tris.append([poly[0], poly[k], poly[k + 1]])
            else:
                endian = "<" if "little" in fmt else ">"
                if name == "vertex" and all(p[0] != "list" for p in props):
                    dt = np.dtype([(p[0], endian + p[1]) for p in props])
                    data = np.frombuffer(f.read(dt.itemsize * count), dt)
                    names = [p[0] for p in props]
                    cols = np.stack([data[p[0]].astype(np.float64)
                                     for p in props], axis=1)
                    verts, norms, uvs = _vertex_arrays(names, cols)
                elif name == "face":
                    for _ in range(count):
                        cnt_t = props[0][1]
                        idx_t = props[0][2]
                        n = int(np.frombuffer(
                            f.read(np.dtype(cnt_t).itemsize),
                            endian + cnt_t)[0])
                        poly = np.frombuffer(
                            f.read(np.dtype(idx_t).itemsize * n),
                            endian + idx_t).astype(np.int64)
                        for k in range(1, n - 1):
                            tris.append([int(poly[0]), int(poly[k]),
                                         int(poly[k + 1])])
                else:  # skip unknown binary element conservatively
                    raise ValueError(f"unsupported PLY element {name}")

    if verts is None:
        raise ValueError(f"{path}: no vertex element")
    mesh = TriangleMesh(verts.astype(np.float32),
                        np.asarray(tris, np.int32),
                        None if norms is None else norms.astype(np.float32),
                        None if uvs is None else uvs.astype(np.float32))
    if mesh.normals is None:
        mesh.compute_vertex_normals()
    return mesh


def _vertex_arrays(names, data):
    def col(*keys):
        idx = [names.index(k) for k in keys if k in names]
        return data[:, idx] if len(idx) == len(keys) else None

    verts = col("x", "y", "z")
    norms = col("nx", "ny", "nz")
    uvs = col("s", "t") if col("s", "t") is not None else col("u", "v")
    return verts, norms, uvs


def save_ply(path: str, mesh: TriangleMesh, binary: bool = True) -> None:
    v = mesh.vertices
    n = mesh.normals
    uv = mesh.uvs
    props = ["property float x", "property float y", "property float z"]
    if n is not None:
        props += ["property float nx", "property float ny", "property float nz"]
    if uv is not None:
        props += ["property float s", "property float t"]
    header = "\n".join([
        "ply",
        "format binary_little_endian 1.0" if binary else "format ascii 1.0",
        "comment cadrays_tpu export",
        f"element vertex {mesh.num_vertices}",
        *props,
        f"element face {mesh.num_triangles}",
        "property list uchar int vertex_indices",
        "end_header",
    ]) + "\n"

    cols = [v]
    if n is not None:
        cols.append(n)
    if uv is not None:
        cols.append(uv)
    vdata = np.concatenate(cols, axis=1).astype("<f4")

    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if binary:
            f.write(vdata.tobytes())
            for tri in mesh.indices:
                f.write(struct.pack("<Biii", 3, *[int(x) for x in tri]))
        else:
            for row in vdata:
                f.write((" ".join(f"{x:.7g}" for x in row) + "\n").encode())
            for tri in mesh.indices:
                f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n".encode())
