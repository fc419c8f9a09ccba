"""glTF 2.0 loader (.gltf + .glb), no external deps.

Extends the import surface beyond the reference's Assimp formats with the
modern interchange standard: indexed triangles, per-vertex NORMAL /
TEXCOORD_0, node-hierarchy transforms baked, per-primitive material
(baseColorFactor/-Texture, emissiveFactor, metallic/roughness mapped onto
the layered BSDF convention used by rtmeshread import).
"""
from __future__ import annotations

import base64
import json
import os
import struct
from typing import List, Optional

import numpy as np

from cadrays_tpu.geometry.loaders.obj import LoadedPart
from cadrays_tpu.geometry.mesh import TriangleMesh

_COMPONENT_DTYPE = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16, 5123: np.uint16,
    5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNT = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _load_buffers(doc: dict, base_dir: str, glb_bin: Optional[bytes]):
    out = []
    for buf in doc.get("buffers", []):
        uri = buf.get("uri")
        if uri is None:
            out.append(glb_bin)
        elif uri.startswith("data:"):
            out.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            with open(os.path.join(base_dir, uri), "rb") as f:
                out.append(f.read())
    return out


def _accessor(doc, buffers, idx):
    acc = doc["accessors"][idx]
    view = doc["bufferViews"][acc["bufferView"]]
    dtype = _COMPONENT_DTYPE[acc["componentType"]]
    ncomp = _TYPE_COUNT[acc["type"]]
    count = acc["count"]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride", 0)
    raw = buffers[view["buffer"]]
    itemsize = np.dtype(dtype).itemsize * ncomp
    if stride and stride != itemsize:
        rows = []
        for i in range(count):
            start = offset + i * stride
            rows.append(np.frombuffer(raw, dtype, ncomp, start))
        data = np.stack(rows)
    else:
        data = np.frombuffer(raw, dtype, count * ncomp, offset).reshape(
            count, ncomp)
    return data


def _node_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    if "scale" in node:
        m = m @ np.diag(list(node["scale"]) + [1.0]).astype(np.float32)
    if "rotation" in node:
        x, y, z, w = node["rotation"]
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w), 0],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w), 0],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y), 0],
            [0, 0, 0, 1]], np.float32)
        m = r @ m
    if "translation" in node:
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = node["translation"]
        m = t @ m
    return m


def load_gltf(path: str) -> List[LoadedPart]:
    base_dir = os.path.dirname(path)
    glb_bin = None
    if path.lower().endswith(".glb"):
        with open(path, "rb") as f:
            magic, _ver, _length = struct.unpack("<III", f.read(12))
            if magic != 0x46546C67:
                raise ValueError(f"{path}: not a GLB file")
            doc = None
            while True:
                head = f.read(8)
                if len(head) < 8:
                    break
                clen, ctype = struct.unpack("<II", head)
                data = f.read(clen)
                if ctype == 0x4E4F534A:  # JSON
                    doc = json.loads(data)
                elif ctype == 0x004E4942:  # BIN
                    glb_bin = data
        if doc is None:
            raise ValueError(f"{path}: GLB missing JSON chunk")
    else:
        with open(path, "r") as f:
            doc = json.load(f)

    buffers = _load_buffers(doc, base_dir, glb_bin)
    mats = doc.get("materials", [])

    # flatten node hierarchy -> (mesh_idx, world_matrix)
    instances = []

    def walk(node_idx, parent_m):
        node = doc["nodes"][node_idx]
        m = parent_m @ _node_matrix(node)
        if "mesh" in node:
            instances.append((node["mesh"], m))
        for c in node.get("children", []):
            walk(c, m)

    scene_idx = doc.get("scene", 0)
    scenes = doc.get("scenes", [{}])
    roots = scenes[scene_idx].get("nodes", [])
    if roots:
        for r in roots:
            walk(r, np.eye(4, dtype=np.float32))
    else:
        instances = [(i, np.eye(4, dtype=np.float32))
                     for i in range(len(doc.get("meshes", [])))]

    parts: List[LoadedPart] = []
    for mesh_idx, world in instances:
        mesh = doc["meshes"][mesh_idx]
        for prim in mesh.get("primitives", []):
            if prim.get("mode", 4) != 4:  # triangles only
                continue
            attrs = prim["attributes"]
            pos = _accessor(doc, buffers, attrs["POSITION"]).astype(np.float32)
            nrm = (_accessor(doc, buffers, attrs["NORMAL"]).astype(np.float32)
                   if "NORMAL" in attrs else None)
            uv = (_accessor(doc, buffers, attrs["TEXCOORD_0"]).astype(np.float32)
                  if "TEXCOORD_0" in attrs else None)
            if "indices" in prim:
                idx = _accessor(doc, buffers, prim["indices"]).reshape(-1, 3)
            else:
                idx = np.arange(pos.shape[0], dtype=np.int64).reshape(-1, 3)
            tm = TriangleMesh(pos, idx.astype(np.int32), nrm, uv)
            tm = tm.transformed(world)
            if tm.normals is None:
                tm.compute_vertex_normals()

            diffuse = specular = emission = None
            shininess = None
            tex_path = None
            mname = ""
            if "material" in prim:
                md = mats[prim["material"]]
                mname = md.get("name", f"mat{prim['material']}")
                pbr = md.get("pbrMetallicRoughness", {})
                base = pbr.get("baseColorFactor", [1, 1, 1, 1])
                diffuse = tuple(base[:3])
                rough = pbr.get("roughnessFactor", 1.0)
                metal = pbr.get("metallicFactor", 1.0)
                if metal > 0.5:
                    specular = tuple(base[:3])
                    diffuse = (0.0, 0.0, 0.0)
                shininess = max(2.0 / max(rough * rough, 1e-3) - 2.0, 0.0)
                if "emissiveFactor" in md:
                    emission = tuple(md["emissiveFactor"])
                tex_idx = pbr.get("baseColorTexture", {}).get("index")
                if tex_idx is not None:
                    src = doc["textures"][tex_idx].get("source")
                    if src is not None:
                        uri = doc["images"][src].get("uri")
                        if uri and not uri.startswith("data:"):
                            tex_path = os.path.join(base_dir, uri)
            parts.append(LoadedPart(
                mesh=tm, material_name=mname, diffuse=diffuse,
                specular=specular, emission=emission, shininess=shininess,
                texture_path=tex_path))
    return parts
