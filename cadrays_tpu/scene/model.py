"""Named scene graph: DataNode / DataModel.

Capability contract (reference src/ImportExport/DataNode.cxx, DataModel.cxx):
* nodes are named, names unique model-wide; collisions repaired with an
  `_N` suffix (DataNode.cxx:83-112);
* node types CadShape vs PolyMesh, kept under two roots "Shapes"/"Meshes"
  (DataModel.hxx:77-81);
* recursive Show/Hide with tri-state visibility (DataNode.cxx:304-473);
* Explode splits a node into per-face/per-part children inheriting the
  material; Compose merges children back (DataNode.cxx:479-686);
* BFS Traverse (DataNode.cxx:167-194).

Host-side pure Python — device code only ever sees the flattened
SceneData. Transforms are 4x4 numpy affine matrices.
"""
from __future__ import annotations

import enum
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

from cadrays_tpu.core.bsdf import Material, material
from cadrays_tpu.geometry.mesh import TriangleMesh


class NodeType(enum.Enum):
    CAD_SHAPE = "shape"
    POLY_MESH = "mesh"
    GROUP = "group"


class Visibility(enum.Enum):
    HIDDEN = 0
    VISIBLE = 1
    PARTIAL = 2  # some children visible (tri-state eye, DataNode.cxx:430-473)


def _identity() -> np.ndarray:
    return np.eye(4, dtype=np.float32)


class DataNode:
    """A named scene node: either a leaf carrying a mesh + material, or a
    group with children."""

    def __init__(
        self,
        name: str,
        node_type: NodeType = NodeType.POLY_MESH,
        mesh: Optional[TriangleMesh] = None,
        mat: Optional[Material] = None,
        transform: Optional[np.ndarray] = None,
    ):
        self.name = name
        self.node_type = node_type
        self.mesh = mesh
        self.material: Material = mat if mat is not None else material()
        self.transform = transform if transform is not None else _identity()
        self.visible = True
        self.children: List["DataNode"] = []
        self.parent: Optional["DataNode"] = None
        self.texture_path: Optional[str] = None
        # parametric origin (a modeling Shape) when displayed from the
        # modeling kernel/restore: lets scene export persist the shape as
        # .brep instead of baked triangles (ImportExport.cxx:69-81)
        self.source_shape = None

    # -- structure ---------------------------------------------------------
    @property
    def is_leaf(self) -> bool:
        return not self.children

    def add_child(self, node: "DataNode") -> "DataNode":
        node.parent = self
        self.children.append(node)
        return node

    def traverse(self) -> Iterator["DataNode"]:
        """BFS over the subtree including self (DataNode.cxx:167-194)."""
        queue = [self]
        while queue:
            n = queue.pop(0)
            yield n
            queue.extend(n.children)

    def world_transform(self) -> np.ndarray:
        m = self.transform
        p = self.parent
        while p is not None:
            m = p.transform @ m
            p = p.parent
        return m

    # -- visibility --------------------------------------------------------
    def show(self, recursive: bool = True) -> None:
        self.visible = True
        if recursive:
            for c in self.children:
                c.show(True)

    def hide(self, recursive: bool = True) -> None:
        self.visible = False
        if recursive:
            for c in self.children:
                c.hide(True)

    def visibility(self) -> Visibility:
        if self.is_leaf:
            return Visibility.VISIBLE if self.visible else Visibility.HIDDEN
        states = {c.visibility() for c in self.children}
        if states == {Visibility.VISIBLE} and self.visible:
            return Visibility.VISIBLE
        if states == {Visibility.HIDDEN} or not self.visible:
            return Visibility.HIDDEN
        return Visibility.PARTIAL

    # -- explode / compose -------------------------------------------------
    def explode(self, splitter: Optional[Callable[[TriangleMesh], List[TriangleMesh]]] = None,
                registrar: Optional[Callable[[str], str]] = None) -> List["DataNode"]:
        """Split a leaf mesh into child nodes, one per connected face group
        (or per `splitter` output), each inheriting material + transform
        (DataNode.cxx:479-564)."""
        if self.mesh is None:
            return []
        parts = splitter(self.mesh) if splitter else split_by_connectivity(self.mesh)
        if len(parts) <= 1:
            return []
        self.children = []
        for i, part in enumerate(parts):
            name = f"{self.name}_{i + 1}"
            if registrar:
                name = registrar(name)
            child = DataNode(name, self.node_type, part, self.material,
                             _identity())
            child.visible = self.visible
            self.add_child(child)
        self.mesh = None
        self.node_type = NodeType.GROUP if self.node_type is NodeType.GROUP \
            else self.node_type
        return self.children

    def compose(self) -> None:
        """Merge all child leaf meshes back into this node
        (DataNode.cxx:570-686). Children's transforms are baked in."""
        meshes = []
        for c in self.traverse():
            if c is self or c.mesh is None:
                continue
            rel = np.linalg.inv(self.transform) @ c.world_transform()
            meshes.append(c.mesh.transformed(rel))
        if not meshes:
            return
        self.mesh = TriangleMesh.merge(meshes)
        self.children = []


def split_by_connectivity(mesh: TriangleMesh) -> List[TriangleMesh]:
    """Split a mesh into vertex-connected components (explode fallback for
    meshes without face metadata)."""
    T = mesh.num_triangles
    parent = list(range(mesh.num_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for t in range(T):
        i0, i1, i2 = mesh.indices[t]
        union(int(i0), int(i1))
        union(int(i1), int(i2))

    comp_of_tri = np.array([find(int(mesh.indices[t, 0])) for t in range(T)])
    comps = np.unique(comp_of_tri)
    parts = []
    for c in comps:
        tris = mesh.indices[comp_of_tri == c]
        used = np.unique(tris)
        remap = np.full(mesh.num_vertices, -1, np.int32)
        remap[used] = np.arange(used.size, dtype=np.int32)
        parts.append(TriangleMesh(
            mesh.vertices[used], remap[tris],
            None if mesh.normals is None else mesh.normals[used],
            None if mesh.uvs is None else mesh.uvs[used],
        ))
    return parts


class DataModel:
    """Two-root registry (Shapes / Meshes) with unique names
    (DataModel.hxx:77-81, DataContext name reservation)."""

    def __init__(self):
        self.shapes_root = DataNode("Shapes", NodeType.GROUP)
        self.meshes_root = DataNode("Meshes", NodeType.GROUP)
        self._names: Dict[str, DataNode] = {}
        # material link groups (MaterialEditor.cxx:512-529, 548-563):
        # nodes in one group share a material — editing any of them
        # updates all. Stored as name -> group id; unlink leaves the
        # node with a private copy of the current material.
        self._mat_links: Dict[str, int] = {}
        self._next_link_id = 0

    # -- names -------------------------------------------------------------
    def unique_name(self, name: str) -> str:
        """Collision-repair with `_N` suffix (DataNode.cxx:83-112)."""
        if name not in self._names:
            return name
        i = 1
        while f"{name}_{i}" in self._names:
            i += 1
        return f"{name}_{i}"

    def register(self, node: DataNode) -> None:
        node.name = self.unique_name(node.name)
        self._names[node.name] = node

    def rename(self, old: str, new: str) -> str:
        node = self._names.pop(old)
        node.name = self.unique_name(new)
        self._names[node.name] = node
        return node.name

    # -- add / get / remove --------------------------------------------------
    def add(self, node: DataNode) -> DataNode:
        root = (self.shapes_root if node.node_type is NodeType.CAD_SHAPE
                else self.meshes_root)
        self.register(node)
        for sub in node.traverse():
            if sub is not node:
                self.register(sub)
        root.add_child(node)
        return node

    def has(self, name: str) -> bool:
        return name in self._names

    def get(self, name: str) -> Optional[DataNode]:
        return self._names.get(name)

    def remove(self, name: str) -> bool:
        node = self._names.get(name)
        if node is None:
            return False
        for sub in list(node.traverse()):
            self._names.pop(sub.name, None)
            self._mat_links.pop(sub.name, None)
        if node.parent is not None:
            node.parent.children.remove(node)
        return True

    def group(self, names: List[str], group_name: str = "Group") -> Optional[DataNode]:
        """Group sibling nodes under a new parent (rtgroup,
        ImportExportPlugin.cxx:464-602)."""
        nodes = [self._names[n] for n in names if n in self._names]
        if not nodes:
            return None
        parent = nodes[0].parent
        if any(n.parent is not parent for n in nodes):
            return None
        grp = DataNode(self.unique_name(group_name),
                       nodes[0].node_type)
        self._names[grp.name] = grp
        idx = parent.children.index(nodes[0])
        for n in nodes:
            parent.children.remove(n)
        parent.children.insert(idx, grp)
        grp.parent = parent
        for n in nodes:
            grp.add_child(n)
        return grp

    # -- material links ----------------------------------------------------
    def link_materials(self, src: str, dst: str) -> None:
        """Join dst into src's material link group; dst adopts src's
        material immediately (MaterialEditor.cxx:512-529)."""
        if src not in self._names or dst not in self._names:
            raise KeyError(src if src not in self._names else dst)
        gid = self._mat_links.get(src)
        if gid is None:
            gid = self._next_link_id
            self._next_link_id += 1
            self._mat_links[src] = gid
        self._mat_links[dst] = gid
        mat = self._names[src].material
        for n in self._names[dst].traverse():
            n.material = mat

    def unlink_material(self, name: str) -> bool:
        """Detach from its group; the node keeps a private copy of the
        current material (MaterialEditor.cxx:548-563)."""
        return self._mat_links.pop(name, None) is not None

    def linked_names(self, name: str) -> List[str]:
        """All names sharing `name`'s material group (incl. itself)."""
        gid = self._mat_links.get(name)
        if gid is None:
            return [name]
        return sorted(n for n, g in self._mat_links.items() if g == gid)

    def link_groups(self) -> List[List[str]]:
        groups: Dict[int, List[str]] = {}
        for n, g in self._mat_links.items():
            groups.setdefault(g, []).append(n)
        return [sorted(v) for _, v in sorted(groups.items())
                if len(v) > 1]

    def leaves(self, visible_only: bool = True) -> List[DataNode]:
        out = []
        for root in (self.shapes_root, self.meshes_root):
            for n in root.traverse():
                if n.mesh is not None and (not visible_only or n.visible):
                    out.append(n)
        return out

    def nodes(self) -> List[DataNode]:
        return list(self._names.values())
