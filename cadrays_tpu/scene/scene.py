"""User-facing Scene: node tree + lights + environment + textures, with
cached flattening to the device SceneData.

This is the analogue of the reference's `model::DataModel` + viewer state
(lights live on the V3d viewer, env map on the view): one object that the
command surface (cli/commands.py) and the Python API both mutate, and
which knows how to produce the flat device snapshot that jitted renders
consume. Any mutation bumps a dirty flag; `flatten()` rebuilds (including
the BVH — the reference likewise rebuilds acceleration structures on
scene edits [OCCT-contract]).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from cadrays_tpu.core.bsdf import Material, material
from cadrays_tpu.core.camera import Camera
from cadrays_tpu.core.lights import (
    Lights,
    concat_lights,
    directional_light,
    empty_lights,
)
from cadrays_tpu.geometry.mesh import TriangleMesh
from cadrays_tpu.scene.flatten import (
    EnvMapData,
    SceneData,
    build_envmap,
    build_texture_atlas,
    flatten_parts,
)
from cadrays_tpu.scene.model import DataModel, DataNode, NodeType


class Scene:
    def __init__(self):
        self.model = DataModel()
        self._lights: List[Lights] = [
            directional_light(direction=(-0.25, -1.0, -1.0), intensity=1.0,
                              smooth_angle_deg=0.0, headlight=True)
        ]
        self._envmap: Optional[EnvMapData] = None
        self._textures: List[np.ndarray] = []
        self._texture_ids: Dict[str, int] = {}
        self.camera: Camera = Camera.look_at()
        self._dirty = True
        self._cache: Optional[SceneData] = None
        self._version = 0  # bumped on every mutation (restart fingerprint)

    # -- mutation helpers --------------------------------------------------
    def touch(self) -> None:
        self._dirty = True
        self._version += 1

    def add_mesh(self, name: str, mesh: TriangleMesh,
                 mat: Optional[Material] = None,
                 transform: Optional[np.ndarray] = None,
                 node_type: NodeType = NodeType.POLY_MESH) -> DataNode:
        node = DataNode(name, node_type, mesh, mat, transform)
        self.model.add(node)
        self.touch()
        return node

    def add_shape(self, name: str, mesh: TriangleMesh,
                  mat: Optional[Material] = None,
                  transform: Optional[np.ndarray] = None) -> DataNode:
        return self.add_mesh(name, mesh, mat, transform, NodeType.CAD_SHAPE)

    def remove(self, name: str) -> bool:
        ok = self.model.remove(name)
        if ok:
            self.touch()
        return ok

    def clear(self) -> None:
        """vclear analogue (AppGui.cxx:275-301)."""
        self.model = DataModel()
        self.touch()

    def set_material(self, name: str, mat: Material) -> None:
        """Set material on `name` and every node in its material link
        group (one edit updates all linked objects —
        MaterialEditor.cxx:512-529)."""
        if self.model.get(name) is None:
            raise KeyError(name)
        for linked in self.model.linked_names(name):
            node = self.model.get(linked)
            if node is None:
                continue
            for n in node.traverse():
                n.material = mat
        self.touch()

    def set_transform(self, name: str, transform: np.ndarray) -> None:
        node = self.model.get(name)
        if node is None:
            raise KeyError(name)
        node.transform = np.asarray(transform, np.float32)
        self.touch()

    # -- lights ------------------------------------------------------------
    @property
    def lights(self) -> List[Lights]:
        return self._lights

    def add_light(self, light: Lights) -> int:
        self._lights.append(light)
        self.touch()
        return len(self._lights) - 1

    def clear_lights(self) -> None:
        self._lights = []
        self.touch()

    def remove_light(self, index: int) -> None:
        del self._lights[index]
        self.touch()

    def change_light(self, index: int, **updates) -> None:
        """Update single-light fields (vlight change semantics)."""
        import jax

        lt = self._lights[index]
        for k, val in updates.items():
            arr = np.asarray(getattr(lt, k)).copy()
            arr[0] = val
            lt = lt.replace(**{k: arr})
        self._lights[index] = lt
        self.touch()

    # -- environment -------------------------------------------------------
    def set_envmap(self, image: np.ndarray, intensity: float = 1.0,
                   background: bool = True) -> None:
        self._envmap = build_envmap(image, intensity, background)
        self.touch()

    def clear_envmap(self) -> None:
        self._envmap = None
        self.touch()

    def set_env_background(self, on: bool) -> None:
        if self._envmap is not None:
            self._envmap = self._envmap.replace(background=bool(on))
            self.touch()

    @property
    def envmap(self) -> Optional[EnvMapData]:
        return self._envmap

    # -- textures ----------------------------------------------------------
    def add_texture(self, key: str, image: np.ndarray) -> int:
        """Register a texture image (linear float RGB); returns its id."""
        if key in self._texture_ids:
            return self._texture_ids[key]
        tid = len(self._textures)
        self._textures.append(np.asarray(image, np.float32))
        self._texture_ids[key] = tid
        self.touch()
        return tid

    def set_texture(self, name: str, key: str, image: np.ndarray,
                    uv_scale: float = 1.0, slot: str = "kd") -> None:
        """Attach a texture to a node's material (rttexture semantics).

        slot "kd" modulates the diffuse lobe (the rttexture surface),
        "ks" the glossy lobe (import-time Ks map pickup,
        AisMesh.cxx:321-332). Shapes without usable UVs are
        parameterized on attach — the DataNode::Parameterize analogue
        (DataNode.cxx:200-298): CAD surface parameters are normalized
        per face, UV-less meshes get a box projection.
        """
        from cadrays_tpu.geometry.parameterize import parameterize_mesh

        tid = self.add_texture(key, image)
        node = self.model.get(name)
        if node is None:
            raise KeyError(name)
        field = {"kd": "tex_id", "ks": "ks_tex_id"}[slot]
        for n in node.traverse():
            if n.mesh is not None:
                # idempotent: generates/normalizes only when the UV set
                # is absent, degenerate, or outside [0,1]
                n.mesh = parameterize_mesh(n.mesh)
            n.material = n.material.replace(
                uv_scale=np.float32([uv_scale]),
                **{field: np.int32([tid])})
        self.touch()

    # -- flattening --------------------------------------------------------
    def flatten(self, camera: Optional[Camera] = None,
                instancing: bool = False) -> SceneData:
        """Produce (and cache) the device snapshot of the visible scene.

        instancing=False bakes transforms into world-space vertices and
        builds one BVH (best traversal quality; full rebuild on edits).
        instancing=True builds a TLAS over cached per-mesh BLASes
        (scene/instances.py) — transform edits only rebuild the TLAS.
        """
        if self._cache is not None and not self._dirty:
            return self._update_headlights(self._cache, camera)
        leaves = self.model.leaves(visible_only=True)
        if not leaves:
            raise ValueError("scene has no visible geometry")
        lights = (concat_lights(self._lights) if self._lights
                  else empty_lights())
        atlas = build_texture_atlas(self._textures) if self._textures else None
        if instancing:
            from cadrays_tpu.scene.instances import build_instanced

            data = build_instanced(
                [n.mesh for n in leaves],
                [n.world_transform() for n in leaves],
                [n.material for n in leaves],
                list(range(len(leaves))),
                lights=lights, envmap=self._envmap, textures=atlas)
        else:
            meshes, mats, mat_ids = [], [], []
            for i, node in enumerate(leaves):
                meshes.append(node.mesh.transformed(node.world_transform()))
                mats.append(node.material)
                mat_ids.append(i)
            data = flatten_parts(meshes, mats, mat_ids, lights=lights,
                                 envmap=self._envmap, textures=atlas)
        data = data.replace(version=self._version)
        self._cache = data
        self._dirty = False
        return self._update_headlights(data, camera)

    def _update_headlights(self, data: SceneData,
                           camera: Optional[Camera]) -> SceneData:
        """Headlight directional lights follow the camera forward axis
        (LightSourcesEditor.cxx:219-224)."""
        cam = camera or self.camera
        if data.lights.count == 0:
            return data
        import jax.numpy as jnp

        fwd = cam.basis()[2]
        is_head = (data.lights.headlight > 0.0)[:, None]
        vec = jnp.where(is_head, fwd[None, :], data.lights.vec)
        return data.replace(lights=data.lights.replace(vec=vec))
