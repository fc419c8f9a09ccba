"""Two-level BVH: per-mesh BLAS + TLAS over instances.

Capability contract: the reference's engine keeps "per-object BLAS +
scene TLAS rebuilt on transforms" [OCCT-contract, SURVEY.md §2.5]. Here:

* each unique mesh gets one BLAS in *object* space (cached across
  flattens, built natively);
* the TLAS is built over world-space instance AABBs (max_leaf = 1);
* the two levels are fused into ONE threaded node array so the stream
  traversal stays a single loop: every TLAS leaf becomes a "bridge"
  node whose descend pointer jumps to its instance's BLAS root, and the
  BLAS exit-skips are rewired to the bridge's skip. `node_inst` tags
  each node with its instance (-1 for TLAS/world), and the traversal
  transforms block rays into object space with `inst_inv` (direction
  left unnormalized so t stays world-parameterized).

Editing a transform therefore rebuilds only the TLAS + fixups (O(#inst)),
not the meshes' BVHs — the property that makes interactive manipulation
(gizmo drags, rtrotate) cheap on big CAD scenes.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from cadrays_tpu.core.bsdf import Material, concat_materials
from cadrays_tpu.core.lights import Lights, empty_lights
from cadrays_tpu.geometry.bvh import ThreadedBVH, build_bvh
from cadrays_tpu.geometry.mesh import TriangleMesh
from cadrays_tpu.scene.flatten import (
    EmissiveData,
    EnvMapData,
    GeometryData,
    SceneData,
    TextureAtlas,
    _empty_envmap,
    _empty_textures,
    _to_device,
)

def _mesh_blas(mesh: TriangleMesh):
    """BLAS + reordered object-space arrays, cached ON the mesh object
    (an id()-keyed global cache would go stale when a freed mesh's id is
    recycled — the cache must share the mesh's lifetime)."""
    key = (id(mesh.vertices), id(mesh.indices))
    cached = getattr(mesh, "_blas_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    m = mesh
    if m.normals is None:
        m.compute_vertex_normals()
    uv = m.uvs if m.uvs is not None else np.zeros((m.num_vertices, 2),
                                                  np.float32)
    bvh = build_bvh(m.vertices, m.indices)
    out = (bvh, m.vertices, m.normals, uv, m.indices[bvh.order])
    mesh._blas_cache = (key, out)
    return out


def _transform_aabb(lo, hi, m):
    """Exact AABB of a transformed AABB (per-axis corner extremes)."""
    lin = m[:3, :3]
    t = m[:3, 3]
    c = (lo + hi) * 0.5
    e = (hi - lo) * 0.5
    center = lin @ c + t
    extent = np.abs(lin) @ e
    return center - extent, center + extent


def build_instanced(
    meshes: Sequence[TriangleMesh],
    transforms: Sequence[np.ndarray],
    materials: Sequence[Material],
    mat_ids: Sequence[int],
    lights: Optional[Lights] = None,
    envmap: Optional[EnvMapData] = None,
    textures: Optional[TextureAtlas] = None,
) -> SceneData:
    """Assemble a two-level SceneData; meshes[i] is instanced with
    transforms[i] (4x4 world matrix) and material mat_ids[i]."""
    n_inst = len(meshes)
    if n_inst == 0:
        raise ValueError("cannot flatten an empty scene")

    # BLAS per UNIQUE mesh object (assemblies repeat parts; building the
    # SAH tree once per distinct mesh also feeds the shared-BLAS wide
    # structure below)
    _blas_cache: dict = {}

    def _blas_of(m):
        k = id(m)
        if k not in _blas_cache:
            _blas_cache[k] = _mesh_blas(m)
        return _blas_cache[k]

    blases = [_blas_of(m) for m in meshes]

    # ---- instance world AABBs + TLAS (leaf = 1 instance) ---------------
    inst_lo = np.zeros((n_inst, 3), np.float32)
    inst_hi = np.zeros((n_inst, 3), np.float32)
    for i, (bvh, *_rest) in enumerate(blases):
        inst_lo[i], inst_hi[i] = _transform_aabb(
            bvh.node_min[0], bvh.node_max[0],
            np.asarray(transforms[i], np.float32))
    # build the TLAS with the triangle SAH builder over degenerate
    # "triangles" at box corners? No — dedicated box build via the python
    # builder on virtual triangles is wasteful; reuse build over boxes by
    # synthesizing two corner points per box as a degenerate triangle.
    tlas = _build_tlas(inst_lo, inst_hi)

    # ---- fuse node arrays ----------------------------------------------
    Nt = tlas.skip.shape[0]
    blas_sizes = [b[0].skip.shape[0] for b in blases]
    tri_counts = [b[4].shape[0] for b in blases]
    # order BLAS copies by TLAS leaf order (= tlas.order)
    inst_order = tlas.order  # instance i at leaf position
    blas_offset = {}
    off = Nt
    tri_off = {}
    toff = 0
    voff = {}
    vo = 0
    for inst in inst_order:
        blas_offset[int(inst)] = off
        off += blas_sizes[int(inst)]
        tri_off[int(inst)] = toff
        toff += tri_counts[int(inst)]
        voff[int(inst)] = vo
        vo += blases[int(inst)][1].shape[0]
    N = off
    T = toff
    V = vo

    node_min = np.zeros((N, 3), np.float32)
    node_max = np.zeros((N, 3), np.float32)
    skip = np.full(N, -1, np.int32)
    descend = np.zeros(N, np.int64)
    first = np.full(N, -1, np.int32)
    count = np.zeros(N, np.int32)
    node_inst = np.full(N, -1, np.int32)

    # TLAS portion
    node_min[:Nt] = tlas.node_min
    node_max[:Nt] = tlas.node_max
    skip[:Nt] = tlas.skip
    descend[:Nt] = np.arange(Nt) + 1
    # TLAS leaves -> bridge nodes
    leaf_mask = tlas.count > 0
    leaf_ids = np.nonzero(leaf_mask)[0]
    for ln in leaf_ids:
        inst = int(tlas.order[tlas.first[ln]])  # leaf holds one instance
        descend[ln] = blas_offset[inst]
    # mark TLAS leaves as inner (bridge): count=0, first=-1 already

    vertices = np.zeros((V, 3), np.float32)
    normals = np.zeros((V, 3), np.float32)
    uvs = np.zeros((V, 2), np.float32)
    tri_v = np.zeros((T, 3), np.int32)
    tri_mat = np.zeros(T, np.int32)
    tri_inst = np.zeros(T, np.int32)

    for inst in inst_order:
        inst = int(inst)
        bvh, v, nrm, uv, tv = blases[inst]
        o = blas_offset[inst]
        n = blas_sizes[inst]
        to = tri_off[inst]
        tc = tri_counts[inst]
        vo2 = voff[inst]
        node_min[o:o + n] = bvh.node_min
        node_max[o:o + n] = bvh.node_max
        # the bridge node that jumps here:
        bridge = [ln for ln in leaf_ids
                  if int(tlas.order[tlas.first[ln]]) == inst][0]
        exit_skip = tlas.skip[bridge]
        skip[o:o + n] = np.where(bvh.skip >= 0, bvh.skip + o, exit_skip)
        descend[o:o + n] = np.arange(o, o + n) + 1
        leaf = bvh.count > 0
        first[o:o + n] = np.where(leaf, bvh.first + to, -1)
        count[o:o + n] = bvh.count
        node_inst[o:o + n] = inst
        vertices[vo2:vo2 + v.shape[0]] = v
        normals[vo2:vo2 + v.shape[0]] = nrm
        uvs[vo2:vo2 + v.shape[0]] = uv
        tri_v[to:to + tc] = tv + vo2
        tri_mat[to:to + tc] = mat_ids[inst]
        tri_inst[to:to + tc] = inst

    # ---- packed tables --------------------------------------------------
    assert T < (1 << 24)
    nodes_packed = np.zeros((N, 8), np.float32)
    nodes_packed[:, 0:3] = node_min
    nodes_packed[:, 3:6] = node_max
    nodes_packed[:, 6] = skip.view(np.float32)
    leafbits = np.where(count > 0,
                        first.astype(np.int64)
                        | (count.astype(np.int64) << 24),
                        -descend - 2).astype(np.int32)
    nodes_packed[:, 7] = leafbits.view(np.float32)

    # 128 spare zero rows (HBM-streamed wide kernel window overrun pad)
    tris_packed = np.zeros((max(T, 1) + 128, 12), np.float32)
    p0 = vertices[tri_v[:, 0]]
    p1 = vertices[tri_v[:, 1]]
    p2 = vertices[tri_v[:, 2]]
    tris_packed[:T, 0:3] = p0
    tris_packed[:T, 3:6] = p1 - p0
    tris_packed[:T, 6:9] = p2 - p0
    tris_packed[:T, 9] = tri_mat.view(np.float32)

    inst_inv = np.zeros((n_inst, 3, 4), np.float32)
    inst_tf = np.zeros((n_inst, 3, 4), np.float32)
    for i, tf in enumerate(transforms):
        m = np.asarray(tf, np.float64)
        inst_inv[i] = np.linalg.inv(m)[:3, :4].astype(np.float32)
        inst_tf[i] = m[:3, :4].astype(np.float32)

    from cadrays_tpu.geometry.wide_bvh import build_wide_bvh
    from cadrays_tpu.scene.flatten import _HBM_TRIS_THRESHOLD, build_tris_hbm

    # ---- shared-BLAS wide structure (round 4) --------------------------
    # Group instances by (mesh identity, material): each group's BLAS
    # appears ONCE in the wide tree (build_wide_bvh memoizes the shared
    # subtree; the bridge slot carries the instance id). Leaf triangle
    # ranges index a COMPACT per-group table — often 10-100x smaller than
    # the fused one and VMEM-resident at assembly scale — and the kernel
    # adds wdelta[inst] to hits to recover fused per-instance ids.
    group_key = [(id(meshes[i]), int(mat_ids[i])) for i in range(n_inst)]
    group_of: dict = {}
    group_rep: list = []
    for i in range(n_inst):
        if group_key[i] not in group_of:
            group_of[group_key[i]] = len(group_rep)
            group_rep.append(i)
    group_idx = [group_of[group_key[i]] for i in range(n_inst)]
    G = len(group_rep)

    g_nodes = [blas_sizes[group_rep[g]] for g in range(G)]
    g_tris = [tri_counts[group_rep[g]] for g in range(G)]
    g_node_off = np.concatenate([[Nt], Nt + np.cumsum(g_nodes)])[:G]
    g_tri_off = np.concatenate([[0], np.cumsum(g_tris)])[:G]
    Tw = int(sum(g_tris))
    Nw = Nt + int(sum(g_nodes))

    w_min = np.zeros((Nw, 3), np.float32)
    w_max = np.zeros((Nw, 3), np.float32)
    w_skip = np.full(Nw, -1, np.int32)
    w_desc = np.arange(1, Nw + 1, dtype=np.int64)
    w_first = np.full(Nw, -1, np.int32)
    w_count = np.zeros(Nw, np.int32)
    w_inst = np.full(Nw, -1, np.int32)

    w_min[:Nt] = tlas.node_min
    w_max[:Nt] = tlas.node_max
    w_skip[:Nt] = tlas.skip
    for ln in leaf_ids:
        inst = int(tlas.order[tlas.first[ln]])
        w_desc[ln] = g_node_off[group_idx[inst]]
        w_inst[ln] = inst  # the bridge carries the instance id
    for g in range(G):
        bvh = blases[group_rep[g]][0]
        o = int(g_node_off[g])
        n = g_nodes[g]
        w_min[o:o + n] = bvh.node_min
        w_max[o:o + n] = bvh.node_max
        w_skip[o:o + n] = np.where(bvh.skip >= 0, bvh.skip + o, -1)
        leaf = bvh.count > 0
        w_first[o:o + n] = np.where(leaf, bvh.first + g_tri_off[g], -1)
        w_count[o:o + n] = bvh.count

    bridge_mask = np.zeros(Nw, bool)
    bridge_mask[leaf_ids] = True  # TLAS leaves became bridges
    wl = 64
    wide = build_wide_bvh(w_min, w_max, w_skip, w_first, w_count,
                          descend=w_desc, node_inst=w_inst,
                          bridge=bridge_mask, wide_leaf=wl)

    wtris_packed = np.zeros((Tw + 128, 12), np.float32)
    for g in range(G):
        rep = group_rep[g]
        src = tri_off[rep]
        wtris_packed[g_tri_off[g]:g_tri_off[g] + g_tris[g]] = \
            tris_packed[src:src + g_tris[g]]
    wdelta = np.asarray(
        [tri_off[i] - g_tri_off[group_idx[i]] for i in range(n_inst)],
        np.int32)

    geom = GeometryData(
        vertices=jnp.asarray(vertices),
        normals=jnp.asarray(normals),
        uvs=jnp.asarray(uvs),
        tri_v=jnp.asarray(tri_v),
        tri_mat=jnp.asarray(tri_mat),
        bvh_min=jnp.asarray(node_min),
        bvh_max=jnp.asarray(node_max),
        bvh_skip=jnp.asarray(skip),
        bvh_first=jnp.asarray(first),
        bvh_count=jnp.asarray(count),
        nodes_packed=jnp.asarray(nodes_packed),
        tris_packed=jnp.asarray(tris_packed),
        node_inst=jnp.asarray(node_inst),
        tri_inst=jnp.asarray(tri_inst),
        inst_inv=jnp.asarray(inst_inv),
        inst_tf=jnp.asarray(inst_tf),
        instanced=True,
        wboxes=jnp.asarray(wide.wboxes),
        wmeta=jnp.asarray(wide.wmeta),
        winst=jnp.asarray(wide.winst),
        worder=jnp.asarray(wide.worder),
        wide_leaf=wide.max_leaf,
        wide_depth=wide.max_depth,
        wtris_packed=jnp.asarray(wtris_packed),
        wtris_hbm=(build_tris_hbm(wtris_packed)
                   if wtris_packed.shape[0] > _HBM_TRIS_THRESHOLD
                   else jnp.zeros((1, 128), jnp.float32)),
        wdelta=jnp.asarray(wdelta),
        inst_lo=jnp.asarray(inst_lo),
        inst_hi=jnp.asarray(inst_hi),
        inst_bridge=jnp.asarray(_bridge_metas(wide, n_inst)),
    )

    mat_table = concat_materials(list(materials))
    emissive = _build_emissive_instanced(vertices, tri_v, tri_mat, tri_inst,
                                         transforms, mat_table)
    return SceneData(
        geometry=geom,
        materials=_to_device(mat_table),
        lights=_to_device(lights if lights is not None else empty_lights()),
        envmap=envmap if envmap is not None else _empty_envmap(),
        emissive=emissive,
        textures=textures if textures is not None else _empty_textures(),
    )


def _bridge_metas(wide, n_inst: int) -> np.ndarray:
    """Per-instance wide-tree entry: the (meta) slot value the TLAS
    pushes when a packet enters instance i — each TLAS leaf holds one
    instance, so every instance appears in exactly one (node, slot) of
    `winst` (shared-BLAS groups repeat the same meta, which is fine).
    Consumed by the per-ray candidate traversal (trace_wide_rebinned)."""
    out = np.full(n_inst, 0x7FFFFFFF, np.int32)
    wi = np.asarray(wide.winst)
    wm = np.asarray(wide.wmeta)
    sel = wi >= 0
    out[wi[sel]] = wm[sel]
    return out


def _build_tlas(lo: np.ndarray, hi: np.ndarray) -> ThreadedBVH:
    """SAH build over instance boxes using degenerate triangles whose
    AABBs equal the instance boxes (diagonal corner triple)."""
    n = lo.shape[0]
    verts = np.zeros((2 * n, 3), np.float32)
    verts[0::2] = lo
    verts[1::2] = hi
    tris = np.stack([np.arange(n) * 2, np.arange(n) * 2 + 1,
                     np.arange(n) * 2], axis=1).astype(np.int32)
    return build_bvh(verts, tris, max_leaf=1, backend="python")


def _build_emissive_instanced(vertices, tri_v, tri_mat, tri_inst,
                              transforms, mats: Material) -> EmissiveData:
    le = np.asarray(mats.le)
    lum = le @ np.float32([0.2126, 0.7152, 0.0722])
    tri_lum = lum[np.asarray(tri_mat)]
    if not np.any(tri_lum > 0):
        return EmissiveData(
            tri_idx=jnp.zeros((1,), jnp.int32),
            cdf=jnp.ones((1,), jnp.float32),
            area=jnp.ones((1,), jnp.float32),
            total_power=jnp.float32(0.0),
            count=0,
        )
    # world-space areas: transform the emissive triangles
    tfs = np.stack([np.asarray(t, np.float32) for t in transforms])
    lin = tfs[tri_inst][:, :3, :3]  # (T, 3, 3)
    p0 = np.einsum("tij,tj->ti", lin, vertices[tri_v[:, 0]])
    p1 = np.einsum("tij,tj->ti", lin, vertices[tri_v[:, 1]])
    p2 = np.einsum("tij,tj->ti", lin, vertices[tri_v[:, 2]])
    area = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=-1)
    power = tri_lum * area
    sel = np.nonzero(power > 0.0)[0]
    p = power[sel]
    cdf = np.cumsum(p)
    total = cdf[-1]
    return EmissiveData(
        tri_idx=jnp.asarray(sel.astype(np.int32)),
        cdf=jnp.asarray((cdf / total).astype(np.float32)),
        area=jnp.asarray(area[sel].astype(np.float32)),
        total_power=jnp.float32(total),
        count=int(sel.size),
    )
