#!/usr/bin/env python
"""CAD-at-scale benchmark on an assembly of DISTINCT parts.

The round-4 CAD bench (bench/cad_scale.py) proves assembly scale only
for self-similar geometry: its 100 instanced tori dedup to ONE 5.3k-tri
VMEM-resident BLAS, so the HBM-streamed triangle path — the production
path for real CAD assemblies, where parts are genuinely different
(reference capability: OCCT two-level BVH "at any scene size",
/root/reference/README.md:16-18) — is never on the hot path.  This bench
closes that gap:

  * >= 48 UNIQUE part meshes (parametric families x per-part deformation
    so no two tessellations share data), >= 600k unique triangles —
    the compact wide-BLAS table cannot fit VMEM, so `trace()` dispatches
    to the deferred-leaf HBM DMA pipeline (ops/pallas_wide.py).
  * realistic bounce rays: primary camera hits -> cosine-hemisphere
    resampling at the actual surface points, sorted by the production
    coherence key — the workload the renderer actually issues, not the
    uniform-random adversarial set.
  * an end-to-end 1024^2 depth-5 persistent render of the assembly,
    reported as full-frame spp/s (the same metric as cad_scale.json's
    dedup'd case: 2.62).

Writes a `distinct_parts` section into bench/cad_scale.json.  Slope
timing throughout (chained traces inside one jit; the tunnel makes
per-call wall timing meaningless — bench/ROOFLINE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def slope_time(make_loop, iters=(1, 4), reps=2):
    lo, hi = iters
    ts = {}
    for n in (lo, hi):
        f = make_loop(n)
        sync(f())
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f())
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def _deform(mesh, seed, amp=0.08):
    """Displace vertices along their normals with a per-part harmonic
    field: every part's triangle data becomes unique (defeats any dedup
    by construction) while staying watertight and CAD-plausible
    (machined/cast surface detail)."""
    from cadrays_tpu.geometry.mesh import TriangleMesh

    rng = np.random.default_rng(seed)
    f = rng.uniform(1.5, 6.0, size=3)
    ph = rng.uniform(0, 2 * np.pi, size=3)
    v = np.asarray(mesh.vertices, np.float32)
    n = np.asarray(mesh.normals, np.float32)
    h = (np.sin(f[0] * v[:, 0] + ph[0])
         * np.sin(f[1] * v[:, 1] + ph[1])
         * np.sin(f[2] * v[:, 2] + ph[2])).astype(np.float32)
    v2 = v + n * (amp * h)[:, None]
    return TriangleMesh(vertices=v2, indices=np.asarray(mesh.indices),
                        normals=n, uvs=np.asarray(mesh.uvs))


def build_parts(n_parts=48, min_tris=600_000):
    """n_parts unique meshes totalling >= min_tris triangles."""
    from cadrays_tpu.geometry.primitives import (box, cone, cylinder,
                                                 sphere, torus)

    parts = []
    i = 0
    while len(parts) < n_parts:
        fam = i % 5
        if fam == 0:
            m = torus(1.0 + 0.2 * (i % 3), 0.25 + 0.02 * (i % 5),
                      96 + 8 * (i % 4), 64 + 8 * (i % 3))
        elif fam == 1:
            m = sphere(0.9 + 0.1 * (i % 4), 96 + 16 * (i % 3),
                       64 + 8 * (i % 4))
        elif fam == 2:
            m = cylinder(0.5 + 0.1 * (i % 3), 1.6 + 0.2 * (i % 4),
                         384 + 64 * (i % 3))
        elif fam == 3:
            m = cone(0.8 + 0.1 * (i % 3), 0.15 + 0.05 * (i % 4),
                     1.7, 512 + 64 * (i % 3))
        else:
            m = torus(1.3, 0.5 - 0.04 * (i % 5), 80 + 16 * (i % 3),
                      56 + 8 * (i % 4))
        parts.append(_deform(m, seed=1000 + i))
        i += 1
    total = sum(p.indices.shape[0] for p in parts)
    # add further unique high-res parts until the assembly clears min_tris
    k = 0
    while total < min_tris:
        extra = torus(1.0 + 0.07 * (k % 7), 0.28 + 0.015 * (k % 5),
                      128, 96)
        parts.append(_deform(extra, seed=5000 + k))
        total += extra.indices.shape[0]
        k += 1
    return parts


def build_scene(n_parts=48):
    from cadrays_tpu.core.bsdf import material
    from cadrays_tpu.core.camera import Camera
    from cadrays_tpu.core.lights import positional_light
    from cadrays_tpu.scene.instances import build_instanced

    parts = build_parts(n_parts)
    n = len(parts)
    side = int(np.ceil(np.sqrt(n)))
    rng = np.random.default_rng(11)
    tfs = []
    for k in range(n):
        i, j = divmod(k, side)
        m = np.eye(4, dtype=np.float32)
        ang = rng.uniform(0, np.pi)
        c, s = np.cos(ang), np.sin(ang)
        m[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]],
                             np.float32) @ np.array(
            [[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
        m[:3, 3] = (i * 3.4, j * 3.4, rng.uniform(0.0, 1.2))
        tfs.append(m)
    mats = [material(kd=(0.75, 0.72, 0.68)),
            material(kd=(0.35, 0.45, 0.75), ks=(0.2, 0.2, 0.2),
                     base_rough=0.3)]
    mat_ids = [k % 2 for k in range(n)]
    ext = side * 3.4
    lights = positional_light(position=(ext / 2, -ext * 0.3, ext * 1.2),
                              intensity=900.0)
    data = build_instanced(parts, tfs, mats, mat_ids, lights=lights)
    cam = Camera.look_at(eye=(ext / 2, -ext * 0.75, ext * 0.6),
                         at=(ext / 2, ext / 2, 0.4), up=(0, 0, 1),
                         fovy_deg=45.0)
    return data, cam


def realistic_bounce_rays(geom, cam, W=1024, H=1024, quarter=4, seed=5):
    """Bounce rays the renderer actually issues at depth>=2: origins on
    visible part surfaces (primary-hit positions), cosine-hemisphere
    directions about the geometric normal, production coherence sort."""
    from cadrays_tpu.ops.traverse import _coherence_key, trace

    R = W * H // quarter
    # stride over the FULL frame (a contiguous arange covers only the
    # top rows, which see mostly sky above the assembly)
    pids = jnp.arange(R, dtype=jnp.int32) * quarter
    px = (pids % W).astype(jnp.float32)
    py = (pids // W).astype(jnp.float32)
    o, d = cam.generate_rays(px, py, jnp.zeros(R), jnp.zeros(R), W, H)
    res = trace(geom, o, d, jnp.full((R,), 1e30))
    res = jax.tree.map(np.asarray, res)
    o, d = np.asarray(o), np.asarray(d)

    hit = res["tri"] >= 0
    hit_idx = np.nonzero(hit)[0]
    assert hit_idx.size > R // 8, "camera must see the assembly"
    rng = np.random.default_rng(seed)
    src = hit_idx[rng.integers(0, hit_idx.size, R)]

    p = o[src] + res["t"][src, None] * d[src]
    rows = np.asarray(geom.tris_packed)[res["tri"][src]]
    n = np.cross(rows[:, 3:6], rows[:, 6:9])
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    # face the incoming ray
    n = np.where(np.sum(n * d[src], axis=-1, keepdims=True) > 0, -n, n)

    u1 = rng.uniform(0, 1, R).astype(np.float32)
    u2 = rng.uniform(0, 1, R).astype(np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    t_ax = np.cross(n, np.where(np.abs(n[:, 2:3]) < 0.9,
                                [0, 0, 1.0], [1.0, 0, 0]))
    t_ax /= np.maximum(np.linalg.norm(t_ax, axis=-1, keepdims=True), 1e-12)
    b_ax = np.cross(n, t_ax)
    local = np.stack([r * np.cos(phi), r * np.sin(phi),
                      np.sqrt(np.maximum(1 - u1, 0))], -1)
    d_b = (local[:, 0:1] * t_ax + local[:, 1:2] * b_ax
           + local[:, 2:3] * n).astype(np.float32)
    o_b = (p + n * 1e-3).astype(np.float32)

    key = _coherence_key(geom, jnp.asarray(o_b), jnp.asarray(d_b))
    perm = np.asarray(jnp.argsort(key))
    return jnp.asarray(o_b[perm]), jnp.asarray(d_b[perm])


def main():
    from cadrays_tpu.ops.pallas_wide import fits_wide, fits_wide_hbm, \
        trace_wide
    from cadrays_tpu.ops.traverse import trace

    t0 = time.time()
    data, cam = build_scene()
    geom = data.geometry
    T = int(geom.tri_v.shape[0])
    Tw = int(geom.wtris_packed.shape[0]) - 128
    n_inst = int(geom.inst_inv.shape[0])
    print(f"build {time.time()-t0:.1f}s: tris={T} unique={Tw} "
          f"instances={n_inst} wide_nodes={geom.wmeta.shape[0]} "
          f"fits_vmem={fits_wide(geom)} fits_hbm={fits_wide_hbm(geom)}",
          flush=True)
    assert Tw >= 600_000, Tw
    assert not fits_wide(geom), "distinct parts must exceed VMEM"
    assert fits_wide_hbm(geom), "HBM wide path must be available"

    W = H = 1024
    R = W * H // 4
    # strided over the full frame so the packet mix sees the assembly,
    # not just the sky rows above it
    pids = jnp.arange(R, dtype=jnp.int32) * 4
    px = (pids % W).astype(jnp.float32)
    py = (pids // W).astype(jnp.float32)
    o_coh, d_coh = cam.generate_rays(px, py, jnp.zeros(R), jnp.zeros(R),
                                     W, H)
    tmax = jnp.full((R,), 1e30)
    o_b, d_b = realistic_bounce_rays(geom, cam, W, H)
    print("bounce rays built", flush=True)

    def loop(fn, o_, d_, **kw):
        def make(n):
            @jax.jit
            def run(g, o0, d0):
                def body(i, carry):
                    oo, acc = carry
                    r = fn(g, oo, d0, tmax, **kw)
                    return oo + 0.0 * r["t"][:, None], acc + r["t"]
                _, acc = jax.lax.fori_loop(0, n, body, (o0, jnp.zeros(R)))
                return acc
            return lambda: run(geom, o_, d_)
        return make

    from cadrays_tpu.ops.pallas_wide import trace_wide_rebinned

    results = {"triangles": T, "unique_tris": Tw, "instances": n_inst,
               "hbm_path": True}
    cases = [
        ("hbm_coherent", trace_wide, o_coh, d_coh, {"hbm_tris": True}),
        ("hbm_bounce", trace_wide, o_b, d_b, {"hbm_tris": True}),
        ("hbm_bounce_anyhit", trace_wide, o_b, d_b,
         {"hbm_tris": True, "any_hit": True}),
        ("rebin_bounce", trace_wide_rebinned, o_b, d_b, {}),
    ]
    for tag, fn, o_, d_, kw in cases:
        dt = slope_time(loop(fn, o_, d_, **kw))
        results[tag] = {"ms": round(dt * 1e3, 3),
                        "Mray_s": round(R / dt / 1e6, 2)}
        print(f"{tag:18s} {dt*1e3:10.3f} ms  {R/dt/1e6:8.2f} Mray/s",
              flush=True)

    # ---- end-to-end 1024^2 depth-5 persistent render -------------------
    from cadrays_tpu.integrator.params import RenderParams
    from cadrays_tpu.integrator.persistent import render_persistent

    params = RenderParams(ray_depth=5)
    spp, Tn = 8, 26
    # full frame: all 4 pixel chunks rendered inside the jit (a single
    # contiguous chunk would cover only the sky rows above the parts)
    chunk_pids = jnp.stack([
        jnp.arange(c * R, (c + 1) * R, dtype=jnp.int32) for c in range(4)])

    def e2e(n):
        @jax.jit
        def run(g):
            def body(i, acc):
                pp = params.replace(seed=jnp.uint32(i))

                def chunk(c, a):
                    img, cnt = render_persistent(
                        data.replace(geometry=g), cam, pp, W, H, spp, Tn,
                        pixel_ids=chunk_pids[c])
                    return a + jnp.sum(cnt).astype(jnp.float32)
                return jax.lax.fori_loop(0, 4, chunk, acc)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return lambda: run(geom)

    dt = slope_time(e2e, iters=(1, 2))
    comp = float(e2e(1)())
    srate = comp / dt
    results["e2e_1024_depth5"] = {
        "ms_per_full_frame_8spp": round(dt * 1e3, 1),
        "samples_per_s": round(srate, 1),
        "spp_per_s_full_frame": round(srate / (W * H), 3),
    }
    print(f"e2e 1024^2 d5 distinct: {dt*1e3:.1f} ms / {int(comp)} samples"
          f" -> {srate/(W*H):.3f} full-frame spp/s", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "cad_scale.json")
    doc = {}
    if os.path.exists(out):
        with open(out) as f:
            doc = json.load(f)
    doc["distinct_parts"] = results
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
