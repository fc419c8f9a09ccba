#!/usr/bin/env python
"""CAD-assembly-scale traversal benchmark (>=500k triangles, instanced).

The reference handles any scene size through OCCT's two-level BVH
(README.md:16-18). This bench builds a 10x10 grid of instanced
high-resolution tori (~5k tris each -> ~500k instanced triangles,
TLAS->BLAS), and slope-times closest-hit traversal for coherent camera
rays and sorted bounce-like rays on:

  * wide_hbm — the BVH8 Pallas kernel with HBM-streamed triangle leaves
    (ops/pallas_wide.py, hbm_tris=True): the CAD-scale fast path;
  * stream   — the XLA packet loop (ops/traverse.trace_stream), the
    previous fallback for scenes too big for VMEM.

Writes bench/cad_scale.json. Timing is slope-based (N chained traces in
one jitted fori_loop; cost = (t_N - t_1)/(N-1)) because wall-clock
through the tunneled chip measures the tunnel, not the chip
(bench/ROOFLINE.md).
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


def slope_time(make_loop, iters=(1, 4)):
    lo, hi = iters
    ts = {}
    for n in (lo, hi):
        f = make_loop(n)
        sync(f())
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            sync(f())
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def build_scene(grid=10, torus_segments=72, torus_rings=36):
    from cadrays_tpu.core.bsdf import material
    from cadrays_tpu.core.camera import Camera
    from cadrays_tpu.geometry.primitives import torus
    from cadrays_tpu.scene.instances import build_instanced

    mesh = torus(1.0, 0.35, torus_segments, torus_rings)
    meshes, tfs = [], []
    rng = np.random.default_rng(7)
    for i in range(grid):
        for j in range(grid):
            m = np.eye(4, dtype=np.float32)
            ang = rng.uniform(0, np.pi)
            c, s = np.cos(ang), np.sin(ang)
            m[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]],
                                 np.float32) @ np.array(
                [[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
            m[:3, 3] = (i * 2.6, j * 2.6, rng.uniform(0, 1.5))
            meshes.append(mesh)
            tfs.append(m)
    data = build_instanced(meshes, tfs, [material(kd=(0.8, 0.8, 0.8))],
                           [0] * len(meshes))
    side = grid * 2.6
    cam = Camera.look_at(eye=(side / 2, -side * 0.8, side * 0.55),
                         at=(side / 2, side / 2, 0.5), up=(0, 0, 1),
                         fovy_deg=45.0)
    return data, cam


def main():
    from cadrays_tpu.ops.pallas_wide import fits_wide, fits_wide_hbm, \
        trace_wide
    from cadrays_tpu.ops.traverse import _coherence_key, trace_stream

    data, cam = build_scene()
    geom = data.geometry
    T = int(geom.tri_v.shape[0])
    print(f"tris={T} wide_nodes={geom.wmeta.shape[0]} "
          f"instances={geom.inst_inv.shape[0]} "
          f"fits_vmem={fits_wide(geom)} fits_hbm={fits_wide_hbm(geom)}",
          flush=True)
    assert T >= 500_000, T
    assert geom.instanced and (fits_wide(geom) or fits_wide_hbm(geom))

    W = H = 1024
    R = W * H // 4
    # strided over the full frame (round-5 correction: a contiguous
    # arange covers only the top rows, which look at sky over the grid)
    pids = jnp.arange(R, dtype=jnp.int32) * 4
    px = (pids % W).astype(jnp.float32)
    py = (pids // W).astype(jnp.float32)
    o_coh, d_coh = cam.generate_rays(px, py, jnp.zeros(R), jnp.zeros(R),
                                     W, H)
    tmax = jnp.full((R,), 1e30)

    # bounce-like rays: origins near the instances, random directions,
    # sorted with the production coherence key
    rng = np.random.default_rng(3)
    o = rng.uniform([0, 0, -1], [26, 26, 2], (R, 3)).astype(np.float32)
    d = rng.normal(0, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    key = _coherence_key(geom, jnp.asarray(o), jnp.asarray(d))
    perm = jnp.argsort(key)
    o_srt = jnp.asarray(o)[perm]
    d_srt = jnp.asarray(d)[perm]

    def loop(fn, o_, d_, **kw):
        def make(n):
            # geom passed as an argument: a closure-captured pytree gets
            # inlined as MLIR constants and the 500k-tri tables blow past
            # the remote-compile payload cap (HTTP 413)
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

    results = {"triangles": T, "instances": int(geom.inst_inv.shape[0]),
               "wide_unique_tris": int(geom.wtris_packed.shape[0]),
               "wide_vmem_resident": bool(fits_wide(geom))}
    # Round 4: shared-BLAS dedup collapses the 100 identical tori to one
    # 5.3k-tri VMEM-resident wide BLAS (wdelta remaps hit ids), so the
    # production path is the plain VMEM wide kernel — the HBM-streamed
    # variant now only serves assemblies of genuinely distinct parts.
    cases = [
        ("wide_coh", trace_wide, o_coh, d_coh, {}),
        ("wide_srt", trace_wide, o_srt, d_srt, {}),
        ("stream_coh", trace_stream, o_coh, d_coh, {}),
        ("stream_srt", trace_stream, o_srt, d_srt, {}),
    ]
    for tag, fn, o_, d_, kw in cases:
        dt = slope_time(loop(fn, o_, d_, **kw))
        results[tag] = {"ms": round(dt * 1e3, 3),
                        "Mray_s": round(R / dt / 1e6, 2)}
        print(f"{tag:14s} {dt*1e3:10.3f} ms  {R/dt/1e6:8.2f} Mray/s",
              flush=True)

    results["speedup_coh"] = round(
        results["stream_coh"]["ms"] / results["wide_coh"]["ms"], 2)
    results["speedup_srt"] = round(
        results["stream_srt"]["ms"] / results["wide_srt"]["ms"], 2)

    # ---- end-to-end: full render of the 518k-tri assembly at 1024^2 ----
    from cadrays_tpu.integrator.params import RenderParams
    from cadrays_tpu.integrator.persistent import render_persistent

    params = RenderParams(ray_depth=5)
    W = Hh = 1024
    Rr = W * Hh // 4
    spp, Tn = 8, 26
    # round-5 correction: render the FULL frame (all 4 chunks) — the
    # previous contiguous quarter covered only the sky rows above the
    # assembly, overstating spp/s
    chunk_pids = jnp.stack([
        jnp.arange(c * Rr, (c + 1) * Rr, dtype=jnp.int32)
        for c in range(4)])

    def e2e(n):
        @jax.jit
        def run(g):
            def body(i, acc):
                pp = params.replace(seed=jnp.uint32(i))

                def chunk(c, a):
                    img, cnt = render_persistent(
                        data.replace(geometry=g), cam, pp, W, Hh, spp,
                        Tn, pixel_ids=chunk_pids[c])
                    return a + jnp.sum(cnt).astype(jnp.float32)
                return jax.lax.fori_loop(0, 4, chunk, acc)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return lambda: run(geom)

    dt = slope_time(e2e, iters=(1, 2))
    # completed-samples count from one pass
    comp = float(e2e(1)())
    srate = comp / dt
    results["e2e_1024_depth5"] = {
        "ms_per_full_frame_8spp": round(dt * 1e3, 1),
        "samples_per_s": round(srate, 1),
        "spp_per_s_full_frame": round(srate / (W * Hh), 2),
    }
    print(f"e2e 1024^2 d5: {dt*1e3:.1f} ms / {int(comp)} samples "
          f"-> {srate/(W*Hh):.2f} full-frame spp/s", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "cad_scale.json")
    doc = {}
    if os.path.exists(out):
        with open(out) as f:
            try:
                doc = json.load(f)
            except Exception:
                doc = {}
    keep = doc.get("distinct_parts")  # written by cad_distinct.py
    doc = dict(results)
    if keep is not None:
        doc["distinct_parts"] = keep
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
