#!/usr/bin/env python
"""Wide-kernel tuning sweep on the real chip (slope-timed).

Sweeps (width, wide_leaf, BLOCK, pops) for the BVH8 Pallas kernel against
the binary Pallas kernel on the Cornell bench scene, for coherent
primaries and sorted bounce-like rays. All timings use the slope method
(see profile_components.py): N chained traces inside one jitted
fori_loop, cost = (t_N - t_1)/(N - 1).
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


def slope_time(make_loop, iters=(1, 8)):
    lo, hi = iters
    ts = {}
    for n in (lo, hi):
        f = make_loop(n)
        sync(f())
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f())
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def main():
    from cadrays_tpu.geometry.wide_bvh import build_wide_bvh, wide_stats
    from cadrays_tpu.geometry.bvh import build_bvh
    from cadrays_tpu.ops import pallas_wide
    from cadrays_tpu.ops.pallas_traverse import trace_pallas
    from cadrays_tpu.ops.traverse import _coherence_key
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    scene = cornell_box(full=True, sphere_res=24)
    cam = cornell_camera()
    data = scene.flatten(cam)
    geom = data.geometry
    T = geom.tris_packed.shape[0]
    print(f"tris={T} binary_nodes={geom.nodes_packed.shape[0]}", flush=True)

    W = H = 1024
    R = W * H // 4
    pids = jnp.arange(R, dtype=jnp.int32)
    px = (pids % W).astype(jnp.float32)
    py = (pids // W).astype(jnp.float32)
    o_coh, d_coh = cam.generate_rays(px, py, jnp.zeros(R), jnp.zeros(R), W, H)
    tmax = jnp.full((R,), 1e30)

    # bounce-like rays: random origins on scene surfaces, random dirs,
    # sorted by the production coherence key (what the integrator traces)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    tv = np.asarray(geom.tri_v)
    vv = np.asarray(geom.vertices)
    sel = np.asarray(jax.random.randint(k1, (R,), 0, tv.shape[0]))
    b = np.asarray(jax.random.uniform(k2, (R, 2), dtype=jnp.float32))
    b0 = 1.0 - np.sqrt(b[:, 0:1])
    b1 = b[:, 1:2] * np.sqrt(b[:, 0:1])
    p = (vv[tv[sel, 0]] * b0 + vv[tv[sel, 1]] * b1
         + vv[tv[sel, 2]] * (1 - b0 - b1)).astype(np.float32)
    d_inc = np.array(jax.random.normal(k3, (R, 3), dtype=jnp.float32))
    d_inc /= np.linalg.norm(d_inc, axis=-1, keepdims=True)
    o_inc = jnp.asarray(p + d_inc * 1e-4)
    d_inc = jnp.asarray(d_inc)
    key = _coherence_key(geom, o_inc, d_inc)
    perm = jnp.argsort(key)
    o_srt, d_srt = o_inc[perm], d_inc[perm]

    def trace_loop(fn, o, d, **kw):
        def make(n):
            @jax.jit
            def run():
                def body(i, carry):
                    oo, acc = carry
                    r = fn(geom_cur, oo, d, tmax, **kw)
                    oo = oo + 0.0 * r["t"][:, None]
                    return oo, acc + r["t"]
                _, acc = jax.lax.fori_loop(0, n, body, (o, jnp.zeros(R)))
                return acc
            return run
        return make

    results = {}
    geom_cur = geom

    def run_case(tag, fn, **kw):
        for rname, o, d in (("coh", o_coh, d_coh), ("srt", o_srt, d_srt)):
            dt = slope_time(trace_loop(fn, o, d, **kw))
            results[f"{tag}_{rname}"] = {"ms": dt * 1e3,
                                         "Mray_s": R / dt / 1e6}
            print(f"{tag}_{rname:4s} {dt*1e3:9.3f} ms  {R/dt/1e6:9.2f} Mray/s",
                  flush=True)

    # case names from argv: "bin" or "w{width}L{leaf}B{block}P{pops}"
    cases = sys.argv[1:] or ["bin", "w8L16B2048P1", "w8L16B2048P2"]
    bvh_min = np.asarray(geom.bvh_min)
    bvh_max = np.asarray(geom.bvh_max)
    skipv = np.asarray(geom.bvh_skip)
    firstv = np.asarray(geom.bvh_first)
    countv = np.asarray(geom.bvh_count)
    wide_cache = {}

    for case in cases:
        if case == "bin":
            geom_cur = geom
            run_case("bin2048", trace_pallas)
            continue
        import re
        m = re.match(r"w(\d+)L(\d+)B(\d+)P(\d+)(O\d)?", case)
        width, leaf, block, pops = map(int, m.groups()[:4])
        ordered = m.group(5) != "O0"
        if (width, leaf) not in wide_cache:
            wide = build_wide_bvh(bvh_min, bvh_max, skipv, firstv, countv,
                                  width=width, wide_leaf=leaf)
            print(f"w{width} L{leaf}: {wide_stats(wide)}", flush=True)
            wide_cache[(width, leaf)] = geom.replace(
                wboxes=jnp.asarray(wide.wboxes),
                wmeta=jnp.asarray(wide.wmeta),
                winst=jnp.asarray(wide.winst),
                worder=jnp.asarray(wide.worder),
                wide_leaf=wide.max_leaf,
                wide_depth=wide.max_depth)
        geom_cur = wide_cache[(width, leaf)]
        run_case(case, pallas_wide.trace_wide, pops=pops, block=block,
                 ordered=ordered)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
