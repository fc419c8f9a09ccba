#!/usr/bin/env python
"""CAD-scale coherence-key sweep: what ray ordering makes 2048-lane
packets cheap when directions are random and the scene is an instanced
assembly? Candidate keys trade direction binning (beam coherence: the
union walk collapses to a beam) against origin locality (shared entry
point). Cornell measured origin-major best; CAD scale is a different
regime — rays fly across the whole assembly, so direction bins shrink
the union of touched instances."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cad_scale import build_scene, slope_time


def octahedral(d, bits):
    """Quantize unit direction to bits*2 key bits via octahedral map."""
    ax = jnp.abs(d)
    s = jnp.sum(ax, axis=-1, keepdims=True)
    p = d[:, :2] / jnp.maximum(s, 1e-12)
    flip = (jnp.sign(p) * (1.0 - jnp.abs(p[:, ::-1])))
    p = jnp.where((d[:, 2] < 0)[:, None], flip, p)
    n = 1 << bits
    q = jnp.clip(((p * 0.5 + 0.5) * n).astype(jnp.int32), 0, n - 1)
    return q[:, 0] * n + q[:, 1]


def morton(geom, origin, bits):
    lo = geom.nodes_packed[0, 0:3]
    hi = geom.nodes_packed[0, 3:6]
    q = jnp.clip((origin - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 0.999)
    cell = (q * (1 << bits)).astype(jnp.int32)
    out = jnp.zeros(origin.shape[0], jnp.int32)
    for b in range(bits):
        for a in range(3):
            out = out | (((cell[:, a] >> b) & 1) << (3 * b + a))
    return out


def main():
    from cadrays_tpu.ops.pallas_wide import trace_wide
    from cadrays_tpu.ops.traverse import _coherence_key

    data, cam = build_scene()
    geom = data.geometry
    R = 1024 * 1024 // 4
    tmax = jnp.full((R,), 1e30)
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.uniform([0, 0, -1], [26, 26, 2], (R, 3)),
                    jnp.float32)
    dn = rng.normal(0, 1, (R, 3))
    d = jnp.asarray(dn / np.linalg.norm(dn, axis=-1, keepdims=True),
                    jnp.float32)

    keys = {
        "oct3|mort12": _coherence_key(geom, o, d),
        "dir8|mort9": (octahedral(d, 4) << 9) | morton(geom, o, 3),
        "dir12|mort6": (octahedral(d, 6) << 6) | morton(geom, o, 2),
        "mort9|dir8": (morton(geom, o, 3) << 8) | octahedral(d, 4),
        "dir16": octahedral(d, 8),
    }

    def loop(o_, d_, block):
        def make(n):
            @jax.jit
            def run(g, o0, d0):
                def body(i, carry):
                    oo, acc = carry
                    r = trace_wide(g, oo, d0, tmax, hbm_tris=True,
                                   block=block)
                    return oo + 0.0 * r["t"][:, None], acc + r["t"]
                _, acc = jax.lax.fori_loop(0, n, body, (o0, jnp.zeros(R)))
                return acc
            return lambda: run(geom, o_, d_)
        return make

    for name, key in keys.items():
        perm = jnp.argsort(key)
        dt = slope_time(loop(o[perm], d[perm], 1024), iters=(1, 2))
        print(f"{name:14s}  {dt*1e3:9.1f} ms  {R/dt/1e6:7.2f} Mray/s",
              flush=True)


if __name__ == "__main__":
    main()
