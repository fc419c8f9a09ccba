#!/usr/bin/env python
"""Ablate the HBM wide kernel on the distinct-parts bounce workload.

Usage:  python bench/cad_distinct_ablate.py            # default
        CADRAYS_WIDE_ABLATE=noleaf ... (env set before import)
        CADRAYS_WIDE_BLOCK=1024 ...
Prints one line: variant, ms, Mray/s for the realistic sorted bounce
rays (the number bench/cad_distinct.py reports as hbm_bounce).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cad_distinct import build_scene, realistic_bounce_rays
    from cadrays_tpu.ops.pallas_wide import BLOCK, trace_wide

    data, cam = build_scene()
    geom = data.geometry
    o_b, d_b = realistic_bounce_rays(geom, cam)
    R = o_b.shape[0]
    tmax = jnp.full((R,), 1e30)

    def make(n):
        @jax.jit
        def run(g, o0, d0):
            def body(i, carry):
                oo, acc = carry
                r = trace_wide(g, oo, d0, tmax, hbm_tris=True)
                return oo + 0.0 * r["t"][:, None], acc + r["t"]
            _, acc = jax.lax.fori_loop(0, n, body, (o0, jnp.zeros(R)))
            return acc
        return lambda: run(geom, o_b, d_b)

    ts = {}
    for n in (1, 3):
        f = make(n)
        float(jnp.sum(f()))
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            float(jnp.sum(f()))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    dt = (ts[3] - ts[1]) / 2
    tag = (f"ablate={os.environ.get('CADRAYS_WIDE_ABLATE', '-')} "
           f"block={BLOCK}")
    print(f"{tag:28s} {dt*1e3:10.3f} ms  {R/dt/1e6:8.2f} Mray/s",
          flush=True)


if __name__ == "__main__":
    main()
