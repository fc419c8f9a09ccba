#!/usr/bin/env python
"""CAD-scale block-size sweep for the HBM wide kernel (sorted bounce
rays). Union-walk breadth scales with lanes per packet; the t-cull
threshold (max best-t over the block) also tightens with smaller
blocks. Finds the production block for incoherent rays at CAD scale."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cad_scale import build_scene, slope_time


def main():
    from cadrays_tpu.ops.pallas_wide import trace_wide
    from cadrays_tpu.ops.traverse import _coherence_key

    data, cam = build_scene()
    geom = data.geometry
    R = 1024 * 1024 // 4
    tmax = jnp.full((R,), 1e30)
    rng = np.random.default_rng(3)
    o = rng.uniform([0, 0, -1], [26, 26, 2], (R, 3)).astype(np.float32)
    d = rng.normal(0, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    key = _coherence_key(geom, jnp.asarray(o), jnp.asarray(d))
    perm = jnp.argsort(key)
    o_srt = jnp.asarray(o)[perm]
    d_srt = jnp.asarray(d)[perm]

    def loop(block):
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
            return lambda: run(geom, o_srt, d_srt)
        return make

    for block in (2048, 1024, 512, 256):
        dt = slope_time(loop(block), iters=(1, 2))
        print(f"block={block:5d}  {dt*1e3:9.1f} ms  {R/dt/1e6:7.2f} Mray/s",
              flush=True)


if __name__ == "__main__":
    main()
