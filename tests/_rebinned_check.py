"""Standalone check: per-ray TLAS-candidate rebinned traversal matches
the reference walk (run in a fresh process by test_wide_bvh, like the
HBM pipeline check — pallas interpret compiles are isolated there)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cadrays_tpu.scene.flatten as fl
from cadrays_tpu.core.bsdf import material
from cadrays_tpu.geometry.primitives import box, sphere, torus
from cadrays_tpu.ops.pallas_wide import trace_wide_rebinned
from cadrays_tpu.ops.traverse import trace_gather
from cadrays_tpu.scene.instances import build_instanced


def main():
    # 5 DISTINCT meshes, overlapping boxes, varied transforms — every
    # branch of the candidate logic (multi-candidate rays, shared
    # blocks, dead lanes) is exercised at tiny scale
    meshes = [box(1, 1, 1), sphere(0.6, 12, 8), torus(0.7, 0.25, 12, 8),
              box(0.5, 2.0, 0.5), sphere(0.4, 10, 6)]
    tfs = []
    rng = np.random.default_rng(3)
    for i in range(5):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = (i * 0.9, (i % 2) * 0.8, 0.2 * i)
        tfs.append(m)
    data = build_instanced(meshes, tfs, [material()], [0] * 5)
    geom = data.geometry
    # force the HBM triangle table (the rebinned path streams leaves)
    geom = geom.replace(
        wtris_hbm=fl.build_tris_hbm(np.asarray(geom.wtris_packed)))
    assert int(geom.inst_bridge.shape[0]) == 5
    assert int(np.asarray(geom.inst_bridge).max()) != 0x7FFFFFFF

    R = 512
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    o = jax.random.uniform(k1, (R, 3), minval=-1.0, maxval=5.0)
    d = jax.random.normal(k2, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tm = jnp.full((R,), 1e30)

    # reference: the per-ray gather walk. (This fixture originally
    # exposed a 1/512 closer-hit miss in trace_stream vs gather; root
    # cause was XLA downcasting the batched instance-transform einsums
    # to reduced precision at batch width >= 8 — every transform
    # einsum/matmul now pins precision="float32" and all walkers agree.)
    a = trace_wide_rebinned(geom, o, d, tm, block=128, interpret=True)
    b = trace_gather(geom, o, d, tm)
    hits_a = np.asarray(a["tri"])
    hits_b = np.asarray(b["tri"])
    assert np.array_equal(hits_a, hits_b), \
        f"{(hits_a != hits_b).sum()} mismatched hits"
    np.testing.assert_allclose(np.asarray(a["t"])[hits_b >= 0],
                               np.asarray(b["t"])[hits_b >= 0],
                               rtol=1e-4, atol=1e-4)

    ah = trace_wide_rebinned(geom, o, d, tm, block=128, any_hit=True,
                             interpret=True)
    bh = trace_gather(geom, o, d, tm, any_hit=True)
    assert np.array_equal(np.asarray(ah["tri"]) >= 0,
                          np.asarray(bh["tri"]) >= 0)
    print("REBINNED OK")


if __name__ == "__main__":
    main()
