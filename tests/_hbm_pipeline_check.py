"""Standalone HBM deferred-leaf pipeline check (run by test_wide_bvh in
a fresh process — see the test docstring for why)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cadrays_tpu.scene.flatten as fl
from cadrays_tpu.geometry.wide_bvh import build_wide_bvh
from cadrays_tpu.ops.pallas_wide import trace_wide
from cadrays_tpu.ops.traverse import trace_stream
from cadrays_tpu.testing.scenes import cornell_box, cornell_camera


def main():
    scene = cornell_box(full=True, sphere_res=8)
    cam = cornell_camera()
    data = scene.flatten(cam)
    geom = data.geometry
    wide = build_wide_bvh(np.asarray(geom.bvh_min),
                          np.asarray(geom.bvh_max),
                          np.asarray(geom.bvh_skip),
                          np.asarray(geom.bvh_first),
                          np.asarray(geom.bvh_count), wide_leaf=16)
    geom = geom.replace(
        tris_hbm=fl.build_tris_hbm(np.asarray(geom.tris_packed)),
        wboxes=jnp.asarray(wide.wboxes), wmeta=jnp.asarray(wide.wmeta),
        winst=jnp.asarray(wide.winst), worder=jnp.asarray(wide.worder),
        wide_leaf=wide.max_leaf, wide_depth=wide.max_depth)

    R = 256
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    o = jax.random.uniform(k1, (R, 3))
    d = jax.random.normal(k2, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tm = jnp.full((R,), 1e30)

    a = trace_wide(geom, o, d, tm, interpret=True, hbm_tris=True)
    b = trace_stream(geom, o, d, tm)
    assert np.array_equal(np.asarray(a["tri"]), np.asarray(b["tri"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               rtol=1e-4, atol=1e-4)
    ah = trace_wide(geom, o, d, tm, interpret=True, any_hit=True,
                    hbm_tris=True)
    bh = trace_stream(geom, o, d, tm, any_hit=True)
    assert np.array_equal(np.asarray(ah["tri"]) >= 0,
                          np.asarray(bh["tri"]) >= 0)
    print("HBM PIPELINE OK")


if __name__ == "__main__":
    main()
