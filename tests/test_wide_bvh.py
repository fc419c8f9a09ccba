"""Wide-BVH (BVH8) collapse + Pallas wide-traversal kernel.

The kernel is validated in Pallas interpret mode on CPU against the
per-ray gather walk (ops/traverse.trace_gather), which is the reference
implementation for all packet kernels. Mirrors the reference's reliance
on OCCT's two-level BVH correctness [OCCT-contract, SURVEY.md §2.5].
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cadrays_tpu.geometry.bvh import build_bvh
from cadrays_tpu.geometry.wide_bvh import build_wide_bvh, wide_stats
from cadrays_tpu.ops.traverse import trace_gather
from cadrays_tpu.ops.pallas_wide import fits_wide, trace_wide


def _random_mesh(n_tri, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-scale, scale, (n_tri, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.1 * scale, (n_tri, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.1 * scale, (n_tri, 3)).astype(np.float32)
    verts = np.concatenate([base, base + e1, base + e2], axis=0)
    idx = np.stack([np.arange(n_tri), np.arange(n_tri) + n_tri,
                    np.arange(n_tri) + 2 * n_tri], axis=1).astype(np.int32)
    return verts.astype(np.float32), idx


def _rays(n, seed=1, scale=1.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-1.5 * scale, 1.5 * scale, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _leaf_ranges(wmeta):
    out = []
    for m in wmeta.reshape(-1):
        if 0 <= m < 0x7FFFFFFF:
            out.append((int(m) & ((1 << 24) - 1), int(m) >> 24))
    return out


def test_wide_covers_all_triangles_once():
    verts, idx = _random_mesh(777, seed=3)
    bvh = build_bvh(verts, idx)
    w = build_wide_bvh(bvh.node_min, bvh.node_max, bvh.skip,
                       bvh.first, bvh.count)
    covered = np.zeros(idx.shape[0], np.int32)
    for first, count in _leaf_ranges(w.wmeta):
        assert 0 < count <= w.max_leaf
        covered[first:first + count] += 1
    assert np.all(covered == 1), "leaf ranges must partition the triangles"
    st = wide_stats(w)
    assert st["nodes"] < bvh.num_nodes  # the collapse must shrink the tree
    assert st["max_depth"] >= 1


def _flatten_simple(verts, idx):
    from cadrays_tpu.core.bsdf import material
    from cadrays_tpu.geometry.mesh import TriangleMesh
    from cadrays_tpu.scene.flatten import flatten_parts

    mesh = TriangleMesh(verts, idx)
    return flatten_parts([mesh], [material(kd=(1, 1, 1))], [0])


@pytest.mark.parametrize("any_hit", [False, True])
def test_wide_kernel_matches_gather(any_hit):
    verts, idx = _random_mesh(400, seed=5)
    data = _flatten_simple(verts, idx)
    geom = data.geometry
    assert fits_wide(geom)

    o, d = _rays(256, seed=7)
    tm = jnp.full((256,), 1e30)
    ref = trace_gather(geom, o, d, tm, any_hit=False)
    got = trace_wide(geom, o, d, tm, any_hit=any_hit, interpret=True)

    hit_ref = ref["tri"] >= 0
    hit_got = got["tri"] >= 0
    np.testing.assert_array_equal(np.asarray(hit_got), np.asarray(hit_ref))
    if not any_hit:
        np.testing.assert_allclose(
            np.asarray(got["t"])[np.asarray(hit_ref)],
            np.asarray(ref["t"])[np.asarray(hit_ref)], rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(got["tri"]),
                                      np.asarray(ref["tri"]))


def test_wide_kernel_respects_tmax_and_dead_lanes():
    verts, idx = _random_mesh(200, seed=11)
    data = _flatten_simple(verts, idx)
    geom = data.geometry
    o, d = _rays(128, seed=13)
    ref = trace_gather(geom, o, d, jnp.full((128,), 1e30))
    # cap t_max at half the reference hit distance -> those lanes miss;
    # lanes with tm=0 are dead and must report miss
    tm = np.full(128, 1e30, np.float32)
    hit = np.asarray(ref["tri"]) >= 0
    tm[hit] = np.asarray(ref["t"])[hit] * 0.5
    tm[::7] = 0.0
    got = trace_wide(geom, o, d, jnp.asarray(tm), interpret=True)
    g = np.asarray(got["tri"])
    assert np.all(g[hit] == -1) or not np.any(g[::7] >= 0)
    assert np.all(g[::7] == -1)
    # re-trace the capped lanes with gather at same tm: must agree
    ref2 = trace_gather(geom, o, d, jnp.asarray(tm))
    np.testing.assert_array_equal(g, np.asarray(ref2["tri"]))


def test_wide_kernel_instanced_two_level():
    from cadrays_tpu.core.bsdf import material
    from cadrays_tpu.geometry.mesh import TriangleMesh
    from cadrays_tpu.scene.instances import build_instanced

    verts, idx = _random_mesh(120, seed=17, scale=0.4)
    mesh = TriangleMesh(verts, idx)

    def tf(tx, ty, tz, s=1.0):
        m = np.eye(4, dtype=np.float32) * s
        m[3, 3] = 1.0
        m[:3, 3] = (tx, ty, tz)
        return m

    transforms = [tf(0, 0, 0), tf(1.5, 0.2, -0.3, 0.7), tf(-1.2, -0.5, 0.8, 1.3)]
    data = build_instanced([mesh] * 3, transforms,
                           [material(kd=(1, 1, 1))], [0, 0, 0])
    geom = data.geometry
    assert geom.instanced and fits_wide(geom)

    o, d = _rays(192, seed=19, scale=2.0)
    tm = jnp.full((192,), 1e30)
    ref = trace_gather(geom, o, d, tm)
    got = trace_wide(geom, o, d, tm, interpret=True)
    np.testing.assert_array_equal(np.asarray(got["tri"]),
                                  np.asarray(ref["tri"]))
    hit = np.asarray(ref["tri"]) >= 0
    np.testing.assert_allclose(np.asarray(got["t"])[hit],
                               np.asarray(ref["t"])[hit],
                               rtol=1e-4, atol=1e-5)


def test_wide_kernel_hbm_streamed_matches():
    """CAD-scale variant: triangles DMA'd from HBM per merged leaf must
    return identical hits to the VMEM-resident kernel."""
    from cadrays_tpu.scene.flatten import build_tris_hbm

    verts, idx = _random_mesh(600, seed=31)
    data = _flatten_simple(verts, idx)
    geom = data.geometry.replace(
        tris_hbm=build_tris_hbm(data.geometry.tris_packed))
    o, d = _rays(256, seed=37)
    tm = jnp.full((256,), 1e30)
    ref = trace_gather(geom, o, d, tm)
    got = trace_wide(geom, o, d, tm, interpret=True, hbm_tris=True)
    np.testing.assert_array_equal(np.asarray(got["tri"]),
                                  np.asarray(ref["tri"]))
    hit = np.asarray(ref["tri"]) >= 0
    np.testing.assert_allclose(np.asarray(got["t"])[hit],
                               np.asarray(ref["t"])[hit], rtol=1e-5,
                               atol=1e-6)


def test_wide_kernel_dual_pop_matches():
    verts, idx = _random_mesh(300, seed=23)
    data = _flatten_simple(verts, idx)
    o, d = _rays(128, seed=29)
    tm = jnp.full((128,), 1e30)
    a = trace_wide(data.geometry, o, d, tm, interpret=True, pops=1)
    b = trace_wide(data.geometry, o, d, tm, interpret=True, pops=2)
    np.testing.assert_array_equal(np.asarray(a["tri"]), np.asarray(b["tri"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               rtol=1e-6)


@pytest.mark.slow
def test_hbm_streamed_pipeline_matches_stream_backend():
    """The 2-slot deferred-leaf DMA pipeline (round 4): triangles stream
    from the padded HBM table while the previous leaf is processed.
    Interpret-mode hits must match the packet stream walk exactly —
    covers the DMA start/wait pairing, the double-buffered window, the
    pending-leaf t-cull recheck and the drain after the stack empties.

    Runs in a SUBPROCESS: the interpret-mode lowering of the DMA kernel
    reliably segfaults the CPU XLA compiler when it runs after ~270
    other tests' compiles in one process (cumulative compiler memory),
    while passing standalone every time — a fresh process isolates it."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "_hbm_pipeline_check.py")],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "HBM PIPELINE OK" in r.stdout, r.stdout + r.stderr


@pytest.mark.slow
def test_rebinned_traversal_matches_reference():
    """Per-ray TLAS-candidate / instance-rebinned traversal
    (trace_wide_rebinned): seeds each block directly into its chosen
    instance's BLAS. Interpret-mode compile is heavy, so the check runs
    in a fresh subprocess like the HBM pipeline one."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "_rebinned_check.py")],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "REBINNED OK" in r.stdout, r.stdout + r.stderr
