"""Pallas wide-BVH (BVH8) packet traversal — the hot kernel.

Replaces the binary threaded walk (ops/pallas_traverse.py) with the wide
tree from geometry/wide_bvh.py. Per grid program, one block of B rays
lives in VMEM and a scalar SMEM *stack* drives the walk:

  pop entry e
    e >= 0 : merged leaf — Moller-Trumbore up to `wide_leaf` triangles,
             computed as independent chains then tree-reduced (VPU
             throughput, no serial t-update chain);
    e <  0 : wide node — slab-test all 8 child boxes against the block,
             push every child whose box ANY live lane hits.

Why this wins (bench/ROOFLINE.md): the binary kernel's iteration is a
latency-bound scalar chain (~0.12 us) doing only ~40 VPU flops; an
incoherent packet walks nearly the whole tree (2.7k nodes for Cornell).
The wide tree has ~6x fewer entries and each iteration does 8 box tests
or 16 triangle tests of dense vector work, so the same walk issues far
fewer scalar chains and keeps the VPU busy.

Instancing (two-level TLAS/BLAS, scene/instances.py): the stack carries
an instance id per entry; popping an entry whose wide-node children set
`winst` pushes the child with that instance, and every pop transforms the
block's rays by `inst_inv[inst]` (identity row for world space). This is
compiled only for instanced scenes.

Scene-size: nodes are tiny (~T/50 rows); triangles are VMEM-resident up
to ~VMEM budget and HBM-streamed per-leaf via async DMA beyond that
(trace_wide picks the variant).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cadrays_tpu.scene.flatten import GeometryData

BLOCK = int(os.environ.get("CADRAYS_WIDE_BLOCK", "2048"))
_COUNT_SHIFT = 24
_LEAF_MASK = (1 << _COUNT_SHIFT) - 1
_INF = 3e30  # python literal: a jnp constant would be captured by pallas
_VMEM_BUDGET = 12 * 1024 * 1024
STACK_CAP = 192


def _eff_tris(geom: GeometryData):
    """Effective wide-kernel triangle table: the compact shared-BLAS
    table when built (instanced dedup), else the fused table."""
    return (geom.wtris_packed if geom.wtris_packed.shape[0] > 1
            else geom.tris_packed)


def _eff_tris_hbm(geom: GeometryData):
    return (geom.wtris_hbm if geom.wtris_hbm.shape[0] > 1
            else geom.tris_hbm)


def _stack_fits(geom: GeometryData) -> bool:
    """Worst-case stack bound: each wide-node pop nets +(width-1)
    entries, so a depth-D tree needs at most 1 + (width-1)*D slots.
    Deeper trees fall back to the binary kernels (overflow would write
    out of SMEM bounds silently)."""
    width = geom.wmeta.shape[1]
    return 1 + (width - 1) * max(int(geom.wide_depth), 1) <= STACK_CAP


def fits_wide(geom: GeometryData) -> bool:
    if geom.wmeta.shape[0] <= 1 and geom.wmeta.shape[1] == 1:
        return False  # placeholder: no wide tree built
    if not _stack_fits(geom):
        return False
    # x2 on whole-table operands: the Mosaic scoped-vmem allocator
    # double-buffers pallas inputs, and exceeding the ~16 MB scoped
    # limit is a compile-time abort, not a fallback (observed at 19.5k
    # wide nodes before the leaf-64 retune)
    need = (geom.wboxes.size + geom.wmeta.size + geom.winst.size
            + _eff_tris(geom).size) * 4 * 2 + BLOCK * 4 * 24
    return need < _VMEM_BUDGET


def fits_wide_hbm(geom: GeometryData) -> bool:
    """CAD scale: triangles stay in HBM (DMA'd per merged leaf), only
    the wide-node tables + ray block must fit VMEM."""
    if geom.wmeta.shape[0] <= 1 and geom.wmeta.shape[1] == 1:
        return False
    if _eff_tris_hbm(geom).shape[0] <= 1:
        return False  # no padded HBM table built (small scene)
    if not _stack_fits(geom):
        return False
    need = (geom.wboxes.size + geom.wmeta.size + geom.winst.size
            + geom.worder.size) * 4 * 2 + BLOCK * 4 * 24
    return need < _VMEM_BUDGET


def _slab8(brow, ox, oy, oz, ix, iy, iz, t_cap, k):
    """Child-k slab test: scalars from the 48-wide row vs (B,) lanes.

    Returns (hit mask, per-lane entry distance masked to +inf on miss) —
    the min entry distance over hitting lanes rides the stack so pops can
    skip entries the tightened t already excludes."""
    b = k * 6
    tx0 = (brow[b + 0] - ox) * ix
    ty0 = (brow[b + 1] - oy) * iy
    tz0 = (brow[b + 2] - oz) * iz
    tx1 = (brow[b + 3] - ox) * ix
    ty1 = (brow[b + 4] - oy) * iy
    tz1 = (brow[b + 5] - oz) * iz
    t_near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.minimum(tz0, tz1))
    t_far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
    # conservative widening (~4 ulp): rounding must never cull a grazed
    # box (ops/traverse.py _BOX_SHRINK note)
    t_near = jnp.maximum(t_near * 0.9999996, 0.0)
    t_far = t_far * 1.0000004
    hit = t_near <= jnp.minimum(t_far, t_cap)
    return hit, jnp.where(hit, t_near, _INF)


def _slab8_bf16(brow, ox, oy, oz, ixb, iyb, izb, t_cap, k):
    """Child-k slab test with the multiply + min/max chain in bfloat16
    (2x VPU lane packing). Precision contract: the box-minus-origin
    differences are computed in f32 FIRST (a bf16 subtract of bf16
    inputs would carry error relative to the coordinate MAGNITUDE, not
    the difference — catastrophic near box faces), then rounded to bf16
    and multiplied by the bf16 inverse direction: every t carries
    <= ~0.8% relative error (two bf16 roundings). The interval is then
    widened CONSERVATIVELY by 2% both ways, so a true hit can never be
    culled — only ~2%-slop false positives cost extra leaf tests. The
    pushed t_near lower-bounds the true entry distance, keeping the
    stack t-cull conservative too."""
    bf = jnp.bfloat16
    b = k * 6
    tx0 = (brow[b + 0] - ox).astype(bf) * ixb
    ty0 = (brow[b + 1] - oy).astype(bf) * iyb
    tz0 = (brow[b + 2] - oz).astype(bf) * izb
    tx1 = (brow[b + 3] - ox).astype(bf) * ixb
    ty1 = (brow[b + 4] - oy).astype(bf) * iyb
    tz1 = (brow[b + 5] - oz).astype(bf) * izb
    t_near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.minimum(tz0, tz1))
    t_far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
    t_near = jnp.maximum(t_near.astype(jnp.float32) * 0.98, 0.0)
    t_far = t_far.astype(jnp.float32) * 1.02
    hit = t_near <= jnp.minimum(t_far, t_cap)
    return hit, jnp.where(hit, t_near, _INF)


_ABLATE = os.environ.get("CADRAYS_WIDE_ABLATE", "")
_BF16_SLABS = bool(os.environ.get("CADRAYS_WIDE_BF16", ""))


def _make_kernel(*, any_hit: bool, max_leaf: int, width: int,
                 instanced: bool, pops: int, ordered: bool,
                 hbm_tris: bool = False, seeded: bool = False):
    """Build the kernel body. Refs (in order):
    wboxes, wmeta, worder, [winst, instinv], tris, rays, tm, [start] ->
    out, scratch: stack (SMEM), sp (SMEM), [inst stack (SMEM)],
    [tri buffer (VMEM) + DMA sem when hbm_tris].

    seeded: the per-block SMEM `start` row [meta0, inst0, meta1, inst1]
    replaces the root as the initial stack — the instance-rebinned
    traversal (trace_wide_rebinned) launches each block directly into
    its chosen instance's BLAS subtree. meta == 0x7FFFFFFF slots are
    empty (meta0 empty = dead block).
    """

    def kernel(*refs):
        tbuf_ref = dsem_ref = start_ref = None
        ns = 1 if seeded else 0
        if instanced:
            (wboxes_ref, wmeta_ref, worder_ref, winst_ref, instinv_ref,
             wdelta_ref, tris_ref, rays_ref, tm_ref) = refs[:9]
            if seeded:
                start_ref = refs[9]
            (out_ref, stack_ref, sp_ref, istk_ref, tstk_ref, thi_ref,
             *extra) = refs[9 + ns:]
        else:
            (wboxes_ref, wmeta_ref, worder_ref, tris_ref, rays_ref,
             tm_ref) = refs[:6]
            if seeded:
                start_ref = refs[6]
            (out_ref, stack_ref, sp_ref, tstk_ref, thi_ref,
             *extra) = refs[6 + ns:]
            winst_ref = instinv_ref = istk_ref = None
        if hbm_tris:
            tbuf_ref, dsem_ref, pend_ref, ptmin_ref = extra

        ox = rays_ref[0, :]
        oy = rays_ref[1, :]
        oz = rays_ref[2, :]
        dx = rays_ref[3, :]
        dy = rays_ref[4, :]
        dz = rays_ref[5, :]
        tm = tm_ref[0, :]
        lane_live = tm > 0.0

        def inv(c):
            safe = jnp.where(jnp.abs(c) < 1e-12,
                             jnp.where(c >= 0, 1e-12, -1e-12), c)
            return 1.0 / safe

        if not instanced:
            ix, iy, iz = inv(dx), inv(dy), inv(dz)

        out_ref[0, :] = jnp.minimum(tm, 1e30)
        out_ref[1, :] = jnp.full_like(tm, -1.0)
        out_ref[2, :] = jnp.zeros_like(tm)
        out_ref[3, :] = jnp.zeros_like(tm)

        if seeded:
            pid = pl.program_id(0)
            m0 = start_ref[pid, 0]
            m1 = start_ref[pid, 2]
            stack_ref[0] = m0
            tstk_ref[0] = jnp.float32(0.0)
            stack_ref[1] = jnp.where(m1 != jnp.int32(0x7FFFFFFF), m1,
                                     jnp.int32(-2))
            tstk_ref[1] = jnp.float32(0.0)
            if instanced:
                istk_ref[0] = start_ref[pid, 1]
                istk_ref[1] = start_ref[pid, 3]
            sp_ref[0] = jnp.where(
                m0 == jnp.int32(0x7FFFFFFF), jnp.int32(0),
                1 + (m1 != jnp.int32(0x7FFFFFFF)).astype(jnp.int32))
        else:
            stack_ref[0] = jnp.int32(-2)
            sp_ref[0] = jnp.int32(1)
            tstk_ref[0] = jnp.float32(0.0)
            if instanced:
                istk_ref[0] = jnp.int32(-1)
        if hbm_tris:
            pend_ref[0] = jnp.int32(-1)
        # cull threshold cache: max over relevant lanes of current best t.
        # Only leaves change t, so it is recomputed once per leaf pop —
        # a per-pop max-reduce measured +3.4 ms on the L16 sweep.
        thi_ref[0] = jnp.max(jnp.where(lane_live,
                                       jnp.minimum(tm, 1e30), 0.0))

        if ordered:
            # block direction octant (world space): picks the per-node
            # far-to-near child push order so the LIFO stack pops nearest
            # children first, tightening t for the rest of the walk.
            # Mosaic only allows static lane indices, so the octant column
            # is selected per pop by an arithmetic mask over 8 static
            # extracts (oct_mask computed once per program).
            oct_ = ((jnp.sum(dx) >= 0.0).astype(jnp.int32)
                    + 2 * (jnp.sum(dy) >= 0.0).astype(jnp.int32)
                    + 4 * (jnp.sum(dz) >= 0.0).astype(jnp.int32))
            oct_mask = [(oct_ == o).astype(jnp.int32) for o in range(8)]

        def ray_in_space(inst):
            """Block rays in the entry's coordinate space."""
            if not instanced:
                return ox, oy, oz, dx, dy, dz, ix, iy, iz
            # identity row appended at index I; inst == -1 -> identity
            n_inst = instinv_ref.shape[0] - 1
            sel = jnp.where(inst < 0, n_inst, inst)
            m = instinv_ref[sel, :]  # (12,) [3x4 row-major]
            lox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
            loy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
            loz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
            ldx = m[0] * dx + m[1] * dy + m[2] * dz
            ldy = m[4] * dx + m[5] * dy + m[6] * dz
            ldz = m[8] * dx + m[9] * dy + m[10] * dz
            return (lox, loy, loz, ldx, ldy, ldz,
                    inv(ldx), inv(ldy), inv(ldz))

        def leaf_dma_start(e, slot):
            """CAD scale: start streaming the leaf's triangle window from
            the (T, 128) HBM table as an 8-row-aligned window (Mosaic DMA
            tiling); the window is max_leaf+8 rows so any `first` phase
            fits, and the table carries 128 spare rows for the overrun."""
            first = e & _LEAF_MASK
            base = first & ~jnp.int32(7)
            cp = pltpu.make_async_copy(
                tris_ref.at[pl.ds(base, max_leaf + 8), :],
                tbuf_ref.at[slot], dsem_ref.at[slot])
            cp.start()

        def do_leaf(e, inst, slot=None, do_wait=True):
            """Merged-leaf triangle tests (any-hit early-exits via sp).
            hbm variant: waits slot's DMA (started at pop time, overlapped
            with the node/leaf work since) and reads the VMEM window."""
            lox, loy, loz, ldx, ldy, ldz, _, _, _ = ray_in_space(inst)
            first = e & _LEAF_MASK
            count = jax.lax.shift_right_logical(e, _COUNT_SHIFT)

            if _ABLATE == "leafsimple":
                out_ref[0, :] = (out_ref[0, :]
                                 + first.astype(jnp.float32) * 1e-30
                                 + count.astype(jnp.float32) * 1e-30)
                return

            t_cur = out_ref[0, :]
            tri_cur = out_ref[1, :]
            if any_hit:
                open_ = lane_live & (tri_cur < 0.0)
            else:
                open_ = lane_live

            if hbm_tris:
                base = first & ~jnp.int32(7)
                phase = first - base
                if do_wait:
                    pltpu.make_async_copy(
                        tris_ref.at[pl.ds(base, max_leaf + 8), :],
                        tbuf_ref.at[slot], dsem_ref.at[slot]).wait()

            n_unroll = 1 if _ABLATE == "leaf1" else max_leaf
            cands = []
            for k in range(n_unroll):
                live_k = k < count
                tid = jnp.where(live_k, first + k, 0)
                trow = tbuf_ref[slot, phase + k, :] if hbm_tris \
                    else tris_ref[tid, :]
                pvx = ldy * trow[8] - ldz * trow[7]
                pvy = ldz * trow[6] - ldx * trow[8]
                pvz = ldx * trow[7] - ldy * trow[6]
                det = trow[3] * pvx + trow[4] * pvy + trow[5] * pvz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvx = lox - trow[0]
                tvy = loy - trow[1]
                tvz = loz - trow[2]
                uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * trow[5] - tvz * trow[4]
                qvy = tvz * trow[3] - tvx * trow[5]
                qvz = tvx * trow[4] - tvy * trow[3]
                vv = (ldx * qvx + ldy * qvy + ldz * qvz) * inv_det
                tt = (trow[6] * qvx + trow[7] * qvy + trow[8] * qvz) * inv_det
                eps = 1e-7
                hit = ((jnp.abs(det) > 1e-12) & (uu >= -eps) & (vv >= -eps)
                       & (uu + vv <= 1.0 + eps) & (tt > eps) & live_k)
                cands.append((jnp.where(hit, tt, _INF), uu, vv,
                              jnp.full_like(tt, jnp.float32(k))))

            # tree-reduce to per-lane best of this leaf
            while len(cands) > 1:
                nxt = []
                for i in range(0, len(cands) - 1, 2):
                    ta, ua, va, ka = cands[i]
                    tb, ub, vb, kb = cands[i + 1]
                    tko = tb < ta
                    nxt.append((jnp.minimum(ta, tb),
                                jnp.where(tko, ub, ua),
                                jnp.where(tko, vb, va),
                                jnp.where(tko, kb, ka)))
                if len(cands) % 2:
                    nxt.append(cands[-1])
                cands = nxt
            bt, bu, bv, bk = cands[0]

            better = open_ & (bt < t_cur)
            t_new = jnp.where(better, bt, t_cur)
            out_ref[0, :] = t_new
            if instanced:
                # shared-BLAS leaves hold compact triangle ids; add the
                # instance's fused-table offset (0 rows when unshared)
                nn = wdelta_ref.shape[0] - 1
                dsel = jnp.where(inst < 0, nn, inst)
                dshift = wdelta_ref[dsel].astype(jnp.float32)
            else:
                dshift = 0.0
            new_tri = jnp.where(better,
                                first.astype(jnp.float32) + bk + dshift,
                                tri_cur)
            out_ref[1, :] = new_tri
            out_ref[2, :] = jnp.where(better, bu, out_ref[2, :])
            out_ref[3, :] = jnp.where(better, bv, out_ref[3, :])
            if any_hit:
                thi_ref[0] = jnp.max(jnp.where(
                    lane_live & (new_tri < 0.0), t_new, 0.0))
            else:
                thi_ref[0] = jnp.max(jnp.where(lane_live, t_new, 0.0))
            if any_hit:
                all_done = ~jnp.any((new_tri < 0.0) & lane_live)

                @pl.when(all_done)
                def _():
                    sp_ref[0] = jnp.int32(0)

        def do_node(e, inst, sp):
            """Wide-node box tests + pushes; writes the new sp."""
            widx = -e - 2
            brow = wboxes_ref[widx, :]  # (width*6,)
            lox, loy, loz, ldx, ldy, ldz, lix, liy, liz = ray_in_space(inst)
            if _BF16_SLABS:
                bb = jnp.bfloat16
                lixb = lix.astype(bb)
                liyb = liy.astype(bb)
                lizb = liz.astype(bb)

                def slab(kk, t_cap):
                    return _slab8_bf16(brow, lox, loy, loz,
                                       lixb, liyb, lizb, t_cap, kk)
            else:
                def slab(kk, t_cap):
                    return _slab8(brow, lox, loy, loz, lix, liy, liz,
                                  t_cap, kk)
            t_cur = out_ref[0, :]
            if any_hit:
                open_ = lane_live & (out_ref[1, :] < 0.0)
                t_cap = jnp.where(open_, t_cur, -1.0)
            else:
                t_cap = jnp.where(lane_live, t_cur, -1.0)

            if ordered:
                # far-to-near pushes: every child k is STATIC (Mosaic
                # forbids dynamic lane indices); its stack position is
                # sp + #(pushed children ranked farther), from the
                # precomputed per-octant rank nibbles.
                pushes = []
                metas = []
                tmins = []
                for k in range(width):
                    hit_k, tn_k = slab(k, t_cap)
                    m_k = wmeta_ref[widx, k]
                    pushes.append((jnp.any(hit_k)
                                   & (m_k != jnp.int32(0x7FFFFFFF)))
                                  .astype(jnp.int32))
                    metas.append(m_k)
                    tmins.append(jnp.min(tn_k))
                rword = oct_mask[0] * worder_ref[widx, 0]
                for o in range(1, 8):
                    rword = rword + oct_mask[o] * worder_ref[widx, o]
                ranks = [(rword >> (4 * k)) & 0xF for k in range(width)]
                npush = pushes[0]
                for k in range(1, width):
                    npush = npush + pushes[k]
                for k in range(width):
                    pos = sp
                    for k2 in range(width):
                        if k2 == k:
                            continue
                        pos = pos + pushes[k2] * (
                            ranks[k2] < ranks[k]).astype(jnp.int32)

                    @pl.when(pushes[k] == 1)
                    def _(pos=pos, k=k):
                        stack_ref[pos] = metas[k]
                        tstk_ref[pos] = tmins[k]
                        if instanced:
                            i_k = winst_ref[widx, k]
                            istk_ref[pos] = jnp.where(i_k >= 0, i_k, inst)

                sp_ref[0] = sp + npush
                return

            off = sp
            for k in range(width):
                hit_k, tn_k = slab(k, t_cap)
                m_k = wmeta_ref[widx, k]
                # NB: empty slots' [+inf, -inf] boxes DO pass the slab test
                # for negative-direction rays ((inf - o) * ix flips sign),
                # so the sentinel must be masked here — pushing it would
                # read triangle row 0xFFFFFF out of bounds and fault.
                push_k = jnp.any(hit_k) & (m_k != jnp.int32(0x7FFFFFFF))

                @pl.when(push_k)
                def _(off=off, m_k=m_k, k=k, tn_k=tn_k):
                    stack_ref[off] = m_k
                    tstk_ref[off] = jnp.min(tn_k)
                    if instanced:
                        i_k = winst_ref[widx, k]
                        istk_ref[off] = jnp.where(i_k >= 0, i_k, inst)

                off = off + push_k.astype(jnp.int32)
            sp_ref[0] = off

        def process_pending():
            """Wait the pending leaf's DMA and run its triangle tests.
            The wait ALWAYS runs (the semaphore must pair with the
            started copy before the slot is reused); only the compute is
            skipped when the tightened t excludes the leaf."""
            pe = pend_ref[0]

            @pl.when(pe >= 0)
            def _():
                slot = pend_ref[2]
                first = pe & _LEAF_MASK
                base = first & ~jnp.int32(7)
                pltpu.make_async_copy(
                    tris_ref.at[pl.ds(base, max_leaf + 8), :],
                    tbuf_ref.at[slot], dsem_ref.at[slot]).wait()

                @pl.when(ptmin_ref[0] <= thi_ref[0])
                def _():
                    do_leaf(pe, pend_ref[1], slot, do_wait=False)
                pend_ref[0] = jnp.int32(-1)

        def pop_one():
            top = sp_ref[0] - 1
            e = stack_ref[top]
            inst = istk_ref[top] if instanced else jnp.int32(-1)
            sp_ref[0] = top

            # Packet-level t cull: the entry's min box-entry distance
            # (recorded at push) vs the cached worst best-t over lanes.
            # Distance-ordered pushes pop near-first, so t tightens early
            # and far entries die here without touching their triangles.
            worth = tstk_ref[top] <= thi_ref[0]

            if _ABLATE != "noleaf":
                if hbm_tris:
                    # 2-slot deferred-leaf pipeline: start THIS leaf's
                    # triangle DMA, then process the PREVIOUS leaf while
                    # the copy is in flight (ROOFLINE.md: the synchronous
                    # per-leaf DMA was the CAD-scale bottleneck). The
                    # pending leaf re-checks the t cull at process time —
                    # t may have tightened since it was popped.
                    @pl.when((e >= 0) & worth)
                    def _():
                        slot_new = jnp.where(pend_ref[0] >= 0,
                                             1 - pend_ref[2], jnp.int32(0))
                        leaf_dma_start(e, slot_new)
                        process_pending()
                        pend_ref[0] = e
                        pend_ref[1] = inst
                        pend_ref[2] = slot_new
                        ptmin_ref[0] = tstk_ref[top]
                else:
                    @pl.when((e >= 0) & worth)
                    def _():
                        do_leaf(e, inst)

            if _ABLATE != "nonode":
                @pl.when((e < 0) & worth)
                def _():
                    do_node(e, inst, top)

        def cond(sp):
            return sp > 0

        def body(sp):
            pop_one()
            for _ in range(pops - 1):
                @pl.when(sp_ref[0] > 0)
                def _():
                    pop_one()
            return sp_ref[0]

        jax.lax.while_loop(cond, body, jnp.int32(1))
        if hbm_tris:
            process_pending()  # drain: wait + (culled) process

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "interpret", "pops", "block",
                                    "ordered", "hbm_tris"))
def trace_wide(geom: GeometryData, origin, direction, t_max,
               any_hit: bool = False, interpret: bool = False,
               pops: int = 1, block: int | None = None,
               ordered: bool = True, hbm_tris: bool = False,
               start=None):
    """Wide-BVH traversal; contract of ops.traverse.trace.

    start: optional (nb, 4) int32 per-block stack seeds
    [meta0, inst0, meta1, inst1] (0x7FFFFFFF = empty) — the rebinned
    traversal enters each block directly at its instance's BLAS."""
    R = origin.shape[0]
    B = block if block is not None else BLOCK
    nb = -(-R // B)
    pad = nb * B - R

    rays = jnp.concatenate([origin.T, direction.T], axis=0)  # (6, R)
    rays = jnp.pad(rays, ((0, 0), (0, pad)))
    tm = jnp.pad(jnp.broadcast_to(t_max, (R,)), (0, pad))[None]

    width = geom.wmeta.shape[1]
    max_leaf = int(geom.wide_leaf)
    instanced = geom.instanced
    ordered = ordered and width <= 8 and geom.worder.shape[0] == geom.wmeta.shape[0]

    in_specs = [
        pl.BlockSpec(geom.wboxes.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(geom.wmeta.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(geom.worder.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [geom.wboxes, geom.wmeta, geom.worder]
    if instanced:
        n_inst = geom.inst_inv.shape[0]
        instinv = jnp.concatenate([
            geom.inst_inv.reshape(n_inst, 12),
            jnp.asarray([[1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0]],
                        jnp.float32),
        ], axis=0)
        wdelta = (geom.wdelta if geom.wdelta.shape[0] == n_inst
                  else jnp.zeros((n_inst,), jnp.int32))
        wdelta = jnp.concatenate([wdelta, jnp.zeros((1,), jnp.int32)])
        in_specs += [
            pl.BlockSpec(geom.winst.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(instinv.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        args += [geom.winst, instinv, wdelta]
    tri_space = pl.ANY if hbm_tris else pltpu.VMEM
    in_specs += [
        pl.BlockSpec(memory_space=tri_space),
        pl.BlockSpec((6, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args += [_eff_tris_hbm(geom) if hbm_tris else _eff_tris(geom),
             rays, tm]
    seeded = start is not None
    if seeded:
        # full (nb, 4) SMEM array, indexed by program_id in the kernel
        # (Mosaic rejects blocked SMEM specs with minor dims < (8, 128))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(start, jnp.int32))

    scratch = [pltpu.SMEM((STACK_CAP,), jnp.int32),
               pltpu.SMEM((1,), jnp.int32)]
    if instanced:
        scratch.append(pltpu.SMEM((STACK_CAP,), jnp.int32))
    scratch.append(pltpu.SMEM((STACK_CAP,), jnp.float32))
    scratch.append(pltpu.SMEM((1,), jnp.float32))
    if hbm_tris:
        scratch += [pltpu.VMEM((2, max_leaf + 8, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SMEM((3,), jnp.int32),
                    pltpu.SMEM((1,), jnp.float32)]

    out = pl.pallas_call(
        _make_kernel(any_hit=any_hit, max_leaf=max_leaf, width=width,
                     instanced=instanced, pops=pops, ordered=ordered,
                     hbm_tris=hbm_tris, seeded=seeded),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, nb * B), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)

    t = out[0, :R]
    tri = out[1, :R].astype(jnp.int32)
    return {"t": t, "tri": tri, "u": out[2, :R], "v": out[3, :R]}


# ===========================================================================
# Per-ray TLAS-candidate traversal with instance-rebinned BLAS walks
# ===========================================================================
#
# The packet walk above degrades on assemblies of many DISTINCT parts
# when the rays inside a block choose different parts: the block must
# walk the UNION of every instance any lane could hit, and most pops
# serve a minority of lanes. This driver restores per-ray pruning while
# keeping every kernel launch dense (round-4 design, ROOFLINE.md):
#
#   1. candidate pass: every ray slab-tests ALL instance world AABBs
#      (I is small — dozens of parts; (R, I) dense VPU math, no tree);
#   2. rounds: each ray picks its nearest untested candidate instance
#      whose AABB entry distance beats its current best t; rays are
#      sorted by (instance, coherence key) so blocks are (nearly)
#      instance-homogeneous, and the wide kernel launches each block
#      DIRECTLY into its instance's BLAS via per-block stack seeds —
#      packets walk one part's subtree at a time with no TLAS pops and
#      no cross-part union;
#   3. repeat while any ray has a candidate left (tightening t culls
#      most instances after the first round).
#
# Boundary blocks can span two instances; both seeds are pushed and both
# subtrees are walked by the whole block — a correct over-approximation
# (any reported hit is a real intersection; chosen-candidate bookkeeping
# only marks the ray's own choice as tested).


def trace_wide_rebinned(geom: GeometryData, origin, direction, t_max,
                        any_hit: bool = False, block: int | None = None,
                        max_rounds: int = 0, interpret: bool = False):
    """Candidate/rebinned traversal; contract of ops.traverse.trace.
    Requires instanced geometry with `inst_bridge` built
    (scene/instances.py). max_rounds=0 runs until no candidates remain.
    """
    from cadrays_tpu.ops.traverse import _coherence_key

    assert geom.instanced and (
        int(geom.inst_bridge.shape[0]) > 1
        or int(geom.inst_bridge[0]) != 0x7FFFFFFF), \
        "rebinned traversal needs instance candidate tables"
    R = origin.shape[0]
    B = block if block is not None else BLOCK
    nb = -(-R // B)
    Rp = nb * B
    I = geom.inst_lo.shape[0]
    INF = jnp.float32(_INF)

    tm0 = jnp.minimum(jnp.broadcast_to(t_max, (R,)), 1e30)

    # ---- candidate pass: (R, I) slab tests ------------------------------
    inv_d = 1.0 / jnp.where(jnp.abs(direction) < 1e-12,
                            jnp.where(direction >= 0, 1e-12, -1e-12),
                            direction)
    t0 = (geom.inst_lo[None] - origin[:, None]) * inv_d[:, None]
    t1 = (geom.inst_hi[None] - origin[:, None]) * inv_d[:, None]
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(t_near, 0.0)
    cand = (t_near <= jnp.minimum(t_far, tm0[:, None]))  # (R, I)
    t_near = jnp.where(cand, t_near, INF)

    key_coh = _coherence_key(geom, origin, direction)

    state = dict(
        t=tm0,
        tri=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32),
        v=jnp.zeros((R,), jnp.float32),
        tested=~cand,
    )

    def pending(s):
        live = s["t"] > 0.0
        if any_hit:
            live = live & (s["tri"] < 0)
        return (~s["tested"]) & (t_near < s["t"][:, None]) \
            & live[:, None]

    def cond(carry):
        s, r = carry
        ok = jnp.any(pending(s))
        if max_rounds:
            ok = ok & (r < max_rounds)
        return ok

    def body(carry):
        s, r = carry
        pend = pending(s)
        have = jnp.any(pend, axis=1)
        choice = jnp.argmin(jnp.where(pend, t_near, INF), axis=1) \
            .astype(jnp.int32)
        # sort: dead rays (no candidate) sink to tail blocks with tm=0
        key = jnp.where(have, choice, I).astype(jnp.int32) * (1 << 15) \
            + (key_coh & 0x7FFF)
        perm = jnp.argsort(key)
        o_s = origin[perm]
        d_s = direction[perm]
        tm_s = jnp.where(have[perm], s["t"][perm], 0.0)
        c_s = jnp.pad(jnp.where(have, choice, -1)[perm], (0, Rp - R),
                      constant_values=-1)

        cb = c_s.reshape(nb, B)
        # per-block seeds: the MIN and MAX live choices (sorted order
        # makes residents a contiguous instance range). A block spanning
        # 3+ tiny segments only walks its two extremes this round — the
        # middle lanes' choices stay PENDING (tested-marking below is
        # seed-gated), so they retry next round; progress is guaranteed
        # because each nonempty block tests at least its min choice.
        i0 = jnp.max(jnp.where(cb >= 0, cb, -1), axis=1)
        i1 = jnp.min(jnp.where(cb >= 0, cb, I + 1), axis=1)
        sent = jnp.int32(0x7FFFFFFF)
        m0 = jnp.where(i0 >= 0, geom.inst_bridge[jnp.maximum(i0, 0)],
                       sent)
        m1 = jnp.where((i1 <= I) & (i1 != i0),
                       geom.inst_bridge[jnp.clip(i1, 0, I - 1)], sent)
        start = jnp.stack(
            [m0, jnp.maximum(i0, 0), m1,
             jnp.clip(i1, 0, I - 1)], axis=1)

        res = trace_wide(geom, o_s, d_s, tm_s, any_hit=any_hit,
                         block=B, hbm_tris=True, start=start,
                         interpret=interpret)
        inv = jnp.argsort(perm)
        rt = res["t"][inv]
        rtri = res["tri"][inv]
        better = (rtri >= 0) & (rt < s["t"])
        # seed-gated tested mark, scattered back to original ray order
        blk = jnp.arange(Rp, dtype=jnp.int32) // B
        covered_s = (c_s == i0[blk]) | (c_s == i1[blk])
        covered = covered_s[:R][inv]
        mark = have & covered
        s2 = dict(
            t=jnp.where(better, rt, s["t"]),
            tri=jnp.where(better, rtri, s["tri"]),
            u=jnp.where(better, res["u"][inv], s["u"]),
            v=jnp.where(better, res["v"][inv], s["v"]),
            tested=s["tested"]
            | (mark[:, None]
               & (jnp.arange(I, dtype=jnp.int32)[None]
                  == choice[:, None])),
        )
        return s2, r + 1

    state, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    return {"t": state["t"], "tri": state["tri"], "u": state["u"],
            "v": state["v"]}
