"""Golden-image + performance regression harness.

Port of the reference's testing strategy (testing/CADRays_Testing.py,
SURVEY.md §4): every test is a scene script rendered at a fixed sample
count; the result is diffed per-pixel against a stored golden template
and the throughput is gated against a stored baseline with a +/-
tolerance (default 2%, CADRays_Testing.py:84). `--update` promotes the
current run to the new golden set (:144-167). Output: one HTML report
with output/golden/diff triplets (:29-69) plus a JSON summary.

Usage:
    python -m cadrays_tpu.testing.regression [--update] [--scenes DIR]
        [--golden DIR] [--report out.html] [--spp N] [--tol 0.02]
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import List, Optional

import numpy as np


def run_scene(script_path: str, spp: int, res, persistent=None):
    """Render one scene script; returns (hdr image, seconds).

    persistent: override params.persistent after the script runs — the
    golden set gates BOTH estimators (the persistent default and the
    fixed-depth wavefront, `<name>_fixed.npz`), which are statistically
    but not bitwise equal."""
    import jax

    from cadrays_tpu.cli.commands import Console, Session
    from cadrays_tpu.integrator.progressive import progressive_step

    session = Session()
    session.cwd = os.path.dirname(os.path.abspath(script_path)) or "."
    console = Console(session)
    console.source(script_path)
    if res:
        session.width, session.height = res
    if persistent is not None:
        session.params = session.params.replace(persistent=persistent)
    data = session.scene.flatten(session.camera)
    # compile outside the timed region (the reference times steady-state
    # frames, not driver startup)
    st = progressive_step(data, session.camera, session.params,
                          session.width, session.height, None, 1)
    jax.block_until_ready(st.accum)
    t0 = time.perf_counter()
    st = progressive_step(data, session.camera, session.params,
                          session.width, session.height, st,
                          samples_per_step=max(spp - 1, 1))
    jax.block_until_ready(st.accum)
    dt = time.perf_counter() - t0
    return np.asarray(st.image), dt


def compare(img: np.ndarray, golden: np.ndarray, pix_tol: float = 0.02):
    """Per-pixel diff stats (the reference uses a binary diff image,
    CADRays_Testing.py:226-231; we report mean/max absolute error and the
    fraction of pixels outside tolerance)."""
    if img.shape != golden.shape:
        return {"match": False, "reason": "shape mismatch",
                "bad_frac": 1.0, "mean_err": float("inf")}
    err = np.abs(img - golden)
    bad = np.any(err > pix_tol, axis=-1)
    return {
        "match": bool(bad.mean() < 0.005),
        "bad_frac": float(bad.mean()),
        "mean_err": float(err.mean()),
        "max_err": float(err.max()),
    }


def html_report(rows: List[dict], path: str) -> None:
    cells = []
    for r in rows:
        color = "#cfc" if r["ok"] else "#fcc"
        cells.append(
            f"<tr style='background:{color}'><td>{r['name']}</td>"
            f"<td>{r.get('mean_err', '')}</td>"
            f"<td>{r.get('bad_frac', '')}</td>"
            f"<td>{r.get('spp_per_s', 0):.3f}</td>"
            f"<td>{r.get('perf_delta', 0) * 100:+.1f}%</td>"
            f"<td>{r.get('note', '')}</td></tr>")
    html = ("<html><body><h2>cadrays_tpu regression report</h2>"
            "<table border=1 cellpadding=4><tr><th>scene</th>"
            "<th>mean err</th><th>bad pixel frac</th><th>spp/s</th>"
            "<th>perf delta</th><th>note</th></tr>"
            + "".join(cells) + "</table></body></html>")
    with open(path, "w") as f:
        f.write(html)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None,
                    help="force a jax platform (e.g. cpu); goldens are "
                    "backend-specific, tests render them on cpu")
    ap.add_argument("--scenes", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "tests", "data"))
    ap.add_argument("--golden", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "tests", "golden"))
    ap.add_argument("--report", default="regression_report.html")
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--res", type=int, nargs=2, default=[64, 64])
    ap.add_argument("--tol", type=float, default=0.02,
                    help="perf gate (fraction, reference default 2%%)")
    ap.add_argument("--pix-tol", type=float, default=0.02)
    ap.add_argument("--update", "-u", action="store_true",
                    help="promote this run to the golden template")
    ap.add_argument("--fixed-wavefront", action="store_true",
                    help="render with persistent=False against the "
                    "`<name>_fixed.npz` golden set")
    args = ap.parse_args(argv)

    if args.backend:
        # the env var alone is too late in images whose sitecustomize
        # imports jax at interpreter startup (see tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", args.backend)

    os.makedirs(args.golden, exist_ok=True)
    scenes = sorted(f for f in os.listdir(args.scenes)
                    if f.endswith(".crt"))
    rows = []
    failed = 0
    for fname in scenes:
        name = os.path.splitext(fname)[0]
        img, dt = run_scene(os.path.join(args.scenes, fname), args.spp,
                            args.res,
                            persistent=(False if args.fixed_wavefront
                                        else None))
        spp_per_s = (args.spp - 1) / dt
        suffix = "_fixed" if args.fixed_wavefront else ""
        g_img_path = os.path.join(args.golden, f"{name}{suffix}.npz")
        row = {"name": name, "ok": True, "spp_per_s": spp_per_s,
               "perf_delta": 0.0}
        if args.update or not os.path.exists(g_img_path):
            np.savez_compressed(g_img_path, image=img, spp_per_s=spp_per_s)
            row["note"] = "golden updated"
        else:
            z = np.load(g_img_path)
            stats = compare(img, z["image"], args.pix_tol)
            row.update(stats)
            row["perf_delta"] = spp_per_s / float(z["spp_per_s"]) - 1.0
            row["ok"] = stats["match"]
            # perf gate is advisory on shared machines; flag only
            if abs(row["perf_delta"]) > args.tol:
                row["note"] = "perf outside gate"
        if not row["ok"]:
            failed += 1
        rows.append(row)
        print(json.dumps(row))

    html_report(rows, args.report)
    print(f"report -> {args.report}; {failed} failures / {len(rows)} scenes")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
