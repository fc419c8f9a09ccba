#!/usr/bin/env python
"""One-command chip validation (round-4 verdict item #9).

Packages the three chip-side checks that previously ran by hand into a
single reproducible command with a single JSON verdict:

  1. cross-backend pixel goldens — tests/test_golden_hires.py rendered
     on the TPU backend against the CPU-recorded 256^2 goldens (Mosaic
     wide-BVH kernel vs the reference walk, per pixel);
  2. TPU perf gate — bench/perf_gate.py slope-timed probes vs recorded
     chip goldens (+10% tolerance, chip-model checked);
  3. headline bench — bench.py, one JSON line.

Run:   bench/tpu_run.sh python bench/tpu_validate.py
Writes bench/tpu_validate.json: {"ok": bool, "golden": {...},
"perf_gate": {...}, "bench": {...}} and exits non-zero when any
section fails, so the whole chip story is one pass/fail.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def run(cmd, timeout=1800, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    p = subprocess.run(cmd, cwd=ROOT, env=e, timeout=timeout,
                       capture_output=True, text=True)
    return p.returncode, p.stdout, p.stderr


def main() -> int:
    verdict = {"ok": True}

    # 1. cross-backend goldens on the chip
    code, out, err = run([sys.executable, "-m", "pytest",
                          "tests/test_golden_hires.py", "-q",
                          "--no-header"])
    m = re.search(r"(\d+) passed", out)
    f = re.search(r"(\d+) failed", out)
    verdict["golden"] = {
        "ok": code == 0,
        "passed": int(m.group(1)) if m else 0,
        "failed": int(f.group(1)) if f else (0 if code == 0 else -1),
        "tail": out.strip().splitlines()[-1] if out.strip() else err[-200:],
    }
    verdict["ok"] &= verdict["golden"]["ok"]
    print(f"[tpu_validate] goldens: {verdict['golden']}", flush=True)

    # 2. perf gate vs recorded chip goldens. Probe lines:
    #   "<name>   <ms> ms vs <golden_ms> ..."; the measured dict is also
    #   printed as one JSON line.
    code, out, err = run([sys.executable, "bench/perf_gate.py"])
    probes = {}
    for line in out.splitlines():
        if line.startswith("{"):
            try:
                probes.update({k: {"ms": v}
                               for k, v in json.loads(line).items()
                               if isinstance(v, (int, float))})
            except json.JSONDecodeError:
                pass
        mm = re.match(r"\s*(\w+)\s+([0-9.]+)\s+ms\s+vs\s+([0-9.]+)", line)
        if mm:
            probes.setdefault(mm.group(1), {})["ms"] = float(mm.group(2))
            probes[mm.group(1)]["golden_ms"] = float(mm.group(3))
    verdict["perf_gate"] = {"ok": code == 0, "probes": probes,
                            "tail": out.strip().splitlines()[-1]
                            if out.strip() else err[-200:]}
    verdict["ok"] &= verdict["perf_gate"]["ok"]
    print(f"[tpu_validate] perf gate: {verdict['perf_gate']}", flush=True)

    # 3. headline bench
    code, out, err = run([sys.executable, "bench.py"])
    bench = None
    for line in out.splitlines():
        if line.startswith("{"):
            try:
                bench = json.loads(line)
            except json.JSONDecodeError:
                pass
    verdict["bench"] = {"ok": code == 0 and bench is not None,
                        "result": bench}
    verdict["ok"] &= verdict["bench"]["ok"]
    print(f"[tpu_validate] bench: {bench}", flush=True)

    out_path = os.path.join(HERE, "tpu_validate.json")
    with open(out_path, "w") as fh:
        json.dump(verdict, fh, indent=1)
    print(f"[tpu_validate] {'PASS' if verdict['ok'] else 'FAIL'} "
          f"-> {out_path}", flush=True)
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
