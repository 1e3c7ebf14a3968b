"""Scale-robustness gate (r7, VERDICT r6 next-round #5): run every
catalog entry's Spark-vs-DuckDB comparison at a LARGE sf (default the
generated .testdata/sf1 — 100× the driver's sf0.01 gate), one
subprocess per entry so a single oracle blow-up (e.g. a recursive-CTE
twin whose cost is quadratic in the corpus) times out loudly instead
of hanging the sweep.

Usage: python tools/gate_at_scale.py [sf_dir] [--timeout SECONDS]
Writes gate_scale_results.json next to this script's repo root and
prints a per-entry PASS/FAIL/TIMEOUT line with wall time.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

args = [a for a in sys.argv[1:] if not a.startswith("--timeout")]
SF_DIR = args[0] if args else os.path.join(REPO, ".testdata", "sf1")
TIMEOUT = 900
for a in sys.argv[1:]:
    if a.startswith("--timeout="):
        TIMEOUT = int(a.split("=", 1)[1])
ONLY = set(args[1:])


def main() -> int:
    from mrbf_spark import catalog

    names = [n for n in catalog.queries() if not ONLY or n in ONLY]
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.join(REPO, "tools", "check_correctness.py"),
                    SF_DIR,
                    name,
                    # r8: the gate runs the cost-aware oracle overlay
                    # (sf0.01-equality-pinned) so the DuckDB side can
                    # follow the engine to 100x scale
                    "--scale-oracles",
                ],
                capture_output=True,
                text=True,
                timeout=TIMEOUT,
                cwd=REPO,
            )
            dt = time.time() - t0
            out = proc.stdout
            if f"PASS {name}" in out:
                status = "PASS"
            elif f"ok?  {name}" in out:
                status = "ROWS_ONLY"
            else:
                status = "FAIL"
            detail = next(
                (l for l in out.splitlines() if name in l), ""
            ).strip()
        except subprocess.TimeoutExpired:
            dt = time.time() - t0
            status, detail = "TIMEOUT", f"killed after {TIMEOUT}s"
        results[name] = {"status": status, "sec": round(dt, 1), "detail": detail}
        print(f"{status:9s} {name} ({dt:.1f}s)  {detail}", flush=True)
    out_path = os.path.join(REPO, "gate_scale_results.json")
    # merge with a prior run over the same sf_dir so a targeted
    # re-check (e.g. after a fix) refreshes only its entries
    merged = results
    if ONLY and os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prior = json.load(f)
            # normalize: a prior absolute-path run must merge with a
            # relative-path re-check of the same directory
            if os.path.abspath(prior.get("sf_dir", "")) == os.path.abspath(
                SF_DIR
            ):
                merged = {**prior.get("results", {}), **results}
        except Exception:
            pass
    with open(out_path, "w") as f:
        json.dump(
            {"sf_dir": SF_DIR, "timeout_s": TIMEOUT, "results": merged},
            f,
            indent=1,
        )
    n_bad = sum(r["status"] == "FAIL" for r in results.values())
    n_to = sum(r["status"] == "TIMEOUT" for r in results.values())
    print(f"\n{len(results)} entries: {n_bad} FAIL, {n_to} TIMEOUT -> {out_path}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
