"""Plan audit: print one line per catalog query summarizing physical-
plan traits that matter at scale — join strategies, Python stages,
shuffle (Exchange) count, scan pushdown. Usage:

    python tools/audit_plans.py [sf_dir]

Intended for eyeballing after catalog changes; the hard guarantees
live in tests/test_plans.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from mrbf_spark.session import get_spark
    from mrbf_spark import catalog

    spark = get_spark("plan-audit")
    for name, fn in sorted(catalog.queries().items()):
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - audit tool
            print(f"{name:32s} ERROR {type(exc).__name__}: {exc}")
            continue
        traits = []
        for marker, label in [
            ("BroadcastHashJoin", "BHJ"),
            ("SortMergeJoin", "SMJ"),
            ("ShuffledHashJoin", "SHJ"),
            ("BroadcastNestedLoopJoin", "BNLJ"),
            ("CartesianProduct", "CARTESIAN"),
        ]:
            n = plan.count(marker)
            if n:
                traits.append(f"{label}x{n}")
        live = plan.split("InMemoryTableScan")[0]
        if "Python" in live or "ArrowEvalPython" in live or "MapInPandas" in live:
            traits.append("PYTHON")
        traits.append(f"xchg={plan.count('Exchange')}")
        if "PushedFilters: [" in plan and "PushedFilters: []" not in plan:
            traits.append("pushed")
        print(f"{name:32s} {' '.join(traits)}")


if __name__ == "__main__":
    main()
