"""Dump `.explain("formatted")` for named declared queries into
plans/r06/<query>_after.txt (judge-checkable plan evidence; guide §7.2).

Usage: python scripts/dump_plans_r06.py graph_triangles graph_pagerank ...
Optional env: KG_PLAN_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from kg.session import get_spark

    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: dump_plans_r06.py <query> [<query> ...]")
    spark = get_spark("dump-plans", cores=8, shuffle_partitions=8)
    import __spark_entry__ as entry

    qs = entry.queries()
    sf = os.environ.get("KG_PLAN_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_after.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path, f"({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
