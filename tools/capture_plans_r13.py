"""Capture explain("formatted") for a set of queries into
plans/r13/<query>_<tag>.txt (tag = before|after).

Usage: python tools/capture_plans_r13.py <tag> [query ...]
With no query list: the bench HEADLINE + HEAVY_EXTRAS sets.
Executes each query at sf0.001 first so AQE finalizes and the file
shows the plan that actually ran (same approach as tools/plan_report.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hi_csa_db_spark.session import get_spark
import __spark_entry__ as entrymod
from bench import HEADLINE, HEAVY_EXTRAS


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or (HEADLINE + HEAVY_EXTRAS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture-r13")
    qs = entrymod.queries()
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = qs[name](spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
