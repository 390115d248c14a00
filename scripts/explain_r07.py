#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/r07/.

Usage: python scripts/explain_r07.py <suffix> <query> [query ...]
  suffix: "before" or "after" (file name suffix)
Writes plans/r07/<query>_<suffix>.txt.  Run from /root/repo.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maup_spark.queries import QUERIES  # noqa: E402
from maup_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-r07", master="local[4]")
    for name in names:
        df = QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
