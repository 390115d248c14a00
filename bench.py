#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <docs/sec of assign+prorate e2e>,
   "unit": "docs/sec", "queries": {name: sec, ...}, "sf": ...}

Scaling-efficiency protocol (north_rule): run this twice,
SPARK_GRAFT_CPUS=8 and =32, on the same input; efficiency =
(t_8 / t_32) / 4.  ``--scaling`` automates both runs.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _run_once(sf_dir: str, cpus: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from maup_spark.queries import QUERIES
    from maup_spark.session import get_spark

    spark = get_spark(f"maup-bench-{cpus}", master=f"local[{cpus}]")
    try:
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        timings: dict[str, float] = {}
        headline = [
            "assign_points",
            "assign_points_knn",
            "intersections_rects",
            "prorate_nchars",
            "normalize_lineitem",
            "assign_to_max_lineitem",
        ]
        for name in headline:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            rows = df.count()  # full materialization
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"# {name}: {rows} rows in {timings[name]}s", file=sys.stderr)
        # e2e assign+prorate wall-time drives the docs/sec headline metric
        e2e = timings["assign_points"] + timings["prorate_nchars"]
        return {
            "metric": "assign+prorate e2e throughput",
            "value": round(n_docs / e2e, 1),
            "unit": "docs/sec",
            "queries": timings,
            "sf": sf_dir,
            "cpus": cpus,
            "n_docs": n_docs,
            "e2e_sec": round(e2e, 3),
        }
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        # two-parallelism scaling evidence per BASELINE.md protocol
        import subprocess

        results = {}
        for n in (8, 32):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(n), SPARK_GRAFT_SF_DIR=sf_dir)
            out = subprocess.run(
                [sys.executable, __file__], env=env, capture_output=True, text=True
            )
            results[n] = json.loads(out.stdout.strip().splitlines()[-1])
        t8 = results[8]["e2e_sec"]
        t32 = results[32]["e2e_sec"]
        eff = (t8 / t32) / 4.0
        print(
            json.dumps(
                {
                    "metric": "scaling efficiency local[8]->local[32]",
                    "value": round(eff, 3),
                    "unit": "fraction",
                    "t8_sec": t8,
                    "t32_sec": t32,
                    "throughput8": results[8]["value"],
                    "throughput32": results[32]["value"],
                    "sf": sf_dir,
                }
            )
        )
        return
    print(json.dumps(_run_once(sf_dir, cpus)))


if __name__ == "__main__":
    main()
