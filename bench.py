#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <docs/sec of assign+prorate e2e>,
   "unit": "docs/sec", "queries": {name: sec, ...}, "sf": ...}

Scaling-efficiency protocol (north_rule): the same job at three
parallelism levels (local[2]/local[8]/local[32]) on identical input,
min-of-repeats per level; N->4N efficiency pairs are (t2/t8)/4 and
(t8/t32)/4.  ``--scaling`` automates all runs (see BENCH.md).
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
        # warm JIT/codegen with a cheap query — warming with a full-size
        # spatial job would dominate scaling-run wall time at high ENT_K
        QUERIES["normalize_lineitem"](spark, sf_dir).count()
        timings: dict[str, float] = {}
        headline = [
            "assign_points",
            "assign_points_knn",
            "intersections_rects",
            "prorate_nchars",
            "normalize_lineitem",
            "assign_to_max_lineitem",
            "text_stats",
            "normalize_text_docs",
            "chunk_docs",
            "repetition_score",
            "line_dedup",
            "novelty_docs",
            "aggregate_rects",
            "minhash_lsh",
            "substring_dedup",
            "simhash",
            "cosine_topk",
            "pages_extract",
            "extract_text_pages",
            "link_graph_hosts",
            "within_distance_points",
            "url_dedup_pages",
            "contamination_docs",
            "pack_shards_docs",
            "pii_scrub_docs",
            "lm_familiarity",
            "lm_bigram",
            "top_ngrams",
            "source_stats",
            "source_divergence",
            "blocklist_pages",
            "length_histogram",
            "weighted_sample_docs",
            "dsir_select_docs",
            "keep_best_docs",
            "minhash_cluster_keep_best",
            "adjacencies_nations",
            "intersections_triangles",
            "intersections_triangles_shuffle",
            "intersections_triangles_shuffle_fast",
        ]
        if os.environ.get("SPARK_GRAFT_BENCH_QUERIES"):
            headline = os.environ["SPARK_GRAFT_BENCH_QUERIES"].split(",")
        # min-of-3 by default: a one-off ~15-25s JVM hiccup (JIT/GC burst)
        # lands on an arbitrary query once per session and would otherwise
        # misattribute 10-20x to whichever query drew the short straw
        # (observed moving between minhash/pages_extract/adjacencies
        # across runs); the min is the steady-state cost
        repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
        for name in headline:
            best, rows = None, 0
            # the two queries that form the headline metric get extra
            # repeats: their min defines the reported docs/sec, and the
            # per-session JVM hiccup / GC noise otherwise leaks into the
            # headline when it lands on one of them (see BENCH.md round-4
            # root-cause section)
            n_rep = repeats + 4 if name in ("assign_points", "prorate_nchars") else repeats
            for _ in range(n_rep):
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                rows = df.count()  # full materialization
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
            print(f"# {name}: {rows} rows in {timings[name]}s", file=sys.stderr)
        # e2e assign+prorate wall-time drives the docs/sec headline metric;
        # when a custom query list is benched, e2e = its total
        if "assign_points" in timings and "prorate_nchars" in timings:
            e2e = timings["assign_points"] + timings["prorate_nchars"]
            metric = "assign+prorate e2e throughput"
        else:
            e2e = sum(timings.values())
            # custom query list (e.g. scaling mode): label the metric by
            # what was actually measured, not the default headline pair
            metric = "+".join(headline) + " e2e throughput"
        return {
            "metric": metric,
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
        # two-parallelism scaling evidence per BASELINE.md protocol.
        # The fan-out is raised so the job is compute-bound (fixed
        # per-stage overheads would otherwise dominate a seconds-long
        # run and make any parallelism look bad).
        import subprocess

        # The scaling job is the FUSED disaggregate→reaggregate pipeline
        # (prorate_nchars = spatial pieces join + weighting + exact
        # reaggregation, one Spark job) so the per-job fixed cost (~2-3s
        # of stage scheduling) is paid once; summing two separate jobs
        # double-counts it and costs ~0.04 efficiency at the 8-core level
        # for reasons unrelated to scaling.
        # 65536 entities/page = 327.7M points through the fused job:
        # W/n >> the ~2.5s fixed cost at every level, so the efficiency
        # measures the ENGINE, not Spark's per-job scheduling floor
        ent_k = os.environ.get("SPARK_GRAFT_ENT_K", "65536")
        results = {}
        for n in (2, 8, 32):
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(n),
                SPARK_GRAFT_SF_DIR=sf_dir,
                SPARK_GRAFT_ENT_K=ent_k,
                SPARK_GRAFT_BENCH_QUERIES="prorate_nchars",
                SPARK_GRAFT_BENCH_REPEATS="3",
            )
            out = subprocess.run(
                [sys.executable, __file__], env=env, capture_output=True, text=True
            )
            results[n] = json.loads(out.stdout.strip().splitlines()[-1])
        t2, t8, t32 = (results[n]["e2e_sec"] for n in (2, 8, 32))
        # two N->4N pairs: 2->8 sits inside this VM's linear-scaling
        # region; 8->32 additionally eats the hardware's ~64% ceiling at
        # 32 procs (measured with a pure-numpy multiprocessing probe)
        eff_2_8 = (t2 / t8) / 4.0
        eff_8_32 = (t8 / t32) / 4.0
        print(
            json.dumps(
                {
                    "metric": "scaling efficiency N->4N (local[2]->local[8])",
                    "value": round(eff_2_8, 3),
                    "unit": "fraction",
                    "eff_8_32": round(eff_8_32, 3),
                    "t2_sec": t2,
                    "t8_sec": t8,
                    "t32_sec": t32,
                    "throughput2": results[2]["value"],
                    "throughput8": results[8]["value"],
                    "throughput32": results[32]["value"],
                    "ent_k": int(ent_k),
                    "sf": sf_dir,
                }
            )
        )
        return
    print(json.dumps(_run_once(sf_dir, cpus)))


if __name__ == "__main__":
    main()
