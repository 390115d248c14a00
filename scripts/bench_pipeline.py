#!/usr/bin/env python
"""End-to-end training_data_pipeline bench at real row counts: full
run + all-skip resume over the bench_scale corpus.

Usage: python scripts/bench_pipeline.py [n_docs] [out_json]
Reuses .bench_data/docs{N}/ (built by bench_scale.py if absent).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_PIPELINE.json"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from maup_spark.pipeline import training_data_pipeline
    from maup_spark.session import get_spark

    from bench_scale import ensure_dataset  # same directory

    spark = get_spark(f"bench-pipeline-{n_docs}", master=f"local[{cpus}]")
    sf_dir = ensure_dataset(spark, n_docs)
    run_dir = os.path.join(REPO, ".bench_data", f"pipeline{n_docs}")
    shutil.rmtree(run_dir, ignore_errors=True)

    # the hex bench corpus has no natural-language signal (quality 0.4)
    # and ten crawl-N sources; bar lowered as in the round-3 run, one
    # source upsampled and one dropped so mixture/pack do real work
    kwargs = dict(
        min_quality_e6=300_000,
        mixture_weights={"crawl-0": 2.0, "crawl-1": 0.0},
    )
    # SPARK_GRAFT_PIPELINE_POLICY=full turns every round-5 policy stage
    # on: PII redaction, keep-best near-dup survivors, DSIR selection
    # (threshold probed at the corpus ~q10 so the stage genuinely
    # drops a tail), and 512-token chunking before pack
    if os.environ.get("SPARK_GRAFT_PIPELINE_POLICY") == "full":
        from pyspark.sql import functions as F

        from maup_spark.functions.dsir import (
            dsir_ratio,
            dsir_score,
            hashed_gram_counts,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        ratio = dsir_ratio(
            hashed_gram_counts(
                docs.filter(F.col("doc_id") % 17 == 0),
                n_buckets=4096, hash_fn="xxhash64",
            ),
            hashed_gram_counts(docs, n_buckets=4096, hash_fn="xxhash64"),
        )
        probe = dsir_score(
            docs.filter(F.col("doc_id") % 97 == 0), ratio,
            n_buckets=4096, hash_fn="xxhash64",
        )
        q10 = int(probe.approxQuantile("score", [0.1], 0.01)[0])
        kwargs.update(
            scrub_pii=True,
            near_policy="keep_best",
            chunk_tokens=512,
            chunk_overlap=32,
            dsir={"target_mod": 17, "min_score": q10,
                  "n_buckets": 4096, "hash_fn": "xxhash64"},
        )
    t0 = time.perf_counter()
    out = training_data_pipeline(spark, sf_dir, run_dir, **kwargs)
    counts = {
        name: out[name].count()
        for name in (
            "docs", "clean", "deduped", "surviving", "pruned", "final",
            "mixture", "pack",
        )
    }
    rollup_rows = out["district_rollup"].count()
    full_s = time.perf_counter() - t0

    t1 = time.perf_counter()
    out2 = training_data_pipeline(spark, sf_dir, run_dir, **kwargs)
    assert out2["pack"].count() == counts["pack"]
    resume_s = time.perf_counter() - t1

    result = {
        "metric": "training_data_pipeline e2e throughput",
        "value": round(n_docs / full_s, 1),
        "unit": "docs/sec",
        "full_sec": round(full_s, 1),
        "resume_sec": round(resume_s, 1),
        "counts": counts,
        "district_rollup_rows": rollup_rows,
        "n_docs": n_docs,
        "cpus": cpus,
    }
    with open(out_json, "w") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
