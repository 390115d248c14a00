"""End-to-end training-data pipeline: correctness of the composition and
checkpoint resume."""

import json

from pyspark.sql import functions as F

from maup_spark.pipeline import training_data_pipeline


MIX_WEIGHTS = {"src0": 2.0, "src1": 0.0}


def test_training_data_pipeline_and_resume(spark, sf_dir, tmp_path):
    run_dir = str(tmp_path / "run")
    out = training_data_pipeline(
        spark, sf_dir, run_dir, mixture_weights=MIX_WEIGHTS
    )

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_clean = out["clean"].count()
    n_dedup = out["deduped"].count()
    n_surv = out["surviving"].count()
    n_pruned = out["pruned"].count()
    n_final = out["final"].count()
    assert 0 < n_clean <= n_docs
    assert 0 < n_final <= n_pruned <= n_surv <= n_dedup <= n_clean

    rollup = out["district_rollup"]
    rows = rollup.collect()
    assert len(rows) > 100  # many districts populated
    # conservation: entity count equals 64 x surviving docs minus the
    # knocked-out-district NULL assignments
    total_entities = rollup.agg(F.sum("n_entities")).collect()[0][0]
    assert total_entities == n_final * 64

    # character mass conserved: sum over districts of n_chars equals
    # 64 x the per-doc totals of surviving docs
    doc_chars = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .join(out["final"].select("doc_id"), "doc_id")
        .agg(F.sum("n_chars"))
        .collect()[0][0]
    )
    mass = rollup.agg(F.sum("n_chars_sum")).collect()[0][0]
    assert mass == doc_chars * 64

    # QA artifact: the sketch profile covers the final corpus exactly
    prof = {r["column"]: r for r in out["profile"].collect()}
    assert prof["doc_id"]["n_rows"] == n_final
    assert prof["doc_id"]["n_nulls"] == 0
    assert abs(prof["doc_id"]["n_distinct_est"] - n_final) / n_final < 0.05

    # decontamination: benchmark (doc_id%97==0) docs never ship
    assert out["final"].filter(F.col("doc_id") % 97 == 0).count() == 0

    # mixture: integer weights are exact — src0 ships 2x, src1 is
    # dropped, every other source ships once
    src = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    shipped_by_src = dict(
        out["final"].join(src, "doc_id").groupBy("source").count().collect()
    )
    mixed_by_src = dict(out["mixture"].groupBy("source").count().collect())
    assert "src1" not in mixed_by_src
    for s, n in shipped_by_src.items():
        if s == "src0":
            assert mixed_by_src[s] == 2 * n
        elif s != "src1":
            assert mixed_by_src[s] == n

    # RESUME: a second invocation must skip every stage (checkpoint hits)
    out2 = training_data_pipeline(
        spark, sf_dir, run_dir, mixture_weights=MIX_WEIGHTS
    )
    assert out2["district_rollup"].count() == len(rows)
    manifest = [
        json.loads(line)
        for line in open(f"{run_dir}/_manifest.jsonl")
    ]
    second_run = manifest[-11:]  # eleven stages logged by the re-run
    assert all("skipped" in m["status"] for m in second_run)

    # pack: the token stream is gapless over the whole mix (last start
    # + last length == total token mass) and one row per mix replica
    pack = out["pack"]
    assert pack.count() == out["mixture"].count()
    total = out["mixture"].select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0]["t"]
    last = pack.orderBy(F.desc("doc_id"), F.desc("copy_idx")).first()
    assert last["start_offset"] + last["n_tokens"] == total

    # per-partition metrics exist for every stage
    stages = {
        r["stage"] for r in out["runner"].metrics().select("stage").collect()
    }
    assert stages == {
        "docs", "clean", "exact_dedup", "near_dedup", "substr_dedup",
        "decontaminate", "assign", "district_rollup", "profile", "mixture",
        "pack",
    }


def test_pipeline_pii_and_keep_best_policy(spark, sf_dir, tmp_path):
    """Round-5 policy surface: the optional PII-redaction stage slots in
    before the quality gate, and near_policy='keep_best' ships exactly
    the highest-quality member of every LSH candidate cluster (verified
    against an independent union-find over the same pair set)."""
    from maup_spark.functions.dedup import minhash_lsh_pairs
    from maup_spark.functions.text import quality_score
    from maup_spark.functions.webtext import pii_scrub

    run_dir = str(tmp_path / "run_kb")
    out = training_data_pipeline(
        spark, sf_dir, run_dir, mixture_weights={},
        scrub_pii=True, near_policy="keep_best",
    )

    # PII stage is checkpointed and byte-equal to pii_scrub(docs)
    want = pii_scrub(out["docs"]).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    got = out["pii_scrub"].select("doc_id", "text")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # survivors: independent union-find over the SAME candidate pairs
    deduped = out["deduped"]
    pairs = minhash_lsh_pairs(deduped, max_bucket=10_000).collect()
    scores = {
        r.doc_id: r.score_e6
        for r in quality_score(deduped).select("doc_id", "score_e6").collect()
    }
    parent = {d: d for d in scores}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p.doc_a), find(p.doc_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for d in scores:
        clusters.setdefault(find(d), []).append(d)
    expected = {
        min(members, key=lambda d: (-scores[d], d))
        for members in clusters.values()
    }
    surviving = {r.doc_id for r in out["surviving"].select("doc_id").collect()}
    assert surviving == expected
    # exactly one survivor per cluster, and clusters actually merged
    assert len(surviving) == len(clusters) < len(scores)


def test_pipeline_dsir_stage(spark, sf_dir, tmp_path):
    """Round-5 DSIR policy: the optional importance-selection stage
    slots in after decontamination; survivors equal an independent
    batch score-and-threshold over the decontaminated set, and the
    threshold genuinely drops something."""
    from maup_spark.functions.dsir import (
        dsir_ratio,
        dsir_score,
        hashed_gram_counts,
    )

    run_dir = str(tmp_path / "run_dsir")
    cfg = {"target_mod": 17, "min_score": -400, "n_buckets": 512,
           "hash_fn": "xxhash64"}
    out = training_data_pipeline(
        spark, sf_dir, run_dir, mixture_weights={}, dsir=cfg,
    )

    decon = spark.read.parquet(f"{run_dir}/decontaminate")
    target = decon.filter(F.col("doc_id") % 17 == 0)
    ratio = dsir_ratio(
        hashed_gram_counts(target, n_buckets=512, hash_fn="xxhash64"),
        hashed_gram_counts(decon, n_buckets=512, hash_fn="xxhash64"),
    )
    want = {
        r.doc_id
        for r in dsir_score(decon, ratio, n_buckets=512, hash_fn="xxhash64")
        .filter(F.col("score") >= -400)
        .collect()
    }
    got = {r.doc_id for r in out["final"].select("doc_id").collect()}
    assert got == want
    n_decon = decon.count()
    assert 0 < len(got) < n_decon  # the stage selects, not passes-through


def test_pipeline_chunk_stage(spark, sf_dir, tmp_path):
    """Round-5 chunking policy: with chunk_tokens set, pack units are
    fixed token windows; with overlap=0 the total token mass is
    conserved from mixture to chunks to pack, and the chunk stage
    equals an independent chunk_documents run over the mixture."""
    from maup_spark.functions.text import chunk_documents

    run_dir = str(tmp_path / "run_chunk")
    out = training_data_pipeline(
        spark, sf_dir, run_dir, mixture_weights={},
        chunk_tokens=16, chunk_overlap=0,
    )

    mixture = spark.read.parquet(f"{run_dir}/mixture")
    chunks = out["chunks"]

    # token conservation (overlap=0): sum over chunks == sum over docs
    n_tok = lambda df, c: df.selectExpr(
        f"sum(size(split({c}, ' '))) AS n"
    ).collect()[0]["n"]
    assert n_tok(chunks, "text") == n_tok(mixture, "text")

    # chunk stage == independent operator run
    mixed = mixture.withColumn(
        "mix_id", F.col("doc_id") * 1000 + F.col("copy_idx")
    )
    want = chunk_documents(
        mixed.select("mix_id", "text"), max_tokens=16, overlap=0,
        id_col="mix_id",
    ).select("mix_id", "chunk_idx", F.col("chunk_text").alias("text"))
    got = chunks.select("mix_id", "chunk_idx", "text")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # every chunk is <= 16 tokens and pack offsets remain gapless
    assert chunks.filter("size(split(text, ' ')) > 16").count() == 0
    pack = out["pack"]
    total = pack.selectExpr("max(start_offset + n_tokens) AS t").collect()[0]["t"]
    assert total == n_tok(mixture, "text")
