"""End-to-end training-data pipeline over the Common-Crawl-style pages
table — the north-star workload as ONE checkpoint-resumable run:

    pages ─ extract_text ─ quality gate ─ exact dedup ─ near-dup prune
          ─ exact-substring prune ─ benchmark decontamination
          ─ entity points ─ district assign ─ per-district rollup
          ─ sketch profile (QA artifact) ─ mixture (temperature
            upsampling, the final training mix)

Every arrow is a StageRunner stage (parquet checkpoint + `_SUCCESS` +
per-partition metrics): a preempted run resumes from the last completed
stage; stage outputs are the Iceberg-shaped tables of io.table at
production scale.  The per-stage operators are exactly the public ones
the driver queries verify — the pipeline adds no private logic, only
composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io.lineage import StageRunner


def training_data_pipeline(
    spark: SparkSession, sf_dir: str, run_dir: str,
    min_quality_e6: int = 500_000,
    max_dup_frac: float = 0.9,
    decontaminate_tau: float = 0.5,
    mixture_weights: dict | None = None,
    scrub_pii: bool = False,
    near_policy: str = "min_id",
    dsir: dict | None = None,
    chunk_tokens: int | None = None,
    chunk_overlap: int = 0,
) -> dict[str, DataFrame]:
    """Returns {stage: DataFrame} for the checkpointed stages; the final
    ``district_rollup`` is per-district clean-document character mass.

    ``min_quality_e6`` is the quality-gate threshold (the default is
    ``quality_score``'s own keep bar; corpora with no natural-language
    signal — e.g. the synthetic hex bench corpus — score 0.4 and need
    a lower bar to flow through the remaining stages).
    ``decontaminate_tau`` drops docs whose distinct-8-gram overlap with
    the benchmark slice reaches the threshold; ``mixture_weights`` are
    the per-source temperature-upsampling weights of the final mix
    (``{}`` = keep everything once).

    ``scrub_pii`` inserts the email/phone/IPv4 redaction stage (pure
    codegen projection) between extraction and the quality gate — the
    C4/Dolma placement, so downstream fingerprints/dedup see the
    redacted text.  ``near_policy`` picks the near-dup survivor:
    ``"min_id"`` (drop every doc_b of a candidate pair — cheap, order
    bias) or ``"keep_best"`` (RefinedWeb policy: connected components
    over the candidate graph, keep the highest-quality member per
    cluster via the ``keep_best`` max-struct agg).

    ``dsir`` (optional) inserts DSIR importance selection between
    decontamination and assignment (the data-selection placement):
    ``{"target_mod": 17, "min_score": -10}`` keeps docs whose integer
    importance score vs the ``doc_id % target_mod == 0`` curated-target
    slice clears ``min_score``; optional ``"n_buckets"`` (default 4096)
    and ``"hash_fn"`` ("md5" portable / "xxhash64" production,
    default).

    ``chunk_tokens`` (optional) splits every mixture row into
    ``chunk_tokens``-token windows (``chunk_overlap`` shared tokens)
    before packing, so the pack units are training-sized chunks rather
    than whole documents — long pages stop straddling many shards."""
    from . import datagen as D
    from .functions.dedup import exact_dedup, minhash_lsh_pairs, substring_dedup
    from .functions.multimodal import extract_text, pages
    from .functions.profile import profile_table_sketch
    from .functions.text import quality_score
    from .functions.webtext import contamination_check, upsample_by_source
    from .operators.assign import assign_points

    runner = StageRunner(spark, run_dir, run_id="training-data")
    out: dict[str, DataFrame] = {}

    # 1. ingest + HTML→text (byte-identity with the stored text is the
    #    determinism gate, verified by the pages_extract driver query)
    def build_docs():
        pg = pages(spark, sf_dir)
        extracted = extract_text(pg)
        return extracted.withColumn(
            "doc_id", F.split(F.col("url"), "/").getItem(4).cast("bigint")
        ).select("doc_id", F.col("extracted_text").alias("text"))

    docs = out["docs"] = runner.run_stage("docs", build_docs)
    clean_input, clean_deps = docs, ["docs"]

    # 1b. optional PII redaction (C4/Dolma placement: before any
    #     fingerprint/dedup stage so duplicates of a page differing
    #     only in injected PII collapse to one redacted form)
    if scrub_pii:
        def build_pii():
            from .functions.webtext import pii_scrub

            return pii_scrub(docs).select(
                "doc_id", F.col("clean_text").alias("text")
            )

        clean_input = out["pii_scrub"] = runner.run_stage(
            "pii_scrub", build_pii, inputs=["docs"]
        )
        clean_deps = ["pii_scrub"]

    # 2. quality gate
    def build_clean():
        q = quality_score(clean_input)
        return clean_input.join(
            q.filter(F.col("score_e6") >= min_quality_e6).select("doc_id"),
            "doc_id",
        )

    clean = out["clean"] = runner.run_stage(
        "clean", build_clean, inputs=clean_deps
    )

    # 3. exact dedup: drop non-canonical members of duplicate groups
    def build_exact():
        groups = exact_dedup(clean)
        dups = (
            clean.select("doc_id", F.md5("text").alias("fingerprint"))
            .join(groups, "fingerprint")
            .filter(F.col("doc_id") != F.col("canonical_id"))
            .select("doc_id")
        )
        return clean.join(dups, "doc_id", "left_anti")

    deduped = out["deduped"] = runner.run_stage(
        "exact_dedup", build_exact, inputs=["clean"]
    )

    # 4. near-dup prune: for every LSH candidate pair keep the smaller id.
    #    Capped buckets: one boilerplate shingle shared corpus-wide can
    #    capture a band's argmin for thousands of docs at once (measured
    #    at 10^6 docs — BENCH.md "Boilerplate in miniature"); a
    #    production crawl always runs the guard.
    def build_near():
        pairs = minhash_lsh_pairs(deduped, max_bucket=10_000)
        if near_policy == "keep_best":
            # RefinedWeb survivor policy: cluster the candidate graph
            # (components converge in O(log n) label rounds) and keep
            # the highest-quality member per cluster — singletons keep
            # themselves (min_members=1), ties break to the lowest id
            from .functions.dedup import keep_best
            from .operators.components import connected_components

            comp = connected_components(
                deduped.select(F.col("doc_id").alias("node")),
                pairs,
                src_col="doc_a",
                dst_col="doc_b",
            )
            scored = quality_score(deduped).select("doc_id", "score_e6")
            clustered = comp.join(
                scored, comp["node"] == scored["doc_id"]
            ).select("comp", "doc_id", "score_e6")
            best = keep_best(clustered, "comp", "score_e6")
            return deduped.join(best.select("doc_id"), "doc_id")
        losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        return deduped.join(losers, "doc_id", "left_anti")

    surviving = out["surviving"] = runner.run_stage(
        "near_dedup", build_near, inputs=["exact_dedup"]
    )

    # 4b. exact-substring prune (the ExactSubstr pass): drop docs whose
    #     corpus-duplicated 8-gram spans cover more than max_dup_frac of
    #     their tokens — catches partial copies that survive whole-doc
    #     exact dedup and shingle-level near-dup pruning
    def build_substr():
        stats = substring_dedup(surviving, min_len=8)
        keep = stats.filter(
            F.col("dup_token_cov") <= F.lit(max_dup_frac) * F.col("n_tokens")
        ).select("doc_id")
        return surviving.join(keep, "doc_id")

    pruned = out["pruned"] = runner.run_stage(
        "substr_dedup", build_substr, inputs=["near_dedup"]
    )

    # 4c. benchmark decontamination: drop docs whose distinct 8-gram
    #     overlap with the eval suite (the doc_id % 97 == 0 slice
    #     stands in for an external benchmark here) reaches tau —
    #     catches train/test leakage that survives dedup, which only
    #     compares the corpus against itself.  The benchmark gram set
    #     broadcasts (eval suites are tiny vs the corpus); benchmark
    #     docs themselves are excluded from the shipped corpus.
    def build_decon():
        # the bench slice must be in the SAME text form as the corpus
        # being checked (post-PII-redaction when scrub_pii): 8-grams
        # spanning a redacted span otherwise differ between bench and
        # corpus and contamination near PII is undercounted
        bench = clean_input.filter(F.col("doc_id") % 97 == 0)
        corpus = pruned.join(bench.select("doc_id"), "doc_id", "left_anti")
        leaked = (
            contamination_check(corpus, bench, n=8)
            .filter(F.col("contamination") >= decontaminate_tau)
            .select("doc_id")
        )
        return corpus.join(leaked, "doc_id", "left_anti")

    final = out["final"] = runner.run_stage(
        "decontaminate", build_decon, inputs=["substr_dedup"] + clean_deps
    )
    # downstream stages consume `final`, whose producer changes when
    # DSIR is enabled — track the stage NAME alongside the frame so
    # is_stale invalidation follows the true data dependency
    final_stage = "decontaminate"

    # 4d. optional DSIR importance selection: keep docs whose hashed-
    #     unigram+bigram importance score vs the curated-target slice
    #     clears the threshold (threshold, not top-K: survival must
    #     not depend on what else is in the batch).  Static bounded
    #     models -> broadcast ratio join -> per-doc agg; the target
    #     slice itself stays in the corpus (it IS the curated data).
    if dsir is not None:
        from .functions.dsir import dsir_ratio, dsir_score, hashed_gram_counts

        d_mod = dsir.get("target_mod", 17)
        d_min = dsir["min_score"]
        d_b = dsir.get("n_buckets", 4096)
        d_h = dsir.get("hash_fn", "xxhash64")

        def build_dsir():
            target = final.filter(F.col("doc_id") % d_mod == 0)
            ratio = dsir_ratio(
                hashed_gram_counts(target, n_buckets=d_b, hash_fn=d_h),
                hashed_gram_counts(final, n_buckets=d_b, hash_fn=d_h),
            )
            keep = (
                dsir_score(final, ratio, n_buckets=d_b, hash_fn=d_h)
                .filter(F.col("score") >= d_min)
                .select("doc_id")
            )
            return final.join(keep, "doc_id", "left_semi")

        final = out["final"] = runner.run_stage(
            "dsir_select", build_dsir, inputs=["decontaminate"]
        )
        final_stage = "dsir_select"

    # 5. entity points of surviving docs → district assignment
    def build_assigned():
        pts = D.points(spark, sf_dir).join(
            final.select("doc_id"), "doc_id"
        )
        return assign_points(
            pts,
            D.districts(spark),
            point_id="entity_id",
            target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
            targets_are_rects=True,
        ).join(pts.select("entity_id", "doc_id", "n_chars"), "entity_id")

    assigned = out["assigned"] = runner.run_stage(
        "assign", build_assigned, inputs=[final_stage]
    )

    # 6. per-district rollup of clean-document character mass
    out["district_rollup"] = runner.run_stage(
        "district_rollup",
        lambda: assigned.groupBy("district_id").agg(
            F.count("*").alias("n_entities"),
            F.sum("n_chars").alias("n_chars_sum"),
            F.countDistinct("doc_id").alias("n_docs"),
        ),
        inputs=["assign"],
    )

    # 7. QA artifact: the mergeable sketch profile of the shipped corpus
    #    — per-batch profiles union across ingest days via
    #    merge_profiles without rescanning (SURVEY §8.2)
    out["profile"] = runner.run_stage(
        "profile",
        lambda: profile_table_sketch(final),
        inputs=[final_stage],
    )

    # 8. the final training mix: deterministic per-source temperature
    #    upsampling of the shipped corpus (pure projection + explode —
    #    replicas carry copy_idx so a pack-and-shard write can spread
    #    them across output files)
    def build_mixture():
        src = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "source"
        )
        return upsample_by_source(
            final.join(src, "doc_id"), mixture_weights or {}
        )

    mixture = out["mixture"] = runner.run_stage(
        "mixture", build_mixture, inputs=[final_stage]
    )

    # 9. token-stream sharding of the mix: every (doc, copy) gets its
    #    global start offset and shard in the concatenated token stream
    #    (two-level prefix scan — see functions.webtext.pack_shards).
    #    The stream order is the COMPOSITE key (doc_id, copy_idx[,
    #    chunk_idx]) — no arithmetic packing into one BIGINT, which
    #    would overflow at 10^12 docs (doc_id*10^8 > BIGINT max) and
    #    collide on long docs (chunk_idx >= 10^5) — so replicas still
    #    land right after their original deterministically.
    # 9b. optional chunking: split each (doc, copy) into fixed token
    #     windows so pack units are training-sized (projection +
    #     explode, zero shuffle; ids stay deterministic)
    pack_input, pack_from = mixture, "mixture"
    if chunk_tokens is not None:
        from .functions.text import chunk_documents

        def build_chunks():
            # mix_id = doc_id*1000 + copy_idx is safe at the design
            # scale (10^12 docs * 1000 << BIGINT max) but ONLY while
            # copy_idx <= 999 (mixture weight < 1000) — enforced in
            # the expression itself (raise_error survives column
            # pruning; a dropped assert column would not)
            mixed = mixture.withColumn(
                "mix_id",
                F.when(
                    F.col("copy_idx") < 1000,
                    F.col("doc_id") * 1000 + F.col("copy_idx"),
                ).otherwise(
                    F.raise_error(
                        F.lit("mix_id encoding requires copy_idx < 1000")
                    ).cast("bigint")
                ),
            )
            ch = chunk_documents(
                mixed.select("mix_id", "text"),
                max_tokens=chunk_tokens,
                overlap=chunk_overlap,
                id_col="mix_id",
            )
            return ch.select(
                "mix_id",
                "chunk_idx",
                F.col("chunk_text").alias("text"),
            )

        pack_input = out["chunks"] = runner.run_stage(
            "chunk", build_chunks, inputs=["mixture"]
        )
        pack_from = "chunk"

    def build_pack():
        from .functions.webtext import pack_shards

        if chunk_tokens is not None:
            order = ["mix_id", "chunk_idx"]
            lead = "mix_id"
        else:
            order = ["doc_id", "copy_idx"]
            lead = "doc_id"
        return pack_shards(
            pack_input,
            tokens_per_shard=100_000,
            id_col=lead,
            order_cols=order,
        )

    out["pack"] = runner.run_stage("pack", build_pack, inputs=[pack_from])
    out["runner"] = runner
    return out
