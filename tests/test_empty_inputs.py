"""Degenerate inputs: every round-3 operator must return an EMPTY (or
well-defined) result on empty/trivial input, not throw — ingest
pipelines see empty partitions and empty days constantly."""

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_dedup_family_empty(spark):
    from maup_spark.functions.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard,
        simhash_pairs,
        simhash_signatures,
    )

    e = _empty_docs(spark)
    assert exact_dedup(e).count() == 0
    assert simhash_signatures(e).count() == 0
    assert simhash_pairs(e).count() == 0
    assert minhash_lsh_pairs(e).count() == 0
    assert minhash_lsh_pairs(e, max_bucket=10).count() == 0
    assert ngram_jaccard(e).count() == 0


def test_similarity_family_empty(spark):
    from maup_spark.functions.similarity import ann_lsh_pairs, embedding_dedup

    e = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert ann_lsh_pairs(e).count() == 0
    assert embedding_dedup(e, method="exact").count() == 0
    assert embedding_dedup(e, method="lsh").count() == 0


def test_text_family_empty_and_trivial(spark):
    from maup_spark.functions.text import (
        line_dedup,
        repetition_score,
        stratified_sample,
    )

    e = _empty_docs(spark)
    assert repetition_score(e).count() == 0
    assert line_dedup(e).count() == 0
    assert stratified_sample(e, {"en": 1.0}, strata_col="text").count() == 0

    # empty-STRING text: split('') -> [''] = one empty token
    one = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = repetition_score(one).collect()[0]
    assert r["dup_token_frac_e6"] == 0 and r["top_bigram_frac_e6"] == 0
    assert line_dedup(one).collect()[0]["text"] == ""


def test_novelty_empty(spark):
    from maup_spark.streaming.novelty import novelty_batch

    e = spark.createDataFrame([], "doc_id long, ts long, text string")
    assert novelty_batch(e).count() == 0


def test_aggregate_empty_sources(spark):
    from maup_spark.operators.aggregate import aggregate_by_assignment
    from maup_spark import datagen as D

    src = spark.createDataFrame(
        [],
        "entity_id long, x0 double, y0 double, x1 double, y1 double,"
        " geometry binary, n_chars long",
    )
    out = aggregate_by_assignment(
        src,
        D.districts(spark),
        ["n_chars"],
        source_id="entity_id",
        target_id="district_id",
        source_bounds=("x0", "y0", "x1", "y1"),
        target_bounds=("dxmin", "dymin", "dxmax", "dymax"),
    )
    assert out.count() == 0


def test_round4_family_empty(spark):
    from maup_spark.functions.bpe import bpe_encode_count, bpe_train_merges
    from maup_spark.functions.dedup import substring_dedup
    from maup_spark.functions.profile import (merge_profiles,
                                              profile_table_sketch)

    e = _empty_docs(spark)
    assert substring_dedup(e).count() == 0
    assert substring_dedup(e, scope="cross_doc").count() == 0
    # empty corpus trains an empty merge table; encode yields no rows
    assert bpe_train_merges(e) == []
    assert bpe_encode_count(e, [("a", "b")]).count() == 0
    # sketch profile of an empty table is one all-zeros row per column
    prof = {r["column"]: r for r in profile_table_sketch(e).collect()}
    assert prof["doc_id"]["n_rows"] == 0
    assert prof["doc_id"]["n_nulls"] == 0
    assert prof["doc_id"]["n_distinct_est"] == 0
    assert merge_profiles(profile_table_sketch(e)).count() == 2


def test_round4_trivial_docs(spark):
    """Docs shorter than the gram width produce zero dup stats, and a
    one-word corpus trains zero merges (nothing repeats pairwise)."""
    from maup_spark.functions.dedup import substring_dedup

    docs = spark.createDataFrame(
        [(1, "one two"), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in substring_dedup(docs, min_len=8).collect()}
    assert (out[1]["dup_grams"], out[1]["dup_token_cov"]) == (0, 0)
    assert out[2]["dup_grams"] == 0


def test_shapefile_empty_layer(spark, tmp_path):
    from maup_spark.io.shapefile import read_shapefile_zip, write_shapefile_zip

    path = str(tmp_path / "empty.zip")
    write_shapefile_zip(path, [])
    assert read_shapefile_zip(spark, path).count() == 0


def test_components_empty_converges_first_round(spark):
    """Empty graph: the label-sum convergence probe sees NULL (sum over
    zero rows) — must break immediately, not burn max_iter rounds (the
    round-5 regression: None == None never satisfied the not-None
    guard, so empty inputs ran 50 slow rounds then raised)."""
    from maup_spark.operators.components import connected_components

    nodes = spark.createDataFrame([], "node long")
    edges = spark.createDataFrame([], "src long, dst long")
    # max_iter=1: converging on the first round is the contract
    assert connected_components(nodes, edges, max_iter=1).count() == 0


def test_round5_webtext_family_empty(spark):
    """Round-5 web-crawl/selection operators on empty input: every one
    must return an empty (or well-defined) result, not throw and not
    spin (the components empty-graph lesson)."""
    from maup_spark.functions.dsir import (
        dsir_ratio,
        dsir_score,
        dsir_select,
        hashed_gram_counts,
    )
    from maup_spark.functions.lm import lm_score, lm_train
    from maup_spark.functions.text import weighted_sample
    from maup_spark.functions.webtext import (
        canonicalize_url,
        contamination_check,
        host_stats,
        pack_shards,
        pii_scrub,
        upsample_by_source,
        url_dedup,
    )

    e = _empty_docs(spark)
    pages = spark.createDataFrame(
        [], "doc_id long, url string, crawl_ts long, text string, lang string"
    )

    assert canonicalize_url(pages).count() == 0
    assert url_dedup(pages, ts_col="crawl_ts").count() == 0
    assert host_stats(pages).count() == 0
    # empty corpus vs a real benchmark: nothing to score
    bench = spark.createDataFrame([(1, "a b c d e f g h")],
                                  "doc_id long, text string")
    assert contamination_check(e, bench, n=3).count() == 0
    # and a real corpus vs an EMPTY benchmark: zero matches, all rows
    out = contamination_check(bench, e, n=3).collect()
    assert len(out) == 1 and out[0]["n_matched"] == 0
    assert pack_shards(e, tokens_per_shard=100).count() == 0
    assert upsample_by_source(
        e.withColumn("source", F.lit("s")), {"s": 2.0}
    ).count() == 0
    assert pii_scrub(e).count() == 0

    # LM: empty train -> empty vocab; scoring vs empty vocab = all OOV
    lm = lm_train(e)
    assert lm.count() == 0
    scored = lm_score(bench, lm).collect()
    assert len(scored) == 1 and scored[0]["n_oov"] == scored[0]["n_tokens"]
    assert lm_score(e, lm).count() == 0

    # DSIR: empty target AND empty raw -> empty ratio, empty selection
    ratio = dsir_ratio(hashed_gram_counts(e), hashed_gram_counts(e))
    assert ratio.count() == 0
    assert dsir_select(dsir_score(e, ratio), 5).count() == 0
    # empty target, real raw: every bucket scores fam_p=0 (pure penalty)
    ratio2 = dsir_ratio(hashed_gram_counts(e), hashed_gram_counts(bench))
    s = dsir_score(bench, ratio2).collect()
    assert len(s) == 1 and s[0]["score"] < 0

    assert weighted_sample(
        e.withColumn("w", F.lit(1.0)), 5, weight_col="w"
    ).count() == 0
