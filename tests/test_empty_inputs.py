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
