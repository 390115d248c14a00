"""simhash_pairs (Hamming LSH) and embedding_dedup (cosine components).

The 16-bit simhash config and the exact embedding_dedup method are
oracle-gated by the driver (queries `simhash_pairs`, `embedding_dedup`);
these tests cover the SCALE configs the oracle can't express: 64-bit
signatures and the LSH candidate path.
"""

import pytest
from pyspark.sql import functions as F

from maup_spark.functions.dedup import simhash_pairs
from maup_spark.functions.similarity import embedding_dedup
from maup_spark.queries import _corpus, _emb_corpus

EXACT_OFF = 20_000_000_000_000  # _corpus copies every 7th doc verbatim


def test_simhash_pairs_64bit_selectivity(spark, sf_dir):
    """Production config (64-bit sigs, 16-bit bands): exact duplicates
    survive at Hamming 0, and the candidate set is orders of magnitude
    tighter than the 16-bit oracle config on the same corpus."""
    corpus = _corpus(spark, sf_dir)
    wide = simhash_pairs(corpus, n_bits=64, band_bits=16).cache()
    narrow_n = simhash_pairs(corpus).count()  # 16-bit oracle config

    rows = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in wide.collect()}
    n_docs = corpus.count()
    exact_ids = [
        r["doc_id"] for r in corpus.filter(F.col("doc_id") >= EXACT_OFF).collect()
    ]
    assert exact_ids
    for dup in exact_ids:  # verbatim copy -> identical signature
        assert rows[(dup - EXACT_OFF, dup)] == 0
    # 16 bits over a shared vocabulary collides massively; 64 bits doesn't
    assert len(rows) < narrow_n / 20
    assert len(rows) < n_docs * n_docs / 100
    assert all(h <= 3 for h in rows.values())
    assert all(a < b for a, b in rows)


def test_simhash_pairs_pigeonhole_guard(spark, sf_dir):
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(_corpus(spark, sf_dir), max_hamming=4)  # 4 bands
    with pytest.raises(ValueError, match="divide"):
        simhash_pairs(_corpus(spark, sf_dir), band_bits=5)


def test_embedding_dedup_lsh_matches_exact(spark, sf_dir):
    """The LSH candidate path recovers the exact method's clusters on
    near-identical vectors: at cosine ~0.999 per-table collision
    probability is (1-θ/π)^8 ≈ 0.96, any-of-4-tables ≈ 1-4e-6 — so the
    label maps should agree on (nearly) every vector."""
    emb = _emb_corpus(spark, sf_dir)
    want = {
        r["vec_id"]: r["canonical_id"]
        for r in embedding_dedup(emb, threshold=0.9, method="exact").collect()
    }
    got = {
        r["vec_id"]: r["canonical_id"]
        for r in embedding_dedup(emb, threshold=0.9, method="lsh").collect()
    }
    assert set(got) == set(want)  # every vector labeled in both
    agree = sum(got[v] == want[v] for v in want)
    assert agree / len(want) >= 0.95
    assert any(c != v for v, c in want.items())  # clusters actually exist


def _pairset(df, cols=("doc_a", "doc_b")):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_minhash_pair_strategies_identical(spark, sf_dir):
    """single_join (one exploded (band,key) self-join) and multi_join
    (round-3 per-band self-joins) must emit the IDENTICAL pair set —
    with and without the hot-bucket cap."""
    from maup_spark.functions.dedup import minhash_lsh_pairs

    corpus = _corpus(spark, sf_dir)
    for cap in (None, 50):
        single = _pairset(minhash_lsh_pairs(corpus, max_bucket=cap))
        multi = _pairset(
            minhash_lsh_pairs(corpus, max_bucket=cap, strategy="multi_join")
        )
        assert single == multi and single


def test_simhash_pair_strategies_identical(spark, sf_dir):
    from maup_spark.functions.dedup import simhash_pairs

    corpus = _corpus(spark, sf_dir)
    for kw in (dict(), dict(n_bits=64, band_bits=16)):
        single = _pairset(
            simhash_pairs(corpus, **kw), cols=("doc_a", "doc_b", "hamming")
        )
        multi = _pairset(
            simhash_pairs(corpus, strategy="multi_join", **kw),
            cols=("doc_a", "doc_b", "hamming"),
        )
        assert single == multi and single


def test_substring_dedup_closed_form(spark):
    from maup_spark.functions.dedup import substring_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),          # shares 8-gram with doc 2
            (2, "x a b c d e f g h z"),
            (3, "p q r s t u v w"),               # unique 8 tokens
            (4, "t t t t t t t t t"),             # within-doc repeat
            (5, "short doc"),                     # < 8 tokens
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in substring_dedup(docs, min_len=8).collect()}
    assert len(out) == 5
    assert (out[1]["dup_grams"], out[1]["dup_token_cov"]) == (1, 8)
    assert (out[2]["dup_grams"], out[2]["dup_token_cov"]) == (1, 8)
    assert (out[3]["dup_grams"], out[3]["dup_token_cov"]) == (0, 0)
    # two overlapping copies of "t"*8: union [0,8) u [1,9) = 9 tokens
    assert (out[4]["dup_grams"], out[4]["dup_token_cov"]) == (2, 9)
    assert (out[5]["n_tokens"], out[5]["dup_grams"]) == (2, 0)

    cross = {
        r["doc_id"]: r
        for r in substring_dedup(docs, min_len=8, scope="cross_doc").collect()
    }
    assert (cross[1]["dup_grams"], cross[4]["dup_grams"]) == (1, 0)


def test_substring_dedup_agg_matches_window_shape(spark):
    """Shape-parity insurance for the round-5 skew fix: the
    groupBy(gkey)+join-back occurrence count must produce exactly what
    the replaced Window.partitionBy(gkey) shape produced, including on
    a corpus with a boilerplate-hot gram shared by every doc."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from maup_spark.functions.dedup import substring_dedup

    suffix = " s1 s2 s3 s4 s5 s6 s7 s8"  # 8-token boilerplate: hot gram
    rows = [(i, f"w{i}a w{i}b w{i}c w{i}d" + suffix) for i in range(40)]
    rows += [(100, "a b c d e f g h i"), (101, "z a b c d e f g h")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    def window_shape(docs, L=8):
        grams = docs.selectExpr(
            "doc_id",
            f"""posexplode(
                  CASE WHEN size(split(text, ' ')) >= {L}
                       THEN transform(
                              sequence(0, size(split(text, ' ')) - {L}),
                              i -> concat_ws(' ', slice(split(text, ' '), i + 1, {L})))
                       ELSE array()
                  END) AS (pos, gram)""",
        ).select(
            "doc_id", "pos",
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
            .cast("bigint").alias("gkey"),
        )
        wk = Window.partitionBy("gkey")
        dup = grams.withColumn("__n", F.count("*").over(wk)).filter(F.col("__n") > 1)
        wd = (
            Window.partitionBy("doc_id").orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        swept = dup.select(
            "doc_id", "pos",
            F.greatest(
                F.col("pos") + F.lit(L)
                - F.greatest(F.col("pos"), F.max(F.col("pos") + F.lit(L)).over(wd)),
                F.lit(0),
            ).alias("__cov"),
        )
        per_doc = swept.groupBy("doc_id").agg(
            F.count("*").alias("dup_grams"),
            F.sum("__cov").cast("bigint").alias("dup_token_cov"),
        )
        base = docs.selectExpr(
            "doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens"
        )
        return base.join(per_doc, "doc_id", "left").select(
            "doc_id", "n_tokens",
            F.coalesce("dup_grams", F.lit(0)).cast("bigint").alias("dup_grams"),
            F.coalesce("dup_token_cov", F.lit(0)).cast("bigint").alias("dup_token_cov"),
        )

    got = sorted(tuple(r) for r in substring_dedup(docs).collect())
    want = sorted(tuple(r) for r in window_shape(docs).collect())
    assert got == want
    # hot gram is counted for every doc carrying it
    out = {r["doc_id"]: r for r in substring_dedup(docs).collect()}
    assert all(out[i]["dup_grams"] >= 1 for i in range(40))
