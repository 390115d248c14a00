"""Real BPE (merge-table train + exact encode) vs hand-computed merges
on the classic Sennrich-style corpus."""

from maup_spark.functions.bpe import (bpe_encode_count, bpe_train_merges,
                                      _merge_word)


def _docs(spark):
    # word frequencies: low x5, lower x2, newest x6, widest x3
    rows = [
        (1, "low low low newest newest"),
        (2, "low low lower newest newest newest"),
        (3, "lower newest widest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_train_matches_hand_computation(spark):
    merges = bpe_train_merges(_docs(spark), n_merges=4)
    # pair counts round 1: ('e','s') 9, ('s','t') 9, ('n','e') 6, ...
    # tie at 9 -> min pair ('e','s'); round 2: ('es','t') 9 wins; then
    # ('n','e') 6; then ('ne','w') 6 ties ('est' pairs consumed) ...
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("l", "o")  # 7 = low(5)+lower(2) beats n-e 6
    assert merges[3] == ("lo", "w")


def test_encode_counts(spark):
    docs = _docs(spark)
    merges = bpe_train_merges(docs, n_merges=4)
    out = {r["doc_id"]: r["n_bpe_exact"] for r in bpe_encode_count(docs, merges).collect()}
    # after merges [es, est, lo, low]:
    #   low -> [low] = 1; lower -> [low,e,r] = 3
    #   newest -> [n,e,w,est] = 4; widest -> [w,i,d,est] = 4
    assert out[1] == 3 * 1 + 2 * 4       # 11
    assert out[2] == 2 * 1 + 3 + 3 * 4   # 17
    assert out[3] == 3 + 4 + 3 * 4       # 19


def test_zero_merges_is_char_count(spark):
    docs = _docs(spark)
    out = {r["doc_id"]: r["n_bpe_exact"] for r in bpe_encode_count(docs, []).collect()}
    assert out[1] == len("lowlowlownewestnewest")


def test_train_deterministic(spark):
    docs = _docs(spark)
    assert bpe_train_merges(docs, n_merges=6) == bpe_train_merges(docs, n_merges=6)


def test_merge_word_non_overlapping():
    assert _merge_word(tuple("aaa"), ("a", "a")) == ("aa", "a")


def test_trained_pin_matches_independent_trainer(spark):
    """The bpe_trained driver query's oracle replays _BPE_PIN_MERGES,
    derived by the Spark-free trainer in scripts/derive_bpe_pin.py.
    The Spark trainer must reproduce that pin exactly on the same
    100-doc sf0.01 slice — if this drifts, re-run the derivation script
    and re-pin BOTH (the driver row would go red otherwise)."""
    import os

    from pyspark.sql import functions as F

    from maup_spark.queries import (_BPE_PIN_MERGES, _BPE_TRAIN_NMERGES,
                                    _BPE_TRAIN_SLICE)

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/documents.parquet"):
        import pytest

        pytest.skip("sf0.01 testdata not present")
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    learned = bpe_train_merges(
        docs.filter(F.col("doc_id") < _BPE_TRAIN_SLICE),
        n_merges=_BPE_TRAIN_NMERGES,
    )
    assert learned == _BPE_PIN_MERGES


def test_distributed_strategy_matches_driver(spark):
    """strategy="distributed" (per-round DataFrame agg + JVM aggregate
    merge fold) must reproduce the driver loop's merge table exactly,
    including tie-breaks and the <2-count early stop."""
    docs = _docs(spark)
    drv = bpe_train_merges(docs, n_merges=8, strategy="driver")
    dist = bpe_train_merges(docs, n_merges=8, strategy="distributed")
    assert dist == drv


def test_distributed_strategy_matches_driver_on_corpus_slice(spark):
    import os

    import pytest
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("testdata not present")
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    docs = docs.filter(F.col("doc_id") < 40)
    drv = bpe_train_merges(docs, n_merges=24, strategy="driver")
    dist = bpe_train_merges(docs, n_merges=24, strategy="distributed")
    assert dist == drv and len(drv) == 24
