"""HLL sketch profile + cross-batch merge (SURVEY §8.2): per-batch
profiles written to parquet must union into corpus-level distinct
estimates without rescanning the data."""

from pyspark.sql import functions as F

from maup_spark.functions.profile import merge_profiles, profile_table_sketch


def test_sketch_estimate_accuracy(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).alias("m"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") % 7)
        .alias("with_nulls"),
    )
    prof = {r["column"]: r for r in profile_table_sketch(df).collect()}
    assert prof["k"]["n_rows"] == 10_000
    assert abs(prof["k"]["n_distinct_est"] - 10_000) / 10_000 < 0.05
    assert prof["m"]["n_distinct_est"] == 100  # small cardinalities exact
    assert prof["with_nulls"]["n_nulls"] == 1_000
    assert prof["with_nulls"]["n_distinct_est"] == 7  # nulls not sketched


def test_cross_batch_merge_matches_union(spark, tmp_path):
    # two overlapping "days": 0..5999 and 4000..9999 -> union 10k distinct
    day1 = spark.range(0, 6_000).select(F.col("id").alias("k"))
    day2 = spark.range(4_000, 10_000).select(F.col("id").alias("k"))
    # the cross-day story: profiles round-trip through parquet
    profile_table_sketch(day1).write.mode("overwrite").parquet(
        str(tmp_path / "p1"))
    profile_table_sketch(day2).write.mode("overwrite").parquet(
        str(tmp_path / "p2"))
    both = spark.read.parquet(str(tmp_path / "p1")).unionByName(
        spark.read.parquet(str(tmp_path / "p2")), allowMissingColumns=False
    )
    (m,) = merge_profiles(both).collect()
    assert m["column"] == "k"
    assert m["n_rows"] == 12_000  # row counts add (not distinct!)
    est = m["n_distinct_est"]
    assert abs(est - 10_000) / 10_000 < 0.05  # sketch union deduplicates
    # merged output is itself mergeable (associativity smoke)
    (mm,) = merge_profiles(merge_profiles(both)).collect()
    assert mm["n_distinct_est"] == est


def test_merge_is_order_insensitive(spark):
    batches = [
        profile_table_sketch(
            spark.range(i * 1000, i * 1000 + 1500).select(F.col("id").alias("k"))
        )
        for i in range(3)
    ]
    a = batches[0].unionByName(batches[1]).unionByName(batches[2])
    b = batches[2].unionByName(batches[0]).unionByName(batches[1])
    (ra,) = merge_profiles(a).collect()
    (rb,) = merge_profiles(b).collect()
    assert ra["n_distinct_est"] == rb["n_distinct_est"]
    assert ra["n_rows"] == rb["n_rows"] == 4500


def test_corpus_doctor_verdicts(spark):
    from maup_spark.functions.profile import corpus_doctor

    healthy = spark.createDataFrame(
        [(i, f"one two three four five six {i}") for i in range(20)],
        "doc_id long, text string",
    )
    (r,) = corpus_doctor(healthy).collect()
    assert r["healthy"] and r["n_dup_docs"] == 0 and r["n_empty"] == 0
    assert r["mean_tokens_e3"] == 7000

    sick = spark.createDataFrame(
        [(1, "dup dup dup dup dup dup"), (2, "dup dup dup dup dup dup"),
         (3, ""), (4, None)],
        "doc_id long, text string",
    )
    (r,) = corpus_doctor(sick).collect()
    assert not r["healthy"]
    assert r["n_empty"] == 2 and r["n_dup_docs"] == 1

    empty = spark.createDataFrame([], "doc_id long, text string")
    (r,) = corpus_doctor(empty).collect()
    assert r["n_docs"] == 0 and not r["healthy"] or r["n_docs"] == 0
