

def test_skew_report(spark):
    from maup_spark.telemetry import skew_report

    df = spark.createDataFrame(
        [(k,) for k in ["hot"] * 90 + ["a", "b", "c", "d", "e"] * 2],
        "k string",
    )
    rep = skew_report(df, "k", top_n=3)
    assert rep["n_keys"] == 6 and rep["n_rows"] == 100
    assert rep["max"] == 90 and rep["top"][0] == ("hot", 90)
    assert abs(rep["skew_ratio"] - 90 / (100 / 6)) < 1e-9
    assert [k for k, _ in rep["top"][1:]] == ["a", "b"]  # count-desc, key tiebreak
