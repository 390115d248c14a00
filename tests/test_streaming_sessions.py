"""Stateful streaming sessionization: the applyInPandasWithState stream
must emit exactly the sessions the batch lag/cumsum twin computes."""

import os
import time

import pytest
from pyspark.sql import functions as F

from maup_spark.streaming.sessions import sessionize_batch, streaming_sessionize

GAP = 1800  # 30 min


@pytest.fixture()
def session_dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return {
        "src": str(src),
        "ckpt": str(tmp_path / "ckpt"),
        "out": str(tmp_path / "out"),
    }


def test_streaming_sessions_match_batch(spark, sf_dir, session_dirs):
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") % 17 == 0)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    assert events.count() > 50

    # real events in file 1
    events.coalesce(1).write.mode("overwrite").parquet(session_dirs["src"])
    # sentinel far-future event in file 2: pushes the watermark past
    # last_ts + gap for EVERY real session so all of them time out
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(999999, max_ts, 999999999, "sentinel", 0.0, "")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
    time.sleep(1.1)  # file mtime order = stream pickup order
    sentinel.coalesce(1).write.mode("append").parquet(session_dirs["src"])

    q = streaming_sessionize(
        spark,
        session_dirs["src"],
        session_dirs["ckpt"],
        session_dirs["out"],
        gap_seconds=GAP,
    )
    q.awaitTermination(300)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         round(r["value_sum"], 6))
        for r in spark.read.parquet(session_dirs["out"]).collect()
        if r["user_id"] != 999999999
    }
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         round(r["value_sum"], 6))
        for r in sessionize_batch(events, GAP).collect()
    }
    assert len(expected) > 10
    assert got == expected


def test_batch_sessionize_gap_semantics(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(minutes=10), 2.0),        # same session
        (1, t0 + dt.timedelta(minutes=70), 4.0),        # > 30min gap: new
        (2, t0, 8.0),                                   # other user
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    out = {
        (r["user_id"], r["n_events"], r["value_sum"])
        for r in sessionize_batch(df, GAP).collect()
    }
    assert out == {(1, 2, 3.0), (1, 1, 4.0), (2, 1, 8.0)}
