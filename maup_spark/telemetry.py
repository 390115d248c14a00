"""Skew telemetry: the per-key top-N histogram behind ``hot_cells``
(operators/spatial.py) as a reusable report for ANY keyed stage.

Every hot-key incident this engine has hit (the 2.37M-row minhash band
bucket, corpus-wide boilerplate grams, dense spatial cells) shows up
first as a key histogram whose max dwarfs its mean.  ``skew_report``
surfaces exactly that, driver-side cost O(top_n):

- one hash-agg over the keyed table (map-side combinable),
- one scalar agg for (n_keys, mean, max),
- a TakeOrderedAndProject for the top-N keys (never a global sort).

Used by scripts/bench_scale.py's forced-hot-key stages; BENCH.md records
the before/after spread for the substring_dedup and overlay runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key: str, top_n: int = 5) -> dict:
    """Histogram the rows of ``df`` per ``key`` and return
    ``{n_keys, n_rows, mean, max, skew_ratio, top}`` where ``top`` is
    the ``top_n`` heaviest ``(key, count)`` pairs and ``skew_ratio`` is
    max/mean (1.0 = perfectly even; >~32 means one task would carry a
    partition-sized key in any key-partitioned shuffle/window)."""
    counts = df.groupBy(key).agg(F.count("*").alias("__n")).persist()
    try:
        row = counts.agg(
            F.count("*").alias("n_keys"),
            F.sum("__n").alias("n_rows"),
            F.avg("__n").alias("mean"),
            F.max("__n").alias("max"),
        ).collect()[0]
        top = counts.orderBy(F.desc("__n"), key).limit(top_n).collect()
    finally:
        counts.unpersist()
    n_keys = int(row["n_keys"] or 0)
    mean = float(row["mean"] or 0.0)
    mx = int(row["max"] or 0)
    return {
        "n_keys": n_keys,
        "n_rows": int(row["n_rows"] or 0),
        "mean": mean,
        "max": mx,
        "skew_ratio": (mx / mean) if mean else 0.0,
        "top": [(r[key], int(r["__n"])) for r in top],
    }
