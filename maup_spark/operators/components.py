"""Distributed connected components over an edge table.

Used to partition repair work: ``smart_repair(regions=None)`` groups the
layer by connected cluster of the touches/overlaps graph instead of
serializing everything into one task (the reference concedes repair is
sequential *within* a component, /root/reference/maup/smart_repair.py:751-969;
across components it is embarrassingly parallel).

Algorithm: min-label propagation with pointer jumping — each round every
node takes the minimum label in its closed neighborhood, then chases one
level of indirection (label <- label[label]).  Jumping makes convergence
O(log n) rounds on paths/trees instead of O(diameter); each round is two
hash-shuffles on the (node, comp) table, and the loop materializes per
round via ``localCheckpoint`` so the plan does not grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """DataFrame[node, comp] — ``comp`` is the minimum node id reachable
    from ``node`` over the undirected ``edges``.

    ``nodes`` must contain every vertex (isolated vertices keep their own
    id as the component label).
    """
    lab = nodes.select(F.col(node_col).alias("node")).withColumn(
        "comp", F.col("node")
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    e = e.localCheckpoint(eager=False)

    # Convergence probe: labels are MONOTONE NON-INCREASING per node
    # (min over the closed neighborhood, then comp[comp] <= comp), so
    # the exact label sum strictly decreases iff any label changed.
    # One scalar aggregate per round replaces the former full
    # new-vs-old shuffle join + count — at 10^9 nodes that join was
    # the most expensive stage of every round and existed only for
    # convergence detection.  decimal(38,0) keeps the sum exact at any
    # node count (double would alias small changes; bigint overflows
    # at ~10^12 rows x 10^13 ids).
    def _label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = None
    for _ in range(max_iter):
        nb = (
            e.join(lab.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.min("comp").alias("__nb"))
            .withColumnRenamed("dst", "node")
        )
        new = lab.join(nb, "node", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce("__nb", F.col("comp"))).alias("comp"),
        )
        # pointer jump: comp <- comp[comp]
        jump = new.select(
            F.col("node").alias("comp"), F.col("comp").alias("__jc")
        )
        new = (
            new.join(jump, "comp", "left")
            .select("node", F.coalesce("__jc", "comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        cur_sum = _label_sum(new)
        lab = new
        # cur_sum is None iff the label table has ZERO rows (sum over
        # empty = NULL): an empty graph is trivially converged — without
        # this, None == None never satisfies the not-None guard and an
        # empty input burns all max_iter rounds before failing
        if cur_sum is None or (prev_sum is not None and cur_sum == prev_sum):
            break
        prev_sum = cur_sum
    else:
        # unconverged labels would silently split one component across two
        # group keys downstream (per-component repair would then leave
        # cross-group overlaps unresolved) — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations (label sum still decreasing); raise max_iter"
        )
    return lab
