"""Corpus-frequency unigram language-model filter (the CCNet/RefinedWeb
"perplexity bucket" stage, rebuilt cross-engine-exact).

CCNet scores documents with a KenLM 5-gram model and keeps the
head/middle of the perplexity distribution.  The distributed shape of
that stage is (a) train: one pass over the corpus building a bounded
token-frequency table, (b) score: stream every document against the
broadcast table and aggregate a per-document statistic.  This module
keeps that shape but replaces the float log-probability with an
INTEGER-exact familiarity score — ``floor(log2(corpus_count))`` per
token — so the result is bit-identical across engines and partition
orders (float log-prob sums are summation-order-dependent; the round-1
lesson behind every scaled-BIGINT output in this repo):

    fam(token)   = floor(log2 cnt(token))       (0 for OOV)
    fam_sum(doc) = sum over tokens of fam(token)        -- exact BIGINT
    fam_mean_e6  = round(1e6 * fam_sum / n_tokens)      -- one division

``floor(log2 n)`` is ``length(bin(n)) - 1`` — Spark's ``bin`` and
DuckDB's ``bin`` both emit the minimal binary string, so the oracle
mirrors it exactly with no transcendental functions anywhere.  The
monotone map cnt -> floor(log2 cnt) preserves the head/middle/tail
ordering CCNet buckets on; only the (irrelevant) absolute scale
differs from a true log-prob.

Scale design (10^12 docs):
- ``lm_train``: explode -> ONE map-side-combinable hash aggregation
  (a corpus-wide stopword is absorbed by partial combine — never a
  per-key window) -> distributed top-``max_vocab`` via
  ``orderBy().limit()`` (TakeOrderedAndProject: per-partition top-K +
  driver merge, no single-partition sort — the bpe_train_merges
  round-4 lesson baked in from day one here).
- ``lm_score``: explode -> BROADCAST hash join against the bounded
  vocabulary (64k rows vs 10^12 docs — never a shuffle join) -> one
  map-side-combinable per-doc aggregation.  Zero windows, zero Python.

No reference counterpart (maup is geometry-only,
/root/reference/maup/__init__.py:28-45); this is part of the
training-data-pipeline surface the web-scale graft requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fam_mean_e6 thresholds for the CCNet-style head/middle/tail split.
# Fixed constants (not corpus quantiles) so the bucketing is
# deterministic and cross-engine exact; tune per corpus if needed.
HEAD_E6 = 4_000_000
TAIL_E6 = 2_000_000


def _tokens(docs: DataFrame, text_col: str, *extra) -> DataFrame:
    """One row per non-empty whitespace token (matches the repo-wide
    `split on ' '` grammar; empty tokens from runs of spaces dropped)."""
    return docs.select(
        *extra, F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")


def lm_train(
    docs: DataFrame, text_col: str = "text", max_vocab: int = 65536
) -> DataFrame:
    """DataFrame[w, cnt, fam] — the ``max_vocab`` most frequent tokens
    (ties broken by token string, fully deterministic) with corpus
    count and integer familiarity ``fam = floor(log2 cnt)``.

    ONE explode + hash-agg + TakeOrderedAndProject; output is bounded
    by construction (broadcastable downstream)."""
    wf = (
        _tokens(docs, text_col)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "w")
        .limit(max_vocab)
    )
    return wf.withColumn(
        "fam", (F.length(F.bin(F.col("cnt"))) - 1).cast("long")
    )


def lm_score(
    docs: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document familiarity under a trained ``lm_train`` table:
    DataFrame[id_col, n_tokens, n_oov, fam_sum, fam_mean_e6, bucket].

    ``bucket`` is the CCNet-style split: 'head' (fam_mean_e6 >=
    HEAD_E6), 'tail' (< TAIL_E6), else 'middle' — high-familiarity
    docs are common-token-heavy, tail docs are OOV/rare-token-heavy
    (boilerplate-junk or non-target-language at web scale).

    Documents with zero non-empty tokens produce no row (nothing to
    score).  Broadcast join + one aggregation; all integer until the
    single final division, so bit-identical at any parallelism."""
    tok = _tokens(docs, text_col, id_col)
    j = tok.join(F.broadcast(lm.select("w", "fam")), "w", "left")
    agg = j.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.col("fam").isNull().cast("long")).alias("n_oov"),
        F.sum(F.coalesce(F.col("fam"), F.lit(0))).alias("fam_sum"),
    )
    mean_e6 = F.round(
        F.lit(1e6) * F.col("fam_sum") / F.col("n_tokens")
    ).cast("long")
    return agg.select(
        id_col,
        "n_tokens",
        "n_oov",
        "fam_sum",
        mean_e6.alias("fam_mean_e6"),
        F.when(mean_e6 >= HEAD_E6, F.lit("head"))
        .when(mean_e6 < TAIL_E6, F.lit("tail"))
        .otherwise(F.lit("middle"))
        .alias("bucket"),
    )


def lm2_train(
    docs: DataFrame,
    text_col: str = "text",
    max_vocab: int = 65536,
) -> DataFrame:
    """DataFrame[g, cnt, fam] — the ``max_vocab`` most frequent word
    BIGRAMS (ties broken by gram string) with integer familiarity
    ``fam = floor(log2 cnt)`` — the bigram upgrade of ``lm_train``
    (closer to CCNet's KenLM n-gram model than unigram familiarity;
    a fluent common phrase scores above two common words in random
    order).

    Shape identical to ``lm_train``: one explode over the per-row
    bigram array (no window — bigrams come from the JVM HOF grammar
    shared with contamination/DSIR) + map-side-combinable hash-agg +
    distributed top-K (TakeOrderedAndProject)."""
    from .webtext import _word_grams

    gf = (
        docs.select(
            F.explode(_word_grams(F.col(text_col), 2)).alias("g")
        )
        .groupBy("g")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "g")
        .limit(max_vocab)
    )
    return gf.withColumn(
        "fam", (F.length(F.bin(F.col("cnt"))) - 1).cast("long")
    )


def lm2_score(
    docs: DataFrame,
    lm2: DataFrame,
    lm1: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram familiarity with unigram BACKOFF:
    DataFrame[id_col, n_bigrams, n_hits2, fam_sum, fam_mean_e6].

    Every bigram position contributes ``fam2(w1 w2)`` when the bigram
    is in the ``lm2_train`` table, else ``max(fam1(w2) - 1, 0)`` (the
    Katz-shaped integer backoff: an unseen transition into a common
    word scores one notch under the word's own familiarity; OOV -> 0).
    All integer until the single final division — bit-identical at any
    parallelism, DuckDB-mirrorable token for token.

    Shape: explode the per-row bigram array -> BROADCAST bigram-vocab
    join + BROADCAST unigram-vocab join on the bigram's second word
    (``substring_index(g, ' ', -1)`` — pure codegen, no re-explode) ->
    one per-doc map-side-combinable aggregation.  Zero windows, zero
    Python.  Documents with fewer than 2 tokens emit no row (no
    transitions to score)."""
    from .webtext import _word_grams

    g = docs.select(
        F.col(id_col), F.explode(_word_grams(F.col(text_col), 2)).alias("g")
    )
    j = (
        g.join(
            F.broadcast(lm2.select(F.col("g"), F.col("fam").alias("__f2"))),
            "g",
            "left",
        )
        .withColumn("__w2", F.substring_index(F.col("g"), " ", -1))
        .join(
            F.broadcast(
                lm1.select(F.col("w").alias("__w2"), F.col("fam").alias("__f1"))
            ),
            "__w2",
            "left",
        )
    )
    contrib = F.coalesce(
        F.col("__f2"),
        F.greatest(F.coalesce(F.col("__f1"), F.lit(0)) - 1, F.lit(0)),
    )
    agg = j.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum(F.col("__f2").isNotNull().cast("long")).alias("n_hits2"),
        F.sum(contrib).alias("fam_sum"),
    )
    return agg.select(
        id_col,
        "n_bigrams",
        "n_hits2",
        "fam_sum",
        F.round(F.lit(1e6) * F.col("fam_sum") / F.col("n_bigrams"))
        .cast("long")
        .alias("fam_mean_e6"),
    )
