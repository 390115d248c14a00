"""Word n-gram array builders — the shared JVM grammar, in the
lambda-safe formulation.

The round-7 lesson: an outer-scope array referenced INSIDE a
higher-order-function lambda body is re-evaluated per array element
(Spark binds the captured expression, not its value), so the original

    transform(sequence(0, size(toks) - n),
              i -> concat_ws(' ', slice(toks, i + 1, n)))

re-ran ``split(text, ' ')`` once per emitted gram — quadratic in
document length.  Measured on the sf1.0 corpus explode (noop sink,
warm JVM, local[32]): 13.4 s -> 2.0 s for bigrams, 11.6 s -> 4.2 s for
8-grams.  The fix keeps every token-array reference OUTSIDE lambda
bodies: n shifted ``slice``s (each evaluated once per row) are zipped
with ``arrays_zip`` and one ``transform`` concatenates the struct
fields.  Output is byte-identical to the old build (fuzz-verified over
the corpus for n in {2, 3, 8}); 1-grams are the token array itself.

Both a SQL-text builder (for ``selectExpr`` call sites) and a Column
builder (``functions.webtext._word_grams`` wraps it) live here so the
grammar stays single-sourced.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def gram_array_sql(toks_sql: str, n: int) -> str:
    """SQL text of the word ``n``-gram array over a token-array
    expression (itself SQL text, e.g. ``"split(text, ' ')"``).  Empty
    array when the document has fewer than ``n`` tokens."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        return toks_sql
    # greatest(..., 0) keeps the slice length total even if a branch is
    # evaluated for a short document (slice errors on negative length)
    ln = f"greatest(size({toks_sql}) - {n - 1}, 0)"
    slices = ", ".join(f"slice({toks_sql}, {k + 1}, {ln})" for k in range(n))
    fields = ", ".join(f"s.`{k}`" for k in range(n))
    return (
        f"CASE WHEN size({toks_sql}) >= {n} "
        f"THEN transform(arrays_zip({slices}), s -> concat_ws(' ', {fields})) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def gram_array_col(text_col, n: int) -> "F.Column":
    """Column form: word ``n``-grams of a text Column under the
    repo-wide split-on-space grammar."""
    toks = F.split(text_col, " ")
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        return toks
    ln = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(toks, k + 1, ln).alias(str(k)) for k in range(n)]
    )
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
