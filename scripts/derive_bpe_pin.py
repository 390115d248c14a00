#!/usr/bin/env python
"""Independent (Spark-free) BPE trainer over the fixed 100-doc slice of
documents at sf0.01 — derives the pinned merge list that the
``bpe_trained`` driver query's oracle replays.  Deliberately a separate
implementation (collections.Counter over a duckdb scan) so the pin is
not produced by the code under test; tests/test_bpe.py asserts the
Spark trainer reproduces it exactly.

Usage: python scripts/derive_bpe_pin.py [sf_dir] [slice_n] [n_merges]
"""
import sys
from collections import Counter

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
slice_n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
n_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 24

rows = duckdb.sql(
    f"SELECT text FROM read_parquet('{sf}/documents.parquet') WHERE doc_id < {slice_n}"
).fetchall()
freq = Counter()
for (text,) in rows:
    for w in text.split(" "):
        if w:
            freq[tuple(w)] += 1

merges = []
vocab = dict(freq)
for _ in range(n_merges):
    pc = Counter()
    for syms, f in vocab.items():
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] += f
    if not pc:
        break
    top = max(pc.values())
    if top < 2:
        break
    best = min(p for p, c in pc.items() if c == top)
    merges.append(best)
    ab = best[0] + best[1]
    nv = {}
    for syms, f in vocab.items():
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                out.append(ab)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        nv[tuple(out)] = nv.get(tuple(out), 0) + f
    vocab = nv

print(repr(merges))
