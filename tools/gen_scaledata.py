#!/usr/bin/env python
"""Seeded generator for LARGER documents/embeddings slices, used by the
scale-stress harness (tools/scale_stress.py) to measure how the heavy
operator families (dedup / clustering / ANN / spans) scale beyond the
driver-provided sf0.1 fixtures.

Mimics the driver fixtures' measured distributions (profiled in
SCALE.md r6): documents draw 10-100 tokens uniformly from the same
31-word vocabulary across 20 sources / 5 langs, with ~0.3% planted
exact duplicates and ~0.5% planted near-duplicates (1-2 token edits);
embeddings are random unit float32 vectors in 64 dims (the fixtures'
near-dup pairs at cos >= 0.4 are the Gaussian tail of random unit
vectors — measured 0.046% of pairs, matching the 1/sqrt(dim) normal
approximation — so random vectors reproduce the same pair density).

Usage: python tools/gen_scaledata.py SF OUTDIR   (e.g. 1 /tmp/scaledata/sf1)
Writes OUTDIR/documents.parquet and OUTDIR/embeddings.parquet.
Deterministic for a given SF (seed fixed).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
DOCS_PER_SF = 50_000     # sf0.1 fixture has 5 000 docs
VECS_PER_SF = 20_000     # sf0.1 fixture has 2 000 vectors
EMB_DIM = 64


def gen_documents(sf: float, rng: np.random.Generator) -> pa.Table:
    n = int(DOCS_PER_SF * sf)
    lengths = rng.integers(10, 101, size=n)
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.003:            # exact duplicate of a prior doc
            texts.append(texts[rng.integers(0, i)])
        elif i > 10 and r < 0.008:          # near-duplicate: 1-2 token edits
            base = texts[rng.integers(0, i)].split()
            for _ in range(int(rng.integers(1, 3))):
                base[rng.integers(0, len(base))] = VOCAB[rng.integers(0, len(VOCAB))]
            texts.append(" ".join(base))
        else:
            toks = rng.integers(0, len(VOCAB), size=lengths[i])
            texts.append(" ".join(VOCAB[t] for t in toks))
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([f"l{i % 5}" for i in range(n)]),
            "source": pa.array([f"src{i % 20}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(sf: float, rng: np.random.Generator) -> pa.Table:
    m = int(VECS_PER_SF * sf)
    x = rng.standard_normal((m, EMB_DIM)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(m), pa.int64()),
            "embedding": pa.array(list(x), pa.list_(pa.float32())),
            "label": pa.array((np.arange(m) % 10).astype(np.int32), pa.int32()),
        }
    )


def main() -> None:
    sf = float(sys.argv[1])
    out = Path(sys.argv[2])
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(4242)
    pq.write_table(gen_documents(sf, rng), out / "documents.parquet")
    pq.write_table(gen_embeddings(sf, rng), out / "embeddings.parquet")
    print(f"wrote sf={sf} docs+embeddings to {out}")


if __name__ == "__main__":
    main()
