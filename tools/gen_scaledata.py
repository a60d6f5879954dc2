#!/usr/bin/env python
"""Seeded generator for LARGER testdata slices, used by the scale-stress
harness (tools/scale_stress.py) to measure how the heavy operator
families (dedup / clustering / ANN / spans / user-windows / graph)
scale beyond the driver-provided sf0.1 fixtures.

Default documents mimic the driver fixtures' measured distributions
(profiled in SCALE.md r6): 10-100 tokens uniformly from the same
31-word vocabulary across 20 sources / 5 langs, with ~0.3% planted
exact duplicates and ~0.5% planted near-duplicates (1-2 token edits);
embeddings are random unit float32 vectors in 64 dims (the fixtures'
near-dup pairs at cos >= 0.4 are the Gaussian tail of random unit
vectors — measured 0.046% of pairs, matching the 1/sqrt(dim) normal
approximation — so random vectors reproduce the same pair density).

--zipf switches documents to a heavy-tailed SYNTHETIC 50k-type
vocabulary with token probabilities ∝ 1/rank^1.07 (the classic Zipf
shape of natural text). The 31-word fixture vocabulary saturates the
3-gram shingle space around 50k docs (every shingle exceeds the df
cap), which voids the text-family scaling exponents — under Zipf the
shingle/df/posting distributions keep their natural long tails, so
n-gram jaccard / BM25 / collocation / span-removal stress numbers
measure the workload, not the cap.

--events[=HOT_FRAC] also writes an events slice (1M rows/SF, 15k
users/SF, ts spread over 2024); HOT_FRAC (default 0) routes that
fraction of all events to ONE user — the hot-user skew probe for the
Window.partitionBy(user_id) family (SCD2, attribution, sessionize),
whose per-user partitions AQE cannot split.

--lineitem also writes a lineitem slice (600k lines/SF; orders of 4-8
lines; parts drawn Zipf over a pool of n_lines/50 so co-purchase
support ≥ 2 edges are plentiful) — the denser edge slice for the
graph family (LPA / triangles / assoc rules).

Usage: python tools/gen_scaledata.py SF OUTDIR [--zipf]
           [--events[=HOT_FRAC]] [--lineitem] [--skip-embeddings]
Writes OUTDIR/{documents,embeddings[,events][,lineitem]}.parquet.
Deterministic for a given SF + flags (seed fixed).
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
EVENTS_PER_SF = 1_000_000  # sf0.1 fixture has 100 000 events
USERS_PER_SF = 15_000      # sf0.1 fixture has 1 500 users
LINES_PER_SF = 6_000_000   # sf0.1 fixture has 600 000 lineitem rows
EMB_DIM = 64

ZIPF_TYPES = 50_000
ZIPF_S = 1.07  # exponent; ~natural-text shape


def _zipf_vocab_and_probs() -> tuple[list[str], np.ndarray]:
    ranks = np.arange(1, ZIPF_TYPES + 1, dtype=np.float64)
    p = ranks ** (-ZIPF_S)
    p /= p.sum()
    # word strings carry their rank (stable across runs); lengths vary
    # 2-10 chars like natural tokens so char-level ops see realism too
    vocab = [f"w{r}" for r in range(1, ZIPF_TYPES + 1)]
    return vocab, p


def gen_documents(sf: float, rng: np.random.Generator, zipf: bool = False) -> pa.Table:
    n = int(DOCS_PER_SF * sf)
    lengths = rng.integers(10, 101, size=n)
    if zipf:
        vocab, probs = _zipf_vocab_and_probs()
        # one bulk draw for all token slots (rng.choice with p is
        # vectorized); docs then slice it — orders faster than per-doc
        flat = rng.choice(len(vocab), size=int(lengths.sum()), p=probs)
    else:
        vocab, flat = VOCAB, rng.integers(0, len(VOCAB), size=int(lengths.sum()))
    offs = np.concatenate([[0], np.cumsum(lengths)])
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.003:            # exact duplicate of a prior doc
            texts.append(texts[rng.integers(0, i)])
        elif i > 10 and r < 0.008:          # near-duplicate: 1-2 token edits
            base = texts[rng.integers(0, i)].split()
            for _ in range(int(rng.integers(1, 3))):
                base[rng.integers(0, len(base))] = vocab[
                    rng.integers(0, len(vocab))
                ]
            texts.append(" ".join(base))
        else:
            toks = flat[offs[i] : offs[i + 1]]
            texts.append(" ".join(vocab[t] for t in toks))
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


EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def gen_events(sf: float, rng: np.random.Generator, hot_frac: float = 0.0) -> pa.Table:
    n = int(EVENTS_PER_SF * sf)
    n_users = max(int(USERS_PER_SF * sf), 10)
    users = rng.integers(0, n_users, size=n)
    if hot_frac > 0:
        hot = rng.random(n) < hot_frac
        users[hot] = 0  # ONE user takes hot_frac of the whole stream
    # timestamps: sorted micros over calendar 2024 (event_id follows ts
    # like the fixture, so (ts, event_id) window orders are realistic)
    year_us = 366 * 24 * 3600 * 1_000_000
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = np.sort(rng.integers(0, year_us, size=n)) + t0
    types = rng.integers(0, len(EVENT_TYPES), size=n)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array([EVENT_TYPES[t] for t in types]),
            "value": pa.array(
                np.floor(rng.random(n) * 20000) / 100.0, pa.float64()
            ),
            "props": pa.array(
                [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=n)]
            ),
        }
    )


def gen_lineitem(sf: float, rng: np.random.Generator) -> pa.Table:
    n = int(LINES_PER_SF * sf)
    n_parts = max(n // 50, 100)
    # Zipf part popularity → co-purchase pairs that clear the support
    # gate (uniform draws almost never repeat a pair at this density)
    ranks = np.arange(1, n_parts + 1, dtype=np.float64)
    p = ranks ** (-1.05)
    p /= p.sum()
    parts = rng.choice(n_parts, size=n, p=p).astype(np.int64)
    # orders of 4-8 lines
    order_sizes = rng.integers(4, 9, size=n // 4 + 2)
    orderkeys = np.repeat(np.arange(order_sizes.size), order_sizes)[:n].astype(
        np.int64
    )
    day_us = 24 * 3600 * 1_000_000
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ship = t0 + (rng.integers(0, 366, size=n) * day_us)
    qty = rng.integers(1, 51, size=n).astype(np.float64)
    return pa.table(
        {
            "l_orderkey": pa.array(orderkeys, pa.int64()),
            "l_partkey": pa.array(parts, pa.int64()),
            "l_suppkey": pa.array(parts % 997, pa.int64()),
            "l_linenumber": pa.array(
                (np.arange(n) % 7 + 1).astype(np.int32), pa.int32()
            ),
            "l_quantity": pa.array(qty, pa.float64()),
            "l_extendedprice": pa.array(
                np.floor(qty * 10150) / 100.0, pa.float64()
            ),
            "l_discount": pa.array(
                (rng.integers(0, 11, size=n) / 100.0), pa.float64()
            ),
            "l_tax": pa.array(
                (rng.integers(0, 9, size=n) / 100.0), pa.float64()
            ),
            "l_returnflag": pa.array(
                [("A", "N", "R")[i % 3] for i in range(n)]
            ),
            "l_linestatus": pa.array([("O", "F")[i % 2] for i in range(n)]),
            "l_shipdate": pa.array(ship, pa.timestamp("us")),
        }
    )


def main() -> None:
    sf = float(sys.argv[1])
    out = Path(sys.argv[2])
    flags = sys.argv[3:]
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(4242)
    zipf = "--zipf" in flags
    pq.write_table(gen_documents(sf, rng, zipf=zipf), out / "documents.parquet")
    if "--skip-embeddings" not in flags:
        pq.write_table(gen_embeddings(sf, rng), out / "embeddings.parquet")
    for f in flags:
        if f.startswith("--events"):
            hot = float(f.split("=", 1)[1]) if "=" in f else 0.0
            pq.write_table(gen_events(sf, rng, hot_frac=hot), out / "events.parquet")
    if "--lineitem" in flags:
        pq.write_table(gen_lineitem(sf, rng), out / "lineitem.parquet")
    print(f"wrote sf={sf} slices to {out} (zipf={zipf}, flags={flags})")


if __name__ == "__main__":
    main()
