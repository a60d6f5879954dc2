"""Adversarial mini-corpus, cross-engine: empty / whitespace-only docs,
BPE prefix traps, adjacent-repeat merges, and boilerplate spans — the
document shapes the synthetic fixtures never contain but a 100 TB crawl
guarantees. Each regression here crashed or silently diverged before the
round-7 fixes:

- ``curation_dsir_weights`` threw INVALID_PARAMETER_VALUE.LENGTH on an
  empty token array (slice length -1);
- ``dedup_simhash`` gave token-less docs simhash=0 and reported all-empty
  pairs as hamming-0 near-dups, while the oracle dropped those docs;
- ``vocab_bpe_apply``'s merge pattern had no trailing token boundary, so
  merge (x, a) also fired on token "agg" after an "x" (over-merging);
  the fix must NOT break adjacent repeats ([x,a,x,a] → two merges);
- ``dedup_span_removal``'s kept-position guard (sequence(1, 0) is a
  DESCENDING [1, 0] in Spark) on zero-token docs.

Both engines run the real registered query + oracle on the same parquet,
compared with the same multiset protocol as test_oracle_parity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.test_oracle_parity import _multiset

# Corpus design (see pair-count math in each test):
# - docs 1, 2: empty and whitespace-only (token-less)
# - docs 3-12: "x a" ×10            → learned merge #1 (count 12 w/ doc 81)
# - docs 13-21: "p1 q1" ×9 (src0 = a DSIR target source)
# - docs 22-75: "p2 q2" .. "p7 q7" ×9 each  → merges #2-#8
# - doc 80: "x agg"  — the prefix trap: (x, agg) appears once, far below
#   the top-8 cut, so NO learned merge may fire on it
# - doc 81: "x a x a" — adjacent repeats of merge #1
# - docs 90, 91: share the 8-token span "s1 .. s8" (doc 90 holds the
#   global-first occurrence; doc 91 loses 8 tokens)
_DOCS = (
    [(1, "", "bulk"), (2, "   ", "bulk")]
    + [(2 + i, "x a", "bulk") for i in range(1, 11)]
    + [(12 + i, "p1 q1", "src0") for i in range(1, 10)]
    + [
        (12 + 9 * (p - 1) + i, f"p{p} q{p}", f"f{p}")
        for p in range(2, 8)
        for i in range(1, 10)
    ]
    + [
        (80, "x agg", "trap"),
        (81, "x a x a", "rep"),
        (90, "s1 s2 s3 s4 s5 s6 s7 s8 taila", "span"),
        (91, "pre s1 s2 s3 s4 s5 s6 s7 s8", "span"),
    ]
)


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edgecorpus")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in _DOCS], pa.int64()),
            "text": pa.array([r[1] for r in _DOCS], pa.string()),
            "lang": pa.array(["en"] * len(_DOCS), pa.string()),
            "source": pa.array([r[2] for r in _DOCS], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in _DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{edge_dir}/documents.parquet')"
    )
    return con


_EDGE_QUERIES = [
    "curation_dsir_weights",
    "dedup_simhash",
    "vocab_bpe_apply",
    "dedup_span_removal",
    # r7 additions — empty/whitespace docs must drop identically from
    # both engines; single-token sources must drop from the slope fit
    "text_char_entropy",
    "text_zipf_slope",
    # r8 additions — the corpus has ~27 distinct tokens > JSD_TOP_VOCAB,
    # so the '<other>' bucket is live here too; the repeated "x a" docs
    # and the whitespace-only doc (normalizing to the empty string)
    # exercise phash grouping on degenerate payloads
    "text_js_divergence",
    "multimodal_phash_dedup",
    # r10 additions — the empty/whitespace-only docs land in 'und' with
    # real token mass elsewhere (the NULLIF guards' mixed regime), the
    # tiny vocabulary keeps every COVERAGE_KS tier live, and the PPM
    # round-trip runs its corrupt-every-50th rule over adversarial ids
    "text_fertility_by_lang",
    "text_vocab_coverage",
    "multimodal_ppm_decode",
    # r11 additions — the empty doc pins the decode stub's NULL-moments
    # agreement (ADVICE: Python 0.0 vs SQL NULL latent divergence, now
    # fixed to NULL on both sides); the real resize kernel runs its
    # NN map + corrupt-every-50th rule over the adversarial ids
    "multimodal_decode_stub",
    "multimodal_resize_stub",
    "multimodal_ppm_resize",
]


def _run_both(spark, duck, sf_dir, name):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(e.oracle_sql()[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    return spark_cols, spark_rows, duck_cols, duck_rows


def test_phash_vertical_tab_cross_engine(spark, tmp_path):
    """Java regex \\s includes vertical tab (\\x0B); RE2's does not.
    multimodal_phash_dedup spells the whitespace class out explicitly,
    so a payload containing \\x0B must (a) hash identically in both
    engines and (b) collide with its space-separated twin — this corpus
    has three \\x0B-bearing variants of one doc plus a control."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as e

    docs = [
        (1, "hello world", "a"),
        (2, "hello\x0bworld", "a"),
        (3, "hello \x0b world", "a"),
        (4, "\x0bhello world\x0b", "a"),
        (5, "different text", "b"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in docs], pa.int64()),
            "text": pa.array([r[1] for r in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array([r[2] for r in docs], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    sdf = e.queries()["multimodal_phash_dedup"](spark, str(tmp_path))
    spark_rows = sorted(tuple(r) for r in sdf.collect())
    duck_rows = sorted(
        tuple(r) for r in con.execute(e.oracle_sql()["multimodal_phash_dedup"]).fetchall()
    )
    assert spark_rows == duck_rows
    # docs 1-4 normalize to 'hello world' in BOTH engines → one group
    # of 4 keeping media_id 1, plus the control singleton
    by_keep = {r[2]: r[1] for r in spark_rows}
    assert by_keep == {1: 4, 5: 1}, spark_rows


@pytest.mark.parametrize("name", _EDGE_QUERIES)
def test_edge_corpus_matches_oracle(spark, edge_duck, edge_dir, name):
    spark_cols, spark_rows, duck_cols, duck_rows = _run_both(
        spark, edge_duck, edge_dir, name
    )
    assert sorted(spark_cols) == sorted(duck_cols), name
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    assert _multiset(spark_rows, s_order) == _multiset(duck_rows, d_order), name


def test_simhash_excludes_tokenless_docs(spark, edge_dir):
    import __spark_entry__ as e

    pairs = e.queries()["dedup_simhash"](spark, edge_dir)
    assert pairs.count() > 0  # non-vacuous: the x-a clones do collide
    touching_empty = pairs.filter(
        F.col("doc1").isin(1, 2) | F.col("doc2").isin(1, 2)
    )
    assert touching_empty.count() == 0


def test_bpe_apply_boundary_and_repeats(spark, edge_dir):
    import __spark_entry__ as e

    rows = {
        r["source"]: r
        for r in e.queries()["vocab_bpe_apply"](spark, edge_dir).collect()
    }
    # prefix trap: (x, agg) is not a learned merge, and learned merge
    # (x, a) must NOT fire on "x agg" — before the boundary fix it did
    assert rows["trap"]["tokens_before"] == 2
    assert rows["trap"]["tokens_after"] == 2
    # adjacent repeats still merge twice: [x,a,x,a] → [x_a, x_a]
    assert rows["rep"]["tokens_before"] == 4
    assert rows["rep"]["tokens_after"] == 2
    # empty docs count 0 tokens, not a phantom newline token
    assert rows["bulk"]["n_docs"] == 12
    assert rows["bulk"]["tokens_before"] == 20
    assert rows["bulk"]["tokens_after"] == 10


def test_dsir_skips_tokenless_docs(spark, edge_dir):
    import __spark_entry__ as e

    out = e.queries()["curation_dsir_weights"](spark, edge_dir)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 1 not in ids and 2 not in ids
    assert len(ids) == len(_DOCS) - 2


def test_span_removal_handles_empty_docs(spark, edge_dir):
    import __spark_entry__ as e

    out = {
        r["doc_id"]: r
        for r in e.queries()["dedup_span_removal"](spark, edge_dir).collect()
    }
    assert out[1]["n_tokens"] == 0 and out[1]["cleaned_text"] == ""
    assert out[2]["n_tokens"] == 0 and out[2]["cleaned_text"] == ""
    # doc 91 loses exactly the 8 shared-span tokens; doc 90 keeps the
    # global-first occurrence
    assert out[91]["n_removed"] == 8 and out[91]["cleaned_text"] == "pre"
    assert out[90]["n_removed"] == 0
