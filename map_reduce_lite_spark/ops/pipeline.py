"""End-to-end training-data curation pipeline — the composition the
individual operators exist FOR.

A pretraining ingest runs, in order: quality filtering → language
filtering → near-duplicate removal, then reports the survival funnel
per source. This module chains the engine's own operators (quality
features from ops/text.py semantics, stopword language ID, n-gram
Jaccard near-dup pairs from ops/dedup.py with its document-frequency
cap) into ONE DataFrame plan, proving the pieces compose without
materialization barriers.

Scale shape: stage 1+2 are a single codegen'd scan projection (no
shuffle); stage 3 shuffles only the SURVIVORS' shingles (filter first,
dedup second — at 100 TB the quality+lang gate typically drops half the
corpus before the expensive stage); the funnel aggregation is one
map-side-combined groupBy over per-doc flags. No collect, no Python.

The reference has nothing like this (it is the driver-mandated
extension surface), but the shape mirrors how its users would chain
jobs: workload_test.sh:24-29 pipes matrix-multiply phase 1 output into
phase 2 — here the chaining is one Catalyst plan instead of two jobs
over S3 files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from map_reduce_lite_spark.ops.dedup import SHINGLE_DF_CAP, ngram_jaccard_pairs
from map_reduce_lite_spark.ops.text import STOPWORDS, _sql_stopword_hits, _stopword_hits
from map_reduce_lite_spark.registry import Query
from map_reduce_lite_spark.relational.tables import load_table

# Stage-1 quality gate: enough tokens to be trainable text, mean token
# length in the plausible-natural-language band (garbage/binary text
# skews long). Exact-integer division → bit-identical across engines.
MIN_TOKENS = 20
MAX_MEAN_TOKEN_LEN = 8.0

# Stage-3 near-dup gate (matches ops/dedup.py defaults)
PIPELINE_JACCARD = 0.5


def quality_lang_flags(d: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Stage 1+2 of the curation pipeline as one codegen'd projection:
    (doc_id, source, text, n_tokens, q_ok, l_ok) — q_ok is the
    token-count / mean-token-length gate, l_ok additionally requires the
    stopword-argmax language to be 'en' (ties break in STOPWORDS order,
    no hits → 'und'). No shuffle; reused by pretrain_curation and
    pipeline_incremental_refresh. ``carry`` names extra input columns
    to pass through unchanged — consumers that used to re-join their
    own upstream just to re-attach a column they already had (doubling
    the upstream subtree: a DataFrame consumed twice is planned twice)
    carry it through instead."""
    n_chars = F.length("text").cast("long")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    mean_tok_len = (n_chars - n_tokens + 1) / n_tokens
    hits = {lang: _stopword_hits(F.col("text"), ws) for lang, ws in STOPWORDS.items()}
    flagged = d.select(
        "doc_id",
        "source",
        "text",
        *carry,
        n_tokens.alias("n_tokens"),
        ((n_tokens >= MIN_TOKENS) & (mean_tok_len <= MAX_MEAN_TOKEN_LEN)).alias("q_ok"),
        *[h.alias(f"hits_{l}") for l, h in hits.items()],
    )
    best = F.greatest(*[F.col(f"hits_{l}") for l in STOPWORDS])
    pred = F.when(best == 0, F.lit("und"))
    for l in STOPWORDS:
        pred = pred.when(F.col(f"hits_{l}") == best, F.lit(l))
    return flagged.withColumn("l_ok", F.col("q_ok") & (pred == "en")).drop(
        *[f"hits_{l}" for l in STOPWORDS]
    )


def pretrain_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source survival funnel of the 3-stage curation pipeline:
    (source, n_total, n_quality, n_lang, n_kept, kept_tokens).

    - n_quality: docs passing the token-count / mean-token-length gate.
    - n_lang:    of those, docs whose stopword-argmax language is 'en'
                 (ties break in STOPWORDS order, no hits → 'und').
    - n_kept:    of those, docs surviving near-dup removal — a doc is
                 dropped iff it is the HIGHER id of a surviving pair
                 with word-3-shingle Jaccard ≥ 0.5 (keep-lowest rule;
                 pair finding uses the DF-capped inverted index, so no
                 posting-list blowup at scale).
    - kept_tokens: whitespace tokens the surviving docs contribute.
    """
    d = load_table(spark, sf_dir, "documents")
    flagged = quality_lang_flags(d)

    survivors = flagged.filter("l_ok").select("doc_id", "source", "text", "n_tokens")
    pairs = ngram_jaccard_pairs(
        survivors, threshold=PIPELINE_JACCARD, df_cap=SHINGLE_DF_CAP
    )
    drops = pairs.select(F.col("doc2").alias("doc_id")).distinct()
    kept = survivors.join(drops, "doc_id", "left_anti")

    funnel = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("q_ok").cast("long")).alias("n_quality"),
        F.sum(F.col("l_ok").cast("long")).alias("n_lang"),
    )
    kept_stats = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").alias("kept_tokens"),
    )
    return funnel.join(kept_stats, "source", "left").select(
        "source",
        "n_total",
        "n_quality",
        "n_lang",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
    )


def _curation_sql() -> str:
    langs = list(STOPWORDS)
    hit_cols = ",\n         ".join(
        f"{_sql_stopword_hits('text', ws)} AS hits_{l}" for l, ws in STOPWORDS.items()
    )
    best = "greatest(" + ", ".join(f"hits_{l}" for l in langs) + ")"
    pred = (
        "CASE WHEN " + best + " = 0 THEN 'und' "
        + " ".join(f"WHEN hits_{l} = {best} THEN '{l}'" for l in langs)
        + " END"
    )
    return rf"""
WITH feats AS (
  SELECT doc_id, source, text,
         CAST(len(string_split_regex(trim(text, ' '), '\s+')) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars,
         {hit_cols}
  FROM documents
), flagged AS (
  SELECT doc_id, source, text, n_tokens,
         (n_tokens >= {MIN_TOKENS}
          AND (n_chars - n_tokens + 1) / n_tokens <= {MAX_MEAN_TOKEN_LEN}) AS q_ok,
         {pred} AS pred
  FROM feats
), cur AS (
  SELECT doc_id, source, text, n_tokens FROM flagged WHERE q_ok AND pred = 'en'
), tok_lists AS (
  SELECT doc_id AS doc, string_split_regex(trim(text, ' '), '\s+') AS toks FROM cur
), toks AS (
  SELECT doc, token, pos FROM (
    SELECT doc, unnest(toks) AS token,
           unnest(generate_series(1, len(toks))) AS pos
    FROM tok_lists
  ) WHERE token <> ''
), sh AS (
  SELECT DISTINCT doc,
         token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS shingle
  FROM toks
  WINDOW w AS (PARTITION BY doc ORDER BY pos)
  QUALIFY lead(token, 2) OVER w IS NOT NULL
), sizes AS (
  SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc
), capped AS (
  SELECT sh.doc, sh.shingle FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle
        HAVING COUNT(*) <= {SHINGLE_DF_CAP}) keep
    ON keep.shingle = sh.shingle
), inter AS (
  SELECT a.doc AS doc1, b.doc AS doc2, COUNT(*) AS n_inter
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY 1, 2
), pairs AS (
  SELECT doc1, doc2
  FROM inter
  JOIN sizes s1 ON s1.doc = doc1
  JOIN sizes s2 ON s2.doc = doc2
  WHERE n_inter / (s1.n_shingles + s2.n_shingles - n_inter) >= {PIPELINE_JACCARD}
), drops AS (
  SELECT DISTINCT doc2 AS doc_id FROM pairs
), kept AS (
  SELECT c.source, c.n_tokens FROM cur c
  LEFT JOIN drops dr ON dr.doc_id = c.doc_id
  WHERE dr.doc_id IS NULL
), funnel AS (
  SELECT source, COUNT(*) AS n_total,
         CAST(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         CAST(SUM(CASE WHEN q_ok AND pred = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lang
  FROM flagged GROUP BY source
), kept_stats AS (
  SELECT source, COUNT(*) AS n_kept, SUM(n_tokens) AS kept_tokens
  FROM kept GROUP BY source
)
SELECT f.source, f.n_total, f.n_quality, f.n_lang,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
FROM funnel f LEFT JOIN kept_stats k ON k.source = f.source
"""


PRETRAIN_CURATION_SQL = _curation_sql()


def pipeline_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus refresh: ONLY the snapshot delta re-enters the
    curation gates.

    At 100 TB a refresh never reprocesses the standing corpus — the
    snapshot diff (ops/snapshot.py) classifies keys, and just the
    added+changed documents flow through the quality/language gates,
    reported per (source, status): (n_delta, n_quality, n_lang,
    delta_tokens). Cost scales with the DELTA, not the corpus: the
    diff shuffles 16-byte hash rows, the gates are one codegen'd
    projection over delta text fetched by an id equi-join. The full
    production refresh additionally dedups the delta AGAINST the
    standing index (the minhash band signatures are mergeable, so the
    standing side is a precomputed signature table, not a re-scan) —
    the gate composition here is the oracle-checkable core of that
    loop."""
    from map_reduce_lite_spark.ops.snapshot import _derived_snapshots, snapshot_diff

    d = load_table(spark, sf_dir, "documents")
    prev, cur = _derived_snapshots(d)
    delta_keys = snapshot_diff(prev, cur).filter(
        F.col("status").isin("added", "changed")
    )
    delta = delta_keys.join(cur, "doc_id")  # text always from the CURRENT snapshot
    # status rides through the gate projection (carry) instead of a
    # re-join against delta_keys, whose second consumption re-planned —
    # and re-executed — the whole full-outer snapshot diff (5 document
    # scans; 3 with the carry).
    flagged = quality_lang_flags(delta, carry=("status",))
    return (
        flagged
        .groupBy("source", "status")
        .agg(
            F.count(F.lit(1)).alias("n_delta"),
            F.sum(F.col("q_ok").cast("long")).alias("n_quality"),
            F.sum(F.col("l_ok").cast("long")).alias("n_lang"),
            F.sum("n_tokens").alias("delta_tokens"),
        )
        .select(
            "source", "status", "n_delta", "n_quality", "n_lang", "delta_tokens"
        )
    )


def _incremental_refresh_sql() -> str:
    from map_reduce_lite_spark.registry import sql_md5_60bit

    langs = list(STOPWORDS)
    hit_cols = ",\n         ".join(
        f"{_sql_stopword_hits('text', ws)} AS hits_{l}" for l, ws in STOPWORDS.items()
    )
    best = "greatest(" + ", ".join(f"hits_{l}" for l in langs) + ")"
    pred = (
        "CASE WHEN " + best + " = 0 THEN 'und' "
        + " ".join(f"WHEN hits_{l} = {best} THEN '{l}'" for l in langs)
        + " END"
    )
    return rf"""
WITH prev AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 13 = 0 THEN text || ' [stale]' ELSE text END AS text
  FROM documents WHERE doc_id % 17 <> 3
), cur AS (
  SELECT doc_id, source, text FROM documents WHERE doc_id % 19 <> 7
), p AS (
  SELECT doc_id AS k, {sql_md5_60bit('text')} AS h_prev FROM prev
), c AS (
  SELECT doc_id AS k, {sql_md5_60bit('text')} AS h_cur FROM cur
), delta_keys AS (
  SELECT COALESCE(p.k, c.k) AS doc_id,
         CASE WHEN p.k IS NULL THEN 'added'
              WHEN c.k IS NULL THEN 'removed'
              WHEN p.h_prev <> c.h_cur THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM p FULL OUTER JOIN c ON p.k = c.k
), delta AS (
  SELECT cur.doc_id, cur.source, cur.text, dk.status
  FROM delta_keys dk JOIN cur ON cur.doc_id = dk.doc_id
  WHERE dk.status IN ('added', 'changed')
), feats AS (
  SELECT doc_id, source, status,
         CAST(len(string_split_regex(trim(text, ' '), '\s+')) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars,
         {hit_cols}
  FROM delta
), flagged AS (
  SELECT source, status, n_tokens,
         (n_tokens >= {MIN_TOKENS}
          AND (n_chars - n_tokens + 1) / n_tokens <= {MAX_MEAN_TOKEN_LEN}) AS q_ok,
         {pred} AS pred
  FROM feats
)
SELECT source, status, COUNT(*) AS n_delta,
       CAST(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(SUM(CASE WHEN q_ok AND pred = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lang,
       CAST(SUM(n_tokens) AS BIGINT) AS delta_tokens
FROM flagged GROUP BY source, status
"""


INCREMENTAL_REFRESH_SQL = _incremental_refresh_sql()


def pipeline_full_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE production refresh loop in one plan: snapshot diff →
    quality/language gates → incremental near-dup against the standing
    MinHash index → per-(source, status) survival report.

    Composes what the individual queries prove piecewise
    (snapshot_diff_documents, pipeline_incremental_refresh,
    dedup_incremental_minhash): only added+changed docs re-enter the
    pipeline; gates run BEFORE signatures so the expensive stage sees
    only gate-survivors (filter-first, the pretrain_curation lesson);
    the dedup stage band-joins delta signatures against the STANDING
    corpus's stored signature index — the standing corpus is never
    re-scanned, so refresh cost scales with the delta. A gated doc is
    dropped on any band collision with a standing doc (candidate-level
    policy, matching dedup_incremental_minhash; production would add
    an exact-Jaccard verify on the collisions, same plan shape).

    Report columns: n_delta (added+changed), n_gates (passed
    quality+lang), n_dup (gated but colliding with standing), n_survive
    (gated, no collision), survive_tokens (tokens the survivors add).
    """
    from map_reduce_lite_spark.ops.dedup import minhash_band_sigs
    from map_reduce_lite_spark.ops.snapshot import _derived_snapshots, snapshot_diff

    d = load_table(spark, sf_dir, "documents")
    prev, cur = _derived_snapshots(d)
    # flagged is consumed twice (signature stage + survival report) and
    # used to re-join delta_keys just to re-attach status, so the
    # un-barriered plan re-ran the full-outer snapshot diff 4x and the
    # stopword gate 2x: 11 document scans. status now rides through the
    # gate projection (carry) — delta_keys has ONE consumer and needs
    # no barrier — and flagged, the gated delta batch a production
    # refresh persists, is materialized ONCE (eager: serialized at
    # build time, no concurrent-stage race on an uncommitted lazy
    # checkpoint). 4 document scans remain: two for the diff, one to
    # re-attach delta text, one for the standing signature index.
    delta_keys = snapshot_diff(prev, cur).filter(
        F.col("status").isin("added", "changed")
    )
    delta = delta_keys.join(cur, "doc_id")
    flagged = quality_lang_flags(delta, carry=("status",)).localCheckpoint(
        eager=True
    )
    gated = flagged.filter("l_ok").select("doc_id", "text")
    standing = minhash_band_sigs(prev)  # production: a stored index table
    dsigs = minhash_band_sigs(gated)
    dups = (
        dsigs.alias("d")
        .join(
            standing.alias("s"),
            (F.col("d.band") == F.col("s.band"))
            & (F.col("d.sig") == F.col("s.sig"))
            & (F.col("d.doc") != F.col("s.doc")),
        )
        .select(F.col("d.doc").alias("doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    w = flagged.join(dups, "doc_id", "left")
    survive = F.col("l_ok") & F.col("is_dup").isNull()
    return (
        w.groupBy("source", "status")
        .agg(
            F.count(F.lit(1)).alias("n_delta"),
            F.sum(F.col("l_ok").cast("long")).alias("n_gates"),
            F.sum((F.col("l_ok") & F.col("is_dup").isNotNull()).cast("long")).alias(
                "n_dup"
            ),
            F.sum(survive.cast("long")).alias("n_survive"),
            F.sum(F.when(survive, F.col("n_tokens")).otherwise(0)).alias(
                "survive_tokens"
            ),
        )
        .select(
            "source", "status", "n_delta", "n_gates", "n_dup", "n_survive",
            "survive_tokens",
        )
    )


def _full_refresh_sql() -> str:
    from map_reduce_lite_spark.ops.snapshot import _band_sig_cte
    from map_reduce_lite_spark.registry import sql_md5_60bit

    langs = list(STOPWORDS)
    hit_cols = ",\n         ".join(
        f"{_sql_stopword_hits('text', ws)} AS hits_{l}" for l, ws in STOPWORDS.items()
    )
    best = "greatest(" + ", ".join(f"hits_{l}" for l in langs) + ")"
    pred = (
        "CASE WHEN " + best + " = 0 THEN 'und' "
        + " ".join(f"WHEN hits_{l} = {best} THEN '{l}'" for l in langs)
        + " END"
    )
    return rf"""
WITH prev AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 13 = 0 THEN text || ' [stale]' ELSE text END AS text
  FROM documents WHERE doc_id % 17 <> 3
), cur AS (
  SELECT doc_id, source, text FROM documents WHERE doc_id % 19 <> 7
), p AS (
  SELECT doc_id AS k, {sql_md5_60bit('text')} AS h_prev FROM prev
), c AS (
  SELECT doc_id AS k, {sql_md5_60bit('text')} AS h_cur FROM cur
), delta_keys AS (
  SELECT COALESCE(p.k, c.k) AS doc_id,
         CASE WHEN p.k IS NULL THEN 'added'
              WHEN c.k IS NULL THEN 'removed'
              WHEN p.h_prev <> c.h_cur THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM p FULL OUTER JOIN c ON p.k = c.k
), delta AS (
  SELECT cur.doc_id, cur.source, cur.text, dk.status
  FROM delta_keys dk JOIN cur ON cur.doc_id = dk.doc_id
  WHERE dk.status IN ('added', 'changed')
), feats AS (
  SELECT doc_id, source, status, text,
         CAST(len(string_split_regex(trim(text, ' '), '\s+')) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars,
         {hit_cols}
  FROM delta
), flagged AS (
  SELECT doc_id, source, status, text, n_tokens,
         (n_tokens >= {MIN_TOKENS}
          AND (n_chars - n_tokens + 1) / n_tokens <= {MAX_MEAN_TOKEN_LEN}
          AND {pred} = 'en') AS l_ok
  FROM feats
), gated AS (
  SELECT doc_id, text FROM flagged WHERE l_ok
), {_band_sig_cte('prev', 'st_')},
{_band_sig_cte('gated', 'dl_')},
dups AS (
  SELECT DISTINCT d.doc AS doc_id
  FROM dl_bands d JOIN st_bands s
    ON d.band = s.band AND d.sig = s.sig AND d.doc <> s.doc
)
SELECT source, status, COUNT(*) AS n_delta,
       CAST(SUM(CASE WHEN l_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_gates,
       CAST(SUM(CASE WHEN l_ok AND du.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup,
       CAST(SUM(CASE WHEN l_ok AND du.doc_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_survive,
       CAST(SUM(CASE WHEN l_ok AND du.doc_id IS NULL THEN n_tokens ELSE 0 END)
            AS BIGINT) AS survive_tokens
FROM flagged f LEFT JOIN dups du ON du.doc_id = f.doc_id
GROUP BY source, status
"""


FULL_REFRESH_SQL = _full_refresh_sql()


PIPELINE_QUERIES: dict[str, Query] = {
    "pipeline_pretrain_curation": Query(
        "pipeline_pretrain_curation",
        pretrain_curation,
        PRETRAIN_CURATION_SQL,
        "quality → language → near-dup curation funnel per source",
    ),
    "pipeline_incremental_refresh": Query(
        "pipeline_incremental_refresh",
        pipeline_incremental_refresh,
        INCREMENTAL_REFRESH_SQL,
        "snapshot delta → curation gates: refresh cost scales with the delta",
    ),
    "pipeline_full_refresh": Query(
        "pipeline_full_refresh",
        pipeline_full_refresh,
        FULL_REFRESH_SQL,
        "diff → gates → incremental dedup vs standing index → survival report",
    ),
}
