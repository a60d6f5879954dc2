"""Deduplication operators for large-scale text corpora.

Four strategies, all shuffle-architected for 100 TB:

- **exact**: group by a 60-bit content hash, not the full text — the
  shuffle carries 8-byte keys instead of document bodies. Collision rate
  at 2^60 is negligible for ≤ billions of docs; a verify-on-text pass can
  be appended for the paranoid.
- **n-gram Jaccard**: word-shingle inverted index self-join. The shuffle
  key is the shingle hash; pair-counting is a pure integer aggregation.
  Quadratic only within a shingle's posting list — at scale, drop
  ultra-frequent shingles (document-frequency cap) exactly like a stop
  list; the cap keeps posting lists bounded.
- **MinHash + LSH**: k=32 portable min-hashes, banded 8×4. Candidate
  recall for Jaccard≥0.5 with these parameters is 1-(1-0.5^4)^8 ≈ 0.42
  per band family — tuned for demo; raise k/bands for production recall.
  Only band-signature equality joins — no pairwise scan at all.
- **SimHash**: 32-bit weighted fingerprint, 4×8-bit band join, Hamming
  distance ≤ 3 verify. Near-constant cost per doc; band join is the only
  shuffle.

All four use the portable md5-based 60-bit hash (registry.md5_60bit) so
each has a full DuckDB oracle — including LSH banding, which is usually
oracle-unfriendly.

Spark-only note: at 100 TB replace the md5 tokenizer hash with
``xxhash64`` (cheaper, JVM-intrinsic); md5 is kept here for
engine-portability of the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from map_reduce_lite_spark.registry import Query, md5_60bit, sql_md5_60bit
from map_reduce_lite_spark.relational.tables import load_table

# MinHash parameters (bands × rows-per-band = num hashes). The module
# defaults are the DEMO configuration pinned by the DuckDB oracle —
# cheap enough to replay in SQL (32 MIN aggregates), candidate recall at
# J=0.5 only ~0.42. Production corpora should pass the PROD_* values
# (k=128, 16 bands × 8 rows: recall 1-(1-J^8)^16 ≈ 0.95 at J=0.8,
# ≈ 0.9997 at J=0.9, while keeping the false-positive knee near the
# (1/16)^(1/8) ≈ 0.71 threshold) — recall is property-tested at the
# production setting in tests/test_dedup.py.
MINHASH_BANDS = 8
MINHASH_ROWS = 4
NUM_MINHASHES = MINHASH_BANDS * MINHASH_ROWS

PROD_MINHASH_BANDS = 16
PROD_MINHASH_ROWS = 8

SHINGLE_SIZE = 3
JACCARD_THRESHOLD = 0.5

# Document-frequency cap for the shingle inverted index: shingles
# appearing in more than this many documents are dropped before the
# self-join, exactly like a stop list. A stop-shingle's posting list
# contributes |postings|² candidate pairs, so one "of the and" shared by
# 1M docs would emit 10^12 pairs — the cap bounds every posting list and
# therefore the join's worst case. Sizes (|A|, |B|) are still computed
# on the FULL shingle sets; only the intersection counting is capped, so
# capped Jaccard is a lower bound of true Jaccard (ties broken toward
# precision — the right direction for dedup). At the test scale factors
# max DF is 9, so the default cap does not perturb the oracle values.
SHINGLE_DF_CAP = 50


# --------------------------------------------------------------------------
# Tokenize / shingle (shared)
# --------------------------------------------------------------------------

def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, token) — whitespace tokens with positions.

    Repartitioning by doc BEFORE the explode spreads the CPU-heavy
    tokenize across cores when the source is one parquet split, and
    pre-aligns the partitioning every downstream per-doc window/groupBy
    needs — one shuffle of small rows instead of one of exploded rows."""
    spark = df.sparkSession
    fanout = max(spark.sparkContext.defaultParallelism, 8)
    return (
        df.repartition(fanout, F.col(id_col))
        .select(
            F.col(id_col).alias("doc"),
            F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("pos", "token"),
        )
        .filter(F.length("token") > 0)
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             k: int = SHINGLE_SIZE) -> DataFrame:
    """(doc, shingle) — distinct word k-shingles via lead() windows.

    Cost shape: the only shuffle of full rows is the doc repartition in
    ``_tokens`` (small pre-explode rows); the lead() window then sorts
    WITHIN those partitions — no second corpus-wide shuffle. Measured
    3× faster than the explode-free transform/element_at array
    formulation (element_at per shingle is slower than codegen'd lead
    over pipelined tokens)."""
    toks = _tokens(df, id_col, text_col)
    w = Window.partitionBy("doc").orderBy("pos")
    parts = [F.col("token")] + [F.lead("token", i).over(w) for i in range(1, k)]
    sh = toks.select("doc", F.concat_ws(" ", *parts).alias("shingle"),
                     *[F.lead("token", i).over(w).alias(f"_t{i}") for i in range(1, k)])
    sh = sh.filter(F.col(f"_t{k-1}").isNotNull()).select("doc", "shingle")
    return sh.distinct()


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by 60-bit content hash (8-byte shuffle keys)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(md5_60bit(F.col("text")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


DEDUP_EXACT_SQL = f"""
SELECT {sql_md5_60bit('text')} AS content_hash,
       MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
FROM documents
GROUP BY 1
"""


# --------------------------------------------------------------------------
# N-gram Jaccard pair scoring
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
    df_cap: int = SHINGLE_DF_CAP,
) -> DataFrame:
    """Near-dup pairs with word-3-shingle Jaccard ≥ ``threshold``.

    inverted-index self-join: shuffle by shingle, integer pair counts,
    jaccard = |∩| / (|A| + |B| - |∩|). Division of identical ints →
    bit-identical doubles vs the oracle. Shingles in more than
    ``df_cap`` documents are dropped from the index before the
    self-join (see SHINGLE_DF_CAP) — set sizes stay uncapped."""
    sh = shingles(docs, id_col, text_col).cache()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    # posting-list bound: the self-join only ever sees shingles whose
    # document frequency is ≤ df_cap
    capped = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("shingle")
        .join(sh, "shingle")
    )
    a, b = capped.alias("a"), capped.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz1 = sizes.select(F.col("doc").alias("doc1"), F.col("n_shingles").alias("n1"))
    sz2 = sizes.select(F.col("doc").alias("doc2"), F.col("n_shingles").alias("n2"))
    jac = F.col("n_inter") / (F.col("n1") + F.col("n2") - F.col("n_inter"))
    return (
        inter.join(sz1, "doc1").join(sz2, "doc2")
        .select("doc1", "doc2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d)


_SHINGLES_CTE = r"""
WITH tok_lists AS (
  SELECT doc_id AS doc, string_split_regex(trim(text, ' '), '\s+') AS toks
  FROM documents
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
)
"""

DEDUP_NGRAM_SQL = _SHINGLES_CTE + f"""
, sizes AS (
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
)
SELECT doc1, doc2,
       n_inter / (s1.n_shingles + s2.n_shingles - n_inter) AS jaccard
FROM inter
JOIN sizes s1 ON s1.doc = doc1
JOIN sizes s2 ON s2.doc = doc2
WHERE n_inter / (s1.n_shingles + s2.n_shingles - n_inter) >= 0.5
"""


# --------------------------------------------------------------------------
# Asymmetric containment (near-subset detection)
# --------------------------------------------------------------------------

# A quote-heavy copy or a doc embedded inside a larger page has HIGH
# containment but LOW Jaccard (the union is dominated by the bigger
# doc), so symmetric near-dup misses it. C(A→B) = |sh(A) ∩ sh(B)| /
# |sh(A)| ≥ τ flags A as a near-subset of B.
CONTAINMENT_T = 0.8


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed near-subset pairs: (contained_doc, container_doc,
    containment) where ≥ CONTAINMENT_T of the contained doc's word-3
    shingles also appear in the container.

    Scale shape is dedup_ngram_jaccard's exactly — one DF-capped
    inverted-index self-join computes each unordered pair's |∩| ONCE,
    then both directed ratios are checked against τ from the same row
    (no second join, no second shuffle): containment reuses the
    Jaccard candidate machinery, it just divides by |A| instead of
    |A∪B|. Division of identical ints → bit-identical doubles vs the
    oracle."""
    d = load_table(spark, sf_dir, "documents")
    sh = shingles(d).cache()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    capped = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= SHINGLE_DF_CAP)
        .select("shingle")
        .join(sh, "shingle")
    )
    a, b = capped.alias("a"), capped.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz1 = sizes.select(F.col("doc").alias("doc1"), F.col("n_shingles").alias("n1"))
    sz2 = sizes.select(F.col("doc").alias("doc2"), F.col("n_shingles").alias("n2"))
    both = inter.join(sz1, "doc1").join(sz2, "doc2")
    # r12: the two directed ratios used to be a unionAll of two
    # projections of `both` — and a union does not share its branches'
    # common subtree, so the inverted-index self-join (the expensive
    # stage) executed TWICE. Exploding a 2-element struct array emits
    # both directions from ONE execution; same rows, same multiset.
    directed = F.array(
        F.struct(
            F.col("doc1").alias("contained_doc"),
            F.col("doc2").alias("container_doc"),
            (F.col("n_inter") / F.col("n1")).alias("containment"),
        ),
        F.struct(
            F.col("doc2").alias("contained_doc"),
            F.col("doc1").alias("container_doc"),
            (F.col("n_inter") / F.col("n2")).alias("containment"),
        ),
    )
    return (
        both.select(F.explode(directed).alias("d"))
        .select("d.contained_doc", "d.container_doc", "d.containment")
        .filter(F.col("containment") >= CONTAINMENT_T)
    )


DEDUP_CONTAINMENT_SQL = _SHINGLES_CTE + f"""
, sizes AS (
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
), both_sized AS (
  SELECT doc1, doc2, n_inter, s1.n_shingles AS n1, s2.n_shingles AS n2
  FROM inter
  JOIN sizes s1 ON s1.doc = doc1
  JOIN sizes s2 ON s2.doc = doc2
), directed AS (
  SELECT doc1 AS contained_doc, doc2 AS container_doc,
         n_inter / n1 AS containment
  FROM both_sized
  UNION ALL
  SELECT doc2 AS contained_doc, doc1 AS container_doc,
         n_inter / n2 AS containment
  FROM both_sized
)
SELECT contained_doc, container_doc, containment
FROM directed WHERE containment >= {CONTAINMENT_T}
"""


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

# Mersenne prime field for the permutation family h_i = (a_i*h + b_i) mod P.
# P < 2^31 keeps a_i*h < 2^62 — no int64 overflow in either engine.
MINHASH_P = 2147483647


def _coeffs(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic (a_i, b_i) permutation coefficients for any k —
    Knuth multiplicative constants, reproducible in plain SQL."""
    a = [(i * 2654435761 + 1) % MINHASH_P for i in range(1, num_hashes + 1)]
    b = [(i * 40503 + 7) % MINHASH_P for i in range(1, num_hashes + 1)]
    return a, b


_A, _B = _coeffs(NUM_MINHASHES)


def minhash_signatures(sh: DataFrame, num_hashes: int = NUM_MINHASHES) -> DataFrame:
    """(doc, m0..m{k-1}) — k portable min-hashes in ONE aggregation pass.

    Each shingle is md5-hashed once; the k permutations are integer
    arithmetic evaluated as k parallel MIN aggregates (map-side partial
    agg), so shuffle volume is docs × k longs and there is no row
    explosion at all — the design that survives a 100 TB corpus."""
    ca, cb = _coeffs(num_hashes)
    hashed = sh.select(
        "doc", (md5_60bit(F.col("shingle")) % MINHASH_P).alias("h")
    )
    mins = [
        F.min((F.col("h") * ca[i] + cb[i]) % MINHASH_P).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    return hashed.groupBy("doc").agg(*mins)


def minhash_band_sigs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = MINHASH_BANDS,
    rows: int = MINHASH_ROWS,
) -> DataFrame:
    """(doc, band, sig) — the banded MinHash signature table.

    This is the MERGEABLE index artifact: at scale it is computed once
    per ingested batch and stored; an incremental refresh band-joins
    the delta's signatures against it instead of re-scanning the
    corpus (see ops/snapshot.py::dedup_incremental_minhash)."""
    sigs = minhash_signatures(shingles(docs, id_col, text_col), bands * rows)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",", *[F.col(f"m{b * rows + r}") for r in range(rows)]
                ).alias("sig"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select("doc", F.explode(band_structs).alias("bs")).select(
        "doc", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = MINHASH_BANDS,
    rows: int = MINHASH_ROWS,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """LSH candidate pairs: equal band signature in ≥ 1 of ``bands``
    bands of ``rows`` min-hashes each (k = bands × rows total hashes).

    ``checkpoint_dir`` (r11): switches the signature-table
    materialization from localCheckpoint (dies with an executor) to
    reliable checkpoint() on a shared-FS path — the cluster posture
    every SF-proportional materialization in the repo now carries.

    Candidate probability for a pair with Jaccard J is 1-(1-J^rows)^bands
    — pick (bands, rows) for the corpus: the module default (8×4) is the
    cheap oracle-replayable demo; PROD_MINHASH_BANDS × PROD_MINHASH_ROWS
    (16×8) is the production setting with recall ≥ 0.9 at J ≥ 0.8
    (property-tested). Only band-signature equi-joins — candidate work is
    quadratic only within a colliding bucket, never corpus-wide."""
    from map_reduce_lite_spark.ops.graph import _checkpointer

    banded = minhash_band_sigs(docs, id_col, text_col, bands, rows)
    # materialize ONCE before the self-join: the shingle + k-minhash
    # aggregation above is the dominant cost, and Spark plans each join
    # side independently (no ReusedExchange here) — without this the
    # whole signature pipeline runs twice (measured ~2x cold, ~15% warm)
    banded = _checkpointer(docs, checkpoint_dir)(banded)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.sig") == F.col("b.sig"))
        & (F.col("a.doc") < F.col("b.doc")),
    ).select(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"))
    return pairs.distinct()


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs at the oracle-pinned demo setting (8 bands ×
    4 rows). Output is the distinct candidate pair set — the verify pass
    (exact Jaccard on candidates only) is dedup_ngram_jaccard restricted
    to these pairs."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d)


def dedup_minhash_lsh_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs at the PRODUCTION banding (16 bands × 8 rows,
    k=128): recall 1-(1-J^8)^16 ≈ 0.95 at J=0.8 — the setting a real
    corpus runs. Same operator as dedup_minhash_lsh; only (bands, rows)
    differ, and the oracle replays the identical 128-hash computation
    (the 128 MIN aggregates are one grouped scan in both engines, so
    even the production banding is fully value-oracled — it is not just
    property-tested)."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, bands=PROD_MINHASH_BANDS, rows=PROD_MINHASH_ROWS)


def _minhash_sql(bands: int = MINHASH_BANDS, rows: int = MINHASH_ROWS) -> str:
    h60 = sql_md5_60bit("shingle")
    ca, cb = _coeffs(bands * rows)
    min_cols = ",\n         ".join(
        f"MIN((h * {ca[i]} + {cb[i]}) % {MINHASH_P}) AS m{i}"
        for i in range(bands * rows)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc, {b} AS band, "
        + " || ',' || ".join(
            f"CAST(m{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        + " AS sig FROM sigs"
        for b in range(bands)
    )
    return (
        _SHINGLES_CTE
        + f"""
, hashed AS (
  SELECT doc, {h60} % {MINHASH_P} AS h FROM sh
), sigs AS (
  SELECT doc,
         {min_cols}
  FROM hashed GROUP BY doc
), bands AS (
{band_selects}
)
SELECT DISTINCT a.doc AS doc1, b.doc AS doc2
FROM bands a JOIN bands b
  ON a.band = b.band AND a.sig = b.sig AND a.doc < b.doc
"""
    )


DEDUP_MINHASH_SQL = _minhash_sql()
DEDUP_MINHASH_PROD_SQL = _minhash_sql(PROD_MINHASH_BANDS, PROD_MINHASH_ROWS)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

# 60-bit simhash, 4 bands × 15 bits, Hamming ≤ 3 — the Manku et al.
# (WWW 2007) production setting is 64-bit / k=3; 60 bits is the width
# of the portable md5_60bit hash, so every fingerprint bit carries a
# live vote in BOTH engines. The width matters at scale twice over:
# a 32-bit fingerprint saturates by the birthday bound on any real
# corpus, and its 8-bit band buckets (256 per band) made candidate
# generation effectively quadratic on self-similar data — the
# regenerated sf0.1 corpus put 17% of ALL doc pairs through the
# Hamming verify. 15-bit bands give 32768 buckets per band.
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 15
SIMHASH_BAND_MASK = (1 << SIMHASH_BAND_BITS) - 1
HAMMING_MAX = 3  # ≤3 differing bits + 4 bands ⇒ ≥1 band agrees exactly


# The 60-bit packing loop as ONE constant-size higher-order expression.
# The sign-of-votes test sum(±1) > 0 is rewritten as the exact integer
# equivalence 2·count_set_bits > n_tokens (sum = 2·count_set − n), so
# the whole fingerprint is per-row array work: for each bit position i,
# one allocation-free `aggregate` pass counts set bits over the token
# hashes. Two wins over the previous explode + 60-SUM groupBy form:
# (1) the fingerprint stage is a PURE MAP — zero shuffle; the only
# shuffle left in the entire simhash pipeline is the 16-byte band rows;
# (2) the Catalyst tree is constant-size, so analysis + codegen cost
# ~0.05 s instead of the ~1.5 s a 60-term unrolled expression costs PER
# FRESH DATAFRAME (driver-side; measured: fresh-DF fingerprint 2.0 s →
# 1.0 s, execution alone 0.44 s → 0.20 s at sf0.1 — the HOF pass is
# also faster to RUN because it never materializes the exploded token
# stream).
_SIMHASH_FP_EXPR = f"""
aggregate(
  sequence(0, {SIMHASH_BITS - 1}),
  CAST(0 AS BIGINT),
  (acc, i) -> acc + IF(
     2 * aggregate(hs, CAST(0 AS BIGINT), (c, h) -> c + (shiftright(h, i) & 1))
         > size(hs),
     shiftleft(CAST(1 AS BIGINT), i),
     CAST(0 AS BIGINT)))
"""


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc, simhash) — 60-bit simhash over distinct whitespace tokens.

    Map-only: tokenize → within-doc array_distinct → md5_60bit per
    token → the constant-size vote/pack expression above, all per-row.
    The repartition exists only to spread tokenize CPU across local
    cores on the small demo files; on a cluster, input splits already
    provide map parallelism and it can be dropped. (History: the r5
    form exploded tokens and ran a 60-SUM groupBy — two shuffles of
    the token stream and a 60-term Catalyst tree; see _SIMHASH_FP_EXPR
    for the measured wins of this form.)"""
    spark = docs.sparkSession
    fanout = max(spark.sparkContext.defaultParallelism, 8)
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda t: F.length(t) > 0
    )
    hashed = docs.repartition(fanout, F.col("doc_id")).select(
        F.col("doc_id").alias("doc"),
        F.transform(F.array_distinct(toks), lambda t: md5_60bit(t)).alias("hs"),
    )
    # Token-less docs are excluded, matching the oracle's toks CTE which
    # never emits a row for them: without this, every empty doc would get
    # simhash=0 and Spark alone would report all-empty pairs as hamming-0
    # near-dups. Identical text is dedup_exact's job, not simhash's.
    return hashed.where(F.size("hs") > 0).select(
        "doc", F.expr(_SIMHASH_FP_EXPR).alias("simhash")
    )


# Hard bound on a band bucket's quadratic blowup — the simhash twin of
# SEMDEDUP_CLUSTER_CAP. Corpora with heavily templated / low-entropy
# text collapse many documents onto the same fingerprint chunk (the r6
# scale-stress measured a 29k-doc bucket on a saturated-vocabulary
# corpus: 430M candidate pairs from ONE bucket, wall time superlinear
# exponent 1.2); even the driver fixture's hottest sf0.1 bucket holds
# 1 582 of 5 000 docs. Buckets above the cap are sub-split into
# ceil(size/cap) blocks by a BAND-SALTED portable hash, so the
# candidate stage is O(Σ min(size, cap)·size) per band. The band salt
# makes the split independent across the 4 bands: a pair agreeing on m
# over-cap bands survives with prob 1-(1-1/n_sub)^m rather than being
# dropped with full correlation — and truly identical text is caught
# unconditionally by dedup_exact, which is the operator whose job that
# is. 4096 > every fixture bucket, so results there are unchanged; the
# forced-cap test proves boundedness + oracle agreement under
# splitting.
SIMHASH_BUCKET_CAP = 4096


def simhash_pairs(
    docs: DataFrame,
    cap: int = SIMHASH_BUCKET_CAP,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-dup pairs with simhash Hamming distance ≤ 3, found via a
    4×15-bit band join (a pair within distance 3 must agree exactly on
    ≥ 1 band), bucket-capped (see SIMHASH_BUCKET_CAP).
    ``checkpoint_dir``: reliable checkpoint() for the band table
    instead of executor-local storage (r11 cluster posture)."""
    fps = simhash_fingerprints(docs)
    bands = fps.select(
        "doc", "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("band"),
    ).withColumn(
        "chunk",
        F.expr(
            f"shiftright(simhash, band * {SIMHASH_BAND_BITS}) & {SIMHASH_BAND_MASK}"
        ),
    )
    # Checkpointed: the band table now has THREE consumers (the sizing
    # probe and both self-join sides). Pre-cap, AQE exchange reuse made
    # a checkpoint a wash (A/B 2.62 vs 2.58 s at sf0.1); with the probe
    # it is what keeps the 60-SUM fingerprint agg single-execution.
    from map_reduce_lite_spark.ops.graph import _checkpointer

    bands = _checkpointer(docs, checkpoint_dir)(bands)
    # Sizing probe: one scalar job over the materialized band table
    # (4 rows/doc). When every (band, chunk) bucket is under the cap —
    # the common case on natural corpora, and the driver fixtures —
    # n_sub would be 1 and sub ≡ 0 everywhere, so the split machinery
    # (sizes broadcast + salted pmod + wider join key) is provably an
    # identity: skip it and run the plain band join (A/B at sf0.1:
    # 2.6 s vs 3.2 s warm — the cap is free until a bucket engages it).
    # Results are bit-identical on both branches by construction.
    max_bucket = (
        bands.groupBy("band", "chunk")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    if max_bucket is not None and max_bucket > cap:
        # bucket sizes: ≤ 4·32768 rows however big the corpus — broadcast
        sizes = bands.groupBy("band", "chunk").agg(
            ((F.count(F.lit(1)) + F.lit(cap - 1)) / F.lit(cap))
            .cast("long")
            .alias("n_sub")
        )
        sp = bands.join(F.broadcast(sizes), ["band", "chunk"]).withColumn(
            "sub",
            F.pmod(
                md5_60bit(
                    F.concat_ws(
                        "|",
                        F.lit("shb"),
                        F.col("band").cast("string"),
                        F.col("doc").cast("string"),
                    )
                ),
                F.col("n_sub"),
            ),
        )
    else:
        sp = bands.withColumn("sub", F.lit(0).cast("long"))
    a, b = sp.alias("a"), sp.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc1"),
            F.col("b.doc").alias("doc2"),
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("int").alias("hamming"),
        )
        # hamming BEFORE distinct: the multi-band dedup then runs over
        # near-dup rows only, not every band-collision candidate (the
        # filter trivially commutes with DISTINCT on these columns)
        .filter(F.col("hamming") <= HAMMING_MAX)
        .distinct()
    )
    return cands


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash_pairs(d)


def _simhash_sql(cap: int = SIMHASH_BUCKET_CAP) -> str:
    salt = sql_md5_60bit(
        "'shb|' || CAST(b.band AS VARCHAR) || '|' || CAST(b.doc AS VARCHAR)"
    )
    return rf"""
WITH toks AS (
  SELECT DISTINCT doc_id AS doc, t.tok AS token
  FROM documents,
       LATERAL unnest(string_split_regex(trim(text, ' '), '\s+')) AS t(tok)
  WHERE t.tok <> ''
), hashed AS (
  SELECT doc, {sql_md5_60bit('token')} AS h FROM toks
), votes AS (
  SELECT doc, bit.b AS bit,
         SUM(CASE WHEN (h >> bit.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM hashed, LATERAL unnest(generate_series(0, {SIMHASH_BITS - 1})) AS bit(b)
  GROUP BY 1, 2
), fps AS (
  SELECT doc, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc
), bands AS (
  SELECT doc, simhash, band.k AS band,
         (simhash >> (band.k * {SIMHASH_BAND_BITS})) & {SIMHASH_BAND_MASK} AS chunk
  FROM fps, LATERAL unnest(generate_series(0, {SIMHASH_BANDS - 1})) AS band(k)
), sizes AS (
  SELECT band, chunk, (COUNT(*) + {cap - 1}) // {cap} AS n_sub
  FROM bands GROUP BY 1, 2
), sp AS (
  SELECT b.doc, b.simhash, b.band, b.chunk,
         ({salt} % s.n_sub) AS sub
  FROM bands b JOIN sizes s ON s.band = b.band AND s.chunk = b.chunk
)
SELECT doc1, doc2, hamming FROM (
  SELECT DISTINCT a.doc AS doc1, b.doc AS doc2,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
  FROM sp a JOIN sp b
    ON a.band = b.band AND a.chunk = b.chunk AND a.sub = b.sub
   AND a.doc < b.doc
)
WHERE hamming <= {HAMMING_MAX}
"""


DEDUP_SIMHASH_SQL = _simhash_sql()


# --------------------------------------------------------------------------
# Embedding-cosine near-dup
# --------------------------------------------------------------------------

NEAR_DUP_COS = 0.40  # demo threshold; corpus max pairwise cosine is ~0.51


EMB_BUCKET_CAP = 512  # max members per LSH band bucket before salted split


def lsh_band_table(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_planes: int = 16,
    n_bands: int = 4,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Materialized (bid, band_id, band_hash) banding of ``corpus`` —
    the shared first stage of every embedding-LSH consumer. Extracted
    (r12) so a job needing the table more than once (the pair stage +
    the star-only coverage metric in leakage_safe_split) projects and
    checkpoints it exactly once; ``checkpoint_dir`` switches the
    materialization from localCheckpoint to reliable checkpoint(), as
    everywhere."""
    from map_reduce_lite_spark.ops.graph import _checkpointer
    from map_reduce_lite_spark.ops.similarity import _hyperplanes, lsh_band_hashes

    if dim is None:
        dim = corpus.select(F.size(vec_col).alias("d")).first()[0]
    planes = _hyperplanes(dim, n_planes)
    return _checkpointer(corpus, checkpoint_dir)(
        corpus.select(
            F.col(id_col).alias("bid"),
            F.posexplode(lsh_band_hashes(vec_col, planes, n_bands)).alias(
                "band_id", "band_hash"
            ),
        )
    )


def _band_self_join(bands: DataFrame, on: list[str]) -> DataFrame:
    """Triangular self-join of a band table on its bucket key columns →
    distinct (keep_id, dup_id) candidate ids. IDS ONLY on the shuffle
    (8-byte keys); vectors join back after the pair dedup."""
    return (
        bands.select(F.col("bid").alias("keep_id"), *on)
        .join(bands.select(F.col("bid").alias("dup_id"), *on), on)
        .filter(F.col("keep_id") < F.col("dup_id"))
        .dropDuplicates(["keep_id", "dup_id"])
        .select("keep_id", "dup_id")
    )


def _refined_candidate_ids(
    corpus: DataFrame,
    bands: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    cap: int,
    n_bands: int,
) -> DataFrame:
    """ADAPTIVE RE-BANDING (r11): candidate ids when some band bucket
    exceeds ``cap``, replacing the salted split for consumers that must
    not silently drop a detectable pair (leakage_safe_split).

    Oversized (band_id, band_hash) buckets are refined with that band's
    16 extra hyperplanes (refine_hyperplanes — per-band chunks, so a
    pair split by one band's refinement keeps its independent chance in
    the other bands): sub-buckets ≤ cap get exact all-pairs; sub-buckets
    STILL oversized (members agreeing on all 4+16 plane signs — a
    near-constant core) emit a star to the min-id representative,
    (size − 1) candidates instead of size², preserving the verified
    graph's connectivity (a near-constant core verifies against the
    representative whenever it verifies against any member, up to the
    threshold boundary). Per-bucket work is thus ≤ cap² + linear —
    bounded regardless of collision density — while, unlike salting,
    no intra-sub-bucket pair is ever dropped. The refinement planes are
    CONSTANTS (seeded), so membership is bit-identical to the SQL twin
    (sql_refined_cands_chain). Residual recall limits, both inherent to
    sub-quadratic detection: (a) pairs inside an oversized bucket that
    disagree on that band's refinement planes fall back on the other
    bands; (b) a barely-above-threshold pair inside a still-oversized
    sub-bucket is detected only via the representative."""
    from map_reduce_lite_spark.ops.similarity import (
        lsh_band_hashes,
        refine_hyperplanes,
    )

    sizes = bands.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("n")
    )
    # one row per (band, hash) — at most n_bands × 2^(planes/band); tiny
    sized = bands.join(F.broadcast(sizes), ["band_id", "band_hash"])
    small_pairs = _band_self_join(
        sized.filter(F.col("n") <= cap).select("bid", "band_id", "band_hash"),
        on=["band_id", "band_hash"],
    )
    rplanes = refine_hyperplanes(dim)
    rh_tbl = corpus.select(
        F.col(id_col).alias("bid"),
        F.posexplode(lsh_band_hashes(vec_col, rplanes, n_bands)).alias(
            "band_id", "rh"
        ),
    )
    big = (
        sized.filter(F.col("n") > cap)
        .select("bid", "band_id", "band_hash")
        .join(rh_tbl, ["bid", "band_id"])
    )
    subsizes = big.groupBy("band_id", "band_hash", "rh").agg(
        F.count(F.lit(1)).alias("m")
    )
    # sub-bucket count is data-dependent (up to one per member) — shuffle
    # join, not broadcast
    bigm = big.join(subsizes, ["band_id", "band_hash", "rh"])
    sub_small_pairs = _band_self_join(
        bigm.filter(F.col("m") <= cap).select("bid", "band_id", "band_hash", "rh"),
        on=["band_id", "band_hash", "rh"],
    )
    sub_big = bigm.filter(F.col("m") > cap).select(
        "bid", "band_id", "band_hash", "rh"
    )
    reps = sub_big.groupBy("band_id", "band_hash", "rh").agg(
        F.min("bid").alias("rep")
    )
    star = (
        sub_big.join(reps, ["band_id", "band_hash", "rh"])
        .filter(F.col("bid") != F.col("rep"))
        .select(F.col("rep").alias("keep_id"), F.col("bid").alias("dup_id"))
    )
    # branch 4 (r11): BUCKET-WIDE anchor star — every member of an
    # oversized bucket also pairs with the bucket's min-id member,
    # regardless of refine sub-bucket. Catches the boundary regime the
    # refinement alone misses: a member that IS a near-dup of the
    # bucket's dominant direction (cos ≥ threshold) but disagrees with
    # its refinement planes lands in a singleton sub-bucket and would
    # otherwise get no candidate in this band at all (measured: a
    # cos-0.48 satellite of a 600-member core was detected in ZERO
    # pairs pre-fix, 600 by the exact oracle). Linear cost (size − 1
    # candidates per oversized bucket); the anchor table is one row
    # per oversized bucket — broadcastable by construction.
    anchors = (
        sized.filter(F.col("n") > cap)
        .groupBy("band_id", "band_hash")
        .agg(F.min("bid").alias("rep"))
    )
    anchor_star = (
        sized.filter(F.col("n") > cap)
        .select("bid", "band_id", "band_hash")
        .join(F.broadcast(anchors), ["band_id", "band_hash"])
        .filter(F.col("bid") != F.col("rep"))
        .select(F.col("rep").alias("keep_id"), F.col("bid").alias("dup_id"))
    )
    return (
        small_pairs.unionByName(sub_small_pairs)
        .unionByName(star)
        .unionByName(anchor_star)
        .dropDuplicates(["keep_id", "dup_id"])
    )


def refine_star_only_ids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    n_bands: int = 4,
    dim: int | None = None,
    cap: int = EMB_BUCKET_CAP,
    checkpoint_dir: str | None = None,
    bands: DataFrame | None = None,
) -> DataFrame:
    """IDs whose candidate coverage under adaptive re-banding is
    STAR-ONLY in every band — i.e. members for whom no band gave an
    exhaustive all-pairs stage (their bucket was oversized in all
    ``n_bands`` bands AND their refine sub-bucket was still oversized
    in each), so they are reachable in the detected graph only through
    representative/anchor edges (branches 3-4 of
    ``_refined_candidate_ids``).

    r12 (the r11 ADVICE visibility fix): the adaptive path's "zero
    dropped detections" guarantee is computed from its own pair set,
    so a consumer could not previously SEE the regime where detection
    becomes approximate (a satellite-satellite near-dup pair sharing
    only a still-oversized sub-bucket is found only via its
    representative). This function makes the regime observable:
    ``leakage_safe_split`` counts these members per split
    (``n_approx_members``), zero whenever every bucket fit under the
    cap — so downstream consumers see exactly when, and for how many
    vectors, the guarantee weakened from exhaustive to
    star-approximated.

    Cost: one band projection + two count aggregations on 8-byte keys;
    a sizing probe returns an empty frame without touching the
    refinement planes when no bucket is oversized (the driver-fixture
    case — where the metric is provably zero). Callers that already
    materialized the (bid, band_id, band_hash) table — the pair stage
    builds an identical one — pass it via ``bands`` so the projection
    and its checkpoint run ONCE per job, not once per consumer
    (leakage_safe_split does)."""
    from map_reduce_lite_spark.ops.similarity import (
        lsh_band_hashes,
        refine_hyperplanes,
    )

    spark = corpus.sparkSession
    empty = spark.createDataFrame([], f"{id_col} long")
    if dim is None:
        dim = corpus.select(F.size(vec_col).alias("d")).first()[0]
        if dim is None:
            return empty
    if bands is None:
        bands = lsh_band_table(
            corpus, id_col, vec_col, dim, n_planes, n_bands, checkpoint_dir
        )  # materialized once: reused by the probe and both joins below
    sizes = bands.groupBy("band_id", "band_hash").agg(F.count(F.lit(1)).alias("n"))
    max_bucket = sizes.agg(F.max("n")).first()[0]
    if max_bucket is None or max_bucket <= cap:
        return empty
    sized = bands.join(F.broadcast(sizes), ["band_id", "band_hash"])
    big = sized.filter(F.col("n") > cap).select("bid", "band_id", "band_hash")
    rplanes = refine_hyperplanes(dim)
    rh_tbl = (
        corpus.join(big.select("bid").distinct(), F.col(id_col) == F.col("bid"))
        .select(
            F.col(id_col).alias("bid"),
            F.posexplode(lsh_band_hashes(vec_col, rplanes, n_bands)).alias(
                "band_id", "rh"
            ),
        )
    )
    bigr = big.join(rh_tbl, ["bid", "band_id"])
    subsizes = bigr.groupBy("band_id", "band_hash", "rh").agg(
        F.count(F.lit(1)).alias("m")
    )
    # a band gives a member EXACT coverage iff its bucket fit under the
    # cap, or its refine sub-bucket did
    exact = (
        sized.filter(F.col("n") <= cap)
        .select("bid")
        .unionByName(
            bigr.join(subsizes, ["band_id", "band_hash", "rh"])
            .filter(F.col("m") <= cap)
            .select("bid")
        )
        .distinct()
    )
    return (
        corpus.select(F.col(id_col).alias("bid"))
        .join(exact, "bid", "left_anti")
        .select(F.col("bid").alias(id_col))
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = NEAR_DUP_COS,
    method: str = "exact",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    n_bands: int = 4,
    dim: int | None = None,
    cap: int = EMB_BUCKET_CAP,
    checkpoint_dir: str | None = None,
    bands: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ ``threshold``.

    ``bands`` (r12): a pre-materialized (bid, band_id, band_hash)
    table, letting a caller that needs the band table for more than
    the pair stage (leakage_safe_split also feeds it to
    refine_star_only_ids) project + checkpoint it exactly once.
    Callers passing it are responsible for it being the SAME banding
    (mrl band hashes over ``vec_col``) — build it with
    ``lsh_band_table``.

    ``checkpoint_dir`` (r10): switches the band-table materialization
    from localCheckpoint (dies with an executor) to reliable
    checkpoint() on a shared-FS path — the same option
    connected_components and knn_topk_edges carry.

    ``method="exact"`` scores the full triangular self-join — the oracle
    path, quadratic in corpus size, fine for verification corpora.
    ``method="lsh"`` blocks the self-join on banded random-hyperplane
    buckets (similarity.lsh_band_hashes) and exact-verifies cosine only
    on colliding pairs — the 100 TB path: the shuffle key is the band
    hash, pair work is quadratic only within a bucket, and recall vs
    exact is property-tested (tests/test_dedup.py).

    Hot-bucket cap (r9, the simhash_pairs mechanism): on an unclustered
    corpus, band collisions are a constant fraction of n² — measured
    66 s at 20k random unit vectors with the pair scoring dominating
    the whole components family. When any (band_id, band_hash) bucket
    exceeds ``cap``, oversized buckets are salted-split into
    ceil(size/cap) sub-buckets and pairs form only within a sub-bucket,
    bounding per-bucket work at cap² regardless of collision density;
    a sizing probe skips the machinery entirely when no bucket is
    oversized (the driver fixtures), where the plain join is provably
    identical. The SQL twins replay sizes+salt unconditionally
    (n_sub=1 → sub ≡ 0 identity), so both branches hash-match them;
    cap-ENGAGED parity is pinned in tests/test_capcorpus.py.

    ``method="lsh_refine"`` (r11): same banding, but oversized buckets
    are ADAPTIVELY RE-BANDED instead of salted (see
    _refined_candidate_ids) — for SAFETY consumers (leakage_safe_split)
    where a salt's silently-dropped intra-bucket pairs would mean
    undetected cross-split leakage. Same bounded per-bucket cost, no
    intra-sub-bucket pair dropped; when no bucket is oversized all
    three lsh variants are the identical plain band join."""
    from map_reduce_lite_spark.ops.similarity import (
        _dot,
        _hyperplanes,
        _norm,
        lsh_band_hashes,
    )

    # norms once per vector; sim = dot/(a_norm*b_norm) matches the
    # oracle's sqrt(a·a)*sqrt(b·b) operand order → bit-identical
    a = corpus.select(
        F.col(id_col).alias("keep_id"),
        F.col(vec_col).alias("a_vec"),
        _norm(F.col(vec_col)).alias("a_norm"),
    )
    b = corpus.select(
        F.col(id_col).alias("dup_id"),
        F.col(vec_col).alias("b_vec"),
        _norm(F.col(vec_col)).alias("b_norm"),
    )
    from map_reduce_lite_spark.ops.similarity import _spread

    if method == "exact":
        # BNLJ parallelism follows the streamed (left) side's partitions;
        # one parquet split would mean one core for the whole O(n²) scan
        pairs = _spread(a, "keep_id").join(b, F.col("keep_id") < F.col("dup_id"))
    elif method in ("lsh", "lsh_refine"):
        if dim is None:  # probing costs a Spark job — callers should pass it
            dim = corpus.select(F.size(vec_col).alias("d")).first()[0]
        if bands is None:
            # band join + pair dedup on IDS ONLY (8-byte shuffle keys),
            # then join the vectors back for scoring — shuffling 64-float
            # vectors through the ×n_bands explode and the dedup would
            # cost ~64× the bytes for nothing
            bands = lsh_band_table(
                corpus, id_col, vec_col, dim, n_planes, n_bands, checkpoint_dir
            )  # hyperplane projections run once, not once per self-join
            # side (ids + band hashes only — tiny); the materialized
            # table also feeds the cap's sizing probe
        max_bucket = (
            bands.groupBy("band_id", "band_hash")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .first()[0]
        )
        if max_bucket is not None and max_bucket > cap and method == "lsh_refine":
            ids = _refined_candidate_ids(
                corpus, bands, id_col, vec_col, dim, cap, n_bands
            )
        elif max_bucket is not None and max_bucket > cap:
            sizes = bands.groupBy("band_id", "band_hash").agg(
                ((F.count(F.lit(1)) + F.lit(cap - 1)) / F.lit(cap))
                .cast("long")
                .alias("n_sub")
            )
            salted = bands.join(
                F.broadcast(sizes), ["band_id", "band_hash"]
            ).withColumn(
                "sub",
                F.pmod(
                    md5_60bit(
                        F.concat_ws(
                            "|",
                            F.lit("emb"),
                            F.col("band_id").cast("string"),
                            F.col("bid").cast("string"),
                        )
                    ),
                    F.col("n_sub"),
                ),
            )
            ids = _band_self_join(salted, on=["band_id", "band_hash", "sub"])
        else:
            ids = _band_self_join(bands, on=["band_id", "band_hash"])
        pairs = _spread(ids, "keep_id").join(a, "keep_id").join(b, "dup_id")
    else:
        raise ValueError(f"unknown method {method!r}")
    sim = _dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_norm") * F.col("b_norm"))
    return (
        pairs.select("keep_id", "dup_id", sim.alias("sim"))
        .filter(F.col("sim") >= F.lit(threshold))
        .select(
            "keep_id", "dup_id", F.floor(F.col("sim") * 1e9).cast("long").alias("sim_e9")
        )
    )


def build_near_dup_pairs(
    corpus: DataFrame,
    path: str,
    threshold: float = NEAR_DUP_COS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    cap: int = EMB_BUCKET_CAP,
    checkpoint_dir: str | None = None,
    method: str = "lsh",
) -> DataFrame:
    """STAGE the LSH-verified near-dup pair set as a parquet artifact
    and return its scan — the production shape for the whole components
    family (r10, the build_knn_edges pattern): the banded pair join +
    cosine verify is the family's dominant cost, and the registered
    single-query forms of dedup_components / dedup_cluster_sizes /
    dedup_survivors_docs / curation_leakage_safe_split each rebuild it
    (required by the driver contract's independent calls). At 100 TB
    the pair set is built once per corpus snapshot and every consumer —
    ``connected_components(pairs)``, ``dedup_survivors(pairs, ...)``,
    the split router — reads the artifact; a parquet file also
    survives executor loss, unlike in-memory checkpoints. Staged vs
    inline full-multiset parity is pinned in
    test_near_dup_pairs_staged_parity.

    ``method`` (r11): "lsh" (salted cap — the throughput posture) or
    "lsh_refine" (adaptive re-banding — the SAFETY posture a staged
    artifact feeding leakage_safe_split-style routing should carry,
    since a salt's dropped pairs would become silent cross-split
    leakage in every downstream consumer of the artifact)."""
    embedding_near_dup_pairs(
        corpus,
        threshold=threshold,
        method=method,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        cap=cap,
        checkpoint_dir=checkpoint_dir,
    ).write.mode("overwrite").parquet(path)
    return corpus.sparkSession.read.parquet(path)


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb)


def _embedding_cosine_sql() -> str:
    from map_reduce_lite_spark.ops.similarity import _sql_cos

    return f"""
WITH scored AS (
  SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
         {_sql_cos('a.embedding', 'b.embedding')} AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT keep_id, dup_id, CAST(floor(sim * 1e9) AS BIGINT) AS sim_e9
FROM scored WHERE sim >= {NEAR_DUP_COS}
"""


DEDUP_EMBEDDING_SQL = _embedding_cosine_sql()


def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of embedding near-dup: LSH-band blocking + exact
    cosine verify on colliding pairs only. The exact quadratic query
    above is the verification oracle for recall; THIS is the operator a
    production pipeline runs."""
    from map_reduce_lite_spark.ops.similarity import EMB_DIM

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, method="lsh", dim=EMB_DIM)


def _embedding_lsh_sql() -> str:
    from map_reduce_lite_spark.ops.similarity import (
        EMB_DIM,
        LSH_N_BANDS,
        LSH_PLANES,
        _hyperplanes,
        _sql_cos,
        sql_capped_bands_chain,
    )

    planes = _hyperplanes(EMB_DIM, LSH_PLANES)
    return f"""
WITH {sql_capped_bands_chain(planes, LSH_N_BANDS, EMB_BUCKET_CAP, "emb")}
, pairs AS (
  SELECT DISTINCT a.vec_id AS keep_id, b.vec_id AS dup_id
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.sub = b.sub
  WHERE a.vec_id < b.vec_id
), scored AS (
  SELECT p.keep_id, p.dup_id,
         {_sql_cos('ea.embedding', 'eb.embedding')} AS sim
  FROM pairs p
  JOIN embeddings ea ON ea.vec_id = p.keep_id
  JOIN embeddings eb ON eb.vec_id = p.dup_id
)
SELECT keep_id, dup_id, CAST(floor(sim * 1e9) AS BIGINT) AS sim_e9
FROM scored WHERE sim >= {NEAR_DUP_COS}
"""


DEDUP_EMBEDDING_LSH_SQL = _embedding_lsh_sql()


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the LSH-blocked
    embedding-cosine pair graph — the canonical-representative step a
    real dedup pipeline runs after pair finding (keep component minimum,
    drop the rest). Pair generation is the ``method="lsh"`` band-blocked
    path (bucket join + cosine verify on collisions only), NOT the exact
    O(n²) self-join — the exact path stays available as the recall
    oracle (dedup_embedding_cosine / tests/test_dedup.py). Iterative
    min-label propagation on Spark; the oracle replays it with a
    recursive transitive-closure CTE over the same LSH pair set."""
    from map_reduce_lite_spark.ops.graph import connected_components
    from map_reduce_lite_spark.ops.similarity import EMB_DIM

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, method="lsh", dim=EMB_DIM)
    return connected_components(pairs, src="keep_id", dst="dup_id")


def _components_reach_cte() -> str:
    """Shared WITH RECURSIVE chain ending in ``reach`` — the transitive
    closure of the LSH-blocked near-dup pair graph. Consumed by the
    components oracle AND the survivors oracle."""
    from map_reduce_lite_spark.ops.similarity import (
        EMB_DIM,
        LSH_N_BANDS,
        LSH_PLANES,
        _hyperplanes,
        _sql_cos,
        sql_capped_bands_chain,
    )

    planes = _hyperplanes(EMB_DIM, LSH_PLANES)
    return f"""
WITH RECURSIVE {sql_capped_bands_chain(planes, LSH_N_BANDS, EMB_BUCKET_CAP, "emb")}
, cands AS (
  SELECT DISTINCT a.vec_id AS keep_id, b.vec_id AS dup_id
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.sub = b.sub
  WHERE a.vec_id < b.vec_id
), scored AS (
  SELECT c.keep_id, c.dup_id,
         {_sql_cos('ea.embedding', 'eb.embedding')} AS sim
  FROM cands c
  JOIN embeddings ea ON ea.vec_id = c.keep_id
  JOIN embeddings eb ON eb.vec_id = c.dup_id
), pairs AS (
  SELECT keep_id, dup_id FROM scored WHERE sim >= {NEAR_DUP_COS}
), edges AS (
  SELECT keep_id AS a, dup_id AS b FROM pairs
  UNION
  SELECT dup_id, keep_id FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)"""


def _components_sql() -> str:
    return (
        _components_reach_cte()
        + """
SELECT a AS node, LEAST(a, MIN(b)) AS component
FROM reach GROUP BY a
"""
    )


DEDUP_COMPONENTS_SQL = _components_sql()


def dedup_survivors_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KEEP-LIST a dedup pipeline actually materializes: every
    vec_id that survives cluster-level near-dup pruning — each
    connected component of the LSH-blocked cosine pair graph keeps its
    minimum id, every unpaired vector keeps itself. This is
    ``dedup_components``'s consumer stage (ops/graph.dedup_survivors)
    registered end-to-end: pairs → components → anti-join, so the
    driver value-verifies the full pair→cluster→prune funnel, not just
    the cluster labels.

    Scale shape: the pair + components stages are dedup_components'
    exactly (banded join, log-round pointer jumping); the prune adds
    one id-only anti-join against the corpus — 8-byte keys, no new
    hazard. Oracle: the same recursive transitive-closure CTE, keeping
    ids that are never a non-minimum member of their component."""
    from map_reduce_lite_spark.ops.graph import dedup_survivors
    from map_reduce_lite_spark.ops.similarity import EMB_DIM

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, method="lsh", dim=EMB_DIM)
    return dedup_survivors(pairs, emb.select("vec_id"), "vec_id")


def text_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle novelty: what fraction of a doc's word-3
    shingles first appeared in an EARLIER document (doc_id order = the
    corpus's ingestion order)? The memorization/staleness metric a
    curation pass tracks alongside near-dup rate — a crawl slice whose
    novelty collapses is re-crawling what the corpus already has.

    Plan: the shared distinct (doc, shingle) table (one corpus
    shuffle), a min-doc-per-shingle aggregation (map-side combined —
    posting lists collapse to one value, so NO df cap is needed: there
    is no self-join to go quadratic), one join back on the shingle key
    reusing the same partitioning, and a per-doc count agg. All exact
    integers; basis points by integer floor."""
    d = load_table(spark, sf_dir, "documents")
    sh = shingles(d).cache()
    first = sh.groupBy("shingle").agg(F.min("doc").alias("first_doc"))
    per_doc = (
        sh.join(first, "shingle")
        .groupBy(F.col("doc").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") < F.col("doc"), 1).otherwise(0)
            ).alias("n_seen_before"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_seen_before",
        F.floor(
            F.lit(10000)
            * (F.col("n_shingles") - F.col("n_seen_before"))
            / F.col("n_shingles")
        )
        .cast("long")
        .alias("novelty_bps"),
    )


SHINGLE_NOVELTY_SQL = _SHINGLES_CTE + """
, first AS (
  SELECT shingle, MIN(doc) AS first_doc FROM sh GROUP BY shingle
)
SELECT sh.doc AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc < sh.doc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_seen_before,
       CAST(floor(10000 * (COUNT(*) - SUM(CASE WHEN f.first_doc < sh.doc
                                              THEN 1 ELSE 0 END))
                  / COUNT(*)) AS BIGINT) AS novelty_bps
FROM sh JOIN first f ON f.shingle = sh.shingle
GROUP BY sh.doc
"""


def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup exposure per ingestion source: how many of a source's
    documents participate in at least one word-3-shingle near-dup pair
    (the dedup_ngram_jaccard pair set), as exact basis points — the
    per-source health metric that tells a mixture planner WHICH feed
    is flooding the corpus with copies.

    Plan: the pair stage is dedup_ngram_jaccard's (DF-capped inverted
    index, id-only pairs); flagged ids are a distinct union of both
    pair columns (8-byte rows), attached to sources by one equi-join,
    and the rate is a |sources|-key aggregation."""
    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d)
    # Both pair columns from ONE execution of the pair pipeline: a
    # union's branches share no subtrees, so the old two-projection
    # union re-ran the whole DF-capped inverted-index join per side
    # (the dedup_containment lesson — same 2-element explode fix).
    flagged = (
        pairs.select(F.explode(F.array("doc1", "doc2")).alias("doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        d.select("doc_id", "source")
        .join(flagged, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias("n_duped"),
        )
        .select(
            "source",
            "n_docs",
            "n_duped",
            F.floor(F.lit(10000) * F.col("n_duped") / F.col("n_docs"))
            .cast("long")
            .alias("dup_rate_bps"),
        )
    )


DEDUP_RATE_BY_SOURCE_SQL = _SHINGLES_CTE + f"""
, sizes AS (
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
  WHERE n_inter / (s1.n_shingles + s2.n_shingles - n_inter) >= 0.5
), flagged AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc1 AS doc_id FROM pairs UNION ALL SELECT doc2 FROM pairs
  )
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_duped,
       CAST(floor(10000 * SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0
                                   END) / COUNT(*)) AS BIGINT)
         AS dup_rate_bps
FROM documents d LEFT JOIN flagged f ON f.doc_id = d.doc_id
GROUP BY d.source
"""


def _survivors_sql() -> str:
    return (
        _components_reach_cte()
        + """
SELECT e.vec_id FROM embeddings e
WHERE e.vec_id NOT IN (
  SELECT a FROM reach GROUP BY a HAVING LEAST(a, MIN(b)) <> a
)
"""
    )


DEDUP_SURVIVORS_SQL = _survivors_sql()


def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster SIZE HISTOGRAM: how many clusters of each size
    the LSH-blocked cosine pair graph collapses into — the dedup-QA
    summary a pipeline tracks per crawl slice (a fat tail of mega-
    clusters means template boilerplate is exploding; a histogram of
    pairs means benign near-dups). Consumer stage of
    ``dedup_components``: component labels → per-component size →
    per-size cluster count and doc total.

    Scale shape: inherits dedup_components' certified funnel (banded
    pair join, log-round pointer jumping); the histogram adds two
    map-side-combined aggregations over (component) then (size) — both
    key spaces are ≤ the paired-node count, rows are 8-16 bytes.
    Output is O(max cluster size) rows. Integers end-to-end."""
    from map_reduce_lite_spark.ops.graph import connected_components
    from map_reduce_lite_spark.ops.similarity import EMB_DIM

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, method="lsh", dim=EMB_DIM)
    comps = connected_components(pairs, src="keep_id", dst="dup_id")
    sizes = comps.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
    )


DEDUP_CLUSTER_SIZES_SQL = (
    _components_reach_cte()
    + """
, comp AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a
), sizes AS (
  SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component
)
SELECT cluster_size, COUNT(*) AS n_clusters,
       CAST(SUM(cluster_size) AS BIGINT) AS n_docs
FROM sizes GROUP BY cluster_size
"""
)


DEDUP_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query("dedup_exact", dedup_exact, DEDUP_EXACT_SQL, "exact dedup by content hash"),
        Query("dedup_ngram_jaccard", dedup_ngram_jaccard, DEDUP_NGRAM_SQL, "3-shingle jaccard pairs"),
        Query(
            "dedup_containment",
            dedup_containment,
            DEDUP_CONTAINMENT_SQL,
            "directed near-subset pairs by asymmetric shingle containment",
        ),
        Query("dedup_minhash_lsh", dedup_minhash_lsh, DEDUP_MINHASH_SQL, "minhash-LSH candidates"),
        Query(
            "dedup_minhash_lsh_prod",
            dedup_minhash_lsh_prod,
            DEDUP_MINHASH_PROD_SQL,
            "minhash-LSH candidates at production banding (16x8, k=128)",
        ),
        Query("dedup_simhash", dedup_simhash, DEDUP_SIMHASH_SQL, "simhash hamming pairs"),
        Query(
            "dedup_embedding_cosine",
            dedup_embedding_cosine,
            DEDUP_EMBEDDING_SQL,
            "embedding-cosine near-dup pairs (exact)",
        ),
        Query(
            "dedup_embedding_lsh",
            dedup_embedding_lsh,
            DEDUP_EMBEDDING_LSH_SQL,
            "embedding near-dup, LSH-blocked (scale path)",
        ),
        Query(
            "dedup_components",
            dedup_components,
            DEDUP_COMPONENTS_SQL,
            "near-dup clusters via connected components",
        ),
        Query(
            "dedup_cluster_sizes",
            dedup_cluster_sizes,
            DEDUP_CLUSTER_SIZES_SQL,
            "near-dup cluster size histogram over the LSH cosine pair graph",
        ),
        Query(
            "dedup_survivors_docs",
            dedup_survivors_docs,
            DEDUP_SURVIVORS_SQL,
            "keep-list after cluster-level near-dup pruning (pairs → components → anti-join)",
        ),
        Query(
            "text_shingle_novelty",
            text_shingle_novelty,
            SHINGLE_NOVELTY_SQL,
            "per-doc fraction of shingles first seen in earlier docs (exact bps)",
        ),
        Query(
            "dedup_rate_by_source",
            dedup_rate_by_source,
            DEDUP_RATE_BY_SOURCE_SQL,
            "per-source near-dup participation rate over the jaccard pair set",
        ),
    ]
}
