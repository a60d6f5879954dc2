"""Similarity search over embedding columns (array<float>).

Two paths, mirroring how a 100 TB vector corpus is actually served:

- **brute-force top-k** (the exactness baseline): broadcast the query
  set, one narrow pass over the corpus computing cosine, per-query top-k
  via window rank. Cost is O(|corpus| × |queries|) FLOPs but only ONE
  scan and ONE small shuffle (corpus × n_queries rows, pruned to top-k
  by partial TakeOrdered semantics). All math stays in JVM codegen —
  zip_with + aggregate, no Python.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  bucket the corpus once (write-time at scale); queries probe only their
  bucket. Hyperplanes are seeded and passed as literals, so the operator
  is deterministic; recall vs brute force is property-tested
  (tests/test_similarity.py), and the driver gets a rows-only check —
  banding hash order isn't portable SQL.

Cosine determinism vs the DuckDB oracle: both sides cast each float
element to double, multiply pairwise, and fold left-to-right
(Spark ``aggregate``; DuckDB native ``list_dot_product`` on DOUBLE[] —
a sequential loop, verified bit-identical to the explicit zip fold and
chosen over it because the zip form's per-row struct allocations
fragment the process into vm.max_map_count mappings on wide pair
joins, see ``_sql_dot``), giving bit-identical doubles; results are
additionally rounded to 9 decimals before ranking with a vec_id
tiebreak.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from map_reduce_lite_spark.registry import Query, md5_60bit, sql_md5_60bit
from map_reduce_lite_spark.relational.tables import load_table

N_QUERY_VECS = 8  # vec_id < 8 form the query set in the oracle-checked demo
TOP_K = 5

LSH_PLANES = 16  # random-hyperplane bits for the ANN path


def _dot(a: Column, b: Column) -> Column:
    """Left-to-right double dot product (order matches the SQL oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _fanout(df: DataFrame) -> int:
    """Target partition count for FLOP-heavy vector stages."""
    return max(df.sparkSession.sparkContext.defaultParallelism, 8)


def _spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition before a FLOP-dense stage.

    Candidate-pair rows are tiny (two longs), so AQE coalesces the
    post-join stream to ~1 partition by byte-size — and then the 64-dim
    cosine pass runs on one core. Work per row, not bytes per row, is
    what matters here; an explicit repartition restores full parallelism
    (measured 7.2s → sub-second on 32 cores at sf0.1). At 100 TB the
    same holds: keep the scoring stage's partition count sized to the
    cluster, never to the candidate table's serialized bytes."""
    return df.repartition(_fanout(df), *[F.col(c) for c in cols])


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    ``queries`` is expected to be small — it is broadcast, making the
    scan embarrassingly parallel with no corpus shuffle."""
    # norms once per vector, not once per pair: sim = dot/(q_norm*c_norm)
    # is the same expression tree the oracle evaluates (sqrt(q·q) first),
    # so precomputing keeps bit-identity while cutting FLOPs ~3×
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = _spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            _norm(F.col(vec_col)).alias("c_norm"),
        ),
        "neighbor_id",
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias("sim"),
        )
    )
    # rank on the raw (bit-identical) cosine; expose it floor-scaled to an
    # integer — round() can differ by 1 ulp between engines, floor cannot
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.floor(F.col("sim") * 1e9).cast("long").alias("sim_e9"),
        )
    )


def similarity_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return brute_force_topk(emb, queries)


def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-k most-similar corpus vectors with a DIFFERENT
    label — the negatives that actually move a contrastive loss
    (Robinson et al. 2021), versus random negatives that are trivially
    far. Same scale shape as brute_force_topk (broadcast query side,
    one corpus scan, per-query top-k window on a corpus×n_queries
    intermediate); the label inequality is one extra predicate in the
    scan stage, evaluated before any FLOPs. Production mines from an
    ANN candidate pool (similarity_ann_ivf shape) instead of the full
    corpus; the exact pass is the recall oracle for that funnel."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_vec"),
        _norm(F.col("embedding")).alias("q_norm"),
    )
    c = _spread(
        emb.select(
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.col("embedding").alias("c_vec"),
            _norm(F.col("embedding")).alias("c_norm"),
        ),
        "neg_id",
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neg_label") != F.col("q_label"))
        .select(
            "query_id",
            "q_label",
            "neg_id",
            "neg_label",
            (
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neg_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "q_label",
            "neg_id",
            "neg_label",
            F.col("rank").cast("int").alias("rank"),
            F.floor(F.col("sim") * 1e9).cast("long").alias("sim_e9"),
        )
    )


def similarity_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search (hybrid retrieval): top-k cosine
    neighbors among only the documents passing a quality predicate —
    the filter every production RAG/retrieval stack applies WITH the
    vector search, not after it.

    Shape: the predicate runs on the documents scan (pushdown-eligible),
    the surviving ids equi-join the embedding corpus BEFORE any FLOPs,
    and the scan-scored remainder is the brute-force pass. Post-filtering
    top-k instead (rank first, filter after) both wastes FLOPs and
    under-fills k when neighbors get filtered out — the classic hybrid-
    search mistake this operator's shape avoids. At 100 TB the same
    predicate composes with IVF: filter inside the probed buckets."""
    from map_reduce_lite_spark.ops.pipeline import MIN_TOKENS

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    quality_ids = docs.select(
        F.col("doc_id").alias("vec_id"), n_tokens.alias("n_tokens")
    ).filter(F.col("n_tokens") >= MIN_TOKENS)
    corpus = emb.join(quality_ids, "vec_id")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return brute_force_topk(corpus, queries)


def _filtered_topk_sql() -> str:
    from map_reduce_lite_spark.ops.pipeline import MIN_TOKENS

    return rf"""
WITH quality AS (
  SELECT doc_id AS vec_id
  FROM documents
  WHERE CAST(len(string_split_regex(trim(text, ' '), '\s+')) AS BIGINT) >= {MIN_TOKENS}
), corpus AS (
  SELECT e.vec_id, e.embedding FROM embeddings e JOIN quality USING (vec_id)
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
         / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
          * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))) AS sim
  FROM embeddings q JOIN corpus c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERY_VECS}
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank,
       CAST(floor(sim * 1e9) AS BIGINT) AS sim_e9
FROM ranked WHERE rank <= {TOP_K}
"""


SIMILARITY_HARD_NEG_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, q.label AS q_label,
         c.vec_id AS neg_id, c.label AS neg_label,
         list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
         / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
          * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))) AS sim
  FROM embeddings q JOIN embeddings c ON c.label <> q.label
  WHERE q.vec_id < {N_QUERY_VECS}
), ranked AS (
  SELECT query_id, q_label, neg_id, neg_label, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neg_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, q_label, neg_id, neg_label, rank,
       CAST(floor(sim * 1e9) AS BIGINT) AS sim_e9
FROM ranked WHERE rank <= {TOP_K}
"""


SIMILARITY_BRUTE_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
         / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
          * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))) AS sim
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERY_VECS}
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank,
       CAST(floor(sim * 1e9) AS BIGINT) AS sim_e9
FROM ranked WHERE rank <= {TOP_K}
"""


def _hyperplanes(dim: int, n_planes: int = LSH_PLANES, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side constants, broadcast
    as literals — no RNG inside the plan)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _plane_bit_expr(vec_expr: str, plane: list[float]) -> str:
    """Sign bit (0/1 int) of ``vec_expr`` against one fixed hyperplane,
    as a Spark-SQL expression string. The dot is the same
    aggregate(zip_with(...)) left-fold as ``_dot``; plane literals use
    repr (exact double round-trip) with a ``D`` suffix."""
    arr = "array(" + ", ".join(repr(float(w)) + "D" for w in plane) + ")"
    dot = (
        f"aggregate(zip_with({vec_expr}, {arr}, "
        f"(x, p) -> CAST(x AS DOUBLE) * p), 0.0D, (acc, v) -> acc + v)"
    )
    return f"(CASE WHEN {dot} > 0.0D THEN 1 ELSE 0 END)"


def lsh_band_hashes(vec: str, planes: list[list[float]], n_bands: int) -> Column:
    """Array of ``n_bands`` band hashes: planes are split contiguously into
    bands; each band's sign bits pack into one int. Two vectors are
    candidates iff ANY band hash matches (OR-amplification) — the classic
    banding construction (Leskovec/Rajaraman/Ullman, MMDS ch.3).

    ``vec`` must be a COLUMN NAME (str): the whole array is built as one
    SQL string parsed by a single ``F.expr`` — constructing the 16×64
    plane literals through the Column API costs thousands of py4j round
    trips (~2s of driver time per query build, measured), the string
    parse ~none. The resulting Catalyst tree is identical either way.
    Column objects are rejected rather than round-tripped through the
    private ``_jc`` bridge (not guaranteed parseable, absent under Spark
    Connect); select/alias the expression to a name first."""
    if not isinstance(vec, str):
        raise TypeError(
            "lsh_band_hashes requires a column NAME; alias the expression "
            "to a column first (Column objects can't be safely rendered "
            "back into SQL text)"
        )
    vec_expr = vec
    bits = [_plane_bit_expr(vec_expr, p) for p in planes]
    per_band = max(1, len(planes) // n_bands)
    bands = []
    for b in range(n_bands):
        chunk = bits[b * per_band : (b + 1) * per_band]
        if not chunk:
            break
        h = chunk[0]
        for bit in chunk[1:]:
            h = f"({h} * 2 + {bit})"
        bands.append(h)
    return F.expr("array(" + ", ".join(bands) + ")")


# retained single-signature helper (ingest-time partitioning key)
def lsh_signature(vec: str, planes: list[list[float]]) -> Column:
    """Sign-bit signature of ``vec`` against fixed hyperplanes, as an int."""
    return lsh_band_hashes(vec, planes, 1)[0]


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = TOP_K,
    n_planes: int = LSH_PLANES,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via banded random-hyperplane LSH.

    ``n_planes`` sign bits split into ``n_bands`` tables of r =
    n_planes/n_bands bits; a corpus vector is a candidate for a query iff
    they collide in ANY band — recall 1-(1-p^r)^L for per-bit agreement
    p = 1 - θ/π. Wider bands (larger r) cut false positives; more bands
    (larger L) raise recall.

    At 100 TB: band hashes are computed once at ingest and the corpus is
    written as L bucket tables (or one table partitioned by
    (band_id, band_hash)), so a query probes L buckets' files via
    partition pruning instead of scanning the corpus. Here the explode ×L
    is inline; the per-pair dedup is a shuffle on (query_id, neighbor_id)
    bounded by candidate count, not corpus size. Recall is
    property-tested vs brute force (tests/test_similarity.py)."""
    planes = _hyperplanes(dim, n_planes)
    # band join + candidate dedup on IDS ONLY; vectors join back after —
    # the ×n_bands explode and the pair-dedup shuffle then move 8-byte
    # keys instead of 64-float arrays
    c_bands = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(lsh_band_hashes(vec_col, planes, n_bands)).alias(
            "band_id", "band_hash"
        ),
    )
    q_bands = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(lsh_band_hashes(vec_col, planes, n_bands)).alias(
            "band_id", "band_hash"
        ),
    )
    cand = _spread(
        c_bands.join(F.broadcast(q_bands), ["band_id", "band_hash"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # a pair colliding in multiple bands appears once per collision;
        # dedup before scoring so cosine runs once per candidate pair
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id"),
        "neighbor_id",
    )
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    scored = (
        cand.join(c_vecs, "neighbor_id")
        .join(F.broadcast(q_vecs), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.floor(F.col("sim") * 1e9).cast("long").alias("sim_e9"),
        )
    )


EMB_DIM = 64  # test-table embedding dimension (pins the oracle's planes)
LSH_N_BANDS = 4
# Adaptive re-banding (r11): hyperplanes used to REFINE an oversized
# band bucket, chunked per band (REFINE_PLANES / LSH_N_BANDS each) so a
# pair split by one band's refinement keeps its independent chance in
# every other band (the OR-amplification the original banding relies
# on). A distinct seed keeps them independent of the banding planes.
REFINE_PLANES = 64
REFINE_SEED = 137


def refine_hyperplanes(dim: int) -> list[list[float]]:
    """The refinement plane set — shared by the Spark path and every SQL
    twin so refined sub-bucket membership is bit-identical."""
    return _hyperplanes(dim, REFINE_PLANES, seed=REFINE_SEED)
KNN_GRAPH_K = 5  # neighbors kept per node in the corpus k-NN graph
KNN_BUCKET_CAP = 512  # max members per LSH band bucket before salted split


def knn_topk_edges(
    emb: DataFrame,
    k: int = KNN_GRAPH_K,
    cap: int = KNN_BUCKET_CAP,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The corpus k-NN edge list (src_id, dst_id, rank, sim_e9): every
    vector's top-``k`` cosine neighbors among its LSH band collisions —
    the ONE artifact the whole k-NN graph family is built from.

    Reuses the certified ``dedup_embedding_lsh`` blocking (banded
    random-hyperplane signatures, pairs generated ONLY inside buckets —
    never all-pairs): the band table self-joins on (band_id, band_hash)
    with id-only rows, pairs dedup on 8-byte keys before any vector is
    attached, the exact cosine runs once per candidate, and the
    per-node top-K is a rank window over candidate-bounded input. At
    100 TB the band table is written bucket-partitioned at ingest and
    the self-join becomes bucket-local (no corpus shuffle); hot buckets
    are bounded by the same cap strategy as the simhash band dedup
    (tests/test_capcorpus.py precedent). Each colliding pair is scored
    once id-ordered and emitted in both directions (r12), so every
    node gets its own neighbor list (unlike the dedup pair set, which
    keeps only the id-ordered rows)."""
    scored = _knn_scored_edges(emb, cap=cap, checkpoint_dir=checkpoint_dir)
    w = Window.partitionBy("src_id").orderBy(F.desc("sim"), F.asc("dst_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "src_id",
            "dst_id",
            F.col("rank").cast("int").alias("rank"),
            F.floor(F.col("sim") * 1e9).cast("long").alias("sim_e9"),
        )
    )


def build_knn_edges(
    emb: DataFrame,
    path: str,
    k: int = KNN_GRAPH_K,
    cap: int = KNN_BUCKET_CAP,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """STAGE the k-NN edge list once as a parquet artifact and return
    its scan — the production shape for the k-NN family (r10): the
    capped band join + cosine scoring is by far the family's dominant
    cost, and `similarity_knn_graph` / `similarity_nn_descent` /
    `similarity_graph_hubness` previously each rebuilt it from scratch
    (hubness's measured 1.16 scaling exponent WAS the rebuild — its own
    tail is two cheap aggregations). At 100 TB the edge list is built
    once per corpus snapshot, written to shared storage, and every
    consumer reads the scan — also the resilience story: a parquet
    artifact survives executor loss, unlike in-memory state.

    The registered single-query forms stay self-contained (they build
    the edge list inline — required by the driver contract's
    independent (spark, sf_dir) calls); parity between the staged and
    inline forms is pinned by test_knn_staged_edges_parity."""
    knn_topk_edges(emb, k=k, cap=cap, checkpoint_dir=checkpoint_dir).write.mode(
        "overwrite"
    ).parquet(path)
    return emb.sparkSession.read.parquet(path)


def similarity_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide approximate k-NN graph — see ``knn_topk_edges`` (the
    registered form builds the edge list inline; ``build_knn_edges``
    is the staged-artifact production path)."""
    return knn_topk_edges(load_table(spark, sf_dir, "embeddings"))


def _knn_scored_edges(
    emb: DataFrame,
    cap: int = KNN_BUCKET_CAP,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(src_id, dst_id, sim) for every directed LSH band collision —
    the shared candidate-scoring stage of the k-NN graph family.

    ``checkpoint_dir`` (r10): the band table is materialized once and
    reused by the sizing probe and both self-join sides; the default
    localCheckpoint dies with an executor on a real cluster, so long
    jobs pass an HDFS/S3 dir to switch to reliable checkpoint() — the
    same option (and helper) connected_components has.

    Hot-bucket cap (the simhash_pairs mechanism, ops/dedup.py): when
    any (band_id, band_hash) bucket exceeds ``cap`` members, every
    oversized bucket is salted-split into ceil(size/cap) sub-buckets
    and pairs form only within a sub-bucket — bounding the self-join's
    per-bucket work at cap² however adversarial the corpus's collision
    density (random/unclustered vectors collide at a constant fraction
    of n² per band; real corpora cluster, but the bound must not
    depend on that). Each node still sees ~cap co-bucketed candidates
    per band — far more than the K=5 it keeps. A sizing probe skips
    the split machinery entirely when no bucket is oversized (the
    driver fixtures), where the plain join is provably identical; the
    SQL oracle replays sizes+salt unconditionally (n_sub=1 → sub=0 is
    an identity), so both branches hash-match it."""
    from map_reduce_lite_spark.ops.graph import _checkpointer

    ckpt = _checkpointer(emb, checkpoint_dir)
    planes = _hyperplanes(EMB_DIM, LSH_PLANES)
    bands = ckpt(
        emb.select(
            "vec_id",
            F.posexplode(lsh_band_hashes("embedding", planes, LSH_N_BANDS)).alias(
                "band_id", "band_hash"
            ),
        )
    )  # probe + both self-join sides reuse it
    max_bucket = (
        bands.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    if max_bucket is not None and max_bucket > cap:
        # bucket sizes: ≤ n_bands·2^bits rows however big the corpus
        sizes = bands.groupBy("band_id", "band_hash").agg(
            ((F.count(F.lit(1)) + F.lit(cap - 1)) / F.lit(cap))
            .cast("long")
            .alias("n_sub")
        )
        sp = bands.join(F.broadcast(sizes), ["band_id", "band_hash"]).withColumn(
            "sub",
            F.pmod(
                md5_60bit(
                    F.concat_ws(
                        "|",
                        F.lit("knb"),
                        F.col("band_id").cast("string"),
                        F.col("vec_id").cast("string"),
                    )
                ),
                F.col("n_sub"),
            ),
        )
    else:
        sp = bands.withColumn("sub", F.lit(0).cast("long"))
    # r12 (guide §2.3): generate ID-ORDERED pairs (vec_id <), score each
    # undirected pair ONCE, then emit both directions by exploding a
    # 2-struct array — half the rows through the dedup shuffle and half
    # the 64-dim cosines of the old directed (!=) form. cos(a,b) is
    # bit-identical under operand swap (elementwise IEEE multiply is
    # commutative, the fold order over i is unchanged, and so is
    # a_norm·b_norm), so every directed row carries exactly the value
    # the old plan computed for it.
    cand = _spread(
        sp.alias("a")
        .join(sp.alias("b"), ["band_id", "band_hash", "sub"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("src_id"), F.col("b.vec_id").alias("dst_id")
        )
        .dropDuplicates(["src_id", "dst_id"]),
        "src_id",
    )
    vecs_a = emb.select(
        F.col("vec_id").alias("src_id"),
        F.col("embedding").alias("a_vec"),
        _norm(F.col("embedding")).alias("a_norm"),
    )
    vecs_b = emb.select(
        F.col("vec_id").alias("dst_id"),
        F.col("embedding").alias("b_vec"),
        _norm(F.col("embedding")).alias("b_norm"),
    )
    half = (
        cand.join(vecs_a, "src_id")
        .join(vecs_b, "dst_id")
        .select(
            "src_id",
            "dst_id",
            (
                _dot(F.col("a_vec"), F.col("b_vec"))
                / (F.col("a_norm") * F.col("b_norm"))
            ).alias("sim"),
        )
    )
    return half.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src_id").alias("src_id"),
                    F.col("dst_id").alias("dst_id"),
                    F.col("sim").alias("sim"),
                ),
                F.struct(
                    F.col("dst_id").alias("src_id"),
                    F.col("src_id").alias("dst_id"),
                    F.col("sim").alias("sim"),
                ),
            )
        ).alias("ed")
    ).select("ed.src_id", "ed.dst_id", "ed.sim")


def _rescored_topk(emb: DataFrame, cand: DataFrame, k: int) -> DataFrame:
    """Exact-cosine rescore of an id-only candidate edge list, keeping
    each node's top-``k`` — the shared tail of the k-NN graph family."""
    vecs_a = emb.select(
        F.col("vec_id").alias("src_id"),
        F.col("embedding").alias("a_vec"),
        _norm(F.col("embedding")).alias("a_norm"),
    )
    vecs_b = emb.select(
        F.col("vec_id").alias("dst_id"),
        F.col("embedding").alias("b_vec"),
        _norm(F.col("embedding")).alias("b_norm"),
    )
    scored = (
        _spread(cand, "src_id")
        .join(vecs_a, "src_id")
        .join(vecs_b, "dst_id")
        .select(
            "src_id",
            "dst_id",
            (
                _dot(F.col("a_vec"), F.col("b_vec"))
                / (F.col("a_norm") * F.col("b_norm"))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("sim"), F.asc("dst_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "src_id",
            "dst_id",
            F.col("rank").cast("int").alias("rank"),
            F.floor(F.col("sim") * 1e9).cast("long").alias("sim_e9"),
        )
    )


def similarity_nn_descent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One NN-descent refinement round over the approximate k-NN graph:
    candidates = each node's current neighbors ∪ its
    neighbors-of-neighbors, rescored exactly, keeping the new top-K.
    This is the step that lifts LSH-blocked graph recall toward exact —
    two vectors missed by every band still meet through a shared
    neighbor (Dong et al., WWW'11). Because the candidate set is a
    superset of the current edges, every node's rank-r similarity is
    monotonically ≥ the input graph's (property-pinned in
    tests/test_similarity.py).

    Scale shape: the input graph is id-only rows with out-degree ≤ K,
    so the neighbor-of-neighbor self-join fans out ≤ K² per node —
    BOUNDED BY THE CONSTANT K, independent of corpus size or bucket
    skew (unlike the band join it refines, which needs hot-bucket
    caps). Join key is the 8-byte node id; vectors attach once per
    distinct surviving candidate; the per-node top-K is the same
    WindowGroupLimit-bounded rank window as the base graph."""
    emb = load_table(spark, sf_dir, "embeddings")
    return nn_descent_from_edges(emb, knn_topk_edges(emb))


def nn_descent_from_edges(
    emb: DataFrame, edges: DataFrame, k: int = KNN_GRAPH_K
) -> DataFrame:
    """NN-descent consumer over a PRE-BUILT k-NN edge list (the staged
    ``build_knn_edges`` artifact in production — its cost is then just
    this function's own tail: one K²-bounded self-join + rescore)."""
    base = edges.select("src_id", "dst_id").localCheckpoint(
        eager=False
    )  # reused by both sides of the NoN join
    non = (
        base.alias("e1")
        .join(base.alias("e2"), F.col("e1.dst_id") == F.col("e2.src_id"))
        .select(
            F.col("e1.src_id").alias("src_id"), F.col("e2.dst_id").alias("dst_id")
        )
        .filter(F.col("src_id") != F.col("dst_id"))
    )
    cand = base.union(non).dropDuplicates(["src_id", "dst_id"])
    return _rescored_topk(emb, cand, k)


def _knn_edges_cte(cap: int = KNN_BUCKET_CAP) -> str:
    """Shared WITH chain ending in ``ranked`` — the exact-cosine-scored,
    per-src ranked LSH band-collision edge list (SQL twin of
    ``_knn_scored_edges`` + the rank window). The hot-bucket salted
    split comes from ``sql_capped_bands_chain`` — the SAME generator
    the dedup-family oracles use (one cap implementation, zero drift
    if the mechanism changes again); its terminal ``bands`` CTE
    replays the split UNCONDITIONALLY: when no bucket exceeds ``cap``,
    n_sub = 1 and sub ≡ 0, an identity matching Spark's probe-skipped
    plain branch bit-for-bit."""
    planes = _hyperplanes(EMB_DIM, LSH_PLANES)
    return f"""
WITH {sql_capped_bands_chain(planes, LSH_N_BANDS, cap, "knb")}, cand AS (
  SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS dst_id
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.sub = b.sub
  WHERE a.vec_id <> b.vec_id
), scored AS (
  SELECT cand.src_id, cand.dst_id,
         {_sql_cos('ea.embedding', 'eb.embedding')} AS sim
  FROM cand
  JOIN embeddings ea ON ea.vec_id = cand.src_id
  JOIN embeddings eb ON eb.vec_id = cand.dst_id
), ranked AS (
  SELECT src_id, dst_id, sim,
         row_number() OVER (PARTITION BY src_id
                            ORDER BY sim DESC, dst_id ASC) AS rank
  FROM scored
)"""


def _knn_graph_sql() -> str:
    return (
        _knn_edges_cte()
        + f"""
SELECT src_id, dst_id, CAST(rank AS INT) AS rank,
       CAST(floor(sim * 1e9) AS BIGINT) AS sim_e9
FROM ranked WHERE rank <= {KNN_GRAPH_K}
"""
    )


def _nn_descent_sql() -> str:
    return (
        _knn_edges_cte()
        + f""", knn AS (
  SELECT src_id, dst_id FROM ranked WHERE rank <= {KNN_GRAPH_K}
), cand2 AS (
  SELECT src_id, dst_id FROM knn
  UNION
  SELECT e1.src_id, e2.dst_id
  FROM knn e1 JOIN knn e2 ON e1.dst_id = e2.src_id
  WHERE e1.src_id <> e2.dst_id
), scored2 AS (
  SELECT c.src_id, c.dst_id,
         {_sql_cos('ea.embedding', 'eb.embedding')} AS sim
  FROM cand2 c
  JOIN embeddings ea ON ea.vec_id = c.src_id
  JOIN embeddings eb ON eb.vec_id = c.dst_id
), ranked2 AS (
  SELECT src_id, dst_id, sim,
         row_number() OVER (PARTITION BY src_id
                            ORDER BY sim DESC, dst_id ASC) AS rank
  FROM scored2
)
SELECT src_id, dst_id, CAST(rank AS INT) AS rank,
       CAST(floor(sim * 1e9) AS BIGINT) AS sim_e9
FROM ranked2 WHERE rank <= {KNN_GRAPH_K}
"""
    )


def similarity_graph_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree histogram of the approximate k-NN graph: for each
    in-degree d, how many vectors are the chosen neighbor of exactly d
    others — including d=0. High-dimensional spaces concentrate
    neighbor lists onto HUB vectors while ANTI-HUBS (in-degree 0)
    vanish from every list (Radovanović et al., JMLR'10); a fat hub
    tail means graph-based dedup/retrieval over-weights a few vectors
    and the d=0 mass is unreachable by graph traversal — the QA
    histogram to check before trusting NN-descent or graph-ANN serving.

    Scale shape: consumes the capped k-NN edge list (out-degree ≤ K by
    construction, hot buckets salt-split), aggregates the 8-byte dst
    ids (map-side combined, state ≤ corpus), one id-only left join to
    restore zero-in-degree vectors, and a ≤(max-degree+1)-row final
    histogram. Integers end-to-end."""
    emb = load_table(spark, sf_dir, "embeddings")
    return hubness_from_edges(emb, knn_topk_edges(emb))


def hubness_from_edges(emb: DataFrame, edges: DataFrame) -> DataFrame:
    """In-degree histogram consumer over a PRE-BUILT k-NN edge list
    (staged-artifact production path; the registered query's measured
    1.16 scaling exponent was the inline edge-list rebuild — this
    function's own tail is two cheap aggregations + one id-only join)."""
    indeg = (
        edges.select("dst_id")
        .groupBy("dst_id")
        .agg(F.count(F.lit(1)).alias("in_degree"))
    )
    per_node = (
        emb.select("vec_id")
        .join(indeg, emb.vec_id == indeg.dst_id, "left")
        .select(F.coalesce(F.col("in_degree"), F.lit(0)).alias("in_degree"))
    )
    return per_node.groupBy("in_degree").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


def _graph_hubness_sql() -> str:
    return (
        _knn_edges_cte()
        + f""", knn AS (
  SELECT dst_id FROM ranked WHERE rank <= {KNN_GRAPH_K}
), indeg AS (
  SELECT dst_id, COUNT(*) AS in_degree FROM knn GROUP BY dst_id
), per_node AS (
  SELECT COALESCE(i.in_degree, 0) AS in_degree
  FROM embeddings e LEFT JOIN indeg i ON i.dst_id = e.vec_id
)
SELECT in_degree, COUNT(*) AS n_nodes
FROM per_node GROUP BY in_degree
"""
    )


def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # EMB_DIM is pinned by the oracle's plane literals — probing the data
    # for it (`.first()`) would cost a whole Spark job per query build
    dim = EMB_DIM
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    # 16 planes / 4 bands of 4 bits: ~0.23 false-positive candidate rate
    # for orthogonal pairs, high recall for cosine ≥ 0.3 neighbors
    return ann_lsh_topk(emb, queries, dim, n_planes=LSH_PLANES, n_bands=LSH_N_BANDS)


def sql_capped_bands_chain(
    planes: list[list[float]], n_bands: int, cap: int, salt_prefix: str
) -> str:
    """CTE chain (to place right after WITH) ending in ``bands`` with
    columns (vec_id, band_id, band_hash, sub) — the hot-bucket-capped
    band table. The salted split is replayed UNCONDITIONALLY: when no
    bucket exceeds ``cap``, n_sub = 1 and sub ≡ 0, an identity matching
    the Spark side's probe-skipped plain branch bit-for-bit. Consumers
    must add ``a.sub = b.sub`` to their self-join condition."""
    salt = sql_md5_60bit(
        f"'{salt_prefix}|' || CAST(b.band_id AS VARCHAR) || '|' "
        "|| CAST(b.vec_id AS VARCHAR)"
    )
    return f"""rawbands AS (
{sql_bands_cte(planes, n_bands)}
), bsizes AS (
  SELECT band_id, band_hash, (COUNT(*) + {cap - 1}) // {cap} AS n_sub
  FROM rawbands GROUP BY 1, 2
), bands AS (
  SELECT b.vec_id, b.band_id, b.band_hash, ({salt} % s.n_sub) AS sub
  FROM rawbands b JOIN bsizes s
    ON s.band_id = b.band_id AND s.band_hash = b.band_hash
)"""


def sql_refined_cands_chain(
    planes: list[list[float]], rplanes: list[list[float]], n_bands: int, cap: int
) -> str:
    """CTE chain (to place right after WITH) ending in ``cands`` with
    columns (keep_id, dup_id) — the ADAPTIVE-RE-BANDING candidate set,
    the SQL twin of ``embedding_near_dup_pairs(method="lsh_refine")``.

    Three branches, replayed UNCONDITIONALLY (when no bucket exceeds
    ``cap`` branches 2–3 are empty and branch 1 is the plain band
    all-pairs — the identity matching Spark's probe-skipped branch):

    1. buckets ≤ cap: exact all-pairs within (band_id, band_hash);
    2. oversized buckets: members re-hashed with that band's 16
       refinement planes; sub-buckets ≤ cap get exact all-pairs within
       (band_id, band_hash, rh) — recall-preserving refinement, no
       pair silently dropped by a salt;
    3. sub-buckets STILL > cap (possible only when members agree on
       all band + refinement planes, i.e. a near-constant core): a
       star to the min-id member — (sub-bucket size − 1) candidates
       instead of size², preserving the verified graph's connectivity
       (every member links to the representative, and a near-constant
       core verifies against any of its members iff it verifies
       against the representative, up to the threshold boundary);
    4. a BUCKET-WIDE anchor star: every member of an oversized bucket
       also pairs with the bucket's min-id member regardless of
       refine sub-bucket — the boundary-regime catch for members that
       are genuine near-dups of the bucket's dominant direction but
       disagree with its refinement planes (they land in singleton
       sub-buckets and branches 2-3 alone would give them no candidate
       in this band). Linear cost, replayed identically by the Spark
       path (_refined_candidate_ids branch 4).
    """
    rh_exprs = sql_band_hashes("embedding", rplanes, n_bands)
    refh = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {b} AS band_id, {h} AS rh FROM embeddings"
        for b, h in enumerate(rh_exprs)
    )
    return f"""rawbands AS (
{sql_bands_cte(planes, n_bands)}
), bsizes AS (
  SELECT band_id, band_hash, COUNT(*) AS n
  FROM rawbands GROUP BY 1, 2
), refh AS (
{refh}
), rb AS (
  SELECT b.vec_id, b.band_id, b.band_hash, s.n, r.rh
  FROM rawbands b
  JOIN bsizes s ON s.band_id = b.band_id AND s.band_hash = b.band_hash
  JOIN refh r ON r.vec_id = b.vec_id AND r.band_id = b.band_id
), subsizes AS (
  SELECT band_id, band_hash, rh, COUNT(*) AS m
  FROM rb WHERE n > {cap} GROUP BY 1, 2, 3
), cands AS (
  SELECT a.vec_id AS keep_id, b.vec_id AS dup_id
  FROM rb a JOIN rb b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
  WHERE a.n <= {cap} AND a.vec_id < b.vec_id
  UNION
  SELECT a.vec_id AS keep_id, b.vec_id AS dup_id
  FROM rb a
  JOIN rb b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
           AND a.rh = b.rh
  JOIN subsizes s ON s.band_id = a.band_id AND s.band_hash = a.band_hash
                 AND s.rh = a.rh
  WHERE a.n > {cap} AND s.m <= {cap} AND a.vec_id < b.vec_id
  UNION
  SELECT r.rep AS keep_id, m.vec_id AS dup_id
  FROM rb m
  JOIN (SELECT band_id, band_hash, rh, MIN(vec_id) AS rep
        FROM rb WHERE n > {cap} GROUP BY 1, 2, 3) r
    ON r.band_id = m.band_id AND r.band_hash = m.band_hash
   AND r.rh = m.rh
  JOIN subsizes s ON s.band_id = m.band_id AND s.band_hash = m.band_hash
                 AND s.rh = m.rh
  WHERE m.n > {cap} AND s.m > {cap} AND m.vec_id <> r.rep
  UNION
  SELECT a.rep AS keep_id, m.vec_id AS dup_id
  FROM rb m
  JOIN (SELECT band_id, band_hash, MIN(vec_id) AS rep
        FROM rb WHERE n > {cap} GROUP BY 1, 2) a
    ON a.band_id = m.band_id AND a.band_hash = m.band_hash
  WHERE m.n > {cap} AND m.vec_id <> a.rep
)"""


def sql_refine_coverage_cte(cap: int) -> str:
    """CTE pair ``coverage`` / ``approx_only`` — the SQL twin of
    ``dedup.refine_star_only_ids``. MUST be appended after
    ``sql_refined_cands_chain`` in the same WITH clause: it reads that
    chain's ``rb`` (vec_id, band_id, band_hash, n, rh) and ``subsizes``
    CTEs. A vec has EXACT coverage in a band iff its bucket fit under
    ``cap`` or its refine sub-bucket did; ``approx_only`` is the vecs
    with exact coverage in NO band — reachable in the candidate graph
    only via the star/anchor branches. Empty whenever no bucket is
    oversized (the Spark side's probe-skipped case)."""
    return f"""coverage AS (
  SELECT r.vec_id,
         MAX(CASE WHEN r.n <= {cap} THEN 1
                  WHEN s.m IS NOT NULL AND s.m <= {cap} THEN 1
                  ELSE 0 END) AS exact_cov
  FROM rb r
  LEFT JOIN subsizes s ON s.band_id = r.band_id AND s.band_hash = r.band_hash
                      AND s.rh = r.rh
  GROUP BY r.vec_id
), approx_only AS (
  SELECT vec_id FROM coverage WHERE exact_cov = 0
)"""


def sql_bands_cte(planes: list[list[float]], n_bands: int) -> str:
    """UNION-ALL body producing (vec_id, band_id, band_hash) — the SQL
    twin of posexplode(lsh_band_hashes(...)). Plane literals round-trip
    through repr so every sign bit is bit-identical to the Spark plan."""
    hashes = sql_band_hashes("embedding", planes, n_bands)
    return "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {b} AS band_id, {h} AS band_hash FROM embeddings"
        for b, h in enumerate(hashes)
    )


def _similarity_lsh_sql() -> str:
    planes = _hyperplanes(EMB_DIM, LSH_PLANES)
    return f"""
WITH bands AS (
{sql_bands_cte(planes, LSH_N_BANDS)}
), cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bands q JOIN bands c
    ON q.band_id = c.band_id AND q.band_hash = c.band_hash
  WHERE q.vec_id < {N_QUERY_VECS} AND c.vec_id <> q.vec_id
), scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         {_sql_cos('eq.embedding', 'ec.embedding')} AS sim
  FROM cand
  JOIN embeddings eq ON eq.vec_id = cand.query_id
  JOIN embeddings ec ON ec.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       CAST(floor(sim * 1e9) AS BIGINT) AS sim_e9
FROM (SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM scored)
WHERE rank <= {TOP_K}
"""


# (assigned below, after the band-hash SQL helpers are defined)


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN
# --------------------------------------------------------------------------

CENTROID_STRIDE = 32  # every stride-th corpus vector is a coarse centroid
N_PROBE = 4  # centroid lists each query probes


def _sql_dot(a: str, b: str) -> str:
    """DuckDB dot product, bit-identical to Spark's left-to-right
    ``aggregate`` fold.

    Uses native ``list_dot_product`` (a sequential C loop — verified
    element-order-identical to the ``list_sum . list_transform .
    list_zip`` fold across every consecutive pair at sf0.1) rather than
    the zip/transform construction: the zip form materializes a struct
    list PER ROW, and on a 32-thread DuckDB the per-thread allocator
    churn from the pair-join cosine oracles fragments glibc into tens
    of thousands of memory mappings — measured 65k maps ( ==
    vm.max_map_count) during pipeline_semdedup_prune's oracle, after
    which EVERY allocation in the process fails ("Failed to allocate
    block of 16384 bytes" with >100 GB free). The native function does
    zero intermediate allocation. Inputs are cast to DOUBLE[] so the
    accumulation is double-precision even for FLOAT[] embeddings."""
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def _sql_cos(a: str, b: str) -> str:
    """DuckDB cosine matching ``cosine()`` bit-for-bit (same fold order)."""
    return f"{_sql_dot(a, b)} / (sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)}))"


def _sql_array_lit(vals: list[float]) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vals) + "]::DOUBLE[]"


def _sql_plane_bit(vec_expr: str, plane: list[float]) -> str:
    """SQL twin of ``_plane_bit``: same plane literals (repr round-trips
    doubles exactly), same fold order → identical sign bit."""
    dot = (
        f"list_dot_product(CAST({vec_expr} AS DOUBLE[]), {_sql_array_lit(plane)})"
    )
    return f"(CASE WHEN {dot} > 0 THEN 1 ELSE 0 END)"


def sql_band_hashes(vec_expr: str, planes: list[list[float]], n_bands: int) -> list[str]:
    """SQL twin of ``lsh_band_hashes``: one expression per band, bit-packed
    with the same h = h*2 + bit arithmetic."""
    bits = [_sql_plane_bit(vec_expr, p) for p in planes]
    per_band = max(1, len(planes) // n_bands)
    out = []
    for b in range(n_bands):
        chunk = bits[b * per_band : (b + 1) * per_band]
        if not chunk:
            break
        h = chunk[0]
        for bit in chunk[1:]:
            h = f"({h} * 2 + {bit})"
        out.append(h)
    return out


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    stride: int = CENTROID_STRIDE,
    n_probe: int = N_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    Every ``stride``-th corpus vector serves as a centroid (a
    deterministic stand-in for offline k-means — the operator's plan is
    identical whatever trained the centroid set). Each corpus vector is
    assigned to its nearest centroid; a query probes only its ``n_probe``
    nearest centroids' lists, so the fine cosine pass touches ~n_probe/C
    of the corpus instead of all of it.

    Scale shape (100 TB): centroids are tiny → broadcast; assignment is
    ONE narrow pass with a map-side-combined ``max_by`` (shuffle carries
    one (id, cid) row per vector, no ×C blowup); at ingest the corpus is
    written partitioned by cid, so probing is partition pruning, not a
    join. No driver loops, no Python — every FLOP is codegen'd
    zip_with/aggregate.

    ``stride`` MUST scale with the corpus: with a fixed stride the
    centroid count C = n/stride grows linearly and the assignment pass
    costs n·C = n²/stride — the r6 scale-stress measured exponent 1.49
    (superlinear) at the demo default. The standard IVF sizing is
    C ≈ sqrt(n), i.e. ``stride ≈ sqrt(n)``, which balances assignment
    (n·C) against probe width (n·n_probe/C) and restores sub-linear
    measured scaling (SCALE.md r6: 8× faster at 60k vectors, exponent
    0.40). The module default stays the oracle-pinned demo constant;
    callers at scale pass ``stride=int(sqrt(n))``."""
    cent = corpus.filter((F.col(id_col) % stride) == 0).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cent_vec"),
        _norm(F.col(vec_col)).alias("cent_norm"),
    )
    # norms once per side (same expression tree as the oracle → bit-identical)
    csim = _dot(F.col("c_vec"), F.col("cent_vec")) / (F.col("c_norm") * F.col("cent_norm"))
    assign = (
        _spread(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("c_vec"),
                _norm(F.col(vec_col)).alias("c_norm"),
            ),
            "neighbor_id",
        )
        .crossJoin(F.broadcast(cent))
        .select("neighbor_id", "c_vec", "c_norm", "cid", csim.alias("csim"))
        .groupBy("neighbor_id")
        .agg(
            # argmax over (csim, -cid): nearest centroid, smaller cid on ties
            F.max_by("cid", F.struct(F.col("csim"), (-F.col("cid")).alias("ncid"))).alias("cid"),
            F.any_value("c_vec").alias("c_vec"),
            F.any_value("c_norm").alias("c_norm"),
        )
    )
    assign = _spread(assign, "cid")
    qsim = _dot(F.col("q_vec"), F.col("cent_vec")) / (F.col("q_norm") * F.col("cent_norm"))
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            _norm(F.col(vec_col)).alias("q_norm"),
        )
        .crossJoin(F.broadcast(cent))
        .select("query_id", "q_vec", "q_norm", "cid", qsim.alias("csim"))
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cid"))
    probes = (
        probes.withColumn("prn", F.row_number().over(wp))
        .filter(F.col("prn") <= n_probe)
        .select("query_id", "q_vec", "q_norm", "cid")
    )
    scored = (
        assign.join(F.broadcast(probes), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.floor(F.col("sim") * 1e9).cast("long").alias("sim_e9"),
        )
    )


def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return ann_ivf_topk(emb, queries)


def similarity_ann_ivf_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the PRODUCTION sizing rule executed, not just
    documented: stride = floor(sqrt(n)) so the centroid count C ≈ √n —
    assignment (n·C) balances probe width (n·n_probe/C) and measured
    scaling stays sub-linear (SCALE.md r6: exponent 0.40 vs 1.49 at
    the fixed demo stride). The corpus count is one scalar job
    (floor(sqrt(n)) is bit-identical in DuckDB, so the oracle replays
    the sizing from its own COUNT(*))."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    stride = int(math.floor(math.sqrt(emb.count())))
    return ann_ivf_topk(emb, queries, stride=stride)


def _ivf_sql(stride_expr: str = str(CENTROID_STRIDE)) -> str:
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cent_vec
  FROM embeddings WHERE vec_id % ({stride_expr}) = 0
), assign_scored AS (
  SELECT e.vec_id AS neighbor_id, e.embedding AS c_vec, c.cid,
         {_sql_cos('e.embedding', 'c.cent_vec')} AS csim
  FROM embeddings e CROSS JOIN cent c
), assign AS (
  SELECT neighbor_id, c_vec, cid FROM (
    SELECT neighbor_id, c_vec, cid,
           row_number() OVER (PARTITION BY neighbor_id
                              ORDER BY csim DESC, cid ASC) AS rn
    FROM assign_scored) WHERE rn = 1
), probe_scored AS (
  SELECT q.vec_id AS query_id, q.embedding AS q_vec, c.cid,
         {_sql_cos('q.embedding', 'c.cent_vec')} AS csim
  FROM embeddings q CROSS JOIN cent c
  WHERE q.vec_id < {N_QUERY_VECS}
), probes AS (
  SELECT query_id, q_vec, cid FROM (
    SELECT query_id, q_vec, cid,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY csim DESC, cid ASC) AS rn
    FROM probe_scored) WHERE rn <= {N_PROBE}
), scored AS (
  SELECT p.query_id, a.neighbor_id,
         {_sql_cos('p.q_vec', 'a.c_vec')} AS sim
  FROM assign a JOIN probes p USING (cid)
  WHERE a.neighbor_id <> p.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       CAST(floor(sim * 1e9) AS BIGINT) AS sim_e9
FROM (SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM scored)
WHERE rank <= {TOP_K}
"""


SIMILARITY_IVF_SQL = _ivf_sql()
SIMILARITY_IVF_SCALED_SQL = _ivf_sql(
    "SELECT CAST(floor(sqrt(COUNT(*))) AS BIGINT) FROM embeddings"
)


SIMILARITY_LSH_SQL = _similarity_lsh_sql()


OOD_CODEBOOK_K = 32  # fixed-size random codebook — constant at any corpus size


def embedding_ood_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector out-of-distribution score: max cosine against a fixed
    32-vector random codebook (the K corpus vectors with the smallest
    salted portable hash). A vector far from EVERY codebook direction
    is an outlier candidate — the cheap first-pass OOD/garbage filter a
    curation pipeline runs before expensive per-cluster analysis
    (low maxsim → manual-review queue or drop).

    Scale shape: the codebook is K=OOD_CODEBOOK_K rows BY CONSTRUCTION
    — a TakeOrdered over the salted hash, constant size at any corpus
    scale (unlike stride-based centroids, which grow with n) — so the
    broadcast is genuinely bounded and the scoring pass is one
    embarrassingly-parallel corpus scan (N×K FLOPs, no shuffle except
    the K-row broadcast). Deterministic: hash-selected codebook, exact
    per-row max over K doubles (no accumulation-order hazard), argmax
    tie → smallest centroid id, score exposed floor-scaled to e9."""
    emb = load_table(spark, sf_dir, "embeddings")
    h = md5_60bit(F.concat(F.lit("oodcb:"), F.col("vec_id").cast("string")))
    cb = (
        emb.select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("c_vec"),
            _norm(F.col("embedding")).alias("c_norm"),
            h.alias("h"),
        )
        .orderBy("h", "cent_id")
        .limit(OOD_CODEBOOK_K)
        .drop("h")
    )
    e = _spread(
        emb.select("vec_id", "embedding", _norm(F.col("embedding")).alias("e_norm")),
        "vec_id",
    )
    scored = (
        e.crossJoin(F.broadcast(cb))
        .filter(F.col("vec_id") != F.col("cent_id"))
        .select(
            "vec_id",
            "cent_id",
            (
                _dot(F.col("embedding"), F.col("c_vec"))
                / (F.col("e_norm") * F.col("c_norm"))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cent_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "vec_id",
            F.col("cent_id").alias("best_centroid"),
            F.floor(F.col("sim") * 1e9).cast("long").alias("maxsim_e9"),
        )
    )


def _ood_score_sql() -> str:
    salted = sql_md5_60bit("'oodcb:' || CAST(vec_id AS VARCHAR)")
    return f"""
WITH cb AS (
  SELECT vec_id AS cent_id, embedding AS c_vec
  FROM embeddings
  ORDER BY {salted}, vec_id
  LIMIT {OOD_CODEBOOK_K}
), scored AS (
  SELECT e.vec_id, cb.cent_id,
         {_sql_cos('e.embedding', 'cb.c_vec')} AS sim
  FROM embeddings e CROSS JOIN cb
  WHERE e.vec_id <> cb.cent_id
), best AS (
  SELECT vec_id, cent_id, sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, cent_id ASC) AS rk
  FROM scored
)
SELECT vec_id, cent_id AS best_centroid,
       CAST(floor(sim * 1e9) AS BIGINT) AS maxsim_e9
FROM best WHERE rk = 1
"""


SIMILARITY_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query(
            "similarity_bruteforce",
            similarity_bruteforce,
            SIMILARITY_BRUTE_SQL,
            "exact cosine top-k (baseline)",
        ),
        # LSH banding IS portable SQL here: the oracle embeds the same
        # hyperplane literals and bit-packing arithmetic (sql_bands_cte),
        # so even the approximate path is value-checked; recall vs brute
        # force is additionally property-tested in pytest.
        Query(
            "similarity_ann_lsh",
            similarity_ann_lsh,
            SIMILARITY_LSH_SQL,
            "LSH-bucketed ANN top-k",
        ),
        Query(
            "similarity_knn_graph",
            similarity_knn_graph,
            _knn_graph_sql(),
            "corpus-wide approximate k-NN graph over LSH band collisions",
        ),
        Query(
            "similarity_graph_hubness",
            similarity_graph_hubness,
            _graph_hubness_sql(),
            "in-degree histogram (hub/anti-hub audit) of the k-NN graph",
        ),
        Query(
            "similarity_nn_descent",
            similarity_nn_descent,
            _nn_descent_sql(),
            "one NN-descent round: neighbor-of-neighbor expansion of the k-NN graph",
        ),
        Query(
            "embedding_ood_score",
            embedding_ood_score,
            _ood_score_sql(),
            "max-cosine OOD score against a fixed 32-vector random codebook",
        ),
        Query(
            "similarity_ann_ivf",
            similarity_ann_ivf,
            SIMILARITY_IVF_SQL,
            "IVF coarse-quantized ANN top-k",
        ),
        Query(
            "similarity_ann_ivf_scaled",
            similarity_ann_ivf_scaled,
            SIMILARITY_IVF_SCALED_SQL,
            "IVF with production sizing: stride = floor(sqrt(n)) so C ≈ √n",
        ),
        Query(
            "similarity_hard_negatives",
            similarity_hard_negatives,
            SIMILARITY_HARD_NEG_SQL,
            "hard-negative mining: top-k nearest vectors with a different label",
        ),
        Query(
            "similarity_filtered_topk",
            similarity_filtered_topk,
            _filtered_topk_sql(),
            "metadata-filtered vector search: quality predicate before the FLOPs",
        ),
    ]
}
