"""Iterative graph operators: connected components and PageRank.

Near-dup detection emits PAIRS; deduplication needs CLUSTERS (keep one
document per connected component of the similarity graph). Min-label
propagation computes them: every node repeatedly adopts the smallest
label among itself and its neighbors until fixpoint — label = the
component's minimum node id, a deterministic canonical representative.

Scale shape: each iteration is one join + one aggregation, both
shuffling on node id (the partitioning is reused across iterations);
iterations needed = graph diameter, and near-dup graphs are shallow
(clusters are cliques-ish). The driver loop only checks a converged
COUNT per iteration — no data ever collects. Lineage is truncated with
localCheckpoint every few rounds so plans don't grow unboundedly.
GraphFrames/Pregel is the off-the-shelf alternative; this formulation
needs nothing beyond DataFrames. The DuckDB oracle replays the result
with a recursive transitive-closure CTE — feasible because component
labels (min reachable id) are iteration-order independent.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window, functions as F


def _checkpointer(
    df_sample: DataFrame, checkpoint_dir: str | None
) -> Callable[[DataFrame], DataFrame]:
    """Lineage-truncation strategy for iterative loops.

    ``localCheckpoint`` (default) materializes to executor block storage
    — fast, but NON-RESILIENT: on a real cluster losing one executor
    mid-loop kills the job because truncated lineage can't be recomputed.
    Passing ``checkpoint_dir`` (an HDFS/S3 path in production) switches
    to reliable ``checkpoint()`` — the 100×-scale answer for long
    iterative jobs where executor loss is routine.

    ``eager=False`` marks the frame for truncation WITHOUT spending a
    job on it — the very next action that touches it (e.g. the loop's
    convergence count) materializes and truncates as a side effect.
    One job per round instead of two: driver-side per-action overhead
    is the dominant cost of iterative ops on small state (the r10
    dedup_cluster_sizes attribution — per-action cost varies ~4× with
    JVM C2 warmth, so halving actions halves the cold-driver tax)."""
    if checkpoint_dir is None:
        return lambda df, eager=True: df.localCheckpoint(eager=eager)
    sc = df_sample.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return lambda df, eager=True: df.checkpoint(eager=eager)


class _HardBarrier:
    """Parquet write+read lineage barrier for iterative loops, with a
    leak-free lifecycle (r10 — previously every ``connected_components``
    call mkdtemp'd a directory even when the barrier never fired, and
    barrier files were never deleted, accumulating across a 176-query
    bench and any long-lived driver):

    - the barrier directory is created LAZILY on the first actual
      barrier write — the common converge-in-<8-rounds call touches
      the filesystem zero times;
    - each barrier write deletes the PREVIOUS barrier file (safe: the
      new parquet fully materializes the state before the delete, and
      the only frames alive across rounds are the checkpointed inputs
      and the new file's scan);
    - ``finalize`` re-materializes the final frame off the last file
      (via the caller's checkpointer, so a reliable-``checkpoint``
      caller keeps cluster resilience) and then removes the whole
      barrier directory; ``abort`` removes it on the error path.

    Deletion goes through the Hadoop FileSystem API so a production
    ``checkpoint_dir`` on HDFS/S3 cleans up the same way a local temp
    dir does (Python's shutil can't reach scheme'd paths)."""

    def __init__(self, spark, checkpoint_dir: str | None, prefix: str):
        self._spark = spark
        self._checkpoint_dir = checkpoint_dir
        self._prefix = prefix
        self._root: str | None = None
        self._last_path: str | None = None

    def _ensure_root(self) -> str:
        if self._root is None:
            import uuid

            ns = uuid.uuid4().hex  # concurrent callers must not collide
            if self._checkpoint_dir is not None:
                self._root = f"{self._checkpoint_dir.rstrip('/')}/{self._prefix}_{ns}"
            else:
                import tempfile

                self._root = tempfile.mkdtemp(prefix=f"{self._prefix}_")
        return self._root

    def _rm(self, path: str) -> None:
        # best-effort: never fail the query over cleanup
        try:
            jvm = self._spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(path)
            fs = hpath.getFileSystem(
                self._spark._jsc.hadoopConfiguration()
            )
            fs.delete(hpath, True)
        except Exception:
            pass

    def barrier(self, df: DataFrame, tag: str) -> DataFrame:
        """Write ``df`` to parquet, return a fresh scan of it, and drop
        the previous barrier file."""
        path = f"{self._ensure_root()}/{tag}"
        df.write.mode("overwrite").parquet(path)
        out = df.sparkSession.read.parquet(path)
        if self._last_path is not None:
            self._rm(self._last_path)
        self._last_path = path
        return out

    def finalize(
        self, df: DataFrame, ckpt: Callable[[DataFrame], DataFrame]
    ) -> DataFrame:
        """Detach ``df`` from the last barrier file (if any barrier ever
        fired) and remove all barrier storage. If the detaching
        materialization itself fails, the barrier subtree is still
        removed before the exception propagates — the frame is dead
        either way, and the error path must not reintroduce the
        accumulation leak this class exists to prevent."""
        if self._root is None:
            return df  # barrier never fired: nothing on disk
        try:
            df = ckpt(df)  # eager: materializes off the parquet scan
        except BaseException:
            self.abort()
            raise
        self._rm(self._root)
        self._root = None
        self._last_path = None
        return df

    def abort(self) -> None:
        """Error-path cleanup: remove barrier storage unconditionally."""
        if self._root is not None:
            self._rm(self._root)
            self._root = None
            self._last_path = None


# Star rounds folded into one convergence action. 2 was prototyped
# (the r12 verdict's round-batching ask) and MEASURED SLOWER at sf0.1:
# halving the action count saves ~0.1-0.2 s/action, but batch-of-2
# parity overshoots convergence by up to 2 rounds and the confirm
# round adds one more (observed 5 → 7 rounds; interleaved A/B old vs
# batched: the extra rounds' exchanges cost more than the saved
# actions on every clean draw). Kept parameterized; 1 = check every
# round, the round-count-minimal protocol.
CC_ROUNDS_PER_CHECK = 1


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_every: int = 1,
    checkpoint_dir: str | None = None,
    hard_barrier_every: int = 8,
    rounds_per_check: int = CC_ROUNDS_PER_CHECK,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    node id reachable. Undirected: both directions are considered.

    ALTERNATING STAR ALGORITHM (r12 — replacing r7's pointer-jumping
    label loop after the adversarial-topology campaign falsified its
    round bound): each round applies large-star then small-star edge
    rewrites (Kiveris et al., "Connected Components in MapReduce and
    Beyond" — public algorithm), iterating until the edge set is a
    fixed star forest whose roots are the component minima.

    - large-star: per node u with neighborhood N(u), connect every
      STRICTLY LARGER neighbor to m = min(N(u) ∪ {u});
    - small-star: per node u (over the now big→small oriented edges),
      connect every smaller neighbor AND u itself to m.

    Why the old loop had to go, with measurements: min-label
    propagation + one label-of-label jump per round only achieves
    log-rounds when node ids correlate with topology (an ORDERED
    3000-path: 14 rounds). When ids are random relative to structure —
    the normal case for hashed doc/vec ids at 100 TB — the regional-min
    nodes hold SELF-pointers, the jump never shortcuts past them, and
    convergence is O(diameter): measured 474-903 rounds on id-SHUFFLED
    3000-paths and 218 rounds on a 30k-node arithmetic thread graph
    (diameter 252), where the old max_iter=25 silently returned
    un-converged — i.e. WRONG — components. The alternating algorithm
    is id-placement independent: 9-13 rounds on every one of those
    shapes (and provably O(log² n) worst case), pinned by the
    shuffled-path test in tests/test_r12_ops.py. Per-round cost is the
    same shuffle class as before — two small aggregations and two
    joins over the CURRENT edge set, which only shrinks — and the
    round-count guarantee is what survives a 100 TB pair graph.

    Non-convergence within ``max_iter`` now RAISES instead of
    returning partial labels (the silent-cliff fix); with the
    alternating bound, 50 rounds covers graphs astronomically larger
    than any real corpus.

    CHECKPOINT EVERY ROUND (checkpoint_every=1, r7): the convergence
    check is an action, so each round's edge set is materialized —
    otherwise every round re-executes the whole chain. HARD PARQUET
    BARRIER every ``hard_barrier_every`` rounds (r9): localCheckpoint
    truncates the visible plan but a generation-linked driver-side
    cost still leaks through checkpoint boundaries in Spark 4.1 when
    the checkpointed frame feeds multiple self-join references
    (measured: per-round wall time doubling from ~round 18, 0.4 s →
    70 s, with the Spark jobs themselves at ~45 ms); a parquet
    write+read every 8 rounds gives a truly fresh scan lineage and
    flat per-round cost. Barrier files go under ``checkpoint_dir``
    when given (shared-FS on a real cluster), else a driver-temp dir;
    lifecycle is ``_HardBarrier``'s.

    SINGLE UPSTREAM EXECUTION (r12 optimization): the caller's edge
    plan (for the dedup family: the whole LSH band join + cosine
    verify) is materialized ONCE into ``base`` and both the node
    universe and the working edge set derive from that checkpoint.
    The previous entry materialized ``nodes`` and ``e`` separately
    straight off ``edges`` — and because Spark does not de-duplicate
    common subtrees across a union's branches, the union inside
    ``nodes`` executed the pair plan TWICE and ``e`` a third time
    (measured: ~2-6 s per execution warm at sf0.1, the dominant cost
    of every components consumer; guide §2.4/§5)."""
    # reset the diagnostic at entry so a call that fails before its
    # first round can't leave a previous call's stale value behind
    connected_components.last_rounds = 0
    hb = _HardBarrier(edges.sparkSession, checkpoint_dir, "mrl_cc_barrier")
    ckpt = _checkpointer(edges, checkpoint_dir)
    # ONE execution of the upstream plan; 16-byte rows (ids only).
    # eager=False (r13): the loop's initial fingerprint action
    # materializes base AND e in one job instead of paying a separate
    # up-front job for base (guide §1.2 — fewer driver actions; the
    # only pre-loop consumer of base is e, and nodes is consumed by the
    # final labeling join, long after the loop materialized base).
    base = ckpt(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b")), eager=False
    )
    # node universe BEFORE dropping self-loops: a node with only a
    # self-loop edge still belongs in the output (component = itself).
    # Lazy: consumed once by the final labeling join, off the checkpoint.
    nodes = (
        base.select(F.col("a").alias("node"))
        .union(base.select(F.col("b").alias("node")))
        .distinct()
    )
    # lazy mark: the loop's first convergence action materializes it
    e = ckpt(base.filter(F.col("a") != F.col("b")).distinct(), eager=False)
    try:
        stars = _cc_loop(
            e, ckpt, hb, max_iter, checkpoint_every, hard_barrier_every,
            rounds_per_check,
        )
    except BaseException:
        hb.abort()
        raise
    stars = hb.finalize(stars, ckpt)
    # star forest -> labels; roots and isolated nodes label themselves.
    # min() is defensive: at the checked fixpoint each child has one root
    comp = stars.groupBy(F.col("a").alias("node")).agg(
        F.min("b").alias("component")
    )
    return nodes.join(comp, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def _cc_one_round(e: DataFrame) -> DataFrame:
    """One alternating-star round: small_star(large_star(e)).

    r12 shape (guide §2.3/§2.4 — same edge-set trajectory, fewer
    exchanges): both stars' per-node minima come from a WINDOW over the
    edge rows (one exchange each) instead of a groupBy + join back (two
    each); the two directions of ``adj`` and the two small-star outputs
    are produced by exploding a 1-2 element array per row (one scan,
    not a self-union's two); the intermediate large-star ``distinct``
    is gone (duplicates cannot change a min; the small-star output is
    distinct'd anyway). 3 edge-set exchanges per round (large window,
    small window, small distinct)."""
    two_dirs = F.array(
        F.struct(F.col("a").alias("a"), F.col("b").alias("b")),
        F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
    )
    w_a = Window.partitionBy("a")
    # ---- large-star: bigger neighbors attach to the local min ----
    adj = e.select(F.explode(two_dirs).alias("ed")).select("ed.a", "ed.b")
    large = (
        adj.withColumn("m", F.least(F.min("b").over(w_a), F.col("a")))
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    # large-star edges satisfy a > b (m <= u < v), so they are
    # already in the big->small orientation small-star wants
    return (
        large.withColumn("m", F.min("b").over(w_a))
        .select(
            F.explode(
                F.when(
                    F.col("b") != F.col("m"),
                    F.array(
                        F.struct(F.col("b").alias("a"), F.col("m").alias("b")),
                        F.struct(F.col("a").alias("a"), F.col("m").alias("b")),
                    ),
                ).otherwise(
                    F.array(
                        F.struct(F.col("a").alias("a"), F.col("m").alias("b"))
                    )
                )
            ).alias("ed")
        )
        .select("ed.a", "ed.b")
        .distinct()
    )


# Dual-fingerprint set certificate: exact count + two independent
# bit_xor(xxhash64) digests (the second keyed with an extra literal, a
# different 64-bit hash of the same row). Equal sets ⇒ equal
# certificates with certainty; different sets collide only if BOTH
# 64-bit xors collide simultaneously (~2^-128) — and a collision can
# only DELAY convergence by forcing the confirm round to disagree
# later, never return a non-fixpoint (see the _cc_loop protocol).
# bit_xor, not sum: ANSI mode (Spark 4 default) makes long-sum
# overflow throw; xor cannot overflow.
_CC_FP_COLS = (
    "count(1)",
    "bit_xor(xxhash64(a, b))",
    "bit_xor(xxhash64(a, b, 1099511628211))",
)


def _cc_fingerprint(df: DataFrame) -> tuple:
    return tuple(df.agg(*[F.expr(c) for c in _CC_FP_COLS]).first())


def _cc_loop(
    e: DataFrame,
    ckpt: Callable[[DataFrame], DataFrame],
    hb: _HardBarrier,
    max_iter: int,
    checkpoint_every: int,
    hard_barrier_every: int,
    rounds_per_check: int = CC_ROUNDS_PER_CHECK,
) -> DataFrame:
    """The alternating-star iteration of ``connected_components`` —
    split out so the barrier lifecycle (try/abort/finalize) reads
    linearly. ``e`` is the deduplicated self-loop-free edge set; the
    loop rewrites it until small_star(large_star(e)) == e (a star
    forest), then returns it.

    r13 (the r12 verdict's ask #3):

    - The r12 exact-symdiff confirm (an O(|edges|) shuffle of the full
      edge set at the final round) is replaced by the second
      independent fingerprint inside the SAME 1-row-per-partition agg
      (see _CC_FP_COLS) — zero extra jobs, certificate strength
      2^-128. The count component keeps set-size changes exact.
    - ROUND BATCHING machinery (``rounds_per_check`` star rounds stack
      lazily under ONE convergence action) exists but DEFAULTS TO 1 —
      batching 2 was measured slower (see CC_ROUNDS_PER_CHECK). Under
      batching k>1, a fingerprint match across the batch only
      schedules a SINGLE confirm round; convergence is declared
      exactly when two states ONE round apart carry equal
      certificates, i.e. f(x) == x directly — a batch match is never
      trusted as a fixpoint by itself.

    The convergence action still materializes the lazily-checkpointed
    batch-end edge set, so lineage stays truncated batch to batch;
    ``checkpoint_every`` keeps its meaning as a round-granularity lower
    bound (a mark can only take effect where an action exists, i.e. at
    batch ends)."""
    prev_fp = _cc_fingerprint(e)
    it = 0
    confirm = False  # a batch fingerprint matched; certify with 1 round
    # the confirm round may run past max_iter: it certifies a fixpoint
    # the batch already reached WITHIN the budget, it does no new work
    while it < max_iter or confirm:
        n_rounds = 1 if confirm else min(rounds_per_check, max_iter - it)
        small = e
        for _ in range(n_rounds):
            small = _cc_one_round(small)
        it += n_rounds
        if any(
            (it - k) % checkpoint_every == 0 for k in range(n_rounds)
        ) or it >= max_iter:
            small = ckpt(small, eager=False)
        fp = _cc_fingerprint(small)
        connected_components.last_rounds = it
        if fp == prev_fp:
            if n_rounds == 1:
                return small  # f(x) == x under the dual certificate
            confirm = True
        else:
            confirm = False
        prev_fp = fp
        e = small
        if hard_barrier_every and any(
            (it - k) % hard_barrier_every == 0 for k in range(n_rounds)
        ):
            # fresh scan lineage: see the hard-barrier note in the docstring
            e = hb.barrier(e, f"r{it}")
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "raising instead of returning partial labels; raise max_iter "
        "(alternating-star needs O(log^2 n) worst case, ~log2 typical)"
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 20,
    hard_barrier_every: int = 80,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Extends the reference's only graph workload (vertex degree,
    workload/src/vertex_degree.rs) to the iterative family. Each
    iteration is one join + one aggregation shuffling on node id — the
    partitioning Spark reuses across iterations; dangling nodes keep the
    base rank (simple non-normalized formulation).

    Determinism contract: per-edge contribution pr/outdeg is one double
    division (identical in both engines), summed exactly as
    DECIMAL(28,12), and the damping update is arithmetic on identical
    doubles — so a DuckDB oracle can replay the SAME fixed number of
    iterations bit-for-bit (unusual for an iterative algorithm —
    localCheckpoint and the parquet barrier both round-trip doubles
    exactly, so truncation points don't perturb the hash).

    Lineage bounding (r10): ``iterations`` is a caller parameter, so
    the loop carries the same truncation machinery as
    connected_components (``ckpt`` every ``checkpoint_every`` rounds +
    the leak-free ``_HardBarrier`` parquet rewrite every
    ``hard_barrier_every``) — but with deliberately COARSE defaults,
    because the measurement came out differently here (SCALE.md r10):
    each round references the previous ranks table exactly ONCE, so
    the lazy plan grows LINEARLY, not exponentially like cc's
    two-self-join shape — measured linear to 200 iterations on the
    6k-node percolation slice (30/60/100/200 rounds → 2.6/4.4/7.3/
    21.2 s, ~0.07 s/round marginal, no blow-up), and on KB-scale
    state every eager truncation costs MORE (a driver action + a
    materialization) than the re-analysis it saves. The defaults are
    therefore a CLUSTER posture, not a local-speed one: a bounded
    recompute window after executor loss (20 rounds max, vs replaying
    the whole run) and a bounded plan for the 1000-iteration caller.
    At the registered iterations=3 nothing fires and the loop is
    bit-identical to the plain form (pinned by test)."""
    ckpt = _checkpointer(edges, checkpoint_dir)
    hb = _HardBarrier(edges.sparkSession, checkpoint_dir, "mrl_pr_barrier")
    e = ckpt(
        edges.select(F.col(src).alias("esrc"), F.col(dst).alias("edst")).distinct()
    )  # reused every iteration; truncate lineage once
    nodes = ckpt(
        e.select(F.col("esrc").alias("node"))
        .union(e.select(F.col("edst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("esrc").agg(F.count(F.lit(1)).alias("d"))
    ranks = nodes.withColumn("pr", F.lit(1.0))
    try:
        for it in range(iterations):
            contribs = (
                e.join(ranks, e.esrc == ranks.node)
                .join(outdeg, "esrc")
                .select(
                    "edst",
                    (F.col("pr") / F.col("d")).cast("decimal(28,12)").alias("c"),
                )
            )
            mass = contribs.groupBy("edst").agg(
                F.sum("c").cast("double").alias("mass")
            )
            ranks = nodes.join(mass, nodes.node == mass.edst, "left").select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("pr"),
            )
            if (it + 1) % checkpoint_every == 0 and it != iterations - 1:
                ranks = ckpt(ranks)
            if (
                hard_barrier_every
                and (it + 1) % hard_barrier_every == 0
                and it != iterations - 1
            ):
                ranks = hb.barrier(ranks, f"r{it + 1}")
    except BaseException:
        hb.abort()
        raise
    return hb.finalize(ranks, ckpt)


def dedup_survivors(pairs: DataFrame, all_ids: DataFrame, id_col: str) -> DataFrame:
    """Cluster-level dedup: one survivor (the component minimum) per
    near-dup cluster, plus every unpaired document."""
    comps = connected_components(pairs, src="keep_id", dst="dup_id")
    drop = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return all_ids.join(drop, id_col, "left_anti")


# --------------------------------------------------------------------------
# Driver-gate entries
# --------------------------------------------------------------------------

PART_OFFSET = 1_000_000  # part node ids offset into their own id space


def pagerank_supplier_part(spark, sf_dir):
    """PageRank over the supplier→part purchase graph from lineitem
    (3 fixed iterations; parts are sinks, suppliers are sources)."""
    from map_reduce_lite_spark.relational.tables import load_table

    l = load_table(spark, sf_dir, "lineitem")
    edges = l.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + PART_OFFSET).alias("dst"),
    )
    return pagerank(edges).select("node", "pr")


def _pagerank_sql() -> str:
    """3 unrolled iterations; every float literal is cast to DOUBLE so
    DuckDB doesn't run the arithmetic in DECIMAL (its default parse of
    numeric literals), and the damping update uses the same computed
    (1.0 - 0.85) double as the Spark build."""
    base = "(1.0::DOUBLE - 0.85::DOUBLE)"

    def it(prev: str, out: str) -> str:
        return f"""{out} AS (
  SELECT n.node,
         {base} + 0.85::DOUBLE * COALESCE(CAST(SUM(
             CAST(p.pr / o.d AS DECIMAL(28,12))) AS DOUBLE), 0.0::DOUBLE) AS pr
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN {prev} p ON p.node = e.src
  LEFT JOIN outdeg o ON o.src = e.src
  GROUP BY n.node
)"""

    return f"""
WITH edges AS (
  SELECT DISTINCT l_suppkey AS src, l_partkey + {PART_OFFSET} AS dst FROM lineitem
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), outdeg AS (
  SELECT src, COUNT(*) AS d FROM edges GROUP BY src
), pr0 AS (
  SELECT node, 1.0::DOUBLE AS pr FROM nodes
), {it('pr0', 'pr1')}, {it('pr1', 'pr2')}, {it('pr2', 'pr3')}
SELECT node, pr FROM pr3
"""


TRIANGLE_TOP_K = 20
# Minimum co-purchase support for an edge: a part pair must share >= 2
# orders. The standard market-basket noise gate — a single co-occurrence
# carries no community signal — and ALSO the volume lever that keeps the
# wedge join bounded: on this corpus it prunes the sf0.1 edge list from
# 1.2M (whose ~100M-wedge closure OOM'd a 1g 8-thread session) to ~4k.
TRIANGLE_MIN_SUPPORT = 2


def copurchase_edges(
    li: DataFrame, min_support: int = TRIANGLE_MIN_SUPPORT
) -> DataFrame:
    """Supported co-purchase FORWARD edge list (u < v): parts are
    adjacent when they share ≥ ``min_support`` orders. ONE self-join on
    l_orderkey (per-order fanout ≈ the order's line count, ~4 — NOT
    quadratic in the table) + one support-counting groupBy. The shared
    substrate of the whole co-purchase graph family — triangles, label
    propagation, k-core."""
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
        .select("u", "v")
    )


def build_copurchase_edges(
    li: DataFrame, path: str, min_support: int = TRIANGLE_MIN_SUPPORT
) -> DataFrame:
    """STAGE the supported co-purchase edge list as a parquet artifact
    and return its scan — the third application of the build-once
    pattern (r10: build_knn_edges, build_near_dup_pairs). The three
    registered graph queries each rebuild this edge list inline (the
    driver contract's calls are independent), but at 100 TB the
    lineitem self-join + support agg is the family's shared dominant
    cost: built once per corpus snapshot, every consumer —
    ``triangle_parts(edges=...)``, ``label_propagation_parts``,
    ``kcore_parts`` — reads the artifact, and a parquet file survives
    executor loss. Staged-vs-inline parity for all three consumers is
    pinned in tests/test_r11_ops.py."""
    copurchase_edges(li, min_support).write.mode("overwrite").parquet(path)
    return li.sparkSession.read.parquet(path)


def orient_edges(und: DataFrame) -> DataFrame:
    """Degree-orient an undirected (u, v) edge list: each edge points
    from its lower-(degree, id) endpoint to the higher one — the
    node-iterator++ orientation that bounds every node's FORWARD degree
    by O(sqrt(m)) / graph arboricity, however skewed the raw degree
    distribution (a planted hub's edges almost all point INTO it, so
    it stops generating wedges). (degree, id) is a total order, so the
    triangle set enumerated over (src, dst) is unchanged. Extracted
    (r12) so the adversarial-topology campaign can assert the fanout
    bound directly (tests/test_r12_ops.py, tools/scale_stress.py
    --topology)."""
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # ties on degree fall back to id order, i.e. the plain orientation
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return (
        und.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )


def triangle_parts(
    spark,
    sf_dir: str,
    checkpoint_dir: str | None = None,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Top parts by triangle participation in the supported co-purchase
    graph (parts are adjacent when they share >= TRIANGLE_MIN_SUPPORT
    orders) — the classic community-density statistic, and a
    deliberately join-heavy graph benchmark shape.

    Plan: edge list from a self-join on l_orderkey (per-order fanout is
    the order's line count, ~4 — NOT quadratic in the table) + one
    support-counting groupBy, localCheckpoint'd once because the
    triangle enumeration reads it THREE times. Triangles close via two
    equi-joins with edges DEGREE-ORIENTED (r8): every edge points from
    its lower-(degree, id) endpoint to the higher one, so the wedge
    join e1.dst == e2.src fans out from each node by its FORWARD degree
    only, which the orientation bounds by O(sqrt(m)) / graph arboricity
    (the published node-iterator++ refinement) — a skewed hub that
    co-occurs with everything stops generating quadratic wedges because
    almost all its edges point INTO it. (degree, id) is a total order,
    so each triangle is still enumerated exactly once, and the triangle
    SET is orientation-invariant — the DuckDB oracle keeps the plain
    u < v id-orientation, making the green hash a proof the rewrite
    changed nothing semantically. Measured on the dense Zipf-part
    slice (tools/gen_scaledata.py --lineitem, 600k rows → 123k edges):
    max forward-degree 10,630 → 119, i.e. the hottest node's wedge
    fanout drops from ~56M to ~7k, and the scaling exponent from 0.45
    to 0.35-0.38 (SCALE.md r8)."""
    from map_reduce_lite_spark.relational.tables import load_table

    if edges is None:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        edges = copurchase_edges(li)
    oriented = orient_edges(edges.select("u", "v"))
    # SF-proportional materialization: reliable checkpoint when a
    # shared-FS dir is given (r11 cluster posture), local otherwise.
    # eager=False (r12): the triangle enumeration is ONE action; a lazy
    # mark lets that action materialize the oriented list on first use
    # and share it across all three join references, instead of paying
    # a separate up-front job (guide §1.2 — fewer driver actions).
    oriented = _checkpointer(oriented, checkpoint_dir)(oriented, eager=False)
    # merge-join hint: the edge list is a borderline-broadcastable few
    # tens of MB at test scale, and AQE happily broadcasts it — building
    # a per-task hash map of the WHOLE graph, which OOMs a modest driver
    # (observed: 1g vanilla heap at sf0.1) and is categorically wrong at
    # 100 TB where the edge list is the big table. Sort-merge spills.
    e1 = oriented.alias("e1")
    e2 = oriented.hint("merge").alias("e2")
    e3 = oriented.hint("merge").alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("x"),
            F.col("e1.dst").alias("y"),
            F.col("e2.dst").alias("z"),
        )
    )
    verts = tri.select(F.explode(F.array("x", "y", "z")).alias("part"))
    return (
        verts.groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), F.asc("part"))
        .limit(TRIANGLE_TOP_K)
    )


TRIANGLE_SQL = f"""
WITH e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {TRIANGLE_MIN_SUPPORT}
), tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e e1
  JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
), verts AS (
  SELECT x AS part FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT part, COUNT(*) AS n_triangles
FROM verts GROUP BY part
ORDER BY n_triangles DESC, part ASC
LIMIT {TRIANGLE_TOP_K}
"""


LPA_ROUNDS = 3


def label_propagation_parts(
    spark,
    sf_dir: str,
    checkpoint_dir: str | None = None,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Community detection by synchronous label propagation over the
    supported co-purchase part graph (same support-gated edge list as
    the triangle query): every node starts labeled with its own id,
    and each round adopts the most frequent label among its neighbors
    (ties → smallest label). Deterministic by construction —
    synchronous rounds plus a total tie order — unlike classic
    asynchronous LPA, so the DuckDB oracle replays it exactly.

    Output: one row per surviving community (label, n_members,
    min_part) — the corpus-organization statistic (which product
    clusters exist and how big they are).

    Scale shape: each round is ONE join (edge list against the K-byte
    label table, shuffling on node id — the partitioning is reused
    round to round) + one (node, label) count agg + one per-node
    argmax window over rows bounded by degree. Rounds are a fixed
    constant; label tables are localCheckpoint'd so lineage stays
    flat (the connected-components lesson). The per-node argmax is a
    hash aggregate (max over (cnt, -lbl) structs — r13), so no sort
    and no window at any degree distribution."""
    from map_reduce_lite_spark.relational.tables import load_table

    if edges is None:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        edges = copurchase_edges(li)
    fwd = edges.select("u", "v")
    ckpt = _checkpointer(fwd, checkpoint_dir)
    # eager=False throughout (r12): LPA_ROUNDS is a constant and the
    # query has exactly ONE terminal action, so lazy checkpoint marks
    # keep lineage truncated (each round's plan starts from the
    # previous round's LogicalRDD) while folding what used to be
    # 1 + LPA_ROUNDS separate materialization jobs into the terminal
    # action — the r10 per-action driver-cost lesson applied here.
    e = ckpt(
        fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))),
        eager=False,
    )
    labels = e.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(LPA_ROUNDS):
        counts = (
            e.join(labels, e.v == labels.node)
            .select(F.col("u").alias("node"), "lbl")
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # r13: the per-round argmax is max(struct(cnt, -lbl)) — exactly
        # row_number()=1 under (cnt DESC, lbl ASC), since struct order
        # is lexicographic and lbl is unique within a node's rows — but
        # as a HASH aggregate with map-side partial aggregation instead
        # of a window: the per-partition sort of the (node, lbl) count
        # stream is gone and rows collapse to one per node BEFORE the
        # exchange (guide §2.3 aggregate-before-shuffle). Interleaved
        # A/B at sf0.1: wall flat (old 5.9-7.0 s, new 5.6-6.7 s warm),
        # identical communities every rep; the win is the removed
        # per-round sort, which grows with degree at corpus scale.
        labels = ckpt(
            counts.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("cnt"), (-F.col("lbl")).alias("neg_lbl"))
                ).alias("best")
            )
            .select("node", (-F.col("best.neg_lbl")).alias("lbl")),
            eager=False,
        )
    return (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("node").alias("min_part"),
        )
    )


def _lpa_sql() -> str:
    def rnd(prev: str, out: str) -> str:
        return f"""{out} AS (
  SELECT node, lbl FROM (
    SELECT e.u AS node, p.lbl, COUNT(*) AS cnt,
           row_number() OVER (PARTITION BY e.u
                              ORDER BY COUNT(*) DESC, p.lbl ASC) AS rn
    FROM e JOIN {prev} p ON p.node = e.v
    GROUP BY e.u, p.lbl
  ) WHERE rn = 1
)"""

    rounds = ", ".join(rnd(f"l{i}", f"l{i + 1}") for i in range(LPA_ROUNDS))
    return f"""
WITH fwd AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {TRIANGLE_MIN_SUPPORT}
), e AS (
  SELECT u, v FROM fwd UNION ALL SELECT v, u FROM fwd
), l0 AS (
  SELECT DISTINCT u AS node, u AS lbl FROM e
), {rounds}
SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_members,
       MIN(node) AS min_part
FROM l{LPA_ROUNDS} GROUP BY lbl
"""


KCORE_K = 3        # minimum surviving degree
KCORE_ROUNDS = 6   # fixed peel rounds (oracle-replayable unrolling)


def kcore_parts(
    spark,
    sf_dir: str,
    checkpoint_dir: str | None = None,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Bounded k-core peeling over the supported co-purchase part graph
    (same support-gated edge list as triangles/LPA): repeatedly drop
    nodes with degree < KCORE_K, a fixed KCORE_ROUNDS times, and emit
    each survivor with its within-core degree — the standard
    dense-community filter (a node in the k-core has ≥ k neighbors who
    ALSO survive).

    Fixed-round peeling instead of peel-to-fixpoint is deliberate: the
    DuckDB twin replays each round as a plain chained CTE (recursive
    CTEs cannot aggregate in the recursive term), and bounded rounds
    are also the 100 TB posture — each round is one degree agg + two
    semi-joins on node id, checkpointed, so R rounds cost R flat
    passes. Peeling converges geometrically on natural graphs (the
    fixture converges well inside 6 — pinned by the idempotence test);
    a corpus that needs more rounds raises KCORE_ROUNDS, not the
    architecture."""
    from map_reduce_lite_spark.relational.tables import load_table

    if edges is None:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        edges = copurchase_edges(li)
    fwd = edges.select("u", "v")
    ckpt = _checkpointer(fwd, checkpoint_dir)
    # eager=False throughout (r12): fixed KCORE_ROUNDS and one terminal
    # action — lazy checkpoint marks truncate lineage identically but
    # fold 1 + KCORE_ROUNDS materialization jobs into the final action
    # (each round's edge set is still cached on first use and shared by
    # the degree agg + both semi-joins of the next round).
    e = ckpt(
        fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))),
        eager=False,
    )
    for _ in range(KCORE_ROUNDS):
        keep = (
            e.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= KCORE_K)
            .select("u")
        )
        e = ckpt(
            e.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi"),
            eager=False,
        )
    return (
        e.groupBy(F.col("u").alias("part"))
        .agg(F.count(F.lit(1)).cast("long").alias("kcore_degree"))
    )


def _kcore_sql() -> str:
    # MATERIALIZED is load-bearing: each e{i} is referenced twice (the
    # degree agg and the next filter) and each k{i} twice (both IN
    # subqueries) — inlined CTEs would re-evaluate the whole chain
    # per reference, i.e. 2^ROUNDS plan blowup.
    rounds = []
    for i in range(KCORE_ROUNDS):
        rounds.append(
            f"""k{i} AS MATERIALIZED (
  SELECT u FROM (SELECT u, COUNT(*) AS d FROM e{i} GROUP BY u)
  WHERE d >= {KCORE_K}
), e{i + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{i} e
  WHERE e.u IN (SELECT u FROM k{i}) AND e.v IN (SELECT u FROM k{i})
)"""
        )
    chain = ", ".join(rounds)
    return f"""
WITH fwd AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {TRIANGLE_MIN_SUPPORT}
), e0 AS (
  SELECT u, v FROM fwd UNION ALL SELECT v, u FROM fwd
), {chain}
SELECT u AS part, CAST(COUNT(*) AS BIGINT) AS kcore_degree
FROM e{KCORE_ROUNDS} GROUP BY u
"""


def _graph_queries():
    from map_reduce_lite_spark.registry import Query

    return {
        "pagerank_supplier_part": Query(
            "pagerank_supplier_part",
            pagerank_supplier_part,
            _pagerank_sql(),
            "fixed-iteration PageRank, decimal-exact oracle",
        ),
        "graph_label_propagation": Query(
            "graph_label_propagation",
            label_propagation_parts,
            _lpa_sql(),
            "deterministic synchronous LPA communities over the co-purchase graph",
        ),
        "graph_triangle_parts": Query(
            "graph_triangle_parts",
            triangle_parts,
            TRIANGLE_SQL,
            "triangle counting over the co-purchase part graph (top-k by participation)",
        ),
        "graph_kcore_parts": Query(
            "graph_kcore_parts",
            kcore_parts,
            _kcore_sql(),
            "bounded k-core peel over the co-purchase graph (survivors + core degree)",
        ),
    }


GRAPH_QUERIES = _graph_queries()
