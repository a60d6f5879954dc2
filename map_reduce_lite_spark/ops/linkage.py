"""Entity resolution / record linkage: blocked fuzzy join.

The canonical shape: NEVER compare all pairs. Generate candidates with
a cheap blocking key (equi-join — shuffle on the block key), then run
the expensive similarity (edit distance) ONLY inside blocks. Candidate
volume is sum over blocks of |A_b| x |B_b|; the blocking key is the
recall/cost lever, exactly like the LSH band joins in ops/dedup.py —
this module is the string-similarity member of that family.

Here: customers vs suppliers linked on their numeric name suffixes
(both sides carry zero-padded entity numbers), blocked on
(nation, 7-digit prefix) so each block is <= 100 x 100 worst case, then
verified with Levenshtein <= MAX_DIST. Both engines implement classic
Levenshtein, so the result is exact and fully value-oracled.

At 100 TB: one shuffle on the block key; per-block products are bounded
by the key's selectivity (add more prefix digits to shrink blocks — the
same knob as LSH rows-per-band). No cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from map_reduce_lite_spark.registry import Query
from map_reduce_lite_spark.relational.tables import load_table

PREFIX_LEN = 7     # blocking prefix of the 9-digit entity number
MAX_DIST = 1       # verification threshold (edit distance)


def fuzzy_link_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join: candidate pairs from (nationkey, digit
    prefix) blocks, verified with Levenshtein on the full digit string.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").alias("nk"),
        F.regexp_replace("c_name", "[^0-9]", "").alias("c_digits"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_nationkey").alias("nk"),
        F.regexp_replace("s_name", "[^0-9]", "").alias("s_digits"),
    )
    cand = c.join(
        s,
        [
            c["nk"] == s["nk"],
            F.substring(c["c_digits"], 1, PREFIX_LEN)
            == F.substring(s["s_digits"], 1, PREFIX_LEN),
        ],
    )
    return (
        cand.withColumn("dist", F.levenshtein("c_digits", "s_digits"))
        .filter(F.col("dist") <= MAX_DIST)
        .select("c_custkey", "s_suppkey", "dist")
    )


FUZZY_LINK_SQL = f"""
SELECT c_custkey, s_suppkey,
       levenshtein(c_digits, s_digits) AS dist
FROM (SELECT c_custkey, c_nationkey,
             regexp_replace(c_name, '[^0-9]', '', 'g') AS c_digits
      FROM customer) c
JOIN (SELECT s_suppkey, s_nationkey,
             regexp_replace(s_name, '[^0-9]', '', 'g') AS s_digits
      FROM supplier) s
  ON c.c_nationkey = s.s_nationkey
 AND substr(c.c_digits, 1, {PREFIX_LEN}) = substr(s.s_digits, 1, {PREFIX_LEN})
WHERE levenshtein(c_digits, s_digits) <= {MAX_DIST}
"""


LINKAGE_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query(
            "fuzzy_link_customer_supplier",
            fuzzy_link_customer_supplier,
            FUZZY_LINK_SQL,
            "blocked fuzzy join (blocking key + Levenshtein verify)",
        ),
    ]
}
