"""Word count (reference workload ``wc``).

Reference semantics (workload/src/wc.rs:9-44): split each line on runs of
non-alphabetic characters (Unicode-aware ``char::is_alphabetic``),
lowercase, drop empties, count occurrences per word, emit
``"{word} {count}"``.

Spark-first translation: ``explode(split(lower(text), '[^\\p{L}]+'))`` →
``filter(length > 0)`` → ``groupBy.count``. Unlike the reference — which
shuffles one record per token with no combiner (wc.rs:20-28) — Spark's
hash aggregate does map-side partial aggregation, so shuffle volume is
O(distinct words per partition), not O(tokens). At 100 TB the word-count
shuffle is tiny; the scan dominates and stays a narrow stage.

PINNED REFERENCE DIVERGENCE (r11, deliberate): the reference lowercases
with Rust's FULL Unicode casemap (wc.rs uses ``char::to_lowercase``), so
U+0130 İ maps to 'i' + U+0307 combining-dot and a word-final Σ maps to
ς. ``mrl_lower`` instead applies the SIMPLE casemap (İ→i, Σ→σ in every
position) — chosen in r10 so the Spark side and the DuckDB oracle share
one casing definition on every codepoint (the previous full-map behavior
split 'DİYARBAKIR' into four tokens via the combining dot, diverging
from the oracle a different way). Word KEYS for those two codepoints
therefore differ from the reference's exact output; token COUNTS and
every other codepoint agree. A future reference-parity audit should
read this as the documented oracle-parity trade, not a regression —
the helper-level behavior is pinned in
tests/test_emptycorpus.py::test_mrl_lower_matches_utf8proc_simple_casing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from map_reduce_lite_spark.registry import mrl_lower

# Unicode letters; the reference splits on `!char::is_alphabetic` (wc.rs:12).
TOKEN_SPLIT_RE = r"[^\p{L}]+"


def word_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) from a DataFrame with a text column."""
    words = df.select(
        F.explode(F.split(mrl_lower(F.col(text_col)), TOKEN_SPLIT_RE)).alias("word")
    ).filter(F.length("word") > 0)
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("count"))


def word_count_lines(spark, input_glob: str) -> DataFrame:
    """File-facing parity form: text glob in, (word, count) out."""
    return word_count(spark.read.text(input_glob).withColumnRenamed("value", "text"))


def format_output(df: DataFrame) -> DataFrame:
    """Reference output format ``"{word} {count}"`` (wc.rs:41)."""
    return df.select(F.format_string("%s %d", "word", "count").alias("value"))
