"""Grep (reference workload ``grep``).

Reference semantics (workload/src/grep.rs:11-63): keep lines containing a
literal term; key by filename; per file sort matches by 1-based line
number; emit ``"{file}:{line_no}:: {line}"``.

Spark-first translation: the filter is a plain ``contains`` predicate —
Catalyst pushes it into the scan where the source supports it. Line
numbers are a per-file ``row_number()`` window; at scale this is the one
part that forces a shuffle by file, so the structured form accepts a
precomputed line_no column when the source already has one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def grep(
    df: DataFrame,
    term: str,
    text_col: str = "text",
    file_col: str = "file",
    line_no_col: str | None = "line_no",
) -> DataFrame:
    """Rows (file, line_no, text) whose text contains ``term`` (literal)."""
    if line_no_col is None or line_no_col not in df.columns:
        # Per-file 1-based line numbers (grep.rs:28). monotonically_increasing_id
        # preserves within-partition input order, giving stable per-file numbering
        # for line-oriented sources.
        w = Window.partitionBy(file_col).orderBy(F.monotonically_increasing_id())
        df = df.withColumn("line_no", F.row_number().over(w))
        line_no_col = "line_no"
    return (
        df.filter(F.col(text_col).contains(term))
        .select(
            F.col(file_col).alias("file"),
            F.col(line_no_col).cast("long").alias("line_no"),
            F.col(text_col).alias("text"),
        )
        .orderBy("file", "line_no")
    )


def grep_lines(spark, input_glob: str, term: str) -> DataFrame:
    """File-facing parity form over a text glob."""
    from pyspark.sql.functions import input_file_name

    lines = spark.read.text(input_glob).select(
        input_file_name().alias("file"), F.col("value").alias("text")
    )
    return grep(lines, term, line_no_col=None)


def format_output(df: DataFrame) -> DataFrame:
    """Reference output format ``"{file}:{line_no}:: {line}"`` (grep.rs:59)."""
    return df.select(F.format_string("%s:%d:: %s", "file", "line_no", "text").alias("value"))
