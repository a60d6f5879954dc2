"""Query registry shared by the relational library and extension ops.

Each entry pairs a Spark DataFrame builder with an equivalent ANSI-SQL
oracle string (DuckDB dialect-compatible) used by the correctness driver.
``oracle`` is None for operators whose semantics aren't expressible in
portable SQL (LSH banding with engine-specific hashes, streaming state);
those get a rows-only check and a pytest property test instead.

Determinism contract between Spark and DuckDB (both must hash-match on
values, so floating-point aggregation order must not matter):
- integer outputs wherever possible (counts, keys, flags);
- SUM over doubles goes through DECIMAL: per-row double arithmetic is
  IEEE-identical in both engines, the row value is cast to
  DECIMAL(18,s) (identical rounding for non-tie values), summed exactly,
  and the exact total is cast back to DOUBLE → bit-identical;
- AVG = CAST(decimal-sum AS DOUBLE) / COUNT — one double division of
  identical operands;
- MIN/MAX on doubles are exact (no arithmetic);
- portable 60-bit hashes: first 15 hex chars of md5 → BIGINT
  (Spark: conv(substr(md5(x),1,15),16,10); DuckDB: ('0x'||...)::BIGINT).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def dsum(col: Column, scale: int = 4) -> Column:
    """Order-independent SUM of a double expression (see module doc)."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column, scale: int = 4) -> Column:
    """Order-independent AVG of a double expression."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double") / F.count(col)


def sql_dsum(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"


def md5_60bit(col: Column) -> Column:
    """Portable 60-bit hash of a string column (matches sql_md5_60bit)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_md5_60bit(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def mrl_lower(col: Column | str) -> Column:
    """Cross-engine lowercase (r10): Java's FULL Unicode case mapping
    diverges from DuckDB/utf8proc's SIMPLE mapping on exactly two
    non-locale points — U+0130 'İ' lowers to 'i'+U+0307 (TWO
    codepoints, whose combining dot then splits \\p{L}+ tokens) vs
    plain 'i' in DuckDB, and Java applies the contextual final-sigma
    rule (Σ → ς at word end) while utf8proc maps Σ → σ
    unconditionally. Pre-translating those two characters before
    lower() makes Java's mapping coincide with the simple one —
    identity on any text not containing İ/Σ (all ASCII fixtures), so
    every standing hash is unchanged. Found by the r10 Unicode-corpus
    sweep: wc_documents tokenized 'DİYARBAKIR' into four Java-side
    tokens via the combining dot. Every tokenizing/normalizing
    operator lowercases through this helper; the DuckDB twins keep
    plain lower() (the pre-translate is a no-op under utf8proc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.translate(c, "İΣ", "iσ"))
