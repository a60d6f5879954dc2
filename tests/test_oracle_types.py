"""Oracle-side type-portability lint.

The correctness driver hashes DuckDB oracle results and Spark results with the
same canonicalizer, but DuckDB types that Spark can't produce (HUGEINT from an
un-cast SUM over integers, wide DECIMALs, naive TIME) canonicalize differently
and flip hash_match even when the value multisets are identical.  This bit us
in round 2 (8 queries) and again in round 4 (4 queries) — this test makes the
class unrepresentable: every oracle's *prepared* result schema must use only
types with an exact Spark twin.

We use ``con.execute(sql).description`` on a LIMIT-0 wrapper, so the check is
schema-only (no data scan) and runs in seconds over all oracles.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

# DuckDB typeids with an exact Spark/driver-canonical twin.  Anything outside
# this set (HUGEINT, UHUGEINT, TIME, INTERVAL, DECIMAL wider than 18,
# TIMESTAMP WITH TIME ZONE, unsigned ints) is a portability hazard.
_PORTABLE = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "BLOB",
    "DATE",
    "TIMESTAMP",  # naive == Spark TIMESTAMP_NTZ / session-UTC TIMESTAMP
    "TIMESTAMP_NS",
    "TIMESTAMP_MS",
    "TIMESTAMP_S",
}


def _column_types(con, sql: str) -> list[tuple[str, str]]:
    rel = con.sql(f"SELECT * FROM ({sql}) __t LIMIT 0")
    return list(zip(rel.columns, [str(t) for t in rel.types]))


def _is_portable(type_str: str) -> bool:
    t = type_str.upper()
    if t in _PORTABLE:
        return True
    if t.startswith("DECIMAL"):
        # DECIMAL(p,s) with p<=38 maps to Spark DecimalType, but the driver
        # canonicalizes decimals by string; Spark SUM over DECIMAL widens the
        # precision differently from DuckDB, so only allow when the oracle
        # explicitly cast (we treat any DECIMAL as a hazard — cast to DOUBLE
        # or BIGINT instead).
        return False
    if t.startswith("STRUCT") or t.endswith("[]") or t.startswith("LIST") or t.startswith("MAP"):
        # Recurse on the element types textually: a HUGEINT anywhere inside is
        # still a hazard.
        return "HUGEINT" not in t and "DECIMAL" not in t and "TIME WITH" not in t
    return False


@pytest.mark.slow
def test_every_oracle_schema_is_spark_portable(duck):
    oracles = entry.oracle_sql()
    assert oracles, "oracle_sql() returned nothing"
    bad: list[str] = []
    for name, sql in sorted(oracles.items()):
        try:
            cols = _column_types(duck, sql)
        except Exception as exc:  # pragma: no cover - oracle must at least plan
            bad.append(f"{name}: oracle failed to plan: {exc}")
            continue
        for col, typ in cols:
            if not _is_portable(typ):
                bad.append(f"{name}.{col}: {typ}")
    assert not bad, (
        "Oracle result columns with non-portable DuckDB types (cast them, e.g. "
        "CAST(SUM(x) AS BIGINT)):\n  " + "\n  ".join(bad)
    )


def test_known_hugeint_quartet_is_fixed(duck):
    """Regression pin for the exact four round-4 hash-reds."""
    oracles = entry.oracle_sql()
    for name, col in [
        ("text_oov_rate", "n_oov"),
        ("profile_documents", "n_null"),
        ("pipeline_incremental_refresh", "delta_tokens"),
        ("sample_stratified_sources", "n_sampled"),
    ]:
        if name not in oracles:
            pytest.skip(f"{name} not registered")
        types = dict(_column_types(duck, oracles[name]))
        assert types[col].upper() == "BIGINT", (name, col, types[col])
