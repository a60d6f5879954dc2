"""Engine facade — the reference's submit/jobs/status surface on Spark.

Parity targets:
- name→workload registry        ≈ workload/src/lib.rs:31-55
- ``submit(input, workload, output, args)`` ≈ mrl-ctl/src/args.rs:29-53 and
  the standalone CLI (standalone/src/main.rs:12-27)
- ``jobs()`` / ``status()``     ≈ mrl-coordinator/src/core.rs:76-125

Everything below the facade is a DataFrame plan: scheduling, shuffle,
retry, speculative execution and output commit are Spark's
(SURVEY.md §4.2 maps each reference mechanism to its Spark replacement).
Auxiliary args are plain kwargs — this deliberately fixes the reference's
JSON-vs-space-join aux encoding mismatch (SURVEY.md §1.2).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from map_reduce_lite_spark.workloads import (
    grep_lines,
    matrix_multiply,
    matrix_multiply_phase1,
    matrix_multiply_phase2,
    vertex_degree_lines,
    word_count_lines,
)
# direct function imports: the package __init__ re-exports functions whose
# names shadow the submodule attributes, so module-level aliases don't resolve
from map_reduce_lite_spark.workloads.wordcount import format_output as _wc_format
from map_reduce_lite_spark.workloads.grep import format_output as _grep_format
from map_reduce_lite_spark.workloads.vertex_degree import format_output as _vd_format
from map_reduce_lite_spark.workloads.matrix_multiply import (
    format_output as _mm_format,
    parse_triples as _mm_parse,
)


def _wc(spark: SparkSession, input_glob: str, **aux) -> DataFrame:
    return _wc_format(word_count_lines(spark, input_glob))


def _grep(spark: SparkSession, input_glob: str, term: str = "", **aux) -> DataFrame:
    return _grep_format(grep_lines(spark, input_glob, term))


def _vertex_degree(spark: SparkSession, input_glob: str, **aux) -> DataFrame:
    return _vd_format(vertex_degree_lines(spark, input_glob))


def _mm1(spark: SparkSession, input_glob: str, **aux) -> DataFrame:
    df = matrix_multiply_phase1(_mm_parse(spark, input_glob))
    return df.select(
        F.format_string("%d %d %s C", "row", "col", F.col("value").cast("string")).alias("value")
    )


def _mm2(spark: SparkSession, input_glob: str, **aux) -> DataFrame:
    return _mm_format(matrix_multiply_phase2(_mm_parse(spark, input_glob)))


def _mm(spark: SparkSession, input_glob: str, **aux) -> DataFrame:
    return _mm_format(matrix_multiply(_mm_parse(spark, input_glob)))


# name → (spark, input_glob, **aux) -> DataFrame of output lines.
# "matrix-multiply" (fused single query) has no reference analog — it is the
# idiomatic replacement for chaining -1 then -2.
WORKLOADS: dict[str, Callable[..., DataFrame]] = {
    "wc": _wc,
    "grep": _grep,
    "vertex-degree": _vertex_degree,
    "matrix-multiply-1": _mm1,
    "matrix-multiply-2": _mm2,
    "matrix-multiply": _mm,
}


def register_workload(
    name: str, builder: Callable[..., DataFrame], *, replace: bool = False
) -> None:
    """Register a user workload by name — the reference's core contract:
    users supply their own (map_fn, reduce_fn) pair and select it by
    string at submit time (common/src/lib.rs:29-50 defines the pair,
    workload/src/lib.rs:31-55 the name registry). Here the unit of
    registration is a pipeline builder ``(spark, input_glob, **aux) ->
    DataFrame`` — map logic is any narrow transform (select / explode /
    mapInPandas ≈ MapFn's 1→N rows), reduce logic any aggregation
    (groupBy().agg / applyInPandas ≈ ReduceFn's key+values→blob), and
    ``aux`` arrives as plain kwargs instead of the reference's ambiguous
    byte-encoded args (SURVEY.md §1.2 wart).

    See tests/test_workloads.py::test_register_custom_workload for a
    fifth workload written with applyInPandas (arbitrary per-group
    Python reduce — the full ReduceFn generality)."""
    if not replace and name in WORKLOADS:
        raise ValueError(f"workload {name!r} already registered (pass replace=True)")
    if not callable(builder):
        raise TypeError("builder must be callable (spark, input_glob, **aux) -> DataFrame")
    WORKLOADS[name] = builder


@dataclass
class JobRecord:
    job_id: int
    workload: str
    input: str
    output: str | None
    state: str  # Pending → Running → Completed | Failed  (jobs.rs:8-23)
    submitted_at: float
    finished_at: float | None = None
    error: str | None = None
    aux: dict = field(default_factory=dict)


class Engine:
    """Thin session wrapper exposing the reference CLI surface."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._jobs: list[JobRecord] = []

    def submit(
        self,
        workload: str,
        input: str,
        output: str | None = None,
        **aux,
    ) -> DataFrame:
        """Run a named workload. With ``output`` set, writes text part files
        (≈ mr-out-{partition}, engine.rs:66-75) and returns the DataFrame;
        without, returns the lazy DataFrame for the caller to act on."""
        if workload not in WORKLOADS:
            raise KeyError(
                f"unknown workload {workload!r}; known: {sorted(WORKLOADS)}"
            )
        rec = JobRecord(
            job_id=len(self._jobs),
            workload=workload,
            input=input,
            output=output,
            state="Running",
            submitted_at=time.time(),
            aux=aux,
        )
        self._jobs.append(rec)
        try:
            df = WORKLOADS[workload](self.spark, input, **aux)
            if output is not None:
                df.write.mode("overwrite").text(output)
            rec.state = "Completed"
            rec.finished_at = time.time()
            return df
        except Exception as e:  # noqa: BLE001 — mirror job-failure bookkeeping
            rec.state = "Failed"
            rec.error = str(e)
            rec.finished_at = time.time()
            raise

    @staticmethod
    def register(
        name: str, builder: Callable[..., DataFrame], *, replace: bool = False
    ) -> None:
        """Instance-accessible alias of :func:`register_workload` (the
        registry is process-global, matching the reference's static
        name→Workload table)."""
        register_workload(name, builder, replace=replace)

    def jobs(self) -> list[JobRecord]:
        """Job history (≈ coordinator `jobs` RPC, core.rs:76-99)."""
        return list(self._jobs)

    def status(self) -> dict:
        """Cluster/session status (≈ coordinator `status` RPC, core.rs:101-125)."""
        sc = self.spark.sparkContext
        return {
            "master": sc.master,
            "app_id": sc.applicationId,
            "default_parallelism": sc.defaultParallelism,
            "active_jobs": sum(1 for j in self._jobs if j.state == "Running"),
            "completed_jobs": sum(1 for j in self._jobs if j.state == "Completed"),
            "failed_jobs": sum(1 for j in self._jobs if j.state == "Failed"),
        }
