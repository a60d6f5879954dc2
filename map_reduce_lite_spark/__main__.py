"""CLI entry point — ``python -m map_reduce_lite_spark``.

Mirrors the reference's two driver CLIs on one surface:

- ``submit --input GLOB --workload NAME --output DIR [-- args...]``
  ≈ the standalone engine (standalone/src/main.rs:12-27) and
  ``mrl-ctl submit`` (mrl-ctl/src/args.rs:29-53). ``--address`` /
  ``--timeout`` have no meaning here — the "cluster" is the
  SparkSession, selected by ``--master`` (or spark-submit's conf on a
  real deployment); Spark's own task timeouts + speculation replace the
  reference's per-job timeout.
- ``workloads`` lists registered workload names
  (≈ workload/src/lib.rs:31-55 registry).
- ``status`` prints session status (≈ mrl-ctl status, core.rs:58-71).

Trailing auxiliary args after ``--`` are passed to the workload builder:
bare ``--term X``-style flag pairs become kwargs, fixing the reference's
JSON-vs-space-join aux wart (SURVEY.md §1.2) by giving aux one typed
spelling.
"""

from __future__ import annotations

import argparse
import sys


def _parse_aux(tokens: list[str]) -> dict[str, str]:
    """``--key value`` pairs → kwargs (e.g. ``-- --term ipsum``)."""
    aux: dict[str, str] = {}
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if not tok.startswith("--"):
            raise SystemExit(f"auxiliary args must be --key value pairs, got {tok!r}")
        if i + 1 >= len(tokens):
            raise SystemExit(f"auxiliary flag {tok!r} is missing a value")
        aux[tok[2:].replace("-", "_")] = tokens[i + 1]
        i += 2
    return aux


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="map_reduce_lite_spark")
    sub = p.add_subparsers(dest="command", required=True)

    ps = sub.add_parser("submit", help="run a named workload over an input glob")
    ps.add_argument("-i", "--input", required=True, help="input file glob")
    ps.add_argument("-w", "--workload", required=True, help="workload name")
    ps.add_argument("-o", "--output", required=True, help="output directory (text part files)")
    ps.add_argument("--master", default=None, help="Spark master (default local[$SPARK_GRAFT_CPUS])")
    ps.add_argument("aux", nargs="*", help="auxiliary --key value pairs after --")

    sub.add_parser("workloads", help="list registered workload names")

    pc = sub.add_parser(
        "compact", help="rewrite a small-files directory to target-size files"
    )
    pc.add_argument("-i", "--input", required=True, help="source directory")
    pc.add_argument("-o", "--output", required=True, help="destination directory")
    pc.add_argument("--format", default="parquet", help="file format (default parquet)")
    pc.add_argument(
        "--target-mb", type=int, default=128, help="target file size in MiB"
    )
    pc.add_argument("--master", default=None)

    pz = sub.add_parser(
        "zorder", help="rewrite a table clustered on a Z-order curve"
    )
    pz.add_argument("-i", "--input", required=True, help="source directory")
    pz.add_argument("-o", "--output", required=True, help="destination directory")
    pz.add_argument(
        "-c", "--columns", required=True,
        help="comma-separated numeric columns to cluster on",
    )
    pz.add_argument("--format", default="parquet", help="file format (default parquet)")
    pz.add_argument("--num-files", type=int, default=8, help="output file count")
    pz.add_argument("--master", default=None)

    pst = sub.add_parser("status", help="print session status")
    pst.add_argument("--master", default=None)

    args = p.parse_args(argv)

    # import here so `--help` stays instant (no JVM spin-up)
    from map_reduce_lite_spark.engine import WORKLOADS, Engine
    from map_reduce_lite_spark.session import get_spark

    if args.command == "workloads":
        for name in sorted(WORKLOADS):
            print(name)
        return 0

    if args.command == "status":
        eng = Engine(get_spark(master=args.master))
        for k, v in eng.status().items():
            print(f"{k}: {v}")
        return 0

    if args.command == "compact":
        from map_reduce_lite_spark.sources.io import compact_files

        n = compact_files(
            get_spark(master=args.master),
            args.input,
            args.output,
            fmt=args.format,
            target_file_bytes=args.target_mb * 1024 * 1024,
        )
        print(f"compacted {args.input} -> {args.output}: {n} files")
        return 0

    if args.command == "zorder":
        from map_reduce_lite_spark.sources.io import read_source, write_zordered

        spark = get_spark(master=args.master)
        df = read_source(spark, args.input, fmt=args.format)
        cols = [c.strip() for c in args.columns.split(",") if c.strip()]
        write_zordered(df, args.output, cols, num_files=args.num_files, fmt=args.format)
        print(f"z-ordered {args.input} -> {args.output} on {cols}: {args.num_files} files")
        return 0

    aux = _parse_aux(args.aux)
    eng = Engine(get_spark(master=args.master))
    df = eng.submit(args.workload, args.input, output=args.output, **aux)
    job = eng.jobs()[-1]
    print(
        f"job {job.job_id} {job.state}: workload={job.workload} "
        f"rows={df.count()} output={args.output}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
