from map_reduce_lite_spark.sources.io import (
    FORMATS,
    compact_files,
    read_source,
    scan_lines,
    scan_whole_files,
    write_bucketed,
    write_sink,
    write_zordered,
)

__all__ = [
    "FORMATS",
    "compact_files",
    "read_source",
    "scan_lines",
    "scan_whole_files",
    "write_bucketed",
    "write_sink",
    "write_zordered",
]
