from map_reduce_lite_spark.sources.io import (
    FORMATS,
    read_source,
    scan_lines,
    scan_whole_files,
    write_sink,
)

__all__ = [
    "FORMATS",
    "read_source",
    "scan_lines",
    "scan_whole_files",
    "write_sink",
]
