"""Source readers: files and wire-format payloads -> TimeSeries."""

from .readers import (read_csv, read_json_lines, read_parquet, read_wire_file,
                      to_parquet)

__all__ = ["read_parquet", "read_json_lines", "read_csv", "read_wire_file",
           "to_parquet"]
