"""Format-pluggable table sink/scan (SURVEY.md §2.1 breadth).

The reference pipeline reads CSV and writes CSV/parquet-shaped
artifacts (data_loaders.py, prediction.py save paths); at cluster
scale the same tables also move through ORC (the other splittable
columnar format Spark ships natively) and occasionally JSON-lines.
One writer/reader pair covers them uniformly so pipeline code is
format-agnostic:

- ``parquet`` / ``orc``: columnar, compressed, splittable — both
  support predicate pushdown and column pruning in the scan
  (PushedFilters/ReadSchema in the plan), so a 2-column projection
  with a selective filter touches a fraction of the bytes.
- ``csv`` / ``json``: interchange formats; header+schema round-trip
  for CSV, schema inference avoided on read by passing the writer's
  schema back (inference is a full extra pass at 100 TB).

``avro`` is gated: Spark needs the external spark-avro package,
absent in this environment — requesting it raises with the package
coordinates rather than failing inside the JVM.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_NATIVE = ("parquet", "orc", "csv", "json")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """Write ``df`` at ``path`` in ``fmt``; hive-style partition dirs
    via ``partition_by`` (pruning-friendly at scale for every native
    format)."""
    if fmt == "avro":
        raise ValueError(
            "avro needs the external org.apache.spark:spark-avro package "
            "(--packages); not available in this environment"
        )
    if fmt not in _NATIVE:
        raise ValueError(f"unsupported format {fmt!r}; one of {_NATIVE}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
) -> DataFrame:
    """Read a table written by ``write_table``.  For CSV/JSON pass the
    writer's ``schema`` — otherwise Spark runs a full inference pass
    over the data (and CSV would stringify everything without it)."""
    if fmt not in _NATIVE:
        raise ValueError(f"unsupported format {fmt!r}; one of {_NATIVE}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    return reader.format(fmt).load(path)
