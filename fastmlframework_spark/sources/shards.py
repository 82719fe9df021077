"""Training-shard materialization: the deterministic global shuffle
(`extensions/curation.py::shuffle_order`) written out as range-sharded,
internally-sorted parquet plus a JSON manifest.

A trainer consumes shards in file order and rows in within-file order;
because shards are RANGE-partitioned on the shuffle hash and sorted
within, that traversal IS the global md5(key||salt) permutation — no
reader-side shuffle, no rank column join.  Each shard is one
independent file: data loaders stream them in parallel, resume
mid-epoch by (shard, offset), and re-shuffle between epochs by salt
change (a new write, same machinery).

Scale: the write is one range-partitioned sort (Spark's distributed
sort path); the manifest aggregates per-shard counts and hash bounds —
#shards rows through the driver, never data."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "shuf7",
    sort_col: str = "sort_key",
) -> dict:
    """Write ``n_shards`` parquet shards in global md5(key||salt)
    order; returns (and writes) the manifest dict.  The shuffle hash
    is persisted as ``sort_col`` so order is verifiable after read."""
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt)))
    (
        df.withColumn(sort_col, h)
        .repartitionByRange(n_shards, sort_col, key_col)
        .sortWithinPartitions(sort_col, key_col)
        .write.mode("overwrite")
        .parquet(path)
    )
    back = df.sparkSession.read.parquet(path)
    per_file = (
        back.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(sort_col).alias("min_key"),
            F.max(sort_col).alias("max_key"),
        )
        .orderBy("min_key")
        .collect()
    )
    manifest = {
        "n_shards": len(per_file),
        "total_rows": int(sum(r.n_rows for r in per_file)),
        "salt": salt,
        "sort_col": sort_col,
        "shards": [
            {
                "file": os.path.basename(r.file),
                "n_rows": int(r.n_rows),
                "min_key": r.min_key,
                "max_key": r.max_key,
            }
            for r in per_file
        ],
    }
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, "_manifest.json")) as fh:
        return json.load(fh)


def read_in_training_order(spark: SparkSession, path: str) -> DataFrame:
    """Rows tagged with their shard's manifest position — ordering by
    (shard_idx, sort_col) reproduces the global permutation."""
    manifest = read_manifest(path)
    order = {s["file"]: i for i, s in enumerate(manifest["shards"])}
    df = spark.read.parquet(path)
    mapping = F.create_map(
        *[F.lit(x) for kv in order.items() for x in kv]
    )
    base = F.element_at(
        F.split(F.input_file_name(), "/"), -1
    )
    return df.withColumn("shard_idx", mapping[base])
