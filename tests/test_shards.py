"""Training-shard writer: range-disjoint sorted shards whose
file-order traversal reproduces the deterministic global shuffle."""

from __future__ import annotations

import pyspark.sql.functions as F

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.extensions.curation import shuffle_order
from fastmlframework_spark.sources.shards import (
    read_in_training_order,
    read_manifest,
    write_training_shards,
)


def test_shards_cover_disjoint_sorted_ranges(spark, sf_dir_small, tmp_path):
    docs = load_table(spark, sf_dir_small, "documents").select("doc_id", "text")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, n_shards=4)

    assert manifest["total_rows"] == docs.count()
    assert manifest["n_shards"] >= 2
    # Range disjointness: shard i's max key < shard i+1's min key.
    shards = manifest["shards"]
    for a, b in zip(shards, shards[1:]):
        assert a["max_key"] < b["min_key"]
    assert read_manifest(path) == manifest


def test_traversal_reproduces_global_shuffle(spark, sf_dir_small, tmp_path):
    docs = load_table(spark, sf_dir_small, "documents").select("doc_id", "text")
    path = str(tmp_path / "shards2")
    write_training_shards(docs, path, n_shards=4)

    tagged = read_in_training_order(spark, path)
    traversal = [
        r.doc_id
        for r in tagged.orderBy("shard_idx", "sort_key", "doc_id").collect()
    ]
    expected = [
        r.doc_id for r in shuffle_order(docs).orderBy("rank").collect()
    ]
    assert traversal == expected
