"""Registry entry for the multimodal plumbing (§7.5).

The driver testdata has no binary media columns, so the query derives
an opaque ``binary`` column from the documents table (utf-8 bytes as
stand-in media payloads — same schema/partitioning/batch shape as real
image bytes).  The decode step is the deterministic fake from
``extensions.multimodal`` (codec libraries absent in this container),
so the check is rows-only: the Spark-side contract — binary column →
``mapInPandas`` feature extraction → typed aggregate — is exactly what
a real decoder would run through.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.extensions.multimodal import extract_media_features
from fastmlframework_spark.queries.registry import query


@query("multimodal_features", bench=True)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → per-format feature aggregate:
    [media_format, n_items, avg_bytes, avg_width, avg_height]."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode("text", "utf-8").alias("media_bytes"),
        F.concat(F.lit("fake/"), F.col("lang")).alias("media_format"),
    )
    feats = extract_media_features(
        docs,
        key_col="doc_id",
        bytes_col="media_bytes",
        format_col="media_format",
    )
    return (
        feats.groupBy("media_format")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
            F.round(F.avg("feat_width"), 4).alias("avg_width"),
            F.round(F.avg("feat_height"), 4).alias("avg_height"),
        )
        .orderBy("media_format")
    )
