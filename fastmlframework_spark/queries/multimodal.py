"""Registry entry for the multimodal plumbing (§7.5).

The driver testdata has no binary media columns, so the query derives
an opaque ``binary`` column from the documents table (utf-8 bytes as
stand-in media payloads — same schema/partitioning/batch shape as real
image bytes).  The decode step is the deterministic fake from
``extensions.multimodal`` (codec libraries absent in this container) —
but the fake is a pure polynomial byte hash, so the WHOLE pipeline
(binary column → Arrow-batched ``mapInPandas`` feature extraction →
typed aggregate) has an exact DuckDB twin via ``list_reduce`` over the
character codes (documents are ASCII; byte == char code).  This
upgrades the check from rows-only to a full driver-verified oracle:
the Pandas-UDF path itself is hash-checked cross-engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.extensions.multimodal import extract_media_features
from fastmlframework_spark.queries.registry import query


_MM_ORACLE = """
WITH f AS (
  SELECT doc_id,
         'fake/' || lang AS media_format,
         octet_length(encode(text)) AS n_bytes,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(split(substring(text, 1, 4096), ''),
                            c -> CAST(ascii(c) AS BIGINT))),
           (acc, x) -> (acc * 131 + x) % 1099511627776) AS checksum
  FROM documents
)
SELECT media_format,
       COUNT(*) AS n_items,
       ROUND(AVG(n_bytes), 4) AS avg_bytes,
       ROUND(AVG(16 + checksum % 1024), 4) AS avg_width,
       ROUND(AVG(16 + (checksum // 1024) % 1024), 4) AS avg_height
FROM f
GROUP BY media_format
ORDER BY media_format
"""


@query("multimodal_features", oracle=_MM_ORACLE, bench=True)
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


@query(
    "multimodal_frame_sample",
    oracle="""
WITH vids AS (
  SELECT doc_id, CAST(n_chars % 200 AS BIGINT) AS n_frames
  FROM documents WHERE doc_id % 10 = 0
)
SELECT doc_id, CAST(unnest(range(0, GREATEST(n_frames - 1, 0) + 1, 30)) AS BIGINT) AS frame_idx
FROM vids
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (every-30th frame index per media row,
    always including frame 0): pure explode-of-sequence expression —
    the candidate list a frame decoder would join against the binary
    column.  Frame counts derive deterministically from documents so
    both engines see identical inputs."""
    from fastmlframework_spark.extensions.multimodal import sample_frames

    vids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", (F.col("n_chars") % 200).cast("long").alias("n_frames"))
    )
    return sample_frames(vids, every=30).select(
        "doc_id", F.col("frame_idx").cast("long").alias("frame_idx")
    )
