"""The PQ oracle twin's fit replication must be BIT-exact: same
sample, same order, same codebooks as pq_topk's internal driver-side
fit — otherwise the inlined literals drift from the Spark plan and the
hash oracle silently rots when either side changes."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_fit_codebooks_matches_spark_fit(spark, sf_dir):
    from fastmlframework_spark.extensions.similarity import (
        hash_sample_rows,
        lloyd_centers,
        normalize,
        vec_dim,
    )
    from fastmlframework_spark.queries.pq_sql import fit_codebooks

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = vec_dim(emb, "embedding")
    m, n_codes, seed, max_iter = 8, 32, 7, 2
    sub = dim // m
    c = normalize(emb, "embedding", "cv").select("vec_id", "cv")
    sample = hash_sample_rows(c, "vec_id", "cv", seed=seed)
    spark_centers = [
        lloyd_centers(
            [row[s * sub: (s + 1) * sub] for row in sample],
            n_codes,
            seed=seed + s,
            max_iter=max_iter,
        )
        for s in range(m)
    ]
    twin_centers = fit_codebooks(sf_dir, m, n_codes, seed, max_iter)
    assert twin_centers == spark_centers  # exact float equality
