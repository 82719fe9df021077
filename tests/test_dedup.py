

def test_minhash_band_index_excludes_null_text(spark):
    """NULL-text docs must not enter the persisted LSH index: all-NULL
    minhash slots digest to one CONSTANT xxhash64 value, so every
    contentless corpus doc would share a single polluted bucket."""
    from fastmlframework_spark.extensions.dedup import minhash_band_index

    rows = [(1, "the quick brown fox jumps"), (2, None), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_band_index(df).collect()
    assert {r["doc_id"] for r in out} == {1}
