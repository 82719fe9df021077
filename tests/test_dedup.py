

def test_minhash_band_index_excludes_null_text(spark):
    """NULL-text docs must not enter the persisted LSH index: all-NULL
    minhash slots digest to one CONSTANT xxhash64 value, so every
    contentless corpus doc would share a single polluted bucket."""
    from fastmlframework_spark.extensions.dedup import minhash_band_index

    rows = [(1, "the quick brown fox jumps"), (2, None), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_band_index(df).collect()
    assert {r["doc_id"] for r in out} == {1}


def test_best_representative_string_keys_and_ties(spark):
    """Survivor selection must work with NON-numeric keys (the old
    tie-break negated the key, which NULLs/errors on strings) and
    resolve equal-length ties to the smallest key."""
    from fastmlframework_spark.extensions.dedup import best_representative

    rows = [
        ("docB", "a much longer text body here"),
        ("docA", "short text"),
        ("docC", "short text"),  # same length as docA -> tie
        ("solo", "alone"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = spark.createDataFrame(
        [("docA", "docB"), ("docA", "docC")], "key_a string, key_b string"
    )
    out = {
        r.cluster: (r.best_key, r.best_len, r.n_members)
        for r in best_representative(df, pairs).collect()
    }
    assert out["docA"] == ("docB", 28, 3)  # longest member wins
    assert out["solo"] == ("solo", 5, 1)  # singleton survives

    # equal-length tie inside one cluster -> smallest key
    df2 = spark.createDataFrame(
        [("z2", "same size!"), ("a1", "same size!")],
        "doc_id string, text string",
    )
    pairs2 = spark.createDataFrame([("a1", "z2")], "key_a string, key_b string")
    (row,) = best_representative(df2, pairs2).collect()
    assert (row.best_key, row.best_len, row.n_members) == ("a1", 10, 2)


def test_containment_catches_subset_duplicates(spark):
    """A document fully embedded in a much longer one: containment
    1.0 (caught at threshold 0.9) while symmetric Jaccard is far
    below any usable near-dup threshold."""
    from fastmlframework_spark.extensions.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(20))
    rows = [
        (1, short),
        (2, short + " " + filler),  # superset: contains all of doc 1
        (3, "totally different words entirely here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    cont = {
        (r.key_a, r.key_b): r.containment
        for r in containment_pairs(df, threshold=0.9).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] == 1.0
    assert all(k == (1, 2) for k in cont)

    # the same pair is invisible to symmetric Jaccard at 0.4
    jacc = {
        (r.key_a, r.key_b)
        for r in ngram_jaccard_pairs(df, threshold=0.4).collect()
    }
    assert (1, 2) not in jacc


def test_cluster_size_histogram_accounts_for_every_doc(spark, sf_dir_small):
    """Histogram mass check: Σ n_docs == corpus size, singletons are
    size-1 rows, and every multi-doc cluster size has n_docs ==
    size * n_clusters."""
    from fastmlframework_spark.queries.dedup import (
        _corpus,
        dedup_cluster_size_hist,
    )

    rows = dedup_cluster_size_hist(spark, sf_dir_small).collect()
    total = _corpus(spark, sf_dir_small).count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters
    # the planted corpus guarantees both singletons and >=2 clusters
    sizes = {r.cluster_size for r in rows}
    assert 1 in sizes and any(s >= 2 for s in sizes)


def test_cross_source_matrix_is_canonical_and_positive(spark, sf_dir_small):
    from fastmlframework_spark.queries.dedup import dedup_cross_source_matrix

    rows = dedup_cross_source_matrix(spark, sf_dir_small).collect()
    assert rows, "planted corpus must produce near-dup pairs"
    for r in rows:
        assert r.source_a <= r.source_b  # unordered pair canonical form
        assert r.n_pairs > 0


def test_semdedup_sweep_is_monotone(spark, sf_dir_small):
    """Tightening the threshold can only shrink the pair set and the
    dropped set (and so grow survivors); the loosest rung must carry
    the planted exact copies."""
    from fastmlframework_spark.queries.dedup import semdedup_threshold_sweep

    rows = sorted(
        semdedup_threshold_sweep(spark, sf_dir_small).collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) >= 2
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_dropped >= b.n_dropped
        assert a.n_survivors <= b.n_survivors
    assert rows[-1].n_pairs > 0  # planted copies sit at cosine 1.0
    for r in rows:
        assert r.n_survivors + r.n_dropped > 0


def test_minhash_calibration_tracks_truth(spark, sf_dir_small):
    """Estimator sanity on the planted corpus: the top decile (exact
    copies, jaccard 1.0) must show ~full signature agreement, and avg
    agreement must be non-decreasing from the bottom decile to the
    top (coarse monotone calibration)."""
    from fastmlframework_spark.queries.dedup import dedup_minhash_calibration

    rows = sorted(
        dedup_minhash_calibration(spark, sf_dir_small).collect(),
        key=lambda r: r.jaccard_decile,
    )
    assert rows
    top = rows[-1]
    assert top.jaccard_decile == 9 and top.avg_sig_agreement >= 0.9
    assert rows[0].avg_sig_agreement <= top.avg_sig_agreement


def test_minhash_recall_curve_recalls_top_decile(spark, sf_dir_small):
    """Banding must retrieve essentially all EXACT copies (top decile
    contains the planted jaccard-1.0 pairs: identical signatures share
    every band), and recall must not decrease from the bottom decile
    to the top (the S-curve shape)."""
    from fastmlframework_spark.queries.dedup import dedup_minhash_recall_curve

    rows = sorted(
        dedup_minhash_recall_curve(spark, sf_dir_small).collect(),
        key=lambda r: r.jaccard_decile,
    )
    assert rows and rows[-1].jaccard_decile == 9
    assert rows[-1].recall == 1.0  # identical docs always band together
    assert rows[0].recall <= rows[-1].recall
    for r in rows:
        assert 0.0 <= r.recall <= 1.0 and r.n_retrieved <= r.n_true_pairs


def test_sorted_neighborhood_finds_prefix_duplicates(spark):
    """Exact copies and prefix truncations share the sort key, so
    they must land inside the window and verify at their true
    Jaccard; an unrelated doc must not pair."""
    from fastmlframework_spark.extensions.dedup import (
        sorted_neighborhood_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base),                                  # exact copy
        (3, base[: int(len(base) * 0.8)]),          # prefix truncation
        (4, "completely different words entirely here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.key_a, r.key_b): r.jaccard
        for r in sorted_neighborhood_pairs(
            df, window=4, n=3, threshold=0.3
        ).collect()
    }
    assert out[(1, 2)] == 1.0
    assert (1, 3) in out and 0.3 <= out[(1, 3)] < 1.0
    assert not any(4 in p for p in out)


def test_sorted_neighborhood_window_and_partition_invariance(spark):
    """Pairs farther than window-1 ranks apart never appear, and the
    result is identical under different input partitioning (the
    global rank is deterministic)."""
    from fastmlframework_spark.extensions.dedup import (
        sorted_neighborhood_pairs,
    )

    # 12 docs in 2 similarity families; sort keys interleave so the
    # block-join (not just same-block luck) must recover neighbors.
    rows = [
        (i, f"{'apple banana cherry' if i % 2 else 'xray yankee zulu'} "
            f"common tail words {i % 3}")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        tuple(r)
        for r in sorted_neighborhood_pairs(
            df, window=3, n=2, threshold=0.2
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in sorted_neighborhood_pairs(
            df.repartition(7), window=3, n=2, threshold=0.2
        ).collect()
    )
    assert a == b and a
    # re-derive ranks to assert the distance bound
    from fastmlframework_spark.extensions.curation import global_rank
    import pyspark.sql.functions as F

    sk = F.substring(
        F.regexp_replace(F.lower(F.col("text")), r"\s+", " "), 1, 24
    )
    ranks = {
        r.doc_id: r.rank
        for r in global_rank(
            df.withColumn("__sk", sk), ["__sk", "doc_id"], ["doc_id"]
        ).collect()
    }
    for ka, kb, _ in a:
        assert abs(ranks[ka] - ranks[kb]) <= 2


def test_sorted_neighborhood_rejects_bad_window(spark):
    import pytest
    from fastmlframework_spark.extensions.dedup import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, window=1)
