"""Invariant tests for the §7.5 extensions: dedup recall, ANN recall,
multimodal plumbing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fastmlframework_spark.core.tables import load_table
from fastmlframework_spark.extensions import dedup as xdedup
from fastmlframework_spark.extensions import multimodal as xmm
from fastmlframework_spark.extensions import similarity as xsim
from fastmlframework_spark.queries.dedup import _corpus


@pytest.fixture(scope="module")
def corpus(spark, sf_dir_small):
    return _corpus(spark, sf_dir_small).cache()


def test_exact_dedup_finds_planted_copies(spark, sf_dir_small, corpus):
    docs = load_table(spark, sf_dir_small, "documents")
    n_docs = docs.count()
    n_exact_copies = docs.filter(F.col("doc_id") % 5 == 0).count()
    out = xdedup.exact_dedup(corpus)
    # groups: every original text (+ its truncated variants are
    # distinct texts) → total distinct texts
    dupes = out.filter(F.col("n_copies") > 1)
    assert dupes.count() == n_exact_copies
    # survivor of each dup group is the ORIGINAL (min id)
    assert dupes.filter(F.col("doc_id") >= 100000).count() == 0
    _ = n_docs


def test_minhash_lsh_catches_exact_copies(corpus):
    pairs = xdedup.minhash_lsh_pairs(
        corpus, n=3, num_hashes=8, bands=4, verify_threshold=0.5
    ).cache()
    # Identical texts have identical signatures → every planted
    # (x, x+100000) copy pair MUST surface with agreement 1.0.
    # (Other high-jaccard pairs may also reach 1.0 — an unbiased
    # estimator occasionally fully agrees at J≈0.8 — so we assert
    # no-miss, not exact-count.)
    planted = corpus.filter(
        (F.col("doc_id") >= 100000) & (F.col("doc_id") < 200000)
    ).select(
        (F.col("doc_id") - 100000).alias("key_a"),
        F.col("doc_id").alias("key_b"),
    )
    found = pairs.filter(F.col("sig_agreement") == 1.0)
    missing = planted.join(found, on=["key_a", "key_b"], how="left_anti")
    assert missing.count() == 0


def test_minhash_agreement_tracks_jaccard(corpus):
    """Signature agreement is a Jaccard estimator: pairs found by LSH
    with full agreement must be exactly the identical-text pairs."""
    sub = corpus.filter(F.col("doc_id") % 500 < 30)
    lsh = xdedup.minhash_lsh_pairs(
        sub, n=3, num_hashes=8, bands=4, verify_threshold=None
    )
    full = lsh.filter(F.col("sig_agreement") == 1.0)
    jac = xdedup.ngram_jaccard_pairs(sub, n=3, threshold=0.999)
    missing = jac.join(full, on=["key_a", "key_b"], how="left_anti").count()
    assert missing == 0


def test_simhash_identical_texts_same_hash(corpus):
    sh = xdedup.simhash(corpus).cache()
    joined = (
        corpus.select(F.col("doc_id").alias("a"), "text")
        .filter(F.col("a") < 500)
        .filter(F.col("a") % 5 == 0)
        .join(
            sh.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha")),
            on="a",
        )
        .join(
            sh.select(
                (F.col("doc_id") - 100000).alias("a"),
                F.col("simhash").alias("hb"),
            ),
            on="a",
        )
    )
    assert joined.filter(F.col("ha") != F.col("hb")).count() == 0


def test_lsh_topk_recall(spark, sf_dir_small):
    emb = load_table(spark, sf_dir_small, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 20)
    exact = xsim.cosine_topk(emb, queries, k=3).cache()
    approx = xsim.lsh_topk(emb, queries, k=3, n_planes=3).cache()
    rec = xsim.recall_at_k(approx, exact)
    # Random embeddings are near-orthogonal, so single-probe recall is
    # ≈ (1 - θ/π)^planes ≈ 0.125 with 3 planes — assert the plumbing
    # beats zero and the estimator is in a sane band, not high recall.
    assert 0.05 < rec <= 1.0
    # every reported neighbor must be a real corpus row with correct rank ties
    assert approx.filter(F.col("rank") > 3).count() == 0


def test_ivf_full_probe_equals_bruteforce(spark, sf_dir_small):
    emb = load_table(spark, sf_dir_small, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    exact = xsim.cosine_topk(emb, queries, k=3)
    ivf = xsim.ivf_topk(emb, queries, k=3, n_clusters=4, n_probe=4)
    diff = exact.exceptAll(ivf).count() + ivf.exceptAll(exact).count()
    assert diff == 0


def test_ivf_partial_probe_reduces_candidates_keeps_recall(spark, sf_dir_small):
    emb = load_table(spark, sf_dir_small, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 20)
    exact = xsim.cosine_topk(emb, queries, k=3)
    ivf1 = xsim.ivf_topk(emb, queries, k=3, n_clusters=8, n_probe=2)
    rec = xsim.recall_at_k(ivf1, exact)
    assert rec > 0.3


def test_ivf_probe_rank1_is_assigned_cell_all_rungs(spark, sf_dir_small):
    """ADVICE r9 regression: probe-cell ranking must use the SAME
    |c|² − 2·v·c score as ``with_cells`` assignment.  With the old
    raw-dot ranking, non-unit-norm Lloyd centers could rank a cell
    OTHER than the query's own assigned cell first, so a planted exact
    copy was not guaranteed to survive n_probe=1.  Now it is, on every
    IVF rung — the strictest form of the planted-top1 contract."""
    emb = load_table(spark, sf_dir_small, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 20)
    planted = emb.unionByName(
        queries.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    )
    for fn in (
        xsim.ivf_topk,
        xsim.ivfpq_topk,
        xsim.ivfsq8_topk,
        xsim.ivfhamming_topk,
    ):
        top1 = fn(planted, queries, k=1, n_clusters=8, n_probe=1)
        rows = {r["query_id"]: r["vec_id"] for r in top1.collect()}
        assert len(rows) == 20, (fn.__name__, sorted(rows))
        assert all(rows[q] == q + 10000 for q in rows), (fn.__name__, rows)


def test_ivf_cell_stats_balance_invariants(spark, sf_dir):
    """VERDICT r9 #6: the production coarse quantizer must stay
    near-balanced on the testdata — a skewed assignment turns every
    probed-cell scan into a hot partition at scale.  Pins: all 8
    cells present and non-empty, shares partition the corpus, and the
    max/mean occupancy ratio (constant per row) stays under 2.0
    (measured 1.09–1.28 across sf0.001/0.01/0.1)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    rows = xsim.ivf_cell_stats(emb, n_clusters=8).collect()
    assert [r["cell"] for r in rows] == list(range(8))
    n_total = emb.count()
    assert sum(r["n_vecs"] for r in rows) == n_total
    assert all(r["n_vecs"] > 0 for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    ratios = {r["imbalance"] for r in rows}
    assert len(ratios) == 1
    ratio = ratios.pop()
    assert 1.0 <= ratio < 2.0, ratio
    mean = n_total / 8.0
    assert abs(ratio - max(r["n_vecs"] for r in rows) / mean) < 1e-6


def test_ivf_recall_curve_invariants(spark, sf_dir_small):
    """The one-pass curve must be monotone non-decreasing in n_probe,
    end at exactly 1.0 (full probe = exact search), start above the
    1/k random floor, and agree with an actually-executed partial
    ivf_topk run at a mid ladder point (the ⟺ of the one-pass fold:
    neighbor's cell probed ⟺ neighbor recovered)."""
    emb = load_table(spark, sf_dir_small, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    curve = {
        r["n_probe"]: r["recall"]
        for r in xsim.ivf_recall_curve(
            emb, queries, k=3, n_clusters=8
        ).collect()
    }
    assert sorted(curve) == list(range(1, 9))
    vals = [curve[n] for n in range(1, 9)]
    assert all(a <= b for a, b in zip(vals, vals[1:])), vals
    assert vals[-1] == 1.0
    assert vals[0] > 0.0
    exact = xsim.cosine_topk(emb, queries, k=3)
    ivf2 = xsim.ivf_topk(emb, queries, k=3, n_clusters=8, n_probe=2)
    # curve values are rounded to 6 decimals; recall_at_k is not
    assert abs(curve[2] - xsim.recall_at_k(ivf2, exact)) < 1e-6


def test_multimodal_plumbing(spark):
    rows = [
        (1, b"\x89PNG fake bytes aaaa", "png"),
        (2, b"RIFF fake wav bytes bbbb", "wav"),
        (3, b"\x00\x00\x00 ftyp fake mp4", "mp4"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "media_bytes", "media_format"])
    out = xmm.extract_media_features(df).cache()
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {1, 2, 3}
    for doc_id, (_, data, fmt) in zip([1, 2, 3], rows):
        assert got[doc_id].n_bytes == len(data)
        assert got[doc_id].media_format == fmt
        assert got[doc_id].feat_width >= 16
    # determinism: same bytes -> same checksum
    out2 = xmm.extract_media_features(df)
    assert out.exceptAll(out2).count() == 0


def test_real_decode_compressed_formats_still_gated(spark):
    # MP4 remains gated (ffmpeg absent); baseline JPEG is decoded
    # natively now (extensions/jpeg.py), so a malformed JPEG payload
    # surfaces a parse error rather than the codec gate.
    df = spark.createDataFrame(
        [(1, b"\x00\x00\x00\x18ftypmp42 fake video", "mp4")],
        ["doc_id", "media_bytes", "media_format"],
    )
    out = xmm.extract_media_features(df, decode="real")
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg|codec"):
        out.collect()

    bad_jpeg = spark.createDataFrame(
        [(1, b"\xff\xd8\xff\xe0 jpeg fake", "jpeg")],
        ["doc_id", "media_bytes", "media_format"],
    )
    with pytest.raises(Exception, match="marker|Huffman|truncated|index"):
        xmm.extract_media_features(bad_jpeg, decode="real").collect()


def _png_bytes(width, height, channels=3, filters=(0, 1, 2, 3, 4)):
    """Hand-rolled PNG encoder (spec filters applied per scanline,
    cycling through ``filters``) so the decoder's five reconstruction
    paths are all exercised against known pixel data."""
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    pixels = bytes((x * 31 + 7) % 256 for x in range(height * stride))
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(stride):
            left = line[x - channels] if x >= channels else 0
            up = prev[x]
            ul = prev[x - channels] if x >= channels else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            raw.append((line[x] - pred) & 0xFF)
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    return png, pixels


def test_real_decode_png_all_filters(spark):
    """decode='real' handles non-interlaced 8-bit PNG via stdlib zlib
    — every spec filter type (None/Sub/Up/Average/Paeth), gray and
    RGB, reconstructed to the exact original pixel checksum."""
    rgb, rgb_pixels = _png_bytes(6, 10, channels=3)
    gray, gray_pixels = _png_bytes(7, 5, channels=1, filters=(4, 3, 1))
    df = spark.createDataFrame(
        [(1, rgb, "png"), (2, gray, "png")],
        ["doc_id", "media_bytes", "media_format"],
    )
    got = {
        r.doc_id: r
        for r in xmm.extract_media_features(df, decode="real").collect()
    }
    assert (got[1].feat_width, got[1].feat_height) == (6, 10)
    assert got[1].feat_checksum == sum(rgb_pixels) % (1 << 40)
    assert (got[2].feat_width, got[2].feat_height) == (7, 5)
    assert got[2].feat_checksum == sum(gray_pixels) % (1 << 40)


def test_real_decode_png_unsupported_variants_raise():
    import struct
    import zlib

    from fastmlframework_spark.extensions.multimodal import real_decode

    png, _ = _png_bytes(4, 4)
    # Flip the IHDR interlace byte (last byte of the 13-byte IHDR
    # payload at offset 8+8+12) and re-CRC to fake an Adam7 file.
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    adam7 = (
        png[:8]
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        + png[8 + 25 :]
    )
    with pytest.raises(NotImplementedError, match="interlaced"):
        real_decode(adam7)


def _ppm_bytes(width, height):
    header = f"P6\n# test\n{width} {height}\n255\n".encode()
    pixels = bytes((x * 7 + 3) % 256 for x in range(width * height * 3))
    return header + pixels, pixels


def _wav_bytes(n_frames, n_channels=2):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(8000)
        frames = bytes(
            (i * 13 + 1) % 256 for i in range(n_frames * n_channels * 2)
        )
        w.writeframes(frames)
    return buf.getvalue(), frames


def test_real_decode_ppm_and_wav(spark):
    """decode='real' genuinely parses netpbm and PCM WAV on
    executors: true dimensions and pixel/sample checksums."""
    ppm, pixels = _ppm_bytes(5, 4)
    wav, frames = _wav_bytes(100, 2)
    df = spark.createDataFrame(
        [(1, ppm, "ppm"), (2, wav, "wav")],
        ["doc_id", "media_bytes", "media_format"],
    )
    got = {
        r.doc_id: r
        for r in xmm.extract_media_features(df, decode="real").collect()
    }
    assert (got[1].feat_width, got[1].feat_height) == (5, 4)
    assert got[1].feat_checksum == sum(pixels) % (1 << 40)
    assert (got[2].feat_width, got[2].feat_height) == (100, 2)
    assert got[2].feat_checksum == sum(frames) % (1 << 40)


def test_frame_sampling_plan(spark):
    df = spark.createDataFrame([(1, 100), (2, 10), (3, 0)], ["doc_id", "n_frames"])
    out = xmm.sample_frames(df, every=30)
    got = {(r.doc_id, r.frame_idx) for r in out.collect()}
    assert got == {(1, 0), (1, 30), (1, 60), (1, 90), (2, 0), (3, 0)}


def test_connected_components_chain_and_clique(spark):
    """Min-label propagation must cross multi-hop chains (diameter >
    1), not just dup cliques: chain 1-2-3-4-5 plus clique {10,11,12}
    plus isolated pair {20,21}."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        "key_a long, key_b long",
    )
    cc = {r.node: r.component for r in
          xdedup.connected_components(edges).collect()}
    assert {cc[n] for n in (1, 2, 3, 4, 5)} == {1}
    assert {cc[n] for n in (10, 11, 12)} == {10}
    assert {cc[n] for n in (20, 21)} == {20}


def test_lsh_dup_pairs_full_recall_on_exact_copies(spark, sf_dir_small):
    """Identical vectors share every hyperplane sign → the bucketed
    path must find ALL planted exact-copy pairs that the exact
    all-pairs scan finds at cosine >= 0.999."""
    emb = load_table(spark, sf_dir_small, "embeddings").select(
        "vec_id", "embedding"
    )
    corpus = emb.unionByName(
        emb.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
        )
    )
    planted = corpus.filter(F.col("vec_id") >= 10000).select(
        (F.col("vec_id") - 10000).alias("key_a"),
        F.col("vec_id").alias("key_b"),
    )
    found = xdedup.lsh_dup_pairs(corpus, threshold=0.999, n_planes=6).cache()
    missing = planted.join(found, on=["key_a", "key_b"], how="left_anti")
    assert missing.count() == 0
    # bucketed candidates are a SUBSET of the exact pair scan, and
    # recall vs the exact oracle clears the 0.9 bar (near-identical
    # vectors share every hyperplane sign with high probability)
    exact = xdedup.embedding_dup_pairs(corpus, threshold=0.999).cache()
    extra = found.join(exact, on=["key_a", "key_b"], how="left_anti")
    assert extra.count() == 0
    n_exact = exact.count()
    n_hit = exact.join(found, on=["key_a", "key_b"], how="left_semi").count()
    assert n_exact > 0 and n_hit / n_exact >= 0.9


def test_embedding_dup_pairs_guards_quadratic_blowup(spark, sf_dir_small):
    """The exact all-pairs path is the oracle only: above max_rows it
    must refuse to launch the cartesian join."""
    emb = load_table(spark, sf_dir_small, "embeddings").select(
        "vec_id", "embedding"
    )
    with pytest.raises(ValueError, match="max_rows"):
        xdedup.embedding_dup_pairs(emb, threshold=0.999, max_rows=10)


def test_connected_components_raises_on_non_convergence(spark):
    """Diameter > max_iter must raise, never silently return wrong
    component ids (a path graph of 6 nodes has diameter 5)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "key_a long, key_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        xdedup.connected_components(edges, max_iter=2)


def test_one_hot_single_collect_job(spark, monkeypatch):
    """OHE over N columns must issue exactly ONE driver round-trip
    (a single combined collect_set agg), not one distinct() per column."""
    from fastmlframework_spark.operators.transforms import one_hot_columns

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "a", "z")], "id long, c1 string, c2 string"
    )
    # Patch the CONCRETE DataFrame class (Spark 4 classic mode
    # subclasses pyspark.sql.DataFrame, which would not intercept).
    cls = type(df)
    calls = {"n": 0}
    orig = cls.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(cls, "collect", counting)
    out = one_hot_columns(df, ["c1", "c2"])
    cols = set(out.columns)
    assert {"C1_A", "C1_B", "C2_X", "C2_Y", "C2_Z"} <= cols
    assert calls["n"] == 1
    monkeypatch.undo()
    row = {r.id: r for r in out.collect()}
    assert (row[1].C1_A, row[1].C1_B, row[3].C2_Z) == (1, 0, 1)


def test_one_hot_max_categories_guard(spark):
    from fastmlframework_spark.operators.transforms import one_hot_columns

    df = spark.range(50).withColumn("c", F.concat(F.lit("v"), F.col("id")))
    with pytest.raises(ValueError, match="max_categories"):
        one_hot_columns(df, ["c"], max_categories=10)


def test_knn_graph_matches_cosine_topk(spark, sf_dir_small):
    """The symmetric half-pair knn_graph must produce exactly the
    all-pairs cosine_topk result (same candidates, same ranks)."""
    emb = (
        load_table(spark, sf_dir_small, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < 120)
    )
    g = xsim.knn_graph(emb, k=4)
    ref = xsim.cosine_topk(emb, emb, k=4)
    assert g.count() == ref.count()
    assert g.exceptAll(ref).count() + ref.exceptAll(g).count() == 0


def test_multiprobe_lsh_dominates_single_probe(spark, sf_dir_small):
    """Multi-probe recall vs brute force must be >= single-probe
    recall (probing hamming-1 neighbor buckets only ADDS candidates)."""
    emb = load_table(spark, sf_dir_small, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 25)
    exact = xsim.cosine_topk(emb, queries, k=3)
    single = xsim.lsh_topk(emb, queries, k=3, n_planes=4)
    multi = xsim.lsh_topk_multiprobe(emb, queries, k=3, n_planes=4)
    r1 = xsim.recall_at_k(single, exact)
    rm = xsim.recall_at_k(multi, exact)
    assert rm >= r1
    # 5 probes of 16 buckets: ~3x the candidate space of single-probe
    # (measured ~0.47 vs ~0.15 on near-orthogonal random embeddings).
    assert rm > 0.35


def test_prefix_jaccard_equals_full_index(corpus):
    """PPJoin-style prefix filtering must produce exactly the full
    inverted-index join's pairs at every threshold tried."""
    sub = corpus.filter(F.col("doc_id") % 500 < 40)
    for t in (0.3, 0.6, 0.9):
        full = xdedup.ngram_jaccard_pairs(sub, n=3, threshold=t)
        pref = xdedup.ngram_jaccard_pairs_prefix(sub, n=3, threshold=t)
        diff = full.exceptAll(pref).count() + pref.exceptAll(full).count()
        assert diff == 0, f"threshold {t}"


def test_pq_topk_recall_and_guards(spark, sf_dir):
    """PQ+refine recall contract vs brute force (defaults measured
    0.85 at sf0.01; 0.7 leaves margin for codebook seed drift), and
    the m-divides-dim guard."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 20)
    exact = xsim.cosine_topk(emb, queries, k=5)
    pq = xsim.pq_topk(emb, queries, k=5)
    assert xsim.recall_at_k(pq, exact) >= 0.7
    with pytest.raises(ValueError, match="must divide"):
        xsim.pq_topk(emb, queries, m=7)


def test_incremental_dedup_drop_classes(spark):
    seen_rows = [("a",), ("b",), ("c",)]
    seen = spark.createDataFrame(seen_rows, "t string").select(
        F.md5("t").alias("digest")
    )
    batch = spark.createDataFrame(
        [(10, "a"), (11, "x"), (12, "x"), (13, "y"), (14, None)],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["n_copies"]
        for r in xdedup.incremental_exact_dedup(batch, seen).collect()
    }
    # "a" collides with the index → dropped; "x" collapses within the
    # batch to min key 11 with 2 copies; "y" is new; NULL text is
    # dropped up front (documented contract).
    assert got == {11: 2, 13: 1}


def test_incremental_dedup_broadcasts_batch_not_index(spark, sf_dir_small):
    """The digest index (the corpus-sized side) must be probed with a
    broadcast of the batch digests, never shuffled by the operator's
    joins: both operator joins are broadcast joins."""
    from fastmlframework_spark.queries.registry import all_queries

    df = all_queries()["dedup_incremental_batch"](spark, sf_dir_small)
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_hash_sample_deterministic_across_partitioning(spark):
    """The quantizer fit sample must not depend on partition layout
    (review r4: hash-bucket ties were broken by collect order)."""
    import pyspark.sql.functions as F

    from fastmlframework_spark.extensions.similarity import hash_sample_rows

    df = spark.range(0, 50_000).select(
        F.col("id").alias("vec_id"), F.array(F.col("id") * 1.0).alias("v")
    )
    a = hash_sample_rows(df.repartition(3), "vec_id", "v", cap=5000, seed=7)
    b = hash_sample_rows(df.repartition(17), "vec_id", "v", cap=5000, seed=7)
    assert a == b
    assert len(a) == 5000


def test_lloyd_empty_sample_raises_clearly():
    import pytest as _pytest

    from fastmlframework_spark.extensions.similarity import lloyd_centers

    with _pytest.raises(ValueError, match="empty fit sample"):
        lloyd_centers([], 4)


def test_embedding_lsh_oracle_corpus_size_assumption(spark, sf_dir):
    """The dedup_embedding_lsh oracle inlines the adaptive plane count
    for a 550-row sf0.01 planted corpus; if the driver fixture ever
    changes size past a plane-count boundary, fail HERE with a clear
    message instead of with an opaque driver hash mismatch."""
    from fastmlframework_spark.extensions.dedup import adaptive_n_planes
    from fastmlframework_spark.queries.dedup import (
        _ORACLE_EMBED_CORPUS_ROWS,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count() + emb.filter(F.col("vec_id") % 10 == 0).count()
    assert adaptive_n_planes(n) == adaptive_n_planes(
        _ORACLE_EMBED_CORPUS_ROWS
    ), (
        f"sf0.01 planted corpus now has {n} rows; regenerate the "
        "dedup_embedding_lsh oracle plane count"
    )


def test_ivfpq_full_probe_equals_pq(spark, sf_dir):
    """With n_probe = n_clusters (raw-vector codes) the probed cells
    cover the corpus, so IVF-PQ must equal pq_topk row-for-row at the
    same PQ parameters — the degenerate-exactness contract that lets
    ann_topk_ivfpq share the hash-matched PQ oracle."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    pq = xsim.pq_topk(emb, queries, k=3)
    ivfpq = xsim.ivfpq_topk(emb, queries, k=3, n_clusters=4, n_probe=4)
    diff = pq.exceptAll(ivfpq).count() + ivfpq.exceptAll(pq).count()
    assert diff == 0


def test_ivfpq_partial_probe_recall_and_guards(spark, sf_dir):
    """Partial probes (2 of 8 cells) keep useful recall vs brute
    force while scanning a fraction of the corpus; m must divide
    dim.  Near-orthogonal random embeddings are IVF's worst case
    (true neighbors scatter across cells — same reason the
    multiprobe test bars at 0.35); measured 0.45 here, floor 0.35
    for codebook seed drift."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 20)
    exact = xsim.cosine_topk(emb, queries, k=5)
    approx = xsim.ivfpq_topk(emb, queries, k=5, n_clusters=8, n_probe=2)
    assert xsim.recall_at_k(approx, exact) >= 0.35
    with pytest.raises(ValueError, match="must divide"):
        xsim.ivfpq_topk(emb, queries, m=7)


def test_ivfsq8_full_probe_equals_sq8(spark, sf_dir):
    """With n_probe = n_clusters the probed cells cover the corpus, so
    IVF-SQ8 must equal sq8_topk row-for-row at the same (k, refine) —
    the degenerate-exactness contract that lets ann_topk_ivfsq8 share
    the flat SQ8 hash-matched oracle."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    flat = xsim.sq8_topk(emb, queries, k=3, refine=4)
    ivf = xsim.ivfsq8_topk(
        emb, queries, k=3, n_clusters=4, n_probe=4, refine=4
    )
    diff = flat.exceptAll(ivf).count() + ivf.exceptAll(flat).count()
    assert diff == 0


def test_ivfsq8_partial_probe_recall_and_candidate_cut(spark, sf_dir):
    """Partial probes (2 of 8 cells) keep useful recall vs brute force
    while the SQ8 scan touches a FRACTION of the corpus — the
    sublinear-candidates contract that distinguishes IVF-SQ8 from the
    flat scan.  Near-orthogonal random embeddings are IVF's worst case
    (neighbors scatter across cells), so the floor mirrors the IVF-PQ
    test's 0.35.  The candidate cut is checked structurally: rows
    surviving the cell join are counted per query and must stay well
    under the full corpus."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 20)
    exact = xsim.cosine_topk(emb, queries, k=5)
    approx = xsim.ivfsq8_topk(
        emb, queries, k=5, n_clusters=8, n_probe=2
    )
    assert xsim.recall_at_k(approx, exact) >= 0.35

    # Structural candidate cut: probing 2 of 8 cells scans only the
    # probed cells' rows.  Count them via the same assignment path.
    dim = xsim.vec_dim(emb, "embedding")
    c = xsim.normalize(emb, "embedding", "cv").select("vec_id", "cv")
    centers = xsim.lloyd_centers(
        xsim.hash_sample_rows(c, "vec_id", "cv", seed=7), 8, seed=7
    )
    assigned = xsim.with_cells(c, "cv", [("cell", centers, 0)])
    cell_sizes = {
        r["cell"]: r["n"]
        for r in assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    total = sum(cell_sizes.values())
    # any 2 cells cover < the whole corpus by a real margin
    worst_two = sum(sorted(cell_sizes.values())[-2:])
    assert worst_two < 0.8 * total, (worst_two, total)


def test_ivfhamming_full_probe_equals_hamming(spark, sf_dir):
    """With n_probe = n_clusters the probed cells cover the corpus, so
    IVF-Hamming must equal hamming_topk row-for-row at the same
    (k, refine) — the degenerate-exactness contract that lets
    ann_topk_ivfhamming share the flat Hamming integer-exact oracle."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    flat = xsim.hamming_topk(emb, queries, k=3, refine=8)
    ivf = xsim.ivfhamming_topk(
        emb, queries, k=3, n_clusters=4, n_probe=4, refine=8
    )
    diff = flat.exceptAll(ivf).count() + ivf.exceptAll(flat).count()
    assert diff == 0


def test_ivfhamming_partial_probe_planted_and_recall(spark, sf_dir_small):
    """Pruned path: 1-bit signatures are coarse, so the recall floor
    mirrors the flat Hamming test's 0.3 band under a 2-of-8 cell cut
    with a planted copy guaranteeing the hard contract — the copy has
    Hamming distance 0 in the query's own nearest cell and must
    re-rank to top-1 at cosine 1.0."""
    emb = load_table(spark, sf_dir_small, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 20)
    planted = emb.unionByName(
        queries.select(
            (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
        )
    )
    top1 = xsim.ivfhamming_topk(
        planted, queries, k=1, n_clusters=8, n_probe=2
    )
    rows = {r["query_id"]: r["vec_id"] for r in top1.collect()}
    assert all(rows[qid] == qid + 10000 for qid in rows), rows
    assert len(rows) == 20


def test_hard_negatives_labels_and_planted_order(spark):
    """Planted geometry: query q (label 0) sits nearest to n1
    (label 1), then n2 (label 2); s0 (label 0) is MOST similar of
    all but must be excluded — same-label vectors are never
    negatives."""
    rows = [
        (0, [1.0, 0.0, 0.0], 0),        # query
        (1, [0.999, 0.045, 0.0], 0),    # same label, closest overall
        (2, [0.9, 0.43, 0.0], 1),       # hard negative 1
        (3, [0.7, 0.71, 0.0], 2),       # hard negative 2
        (4, [0.0, 1.0, 0.0], 1),        # easy negative
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = xsim.hard_negatives(
        df, df.filter(F.col("vec_id") == 0), k=2
    ).collect()
    assert [(r.vec_id, r.neg_label, r.rank) for r in out] == [
        (2, 1, 1),
        (3, 2, 2),
    ]
    assert all(r.query_label == 0 for r in out)


def test_label_prototypes_are_per_label_means(spark):
    rows = [
        (0, [1.0, 3.0], 0),
        (1, [3.0, 5.0], 0),
        (2, [10.0, -2.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r.label: (r.n, [round(v, 9) for v in r.centroid])
        for r in xsim.label_prototypes(df).collect()
    }
    assert got == {0: (2, [2.0, 4.0]), 1: (1, [10.0, -2.0])}


def test_prototype_outliers_rank_least_prototypical_first(spark):
    """Three label-0 vectors around +x and one flipped to −x: the
    flipped vector has the lowest cosine to the label mean and must
    rank 1."""
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.95, 0.3], 0),
        (2, [-1.0, 0.05], 0),   # the outlier
        (3, [0.9, -0.4], 0),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = xsim.prototype_outliers(df, k=4).collect()
    assert out[0].vec_id == 2 and out[0].rank == 1
    assert [r.rank for r in out] == [1, 2, 3, 4]
    cs = [r.cos_centroid for r in out]
    assert cs == sorted(cs)


def test_sq8_topk_recall_and_planted_copy(spark, sf_dir_small):
    """SQ8 quantizes each dimension to 256 levels, so on random
    near-orthogonal embeddings the approximate ordering should be
    close to exact — recall@3 well above the LSH single-probe band —
    and an exact planted copy must come back as the top-1 neighbor
    (identical vector → identical codes → shortlist membership by the
    widest possible margin, then exact re-rank)."""
    emb = load_table(spark, sf_dir_small, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 20)
    exact = xsim.cosine_topk(emb, queries, k=3)
    sq8 = xsim.sq8_topk(emb, queries, k=3, refine=4)
    rec = xsim.recall_at_k(sq8, exact)
    assert rec > 0.85, rec

    planted = emb.unionByName(
        queries.select(
            (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
        )
    )
    top1 = xsim.sq8_topk(planted, queries, k=1, refine=4)
    rows = {r["query_id"]: r["vec_id"] for r in top1.collect()}
    assert all(rows[qid] == qid + 10000 for qid in rows), rows
    assert len(rows) == 20


def test_sq8_index_is_packed_longs_and_lossless(spark, sf_dir_small):
    """The SQ8 index artifact stores 7 byte-codes per BIGINT word
    (VERDICT r8 #3): pin the packed column TYPE (array<bigint>, not
    array<double>), the word count (ceil(dim/7)), the ~8× size shape,
    and losslessness — unpacking every word byte-by-byte must return
    exactly the clamped floor() code each dimension quantizes to."""
    emb = load_table(spark, sf_dir_small, "embeddings").select(
        "vec_id", "embedding"
    )
    dim = xsim.vec_dim(emb, "embedding")
    c = xsim.normalize(emb, "embedding", "cv").select("vec_id", "cv")
    enc = xsim.sq8_encode(c, dim)

    field = dict(zip(enc.schema.names, enc.schema.fields))["__packed"]
    assert field.dataType.simpleString() == "array<bigint>", field.dataType
    n_words = xsim.sq8_words(dim)
    assert n_words == (dim + 6) // 7
    # 64 dims → 10 longs = 80 bytes/vector vs 512 raw doubles: a 6.4×
    # cut (7 codes/long; a full 8× would need the sign byte, which
    # overflows DuckDB's checked shift in the oracle twin).
    assert n_words * 8 * 6 <= dim * 8

    # Losslessness: unpacked bytes == directly computed codes, and the
    # dequantize expression reproduces the dim-length midpoint array.
    checked = (
        enc.join(c, on="vec_id")
        .withColumn(
            "__codes_direct",
            F.expr(
                "transform(cv, (x, i) -> CAST(least(255.0D, greatest("
                "0.0D, floor((x - __lo[i]) / __st[i]))) AS BIGINT))"
            ),
        )
        .withColumn(
            "__codes_unpacked",
            F.expr(
                "flatten(transform(__packed, (wd, wi) -> "
                f"transform(sequence(0, least(6, {dim - 1} - wi * 7)), "
                "j -> (wd >> (j * 8)) & 255)))"
            ),
        )
        .withColumn("__deq", F.expr(xsim.sq8_dequantize_expr(dim)))
        .agg(
            F.sum(
                (F.col("__codes_direct") != F.col("__codes_unpacked"))
                .cast("long")
            ).alias("mismatch"),
            F.sum((F.size("__deq") != dim).cast("long")).alias("badlen"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    assert checked["mismatch"] == 0 and checked["badlen"] == 0
    assert checked["n"] > 0


def test_hamming_topk_recall_and_planted_copy(spark, sf_dir_small):
    """1-bit signatures are coarse on random near-orthogonal vectors —
    assert a moderate recall floor at refine=8 (well above chance) and
    the hard contract: an exact planted copy has Hamming distance 0,
    so it must survive the shortlist and re-rank to top-1."""
    emb = load_table(spark, sf_dir_small, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 20)
    exact = xsim.cosine_topk(emb, queries, k=3)
    ham = xsim.hamming_topk(emb, queries, k=3, refine=8)
    rec = xsim.recall_at_k(ham, exact)
    assert rec > 0.3, rec

    planted = emb.unionByName(
        queries.select(
            (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
        )
    )
    top1 = xsim.hamming_topk(planted, queries, k=1, refine=8)
    rows = {r["query_id"]: r["vec_id"] for r in top1.collect()}
    assert all(rows[qid] == qid + 10000 for qid in rows), rows
    assert len(rows) == 20


def test_ann_ladder_example_end_to_end(spark, sf_dir_small):
    """The runnable ANN-ladder example: every rung drains against the
    shared brute-force ground truth; the exact rung must score recall
    1.0 and every approximate rung a valid recall in [0, 1]."""
    import sys

    sys.path.insert(0, "/root/repo/examples")
    from run_ann_ladder import run

    res = run(spark, sf_dir_small, k=3, n_queries=10)
    assert set(res) == {
        "bruteforce", "lsh", "hamming", "sq8", "pq",
        "ivf(2/8)", "ivf-hamming(2/8)", "ivf-sq8(2/8)", "ivf-pq(2/8)",
    }
    assert res["bruteforce"]["recall"] == 1.0
    for name, r in res.items():
        assert 0.0 <= r["recall"] <= 1.0 and r["sec"] > 0, (name, r)


def test_kmeans_lloyd_quantized_recovers_planted_blobs(spark):
    """The quantized distributed Lloyd is a REAL clustering: on four
    well-separated planted blobs it must be bit-deterministic across
    runs and recover the blob partition (near-perfect majority-label
    purity) within a few iterations."""
    from fastmlframework_spark.extensions.similarity import (
        kmeans_lloyd_quantized,
    )

    centers = [
        [10.0, 0.0, 0.0, 0.0],
        [0.0, 10.0, 0.0, 0.0],
        [0.0, 0.0, 10.0, 0.0],
        [0.0, 0.0, 0.0, 10.0],
    ]
    rows = []
    for i in range(800):
        b = i % 4
        off = [
            ((i * 7 + d * 13) % 11 - 5) / 10.0 for d in range(4)
        ]  # deterministic jitter in [-0.5, 0.5]
        rows.append(
            (i, b, [float(c + o) for c, o in zip(centers[b], off)])
        )
    df = spark.createDataFrame(
        rows, "vec_id long, blob int, embedding array<float>"
    )
    out1 = kmeans_lloyd_quantized(
        df.select("vec_id", "embedding"), k=4, iters=3
    )
    rows1 = {r.vec_id: (r.cluster, r.dist) for r in out1.collect()}
    out2 = kmeans_lloyd_quantized(
        df.select("vec_id", "embedding"), k=4, iters=3
    )
    rows2 = {r.vec_id: (r.cluster, r.dist) for r in out2.collect()}
    assert rows1 == rows2  # bit-deterministic, incl. distances

    blobs = {i: b for i, b, _ in rows}
    per_cluster: dict = {}
    for vid, (c, _) in rows1.items():
        per_cluster.setdefault(c, []).append(blobs[vid])
    agree = sum(
        max(ls.count(v) for v in set(ls)) for ls in per_cluster.values()
    )
    assert agree / len(rows1) > 0.95, per_cluster.keys()


def test_kmeans_lloyd_update_shuffle_is_dim_bounded(spark):
    """The centroid-update aggregate must partially aggregate
    map-side: a partial_sum HashAggregate on (cluster, dim) keys sits
    below the exchange, so shuffle rows are bounded by k·dim counters,
    never corpus rows."""
    import pyspark.sql.functions as F

    from fastmlframework_spark.extensions.similarity import KMEANS_QUANT

    df = spark.range(1000).select(
        (F.col("id") % 4).alias("__c"),
        F.posexplode(
            F.array(*[(F.col("id") % 7).cast("double") for _ in range(8)])
        ).alias("__j", "__x"),
    )
    agg = df.groupBy("__c", "__j").agg(
        F.sum(
            F.round(F.col("__x") * F.lit(KMEANS_QUANT), 0).cast(
                "decimal(38,0)"
            )
        ).alias("s")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    ex = [i for i, l in enumerate(lines) if "Exchange hashpartitioning" in l]
    assert ex, plan
    below = "\n".join(lines[ex[0] + 1:])
    assert "partial_sum" in below, plan


def test_kmeans_guards_empty_and_null_vectors(spark):
    """ADVICE r12: an empty input frame and a NULL/empty first vector
    must both raise the intended ValueError, not a TypeError from the
    dim probe."""
    import pytest as _pytest

    from fastmlframework_spark.extensions.similarity import (
        kmeans_lloyd_quantized,
    )

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="at least k"):
        kmeans_lloyd_quantized(empty, k=2, iters=1)

    nulled = spark.createDataFrame(
        [(1, None), (2, [1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="non-NULL"):
        kmeans_lloyd_quantized(nulled, k=2, iters=1)
