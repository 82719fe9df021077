"""Similarity search over embedding columns (SURVEY.md §7.5):
brute-force cosine top-k baseline, random-hyperplane LSH buckets, and
an IVF (KMeans-partitioned) variant as the scale paths.

Scale design: dot products are ``zip_with``/``aggregate`` higher-order
expressions (JVM codegen, no Python).  Brute force broadcasts the
(small) query set against the corpus — one scan, no corpus shuffle.
LSH/IVF cut the candidate space: hyperplane signs or nearest-centroid
assignment bucket the corpus so only same-bucket candidates are
scored — the standard sub-quadratic ANN shapes at 100 TB.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from fastmlframework_spark.core.tables import fan_out

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
_NORM = "transform({v}, x -> x / sqrt(aggregate({v}, 0.0D, (a, e) -> a + e * e)))"


def dot_expr(a: str, b: str, dim: int | None = None) -> str:
    """Dot product of two array columns — the hot inner loop of every
    similarity scan.

    Always the higher-order ``aggregate``/``zip_with`` form.  Measured
    on Spark 4.1 (300k cached rows, dim 64, warm): HOF 0.29 s vs
    unrolled left-assoc multiply-adds 0.92 s vs balanced-tree 0.78 s
    vs Arrow Pandas UDF 0.72 s — the unrolled form's 64 null-checked
    ``GetArrayItem``s defeat codegen, while the HOF loop runs tight
    over the array storage.  ``dim`` is accepted for call-site compat
    but no longer selects an unrolled variant.  Summation order is
    0.0-seeded left-to-right either way, so flipping forms is
    bit-identical and oracle hashes are unaffected."""
    return _DOT.format(a=a, b=b)


def vec_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding width, read from one row (schemas are fixed-width)."""
    return len(df.select(vec_col).first()[0])


def normalize(df: DataFrame, vec_col: str, out_col: str = "nvec") -> DataFrame:
    """L2-normalize so cosine == dot product."""
    return df.withColumn(
        out_col, F.expr(_NORM.format(v=vec_col)).cast("array<double>")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
) -> DataFrame:
    """Brute-force exact top-k → [query_id, vec_id, cosine, rank].

    The query side is broadcast; the corpus is scanned once; per-query
    top-k runs as a partitioned window (rank ties broken by corpus
    key for determinism).  Self-matches (same key) are excluded.

    Scale note (applies to every per-query rank in this module): the
    ``row_number ≤ k`` window does NOT funnel a query's corpus-sized
    candidate set through one task — Spark's rank-limit pushdown
    (WindowGroupLimit, SPARK-37099) inserts a map-side partial top-k
    per (group, partition) BELOW the exchange, so the post-shuffle
    task receives ≤ k × n_partitions rows per query.  Native
    two-phase top-k; a hand-rolled spark_partition_id salt was
    measured to only ADD an exchange.  tests/test_plans.py pins the
    partial WindowGroupLimit so a refactor that defeats the pushdown
    (e.g. rank-filter through an intervening project barrier) fails
    CI."""
    # No vec_dim probe: dot_expr no longer unrolls by dimension, so
    # the .first() it fed was a dead sequential job before every scan
    # (guide §1.2-1: don't compute things you throw away).
    dim = None
    par = corpus.sparkSession.sparkContext.defaultParallelism
    # fan_out (not unconditional repartition): spreads the single-
    # split bench scan across cores but is a NO-OP once the scan
    # already carries >= cores partitions - an unconditional
    # repartition would full-shuffle the corpus at production scale.
    c = fan_out(normalize(corpus, vec_col, "cv").select(key_col, "cv"), par)
    q = normalize(queries, vec_col, "qv").select(
        F.col(key_col).alias(query_key_col), "qv"
    )
    scored = (
        c.join(F.broadcast(q), on=F.col(key_col) != F.col(query_key_col))
        .withColumn(
            "cosine", F.round(F.expr(dot_expr("cv", "qv", dim)), 6)
        )
    )
    w = Window.partitionBy(query_key_col).orderBy(
        F.desc("cosine"), F.asc(key_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key_col, key_col, "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def hash_sample_rows(
    df: DataFrame,
    key_col: str,
    arr_col: str,
    cap: int = 65536,
    seed: int = 7,
    n: int | None = None,
) -> list[list[float]]:
    """Deterministic ≤``cap``-row sample of an array column, collected
    to the driver for quantizer fits.  Pass ``n`` when the caller
    already counted the frame to skip the internal count job.

    The filter is a pure hash of the KEY (machine- and
    partitioning-independent — r3 ADVICE: defaultParallelism-derived
    fits gave different centroids per machine), slightly oversampled
    and trimmed by hash order driver-side so the bound is hard.  At
    100 TB this is one scan emitting ~cap rows; ~32 MB on the driver
    at cap=64k, dim=64."""
    if n is None:
        n = df.count()
    sel = df.select(
        F.pmod(
            F.xxhash64(F.col(key_col).cast("string"), F.lit(seed)),
            F.lit(1_000_000),
        ).alias("__hs"),
        F.col(key_col).cast("string").alias("__k"),
        F.col(arr_col).alias("__v"),
    )
    if n > cap:
        thr = int(1_200_000 * cap / n) + 1  # 1.2× oversample, hard-trim below
        sel = sel.filter(F.col("__hs") < thr)
    # secondary key sort: ~n²/2e6 hash ties are expected in the 1e6
    # buckets, and tie order would otherwise follow collect (i.e.
    # partition) order — per-machine centroids again
    rows = sorted(sel.collect(), key=lambda r: (r["__hs"], r["__k"]))[:cap]
    return [[float(x) for x in r["__v"]] for r in rows]


def lloyd_centers(
    sample: list[list[float]],
    k: int,
    seed: int = 7,
    max_iter: int = 3,
) -> list[list[float]]:
    """Driver-side numpy Lloyd iterations on a collected sample.

    Coarse quantizers (IVF cells, PQ codebooks, SemDeDup cells) don't
    need MLlib's distributed fit: each MLlib iteration is a full Spark
    job, and at bench scale scheduling overhead dominated ~80% of the
    three slowest queries (VERDICT r3 "next" #4).  A ≤64k-row sample
    fits in milliseconds on the driver, is bit-deterministic given the
    seed (no partition-order dependence), and the expensive parts —
    encode/assignment over the full corpus — stay distributed as
    literal-center argmin projections (``assign_cell_expr``).
    Empty clusters keep their previous center (MLlib behavior)."""
    import numpy as np

    if not sample:
        raise ValueError(
            "lloyd_centers: empty fit sample (empty corpus, or a "
            "fit_fraction filter that matched no keys)"
        )
    X = np.asarray(sample, dtype=np.float64)
    n = X.shape[0]
    k_eff = max(1, min(k, n))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(n, size=k_eff, replace=False)].copy()
    for _ in range(max_iter):
        d = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        a = d.argmin(axis=1)
        for j in range(k_eff):
            members = X[a == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return [[float(x) for x in c] for c in C]


def with_cells(
    df: DataFrame,
    vec_col: str,
    codebooks: list[tuple[str, list[list[float]], int]],
) -> DataFrame:
    """Add nearest-center id columns — ``codebooks`` is a list of
    ``(out_col, centers, offset)``; each vector slice
    ``[offset, offset+len(center))`` is assigned to its argmin-
    Euclidean center (``|c|² − 2·v·c`` scores, first minimum wins →
    lowest id on ties).

    A pure row map: no broadcast join, no shuffle — one Arrow-batched
    Pandas UDF computing every codebook's argmin per batch with
    vectorized numpy, and DELIBERATELY NOT a BLAS ``X @ Cᵀ``: the
    projection accumulates strictly left-to-right over the slice
    dimension (one fused product-add per step, see the loop below),
    because the hash-matched PQ oracle (``queries/pq_sql.py``)
    replays code assignment as an unrolled left-to-right SQL sum and
    dgemm's blocked/reordered accumulation would diverge in the last
    ulp — enough to flip an argmin near a tie and break the
    ``ann_topk_pq`` driver hash.  Do not "optimize" this back to
    matmul; the sequential-accumulation order is load-bearing.  For
    sub-dims ≈ 8 the fused vector ops cost the same as the dgemm
    anyway, and the batch UDF still beats both an unrolled
    multiply-add expression (whose k·dim literal tree made Catalyst
    ANALYSIS the bottleneck — re-paid on every plan reference,
    ruinous for iterative consumers like ``semantic_dedup``) and a
    higher-order ``transform``/``aggregate`` (interpreted per
    element: measured ~0.2 ms/row at dim 64, k 4).  The codebooks
    ride the UDF closure, shipped once per task."""
    from pyspark.sql.functions import pandas_udf

    mats = [
        (np.asarray(centers, dtype=np.float64), offset)
        for _, centers, offset in codebooks
    ]

    @pandas_udf("array<int>")
    def _codes(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype=object)
        X = np.asarray(v.tolist(), dtype=np.float64)
        cols = []
        for C, off in mats:
            sub = C.shape[1]
            Xs = X[:, off: off + sub]
            # Strict left-to-right float64 accumulation (cumsum is
            # sequential; the t-loop adds one product per step) instead
            # of BLAS matmul / pairwise np.sum: bit-identical to an
            # unrolled left-to-right SQL sum, which is what lets the
            # PQ oracle twin (queries/pq_sql.py) reproduce code
            # assignment exactly.  For sub≈8 the fused vector ops cost
            # the same as the dgemm they replace.
            cc = np.cumsum(C * C, axis=1)[:, -1]
            proj = np.zeros((Xs.shape[0], C.shape[0]))
            for t in range(sub):
                proj += Xs[:, t, None] * C[None, :, t]
            d = cc[None, :] - 2.0 * proj
            cols.append(d.argmin(axis=1))  # first min wins → lowest id
        codes = np.stack(cols, axis=1).astype(np.int32)
        return pd.Series([row.tolist() for row in codes])

    tmp = df.withColumn("__codes", _codes(F.col(vec_col)))
    for i, (out_col, _, _) in enumerate(codebooks):
        # coalesce(-1) marks the column NON-NULLABLE (the UDF never
        # returns null for a real vector, so values are unchanged).
        # Without it, every inner join on a cell/code column makes
        # Catalyst infer IsNotNull(out_col) and push it below the
        # repartition exchange — which re-evaluates the Arrow UDF a
        # SECOND time for every corpus row just to test a
        # never-null value (seen live in the r9 ivfsq8 plan: two
        # ArrowEvalPython nodes, one under the exchange feeding only
        # the inferred filter).  Non-nullable output → no inferred
        # filter → one UDF pass.
        tmp = tmp.withColumn(
            out_col, F.coalesce(F.col("__codes").getItem(i), F.lit(-1))
        )
    return tmp.drop("__codes")


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str,
    planes: list[list[float]],
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane signature: bucket = bits of sign(v·r_i).
    Planes are literal arrays inside the expression — shipped once in
    the plan, no join against a planes table."""
    bits = []
    for i, p in enumerate(planes):
        proj = " + ".join(f"{vec_col}[{j}] * {x!r}D" for j, x in enumerate(p))
        bits.append(f"CASE WHEN {proj} >= 0 THEN {1 << i} ELSE 0 END")
    return df.withColumn(out_col, F.expr(" + ".join(bits)).cast("long"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates.
    Recall < 1 by construction (single probe); multi-probe = union
    over neighboring buckets, omitted for clarity."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    c = with_lsh_bucket(
        normalize(corpus, vec_col, "cv").select(key_col, "cv"), "cv", planes
    )
    q = with_lsh_bucket(
        normalize(queries, vec_col, "qv").select(
            F.col(key_col).alias(query_key_col), "qv"
        ),
        "qv",
        planes,
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col(key_col) != F.col(query_key_col))
        .withColumn("cosine", F.round(F.expr(dot_expr("cv", "qv", dim)), 6))
    )
    w = Window.partitionBy(query_key_col).orderBy(F.desc("cosine"), F.asc(key_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key_col, key_col, "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 2,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
    seed: int = 7,
    fit_fraction: float = 1.0,
    max_iter: int = 3,
) -> DataFrame:
    """IVF: KMeans-partition the corpus; probe the ``n_probe`` nearest
    centroids per query; exact-score within probed cells.  n_probe =
    n_clusters degrades to exact search (recall 1.0).

    The quantizer is *coarse*: centroid polish buys nothing once
    cells merely bucket the search, so the fit is driver-side numpy
    Lloyd on a deterministic ≤64k hash-sample (``lloyd_centers`` —
    one corpus scan, zero MLlib jobs, centroids identical on any
    cluster layout).  Assignment covers every row as a literal-center
    argmin projection, and with n_probe = n_clusters the result stays
    exact regardless of where the centroids landed.  ``fit_fraction``
    additionally pre-thins the sampled corpus at extreme scale."""
    dim = None  # dot_expr ignores it; the .first() probe was a dead job
    c = normalize(corpus, vec_col, "cv").select(key_col, "cv")
    fit_src = c
    if fit_fraction < 1.0:
        pct = max(1, int(fit_fraction * 100))
        fit_src = c.filter(
            F.crc32(F.col(key_col).cast("string")) % 100 < pct
        )
    centers = lloyd_centers(
        hash_sample_rows(fit_src, key_col, "cv", seed=seed),
        n_clusters,
        seed=seed,
        max_iter=max_iter,
    )
    assigned = with_cells(c, "cv", [("cell", centers, 0)])

    spark = corpus.sparkSession
    centers_df = spark.createDataFrame(
        [(i, c_) for i, c_ in enumerate(centers)], ["cell", "center"]
    ).withColumn("center", F.col("center").cast("array<double>"))

    q = normalize(queries, vec_col, "qv").select(
        F.col(key_col).alias(query_key_col), "qv"
    )
    # Probe ranking uses the SAME |c|² − 2·v·c squared-Euclidean score
    # (and the same lowest-cell-id tie-break) as ``with_cells``' corpus
    # assignment — ranking by raw dot(q, c) instead is wrong for
    # non-unit-norm Lloyd centers and could skip the query's own
    # assigned cell (ADVICE r9).  Both dots are 0.0-seeded
    # left-to-right accumulations, so a planted copy of the query is
    # GUARANTEED to sit in the probe-rank-1 cell: any n_probe ≥ 1
    # keeps it.  Applies identically to all four IVF rungs below.
    qcells = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn(
            "dist",
            F.expr(dot_expr("center", "center", dim))
            - 2.0 * F.expr(dot_expr("qv", "center", dim)),
        )
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy(query_key_col).orderBy("dist", "cell")
            ),
        )
        .filter(F.col("probe_rank") <= n_probe)
        .select(query_key_col, "qv", "cell")
    )
    scored = (
        assigned.join(F.broadcast(qcells), on="cell")
        .filter(F.col(key_col) != F.col(query_key_col))
        .withColumn("cosine", F.round(F.expr(dot_expr("cv", "qv", dim)), 6))
    )
    w = Window.partitionBy(query_key_col).orderBy(F.desc("cosine"), F.asc(key_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key_col, key_col, "cosine", "rank")
    )


def ivf_cell_stats(
    corpus: DataFrame,
    n_clusters: int = 8,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 3,
) -> DataFrame:
    """IVF cell-balance audit → [cell, n_vecs, share, imbalance]: the
    occupancy histogram of the coarse quantizer's cells (every cell,
    empty ones included) plus the global max/mean occupancy ratio
    repeated per row (1.0 = perfectly balanced; k = everything in one
    cell).

    Why it exists (VERDICT r9 #6): at 100 TB a skewed centroid
    assignment turns the probed-cell candidate scans of every IVF rung
    into hot partitions — the imbalance ratio is exactly the skew
    factor those scans inherit, so it belongs in the audit suite next
    to the recall contracts.  Fit + assignment are the SAME code path
    the rungs use (``lloyd_centers`` on the seeded hash-sample,
    ``with_cells`` argmin projection), so the histogram audits the
    production quantizer, not a re-fit.

    Scale shape: one corpus scan into a k-row groupBy; the histogram
    completion and the max/mean ratio are broadcast joins over ≤k-row
    frames — no windows, no second scan, nothing driver-side beyond
    the fitted centers."""
    c = normalize(corpus, vec_col, "cv").select(key_col, "cv")
    centers = lloyd_centers(
        hash_sample_rows(c, key_col, "cv", seed=seed),
        n_clusters,
        seed=seed,
        max_iter=max_iter,
    )
    assigned = with_cells(c, "cv", [("cell", centers, 0)])
    counts = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vecs"))
    spark = corpus.sparkSession
    all_cells = spark.createDataFrame(
        [(i,) for i in range(len(centers))], "cell int"
    )
    hist = all_cells.join(F.broadcast(counts), on="cell", how="left").select(
        "cell", F.coalesce(F.col("n_vecs"), F.lit(0)).cast("long").alias("n_vecs")
    )
    totals = hist.agg(
        F.sum("n_vecs").alias("__total"), F.max("n_vecs").alias("__max")
    )
    k_eff = float(len(centers))
    return (
        hist.crossJoin(F.broadcast(totals))
        .select(
            "cell",
            "n_vecs",
            F.round(F.col("n_vecs") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("__max") / (F.col("__total") / F.lit(k_eff)), 6
            ).alias("imbalance"),
        )
        .orderBy("cell")
    )


def ivf_recall_curve(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_clusters: int = 8,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
    seed: int = 7,
    max_iter: int = 3,
) -> DataFrame:
    """Recall@k of IVF as a function of n_probe, in ONE pass →
    [n_probe, recall]: for every exact top-k neighbor, find the probe
    rank of its cell under the query's own cell ordering; recall at
    n_probe is then the fraction of exact neighbors whose cell rank is
    ≤ n_probe.  The dedup suite's ``dedup_minhash_recall_curve``
    analogue for the ANN ladder — "how many probes buy 95% recall" is
    the capacity-planning question for every IVF rung.

    Costs ONE exact top-k + one assignment scan — NOT n_clusters
    separate IVF runs: because probe ranking and assignment share the
    same |c|² − 2·v·c score (ADVICE r9 fix), membership of a neighbor
    in the probed set is monotone in n_probe, so the whole curve folds
    out of one probe-rank join against an 8-row range frame."""
    exact = cosine_topk(
        corpus, queries, k=k, key_col=key_col, vec_col=vec_col,
        query_key_col=query_key_col,
    )
    c = normalize(corpus, vec_col, "cv").select(key_col, "cv")
    centers = lloyd_centers(
        hash_sample_rows(c, key_col, "cv", seed=seed),
        n_clusters,
        seed=seed,
        max_iter=max_iter,
    )
    assigned = with_cells(c, "cv", [("cell", centers, 0)])
    dim = None  # dot_expr ignores it; the .first() probe was a dead job
    spark = corpus.sparkSession
    centers_df = spark.createDataFrame(
        [(i, c_) for i, c_ in enumerate(centers)], ["cell", "center"]
    ).withColumn("center", F.col("center").cast("array<double>"))
    q = normalize(queries, vec_col, "qv").select(
        F.col(key_col).alias(query_key_col), "qv"
    )
    qranks = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn(
            "dist",
            F.expr(dot_expr("center", "center", dim))
            - 2.0 * F.expr(dot_expr("qv", "center", dim)),
        )
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy(query_key_col).orderBy("dist", "cell")
            ),
        )
        .select(query_key_col, "cell", "probe_rank")
    )
    # Broadcast the exact top-k (k·|queries| rows, bounded by
    # construction) against the corpus-sized assignment scan — left to
    # estimates the planner can shuffle the assignment by key instead
    # (guide §3.1: pick the build side deliberately).
    hit_ranks = (
        assigned.select(key_col, "cell")
        .join(F.broadcast(exact.select(query_key_col, key_col)), on=key_col)
        .join(F.broadcast(qranks), on=[query_key_col, "cell"])
        .select("probe_rank")
    )
    probes = spark.range(1, n_clusters + 1).select(
        F.col("id").cast("int").alias("n_probe")
    )
    return (
        hit_ranks.crossJoin(F.broadcast(probes))
        .groupBy("n_probe")
        .agg(
            F.round(
                F.avg(
                    (F.col("probe_rank") <= F.col("n_probe")).cast("double")
                ),
                6,
            ).alias("recall")
        )
        .orderBy("n_probe")
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, query_key_col: str = "query_id", key_col: str = "vec_id") -> float:
    """Fraction of exact top-k recovered by the approximate result."""
    hits = approx.join(exact, on=[query_key_col, key_col], how="inner").count()
    total = exact.count()
    return hits / total if total else math.nan


def knn_graph(
    df: DataFrame,
    k: int = 3,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
) -> DataFrame:
    """Exact k-NN graph over one corpus → [query_id, vec_id, cosine,
    rank] for every row (the corpus IS the query set).

    Same contract as ``cosine_topk(df, df, k)`` but exploits symmetry:
    cosine(a,b) == cosine(b,a), so each unordered pair is scored ONCE
    (key_a < key_b halves the dot-product work — the dominant cost),
    the compact (key, key, cosine) triples are cached, and both
    directions are mirrored into the ranking window.  Exact-oracle
    path: at 100 TB the graph comes from IVF/LSH candidates instead
    (`ivf_topk`/`lsh_topk`), this is their recall ground truth."""
    dim = None  # dot_expr ignores it; the .first() probe was a dead job
    par = df.sparkSession.sparkContext.defaultParallelism
    base = normalize(df, vec_col, "nv").select(key_col, "nv")
    a = fan_out(
        base.select(F.col(key_col).alias("__ka"), F.col("nv").alias("ea")),
        par,
    )  # conditional spread - no-op once the scan has >= cores splits
    b = base.select(F.col(key_col).alias("__kb"), F.col("nv").alias("eb"))
    pairs = (
        a.join(F.broadcast(b), F.col("__ka") < F.col("__kb"))
        .withColumn(
            "cosine", F.round(F.expr(dot_expr("ea", "eb", dim)), 6)
        )
        .select("__ka", "__kb", "cosine")
        .cache()
    )
    sym = pairs.select(
        F.col("__ka").alias(query_key_col),
        F.col("__kb").alias(key_col),
        "cosine",
    ).unionByName(
        pairs.select(
            F.col("__kb").alias(query_key_col),
            F.col("__ka").alias(key_col),
            "cosine",
        )
    )
    w = Window.partitionBy(query_key_col).orderBy(
        F.desc("cosine"), F.asc(key_col)
    )
    out = (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key_col, key_col, "cosine", "rank")
    )
    # eager-checkpoint + release, same discipline as the dedup pair
    # paths (ADVICE r3 cache-leak class): the half-pair cache would
    # otherwise persist for the session
    from fastmlframework_spark.extensions.dedup import _materialize_release

    return _materialize_release(out, pairs)


def lsh_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    n_flip: int = 1,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
    seed: int = 7,
) -> DataFrame:
    """Multi-probe hyperplane LSH top-k: each query probes its own
    bucket PLUS every bucket within hamming distance ``n_flip`` of it
    (flipping the planes its projection was closest to crossing is the
    classic refinement; flipping all combinations is the simple exact
    superset used here for n_flip=1).

    Recall strictly dominates single-probe (`lsh_topk`) at the cost of
    (1 + n_planes) probe buckets per query — still sub-quadratic: the
    corpus is hashed ONCE, only the (tiny) query side multiplies."""
    if n_flip != 1:
        raise ValueError("only n_flip=1 implemented (probe + neighbors)")
    dim = vec_dim(corpus, vec_col)
    planes = hyperplanes(dim, n_planes, seed)
    c = with_lsh_bucket(
        normalize(corpus, vec_col, "cv").select(key_col, "cv"), "cv", planes
    )
    q = with_lsh_bucket(
        normalize(queries, vec_col, "qv").select(
            F.col(key_col).alias(query_key_col), "qv"
        ),
        "qv",
        planes,
    )
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("long")
            for i in range(n_planes)
        ],
    )
    qp = q.select(
        query_key_col, "qv", F.explode(probes).alias("bucket")
    )
    scored = (
        c.join(F.broadcast(qp), on="bucket")
        .filter(F.col(key_col) != F.col(query_key_col))
        .select(
            query_key_col,
            key_col,
            F.round(F.expr(dot_expr("cv", "qv", dim)), 6).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy(query_key_col).orderBy(
        F.desc("cosine"), F.asc(key_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key_col, key_col, "cosine", "rank")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 32,
    refine: int = 8,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
    seed: int = 7,
    max_iter: int = 2,
) -> DataFrame:
    """Product-quantization top-k → [query_id, vec_id, cosine, rank]
    (cosine is the EXACT score of the refined winners).

    The RAM-bound ANN shape for 100 TB corpora: vectors compress to
    ``m`` one-byte codes (per-subspace KMeans codebooks), the
    asymmetric-distance (ADC) scan scores each candidate with ``m``
    table lookups instead of ``dim`` multiply-adds, and only the top
    ``refine * k`` ADC candidates per query are re-ranked with the
    exact dot product.  Memory per vector drops dim×4 bytes → m bytes
    (64-d float → 8 bytes at the defaults), which is what lets a
    billion-vector index fit executor memory while the full vectors
    stay in parquet and are fetched only for the refine join.

    Plan shape: all m codebooks fit driver-side from ONE cached
    ≤64k hash-sample (numpy Lloyd per subspace — zero MLlib jobs,
    deterministic on any cluster layout), one corpus pass to encode
    via literal-center argmin projections, one broadcast of the
    per-query lookup tables over the codes scan, and a keyed join of
    ``refine*k`` rows/query against the corpus for exact re-ranking.
    The corpus is never shuffled."""
    c = normalize(corpus, vec_col, "cv").select(key_col, "cv")
    # one full-dim sample, sliced per subspace on the driver; the
    # sample rows are full vectors, so it also provides dim
    # (fixed-width schema) — no separate vec_dim .first() job
    sample = hash_sample_rows(c, key_col, "cv", seed=seed)
    dim = len(sample[0]) if sample else vec_dim(corpus, vec_col)
    if dim % m != 0:
        raise ValueError(f"pq_topk: m={m} must divide dim={dim}")
    sub = dim // m
    centers = [
        lloyd_centers(
            [row[s * sub: (s + 1) * sub] for row in sample],
            n_codes,
            seed=seed + s,
            max_iter=max_iter,
        )
        for s in range(m)
    ]
    codes = with_cells(
        c,
        "cv",
        [(f"__code{s}", centers[s], s * sub) for s in range(m)],
    ).select(key_col, *[F.col(f"__code{s}") for s in range(m)])

    # Per-query ADC lookup tables: LUT[offset_s + j] = dot(q_s, c_sj),
    # built from a broadcast codebook frame and collapsed to one flat
    # array per query.  Layout via cumulative offsets over the actual
    # per-subspace center counts (tiny samples can yield < n_codes).
    spark = corpus.sparkSession
    offsets = [0]
    for ctrs in centers:
        offsets.append(offsets[-1] + len(ctrs))
    cb_rows = [
        (offsets[s] + j, s, ctr)
        for s, ctrs in enumerate(centers)
        for j, ctr in enumerate(ctrs)
    ]
    cb = spark.createDataFrame(cb_rows, ["idx", "s", "center"]).withColumn(
        "center", F.col("center").cast("array<double>")
    )
    q = normalize(queries, vec_col, "qv").select(
        F.col(key_col).alias(query_key_col), "qv"
    )
    luts = (
        q.crossJoin(F.broadcast(cb))
        .select(
            query_key_col,
            "qv",
            "idx",
            F.expr(
                "aggregate(zip_with(slice(qv, s * {sub} + 1, {sub}), center,"
                " (x, y) -> x * y), 0.0D, (a, v) -> a + v)".format(sub=sub)
            ).alias("d"),
        )
        .groupBy(query_key_col)
        .agg(
            F.first("qv").alias("qv"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "d"))),
                lambda x: x["d"],
            ).alias("lut"),
        )
    )

    adc_score = None
    for s in range(m):
        term = F.element_at(
            F.col("lut"), F.col(f"__code{s}") + F.lit(offsets[s] + 1)
        )
        adc_score = term if adc_score is None else adc_score + term
    cand_w = Window.partitionBy(query_key_col).orderBy(
        F.desc("__adc"), F.asc(key_col)
    )
    candidates = (
        codes.crossJoin(F.broadcast(luts.select(query_key_col, "lut")))
        .filter(F.col(key_col) != F.col(query_key_col))
        .withColumn("__adc", adc_score)
        .withColumn("__crank", F.row_number().over(cand_w))
        .filter(F.col("__crank") <= refine * k)
        .select(query_key_col, key_col)
    )

    # Exact re-rank of the surviving candidates only.
    # Broadcast the candidate list, never the corpus: bounded at
    # refine·k·|queries| rows by construction, it is the scale-honest
    # build side (guide §3.1) — left to estimates, the planner was
    # broadcasting the (repartitioned!) CORPUS branch here, which adds
    # a full round-robin exchange + corpus-sized broadcast at bench
    # scale and breaks outright past the 8 GB relation cap at 100 TB.
    exact = (
        F.broadcast(candidates).join(c, on=key_col)
        .join(F.broadcast(luts.select(query_key_col, "qv")), on=query_key_col)
        .withColumn("cosine", F.round(F.expr(dot_expr("cv", "qv", dim)), 6))
    )
    w = Window.partitionBy(query_key_col).orderBy(
        F.desc("cosine"), F.asc(key_col)
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key_col, key_col, "cosine", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 2,
    m: int = 8,
    n_codes: int = 32,
    refine: int = 8,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
    seed: int = 7,
    max_iter: int = 3,
    pq_max_iter: int = 2,
) -> DataFrame:
    """IVF-PQ top-k → [query_id, vec_id, cosine, rank] — the FAISS
    production shape for billion-vector search: an IVF coarse
    quantizer prunes the corpus to ``n_probe`` cells per query, a PQ
    ADC scan scores only the probed cells' byte-codes with ``m``
    table lookups each, and the top ``refine * k`` survivors are
    re-ranked with the exact dot product.  Combines ``ivf_topk``'s
    scan pruning (touch n_probe/n_clusters of the corpus) with
    ``pq_topk``'s memory compression (m bytes per vector), which is
    the point at 100 TB: the probed slice of a byte-code index is
    both small AND cheap to score.

    Codes quantize RAW vectors (FAISS ``by_residual=False``), so with
    ``n_probe = n_clusters`` the candidate set is the whole corpus
    and the result is IDENTICAL to ``pq_topk`` at the same PQ
    parameters — the same degenerate-exactness contract ``ivf_topk``
    uses to share the brute-force oracle (here it shares the full
    hash-matched PQ oracle); partial-probe recall is pinned by the
    planted-copy query and a recall floor test.

    Plan shape: ONE corpus pass assigns the coarse cell and all m
    subspace codes in a single Arrow-batched projection
    (``with_cells`` with m+1 codebooks); both quantizers fit
    driver-side from the SAME ≤64k hash-sample; the probed-cell
    filter is a broadcast hash join on the (query, cell) pairs; the
    corpus is never shuffled."""
    c = normalize(corpus, vec_col, "cv").select(key_col, "cv")
    sample = hash_sample_rows(c, key_col, "cv", seed=seed)
    # dim from the sample (fixed-width schema) — no vec_dim .first() job
    dim = len(sample[0]) if sample else vec_dim(corpus, vec_col)
    if dim % m != 0:
        raise ValueError(f"ivfpq_topk: m={m} must divide dim={dim}")
    sub = dim // m
    coarse = lloyd_centers(sample, n_clusters, seed=seed, max_iter=max_iter)
    centers = [
        lloyd_centers(
            [row[s * sub: (s + 1) * sub] for row in sample],
            n_codes,
            seed=seed + s,
            max_iter=pq_max_iter,
        )
        for s in range(m)
    ]
    encoded = with_cells(
        c,
        "cv",
        [("cell", coarse, 0)]
        + [(f"__code{s}", centers[s], s * sub) for s in range(m)],
    )
    codes = encoded.select(
        key_col, "cell", *[F.col(f"__code{s}") for s in range(m)]
    )

    spark = corpus.sparkSession
    centers_df = spark.createDataFrame(
        [(i, c_) for i, c_ in enumerate(coarse)], ["cell", "center"]
    ).withColumn("center", F.col("center").cast("array<double>"))
    q = normalize(queries, vec_col, "qv").select(
        F.col(key_col).alias(query_key_col), "qv"
    )
    qcells = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn(
            "dist",
            F.expr(dot_expr("center", "center", dim))
            - 2.0 * F.expr(dot_expr("qv", "center", dim)),
        )
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy(query_key_col).orderBy("dist", "cell")
            ),
        )
        .filter(F.col("probe_rank") <= n_probe)
        .select(query_key_col, "cell")
    )

    # Per-query flat ADC LUT — identical construction to pq_topk.
    offsets = [0]
    for ctrs in centers:
        offsets.append(offsets[-1] + len(ctrs))
    cb_rows = [
        (offsets[s] + j, s, ctr)
        for s, ctrs in enumerate(centers)
        for j, ctr in enumerate(ctrs)
    ]
    cb = spark.createDataFrame(cb_rows, ["idx", "s", "center"]).withColumn(
        "center", F.col("center").cast("array<double>")
    )
    luts = (
        q.crossJoin(F.broadcast(cb))
        .select(
            query_key_col,
            "qv",
            "idx",
            F.expr(
                "aggregate(zip_with(slice(qv, s * {sub} + 1, {sub}), center,"
                " (x, y) -> x * y), 0.0D, (a, v) -> a + v)".format(sub=sub)
            ).alias("d"),
        )
        .groupBy(query_key_col)
        .agg(
            F.first("qv").alias("qv"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "d"))),
                lambda x: x["d"],
            ).alias("lut"),
        )
    )

    adc_score = None
    for s in range(m):
        term = F.element_at(
            F.col("lut"), F.col(f"__code{s}") + F.lit(offsets[s] + 1)
        )
        adc_score = term if adc_score is None else adc_score + term
    cand_w = Window.partitionBy(query_key_col).orderBy(
        F.desc("__adc"), F.asc(key_col)
    )
    candidates = (
        codes.join(F.broadcast(qcells), on="cell")
        .join(F.broadcast(luts.select(query_key_col, "lut")), on=query_key_col)
        .filter(F.col(key_col) != F.col(query_key_col))
        .withColumn("__adc", adc_score)
        .withColumn("__crank", F.row_number().over(cand_w))
        .filter(F.col("__crank") <= refine * k)
        .select(query_key_col, key_col)
    )

    # Broadcast the candidate list, never the corpus: bounded at
    # refine·k·|queries| rows by construction, it is the scale-honest
    # build side (guide §3.1) — left to estimates, the planner was
    # broadcasting the (repartitioned!) CORPUS branch here, which adds
    # a full round-robin exchange + corpus-sized broadcast at bench
    # scale and breaks outright past the 8 GB relation cap at 100 TB.
    exact = (
        F.broadcast(candidates).join(c, on=key_col)
        .join(F.broadcast(luts.select(query_key_col, "qv")), on=query_key_col)
        .withColumn("cosine", F.round(F.expr(dot_expr("cv", "qv", dim)), 6))
    )
    w = Window.partitionBy(query_key_col).orderBy(
        F.desc("cosine"), F.asc(key_col)
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key_col, key_col, "cosine", "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_key_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training → [query_id,
    query_label, vec_id, neg_label, cosine, rank]: for each query
    vector, the k corpus vectors MOST similar to it that carry a
    DIFFERENT label — the negatives that dominate the InfoNCE
    gradient (easy negatives contribute ~0; see e.g. Robinson et al.
    2021, "Contrastive Learning with Hard Negative Samples").
    Beyond-reference operator: the reference stops at model training
    (`modeling/model_wrappers.py`); pair mining for metric/contrastive
    objectives is a training-DATA op, so it lives here.

    Same scale shape as ``cosine_topk``: the query side is broadcast,
    the corpus is scanned once with the label-mismatch predicate
    fused into the join condition (no post-filter over a wider
    candidate set), and per-query top-k runs as a rank-limit window
    (WindowGroupLimit pushdown keeps the partial top-k map-side).
    For corpus×corpus mining, feed IVF/LSH candidate pairs in as
    ``queries`` batches instead of ranking n² pairs."""
    dim = None  # dot_expr ignores it; the .first() probe was a dead job
    par = corpus.sparkSession.sparkContext.defaultParallelism
    c = fan_out(
        normalize(corpus, vec_col, "cv").select(
            key_col, F.col(label_col).alias("neg_label"), "cv"
        ),
        par,
    )  # conditional spread - no-op once the scan has >= cores splits
    q = normalize(queries, vec_col, "qv").select(
        F.col(key_col).alias(query_key_col),
        F.col(label_col).alias("query_label"),
        "qv",
    )
    scored = c.join(
        F.broadcast(q),
        on=F.col("neg_label") != F.col("query_label"),
    ).withColumn("cosine", F.round(F.expr(dot_expr("cv", "qv", dim)), 6))
    w = Window.partitionBy(query_key_col).orderBy(
        F.desc("cosine"), F.asc(key_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_key_col, "query_label", key_col, "neg_label",
            "cosine", "rank",
        )
    )


def label_prototypes(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label mean vector (class prototype) → [label, n, centroid].

    Dimension-exploded aggregation: ``posexplode`` fans each row into
    (label, dim, value) triples and a ``groupBy(label, dim)`` mean
    collapses them — map-side partial aggregation eats the d× row
    inflation before the shuffle, so exchanged bytes are
    O(|labels| × d × partitions) regardless of corpus size.  The
    centroid array is rebuilt from the tiny aggregate with an
    index-sorted ``collect_list`` (|labels| × d rows total — this
    ``collect_list`` never sees corpus-sized groups)."""
    per_dim = (
        df.select(
            label_col, F.posexplode(F.col(vec_col).cast("array<double>"))
        )
        .groupBy(label_col, "pos")
        .agg(F.avg("col").alias("m"), F.count(F.lit(1)).alias("__n"))
    )
    return per_dim.groupBy(label_col).agg(
        F.max("__n").alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda x: x["m"],
        ).alias("centroid"),
    )


def prototype_outliers(
    df: DataFrame,
    k: int = 5,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Prototypicality pruning (Sorscher et al. 2022, "Beyond neural
    scaling laws"): cosine of every vector to its OWN label's
    prototype, keeping the k LEAST prototypical per label →
    [label, vec_id, cos_centroid, rank].  Low scores are the prune /
    label-error-review candidates; in the hard-data-first regime they
    are instead the examples worth keeping.

    The prototype table is |labels| rows — broadcast back over one
    corpus scan; the per-label bottom-k is a rank-limit window
    (WindowGroupLimit partial top-k map-side).  No corpus shuffle
    beyond the d×-compacted centroid aggregate."""
    dim = None  # dot_expr ignores it; the .first() probe was a dead job
    protos = label_prototypes(df, key_col, vec_col, label_col).select(
        label_col, "centroid"
    )
    scored = (
        normalize(df, vec_col, "nv")
        .select(key_col, label_col, "nv")
        .join(F.broadcast(protos), on=label_col)
        .withColumn("cn", F.expr(_NORM.format(v="centroid")))
        .withColumn(
            "cos_centroid", F.round(F.expr(dot_expr("nv", "cn", dim)), 6)
        )
    )
    w = Window.partitionBy(label_col).orderBy(
        F.asc("cos_centroid"), F.asc(key_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(label_col, key_col, "cos_centroid", "rank")
    )


def sq8_words(dim: int) -> int:
    """Packed-index width: 7 byte-codes per BIGINT word.  An 8th code
    would shift into bits 56-63, where a 255 reaches the sign bit in
    Spark's ``<<`` and overflows DuckDB's checked shift — the same
    sub-sign-bit dodge as ``hamming_topk``'s two 32-bit words."""
    return (dim + 6) // 7


def sq8_encode(
    c: DataFrame,
    dim: int,
    key_col: str = "vec_id",
    extra_cols: tuple = (),
    rng_src: DataFrame | None = None,
) -> DataFrame:
    """The SQ8 index artifact (VERDICT r8 #3): per-dim [min, max]
    ranges from ONE 1-row aggregate, then byte codes PACKED 7 per
    BIGINT — ``[key, __lo, __st, __packed array<bigint>]`` with
    ceil(dim/7) words (64 dims → 10 longs = 80 bytes/vector vs 512
    raw — a 6.4× memory cut realized at the artifact level, not just
    in the docstring; the full 8× would need the 8th byte, which hits
    the sign bit / DuckDB's checked shift).  Input ``c`` must carry
    the L2-normalized
    vector as ``cv``.  Packing is lossless: codes are clamped floor()
    integers in [0, 255], so BIGINT cast and back returns the
    identical DOUBLE values and the oracle hash is unchanged.

    NOTE Spark's arr[i] subscript is 0-based (DuckDB's is 1-based);
    the SQL twin's generate_series indices compensate.

    ``rng_src``: frame to compute the per-dim [min, max] ranges from —
    pass the UN-repartitioned normalize projection when ``c`` carries
    a fan-out ``repartition``: min/max are partitioning-invariant
    (identical values from identical rows), and aggregating the raw
    scan skips replaying the full-corpus round-robin exchange for a
    1-row result (the r13 driver plan showed exactly that replay as a
    second Exchange feeding this aggregate)."""
    rng = (rng_src if rng_src is not None else c).agg(
        *[
            e
            for i in range(dim)
            for e in (
                F.min(F.col("cv")[i]).alias(f"__lo{i}"),
                F.max(F.col("cv")[i]).alias(f"__hi{i}"),
            )
        ]
    ).select(
        F.array(*[F.col(f"__lo{i}") for i in range(dim)]).alias("__lo"),
        F.array(
            *[
                (
                    F.greatest(
                        F.col(f"__hi{i}") - F.col(f"__lo{i}"), F.lit(1e-30)
                    )
                    / F.lit(255.0)
                )
                for i in range(dim)
            ]
        ).alias("__st"),
    )

    def _code(i: int) -> str:
        return (
            f"CAST(least(255.0D, greatest(0.0D,"
            f" floor((cv[{i}] - __lo[{i}]) / __st[{i}]))) AS BIGINT)"
        )

    words = []
    for w in range(sq8_words(dim)):
        parts = [
            f"({_code(i)} << {8 * (i - 7 * w)})"
            for i in range(7 * w, min(7 * (w + 1), dim))
        ]
        words.append("(" + " | ".join(parts) + ")")
    return (
        c.crossJoin(F.broadcast(rng))
        .withColumn("__packed", F.expr("array(" + ", ".join(words) + ")"))
        .select(key_col, *extra_cols, "__lo", "__st", "__packed")
    )


def sq8_dequantize_expr(dim: int) -> str:
    """Unpack → midpoint-dequantize (``__lo[i] + (code + 0.5)·__st[i]``)
    in one bounded nested transform over the packed words: the inner
    sequence stops at the last real dimension of each word, so every
    subscript stays in bounds under ANSI mode.  Returns the identical
    DOUBLE array the unpacked form produced — bit-equal approximate
    dots, same shortlist set, same oracle hash."""
    return (
        "flatten(transform(__packed, (wd, wi) -> "
        f"transform(sequence(0, least(6, {dim - 1} - wi * 7)), j -> "
        "__lo[wi * 7 + j]"
        " + (CAST((wd >> (j * 8)) & 255 AS DOUBLE) + 0.5D)"
        " * __st[wi * 7 + j])))"
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    refine: int = 4,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
) -> DataFrame:
    """Scalar-quantization (SQ8) top-k → [query_id, vec_id, cosine,
    rank] — the remaining production quantization rung between
    brute-force (8 bytes/dim) and PQ (m bytes/VECTOR): each dimension
    is linearly quantized to one byte over its corpus [min, max]
    range (FAISS ``ScalarQuantizer QT_8bit`` shape), cutting index
    memory 6.4× (7 packed codes per long) while keeping per-dimension
    structure PQ discards.
    The approximate scan scores midpoint-dequantized codes
    (``lo + (code + 0.5)·step``) against the query, the top
    ``refine·k`` survivors re-rank with the exact dot product.

    Everything is dataset-derived arithmetic — per-dim ranges are one
    1-row aggregate (no driver-side fit at all, unlike PQ/IVF), so the
    SQL oracle is fully self-contained.  Determinism contract (same
    discipline as ``pq_topk``): codes are ``floor`` of IEEE divisions
    of bit-identical normalized values, and the approximate score is a
    0.0-seeded left-to-right fold — bit-equal to the oracle's unrolled
    left-associated chain — so the shortlist SETS match across engines
    and the exact re-rank hash-matches at 6 dp.

    Plan shape: one corpus pass to normalize+encode (map-only against
    a broadcast 1-row range row), one broadcast-queries scan of the
    codes, rank-limit shortlist (WindowGroupLimit map-side top-k),
    keyed join back for the ≤ refine·k exact re-ranks.

    The stored index artifact is PACKED (VERDICT r8 #3): byte codes
    go 7 per BIGINT (``array<bigint>`` of ceil(dim/7) words — an 8th
    code would shift into bit 56+, where a 255 reaches the sign bit in
    Spark and overflows DuckDB's checked ``<<``; same sub-sign-bit
    dodge as ``hamming_topk``'s two 32-bit words).  64 dims = 10 longs
    = 80 bytes/vector vs 512 raw — a 6.4× memory cut, real at the
    artifact level.  The scoring expression unpacks with shift/mask
    back to the identical DOUBLE code values, so the approximate dot
    (and therefore the shortlist set and the oracle hash) is
    bit-unchanged from the unpacked form."""
    dim = vec_dim(corpus, vec_col)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    cn = normalize(corpus, vec_col, "cv").select(key_col, "cv")
    c = fan_out(cn, par)  # conditional spread (no-op at >= cores splits)
    # rng over the un-repartitioned projection: same min/max values,
    # no replay of the round-robin exchange for a 1-row aggregate
    enc = sq8_encode(c, dim, key_col, rng_src=cn)
    q = normalize(queries, vec_col, "qv").select(
        F.col(key_col).alias(query_key_col), "qv"
    )
    deq = F.expr(sq8_dequantize_expr(dim))
    adot = F.expr(dot_expr("__deq", "qv", dim))
    cand_w = Window.partitionBy(query_key_col).orderBy(
        F.desc("__adot"), F.asc(key_col)
    )
    shortlist = (
        enc.withColumn("__deq", deq)
        .join(F.broadcast(q), on=F.col(key_col) != F.col(query_key_col))
        .withColumn("__adot", adot)
        .withColumn("__crank", F.row_number().over(cand_w))
        .filter(F.col("__crank") <= refine * k)
        .select(query_key_col, key_col)
    )
    # Broadcast the shortlist, never the corpus (bounded refine·k·|q|
    # rows — see pq_topk's re-rank note; same §3.1 rationale).
    exact = (
        F.broadcast(shortlist).join(c, on=key_col)
        .join(F.broadcast(q), on=query_key_col)
        .withColumn("cosine", F.round(F.expr(dot_expr("cv", "qv", dim)), 6))
    )
    w = Window.partitionBy(query_key_col).orderBy(
        F.desc("cosine"), F.asc(key_col)
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key_col, key_col, "cosine", "rank")
    )


def ivfsq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 2,
    refine: int = 4,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
    seed: int = 7,
    max_iter: int = 3,
) -> DataFrame:
    """IVF-SQ8 (VERDICT r8 #4): the flat ``sq8_topk`` scan scores every
    corpus×query candidate — inherent to flat quantization; composing
    with IVF cells makes the candidate count SUBLINEAR in the corpus:
    coarse KMeans cells prune the scan to the ``n_probe`` nearest
    cells per query, the packed SQ8 codes (7 byte-codes per BIGINT,
    ``sq8_encode``) score only the probed cells' candidates, and the
    top ``refine·k`` survivors re-rank with the exact dot product —
    the FAISS ``IVF_SQ8`` production shape, one rung cheaper than
    IVF-PQ in fit complexity (the scalar quantizer needs no codebook
    fit at all, just the one global 1-row range aggregate).

    Exactness contract (same discipline as ``ivf_topk``/``ivfpq_topk``):
    with ``n_probe = n_clusters`` every cell is probed, the candidate
    set degenerates to the whole corpus, and the result is IDENTICAL
    to ``sq8_topk`` at the same (k, refine) — which is what lets the
    registered query share the flat SQ8 hash-matched oracle.  The
    pruned path (n_probe < n_clusters) is pinned by the planted-top1
    invariant (a planted exact copy lands in the query's own nearest
    cell, carries identical codes, and must re-rank to top-1 at
    cosine 1.0) plus the recall-floor and candidate-reduction tests.

    Plan shape: one corpus pass to normalize, one driver-side Lloyd
    fit on a ≤64k hash-sample (zero MLlib jobs), one map-only pass to
    assign cells + pack codes, broadcast of the (query × probed-cell)
    table joined on the cell id — the corpus is never shuffled; only
    probed cells' rows are unpacked and scored."""
    par = corpus.sparkSession.sparkContext.defaultParallelism
    cn = normalize(corpus, vec_col, "cv").select(key_col, "cv")
    c = fan_out(cn, par)  # conditional spread (no-op at >= cores splits)
    sample = hash_sample_rows(c, key_col, "cv", seed=seed)
    # dim from the sample (fixed-width schema) — no vec_dim .first() job
    dim = len(sample[0]) if sample else vec_dim(corpus, vec_col)
    centers = lloyd_centers(
        sample,
        n_clusters,
        seed=seed,
        max_iter=max_iter,
    )
    assigned = with_cells(c, "cv", [("cell", centers, 0)])
    # rng over the un-repartitioned projection: same min/max values,
    # no replay of the round-robin exchange for a 1-row aggregate
    enc = sq8_encode(assigned, dim, key_col, extra_cols=("cell",), rng_src=cn)

    spark = corpus.sparkSession
    centers_df = spark.createDataFrame(
        [(i, c_) for i, c_ in enumerate(centers)], ["cell", "center"]
    ).withColumn("center", F.col("center").cast("array<double>"))
    q = normalize(queries, vec_col, "qv").select(
        F.col(key_col).alias(query_key_col), "qv"
    )
    qcells = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn(
            "dist",
            F.expr(dot_expr("center", "center", dim))
            - 2.0 * F.expr(dot_expr("qv", "center", dim)),
        )
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy(query_key_col).orderBy("dist", "cell")
            ),
        )
        .filter(F.col("probe_rank") <= n_probe)
        .select(query_key_col, "qv", "cell")
    )

    deq = F.expr(sq8_dequantize_expr(dim))
    adot = F.expr(dot_expr("__deq", "qv", dim))
    cand_w = Window.partitionBy(query_key_col).orderBy(
        F.desc("__adot"), F.asc(key_col)
    )
    shortlist = (
        enc.withColumn("__deq", deq)
        .join(F.broadcast(qcells), on="cell")
        .filter(F.col(key_col) != F.col(query_key_col))
        .withColumn("__adot", adot)
        .withColumn("__crank", F.row_number().over(cand_w))
        .filter(F.col("__crank") <= refine * k)
        .select(query_key_col, key_col)
    )
    # Broadcast the shortlist, never the corpus (bounded refine·k·|q|
    # rows — see pq_topk's re-rank note; same §3.1 rationale).
    exact = (
        F.broadcast(shortlist).join(c, on=key_col)
        .join(F.broadcast(q), on=query_key_col)
        .withColumn("cosine", F.round(F.expr(dot_expr("cv", "qv", dim)), 6))
    )
    w = Window.partitionBy(query_key_col).orderBy(
        F.desc("cosine"), F.asc(key_col)
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key_col, key_col, "cosine", "rank")
    )


def hamming_pack_cols(col: str, dim: int) -> list:
    """Sign bits packed into sub-2³¹ words (``__b{w}`` BIGINT columns,
    32 dims per word — ``1 << 63`` flips the sign in Spark and raises
    overflow in DuckDB's checked shift; two 32-bit words per 64 dims
    sidestep both).  Shared by the flat and IVF-composed Hamming
    rungs so their bit layouts (and oracle twins) stay identical."""
    n_words = (dim + 31) // 32
    cols = []
    for w in range(n_words):
        bits = [
            f"IF({col}[{i}] >= 0.0D, CAST(1 AS BIGINT) << {i - 32 * w}, CAST(0 AS BIGINT))"
            for i in range(32 * w, min(32 * (w + 1), dim))
        ]
        cols.append(F.expr("(" + " | ".join(bits) + ")").alias(f"__b{w}"))
    return cols


def hamming_distance_expr(n_words: int):
    """XOR + popcount over the packed ``__b{w}`` / ``__q{w}`` word
    pairs — INTEGER-exact, so oracle twins need no float discipline."""
    ham = None
    for w in range(n_words):
        term = F.bit_count(F.expr(f"__b{w} ^ __q{w}"))
        ham = term if ham is None else ham + term
    return ham


def hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    refine: int = 8,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
) -> DataFrame:
    """Binary (1-bit sign) embedding top-k → [query_id, vec_id,
    cosine, rank] — the bottom rung of the quantization ladder
    (binary 1 bit/dim → SQ8 1 byte/dim → PQ m bytes/vector): each
    dimension collapses to its sign bit, candidate ranking is Hamming
    distance (bit_count of XOR — for unit vectors, popcount of sign
    disagreement is a monotone proxy for angle, Charikar 2002 sign-LSH
    collision bound), and the top ``refine·k`` survivors re-rank with
    the exact dot product.  64 dims = 8 BYTES per vector: the whole
    billion-vector index is ~8 GB of longs scanned with two popcount
    instructions per candidate — the cheapest first-pass filter that
    exists.

    Bits pack into TWO 32-bit words per 64 dims (not one 64-bit long:
    ``1 << 63`` flips the sign in Spark and raises overflow in
    DuckDB's checked shift — two sub-2³¹ words sidestep both).  All
    candidate arithmetic is INTEGER-exact, so the SQL twin needs no
    float-stability discipline at all; ties break on the corpus key.

    Plan shape mirrors ``sq8_topk``: one map-only corpus pass to pack
    bits, broadcast-queries scan with XOR+popcount, rank-limit
    shortlist (map-side WindowGroupLimit), keyed join back for the
    ≤ refine·k exact re-ranks."""
    dim = vec_dim(corpus, vec_col)
    n_words = (dim + 31) // 32
    par = corpus.sparkSession.sparkContext.defaultParallelism

    c = fan_out(
        normalize(corpus, vec_col, "cv").select(key_col, "cv"), par
    )  # conditional spread - no-op once the scan has >= cores splits
    cb = c.select(key_col, "cv", *hamming_pack_cols("cv", dim))
    q = normalize(queries, vec_col, "qv").select(
        F.col(key_col).alias(query_key_col), "qv"
    )
    qb = q.select(
        query_key_col,
        "qv",
        *[c_.alias(f"__q{w}") for w, c_ in enumerate(
            hamming_pack_cols("qv", dim)
        )],
    )
    ham = hamming_distance_expr(n_words)
    cand_w = Window.partitionBy(query_key_col).orderBy(
        F.asc("__ham"), F.asc(key_col)
    )
    shortlist = (
        cb.drop("cv")
        .join(
            F.broadcast(qb.drop("qv")),
            on=F.col(key_col) != F.col(query_key_col),
        )
        .withColumn("__ham", ham)
        .withColumn("__crank", F.row_number().over(cand_w))
        .filter(F.col("__crank") <= refine * k)
        .select(query_key_col, key_col)
    )
    # Broadcast the shortlist, never the corpus (bounded refine·k·|q|
    # rows — see pq_topk's re-rank note; same §3.1 rationale).
    exact = (
        F.broadcast(shortlist).join(c, on=key_col)
        .join(F.broadcast(q), on=query_key_col)
        .withColumn(
            "cosine", F.round(F.expr(dot_expr("cv", "qv", dim)), 6)
        )
    )
    w_ = Window.partitionBy(query_key_col).orderBy(
        F.desc("cosine"), F.asc(key_col)
    )
    return (
        exact.withColumn("rank", F.row_number().over(w_))
        .filter(F.col("rank") <= k)
        .select(query_key_col, key_col, "cosine", "rank")
    )


def ivfhamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 2,
    refine: int = 8,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
    seed: int = 7,
    max_iter: int = 3,
) -> DataFrame:
    """IVF-Hamming — the binary-prefilter form of the composed rung
    (VERDICT r8 #4 named either shape; both now exist): coarse KMeans
    cells prune the scan to the ``n_probe`` nearest cells per query,
    sign-bit words (``hamming_pack_cols`` — same layout as the flat
    rung, 8 bytes per 64 dims) XOR+popcount-score only the probed
    cells' candidates, and the ``refine·k`` survivors re-rank with
    the exact dot product.  This is the cheapest composed first-pass
    that exists: candidate cost is two popcounts per probed-cell row.

    Exactness contract (same discipline as the other composed rungs):
    with ``n_probe = n_clusters`` the candidate set degenerates to the
    whole corpus and the result is IDENTICAL to ``hamming_topk`` at
    the same (k, refine) — which lets the registered query share the
    flat Hamming INTEGER-exact oracle.  The pruned path is pinned by
    the planted-top1 invariant and the recall/candidate tests.

    Plan shape mirrors ``ivfsq8_topk``: driver-side Lloyd fit on a
    ≤64k hash-sample, one map-only pass to assign cells + pack bits,
    broadcast (query × probed-cell) join keyed on the cell id — the
    corpus is never shuffled."""
    par = corpus.sparkSession.sparkContext.defaultParallelism
    c = fan_out(
        normalize(corpus, vec_col, "cv").select(key_col, "cv"), par
    )  # conditional spread - no-op once the scan has >= cores splits
    sample = hash_sample_rows(c, key_col, "cv", seed=seed)
    # dim from the sample (fixed-width schema) — no vec_dim .first() job
    dim = len(sample[0]) if sample else vec_dim(corpus, vec_col)
    n_words = (dim + 31) // 32
    centers = lloyd_centers(
        sample,
        n_clusters,
        seed=seed,
        max_iter=max_iter,
    )
    assigned = with_cells(c, "cv", [("cell", centers, 0)])
    cb = assigned.select(key_col, "cell", *hamming_pack_cols("cv", dim))

    spark = corpus.sparkSession
    centers_df = spark.createDataFrame(
        [(i, c_) for i, c_ in enumerate(centers)], ["cell", "center"]
    ).withColumn("center", F.col("center").cast("array<double>"))
    q = normalize(queries, vec_col, "qv").select(
        F.col(key_col).alias(query_key_col), "qv"
    )
    qb_words = q.select(
        query_key_col,
        *[c_.alias(f"__q{w}") for w, c_ in enumerate(
            hamming_pack_cols("qv", dim)
        )],
    )
    qcells = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn(
            "dist",
            F.expr(dot_expr("center", "center", dim))
            - 2.0 * F.expr(dot_expr("qv", "center", dim)),
        )
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy(query_key_col).orderBy("dist", "cell")
            ),
        )
        .filter(F.col("probe_rank") <= n_probe)
        .select(query_key_col, "cell")
        .join(F.broadcast(qb_words), on=query_key_col)
    )

    ham = hamming_distance_expr(n_words)
    cand_w = Window.partitionBy(query_key_col).orderBy(
        F.asc("__ham"), F.asc(key_col)
    )
    shortlist = (
        cb.join(F.broadcast(qcells), on="cell")
        .filter(F.col(key_col) != F.col(query_key_col))
        .withColumn("__ham", ham)
        .withColumn("__crank", F.row_number().over(cand_w))
        .filter(F.col("__crank") <= refine * k)
        .select(query_key_col, key_col)
    )
    # Broadcast the shortlist, never the corpus (bounded refine·k·|q|
    # rows — see pq_topk's re-rank note; same §3.1 rationale).
    exact = (
        F.broadcast(shortlist).join(c, on=key_col)
        .join(F.broadcast(q), on=query_key_col)
        .withColumn(
            "cosine", F.round(F.expr(dot_expr("cv", "qv", dim)), 6)
        )
    )
    w_ = Window.partitionBy(query_key_col).orderBy(
        F.desc("cosine"), F.asc(key_col)
    )
    return (
        exact.withColumn("rank", F.row_number().over(w_))
        .filter(F.col("rank") <= k)
        .select(query_key_col, key_col, "cosine", "rank")
    )


KMEANS_QUANT = float(1 << 20)  # 2^20: exact binary fixed-point scale


def kmeans_lloyd_quantized(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    salt: str = ":km",
) -> DataFrame:
    """DISTRIBUTED Lloyd k-means whose every step is cross-engine
    deterministic → final assignment [key, cluster, dist] after
    ``iters`` full updates — clustering joins the hash-matched
    real-computation family (ridge, Newton logistic, CART): the
    `embedding_kmeans_lloyd` oracle replays initialization, every
    assignment, every centroid update, and the final distances, and
    the driver value-hash covers the whole trajectory.

    Determinism engineering (same toolkit as the Newton fit):

    * Init is data-derived but total-ordered: the ``k`` rows with the
      smallest md5(key||salt) (ties by key) become centroids 0..k-1 —
      no RNG stream, identical in any engine.
    * Distances are left-to-right HOF folds over CAST(float AS
      DOUBLE) coordinates against LITERAL centroid arrays — the exact
      IEEE sequence the oracle unrolls term by term; the argmin is
      made total by ties-to-smallest-cluster.
    * Centroid updates — the only order-dependent sums — are
      fixed-point binary quantized: each coordinate is scaled by 2^20
      (exact), rounded to an integer-valued double, summed as
      DECIMAL(38,0) (exact in any order), unscaled, divided by the
      exact integer count.  An emptied cluster keeps its previous
      centroid (both engines alike).

    Scale shape: per iteration ONE map-only assignment projection +
    one (k·dim)-key grouped aggregate (map-side combined — shuffle
    bounded by k·dim counter rows, not corpus size) and a k·dim
    driver collect; no MLlib, no sampling, the full corpus votes in
    every update.  This is the honest distributed twin of
    ``lloyd_centers`` (which fits on a driver-side sample for IVF
    cell layout)."""
    probe = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if probe is None:
        raise ValueError(f"need at least k={k} rows to initialize")
    if probe["d"] is None or int(probe["d"]) <= 0:
        raise ValueError(
            f"column {vec_col!r} must hold non-empty non-NULL vectors; "
            f"probed size was {probe['d']!r}"
        )
    dim = int(probe["d"])
    ed = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # (A fan_out of this projection was measured and REVERTED in the
    # r13 optimization round: at the harness's 2k-row corpus the k·dim
    # distance folds are too cheap to amortize the extra exchange and
    # per-iteration 32-task stages — interleaved A/B 2.3 s → 2.9 s.)
    base = df.select(
        F.col(key_col), ed.alias("__ed"),
        F.md5(
            F.concat(F.col(key_col).cast("string"), F.lit(salt))
        ).alias("__h"),
    )
    init_rows = (
        base.orderBy("__h", key_col).limit(k).select("__ed").collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"need at least k={k} rows to initialize")
    centroids = [[float(v) for v in r["__ed"]] for r in init_rows]

    def dist_cols(cents: list) -> list:
        out = []
        for c in range(k):
            carr = F.array(*[F.lit(v) for v in cents[c]])
            out.append(
                F.aggregate(
                    F.zip_with(
                        F.col("__ed"), carr, lambda x, y: (x - y) * (x - y)
                    ),
                    F.lit(0.0),
                    lambda a, v: a + v,
                ).alias(f"__d{c}")
            )
        return out

    def cluster_col() -> F.Column:
        expr = None
        for c in range(k - 1):
            cond = None
            for j in range(c + 1, k):
                leq = F.col(f"__d{c}") <= F.col(f"__d{j}")
                cond = leq if cond is None else cond & leq
            expr = (
                F.when(cond, c) if expr is None else expr.when(cond, c)
            )
        return expr.otherwise(k - 1)

    for _ in range(iters):
        assigned = base.select(key_col, "__ed", *dist_cols(centroids))
        assigned = assigned.withColumn("__c", cluster_col())
        sums = (
            assigned.select(
                "__c", F.posexplode("__ed").alias("__j", "__x")
            )
            .groupBy("__c", "__j")
            .agg(
                F.sum(
                    F.round(F.col("__x") * F.lit(KMEANS_QUANT), 0).cast(
                        "decimal(38,0)"
                    )
                ).alias("__s"),
                F.count(F.lit(1)).alias("__n"),
            )
            .collect()
        )
        new = [list(c) for c in centroids]  # emptied cluster keeps prev
        for r in sums:
            new[int(r["__c"])][int(r["__j"])] = (
                float(int(r["__s"])) / KMEANS_QUANT
            ) / float(int(r["__n"]))
        centroids = new

    final = base.select(
        key_col, "__ed", *dist_cols(centroids)
    ).withColumn("__c", cluster_col())
    pick = None
    for c in range(k):
        cond = F.col("__c") == c
        pick = (
            F.when(cond, F.col(f"__d{c}"))
            if pick is None
            else pick.when(cond, F.col(f"__d{c}"))
        )
    return final.select(
        F.col(key_col),
        F.col("__c").alias("cluster"),
        F.round(pick, 6).alias("dist"),
    )
