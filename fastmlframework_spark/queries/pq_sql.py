"""DuckDB-SQL twin of the product-quantization top-k (VERDICT r4 #4).

``pq_topk`` (extensions/similarity.py) is deterministic end-to-end:
the codebooks come from a seeded driver-side numpy Lloyd fit on a
machine-independent keyed hash-sample, and every distributed step is
fixed-order IEEE arithmetic.  This module reproduces the whole chain
in SQL so ``ann_topk_pq`` graduates from rows-only to a full
hash-matched oracle:

1. **Fit replication (Python, oracle-build time)** — the identical
   sample (xxhash64-of-key order, via the validated
   ``queries/xxh64_sql.py`` twin executed in DuckDB) and the identical
   ``lloyd_centers`` call (same function, same numpy, same seed) give
   bit-identical codebooks, which are inlined as literals — exactly
   how ``queries/lsh_sql.py`` inlines the seed-7 hyperplanes.
2. **Encode twin (SQL)** — nearest-center assignment per subspace as
   ``cc_j − 2·Σ v·c`` with a strict left-to-right product chain; the
   Spark side (``with_cells``) accumulates in the same order, so the
   doubles — and therefore the argmin codes — are bit-identical.
   First-minimum-wins ties map to ``ORDER BY d, j``.
3. **ADC + exact refine (SQL)** — per-query lookup terms are the same
   left-to-right folds, the 8-term ADC sum is an explicit
   left-associated chain (never ``SUM()``, whose order is undefined),
   and the refine re-rank reuses the established unrolled ``dot_sql``.

The oracle is a function OF THE DATASET (codebooks are fitted from the
corpus), so the SQL string is built against the directory the driver
compares at (sf0.01; ``FASTML_TEST_SF_DIR`` override honored).  The
Spark query itself stays scale-generic — only the oracle literal is
bound to the comparison dir, the same way a planted oracle is bound
to the planted rows.
"""

from __future__ import annotations

import os

from fastmlframework_spark.queries import lsh_sql as L
from fastmlframework_spark.queries import xxh64_sql as X

DEFAULT_SF_DIR = os.environ.get("FASTML_TEST_SF_DIR", "/root/testdata/sf0.01")


def normalized_hash_sample(
    sf_dir: str, seed: int = 7, cap: int = 65536
) -> list[list[float]]:
    """Bit-exact replication of ``hash_sample_rows`` over the
    L2-normalized embeddings table, without a SparkSession: the
    hash-sample order comes from the DuckDB xxhash64 twin, and
    normalization mirrors Spark's ``_NORM`` float semantics (float32
    squares, exact widen, strictly sequential double accumulation) —
    the shared fit input of every quantizer oracle."""
    import duckdb
    import numpy as np

    con = duckdb.connect()
    h = X.xxhash64_str("CAST(vec_id AS VARCHAR)", extra_int=seed)
    rows = con.execute(
        f"""
        SELECT CAST(vec_id AS VARCHAR) AS k,
               CAST((({h}) % 1000000 + 1000000) % 1000000 AS BIGINT) AS hs,
               embedding
        FROM read_parquet('{sf_dir}/embeddings.parquet')
        """
    ).fetchall()
    n = len(rows)
    if n > cap:
        thr = int(1_200_000 * cap / n) + 1
        rows = [r for r in rows if r[1] < thr]
    rows.sort(key=lambda r: (r[1], r[0]))
    rows = rows[:cap]

    sample = []
    for _k, _hs, emb in rows:
        v32 = np.asarray(emb, dtype=np.float32)
        # Spark `aggregate(v, 0.0D, (a, e) -> a + e*e)`: float32
        # multiply, exact widen, strictly sequential double sum
        # (np.cumsum is sequential by construction).
        sq = (v32 * v32).astype(np.float64)
        norm = float(np.sqrt(np.cumsum(sq)[-1]))
        sample.append((v32.astype(np.float64) / norm).tolist())
    return sample


def fit_codebooks(
    sf_dir: str,
    m: int = 8,
    n_codes: int = 32,
    seed: int = 7,
    max_iter: int = 2,
    cap: int = 65536,
) -> list[list[list[float]]]:
    """Bit-exact replication of ``pq_topk``'s driver-side fit, without
    a SparkSession: the sample comes from ``normalized_hash_sample``
    and the per-subspace codebooks come from the SAME
    ``lloyd_centers`` function the operator calls."""
    from fastmlframework_spark.extensions.similarity import lloyd_centers

    sample = normalized_hash_sample(sf_dir, seed, cap)
    dim = len(sample[0])
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    sub = dim // m
    return [
        lloyd_centers(
            [row[s * sub: (s + 1) * sub] for row in sample],
            n_codes,
            seed=seed + s,
            max_iter=max_iter,
        )
        for s in range(m)
    ]


def _chain(terms: list[str]) -> str:
    """Explicit left-associated ``+`` chain — matches a 0.0-seeded
    Spark fold / sequential numpy accumulation bit-for-bit."""
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def pq_topk_oracle(
    sf_dir: str = DEFAULT_SF_DIR,
    k: int = 3,
    m: int = 8,
    n_codes: int = 32,
    refine: int = 8,
    dim: int = 64,
    seed: int = 7,
    max_iter: int = 2,
    n_queries: int = 10,
) -> str:
    """Full SQL twin of ``ann_topk_pq`` with the fitted codebooks
    inlined as literals."""
    import numpy as np

    centers = fit_codebooks(sf_dir, m, n_codes, seed, max_iter)
    sub = dim // m

    # cb VALUES rows: (s, j, cc, c1..c{sub}) with cc computed exactly
    # like with_cells: float64 elementwise squares, sequential sum.
    vals = []
    for s, ctrs in enumerate(centers):
        C = np.asarray(ctrs, dtype=np.float64)
        cc = np.cumsum(C * C, axis=1)[:, -1]
        for j, ctr in enumerate(ctrs):
            cols = ", ".join(f"{x!r}::DOUBLE" for x in ctr)
            vals.append(f"({s}, {j}, {float(cc[j])!r}::DOUBLE, {cols})")
    c_cols = ", ".join(f"c{t + 1}" for t in range(sub))
    cb_rows = ",\n    ".join(vals)

    # left-to-right product chains (0.0-seeded fold == first term)
    enc_dot = _chain(
        [f"nv[s * {sub} + {t + 1}] * c{t + 1}" for t in range(sub)]
    )
    lut_dot = _chain(
        [f"qv[s * {sub} + {t + 1}] * c{t + 1}" for t in range(sub)]
    )
    adc_sum = _chain([f"t{s}" for s in range(m)])
    adc_pivot = ",\n         ".join(
        f"MAX(CASE WHEN cd.s = {s} THEN l.lutd END) AS t{s}" for s in range(m)
    )
    nsq = L.norm_sq_float_sql("v")

    return f"""
WITH c0 AS (SELECT vec_id, embedding AS v FROM embeddings),
cn AS (
  SELECT vec_id, list_transform(v, __x -> __x / sqrt({nsq})) AS nv FROM c0
),
q AS (SELECT vec_id AS query_id, nv AS qv FROM cn WHERE vec_id < {n_queries}),
cb AS (
  SELECT * FROM (VALUES
    {cb_rows}
  ) AS t(s, j, cc, {c_cols})
),
enc AS (
  SELECT vec_id, s, j,
         ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS rn
  FROM (
    SELECT cn.vec_id, cb.s, cb.j, cb.cc - 2 * {enc_dot} AS d
    FROM cn, cb
  ) dists
),
codes AS (SELECT vec_id, s, j AS code FROM enc WHERE rn = 1),
luts AS (
  SELECT q.query_id, cb.s, cb.j, {lut_dot} AS lutd FROM q, cb
),
adcp AS (
  SELECT l.query_id, cd.vec_id,
         {adc_pivot}
  FROM codes cd JOIN luts l ON l.s = cd.s AND l.j = cd.code
  GROUP BY l.query_id, cd.vec_id
),
cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY {adc_sum} DESC, vec_id) AS cr
    FROM adcp WHERE vec_id <> query_id
  ) ranked WHERE cr <= {refine * k}
),
exact AS (
  SELECT cand.query_id, cand.vec_id,
         ROUND({L.dot_sql("c.nv", "q.qv", dim)}, 6) AS cosine
  FROM cand
  JOIN cn c ON c.vec_id = cand.vec_id
  JOIN q ON q.query_id = cand.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM exact
) t WHERE rank <= {k}
"""


def fit_ivf_centers(
    sf_dir: str = DEFAULT_SF_DIR,
    n_clusters: int = 8,
    seed: int = 7,
    max_iter: int = 3,
    cap: int = 65536,
) -> list[list[float]]:
    """Bit-exact replication of the IVF rungs' coarse-quantizer fit
    (``ivf_topk``'s ``lloyd_centers(hash_sample_rows(...))`` chain)
    without a SparkSession — full-dim, one codebook."""
    from fastmlframework_spark.extensions.similarity import lloyd_centers

    return lloyd_centers(
        normalized_hash_sample(sf_dir, seed, cap),
        n_clusters,
        seed=seed,
        max_iter=max_iter,
    )


def ivf_cell_stats_oracle(
    sf_dir: str = DEFAULT_SF_DIR,
    n_clusters: int = 8,
    dim: int = 64,
    seed: int = 7,
    max_iter: int = 3,
) -> str:
    """Full SQL twin of ``ann_ivf_cell_stats`` (VERDICT r9 #6): the
    fitted coarse centers are inlined as literals, assignment replays
    ``with_cells``' ``cc − 2·Σ v·c`` argmin with the same strict
    left-to-right product chain and lowest-cell tie-break, and the
    histogram/imbalance arithmetic mirrors the Spark expressions
    operation-for-operation (integer→double divisions in the same
    order)."""
    import numpy as np

    centers = fit_ivf_centers(sf_dir, n_clusters, seed, max_iter)
    C = np.asarray(centers, dtype=np.float64)
    cc = np.cumsum(C * C, axis=1)[:, -1]
    vals = []
    for j, ctr in enumerate(centers):
        cols = ", ".join(f"{x!r}::DOUBLE" for x in ctr)
        vals.append(f"({j}, {float(cc[j])!r}::DOUBLE, {cols})")
    c_cols = ", ".join(f"c{t + 1}" for t in range(dim))
    cb_rows = ",\n    ".join(vals)
    enc_dot = _chain([f"nv[{t + 1}] * c{t + 1}" for t in range(dim)])
    nsq = L.norm_sq_float_sql("v")
    k_eff = float(len(centers))

    return f"""
WITH c0 AS (SELECT vec_id, embedding AS v FROM embeddings),
cn AS (
  SELECT vec_id, list_transform(v, __x -> __x / sqrt({nsq})) AS nv FROM c0
),
cb AS (
  SELECT * FROM (VALUES
    {cb_rows}
  ) AS t(cell, cc, {c_cols})
),
enc AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
  FROM (
    SELECT cn.vec_id, cb.cell, cb.cc - 2 * {enc_dot} AS d
    FROM cn, cb
  ) dists
),
counts AS (
  SELECT cell, COUNT(*)::BIGINT AS n_vecs FROM enc WHERE rn = 1 GROUP BY cell
),
hist AS (
  SELECT cells.cell, COALESCE(counts.n_vecs, 0)::BIGINT AS n_vecs
  FROM (SELECT DISTINCT cell FROM cb) cells
  LEFT JOIN counts USING (cell)
),
tot AS (
  SELECT SUM(n_vecs)::BIGINT AS total, MAX(n_vecs)::BIGINT AS maxn FROM hist
)
SELECT cell, n_vecs,
       ROUND(n_vecs / total, 6) AS share,
       ROUND(maxn / (total / {k_eff!r}), 6) AS imbalance
FROM hist, tot
ORDER BY cell
"""


def ivf_partial_topk_oracle(
    sf_dir: str = DEFAULT_SF_DIR,
    k: int = 3,
    n_clusters: int = 8,
    n_probe: int = 2,
    dim: int = 64,
    seed: int = 7,
    max_iter: int = 3,
    n_queries: int = 10,
) -> str:
    """Full SQL twin of the PARTIAL-probe IVF path (``ivf_topk`` with
    n_probe < n_clusters).  Expressible only because probe-cell
    ranking now uses the same ``cc − 2·Σ v·c`` score (same literal
    centers, same left-to-right chains, same lowest-cell tie-break) as
    corpus assignment (ADVICE r9 fix) — before that, the Spark side
    ranked probes by raw dot and the two metrics could disagree, so
    the pruned path was pinned only by planted-copy contracts.  Now
    the probed cell set, the candidate set, and the exact re-rank are
    all replayed bit-exactly."""
    import numpy as np

    centers = fit_ivf_centers(sf_dir, n_clusters, seed, max_iter)
    C = np.asarray(centers, dtype=np.float64)
    cc = np.cumsum(C * C, axis=1)[:, -1]
    vals = []
    for j, ctr in enumerate(centers):
        cols = ", ".join(f"{x!r}::DOUBLE" for x in ctr)
        vals.append(f"({j}, {float(cc[j])!r}::DOUBLE, {cols})")
    c_cols = ", ".join(f"c{t + 1}" for t in range(dim))
    cb_rows = ",\n    ".join(vals)
    enc_dot = _chain([f"nv[{t + 1}] * c{t + 1}" for t in range(dim)])
    probe_dot = _chain([f"qv[{t + 1}] * c{t + 1}" for t in range(dim)])
    nsq = L.norm_sq_float_sql("v")

    return f"""
WITH c0 AS (SELECT vec_id, embedding AS v FROM embeddings),
cn AS (
  SELECT vec_id, list_transform(v, __x -> __x / sqrt({nsq})) AS nv FROM c0
),
cb AS (
  SELECT * FROM (VALUES
    {cb_rows}
  ) AS t(cell, cc, {c_cols})
),
enc AS (
  SELECT vec_id, cell FROM (
    SELECT cn.vec_id, cb.cell,
           ROW_NUMBER() OVER (
             PARTITION BY cn.vec_id
             ORDER BY cb.cc - 2 * {enc_dot}, cb.cell) AS rn
    FROM cn, cb
  ) d WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, nv AS qv FROM cn WHERE vec_id < {n_queries}
),
qc AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, cb.cell,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY cb.cc - 2 * {probe_dot}, cb.cell) AS pr
    FROM q, cb
  ) d WHERE pr <= {n_probe}
),
cand AS (
  SELECT qc.query_id, enc.vec_id
  FROM qc JOIN enc USING (cell)
  WHERE enc.vec_id <> qc.query_id
),
scored AS (
  SELECT cand.query_id, cand.vec_id,
         ROUND({L.dot_sql("c.nv", "q.qv", dim)}, 6) AS cosine
  FROM cand
  JOIN cn c ON c.vec_id = cand.vec_id
  JOIN q ON q.query_id = cand.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) t WHERE rank <= {k}
"""


def ivf_recall_curve_oracle(
    sf_dir: str = DEFAULT_SF_DIR,
    k: int = 3,
    n_clusters: int = 8,
    dim: int = 64,
    seed: int = 7,
    max_iter: int = 3,
    n_queries: int = 10,
) -> str:
    """Full SQL twin of ``ann_ivf_recall_curve``: exact top-k via the
    validated brute-force shape, cell assignment + per-query probe
    ranks via the inlined literal centers (both the bit-exact
    ``cc − 2·Σ v·c`` chains), and the curve as an AVG of 0/1 doubles
    (exact integer sums — order-independent, so Spark's partial aggs
    and DuckDB agree bit-for-bit)."""
    import numpy as np

    centers = fit_ivf_centers(sf_dir, n_clusters, seed, max_iter)
    C = np.asarray(centers, dtype=np.float64)
    cc = np.cumsum(C * C, axis=1)[:, -1]
    vals = []
    for j, ctr in enumerate(centers):
        cols = ", ".join(f"{x!r}::DOUBLE" for x in ctr)
        vals.append(f"({j}, {float(cc[j])!r}::DOUBLE, {cols})")
    c_cols = ", ".join(f"c{t + 1}" for t in range(dim))
    cb_rows = ",\n    ".join(vals)
    enc_dot = _chain([f"nv[{t + 1}] * c{t + 1}" for t in range(dim)])
    probe_dot = _chain([f"qv[{t + 1}] * c{t + 1}" for t in range(dim)])
    nsq = L.norm_sq_float_sql("v")

    return f"""
WITH c0 AS (SELECT vec_id, embedding AS v FROM embeddings),
cn AS (
  SELECT vec_id, list_transform(v, __x -> __x / sqrt({nsq})) AS nv FROM c0
),
q AS (
  SELECT vec_id AS query_id, nv AS qv FROM cn WHERE vec_id < {n_queries}
),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, cn.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND({L.dot_sql("cn.nv", "q.qv", dim)}, 6) DESC,
                      cn.vec_id) AS rank
    FROM q, cn WHERE cn.vec_id <> q.query_id
  ) t WHERE rank <= {k}
),
cb AS (
  SELECT * FROM (VALUES
    {cb_rows}
  ) AS t(cell, cc, {c_cols})
),
enc AS (
  SELECT vec_id, cell FROM (
    SELECT cn.vec_id, cb.cell,
           ROW_NUMBER() OVER (
             PARTITION BY cn.vec_id
             ORDER BY cb.cc - 2 * {enc_dot}, cb.cell) AS rn
    FROM cn, cb
  ) d WHERE rn = 1
),
qr AS (
  SELECT query_id, cell, pr FROM (
    SELECT q.query_id, cb.cell,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY cb.cc - 2 * {probe_dot}, cb.cell) AS pr
    FROM q, cb
  ) d
),
hits AS (
  SELECT qr.pr
  FROM exact
  JOIN enc ON enc.vec_id = exact.vec_id
  JOIN qr ON qr.query_id = exact.query_id AND qr.cell = enc.cell
)
SELECT CAST(n.range AS INTEGER) AS n_probe,
       ROUND(AVG(CASE WHEN hits.pr <= n.range THEN 1.0 ELSE 0.0 END), 6)
         AS recall
FROM range(1, {n_clusters + 1}) n, hits
GROUP BY 1
ORDER BY 1
"""


def try_build_ivf_recall_curve_oracle() -> str | None:
    """Import-time builder for ``ann_ivf_recall_curve`` — same
    absent-dataset fallback contract as ``try_build_oracle``."""
    try:
        return ivf_recall_curve_oracle()
    except Exception:
        return None


def try_build_oracle() -> str | None:
    """Import-time builder: None (→ rows-only fallback) when the
    comparison dataset is absent or the fit fails for any reason —
    the oracle is an upgrade, never an import hazard."""
    try:
        return pq_topk_oracle()
    except Exception:
        return None


def try_build_ivf_cell_stats_oracle() -> str | None:
    """Import-time builder for ``ann_ivf_cell_stats`` — same
    absent-dataset fallback contract as ``try_build_oracle``."""
    try:
        return ivf_cell_stats_oracle()
    except Exception:
        return None


def try_build_ivf_partial_oracle() -> str | None:
    """Import-time builder for ``ann_topk_ivf_partial`` — same
    absent-dataset fallback contract as ``try_build_oracle``."""
    try:
        return ivf_partial_topk_oracle()
    except Exception:
        return None
