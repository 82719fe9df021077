"""Oracle-checked queries for the data-quality / corpus-hygiene
operators (SURVEY.md §7.5 extension layer): KS drift, MAD outlier
screening, referential-integrity audit, PII redaction stats, BM25
retrieval scoring, and token-entropy diversity screening.

Each query exercises the operator implementation in
``operators/stats.py`` / ``operators/integrity.py`` /
``extensions/privacy.py`` / ``extensions/text.py`` against a DuckDB
twin written to be bit-faithful: identical expression shapes and
evaluation order for float arithmetic, explicit BIGINT casts wherever
DuckDB would widen an integer aggregate to HUGEINT (driver-hash
contract, see tests/test_oracle_types.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastmlframework_spark.core.tables import fan_out, load_table
from fastmlframework_spark.extensions.privacy import PII_PATTERNS, pii_stats
from fastmlframework_spark.extensions.text import bm25_scores, token_entropy
from fastmlframework_spark.operators.integrity import orphan_counts
from fastmlframework_spark.operators.stats import ks_statistic, mad_outliers
from fastmlframework_spark.queries.registry import query


@query(
    "stat_ks_quantity_drift",
    oracle="""
WITH f AS (
  SELECT l_returnflag AS g, ROUND(l_quantity, 3) AS v
  FROM lineitem
  WHERE l_returnflag IN ('A', 'N') AND l_quantity IS NOT NULL
),
c AS (
  SELECT v,
         SUM(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS cb
  FROM f GROUP BY v
),
e AS (
  SELECT SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
         SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
  FROM c
),
t AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM c)
SELECT ROUND(MAX(ABS(cuma * 1.0 / na - cumb * 1.0 / nb)), 6) AS ks_stat,
       CAST(MAX(na) AS BIGINT) AS n_a,
       CAST(MAX(nb) AS BIGINT) AS n_b
FROM e, t
""",
)
def stat_ks_quantity_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS between returned ('A') and in-flight ('N') line
    items on quantity — the binning-free drift complement of
    ``drift_psi``.  Quantized grid keeps the ordered window bounded."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    return ks_statistic(li, "l_returnflag", "l_quantity", "A", "N")


@query(
    "stat_mad_outlier_prices",
    oracle="""
WITH med AS (
  SELECT o_orderpriority AS g, quantile_cont(o_totalprice, 0.5) AS med,
         COUNT(*) AS n
  FROM orders GROUP BY 1
),
mad AS (
  SELECT o.o_orderpriority AS g,
         quantile_cont(ABS(o.o_totalprice - m.med), 0.5) AS mad
  FROM orders o JOIN med m ON o.o_orderpriority = m.g GROUP BY 1
)
SELECT m.g AS o_orderpriority,
       CAST(m.n AS BIGINT) AS n,
       ROUND(m.med, 6) AS med,
       ROUND(d.mad, 6) AS mad,
       CAST(SUM(CASE WHEN ABS(o.o_totalprice - m.med)
                          > 3.0 * 1.4826 * d.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM orders o
JOIN med m ON o.o_orderpriority = m.g
JOIN mad d ON o.o_orderpriority = d.g
GROUP BY 1, 2, 3, 4
""",
)
def stat_mad_outlier_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority robust outlier screen on order totals — median/MAD
    via interpolating ``percentile`` (≡ DuckDB ``quantile_cont``)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    return mad_outliers(orders, "o_orderpriority", "o_totalprice")


@query(
    "integrity_orphan_counts",
    oracle="""
WITH po AS (SELECT DISTINCT o_orderkey AS k FROM orders),
pc AS (SELECT DISTINCT c_custkey AS k FROM customer),
pn AS (SELECT DISTINCT n_nationkey AS k FROM nation),
pe AS (SELECT DISTINCT user_id AS k FROM events)
SELECT 'lineitem->orders' AS rel,
       COUNT(*) FILTER (WHERE po.k IS NULL) AS n_orphans
FROM lineitem LEFT JOIN po ON l_orderkey = po.k
UNION ALL
SELECT 'orders->customer',
       COUNT(*) FILTER (WHERE pc.k IS NULL)
FROM orders LEFT JOIN pc ON o_custkey = pc.k
UNION ALL
SELECT 'customer->nation',
       COUNT(*) FILTER (WHERE pn.k IS NULL)
FROM customer LEFT JOIN pn ON c_nationkey = pn.k
UNION ALL
SELECT 'customer->events',
       COUNT(*) FILTER (WHERE pe.k IS NULL)
FROM customer LEFT JOIN pe ON c_custkey = pe.k
""",
)
def integrity_orphan_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over four declared relationships —
    three true foreign keys (expected 0 orphans) plus the deliberately
    over-strict "every customer has telemetry" rule, which reports the
    customers absent from the events table."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    events = load_table(spark, sf_dir, "events")
    return orphan_counts(
        [
            ("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"),
            ("orders->customer", orders, "o_custkey", cust, "c_custkey"),
            ("customer->nation", cust, "c_nationkey", nation, "n_nationkey"),
            ("customer->events", cust, "c_custkey", events, "user_id"),
        ]
    )


# The documents corpus is synthetic prose with no real PII, so the
# query plants deterministic PII derived from doc_id — identically in
# both engines.  doc_id % 3 == 0 embeds an email whose HOST contains a
# dotted quad: the precedence contract (email redacts before ipv4) is
# therefore load-bearing in the oracle comparison, not just unit-tested.
_PII_SQL_SUFFIX = """CASE
    WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                             || '@mail-10.0.0.9.example.com'
    WHEN doc_id % 3 = 1 THEN ' call 555-010-'
                             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
    ELSE ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
  END"""


@query(
    "pii_redaction_stats",
    oracle=f"""
WITH p AS (
  SELECT source, text || {_PII_SQL_SUFFIX} AS t
  FROM documents
),
s AS (
  SELECT source, t,
         regexp_replace(t, '{PII_PATTERNS["email"]}', '[EMAIL]', 'g') AS t1
  FROM p
),
s2 AS (
  SELECT source, t, t1,
         regexp_replace(t1, '{PII_PATTERNS["phone"]}', '[PHONE]', 'g') AS t2
  FROM s
),
s3 AS (
  SELECT source, t, t1, t2,
         regexp_replace(t2, '{PII_PATTERNS["ipv4"]}', '[IPV4]', 'g') AS t3
  FROM s2
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN t1 <> t THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_email,
       CAST(SUM(CASE WHEN t2 <> t1 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_phone,
       CAST(SUM(CASE WHEN t3 <> t2 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_ipv4,
       CAST(SUM(LENGTH(t) - LENGTH(t3)) AS BIGINT) AS chars_redacted
FROM s3 GROUP BY source
""",
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII redaction report over documents with planted,
    doc_id-derived PII.  Map-only chained regexp_replace + one tiny
    groupBy — one corpus read at any scale."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    suffix = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail-10.0.0.9.example.com"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit(" call 555-010-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit(" host 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".1"),
            )
        )
    )
    planted = docs.withColumn("text", F.concat(F.col("text"), suffix))
    return pii_stats(planted, by="source")


_BM25_TERMS = ("spark", "window", "hash")


def _bm25_term_sql(i: int, term: str) -> str:
    tf = f"tf{i}"
    return (
        f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5)) * {tf} * 2.2"
        f" / ({tf} + 1.2 * (0.25 + 0.75 * dl / avgdl))"
    )


@query(
    "text_bm25_scores",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'),
                         x -> x <> '')) AS dl,
         len(list_filter(string_split_regex(text, '\\s+'),
                         x -> x = '{_BM25_TERMS[0]}')) AS tf0,
         len(list_filter(string_split_regex(text, '\\s+'),
                         x -> x = '{_BM25_TERMS[1]}')) AS tf1,
         len(list_filter(string_split_regex(text, '\\s+'),
                         x -> x = '{_BM25_TERMS[2]}')) AS tf2
  FROM documents
),
st AS (
  SELECT COUNT(*) AS n, AVG(dl) AS avgdl,
         SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM base
)
SELECT doc_id,
       ROUND({_bm25_term_sql(0, _BM25_TERMS[0])}
           + {_bm25_term_sql(1, _BM25_TERMS[1])}
           + {_bm25_term_sql(2, _BM25_TERMS[2])}, 6) AS bm25
FROM base, st
WHERE tf0 + tf1 + tf2 > 0
""",
)
def text_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed 3-term query —
    per-row tf expressions plus one broadcast 1-row stats frame; no
    explode, no shuffle wider than the final projection."""
    # fan_out: per-row tf regex counters are the whole cost; spreading
    # the single-split scan halved the query at sf0.1 (guide §2.5).
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return bm25_scores(docs, _BM25_TERMS)


@query(
    "text_token_entropy",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split_regex(text, '\\s+')) AS t
  FROM documents
),
c AS (
  SELECT source, t, COUNT(*) AS c FROM tok WHERE t <> '' GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_distinct_tokens,
       ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 6) AS entropy
FROM c GROUP BY source
""",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Shannon token entropy (nats) — corpus-diversity
    screen; two map-side-combined shuffles, no join-back."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return token_entropy(docs, by="source")


@query(
    "quality_repetition_signals",
    oracle="""
WITH d AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
lf AS (
  SELECT doc_id, line FROM (
    SELECT doc_id, unnest(string_split(t, chr(10))) AS line FROM d
  ) raw WHERE trim(line) <> ''
),
plc AS (SELECT doc_id, line, COUNT(*) AS c FROM lf GROUP BY 1, 2),
ls AS (
  SELECT doc_id, SUM(c) AS n_lines, SUM(c - 1) AS dl,
         SUM(c * length(line)) AS lc, SUM((c - 1) * length(line)) AS dlc
  FROM plc GROUP BY 1
),
w AS (
  SELECT doc_id,
         list_filter(string_split_regex(t, '\\s+'), __x -> __x <> '') AS ws
  FROM d
),
wn AS (
  SELECT doc_id, ws, len(ws) AS nw,
         length(array_to_string(ws, ' ')) AS tc
  FROM w
),
g2 AS (
  SELECT doc_id, tc, array_to_string(ws[i:i+1], ' ') AS g
  FROM (
    SELECT doc_id, tc, ws,
           unnest(range(1, CASE WHEN nw >= 2 THEN nw ELSE 1 END)) AS i
    FROM wn
  ) e
),
t2 AS (
  SELECT doc_id, c * length(g) * 1.0 / greatest(tc, 1) AS topf FROM (
    SELECT doc_id, g, tc, COUNT(*) AS c,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY COUNT(*) DESC, length(g) DESC, g ASC)
               AS r
    FROM g2 GROUP BY doc_id, g, tc
  ) ranked WHERE r = 1
),
g5 AS (
  SELECT doc_id, nw, i AS pos, array_to_string(ws[i:i+4], ' ') AS g
  FROM (
    SELECT doc_id, nw, ws,
           unnest(range(1, CASE WHEN nw >= 5 THEN nw - 3 ELSE 1 END)) AS i
    FROM wn
  ) e
),
dp AS (
  SELECT doc_id, nw, pos FROM (
    SELECT doc_id, nw, pos, COUNT(*) OVER (PARTITION BY doc_id, g) AS c
    FROM g5
  ) cc WHERE c >= 2
),
sp AS (
  SELECT doc_id, nw,
         SUM(CASE WHEN prev IS NULL OR pos - prev > 5 THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span,
         pos
  FROM (
    SELECT doc_id, nw, pos,
           LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
    FROM dp
  ) lagged
),
sa AS (
  SELECT doc_id, nw, span, MIN(pos) AS lo, MAX(pos) AS hi
  FROM sp GROUP BY 1, 2, 3
),
df_ AS (
  SELECT doc_id, SUM(hi - lo + 5) * 1.0 / greatest(MIN(nw), 1) AS dupf
  FROM sa GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(ls.n_lines, 0) AS BIGINT) AS n_lines,
       ROUND(COALESCE(ls.dl * 1.0 / greatest(ls.n_lines, 1), 0), 6)
           AS dup_line_frac,
       ROUND(COALESCE(ls.dlc * 1.0 / greatest(ls.lc, 1), 0), 6)
           AS dup_line_char_frac,
       ROUND(COALESCE(t2.topf, 0), 6) AS top_2gram_char_frac,
       ROUND(COALESCE(df_.dupf, 0), 6) AS dup_5gram_word_frac
FROM d
LEFT JOIN ls ON ls.doc_id = d.doc_id
LEFT JOIN t2 ON t2.doc_id = d.doc_id
LEFT JOIN df_ ON df_.doc_id = d.doc_id
""",
)
def quality_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition battery (Gopher §A.1.1's repetition
    half, the Dolma/RefinedWeb reuse): duplicate-line fractions,
    top-2-gram coverage, and masked duplicate-5-gram word coverage
    per document — two linear explodes, per-document windows, no pair
    joins."""
    from fastmlframework_spark.extensions.filtering import repetition_signals

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_signals(docs)


def _agreement_oracle() -> str:
    """Per-doc fail bits for the three cheap batteries (Gopher, C4
    page rules, repetition) → 1-row count aggregate → the 6-row
    pairwise agreement matrix via UNION ALL."""
    from fastmlframework_spark.extensions.text import TOKEN_PATTERN
    from fastmlframework_spark.queries.filtering import (
        _C4_POLICY_OR,
        _gopher_fl_ctes,
    )

    gf = (
        "fail_words OR fail_word_len OR fail_symbol OR fail_bullet"
        " OR fail_ellipsis OR fail_alpha OR fail_stopword"
    )
    pair_rows = []
    names = {"g": "gopher", "c": "c4", "r": "repetition"}
    for a, b in (("c", "c"), ("c", "g"), ("c", "r"),
                 ("g", "g"), ("g", "r"), ("r", "r")):
        both = f"s_{a}{b}" if a != b else f"s_{a}"
        either = (
            f"s_{a}" if a == b else f"s_{a} + s_{b} - s_{a}{b}"
        )
        pair_rows.append(
            f"SELECT '{names[a]}' AS filter_a, '{names[b]}' AS filter_b,"
            f" CAST({both} AS BIGINT) AS n_fail_both,"
            f" CAST({either} AS BIGINT) AS n_fail_either,"
            f" ROUND({both} * 1.0 / NULLIF({either}, 0), 6)"
            " AS overlap_jaccard FROM s"
        )
    union = "\nUNION ALL\n".join(pair_rows)
    return f"""
WITH {_gopher_fl_ctes(keys="doc_id", rel="documents")},
bits AS (
  SELECT f.doc_id,
         CAST(({gf}) AS INT) AS g,
         CAST((contains(d.text, '{{') OR contains(lower(d.text), 'lorem ipsum')
               OR ({_C4_POLICY_OR.replace("text", "d.text")})
               OR len(regexp_extract_all(d.text, '[.!?]')) < 3) AS INT) AS c,
         CAST((len(regexp_extract_all(d.text, '{TOKEN_PATTERN}')) > 0
               AND len(list_distinct(regexp_extract_all(d.text, '{TOKEN_PATTERN}')))
                   * 1.0 / len(regexp_extract_all(d.text, '{TOKEN_PATTERN}')) < 0.4)
              AS INT) AS r
  FROM fl f JOIN documents d USING (doc_id)
),
s AS (
  SELECT SUM(g) AS s_g, SUM(c) AS s_c, SUM(r) AS s_r,
         SUM(c * g) AS s_cg, SUM(c * r) AS s_cr, SUM(g * r) AS s_gr
  FROM bits
)
{union}
ORDER BY filter_a, filter_b
"""


@query("quality_filter_agreement", oracle=_agreement_oracle())
def quality_filter_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the cheap quality batteries agree?  Pairwise overlap matrix
    of the Gopher, C4-page, and repetition fail sets — [filter_a,
    filter_b, n_fail_both, n_fail_either, overlap_jaccard] (diagonal
    = each filter's own fail count).  High off-diagonal Jaccard means
    one battery is redundant; near-zero means they remove DIFFERENT
    documents and stacking them compounds the cut — the ablation
    figure filtering papers report before composing gates.

    Plan: all three verdicts are per-row expressions computed in ONE
    map-only projection; everything reduces to a 1-row six-sum
    aggregate, and the 6-row matrix is an explode over that broadcast
    row — the corpus is scanned once at any scale."""
    from fastmlframework_spark.extensions.curation import repetition_stats
    from fastmlframework_spark.extensions.filtering import (
        c4_page_flags,
        gopher_rule_flags,
    )

    # fan_out: three per-row rule batteries over one scan — pure map
    # work ahead of a 1-row integer-sum aggregate (guide §2.5).
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    g = gopher_rule_flags(docs).select(
        "doc_id", "text", (~F.col("passes")).cast("int").alias("__g")
    )
    gc = c4_page_flags(g).select(
        "doc_id", "text", "__g", (~F.col("passes")).cast("int").alias("__c")
    )
    rep = repetition_stats(gc.select("doc_id", "text")).select(
        "doc_id",
        (
            (F.col("n_tokens") > 0) & (F.col("distinct_ratio") < 0.4)
        ).cast("int").alias("__r"),
    )
    bits = gc.join(rep, on="doc_id")
    s_agg = bits.agg(
        F.sum("__g").alias("s_g"),
        F.sum("__c").alias("s_c"),
        F.sum("__r").alias("s_r"),
        F.sum(F.col("__c") * F.col("__g")).alias("s_cg"),
        F.sum(F.col("__c") * F.col("__r")).alias("s_cr"),
        F.sum(F.col("__g") * F.col("__r")).alias("s_gr"),
    )
    names = {"g": "gopher", "c": "c4", "r": "repetition"}
    combos = [("c", "c"), ("c", "g"), ("c", "r"),
              ("g", "g"), ("g", "r"), ("r", "r")]
    structs = []
    for a, b in combos:
        both = F.col(f"s_{a}") if a == b else F.col(f"s_{a}{b}")
        either = (
            F.col(f"s_{a}")
            if a == b
            else F.col(f"s_{a}") + F.col(f"s_{b}") - F.col(f"s_{a}{b}")
        )
        structs.append(
            F.struct(
                F.lit(names[a]).alias("filter_a"),
                F.lit(names[b]).alias("filter_b"),
                both.cast("long").alias("n_fail_both"),
                either.cast("long").alias("n_fail_either"),
                F.when(either == 0, F.lit(None).cast("double"))
                .otherwise(F.round(both * 1.0 / either, 6))
                .alias("overlap_jaccard"),
            )
        )
    return (
        s_agg.select(F.explode(F.array(*structs)).alias("__row"))
        .select("__row.*")
        .orderBy("filter_a", "filter_b")
    )
