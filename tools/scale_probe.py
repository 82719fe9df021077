#!/usr/bin/env python
"""Scale probe: replicate the driver testdata N× (disjoint key spaces)
and time representative queries, to check operators scale linearly
before they meet real data volumes.

    python tools/scale_probe.py [--factor 10] [--src /root/testdata/sf0.1]
        [--out /tmp/scale_probe] [--queries q1_pricing_summary,...]

Observed at factor=10 (6M-row lineitem, 67k docs, local[32]):
every probed operator stays linear-or-better — grouped aggregates and
window top-k amortize fixed overhead (~2-3x wall for 10x rows), the
minhash LSH path grows with candidate-pair count as designed.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from fastmlframework_spark.core.session import get_spark  # noqa: E402
from fastmlframework_spark.core.tables import load_table  # noqa: E402
from fastmlframework_spark.queries.registry import all_queries  # noqa: E402

# Fact tables get key-shifted copies; dimensions stay as-is.
KEY_SHIFT = {
    "lineitem": ("l_orderkey", 10_000_000),
    "orders": ("o_orderkey", 10_000_000),
    "documents": ("doc_id", 1_000_000),
    "embeddings": ("vec_id", 1_000_000),
    "events": ("event_id", 100_000_000),
}

DEFAULT_QUERIES = (
    "q1_pricing_summary,q5_region_revenue,dedup_exact,dedup_minhash_lsh,"
    "text_quality_by_lang,events_sessionize,window_topk_per_group"
)


def replicate(spark, src: str, out: str, factor: int,
              mutate: bool = False, step_mult: int = 1,
              level: int = 0) -> None:
    """N× the testdata with disjoint key spaces.

    ``mutate`` makes replica content DISTINCT so similarity structure
    stays proportional instead of exploding (without it, every doc/
    vector gains ``factor`` exact copies and pair-emitting dedup paths
    scale with the inflated duplicate groups, poisoning scaling-law
    fits).  The mutations must clear the operators' NEAR-dup
    thresholds, not merely break equality (review r4: a one-token
    prefix left 3-gram Jaccard ≈ 0.95 ≥ the 0.5 verify bar, and a
    0.001-component shift left cosine ≈ 1−2e−6 ≥ 0.999 — every base
    item still gained C(factor,2) cross-replica pairs):
    - documents: replica i > 0 prefixes three replica tokens AND
      interleaves an ``r<i>`` token after every 2 words, so EVERY
      3-word shingle contains a replica-specific token (cross-replica
      Jaccard ≈ 0) and the distinct-word set shifts by 4 words
      (simhash margins move well past the hamming budget).  Planted
      %5/%7 dup fractions are preserved: the id step is a multiple of
      both bases and the corpus derivation runs in-query on the
      mutated text.
    - embeddings: a deterministic replica-specific direction from an
      integer hash of (replica, component) with magnitude 0.15/axis —
      ‖δ‖ ≈ 0.7, pushing cross-replica cosine far below the 0.999
      dedup thresholds at ANY factor (a sin(a·i + j) form had angular
      near-resonances that re-aligned certain replica pairs).
    - events: user_id shifts with the replica so the user population
      scales with the data instead of stacking 10× events per user

    ``step_mult``/``level`` support SECOND-level replication (sf1 →
    sf10, VERDICT r8 #6): the sf1 replica already consumed the base
    KEY_SHIFT strides and the level-0 mutation namespace, so a naive
    re-run would collide keys (replica 1's +10M overlaps sf1's own
    +10M block) and, worse, re-apply IDENTICAL mutations — sf1's
    replica-3-of-original and sf10's replica-3-of-sf1-original would
    carry the same ``r3`` tokens / the same embedding delta and become
    exact cross-level duplicates, quadratically inflating dup groups.
    ``step_mult=10`` widens every key stride past the sf1 key space;
    ``level=1`` switches the document tokens to an ``s<i>`` namespace
    and offsets the embedding hash seed, so cross-level variants stay
    distinct and the planted dup structure stays proportional.
    """
    tables = (
        "lineitem", "orders", "documents", "embeddings", "events",
        "customer", "supplier", "part", "nation", "region",
    )
    tok = "r" if level == 0 else "s" * level + "r"
    hash_i_off = level * 16  # distinct embedding-delta seed per level
    for t in tables:
        df = load_table(spark, src, t)
        if t in KEY_SHIFT:
            key, step = KEY_SHIFT[t]
            step *= step_mult
            copies = []
            for i in range(factor):
                cp = df.withColumn(key, F.col(key) + F.lit(i * step))
                if mutate and i > 0:
                    if t == "documents":
                        cp = cp.withColumn(
                            "text",
                            F.concat(
                                F.lit(f"{tok}a{i} {tok}b{i} {tok}c{i} "),
                                F.regexp_replace(
                                    F.col("text"),
                                    r"(\S+ \S+) ",
                                    f"$1 {tok}{i} ",
                                ),
                            ),
                        )
                    elif t == "embeddings":
                        # integer-hash shift, not sin(a*i+j): angular
                        # near-resonances make some replica pairs
                        # nearly collinear again at factor >= 62
                        # L-suffixed literals: with the level offset the
                        # product exceeds INT32 and ANSI mode raises
                        # ARITHMETIC_OVERFLOW on the int path.
                        cp = cp.withColumn(
                            "embedding",
                            F.expr(
                                "transform(embedding, (x, j) -> "
                                f"CAST(x + 0.15 * (CAST(({i + hash_i_off}L"
                                " * 73856093L "
                                "+ j * 19349663L) % 1000L AS DOUBLE) / 500.0 "
                                "- 1.0) AS FLOAT))"
                            ),
                        )
                    elif t == "events":
                        cp = cp.withColumn(
                            "user_id",
                            F.col("user_id")
                            + F.lit(i * 1_000_000 * step_mult),
                        )
                copies.append(cp)
            df = reduce(lambda a, b: a.unionByName(b), copies)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))


# Queries whose scaling law we certify each round: the dedup/ANN family
# (the paths DESIGNED to be sub-quadratic) plus two grouped-agg controls.
def exponent_queries() -> tuple[str, ...]:
    """The FULL benched registry (VERDICT r5 #4): every query the
    driver bench times gets a committed scaling exponent, so a
    super-linear constant invisible at sf0.1 cannot hide in an
    unprobed query.  bench=False queries (model fits, O(n²) oracle
    ground truths, recall invariants) are excluded for the same
    reasons bench.py documents in EXCLUDED_REASONS."""
    from fastmlframework_spark.queries.registry import bench_queries

    return tuple(sorted(bench_queries()))


def probe_exponents(
    spark,
    sf_dirs: list[str],
    queries: list[str],
    repeats: int = 2,
) -> dict:
    """Time each query at each scale factor and fit the scaling
    exponent b of t = a * sf^b (least-squares in log-log space).

    b ≈ 1 is linear, b ≈ 2 quadratic.  Fixed overhead (session, plan
    compile, codegen) deflates the estimate at small scales, so this is
    a smoke alarm for super-linear blowups, not a precision fit —
    exactly what we need: the bucketed dedup/ANN paths must stay well
    under 1.5 over a 100× data range.
    """
    import math

    from fastmlframework_spark.streaming.bench import STREAMING_BENCHES

    qs = all_queries()
    sfs = [float(os.path.basename(d.rstrip("/")).replace("sf", "")) for d in sf_dirs]
    out: dict = {"sf_dirs": sf_dirs, "queries": {}}
    for name in queries:
        # Streaming drains (stream_*) are end-to-end callables, not
        # lazy DataFrames — the drain itself is the timed action.
        if name in qs:
            fn = qs[name]

            def run(d, fn=fn):
                fn(spark, d).write.format("noop").mode("overwrite").save()
        else:
            sfn = STREAMING_BENCHES[name]

            def run(d, sfn=sfn):
                sfn(spark, d)
        run(sf_dirs[0])  # warm-up
        times = []
        for d in sf_dirs:
            best = min(
                _timed(lambda: run(d)) for _ in range(repeats)
            )
            times.append(round(best, 4))
        xs = [math.log(s) for s in sfs]
        ys = [math.log(t) for t in times]
        n = len(xs)
        xbar, ybar = sum(xs) / n, sum(ys) / n
        slope = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
            (x - xbar) ** 2 for x in xs
        )
        # Top-decade exponent: fixed overhead deflates the global fit
        # at small sfs (b ≈ 0.1 reads "constant cost"), so the honest
        # scaling signal is the LAST decade, where data finally
        # dominates.  This is what the sf1 extension certifies.
        top = (ys[-1] - ys[-2]) / (xs[-1] - xs[-2])
        out["queries"][name] = {
            "sf": sfs,
            "sec": times,
            "exponent": round(slope, 4),
            "exponent_top_decade": round(top, 4),
        }
        print(
            f"{name:28s} exponent={slope:+.3f} top_decade={top:+.3f} "
            f"times={times}"
        )
    return out


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _refit(sfs: list[float], times: list[float]) -> tuple[float, float]:
    """(global log-log slope, top-decade slope) — same fit as
    probe_exponents."""
    import math

    xs = [math.log(s) for s in sfs]
    ys = [math.log(t) for t in times]
    n = len(xs)
    if n < 2:
        # a 1-point series (fresh query whose lower-decade dirs were
        # all absent) has no slope — report 0 rather than dividing
        # by a zero variance
        return 0.0, 0.0
    xbar, ybar = sum(xs) / n, sum(ys) / n
    slope = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
        (x - xbar) ** 2 for x in xs
    )
    top = (ys[-1] - ys[-2]) / (xs[-1] - xs[-2])
    return round(slope, 4), round(top, 4)


def add_decade(
    spark,
    json_path: str,
    sf_dir: str,
    queries: list[str] | None = None,
    repeats: int = 2,
    skip_existing: bool = True,
) -> dict:
    """Extend a committed exponent table with ONE new decade (VERDICT
    r10 #3: full-registry sf10 evidence): time each query at
    ``sf_dir`` only, append the (sf, sec) sample to the existing
    series, and refit both exponents — the lower decades' committed
    timings are reused, so certifying the fifth decade costs one
    full-registry pass at sf10 instead of five passes.  Queries added
    to the registry since the base table was committed (no existing
    series) get a full fresh probe over the standard decades +
    ``sf_dir``."""
    import json
    import math  # noqa: F401 (refit)

    from fastmlframework_spark.streaming.bench import STREAMING_BENCHES

    with open(json_path) as fh:
        table = json.load(fh)
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    qs = all_queries()
    names = queries or sorted(table["queries"])
    fresh = [n for n in (queries or []) if n not in table["queries"]]
    if not queries:
        # default: every committed series + any new benched queries
        from fastmlframework_spark.queries.registry import bench_queries

        fresh = sorted(set(bench_queries()) - set(table["queries"]))
        names = sorted(table["queries"]) + fresh
    if fresh:
        # fresh queries get the table's own committed decades (incl.
        # the replicated sf1 set), so their series stay comparable to
        # everyone else's before this decade is appended
        lower = [
            d for d in table["sf_dirs"]
            if os.path.isdir(d) and os.path.abspath(d) != os.path.abspath(sf_dir)
        ]
        fresh_fit = probe_exponents(spark, lower, fresh, repeats=repeats)
        table["queries"].update(fresh_fit["queries"])
    def _save() -> None:
        # checkpoint after EVERY query: an sf10 pass is an hour-plus
        # and an executor OOM must not discard the finished timings
        # (learned the hard way — the first full run died at query 46
        # and wrote nothing); skip_existing makes the rerun a resume.
        with open(json_path, "w") as fh:
            json.dump(table, fh, indent=1, sort_keys=True)

    for name in names:
        row = table["queries"][name]
        if skip_existing and sf in row["sf"]:
            continue
        if name in qs:
            fn = qs[name]

            def run(d, fn=fn):
                fn(spark, d).write.format("noop").mode("overwrite").save()
        elif name in STREAMING_BENCHES:
            sfn = STREAMING_BENCHES[name]

            def run(d, sfn=sfn):
                sfn(spark, d)
        else:
            # committed series for a query retired/renamed since the
            # base table was written — skip rather than abort an
            # hour-plus sf10 pass mid-run with a KeyError
            print(
                f"{name:28s} SKIP: absent from both registries "
                "(retired since the base table was committed)",
                flush=True,
            )
            continue
        best = min(_timed(lambda: run(sf_dir)) for _ in range(repeats))
        if sf in row["sf"]:  # re-probe: replace the existing sample
            i = row["sf"].index(sf)
            row["sec"][i] = round(best, 4)
        else:
            # keep (sf, sec) sorted by sf — a later backfill of a
            # MIDDLE decade (e.g. sf1 for a query first probed after
            # the sf1 pass) must not leave the series out of order
            pairs = sorted(
                zip(row["sf"] + [sf], row["sec"] + [round(best, 4)])
            )
            row["sf"] = [p[0] for p in pairs]
            row["sec"] = [p[1] for p in pairs]
        row["exponent"], row["exponent_top_decade"] = _refit(
            row["sf"], row["sec"]
        )
        print(
            f"{name:28s} exponent={row['exponent']:+.3f} "
            f"top_decade={row['exponent_top_decade']:+.3f} sec={row['sec']}",
            flush=True,
        )
        spark.catalog.clearCache()
        _save()
    if sf_dir not in table["sf_dirs"]:
        table["sf_dirs"].append(sf_dir)
    if sf == 10.0:
        # the sf10 pin set (tests/test_scale_probe.py) is every entry
        # carrying the fifth decade — after a full-registry pass that
        # is the whole benched registry, not the r9 representatives
        table.setdefault("sf10_probe", {})["queries"] = sorted(
            n for n, q in table["queries"].items() if 10.0 in q["sf"]
        )
    with open(json_path, "w") as fh:
        json.dump(table, fh, indent=1, sort_keys=True)
    return table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument("--queries", default=DEFAULT_QUERIES)
    ap.add_argument(
        "--exponents",
        action="store_true",
        help="fit scaling exponents over the sf0.001/0.01/0.1 testdata "
        "(plus --sf1-dir when provided) instead of replicating data",
    )
    ap.add_argument(
        "--make-sf1",
        action="store_true",
        help="generate a mutated 10x replica of sf0.1 (an sf1-scale "
        "set with proportional dup structure) at --out/sf1.0",
    )
    ap.add_argument(
        "--sf1-dir",
        default=None,
        help="existing sf1.0 directory to include as the top decade "
        "of the --exponents fit",
    )
    ap.add_argument(
        "--make-sf10",
        action="store_true",
        help="generate a mutated 10x replica of --out/sf1.0 (an "
        "sf10-scale set, second replication level: wider key strides, "
        "distinct mutation namespace) at --out/sf10.0 (VERDICT r8 #6)",
    )
    ap.add_argument(
        "--sf10-dir",
        default=None,
        help="existing sf10.0 directory to include as the fifth decade "
        "of the --exponents fit",
    )
    ap.add_argument(
        "--make-sf100",
        action="store_true",
        help="generate a mutated 10x replica of --out/sf10.0 (an "
        "sf100-scale set, third replication level) at --out/sf100.0 "
        "(VERDICT r12 #7: a sixth decade for the heaviest families)",
    )
    ap.add_argument("--json-out", default="tools/scale_probe_exponents.json")
    ap.add_argument(
        "--repeats",
        type=int,
        default=2,
        help="timings per (query, sf) — best-of-N; use 1 for the "
        "expensive top decade (the full-registry sf10 pass)",
    )
    ap.add_argument(
        "--add-decade",
        default=None,
        help="extend --json-out with one new decade (e.g. "
        "/tmp/scale_probe/sf10.0): reuse committed lower-decade "
        "timings, time every committed query at this dir only, refit "
        "exponents (VERDICT r10 #3)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if args.add_decade:
        names = (
            [q.strip() for q in args.queries.split(",") if q.strip()]
            if args.queries != DEFAULT_QUERIES
            else None
        )
        add_decade(
            spark, args.json_out, args.add_decade, names,
            repeats=args.repeats,
            # an explicit --queries list means "re-probe these":
            # replace any existing sample instead of skipping it
            skip_existing=names is None,
        )
        print(f"updated {args.json_out}")
        return

    if args.make_sf1:
        out = os.path.join(args.out, "sf1.0")
        replicate(spark, args.src, out, 10, mutate=True)
        print(f"wrote {out}")
        return

    if args.make_sf10:
        src = os.path.join(args.out, "sf1.0")
        out = os.path.join(args.out, "sf10.0")
        replicate(spark, src, out, 10, mutate=True, step_mult=10, level=1)
        print(f"wrote {out}")
        return

    if args.make_sf100:
        # third replication level (VERDICT r12 #7 — a sixth decade):
        # strides widen past the sf10 key space, mutation namespace
        # moves to 'ssr' tokens / a further-offset embedding seed, so
        # cross-level content stays distinct and dup structure
        # proportional
        src = os.path.join(args.out, "sf10.0")
        out = os.path.join(args.out, "sf100.0")
        replicate(spark, src, out, 10, mutate=True, step_mult=100, level=2)
        print(f"wrote {out}")
        return

    if args.exponents:
        import json

        base = os.path.dirname(args.src.rstrip("/"))
        sf_dirs = [os.path.join(base, f"sf{s}") for s in ("0.001", "0.01", "0.1")]
        if args.sf1_dir:
            sf_dirs.append(args.sf1_dir)
        if args.sf10_dir:
            sf_dirs.append(args.sf10_dir)
        # An explicit --queries narrows the probe to just those names
        # (re-probing after a targeted optimization); the default is
        # the full benched registry.
        names = (
            [q.strip() for q in args.queries.split(",") if q.strip()]
            if args.queries != DEFAULT_QUERIES
            else list(exponent_queries())
        )
        result = probe_exponents(spark, sf_dirs, names)
        with open(args.json_out, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
        print(f"wrote {args.json_out}")
        return

    replicate(spark, args.src, args.out, args.factor)
    qs = all_queries()
    for name in args.queries.split(","):
        t0 = time.time()
        qs[name](spark, args.out).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"{name:28s} {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
