"""Standing 100 TB discipline checks: unbounded collect_list/set
groups and single-task global windows (r13, generalizing the
moment-discipline pattern of tests/test_moment_discipline.py).

Two hazard classes that pass every small-SF gate and fail only at
corpus scale:

1. ``collect_list``/``collect_set`` materializes a whole group in one
   task's memory — fine when the group is structurally bounded (a
   vector's dims, a codebook's codes, a trained merge table), an OOM
   when it is data-sized (a hot user's events: the class the r13
   events_top_paths rewrite removed by collecting per-partition
   prefixes first). Every site must carry an audited bound below;
   a NEW site (or a new copy in an audited file) fails here until
   reviewed.

2. ``Window.orderBy(...)`` without ``partitionBy`` funnels the whole
   frame through ONE task. Legitimate only on frames already
   aggregated to calendar/dimension cardinality; anything row-scaled
   takes the bucketed prefix-sum pattern (operators/ranking.py).

3. ``crossJoin`` multiplies cardinalities — a data x data cross join
   is quadratic output. Every site in the tree is the broadcast-
   yardstick pattern (one side a 1-row aggregate or a constant-
   cardinality frame: a quantile threshold, a corpus total, the d-row
   covariance matrix, the 8-row merge table); the audit pins the
   per-file counts so a new site gets reviewed for which side is
   constant-bounded.

The audit is per-file occurrence counts (coarser than the
moment-discipline per-expression keys, but every new occurrence still
forces a review); justifications name each site's bound.
"""

from __future__ import annotations

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "lakehouse_architecture_transaction_spark")

#: relpath -> (expected collect_list/collect_set count, audited bounds)
COLLECT_ALLOWED: dict[str, tuple[int, str]] = {
    "plans/behavior.py": (1, "events_top_paths path assembly collects AFTER the "
                             "row_number<=5 filter — group hard-bounded by the "
                             "constant 5 (r13 rewrite; the window's per-group "
                             "buffer is disk-spillable, unlike a collect's array "
                             "state)"),
    "plans/pipeline_ops2.py": (1, "centroid matrix assembly at label x dim "
                                  "cardinality (<= labels * 64 rows per group)"),
    "plans/pipeline_ops4.py": (2, "triangles forward-adjacency: degree-ordered "
                                  "orientation bounds per-src out-degree by O(sqrt m) "
                                  "(hubs never fan out); source-counts fold at "
                                  "source cardinality (~10)"),
    "plans/queued_r11.py": (2, "BPE invariants fold over the trained merge table "
                               "(8 rows by construction)"),
    "plans/queued_r13.py": (1, "price-dispersion weighted-median fold over the "
                               "(type, cent) grid — bounded by the price domain, "
                               "not row count"),
    "operators/similarity.py": (16, "ANN machinery: every collect assembles dims "
                                    "(<= 64), PQ codes (<= 256/subspace), IVF/kmeans "
                                    "centroids (<= k), or gram/eigen rows (d x d) — "
                                    "all structural constants independent of corpus "
                                    "size; none keys on a data column"),
    "operators/text.py": (2, "BPE merge-table expr (8 rows) and the per-word "
                             "hash-bucket map (<= bucket constant per word)"),
}

#: relpath -> (expected Window.orderBy-without-partitionBy count, bound)
GLOBAL_WINDOW_ALLOWED: dict[str, tuple[int, str]] = {
    "plans/analytics3.py": (1, "weekly-active lag over the WEEK rollup — calendar "
                               "cardinality (thousands of rows at any corpus size)"),
    "operators/timeseries.py": (1, "centered moving average over the DAY rollup — "
                                   "calendar cardinality"),
    "operators/similarity.py": (1, "matryoshka dim ranking over per-DIM variance "
                                   "rows (<= 64)"),
}


#: relpath -> (expected .crossJoin( count). Audited 2026-08-16: every
#: site joins a 1-row aggregate (corpus totals, thresholds, shift/tau
#: yardsticks, funnel counts) or a constant-cardinality broadcast
#: frame (d-row covariance/eigenvector iterates, k centroids, 256-code
#: distance maps, the 8-row BPE merge table, dangling-mass 1-row in
#: pagerank) — no data x data cross join exists in the tree.
CROSSJOIN_ALLOWED: dict[str, int] = {
    "plans/analytics.py": 2,
    "plans/analytics3.py": 2,
    "plans/analytics_tpch2.py": 2,
    "plans/behavior.py": 1,
    "plans/customer_value.py": 2,
    "plans/pipeline_ops2.py": 4,
    "plans/pipeline_ops4.py": 1,
    "plans/queued_r11.py": 6,
    "plans/queued_r12.py": 1,
    "plans/queued_r13.py": 1,
    "plans/queued_r14.py": 3,
    "plans/queued_r8.py": 1,
    "plans/queued_r9.py": 2,
    "operators/graph.py": 1,
    "operators/ranking.py": 1,
    "operators/sampling.py": 1,
    "operators/similarity.py": 11,
    "operators/text.py": 4,
}


def _scan(pattern: str) -> dict[str, int]:
    found: dict[str, int] = {}
    rx = re.compile(pattern)
    for dirpath, _, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, PKG).replace(os.sep, "/")
            n = len(rx.findall(open(path).read()))
            if n:
                found[rel] = n
    return found


def _check(found: dict[str, int], allowed: dict[str, tuple[int, str]], what: str):
    new = {k: c for k, c in found.items() if k not in allowed}
    assert not new, (
        f"unaudited {what} site(s) — audit the group/frame bound and add to the "
        f"allowlist (or restructure: two-level prefix collect / bucketed prefix-sum "
        f"rank): {new}"
    )
    drifted = {k: (c, allowed[k][0]) for k, c in found.items() if c != allowed[k][0]}
    assert not drifted, f"{what} count changed (found, expected): {drifted}"
    gone = {k for k in allowed if k not in found}
    assert not gone, f"stale {what} allowlist entries: {gone}"


def test_no_unaudited_collect_groups():
    _check(_scan(r"collect_(list|set)\s*\("), COLLECT_ALLOWED, "collect_list/set")


def test_no_unaudited_global_windows():
    _check(_scan(r"Window\.orderBy\s*\("), GLOBAL_WINDOW_ALLOWED, "global-window")


def test_no_unaudited_cross_joins():
    found = _scan(r"\.crossJoin\s*\(")
    new = {k: c for k, c in found.items() if k not in CROSSJOIN_ALLOWED}
    assert not new, (
        "unaudited crossJoin site(s) — verify one side is a 1-row/"
        f"constant-cardinality frame and add to the allowlist: {new}"
    )
    drifted = {
        k: (c, CROSSJOIN_ALLOWED[k]) for k, c in found.items() if c != CROSSJOIN_ALLOWED[k]
    }
    assert not drifted, f"crossJoin count changed (found, expected): {drifted}"
    gone = {k for k in CROSSJOIN_ALLOWED if k not in found}
    assert not gone, f"stale crossJoin allowlist entries: {gone}"


def test_top_paths_collect_group_is_bounded(spark):
    # the rewrite's safety property, isolated: whatever a (user, day)
    # group's raw volume, the frame reaching the collect carries at
    # most 5 rows per group — the collect's array state can never be
    # data-sized (r13; the pre-rewrite shape collected the whole
    # user-day)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(1, i, i, f"e{i % 7}") for i in range(400)]
    ev = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string"
    ).repartition(8)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    first5 = ev.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= 5)
    assert first5.count() == 5
    seq = first5.groupBy("user_id").agg(
        F.expr("array_sort(collect_list(struct(__rn, event_type)))").alias("seq")
    ).collect()[0]["seq"]
    assert [r["event_type"] for r in seq] == ["e0", "e1", "e2", "e3", "e4"]
