"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every registered operator
(lakehouse_architecture_transaction_spark/plans/registry.py) and ``oracle_sql()`` the
matching DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lakehouse_architecture_transaction_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary) on sf0.001."""
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def _check_history() -> dict[str, tuple[int, int]]:
    """Per query: (rounds checked, last round checked) from prior
    CORRECTNESS files.

    The driver's correctness gate truncates at 50 entries in dict
    order, so with >50 registered queries a fixed order would leave a
    permanent never-checked tail (round 2 left 13 queries without a
    driver row). Ordering is STALENESS-FIRST (least recently checked,
    then fewest checks): round 6 flipped the key order after the
    (fewest-checks-first) variant let 23 twice-checked round-2 queries
    sort BEHIND once-checked round-3/4 ones and miss the gate — the
    re-check horizon is bounded by the oldest last-green round, which
    only the staleness-major key minimizes.
    """
    hist: dict[str, tuple[int, int]] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                for name in json.load(f):
                    count, _last = hist.get(name, (0, 0))
                    hist[name] = (count + 1, rnd)
        except (OSError, ValueError):
            continue
    return hist


def _ordered_names() -> list[str]:
    hist = _check_history()
    names = list(REGISTRY)
    reg_pos = {n: i for i, n in enumerate(names)}
    return sorted(
        names,
        key=lambda n: (hist.get(n, (0, 0))[1], hist.get(n, (0, 0))[0], reg_pos[n]),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    least-driver-checked first (see _green_rounds)."""
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted where not
    SQL-expressible → driver records a rows-only check)."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
