"""Slowly-Changing-Dimension type 2: build a versioned dimension
history (valid_from / valid_to / is_current) from a change log.

The reference's Delta MERGE keeps only the LATEST version of each row
(whenMatchedUpdateAll — scripts/glue/script.py:204-216); SCD2 is the
standard lakehouse extension when history must be queryable. Built
from windows only: consecutive-duplicate collapse (lag) + interval
assignment (lead), one shuffle on the key — no self-join, no driver
state, scales to dimension change logs of any depth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(changes: DataFrame, key: str, eff_ts: str, attrs: list[str]) -> DataFrame:
    """Versioned history from ``changes`` (one row per observed state).

    - Consecutive rows (per key, by ``eff_ts``) whose ``attrs`` are all
      unchanged collapse into one version (no-op updates don't open a
      new interval).
    - Each surviving version spans [valid_from, valid_to); the latest
      has valid_to NULL and is_current true.

    Null-safe change detection via IS DISTINCT FROM, except that a
    first version whose attrs are ALL null relies on the lag-null
    convention — give dimensions a non-null natural attribute.
    """
    w = Window.partitionBy(key).orderBy(F.col(eff_ts).asc())
    changed: Column = F.lit(False)
    lagged = changes
    for a in attrs:
        lagged = lagged.withColumn(f"__prev_{a}", F.lag(a).over(w))
        changed = changed | ~F.col(f"__prev_{a}").eqNullSafe(F.col(a))
    versions = lagged.filter(changed).drop(*[f"__prev_{a}" for a in attrs])
    w2 = Window.partitionBy(key).orderBy(F.col(eff_ts).asc())
    return versions.select(
        key,
        *attrs,
        F.col(eff_ts).alias("valid_from"),
        F.lead(eff_ts).over(w2).alias("valid_to"),
        F.lead(eff_ts).over(w2).isNull().alias("is_current"),
    )
