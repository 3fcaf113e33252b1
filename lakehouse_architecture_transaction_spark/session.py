"""SparkSession factory tuned for the engine.

Local mode is the test bed; the conf is written so the same code path
scales to a multi-executor cluster: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), shuffle partitions sized from the
environment, Arrow enabled for the Pandas-UDF slow path, session
timezone pinned to UTC so timestamp semantics match the DuckDB oracle
and any other engine reading the same parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lakehouse-spark", cpus: int | None = None, ui: bool = False
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. Shuffle
    partitions track the core count — at cluster scale you'd size this
    to ~2-3x total executor cores instead; AQE coalescing makes the
    exact number forgiving. ``ui=True`` enables the Spark UI (off by
    default — tests/gates don't need the port) so measurement tools
    can read per-stage shuffle metrics from the REST API.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r15 (guide §3.1/§9): allow shuffled-hash joins instead of
        # always sort-merge — both knobs are size-CONDITIONED, so SMJ
        # remains the fallback whenever a build side could be large:
        # the planner picks SHJ only when its per-partition build fits
        # (canBuildLocalHashMap), and AQE additionally rewrites SMJ ->
        # SHJ at runtime when every post-shuffle partition is under
        # the 64 MB local-map threshold (a per-partition bound, valid
        # at any cluster scale; AQE skew-split still applies to SHJ).
        # Interleaved A/B at sf0.1 over 20 join-heavy queries across
        # two sessions: 0.837x and 0.917x totals, worst single query
        # 1.037x (noise). Env overrides keep it parameterised.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP", str(64 * 1024 * 1024)),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # serve bare MIN/MAX/COUNT from parquet footers (no data pages)
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true" if ui else "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
