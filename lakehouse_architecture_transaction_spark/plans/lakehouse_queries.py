"""Registered queries over the LakeTable/metastore surface.

The reference's read path is Glue crawler → catalog table → Athena SQL
(reference code/step_function_code.json "StartCrawler" state, then
Athena over the curated zone). These queries exercise the repo's
stand-in END-TO-END and oracle-checked: a clustered LakeTable copy is
"crawled" (registered by name) with file-level footer pruning, and the
answer comes back through ``spark.sql`` by table name — so data
skipping sits on the actual query path, not just in unit tests.

Correctness is pruning-independent by construction (pruned_read
re-applies the predicates as ordinary filters), which is exactly what
lets a DuckDB oracle check the result while tests pin the files_read
count separately.
"""

from __future__ import annotations

import datetime as _dt
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table
from lakehouse_architecture_transaction_spark.plans.registry import register

#: Session-scoped memo of the clustered "curated orders" table path,
#: keyed by (applicationId, sf_dir) — the crawl/cluster step runs once
#: per session (it IS the table build; queries pay only the scan),
#: matching the _lsh_index/_cluster_frame amortization pattern.
_SCAN_TABLE_MEMO: dict[tuple[str, str], str] = {}

#: files in the clustered copy — small enough that every file spans
#: months (pruning visible at sf0.001), large enough that a 6-month
#: predicate skips most of them
_SCAN_FILES = 8

_SCAN_FROM = _dt.datetime(1996, 1, 1)
_SCAN_TO = _dt.datetime(1996, 7, 1)


def clustered_orders_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per app+sf_dir) the date-clustered curated orders
    table: ``repartitionByRange`` on o_orderdate gives each parquet
    file a tight, disjoint date span — the single-column analogue of
    zorder_write, and the layout that makes footer pruning bite on
    date predicates."""
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _SCAN_TABLE_MEMO.get(key)
    if got is not None:
        return got
    path = tempfile.mkdtemp(prefix="lakehouse_architecture_transaction_scan_orders_")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartitionByRange(_SCAN_FILES, "o_orderdate").write.mode("overwrite").parquet(path)
    _SCAN_TABLE_MEMO[key] = path
    return path


def pruned_scan_report(spark: SparkSession, sf_dir: str) -> dict:
    """Register the pruned scan view and return the skipping report —
    split out so tests can assert files_read < files_total on the SAME
    path the registered query takes."""
    from lakehouse_architecture_transaction_spark.lakehouse.table import LakeTable

    path = clustered_orders_path(spark, sf_dir)
    t = LakeTable(spark, path, keys=["o_orderkey"])
    where = [("o_orderdate", ">=", _SCAN_FROM), ("o_orderdate", "<", _SCAN_TO)]
    return t.register_scan("orders_pruned_scan", where)


@register(
    "orders_pruned_scan_sql",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_SCAN_FROM:%Y-%m-%d %H:%M:%S}'
      AND o_orderdate <  TIMESTAMP '{_SCAN_TO:%Y-%m-%d %H:%M:%S}'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority ASC
    """,
)
def orders_pruned_scan_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority mix of H1-1996 orders, answered BY NAME over the
    footer-pruned scan view (lakehouse/table.py register_scan): the
    crawler→catalog→SQL read path of the reference, with file-level
    data skipping on the date predicate (6 months of a multi-year
    range-clustered table — most files never open). The oracle runs
    the same predicate unpruned; tests pin files_read < files_total
    via pruned_scan_report."""
    pruned_scan_report(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
        FROM orders_pruned_scan
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority ASC
        """
    )


_ = F  # house import kept for sibling additions
