"""Local version of the driver's t2 correctness gate: run every
registered query in Spark AND its DuckDB oracle on the same parquet,
compare row counts, column names, and exact values (order-insensitive).

This is the pytest front line — if a query passes here at sf0.001 it
should pass the driver's hash compare at sf0.01.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import pytest

from lakehouse_architecture_transaction_spark.catalog import TABLES, table_path
from lakehouse_architecture_transaction_spark.plans import REGISTRY


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    return ("o", str(v))


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(spec.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    s_set = _rowset(s_cols, s_rows)
    d_set = _rowset(d_cols, d_rows)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
