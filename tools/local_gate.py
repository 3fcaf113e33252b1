"""Local stand-in for the driver's correctness gate.

Runs every registered query AND its DuckDB oracle at a given sf dir,
then compares: row count, dtypes, and exact per-cell reprs after
sorting columns by name and rows by all columns. This is stricter than
any plausible value-hasher, so green here should mean green in
CORRECTNESS_r{N}.json.

Usage: python tools/local_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from lakehouse_architecture_transaction_spark.catalog import TABLES, table_path  # noqa: E402
from lakehouse_architecture_transaction_spark.session import get_spark  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    da, db = dict(a.dtypes.astype(str)), dict(b.dtypes.astype(str))
    for c in a.columns:
        if da[c] != db[c] and not (da[c].startswith("datetime") and db[c].startswith("datetime")):
            return False, f"dtype[{c}] {da[c]} vs {db[c]}"
    for c in a.columns:
        va, vb = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(va, vb)):
            if repr(x) != repr(y):
                return False, f"cell[{i}][{c}] {x!r} vs {y!r}"
    return True, ""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    from __spark_entry__ import oracle_sql, queries

    spark = get_spark("local-gate", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "16")))
    # SPARK_GRAFT_TZ=America/New_York runs the WHOLE gate under a
    # non-UTC session timezone against the same oracles — the full-
    # registry version of the pytest tz sweep (house invariant: no
    # query's correctness may depend on the driver's timezone).
    tz = os.environ.get("SPARK_GRAFT_TZ")
    if tz:
        spark.conf.set("spark.sql.session.timeZone", tz)
        print(f"  (session timezone overridden to {tz})")
    # SPARK_GRAFT_AQE=off runs the WHOLE gate with adaptive execution
    # disabled — the third registry-wide invariant axis (after session
    # timezone and shuffle-partition count): no query's CORRECTNESS may
    # depend on AQE's runtime re-planning (coalescing, skew splits,
    # broadcast demotion). AQE is a performance feature; a result that
    # changes without it is a latent partitioning/ordering assumption.
    if os.environ.get("SPARK_GRAFT_AQE", "").lower() in ("off", "false", "0"):
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        print("  (adaptive query execution DISABLED for this gate run)")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")

    qs, osql = queries(), oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sp = fn(spark, sf_dir).toPandas()
            if name not in osql:
                print(f"  (rows-only) {name}: {len(sp)} rows [{time.perf_counter()-t0:.1f}s]")
                continue
            od = con.execute(osql[name]).df()
            ok, why = cells_equal(canon(sp), canon(od))
        except Exception as e:  # noqa: BLE001
            ok, why = False, f"EXception: {type(e).__name__}: {e}"
        from lakehouse_architecture_transaction_spark.operators.dedup import release_persisted

        release_persisted()
        dt = time.perf_counter() - t0
        if ok:
            n_pass += 1
            print(f"  PASS {name} ({len(sp)} rows) [{dt:.1f}s]")
        else:
            n_fail += 1
            print(f"  FAIL {name}: {why} [{dt:.1f}s]")
    print(f"{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
