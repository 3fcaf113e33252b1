"""Empty-scan robustness: every registered query must run (not
necessarily return rows) when every table is present but EMPTY.

At cluster scale this is not an edge case — partition pruning, a
selective pushed filter, or a fresh ingest zone routinely hand an
operator zero rows, and an engine that throws on an empty side
(seedless k-means, div-by-zero in a ratio, first() on an empty
aggregate) fails the whole job. The full registry is swept in one
test so a new query that regresses on empty input fails CI by name.
"""

from __future__ import annotations

import pytest

from lakehouse_architecture_transaction_spark.catalog import TABLES
from lakehouse_architecture_transaction_spark.operators.dedup import release_persisted
from lakehouse_architecture_transaction_spark.plans import REGISTRY


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        (
            spark.read.parquet(f"{sf_dir}/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{out}/{t}.parquet")
        )
    return out


def test_every_registered_query_survives_empty_tables(spark, empty_dir):
    failures = []
    for name, ent in REGISTRY.items():
        try:
            ent.fn(spark, empty_dir).count()
        except Exception as e:  # noqa: BLE001 — collecting the full list
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
        finally:
            release_persisted()
    assert not failures, "queries crashed on empty input:\n" + "\n".join(failures)
