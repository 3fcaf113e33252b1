"""Driver-tier degenerate-input SMOKE: a fixed cross-family sample of
the registry on empty and null-heavy layouts. The EXHAUSTIVE four-
layout full-registry sweeps live in tests_slow/test_empty_inputs.py
(the driver's verify budget cannot fit them — see tests_slow/
__doc__.md); this sample keeps the degenerate class represented in
every driver run and covers the operators this round touched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import TABLES
from lakehouse_architecture_transaction_spark.operators.dedup import release_persisted
from lakehouse_architecture_transaction_spark.plans import REGISTRY

_KEYS = {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "event_id", "user_id", "doc_id", "vec_id",
}

#: one per family plus every operator the r16 round restructured
SAMPLE = [
    "q1_pricing_summary",
    "top3_orders_per_customer",
    "sessionize_events",
    "dedup_pk_lineitem",
    "docs_minhash_lsh_pairs",
    "docs_tfidf_top_terms",
    "docs_shuffled_batches",
    "emb_knn_bruteforce",
    "emb_kmeans",
    "mm_features",
    "part_copurchase_triangles",
    "catalog_inclusion_profile",
    "emb_semantic_dedup",
    "events_stream_clicks",
    "events_stream_sessions_stateful",
]


@pytest.fixture(scope="module")
def smoke_dirs(spark, sf_dir, tmp_path_factory) -> dict[str, str]:
    root = tmp_path_factory.mktemp("degenerate_smoke")
    dirs = {"empty": str(root / "empty"), "null_heavy": str(root / "nulls")}
    for t in TABLES:
        base = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        base.limit(0).coalesce(1).write.parquet(f"{dirs['empty']}/{t}.parquet")
        nh = base
        cond = F.monotonically_increasing_id() % 2 == 0
        for c, dt in base.dtypes:
            if c not in _KEYS:
                nh = nh.withColumn(c, F.when(cond, F.lit(None).cast(dt)).otherwise(F.col(c)))
        nh.coalesce(1).write.parquet(f"{dirs['null_heavy']}/{t}.parquet")
    return dirs


@pytest.mark.parametrize("variant", ["empty", "null_heavy"])
def test_sampled_queries_survive_degenerate_inputs(spark, smoke_dirs, variant):
    failures = []
    for name in SAMPLE:
        try:
            REGISTRY[name].fn(spark, smoke_dirs[variant]).count()
        except Exception as e:  # noqa: BLE001 — collecting the full list
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
        finally:
            release_persisted()
    assert not failures, f"queries crashed on {variant} input:\n" + "\n".join(failures)
