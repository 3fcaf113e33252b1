"""Operator unit tests: dedup determinism, merge semantics, simhash
stability, multimodal plumbing."""

from __future__ import annotations

import pyspark.sql.functions as F

from lakehouse_architecture_transaction_spark.operators.dedup import dedup_exact, simhash
from lakehouse_architecture_transaction_spark.operators.merge import merge_upsert
from lakehouse_architecture_transaction_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    make_binary_table,
)


def test_dedup_exact_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [(1, "b", 20), (1, "a", 30), (1, "a", 10), (2, "z", 1)],
        "k int, s string, v int",
    )
    out1 = sorted(tuple(r) for r in dedup_exact(df, keys=["k"]).collect())
    out2 = sorted(tuple(r) for r in dedup_exact(df, keys=["k"]).collect())
    assert out1 == out2 == [(1, "a", 10), (2, "z", 1)]


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "k int, s string, v int")
    source = spark.createDataFrame([(2, "B", None), (3, "c", 30)], "k int, s string, v int")
    out = {r["k"]: (r["s"], r["v"]) for r in merge_upsert(target, source, keys=["k"]).collect()}
    assert out == {
        1: ("a", 10),  # unmatched target kept
        2: ("B", None),  # matched: source wins INCLUDING its null (update-all)
        3: ("c", 30),  # unmatched source inserted
    }


def test_simhash_identical_docs_equal(spark):
    df = spark.createDataFrame([(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "zzz yyy")],
                               "doc_id int, text string")
    rows = {r["doc_id"]: r["simhash"] for r in simhash(df, "text", "doc_id").collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_multimodal_feature_plumbing(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    mm = make_binary_table(docs)
    assert dict(mm.dtypes)["payload"] == "binary"
    feats = extract_features(mm).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert abs(sum(r["feature"]) - 1.0) < 1e-5
        assert r["n_bytes"] > 0 and len(r["content_sha"]) == 64


def test_multimodal_decode_stub_raises(spark):
    from lakehouse_architecture_transaction_spark.operators.multimodal import decode_image
    import pytest

    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)
