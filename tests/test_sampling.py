"""Deterministic hash sampling: exhaustive/disjoint splits, stability under
re-partitioning (the property df.sample/randomSplit lack), per-stratum rates."""

import pytest
from pyspark.sql import functions as F

from data_integration_celery_spark.operators import sampling


def test_hash_split_exhaustive_disjoint_deterministic(spark):
    ids = spark.range(10_000).withColumnRenamed("id", "doc_id")
    out = sampling.hash_split(ids, "doc_id",
                              {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"]
              for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # exhaustive + disjoint: every row assigned exactly once
    assert sum(counts.values()) == 10_000
    # uniform hash → fractions within a few percent at n=10k
    assert abs(counts["train"] - 8000) < 300
    assert abs(counts["val"] - 1000) < 150
    assert abs(counts["test"] - 1000) < 150
    # deterministic: re-running yields the identical assignment
    again = sampling.hash_split(ids, "doc_id",
                                {"train": 0.8, "val": 0.1, "test": 0.1})
    assert (out.join(again.withColumnRenamed("split", "s2"), "doc_id")
            .where(F.col("split") != F.col("s2")).count()) == 0


def test_hash_sample_stable_under_repartition_and_growth(spark):
    """The two failure modes of df.sample: partitioning changes and corpus
    growth must never change an existing row's fate."""
    ids = spark.range(5_000).withColumnRenamed("id", "doc_id")
    kept1 = {r["doc_id"] for r in
             sampling.hash_sample(ids, "doc_id", 0.2).collect()}
    kept2 = {r["doc_id"] for r in
             sampling.hash_sample(ids.repartition(13), "doc_id", 0.2).collect()}
    assert kept1 == kept2
    grown = spark.range(8_000).withColumnRenamed("id", "doc_id")
    kept3 = {r["doc_id"] for r in
             sampling.hash_sample(grown, "doc_id", 0.2).collect()}
    assert {i for i in kept3 if i < 5_000} == kept1
    assert abs(len(kept1) - 1000) < 150


def test_hash_sample_salt_decorrelates(spark):
    ids = spark.range(5_000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in
         sampling.hash_sample(ids, "doc_id", 0.5, salt="a").collect()}
    b = {r["doc_id"] for r in
         sampling.hash_sample(ids, "doc_id", 0.5, salt="b").collect()}
    overlap = len(a & b) / max(len(a), 1)
    assert 0.35 < overlap < 0.65  # independent 50% samples overlap ~50%


def test_stratified_hash_sample(spark):
    rows = spark.range(12_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"))
    out = sampling.stratified_hash_sample(
        rows, "doc_id", "lang", {"en": 0.5, "de": 0.05})
    counts = {r["lang"]: r["n"]
              for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["en"] - 2000) < 250       # 4000 en rows * 0.5
    assert abs(counts.get("de", 0) - 400) < 150  # 8000 de rows * 0.05
    # default fraction 0 drops unlisted strata entirely
    none = sampling.stratified_hash_sample(rows, "doc_id", "lang", {"en": 0.5})
    assert none.where(F.col("lang") == "de").count() == 0


def test_hash_split_validates_weights(spark):
    ids = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.hash_split(ids, "doc_id", {"a": 0.5, "b": 0.4})


def test_full_fraction_keeps_everything(spark):
    ids = spark.range(1_000).withColumnRenamed("id", "doc_id")
    assert sampling.hash_sample(ids, "doc_id", 1.0).count() == 1_000
    assert sampling.hash_sample(ids, "doc_id", 0.0).count() == 0
