"""Salted joins produce identical results; bucketed tables join exchange-free."""

from pyspark.sql import functions as F

from data_integration_celery_spark import catalog
from data_integration_celery_spark.operators import skew


def test_salted_join_equivalence(spark, sf_dir):
    li = catalog.load(spark, "lineitem", sf_dir)
    supp = catalog.load(spark, "supplier", sf_dir) \
        .withColumnRenamed("s_suppkey", "l_suppkey")
    plain = li.join(supp, "l_suppkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("q"))
    salted = skew.salted_join(li, supp, "l_suppkey", salt_width=8).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("q"))
    assert plain.collect() == salted.collect()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = catalog.load(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity")
    o = catalog.load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_totalprice")
    skew.write_bucketed(li, "b_lineitem", "l_orderkey", buckets=8)
    skew.write_bucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
                        "b_orders", "l_orderkey", buckets=8)
    a = skew.bucketed_table(spark, "b_lineitem")
    b = skew.bucketed_table(spark, "b_orders")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == catalog.load(spark, "lineitem", sf_dir).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_salted_join_rejects_dim_replicating_outer_modes(spark):
    """An unmatched dim row exists salt_width times after the explode, so
    right/full outer results would be wrong — those modes must raise."""
    import pytest as _pt

    from data_integration_celery_spark.operators import skew

    f = spark.createDataFrame([(1, "a")], "k int, v string")
    d = spark.createDataFrame([(2, "dim")], "k int, w string")
    for how in ("right", "full", "full_outer"):
        with _pt.raises(ValueError, match="salted_join"):
            skew.salted_join(f, d, "k", how=how)
