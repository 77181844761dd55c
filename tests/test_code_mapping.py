"""code_mapping maintenance: insert-missing, root fill, fuzzy name link."""

from pyspark.sql import functions as F

from data_integration_celery_spark.operators import code_mapping as cm


def _mapping(spark, rows):
    return spark.createDataFrame(
        rows, "unique_code string, vendor_a_code string, vendor_b_code string")


def test_insert_missing_is_idempotent(spark):
    mapping = _mapping(spark, [("600000.SH", "600000.SH", None)])
    vendor = spark.createDataFrame(
        [("600000.SH",), ("600001.SH",)], "vendor_a_code string")
    once = cm.insert_missing(mapping, vendor, "vendor_a_code")
    assert once.count() == 2
    twice = cm.insert_missing(once, vendor, "vendor_a_code")
    assert twice.count() == 2  # no duplicate inserts
    new = {r["unique_code"]: r for r in twice.collect()}
    assert new["600001.SH"]["vendor_a_code"] == "600001.SH"
    assert new["600001.SH"]["vendor_b_code"] is None


def test_fill_from_vendor_by_root(spark):
    mapping = _mapping(spark, [("600000.SH", "600000.SH", None),
                               ("600001.SH", "600001.SH", "KEEP.ME")])
    vendor_b = spark.createDataFrame(
        [("600000.XSHG",), ("999999.XSHG",)], "vendor_b_code string")
    out = {r["unique_code"]: r["vendor_b_code"]
           for r in cm.fill_from_vendor(mapping, vendor_b,
                                        "vendor_b_code").collect()}
    assert out["600000.SH"] == "600000.XSHG"  # filled via shared root
    assert out["600001.SH"] == "KEEP.ME"      # existing value never clobbered


def test_link_by_name(spark):
    funds_a = spark.createDataFrame(
        [("F1", "Growth  Fund A!"), ("F2", "Unmatched")],
        "unique_code string, full_name string")
    funds_b = spark.createDataFrame(
        [("B9", "growth fund a"), ("B8", "other")],
        "code string, fund_fullname string")
    out = {r["unique_code"]: r["vendor_b_code"]
           for r in cm.link_by_name(funds_a, funds_b, "full_name",
                                    "fund_fullname", "code",
                                    "vendor_b_code").collect()}
    assert out == {"F1": "B9", "F2": None}


def test_insert_missing_ignores_null_vendor_codes(spark):
    """NULL = NULL is NULL in the anti-join, so a NULL vendor code was
    re-inserted as an all-NULL mapping row on EVERY run — it must be
    dropped, keeping maintenance idempotent on real feeds."""
    from data_integration_celery_spark.operators import code_mapping as cm

    mapping = spark.createDataFrame(
        [("600000.SH", "600000.SH", None)],
        "unique_code string, vendor_a string, vendor_b string")
    feed = spark.createDataFrame(
        [("600000.SH",), (None,), ("600001.SH",)], "vendor_a string")
    once = cm.insert_missing(mapping, feed, "vendor_a")
    assert once.where(F.col("unique_code").isNull()).count() == 0
    assert once.count() == 2
    twice = cm.insert_missing(once, feed, "vendor_a")
    assert twice.count() == 2  # idempotent with the NULL present
