"""merge_vendor_daily with the reference rule table; EAV round-trip/promotion."""

import datetime as dt

from pyspark.sql import functions as F

from data_integration_celery_spark import pipelines
from data_integration_celery_spark.operators import eav


def test_merge_vendor_daily_rules_and_audit(spark):
    key = ["code", "trade_date"]
    d = dt.date(2020, 1, 6)
    left = spark.createDataFrame(
        [("600000.SH", d, 10.0, 11.0, 100.0, None, 1.0),
         ("600001.SH", d, 20.0, 21.0, 200.0, 9.0, 0.0)],
        "code string, trade_date date, open double, close double, "
        "vol double, pe double, max_up_or_down double")
    right = spark.createDataFrame(
        [("600000.SH", d, 10.2, 11.9, 101.0, 8.0, 1.0),   # close off by 0.9 > tol
         ("600002.SH", d, 30.0, 31.0, 300.0, 7.0, -1.0)],
        "code string, trade_date date, open double, close double, "
        "vol double, pe double, max_up_or_down double")

    merged, conflicts = pipelines.merge_vendor_daily(left, right, key)
    rows = {r["code"]: r for r in merged.collect()}
    assert set(rows) == {"600000.SH", "600001.SH", "600002.SH"}
    # mean_value on both-present, pass-through on single-vendor rows
    assert abs(rows["600000.SH"]["open"] - 10.1) < 1e-9
    assert rows["600001.SH"]["open"] == 20.0
    assert rows["600002.SH"]["open"] == 30.0
    # prefer_left volume; prefer_right pe
    assert rows["600000.SH"]["vol"] == 100.0
    assert rows["600000.SH"]["pe"] == 8.0
    # conflict side-output fires only for the out-of-tolerance close
    c = conflicts.collect()
    assert len(c) == 1 and c[0]["code"] == "600000.SH"
    assert c[0]["close_conflict"] and not c[0]["open_conflict"]


def test_eav_roundtrip_and_promotion(spark):
    d = dt.date(2020, 1, 6)
    wide = spark.createDataFrame(
        [("a", d, 1.5, None), ("b", d, None, 2.5)],
        "code string, trade_date date, pe double, pb double")
    long = eav.to_eav(wide, ["code", "trade_date"], ["pe", "pb"])
    assert long.count() == 4
    assert dict(long.dtypes)["v"] == "string"

    back = eav.pivot_eav(long, ["code", "trade_date"], ["pe", "pb"])
    got = {r["code"]: (r["pe"], r["pb"]) for r in back.collect()}
    assert got == {"a": (1.5, None), "b": (None, 2.5)}

    # promotion backfills only the missing cells
    side = spark.createDataFrame(
        [("a", d, "pe", "9.9"), ("a", d, "pb", "3.3"), ("b", d, "pe", "7.7")],
        "code string, trade_date date, k string, v string")
    promoted = eav.promote_eav(wide, side, ["code", "trade_date"], "pe", "pe")
    got = {r["code"]: r["pe"] for r in promoted.collect()}
    assert got == {"a": 1.5, "b": 7.7}  # a keeps its value, b backfilled


def test_scd2_from_snapshots_intervals(spark):
    import datetime as dt
    from data_integration_celery_spark.operators import windows as W
    snaps = spark.createDataFrame(
        [("a", dt.date(2020, 1, 1), "gold"),
         ("a", dt.date(2020, 2, 1), "gold"),     # unchanged -> absorbed
         ("a", dt.date(2020, 3, 1), "silver"),   # change-point
         ("a", dt.date(2020, 4, 1), None),       # value -> NULL is a change
         ("b", dt.date(2020, 1, 1), "bronze")],
        "code string, snap_d date, tier string")
    got = sorted(
        W.scd2_from_snapshots(snaps, "code", "snap_d", ["tier"]).collect(),
        key=lambda r: (r["code"], r["valid_from"]))
    rows = [(r["code"], r["tier"], r["valid_from"], r["valid_to"]) for r in got]
    assert rows == [
        ("a", "gold", dt.date(2020, 1, 1), dt.date(2020, 3, 1)),
        ("a", "silver", dt.date(2020, 3, 1), dt.date(2020, 4, 1)),
        ("a", None, dt.date(2020, 4, 1), None),
        ("b", "bronze", dt.date(2020, 1, 1), None),
    ]
