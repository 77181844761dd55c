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


def test_merge_stock_daily_full_rule_table(spark):
    """The complete reference rule table (stock.py:121-176) on hand rows:
    asymmetric key names, indicator column, label-decode max_up_or_down
    matrix (incl. -2 unknown / -3 conflict / invalid wind code / dead
    '非涨跌停' branch), get_value pass-through, and the conflict
    side-output keyed by the merged keys."""
    d = dt.date(2021, 3, 1)
    ifind_cols = ("ths_code string, time date, open_x double, high_x double, "
                  "low_x double, close_x double, volume_x double, "
                  "amount double, totalShares double, "
                  "ths_up_and_down_status_stock string, totalCapital double, "
                  "floatCapitalOfAShares double, changeRatio double, "
                  "floatSharesOfAShares double, ths_pe_ttm_stock double")
    wind_cols = ("wind_code string, trade_date date, open_y double, "
                 "high_y double, low_y double, close_y double, "
                 "volume_y double, amt double, total_shares double, "
                 "maxupordown double, pct_chg double, "
                 "free_float_shares double, pe_ttm double, pe double, "
                 "pb double, ps double, pcf double")
    ifind = spark.createDataFrame(
        [("A", d, 10.0, 11.0, 9.0, 10.5, 100.0, 1e6, 5e8,
          "涨停", 1e9, 5e8, 0.01, 3e8, 15.0),
         ("B", d, 20.0, 21.0, 19.0, None, 200.0, 2e6, None,
          "非涨跌停", 2e9, 6e8, 0.02, 4e8, 25.0),
         ("C", d, 30.0, 31.0, 29.0, 30.5, 300.0, 3e6, 7e8,
          None, 3e9, 7e8, 0.03, 5e8, 35.0)], ifind_cols)
    wind = spark.createDataFrame(
        [("A", d, 10.5, 11.0, 9.0, 10.4, 100.5, 1e6 + 0.5, 6e8,
          -1.0, 0.011, 3.1e8, 16.0, 12.0, 1.5, 2.5, 3.5),
         ("B", d, 20.0, 21.0, 19.0, 20.5, 200.0, 2e6, 6.5e8,
          7.0, 0.02, 4.1e8, 26.0, 22.0, 2.5, 3.5, 4.5),
         ("D", d, 40.0, 41.0, 39.0, 40.5, 400.0, 4e6, 8e8,
          0.0, 0.04, 6.1e8, 46.0, 42.0, 4.5, 5.5, 6.5)], wind_cols)

    merged, conflicts = pipelines.merge_stock_daily(ifind, wind)
    rows = {r["unique_code"]: r for r in merged.collect()}
    assert set(rows) == {"A", "B", "C", "D"}
    assert rows["A"]["indicator_column"] == "both"
    assert rows["C"]["indicator_column"] == "left_only"
    assert rows["D"]["indicator_column"] == "right_only"
    # mean_value both-present / one-side; prefer_left close; prefer_right
    assert abs(rows["A"]["open"] - 10.25) < 1e-9
    assert rows["D"]["open"] == 40.0
    assert rows["A"]["close"] == 10.5 and rows["B"]["close"] == 20.5
    assert rows["A"]["total_shares"] == 6e8 and rows["C"]["total_shares"] == 7e8
    assert rows["A"]["pe_ttm"] == 16.0
    # get_value is wind-side only
    assert rows["A"]["pe"] == 12.0 and rows["C"]["pe"] is None
    # max_up_or_down: 涨停(1) vs -1 → conflict -3; 非涨跌停 decodes to
    # None (dead branch) and wind 7 is invalid → both-unknown -2;
    # C has no wind row → -2; D passes wind 0 through.
    assert rows["A"]["max_up_or_down"] == -3
    assert rows["B"]["max_up_or_down"] == -2
    assert rows["C"]["max_up_or_down"] == -2
    assert rows["D"]["max_up_or_down"] == 0
    # conflict side-output: A's open differs by 0.5 >= 0.01; B clean.
    c = {r["unique_code"]: r for r in conflicts.collect()}
    assert set(c) == {"A"}
    assert c["A"]["open_conflict"] and not c["A"]["high_conflict"]
    assert c["A"]["trade_date"] == d


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


def test_promote_eav_duplicate_rows_do_not_fan_out(spark):
    """The reference EAV grain carries a param column, so duplicate
    (keys, k) rows occur on real feeds — the backfill join must keep the
    wide table's row count (deterministic max per cell, like pivot_eav's
    one-value-per-cell grain)."""
    from data_integration_celery_spark.operators import eav as E

    wide = spark.createDataFrame(
        [("A", "2024-01-02", None), ("B", "2024-01-02", 5.0)],
        "code string, d string, pe double")
    dup = spark.createDataFrame(
        [("A", "2024-01-02", "pe", "7"), ("A", "2024-01-02", "pe", "9"),
         ("B", "2024-01-02", "pe", "1")],
        "code string, d string, k string, v string")
    out = E.promote_eav(wide, dup, ["code", "d"], "pe", "pe")
    rows = {r["code"]: r["pe"] for r in out.collect()}
    assert out.count() == 2           # no fan-out
    assert rows["A"] == 9.0           # deterministic max backfill
    assert rows["B"] == 5.0           # existing non-null wide value wins
