"""Merge-kernel null×NaN matrix — reproduces the reference's is_not_nan_or_none
semantics (/root/reference tasks/merge/__init__.py:14-95) as Column exprs."""

import math

from pyspark.sql import functions as F

from data_integration_celery_spark.functions import merge_kernels as mk


def _run(spark, kernel, pairs):
    nan = float("nan")
    df = spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(pairs)], "i int, l double, r double")
    rows = (df.select("i", kernel(F.col("l"), F.col("r")).alias("out"))
              .orderBy("i").collect())
    return [r["out"] for r in rows]


PAIRS = [(1.0, 2.0), (1.0, None), (None, 2.0), (None, None),
         (float("nan"), 2.0), (1.0, float("nan")), (float("nan"), float("nan"))]


def test_prefer_left(spark):
    assert _run(spark, mk.prefer_left, PAIRS) == [1.0, 1.0, 2.0, None, 2.0, 1.0, None]


def test_prefer_right(spark):
    assert _run(spark, mk.prefer_right, PAIRS) == [2.0, 1.0, 2.0, None, 2.0, 1.0, None]


def test_mean_value(spark):
    assert _run(spark, mk.mean_value, PAIRS) == [1.5, 1.0, 2.0, None, 2.0, 1.0, None]


def test_mean_value_warning(spark):
    df = spark.createDataFrame([(100.0, 100.005), (100.0, 150.0), (None, 150.0)],
                               "l double, r double")
    flags = [r[0] for r in df.select(
        mk.mean_value_warning(F.col("l"), F.col("r"), 0.01)).collect()]
    assert flags == [False, True, False]


def test_max_up_or_down_conflict_codes(spark):
    # reference encoding (tasks/merge/stock.py:187-227): equal → value;
    # one-sided → other; any both-present conflict → -3; both unknown → -2
    pairs = [(1.0, 1.0), (1.0, None), (None, -1.0), (1.0, -1.0), (-1.0, 1.0),
             (None, None)]
    assert _run(spark, mk.max_up_or_down, pairs) == [1.0, 1.0, -1.0, -3.0, -3.0, -2.0]


def test_compile_merge_rules(spark):
    df = spark.createDataFrame([(1, 10.0, 20.0), (2, None, 5.0)],
                               "k int, a double, b double")
    out = mk.compile_merge_rules(
        df,
        {"merged": ("double", "mean_value", {"left": "a", "right": "b"}),
         "raw": ("double", "get_value", {"col": "b"})},
        key_cols=["k"])
    rows = {r["k"]: (r["merged"], r["raw"]) for r in out.collect()}
    assert rows == {1: (15.0, 20.0), 2: (5.0, 5.0)}


def test_max_up_or_down_labels_decode(spark):
    # string-label decode matrix (stock.py:187-227) incl. the dead
    # '非涨跌停' tuple-compare branch and invalid wind codes
    df = spark.createDataFrame(
        [("涨停", 1.0), ("跌停", 1.0), ("非涨跌停", None), ("停牌", 7.0),
         (None, 0.0), (None, None)],
        "lbl string, mud double")
    got = [r["c"] for r in df.select(
        mk.max_up_or_down_labels(F.col("lbl"), F.col("mud")).alias("c")
    ).collect()]
    assert got == [1.0, -3.0, -2.0, -2.0, 0.0, -2.0]


def test_fuzzy_canonicalize_first_match_and_fallthrough(spark):
    from data_integration_celery_spark.functions import cleaning

    df = spark.createDataFrame(
        [("Large BRASS widget",), ("brass and copper mix",),
         ("Titanium Thing",)], "s string")
    got = [r["c"] for r in df.select(
        cleaning.fuzzy_canonicalize(F.col("s"), ["brass", "copper"])
        .alias("c")).collect()]
    # first-containment-wins; unmatched falls through to lower(value)
    assert got == ["brass", "brass", "titanium thing"]


def test_rename_columns_by_dic(spark):
    from data_integration_celery_spark.functions import cleaning

    df = spark.createDataFrame([(1, 2.0, "x")],
                               ["CoinPriceUSD", "volume24h", "Misc"])
    out = cleaning.rename_columns_by_dic(df, ["price_usd", "volume"])
    assert out.columns == ["coinpriceusd", "volume", "misc"]

    import pytest
    with pytest.raises(ValueError):
        cleaning.rename_columns_by_dic(
            df.toDF("price_a", "price_b", "m"), ["price"])


def test_compile_merge_rules_non_numeric_prefer(spark):
    """A date-typed prefer_left rule (the reference's trade_date shape)
    must compile via the *_any coalesce variants — the numeric kernels'
    isnan(cast('double')) probe does not analyze for DATE, so this
    previously raised AnalysisException through compile_merge_rules while
    silently working through merge_stock_daily."""
    import datetime as dt

    from data_integration_celery_spark.functions import merge_kernels as mk

    j = spark.createDataFrame(
        [(1, dt.date(2024, 1, 2), None),
         (2, None, dt.date(2024, 1, 3)),
         (3, dt.date(2024, 1, 4), dt.date(2024, 1, 5))],
        "k int, d_l date, d_r date")
    out = {r["k"]: r["trade_date"] for r in mk.compile_merge_rules(
        j, {"trade_date": ("date", "prefer_left",
                           {"left": "d_l", "right": "d_r"})},
        key_cols=["k"]).collect()}
    assert out == {1: dt.date(2024, 1, 2), 2: dt.date(2024, 1, 3),
                   3: dt.date(2024, 1, 4)}


def test_vendor_merge_prefer_with_tolerance_emits_no_conflict(spark):
    """The reference's prefer_* kernels IGNORE the accuracy field, so a
    toleranced prefer_left rule must not contribute conflict audit rows —
    only mean_value rules do (merge_stock_daily already enforced this;
    merge_vendor_daily now matches)."""
    from data_integration_celery_spark import pipelines

    left = spark.createDataFrame(
        [("A", 10.0, 1.0)], "code string, close double, vol double")
    right = spark.createDataFrame(
        [("A", 99.0, 1.0)], "code string, close double, vol double")
    merged, conflicts = pipelines.merge_vendor_daily(
        left, right, ["code"],
        {"close": ("double", "prefer_left", 0.01),
         "vol": ("double", "mean_value", 0.01)})
    assert conflicts is not None
    cols = conflicts.columns
    assert "vol_conflict" in cols and "close_conflict" not in cols
    # close disagreed wildly but prefer_left logs nothing for it
    assert merged.collect()[0]["close"] == 10.0
