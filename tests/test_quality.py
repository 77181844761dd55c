"""Golden tests for the report-quality kernels — fixtures re-derived from the
reference's inline spec tests (finance_report/__init__.py:347-414), not ported
code: YTD quarterization ladder and accumulation-column detection rule."""

import datetime as dt

from pyspark.sql import functions as F

from data_integration_celery_spark.operators import quality


def _reports(spark, rows):
    return spark.createDataFrame(rows, "code string, report_date date, revenue double")


def test_quarterize_golden(spark):
    # YTD 100/250/450/700 → quarterly 100/150/200/250
    df = _reports(spark, [
        ("a", dt.date(2020, 3, 31), 100.0),
        ("a", dt.date(2020, 6, 30), 250.0),
        ("a", dt.date(2020, 9, 30), 450.0),
        ("a", dt.date(2020, 12, 31), 700.0),
    ])
    out = quality.quarterize(df, "code", "report_date", "revenue")
    got = {r["report_date"].month: r["revenue_q"] for r in out.collect()}
    assert got == {3: 100.0, 6: 150.0, 9: 200.0, 12: 250.0}


def test_quarterize_missing_quarter_interpolates(spark):
    # Q1=100 then Q3=450: the two skipped quarters split the growth → 175
    df = _reports(spark, [
        ("a", dt.date(2020, 3, 31), 100.0),
        ("a", dt.date(2020, 9, 30), 450.0),
    ])
    out = quality.quarterize(df, "code", "report_date", "revenue")
    got = {r["report_date"].month: r["revenue_q"] for r in out.collect()}
    assert got == {3: 100.0, 9: 175.0}


def test_quarterize_first_seen_divides_by_quarter(spark):
    # first report is Q3 → season-average fallback value/3
    df = _reports(spark, [("a", dt.date(2020, 9, 30), 450.0)])
    out = quality.quarterize(df, "code", "report_date", "revenue")
    assert out.collect()[0]["revenue_q"] == 150.0


def test_detect_accumulation_cols(spark):
    rows = []
    # revenue: YTD-cumulative across 4 years; flat: constant (never fits drop)
    for year in (2017, 2018, 2019, 2020):
        for i, month in enumerate((3, 6, 9, 12)):
            rows.append(("a", dt.date(year, month, 28),
                         100.0 * (i + 1), 55.0))
    df = spark.createDataFrame(
        rows, "code string, report_date date, revenue double, flat double")
    out = quality.detect_accumulation_cols(df, "code", "report_date",
                                           ["revenue", "flat"])
    got = {r["column"]: r["is_accum"] for r in out.collect()}
    assert got == {"revenue": True, "flat": False}


def test_snapshot_diff_audit(spark):
    cur = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 1, 20.0), ("c", 1, 30.0)],
        "code string, d int, v double")
    bak = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 1, 99.0), ("d", 1, 40.0)],
        "code string, d int, v double")
    out = quality.snapshot_diff_audit(cur, bak, pk=["code", "d"])
    got = {r["code"]: r["status"] for r in out.collect()}
    assert got == {"b": "changed", "c": "added", "d": "removed"}


def test_completeness_anti_join(spark):
    expected = spark.createDataFrame([("a",), ("b",)], "code string")
    actual = spark.createDataFrame([("a", 1)], "code string, v int")
    missing = quality.completeness_anti_join(expected, actual, "code")
    assert [r["code"] for r in missing.collect()] == ["b"]


def test_quarterize_exact_reference_golden(spark):
    # The reference's _test_fill_season_data fixture verbatim
    # (finance_report/__init__.py:347-384): YTD 400/NaN/600/NaN/1400 + next
    # year 1600.  Expected filled values 400/100/600/1500/1400/1600 and
    # seasons 100/100/500/500/-100/400 — the NaN rows are imputed by linear
    # growth (season*month/3) and the imputed value feeds the next diff.
    df = _reports(spark, [
        ("000001.XSHE", dt.date(2000, 12, 31), 400.0),
        ("000001.XSHE", dt.date(2001, 3, 31), None),
        ("000001.XSHE", dt.date(2001, 6, 30), 600.0),
        ("000001.XSHE", dt.date(2001, 9, 30), None),
        ("000001.XSHE", dt.date(2001, 12, 31), 1400.0),
        ("000001.XSHE", dt.date(2002, 12, 31), 1600.0),
    ])
    out = quality.quarterize_exact(df, "code", "report_date", "revenue")
    rows = {(r["report_date"].year, r["report_date"].month):
            (r["value_filled"], r["season"]) for r in out.collect()}
    assert rows == {
        (2000, 12): (400.0, 100.0),
        (2001, 3): (100.0, 100.0),
        (2001, 6): (600.0, 500.0),
        (2001, 9): (1500.0, 500.0),
        (2001, 12): (1400.0, -100.0),
        (2002, 12): (1600.0, 400.0),
    }


def test_quarterize_exact_all_null_group(spark):
    df = _reports(spark, [
        ("x", dt.date(2020, 3, 31), None),
        ("x", dt.date(2020, 6, 30), None),
    ])
    out = quality.quarterize_exact(df, "code", "report_date", "revenue")
    for r in out.collect():
        assert r["value_filled"] is None and r["season"] is None


def test_reconcile_schemas_greedy_alias(spark):
    from pyspark.sql.types import (StructType, StructField, StringType,
                                   LongType, DoubleType, DateType)
    a = StructType([StructField("trade_date", DateType()),
                    StructField("vol", DoubleType()),
                    StructField("Close", DoubleType()),
                    StructField("extra_a", StringType())])
    b = StructType([StructField("Date", DateType()),
                    StructField("Volume", LongType()),
                    StructField("close", StringType()),
                    StructField("extra_b", StringType())])
    out = quality.reconcile_schemas(
        spark, a, b,
        match_pairs=[("trade_date", "Date"), ("vol", "Volume")])
    rows = {r["col_a"] or r["col_b"]: r for r in out.collect()}
    # alias-map matches (the reference's pre-seeded pairs)
    assert rows["trade_date"]["col_b"] == "Date"
    assert rows["trade_date"]["action"] == "ok"
    # alias match with differing types -> cast
    assert rows["vol"]["col_b"] == "Volume"
    assert rows["vol"]["type_a"] == "double"
    assert rows["vol"]["type_b"] == "bigint"
    assert rows["vol"]["action"] == "cast"
    # case-insensitive name match
    assert rows["Close"]["col_b"] == "close"
    assert rows["Close"]["action"] == "cast"  # double vs varchar
    # one-sided columns
    assert rows["extra_a"]["status"] == "a_only"
    assert rows["extra_a"]["action"] == "add_to_b"
    assert rows["extra_b"]["status"] == "b_only"
    assert rows["extra_b"]["action"] == "add_to_a"
    # greedy consumption: each B column used at most once
    assert out.where("col_b is not null").groupBy("col_b").count() \
              .where("count > 1").count() == 0


def test_sketch_profile_error_bounds(spark, sf_dir):
    """HLL distinct within 3x the configured rsd of exact; GK quantiles
    within the documented rank-error bound; count/mean exact."""
    from data_integration_celery_spark import catalog
    from data_integration_celery_spark.operators import quality

    ev = catalog.load(spark, "events", sf_dir)
    got = {r["event_type"]: r for r in quality.sketch_profile(
        ev, "event_type", "user_id", "value").collect()}

    import pyspark.sql.functions as F
    exact = {r["event_type"]: r for r in ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("nd"),
        F.avg("value").alias("mean"),
        F.sort_array(F.collect_list("value")).alias("vals")).collect()}
    assert set(got) == set(exact) and len(got) > 1
    for k, e in exact.items():
        g = got[k]
        assert g["n_rows"] == e["n"]
        assert abs(g["n_distinct_approx"] - e["nd"]) <= max(2, 0.06 * e["nd"])
        # sketch_profile's mean goes through DECIMAL(38,6) (determinism
        # contract) → exact to 6 dp, not full double precision
        assert abs(g["mean"] - e["mean"]) < 5e-6
        vals, n = e["vals"], len(e["vals"])
        for frac, col in [(0.25, "q25"), (0.5, "q50"),
                          (0.75, "q75"), (0.95, "q95")]:
            # GK guarantee: returned value's rank within n/accuracy of
            # ceil(frac*n); allow +-1 extra for boundary convention
            import bisect
            lo = bisect.bisect_left(vals, g[col])
            hi = bisect.bisect_right(vals, g[col])
            target = frac * n
            tol = n / 10_000 + 2
            assert lo - tol <= target <= hi + tol, (k, col, g[col])
