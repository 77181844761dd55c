"""As-of join formulations must agree; interval joins flag correctly;
binary-archive source parses distributed."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from data_integration_celery_spark.operators import asof
from data_integration_celery_spark.sources import files


def _d(day):
    return dt.date(2020, 1, day)


def test_asof_union_equals_range_join(spark):
    daily = spark.createDataFrame(
        [("a", _d(i)) for i in range(1, 15)] + [("b", _d(i)) for i in range(1, 15)],
        "code string, trade_date date")
    reports = spark.createDataFrame(
        [("a", _d(2), 10.0), ("a", _d(5), 20.0), ("a", _d(11), 30.0),
         ("b", _d(7), 70.0)],
        "code string, pub_date date, eps double")

    via_union = asof.asof_join_union(daily, reports, key="code",
                                     date_col="trade_date", pub_col="pub_date",
                                     value_cols=["eps"])
    got_u = {(r["code"], r["trade_date"]): r["eps"] for r in via_union.collect()}

    via_range = asof.asof_join_range(daily, reports, key="code",
                                     date_col="trade_date", pub_col="pub_date")
    got_r = {(r["trade_date"], r["code"]): r["eps"]
             for r in via_range.select(F.col("d.code").alias("code"),
                                       F.col("d.trade_date").alias("trade_date"),
                                       "eps").collect()}
    got_r = {(c, d): v for (d, c), v in got_r.items()}
    assert got_u == got_r
    # spot semantics: effective from pub date (inclusive) until next report
    assert got_u[("a", _d(1))] is None
    assert got_u[("a", _d(2))] == 10.0
    assert got_u[("a", _d(4))] == 10.0
    assert got_u[("a", _d(5))] == 20.0
    assert got_u[("a", _d(14))] == 30.0
    assert got_u[("b", _d(6))] is None and got_u[("b", _d(8))] == 70.0


def test_interval_flag_join(spark):
    daily = spark.createDataFrame(
        [("a", _d(i)) for i in range(1, 10)], "code string, trade_date date")
    suspensions = spark.createDataFrame(
        [("a", _d(3), _d(5)), ("a", _d(8), _d(8))],
        "code string, suspend_date date, resume_date date")
    out = asof.interval_flag_join(daily, suspensions, key="code",
                                  date_col="trade_date",
                                  start_col="suspend_date",
                                  end_col="resume_date",
                                  flag_col="suspended")
    got = {r["trade_date"].day: r["suspended"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 0, 7: 0, 8: 1, 9: 0}
    assert out.count() == daily.count()  # overlap never fans out


def test_binary_archive_source(spark, tmp_path):
    # land fake vendor archives; the injected parser turns bytes into rows
    for i in range(3):
        (tmp_path / f"fin_{i}.dat").write_bytes(
            b"\n".join(f"C{i}:{j}:{j * 1.5}".encode() for j in range(4)))

    def parse(path, content):
        rows = [line.split(b":") for line in content.splitlines()]
        return pd.DataFrame({
            "code": [r[0].decode() for r in rows],
            "seq": [int(r[1]) for r in rows],
            "val": [float(r[2]) for r in rows]})

    out = files.read_binary_archives(spark, str(tmp_path / "*.dat"), parse,
                                     "code string, seq int, val double")
    got = out.collect()
    assert len(got) == 12
    assert {r["code"] for r in got} == {"C0", "C1", "C2"}


def test_interval_flag_join_bucketed_equals_broadcast(spark):
    """Differential: the month-bucketed equi-join formulation (both sides
    large) must agree with the broadcast variant on intervals that span
    bucket boundaries, multi-month ranges, same-day intervals, and keys with
    no intervals at all."""
    daily = spark.createDataFrame(
        [("a", dt.date(2020, m, d)) for m in range(1, 6)
         for d in (1, 15, 28)] +
        [("b", dt.date(2020, 2, d)) for d in (10, 20)] +
        [("c", dt.date(2020, 3, 3))],
        "code string, trade_date date")
    intervals = spark.createDataFrame(
        [("a", dt.date(2020, 1, 20), dt.date(2020, 3, 10)),   # spans 3 buckets
         ("a", dt.date(2020, 4, 28), dt.date(2020, 4, 28)),   # same-day
         ("b", dt.date(2020, 2, 15), dt.date(2020, 2, 25))],
        "code string, s date, e date")

    def key(df):
        return sorted((r["code"], r["trade_date"], r["in_interval"])
                      for r in df.collect())

    broad = asof.interval_flag_join(daily, intervals, "code", "trade_date",
                                    "s", "e")
    buck = asof.interval_flag_join_bucketed(daily, intervals, "code",
                                            "trade_date", "s", "e")
    assert key(buck) == key(broad)
    got = {(r["code"], r["trade_date"]): r["in_interval"]
           for r in buck.collect()}
    assert got[("a", dt.date(2020, 2, 15))] == 1     # mid-span month
    assert got[("a", dt.date(2020, 3, 28))] == 0     # after interval end
    assert got[("a", dt.date(2020, 4, 28))] == 1     # same-day interval
    assert got[("c", dt.date(2020, 3, 3))] == 0      # key with no intervals
    assert buck.count() == daily.count()


def test_interval_flag_join_keeps_duplicate_daily_rows(spark):
    """Genuine duplicate daily rows must survive flagging (the old
    join+dropDuplicates collapsed them), and overlapping intervals must not
    fan rows out."""
    from data_integration_celery_spark.operators import asof

    daily = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 5, 1.0),      # genuine duplicate rows
         ("a", 20, 2.0), ("b", 5, 3.0)],
        "code string, d int, v double")
    intervals = spark.createDataFrame(
        [("a", 1, 10), ("a", 3, 7),          # overlapping intervals cover d=5
         ("b", 50, 60)],
        "code string, s int, e int")
    out = asof.interval_flag_join(daily, intervals, "code", "d", "s", "e")
    rows = sorted((r["code"], r["d"], r["v"], r["in_interval"])
                  for r in out.collect())
    assert rows == [("a", 5, 1.0, 1), ("a", 5, 1.0, 1),
                    ("a", 20, 2.0, 0), ("b", 5, 3.0, 0)]


def test_rebar_preserves_amount_and_n_ticks(spark):
    """rebar's docstring promises vol/amount=Σ — the amount column (and
    n_ticks) previously vanished whenever vol existed."""
    import datetime as dt

    from data_integration_celery_spark.operators import bars as B

    b1 = spark.createDataFrame(
        [("X", dt.datetime(2024, 1, 1, 9, m), 10.0 + m, 11.0, 9.0,
          10.5, 2.0, 20.0, 3) for m in range(4)],
        "code string, bar_start timestamp, open double, high double, "
        "low double, close double, vol double, amount double, n_ticks long")
    out = B.rebar(b1, ["code"], "bar_start", "15 minutes").collect()
    assert len(out) == 1
    r = out[0]
    assert r["vol"] == 8.0 and r["amount"] == 80.0 and r["n_ticks"] == 12
    assert r["open"] == 10.0 and r["close"] == 10.5


def test_interval_bucketed_rejects_unsupported_trunc_unit(spark):
    """F.trunc('day') returns NULL — previously every interval row was
    silently dropped and all daily rows flagged 0; now it raises."""
    import pytest as _pt

    from data_integration_celery_spark.operators import asof as A

    df = spark.range(1).select(F.lit("K").alias("k"),
                               F.current_date().alias("d"))
    iv = spark.range(1).select(F.lit("K").alias("k"),
                               F.current_date().alias("s"),
                               F.current_date().alias("e"))
    with _pt.raises(ValueError, match="bucket"):
        A.interval_flag_join_bucketed(df, iv, "k", "d", "s", "e",
                                      bucket="day")


def test_asof_union_tiebreaks_make_same_ts_reports_deterministic(spark):
    """Two reports at the SAME (key, pub ts): without a tiebreak the
    carried value depends on shuffle placement; with tiebreaks the window
    order is total and the LAST row in tiebreak order wins."""
    import datetime as dt

    from data_integration_celery_spark.operators import asof as A

    daily = spark.createDataFrame(
        [("K", dt.date(2024, 1, 5))], "code string, d date")
    reports = spark.createDataFrame(
        [("K", dt.date(2024, 1, 1), 1.0), ("K", dt.date(2024, 1, 1), 2.0)],
        "code string, pub date, eps double")
    for _ in range(3):
        got = A.asof_join_union(daily, reports, "code", "d", "pub",
                                ["eps"], tiebreaks=["eps"]).collect()
        assert len(got) == 1 and got[0]["eps"] == 2.0


def test_asof_union_tiebreak_outside_value_cols_still_orders(spark):
    """A tiebreak that is a REPORT column but not a value column must still
    totally order the report rows (it previously never reached the unioned
    frame: analysis error, or NULL-ordered if daily carried a same-named
    column) — and must NOT leak into the output schema."""
    import datetime as dt

    import pytest

    from data_integration_celery_spark.operators import asof as A

    daily = spark.createDataFrame(
        [("K", dt.date(2024, 1, 5))], "code string, d date")
    reports = spark.createDataFrame(
        [("K", dt.date(2024, 1, 1), 1.0, 2), ("K", dt.date(2024, 1, 1), 2.0, 1)],
        "code string, pub date, eps double, rev int")
    for _ in range(3):
        out = A.asof_join_union(daily, reports, "code", "d", "pub",
                                ["eps"], tiebreaks=["rev"])
        got = out.collect()
        # rev=2 sorts last in the window -> its eps (1.0) is carried
        assert len(got) == 1 and got[0]["eps"] == 1.0
        assert "rev" not in out.columns  # ordering-only column stays internal
    with pytest.raises(ValueError, match="tiebreak"):
        A.asof_join_union(daily, reports, "code", "d", "pub",
                          ["eps"], tiebreaks=["nope"])
