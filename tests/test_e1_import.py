"""E1 end-to-end: incremental range planning → distributed vendor fetch →
typed conform → partitioned upsert → watermark advance (the reference's
import_future_daily, tasks/wind/future.py:244-378, as one Spark job)."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from data_integration_celery_spark import schemas
from data_integration_celery_spark.operators import incremental, upsert
from data_integration_celery_spark.sources import vendor


def test_e1_import_cycle(spark, tmp_path):
    def _fake_vendor(code, date_from, date_to):
        # closure (pickled by value — executors can't import the test module)
        days = pd.date_range(date_from, date_to, freq="D")
        return pd.DataFrame({
            "code": code, "trade_date": days.date,
            "close": [100.0 + i for i in range(len(days))],
            "vol": 1000.0})

    lake = str(tmp_path / "daily_md")
    info = spark.createDataFrame(
        [("RB01", dt.date(2020, 1, 1), None),
         ("RB02", dt.date(2020, 1, 5), None),
         ("OLD1", dt.date(2019, 1, 1), dt.date(2019, 6, 1))],  # delisted
        "code string, list_date date, delist_date date")
    empty_daily = spark.createDataFrame(
        [], "code string, trade_date date, close double, vol double")

    cutoff = incremental.completeness_cutoff(
        now=dt.datetime(2020, 1, 10, 17, 0))  # after 16:00 → include today
    ranges = incremental.fetch_ranges(
        info, empty_daily, key="code", date_col="trade_date",
        start_col="list_date", end_col="delist_date", cutoff=cutoff)
    plan = {r["code"]: (r["date_from"], r["date_to"]) for r in ranges.collect()}
    # fresh codes fetch from listing; the delisted one backfills its history
    # once, capped at its delist date
    assert plan["RB01"] == (dt.date(2020, 1, 1), dt.date(2020, 1, 10))
    assert plan["RB02"] == (dt.date(2020, 1, 5), dt.date(2020, 1, 10))
    assert plan["OLD1"] == (dt.date(2019, 1, 1), dt.date(2019, 6, 1))
    old1_days = (dt.date(2019, 6, 1) - dt.date(2019, 1, 1)).days + 1

    fetched = vendor.fetch_distributed(
        ranges.select("code", "date_from", "date_to"), _fake_vendor,
        "code string, trade_date date, close double, vol double")
    conformed = schemas.conform(fetched, schemas.DAILY_MD)
    upsert.write_upsert(spark, conformed.withColumn("batch_id", F.lit(1)),
                        lake, keys=["code", "trade_date"])

    daily = spark.read.parquet(lake)
    assert daily.count() == 10 + 6 + old1_days  # RB01: 10d, RB02: 6d, OLD1 backfill

    # second cycle: watermark advanced → only new dates fetched
    cutoff2 = incremental.completeness_cutoff(
        now=dt.datetime(2020, 1, 12, 17, 0))
    ranges2 = incremental.fetch_ranges(
        info, daily.select("code", "trade_date", "close", "vol"),
        key="code", date_col="trade_date",
        start_col="list_date", end_col="delist_date", cutoff=cutoff2)
    plan2 = {r["code"]: (r["date_from"], r["date_to"]) for r in ranges2.collect()}
    assert plan2["RB01"] == (dt.date(2020, 1, 11), dt.date(2020, 1, 12))
    assert "OLD1" not in plan2  # watermark past delist → complete, never refetched

    fetched2 = vendor.fetch_distributed(
        ranges2.select("code", "date_from", "date_to"), _fake_vendor,
        "code string, trade_date date, close double, vol double")
    upsert.write_upsert(
        spark, schemas.conform(fetched2, schemas.DAILY_MD)
        .withColumn("batch_id", F.lit(2)), lake, keys=["code", "trade_date"])
    final = spark.read.parquet(lake)
    assert final.count() == 12 + 8 + old1_days  # live codes advanced to Jan 12
    assert final.groupBy("code", "trade_date").count() \
        .where("count > 1").count() == 0


def test_conform_and_partition_columns(spark):
    raw = spark.createDataFrame(
        [("RB01", "2020-03-05", "3500.5", 10.0)],
        "CODE string, trade_date string, CLOSE string, extra double")
    out = schemas.conform(raw, schemas.DAILY_MD)
    assert [f.name for f in out.schema.fields] == \
        [f.name for f in schemas.DAILY_MD.schema.fields]
    row = out.collect()[0]
    assert row["close"] == 3500.5 and row["trade_date"] == dt.date(2020, 3, 5)
    assert row["open"] is None  # missing column → typed NULL
    withparts = schemas.partition_columns(out, schemas.DAILY_MD)
    assert withparts.collect()[0]["trade_year"] == 2020
