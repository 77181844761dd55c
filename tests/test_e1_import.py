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


def test_catalog_driven_multi_series_ingestion(spark, tmp_path):
    """EDB macro-loop mirror (macroeconomy.py:35-115): a dict of 10 synthetic
    series drives ONE plan-join + distributed fetch + upsert. Second run
    ingests only the gap (incremental watermarks per series); a third run at
    the same cutoff plans nothing and fetches nothing."""
    import datetime as dt

    import pandas as pd

    from data_integration_celery_spark.sources import catalog_ingest, vendor

    catalog = {f"macro_{i:02d}": {"vendor_code": f"M{i:04d}.EDB",
                                  "start": dt.date(2024, 1, 1 + i)}
               for i in range(10)}

    def fake_fetch(series_id, date_from, date_to):
        # deterministic daily series derived from the id, from-exclusive
        # semantics like the reference's EDB pull (value = day-of-year + k)
        k = int(series_id.split("_")[1])
        days = pd.date_range(date_from, date_to, freq="D")
        return pd.DataFrame({
            "series_id": series_id,
            "obs_date": days.date,
            "value": [float(d.dayofyear + k) for d in days]})

    path = str(tmp_path / "macro")
    fetch = vendor.with_retry(fake_fetch, tries=2)
    out1 = catalog_ingest.ingest_series_catalog(
        spark, catalog, fetch, path, cutoff=dt.date(2024, 2, 1), batch_id=1)
    got1 = out1.groupBy("series_id").count().collect()
    # each series spans [start, cutoff]; starts are staggered per series
    expect1 = {f"macro_{i:02d}": (dt.date(2024, 2, 1) - dt.date(2024, 1, 1 + i)).days + 1
               for i in range(10)}
    assert {r["series_id"]: r["count"] for r in got1} == expect1

    # round 2: the fetcher marks its output (+1000). Incremental plan must
    # fetch ONLY (watermark, new cutoff], so pre-watermark rows keep round-1
    # values — refetching them would overwrite (last-write-wins).
    def marked_fetch(series_id, date_from, date_to):
        out = fake_fetch(series_id, date_from, date_to)
        out["value"] += 1000.0
        return out

    out2 = catalog_ingest.ingest_series_catalog(
        spark, catalog, marked_fetch, path, cutoff=dt.date(2024, 2, 10),
        batch_id=2)
    n = {r["series_id"]: r["count"]
         for r in out2.groupBy("series_id").count().collect()}
    assert n == {s: c + 9 for s, c in expect1.items()}
    from pyspark.sql import functions as F
    marked = out2.where(F.col("value") >= 1000.0)
    assert marked.count() == 90          # 10 series x 9 new days only
    assert marked.agg(F.min("obs_date")).collect()[0][0] == dt.date(2024, 2, 2)
    n_total2 = out2.count()              # capture before round 3 republishes

    # round 3 at the same cutoff: plan is empty -> a (+2000)-marking fetcher
    # must leave every value untouched
    def poison_fetch(series_id, date_from, date_to):
        out = fake_fetch(series_id, date_from, date_to)
        out["value"] += 2000.0
        return out

    out3 = catalog_ingest.ingest_series_catalog(
        spark, catalog, poison_fetch, path, cutoff=dt.date(2024, 2, 10),
        batch_id=3)
    assert out3.count() == n_total2
    assert out3.where(F.col("value") >= 2000.0).count() == 0
