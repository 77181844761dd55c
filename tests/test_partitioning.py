"""Year-partitioned layout: writes land per-year directories and reads prune
partitions (the reference's RANGE-partition DDL, tasks/backend/partition.py,
as write-time layout + free pruning)."""

import datetime as dt
import os

from pyspark.sql import functions as F

from data_integration_celery_spark import schemas
from data_integration_celery_spark.operators import upsert


def test_partitioned_write_and_pruning(spark, tmp_path):
    path = str(tmp_path / "tick_lake")
    rows = [("RB01", dt.datetime(y, 3, 1, 10, 0, 0), i, 100.0 + i, 1.0, 0)
            for i, y in enumerate([2018, 2019, 2019, 2020, 2020, 2020])]
    df = spark.createDataFrame(
        rows, "code string, trade_datetime timestamp, seq long, "
              "price double, vol double, buyorsell int")
    parted = schemas.partition_columns(df, schemas.TICK)
    upsert.overwrite_partitions(parted, path, ["trade_year"])

    assert sorted(d for d in os.listdir(path) if d.startswith("trade_year=")) \
        == ["trade_year=2018", "trade_year=2019", "trade_year=2020"]

    back = spark.read.parquet(path)
    q = back.where(F.col("trade_year") == 2020)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(trade_year" in plan \
        or "trade_year#" in plan.split("PartitionFilters")[1][:200]
    assert q.count() == 3

    # dynamic overwrite replaces only the touched partition
    upd = spark.createDataFrame(
        [("RB01", dt.datetime(2020, 6, 1, 10, 0, 0), 99, 500.0, 1.0, 0)],
        df.schema)
    upsert.overwrite_partitions(
        schemas.partition_columns(upd, schemas.TICK), path, ["trade_year"])
    back2 = spark.read.parquet(path)
    assert back2.where("trade_year = 2019").count() == 2  # untouched
    assert back2.where("trade_year = 2020").count() == 1  # replaced
