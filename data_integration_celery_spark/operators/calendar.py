"""Trading-calendar utilities (SURVEY §1.1).

The reference keeps per-exchange trade-date dimension tables
(tasks/tushare/trade_cal.py:31-80) and aligns/expands daily data against them
(finance_report/__init__.py:473-476). Here the calendar is a small dimension
DataFrame — always broadcast in joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def date_range(spark: SparkSession, start: str, end: str,
               exchange: str = "DEFAULT") -> DataFrame:
    """All-days calendar [start, end] via sequence+explode — one row, no scan."""
    return (spark.range(1)
            .select(F.explode(F.sequence(F.lit(start).cast("date"),
                                         F.lit(end).cast("date"))).alias("cal_date"))
            .withColumn("exchange", F.lit(exchange))
            .withColumn("is_open", (~F.dayofweek("cal_date").isin(1, 7)).cast("int")))


def trading_days(cal: DataFrame) -> DataFrame:
    return cal.where(F.col("is_open") == 1).select("exchange", "cal_date")


def align_to_calendar(daily: DataFrame, cal: DataFrame, key: str,
                      date_col: str) -> DataFrame:
    """Expand each key onto every open calendar date (left join back the
    data) — the reference's reindex-against-trade-dates. Missing dates get
    NULL value columns, ready for ffill (operators.windows.ffill)."""
    # distinct: a multi-exchange calendar union lists shared open dates
    # once PER EXCHANGE — without dedup the keys×days spine (and so every
    # joined row) would duplicate per exchange carrying that date
    days = (trading_days(cal).select(F.col("cal_date").alias(date_col))
            .distinct())
    keys = daily.select(key).distinct()
    spine = keys.crossJoin(F.broadcast(days))
    return spine.join(daily, on=[key, date_col], how="left")
