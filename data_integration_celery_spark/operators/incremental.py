"""Incremental high-watermark planning (SURVEY J13/A1).

Reference pattern (every importer): ``info LEFT JOIN (SELECT code,
ADDDATE(MAX(date),1) FROM daily GROUP BY code)`` → per-code fetch range
``[IFNULL(max+1, ipo_date), LEAST(delist_date, cutoff)]`` —
/root/reference tasks/wind/future.py:272-299, tasks/ifind/stock.py:205-227,
tasks/tushare/tushare_stock_daily/stock.py:125-149.

Spark-first: the grouped max is a partial-aggregated shuffle on the key; the
join against the (small) info dimension broadcasts. The driver-side python
dict of ranges disappears — downstream fetch becomes mapInPandas over the
range frame (see sources.vendor).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def watermarks(daily: DataFrame, key: str, date_col: str) -> DataFrame:
    """Per-key max(date) — the most common aggregation in the reference."""
    return daily.groupBy(key).agg(F.max(date_col).alias("max_date"))


def completeness_cutoff(now: dt.datetime | None = None, hour_cut: int = 16) -> Column:
    """'Before 16:00 the feed for *today* is incomplete → stop at yesterday.'

    Reference tasks/wind/future.py:278. Expression form so it can sit inside
    a plan; pass ``now`` for deterministic tests.
    """
    ts = F.lit(now) if now is not None else F.current_timestamp()
    return F.when(F.hour(ts) < hour_cut, F.date_add(F.to_date(ts), -1)) \
            .otherwise(F.to_date(ts))


def fetch_ranges(info: DataFrame, daily: DataFrame, key: str, date_col: str,
                 start_col: str, end_col: str | None = None,
                 cutoff: Column | None = None) -> DataFrame:
    """info ⟕ per-key watermark → [date_from, date_to] fetch plan per key.

    - date_from = max(date)+1 if the key has history, else its listing date
    - date_to   = least(delist/end date if any, completeness cutoff)
    - keys already up to date (date_from > date_to) are dropped.
    """
    wm = watermarks(daily, key, date_col)
    cut = cutoff if cutoff is not None else completeness_cutoff()
    out = (
        info.join(wm, on=key, how="left")
        .withColumn("date_from",
                    F.coalesce(F.date_add(F.col("max_date"), 1), F.col(start_col)))
        .withColumn("date_to",
                    F.least(F.col(end_col), cut) if end_col else cut)
        .where(F.col("date_from") <= F.col("date_to"))
        .drop("max_date")
    )
    return out
