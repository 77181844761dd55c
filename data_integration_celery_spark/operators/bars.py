"""Tick→bar and bar-resampling aggregations (SURVEY A3/A4, J12).

Reference: tick→1-min bars with a GROUP BY plus a join-back-to-tick for
open/close (tasks/pytdx/stock_tick_2_bar.py:39-55), and N-minute re-bars via a
ceil bucket + ffill (tasks/wind/handle_csv/merge_2_n_bar.py:20-52).

Spark-first: one ``groupBy(key, window(ts))`` with ``min_by/max_by`` for
open/close — no self-join. Map-side partial aggregation means the shuffle
carries one row per (key, bar), not per tick: at 100 TB of ticks this is the
difference between shuffling bars (~GBs) and shuffling ticks (~TBs). The same
aggregation body runs under Structured Streaming (streaming.bars_stream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import DEC


def _tiebreak(ts_col: str, id_col: str | None) -> Column:
    # open/close need a total order; tick streams can carry duplicate
    # timestamps, so break ties on the tick id (reference uses the
    # auto-increment ``index`` column min/max join, stock_tick_2_bar.py:44-49).
    if id_col is None:
        return F.col(ts_col)
    return F.struct(F.col(ts_col), F.col(id_col))


def ohlc_bars(ticks: DataFrame, key_cols: list[str], ts_col: str,
              price_col: str, vol_col: str | None = None,
              duration: str = "1 minute", id_col: str | None = None) -> DataFrame:
    """Tumbling-window OHLCV bars.

    Output grain: (key_cols..., bar_start, bar_end) with open/high/low/close,
    and vol/amount when ``vol_col`` given (amount = Σ price·vol, the
    reference's ``sum(price*vol)``).
    """
    order = _tiebreak(ts_col, id_col)
    aggs = [
        F.min_by(F.col(price_col), order).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(F.col(price_col), order).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    ]
    if vol_col:
        aggs += [
            F.sum(F.col(vol_col).cast(DEC)).cast("double").alias("vol"),
            F.sum((F.col(price_col) * F.col(vol_col)).cast(DEC)).cast("double").alias("amount"),
        ]
    win = F.window(F.col(ts_col), duration)
    return (ticks.groupBy(*key_cols, win)
                 .agg(*aggs)
                 .withColumn("bar_start", F.col("window.start"))
                 .withColumn("bar_end", F.col("window.end"))
                 .drop("window"))


def rebar(bars: DataFrame, key_cols: list[str], bar_start_col: str,
          duration: str = "15 minutes") -> DataFrame:
    """N-minute bars from finer bars: open=first, high=max, low=min,
    close=last, vol/amount/n_ticks=Σ over every such column the input
    carries (reference merge_2_n_bar.py:20-52 ceil bucket) — dropping
    amount would silently lose the Σ price·vol turnover the finer bars
    computed."""
    order = F.col(bar_start_col)
    win = F.window(F.col(bar_start_col), duration)
    agg = [
        F.min_by("open", order).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", order).alias("close"),
    ]
    for c in ("vol", "amount"):
        if c in bars.columns:
            agg.append(F.sum(F.col(c).cast(DEC)).cast("double").alias(c))
    if "n_ticks" in bars.columns:
        agg.append(F.sum("n_ticks").alias("n_ticks"))
    return (bars.groupBy(*key_cols, win)
                .agg(*agg)
                .withColumn("bar_start", F.col("window.start"))
                .withColumn("bar_end", F.col("window.end"))
                .drop("window"))
