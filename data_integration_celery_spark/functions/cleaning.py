"""Dirty-data cleaning expressions (SURVEY.md §1.2 "dirty-data handling").

Each helper reproduces a reference cleaning semantic as a vectorised Column
expression instead of a per-value Python lambda.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def str_2_float(c: Column) -> Column:
    """String→double coercion, non-numeric → NULL.

    Reference: ``str_2_float`` applied column-wise before write
    (tasks/wind/future_reorg/reorg_md_2_db.py:158-175). Spark's cast returns
    NULL on garbage, matching the reference's try/except→nan.
    """
    return c.cast("double")


def mfprice_2_num(c: Column) -> Column:
    """Extract the leading numeric out of a messy price string.

    Reference ``mfprice_2_num`` (tasks/wind/future.py:47-54): strings like
    "10元/吨" → 10.0; empty/no-digit → NULL.
    """
    extracted = F.regexp_extract(c.cast("string"), r"(\d+\.?\d*)", 1)
    return F.when(extracted != "", extracted.cast("double"))


def null_literals_to_null(c: Column, literals: tuple[str, ...] = ("null", "None", "nan", "")) -> Column:
    """Vendor 'null'-string → real NULL (reference tasks/rqdatac/future.py:105)."""
    return F.when(~F.lower(c).isin([s.lower() for s in literals]), c)


def lower_columns(df: DataFrame) -> DataFrame:
    """Lower-case every column name (reference tasks/wind/future.py:231,360)."""
    return df.toDF(*[c.lower() for c in df.columns])


def fuzzy_canonicalize(c: Column, candidates: list[str]) -> Column:
    """Value-level ``rename_by_dic`` (reference tasks/cmc/coin.py:188-195):
    lower-case the value, return the FIRST candidate that occurs as a
    substring, else the lowered value unchanged. One when(contains())
    ladder — whole-stage codegen, first-match-wins order preserved.
    """
    low = F.lower(c)
    expr = None
    for cand in candidates:
        cond = low.contains(cand.lower())
        expr = (F.when(cond, F.lit(cand)) if expr is None
                else expr.when(cond, F.lit(cand)))
    return expr.otherwise(low) if expr is not None else low


def rename_columns_by_dic(df: DataFrame, candidates: list[str]) -> DataFrame:
    """Column-name form of ``rename_by_dic`` as the reference applies it
    (tasks/cmc/coin.py:275: vendor JSON keys → canonical column names by
    fuzzy containment). Driver-side metadata only — no plan change, no
    shuffle; duplicate post-rename names raise rather than silently
    collide (pandas would have produced duplicate columns)."""
    def ren(name: str) -> str:
        low = name.lower()
        for cand in candidates:
            if cand.lower() in low:
                return cand
        return low
    new = [ren(c) for c in df.columns]
    dupes = {n for n in new if new.count(n) > 1}
    if dupes:
        raise ValueError(f"rename_by_dic collision on {sorted(dupes)}")
    return df.toDF(*new)


def epoch_seconds_to_ts(c: Column) -> Column:
    """None-safe epoch-seconds → timestamp (reference tasks/cmc/coin.py:
    171-172: ``None if x is None else datetime.fromtimestamp(float(x))``).
    ``timestamp_seconds`` is already NULL-propagating; fractional seconds
    keep microsecond precision. The reference used the machine's local
    zone; here the session zone is pinned UTC (session.py), which is the
    reproducible choice for a cluster."""
    return F.timestamp_seconds(c.cast("double"))


def drop_all_null_leading(df: DataFrame, value_cols: list[str]) -> DataFrame:
    """Drop rows where every value column is NULL.

    Reference: drop first-10-dates-all-NULL rows (tasks/wind/stock.py:613-617);
    generalised to "drop fully-empty rows" — the calendar-alignment variant
    lives in operators.asof.
    """
    cond = F.coalesce(*[F.col(c) for c in value_cols]).isNotNull()
    return df.where(cond)
