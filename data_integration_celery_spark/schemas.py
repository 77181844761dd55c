"""Canonical table-group schemas (SURVEY §1.3) — the engine's data contract.

Every reference table follows one of these shapes; importers validate/coerce
into them and the PK registry drives upsert keys and partition layout
(replacing the name-pattern PK bootstrap in /root/reference
tasks/backend/orm.py:113-298 and the yearly RANGE partition DDL in
tasks/backend/partition.py:15-91).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (DateType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType,
                               TimestampType)


@dataclass(frozen=True)
class TableSpec:
    name: str
    schema: StructType
    primary_key: tuple[str, ...]
    # partition columns for the parquet/Delta layout (derived cols allowed,
    # e.g. year(trade_date) — see partition_columns())
    partition_by: tuple[str, ...] = ()
    description: str = ""


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


INSTRUMENT_INFO = TableSpec(
    name="instrument_info",
    schema=StructType([
        _f("code", StringType(), False),
        _f("name", StringType()),
        _f("exchange", StringType()),
        _f("instrument_type", StringType()),
        _f("list_date", DateType()),
        _f("delist_date", DateType()),
    ]),
    primary_key=("code",),
    description="instrument master (wind_future_info / tushare_stock_info "
                "shape, tasks/wind/future.py:173-193)")

DAILY_MD = TableSpec(
    name="daily_md",
    schema=StructType([
        _f("code", StringType(), False),
        _f("trade_date", DateType(), False),
        _f("open", DoubleType()), _f("high", DoubleType()),
        _f("low", DoubleType()), _f("close", DoubleType()),
        _f("vol", DoubleType()), _f("amount", DoubleType()),
        _f("oi", DoubleType()),
    ]),
    primary_key=("code", "trade_date"),
    partition_by=("trade_year",),
    description="daily OHLCV+OI (wind_future_daily shape, "
                "tasks/wind/future.py:254-268)")

MINUTE_MD = TableSpec(
    name="minute_md",
    schema=StructType([
        _f("code", StringType(), False),
        _f("trade_datetime", TimestampType(), False),
        _f("open", DoubleType()), _f("high", DoubleType()),
        _f("low", DoubleType()), _f("close", DoubleType()),
        _f("vol", DoubleType()), _f("amount", DoubleType()),
    ]),
    primary_key=("code", "trade_datetime"),
    partition_by=("trade_year",),
    description="minute bars (wind_future_min, tasks/wind/future.py:395-474)")

TICK = TableSpec(
    name="tick",
    schema=StructType([
        _f("code", StringType(), False),
        _f("trade_datetime", TimestampType(), False),
        _f("seq", LongType(), False),        # arrival tiebreaker (ref: index)
        _f("price", DoubleType()),
        _f("vol", DoubleType()),
        _f("buyorsell", IntegerType()),
    ]),
    primary_key=("code", "trade_datetime", "seq"),
    partition_by=("trade_year",),
    description="append-only tick stream (pytdx_stock_tick, "
                "tasks/pytdx/stock_tick.py:273-285; yearly partitions "
                "tasks/backend/partition.py:15-91)")

FIN_REPORT = TableSpec(
    name="fin_report",
    schema=StructType([
        _f("code", StringType(), False),
        _f("pub_date", DateType(), False),
        _f("report_date", DateType(), False),
        _f("report_type", StringType()),
        _f("value_json", StringType()),
    ]),
    primary_key=("code", "pub_date", "report_date", "report_type"),
    description="publish-date-versioned reports (jq finance.STK_* keying, "
                "tasks/jqdata/stock/finance_report/__init__.py:487-496)")

TRADE_CAL = TableSpec(
    name="trade_cal",
    schema=StructType([
        _f("exchange", StringType(), False),
        _f("cal_date", DateType(), False),
        _f("is_open", IntegerType()),
    ]),
    primary_key=("exchange", "cal_date"),
    description="trading calendar (tushare_trade_date, "
                "tasks/tushare/trade_cal.py:74-78)")

CODE_MAPPING = TableSpec(
    name="code_mapping",
    schema=StructType([
        _f("unique_code", StringType(), False),
        _f("vendor_a_code", StringType()),
        _f("vendor_b_code", StringType()),
        _f("market", StringType()),
        _f("instrument_kind", StringType()),
    ]),
    primary_key=("unique_code",),
    description="cross-vendor entity resolution (tasks/backend/orm.py:27-35)")

EAV_SIDE = TableSpec(
    name="eav_side",
    schema=StructType([
        _f("code", StringType(), False),
        _f("k", StringType(), False),
        _f("trade_date", DateType(), False),
        _f("v", StringType()),
    ]),
    primary_key=("code", "k", "trade_date"),
    description="key-value indicator side table (ifind_ckdvp_stock, "
                "tasks/ifind/stock.py:425-538)")

REGISTRY: dict[str, TableSpec] = {s.name: s for s in [
    INSTRUMENT_INFO, DAILY_MD, MINUTE_MD, TICK, FIN_REPORT, TRADE_CAL,
    CODE_MAPPING, EAV_SIDE]}


def conform(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Coerce a frame to the spec: select/cast declared columns (missing →
    NULL), lower-cased names first (the reference lower-cases every vendor
    frame, tasks/wind/future.py:231)."""
    lowered = df.toDF(*[c.lower() for c in df.columns])
    cols = []
    for fld in spec.schema.fields:
        if fld.name in lowered.columns:
            cols.append(F.col(fld.name).cast(fld.dataType).alias(fld.name))
        else:
            cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
    return lowered.select(*cols)


def partition_columns(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Materialise derived partition columns (trade_year from the date/ts
    column) — partitionBy(year) replaces the reference's RANGE DDL."""
    out = df
    if "trade_year" in spec.partition_by:
        src = "trade_date" if "trade_date" in df.columns else "trade_datetime"
        out = out.withColumn("trade_year", F.year(src))
    return out


def reconcile(a: DataFrame, b: DataFrame) -> dict[str, list[str]]:
    """Schema reconciliation (SURVEY U5): column/type diffs between two
    frames — the reference compares mysql vs sqlite information_schema
    (tasks/utils/to_sqlite.py:771-830). Driver-side metadata only, no scan."""
    ta = {f.name.lower(): f.dataType.simpleString() for f in a.schema.fields}
    tb = {f.name.lower(): f.dataType.simpleString() for f in b.schema.fields}
    return {
        "only_in_a": sorted(set(ta) - set(tb)),
        "only_in_b": sorted(set(tb) - set(ta)),
        "type_mismatch": sorted(c for c in set(ta) & set(tb) if ta[c] != tb[c]),
    }
