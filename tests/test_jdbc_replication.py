"""S9 real-JDBC replication against embedded Derby (sinks/jdbc.py).

Mirrors the reference's two secondary-schema exports
(/root/reference tasks/wind/future.py:724-817): whole-then-incremental
watermark parity, per-key watermarks, pushdown of the incremental filter,
and the vnpy delete-and-replace-if-changed refresh.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from data_integration_celery_spark.sinks import jdbc as J


def _bars(spark, rows):
    return spark.createDataFrame(
        [Row(wind_code=c, trade_date=dt.date.fromisoformat(d),
             open=o, high=o + 1.0, low=o - 1.0, close=cl,
             volume=100.0, position=10.0)
         for c, d, o, cl in rows])


BASE = [
    ("RB2401.SHF", "2024-01-02", 10.0, 11.0),
    ("RB2401.SHF", "2024-01-03", 11.0, 12.0),
    ("RB2401.SHF", "2024-01-04", 12.0, 0.0),   # close==0: must be dropped
    ("CU2402.SHF", "2024-01-02", 70.0, 71.0),
    ("AP2403.CZC", "2024-01-02", 8.0, 9.0),
]


def test_incremental_roundtrip_and_pushdown(spark, tmp_path):
    url = J.derby_url(str(tmp_path / "md"))
    src1 = _bars(spark, BASE).where(F.col("close") != 0)
    n1 = J.replicate_jdbc_incremental(
        spark, src1, url, "FUT_DAILY", watermark_col="trade_date")
    assert n1 == 4
    assert J.read_table(spark, url, "FUT_DAILY").count() == 4

    # second run with two new rows + one stale row (below watermark)
    extra = [("RB2401.SHF", "2024-01-05", 13.0, 14.0),
             ("CU2402.SHF", "2024-01-05", 72.0, 73.0),
             ("CU2402.SHF", "2024-01-01", 69.0, 70.0)]  # stale, skipped
    src2 = _bars(spark, BASE + extra).where(F.col("close") != 0)
    n2 = J.replicate_jdbc_incremental(
        spark, src2, url, "FUT_DAILY", watermark_col="trade_date")
    assert n2 == 2
    got = J.read_table(spark, url, "FUT_DAILY")
    assert got.count() == 6
    # parity with a from-scratch filtered copy, minus the stale row
    want = {(r["wind_code"], str(r["trade_date"]))
            for r in src2.where(F.col("trade_date") > dt.date(2024, 1, 1))
            .collect()}
    assert {(r["wind_code"], str(r["trade_date"]))
            for r in got.collect()} == want

    # the global-watermark incremental predicate must reach the source scan
    current_max = dt.date(2024, 1, 4)
    plan = (src2.where(F.col("trade_date") > F.lit(current_max))
            ._jdf.queryExecution().executedPlan().toString())
    assert "trade_date" in plan


def test_incremental_per_key_watermark(spark, tmp_path):
    url = J.derby_url(str(tmp_path / "mdk"))
    src1 = _bars(spark, BASE[:2]).where(F.col("close") != 0)  # RB only
    J.replicate_jdbc_incremental(spark, src1, url, "FUT_K",
                                 watermark_col="trade_date",
                                 key_col="wind_code")
    # RB gains one newer row; CU is a brand-new key (flows whole);
    # RB's 01-02 row is already there (skipped per-key)
    src2 = _bars(spark, BASE[:2] + [
        ("RB2401.SHF", "2024-01-05", 13.0, 14.0),
        ("CU2402.SHF", "2024-01-02", 70.0, 71.0),
        ("CU2402.SHF", "2024-01-03", 71.0, 72.0)])
    n = J.replicate_jdbc_incremental(spark, src2, url, "FUT_K",
                                     watermark_col="trade_date",
                                     key_col="wind_code")
    assert n == 3
    got = J.read_table(spark, url, "FUT_K")
    assert got.count() == 5
    per_key = {r["wind_code"]: r["n"] for r in
               got.groupBy("wind_code").agg(F.count("*").alias("n")).collect()}
    assert per_key == {"RB2401.SHF": 3, "CU2402.SHF": 2}


RENAME = {"trade_date": "datetime", "open": "open_price", "high": "high_price",
          "low": "low_price", "close": "close_price", "volume": "volume",
          "position": "open_interest"}
EXCHANGE_MAP = {"SHF": "SHFE", "CZC": "CZCE"}


def test_vnpy_export_replace_if_changed(spark, tmp_path):
    url = J.derby_url(str(tmp_path / "vnpy"))
    src = _bars(spark, BASE)
    n = J.export_bars_jdbc(spark, src, url, "DBBARDATA",
                           code_col="wind_code", rename_map=RENAME,
                           exchange_map=EXCHANGE_MAP)
    assert n == 4  # close==0 row dropped
    got = J.read_table(spark, url, "DBBARDATA")
    row = got.where(F.col("symbol") == "AP2403").collect()[0]
    assert row["exchange"] == "CZCE" and row["interval"] == "1d"
    assert row["open_price"] == 8.0 and row["close_price"] == 9.0

    # unchanged source: every symbol's count matches -> nothing written
    assert J.export_bars_jdbc(spark, src, url, "DBBARDATA",
                              code_col="wind_code", rename_map=RENAME,
                              exchange_map=EXCHANGE_MAP) == 0

    # one symbol gains a row -> only that symbol is deleted+rewritten
    src2 = _bars(spark, BASE + [("RB2401.SHF", "2024-01-05", 13.0, 14.0)])
    n2 = J.export_bars_jdbc(spark, src2, url, "DBBARDATA",
                            code_col="wind_code", rename_map=RENAME,
                            exchange_map=EXCHANGE_MAP)
    assert n2 == 3  # RB2401's three nonzero-close rows
    got2 = J.read_table(spark, url, "DBBARDATA")
    assert got2.count() == 5
    assert got2.where(F.col("symbol") == "RB2401").count() == 3
    # untouched symbols kept exactly one copy
    assert got2.where(F.col("symbol") == "CU2402").count() == 1


def test_lowercase_table_name_is_not_recopied(spark, tmp_path):
    """Unquoted DDL case-folds the stored name (Derby folds UP), so the
    existence probe must match case-insensitively — a lowercase table name
    previously missed the probe and re-appended the full source every run
    (silent unbounded duplication)."""
    url = J.derby_url(str(tmp_path / "lc"))
    src = _bars(spark, BASE).where(F.col("close") != 0)
    n1 = J.replicate_jdbc_incremental(
        spark, src, url, "fut_lower", watermark_col="trade_date")
    assert n1 == 4
    assert J.table_exists(spark, url, "fut_lower")
    # second run with the identical source: nothing past the watermark
    n2 = J.replicate_jdbc_incremental(
        spark, src, url, "fut_lower", watermark_col="trade_date")
    assert n2 == 0
    assert J.read_table(spark, url, "fut_lower").count() == 4


def test_table_exists_scoped_to_current_schema(spark, tmp_path):
    """A same-named table in ANOTHER schema must not count as existing:
    Derby's SYS catalog tables (SYSTABLES et al.) are visible to an
    unscoped getTables(None, None, '%') enumeration, and a false 'exists'
    skips the initial load and probes a table the writer never writes
    (the Postgres information_schema 'tables'/'columns' failure mode)."""
    url = J.derby_url(str(tmp_path / "scoped"))
    src = _bars(spark, BASE).where(F.col("close") != 0)
    J.replicate_jdbc_incremental(
        spark, src, url, "fut_scoped", watermark_col="trade_date")
    assert J.table_exists(spark, url, "fut_scoped")
    # lives in Derby's SYS schema, not the connection's current schema
    assert not J.table_exists(spark, url, "SYSTABLES")
    assert not J.table_exists(spark, url, "systables")


def test_table_exists_escapes_schema_pattern_wildcards(spark, tmp_path):
    """The current schema name is passed to getTables as a metadata
    PATTERN, where '_' is a single-char wildcard: a connection whose
    schema is MY_SCHEMA must not enumerate tables of MYXSCHEMA (a
    residual cross-schema false 'exists' that skips the initial load).
    Derby's default schema is the connection user, so two users stand in
    for the two schemas."""
    db = str(tmp_path / "escdb")
    url_x = J.derby_url(db) + ";user=MYXSCHEMA"
    src = _bars(spark, BASE).where(F.col("close") != 0)
    J.replicate_jdbc_incremental(
        spark, src, url_x, "ghost", watermark_col="trade_date")
    assert J.table_exists(spark, url_x, "ghost")
    # same db, current schema MY_SCHEMA: the unescaped pattern matched
    # MYXSCHEMA and reported the table as existing
    url_u = J.derby_url(db) + ";user=MY_SCHEMA"
    assert not J.table_exists(spark, url_u, "ghost")
