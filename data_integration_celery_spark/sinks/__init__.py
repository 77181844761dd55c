"""Export sinks (SURVEY S7/S8/S9).

The reference exports to per-code SQLite tables, CSV files, and secondary
MySQL schemas. Spark-native forms: partitioned parquet/csv writes and
JDBC replication with watermark-incremental filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_per_key(df: DataFrame, path: str, key_col: str,
                   column_map: dict[str, str] | None = None,
                   order_col: str | None = None) -> None:
    """Per-code fan-out export (S7): one directory partition per key value,
    columns renamed per the vendor mapping, sorted within each file.

    Reference: MySQL→SQLite per-ts_code table fan-out with rename maps
    (/root/reference tasks/utils/to_sqlite.py:335-430). partitionBy gives the
    per-code layout without N separate writes; sortWithinPartitions restores
    the per-file date order the reference guaranteed.
    """
    out = df
    if column_map:
        out = out.select(*[F.col(src).alias(dst) for src, dst in column_map.items()])
        key_col = column_map.get(key_col, key_col)
    out = out.repartition(F.col(key_col))
    if order_col:
        out = out.sortWithinPartitions(order_col)
    out.write.mode("overwrite").partitionBy(key_col).parquet(path)


def export_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV export (S8) — continuous-contract/index md csv dumps
    (reorg_md_2_db.py:393-402). ``single_file`` coalesces for the
    one-file-per-table layout the reference wrote."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def replicate_incremental(spark: SparkSession, source: DataFrame,
                          target_path: str, watermark_col: str,
                          transform=None) -> None:
    """Cross-store replication with high-watermark increments (S9).

    Reference: copy daily/min tables to the vnpy schema, whole-table first
    then `where datetime > (select max(datetime) from target)`
    (tasks/wind/future.py:724-937). Here target is a parquet path; swap the
    read/write for spark.read.jdbc/write.jdbc against a real secondary DB.
    """
    df = transform(source) if transform else source
    try:
        current_max = (spark.read.parquet(target_path)
                       .agg(F.max(watermark_col)).collect()[0][0])
    except Exception:
        current_max = None
    if current_max is not None:
        df = df.where(F.col(watermark_col) > F.lit(current_max))
    df.write.mode("append").parquet(target_path)


def backup_table(df: DataFrame, path: str) -> None:
    """S11: point-in-time backup copy (the reference's ``CREATE TABLE LIKE +
    INSERT SELECT`` before risky refreshes, tasks/jqdata/stock/
    available_check/__init__.py:23-48) — a CTAS snapshot the snapshot-diff
    audit (operators.quality.snapshot_diff_audit) compares against."""
    df.write.mode("overwrite").parquet(path)
