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
    (tasks/wind/future.py:724-937). Here target is a parquet path (lake-to-
    lake replication); the real-DB path is sinks.jdbc.replicate_jdbc_incremental
    / export_bars_jdbc, exercised end-to-end against embedded Derby in
    tests/test_jdbc_replication.py.
    """
    from ..operators.upsert import _exists

    df = transform(source) if transform else source
    # branch on existence, not on read failure (the upsert rule): a
    # transient read error on an EXISTING target must propagate —
    # swallowing it here would null the watermark and append the ENTIRE
    # source on top of existing rows (silent wholesale duplication)
    if _exists(spark, target_path):
        current_max = (spark.read.parquet(target_path)
                       .agg(F.max(watermark_col)).collect()[0][0])
    else:
        current_max = None
    if current_max is not None:
        df = df.where(F.col(watermark_col) > F.lit(current_max))
    df.write.mode("append").parquet(target_path)


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) of every parquet data file under ``path`` (recursive),
    via the Hadoop FS API so it works on any scheme the cluster reads."""
    fs, jpath = _fs(spark, path)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith("_"):
            out.append((st.getPath().toString(), st.getLen()))
    return out


def compact_table(spark: SparkSession, path: str,
                  partition_cols: list[str] | None = None,
                  target_file_mb: int = 128) -> int:
    """S11 maintenance: OPTIMIZE-style small-file compaction for parquet.

    The reference's maintenance pass is ``REPAIR TABLE`` on MyISAM
    (tasks/backend/repair_table.py:15-22); the parquet-lake equivalent problem
    is *small files* — per-micro-batch appends leave thousands of KB-sized
    files whose open/footer cost dominates scans at 100 TB. Delta/Iceberg call
    the fix OPTIMIZE / rewrite_data_files; on plain parquet it is a
    bin-packing rewrite:

    - unpartitioned: repartition to ceil(total_bytes / target) files and
      overwrite (staged through a temp dir — Spark refuses to overwrite its
      own input);
    - partitioned: repartition on the partition columns so each partition's
      rows land in one task → one file per partition, rewritten via dynamic
      partition overwrite (only partitions present in the data are touched,
      so callers can compact a partition subset by filtering first).

    Returns the data-file count after compaction. The unpartitioned publish
    uses the ``write_upsert`` staging+backup rename protocol, so a crash at
    any instant leaves a complete table at ``path`` or ``path__backup`` and
    ``recover_table`` heals it (the old delete-then-rename left a window
    with NO table at ``path`` and the data parked in a temp dir no recovery
    routine knew about). The partitioned branch rewrites via dynamic
    partition overwrite — same per-partition atomicity caveat as any plain-
    parquet dynamic overwrite; run in the maintenance window.
    """
    from ..operators.upsert import (_BACKUP, _STAGING, _hadoop_rm, _rename,
                                    recover_table)
    recover_table(spark, path)  # heal any interrupted earlier commit first
    files = list_data_files(spark, path)
    total = sum(sz for _, sz in files)
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact"
    if partition_cols:
        # stage a verbatim copy first (Spark refuses to overwrite its own
        # input), then bin-pack on the FINAL write — packing on the staged
        # write would be undone by the re-read splitting big files back
        # into maxPartitionBytes-sized tasks
        df.write.mode("overwrite").parquet(tmp)
        (spark.read.parquet(tmp)
         .repartition(*[F.col(c) for c in partition_cols])
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(*partition_cols).parquet(path))
        fs, jtmp = _fs(spark, tmp)
        fs.delete(jtmp, True)
    else:
        # publish the staged layout by RENAME, not by read-back: a second
        # spark.read would re-split the freshly packed files at
        # maxPartitionBytes (128m), silently discarding the target size,
        # and would copy all data a second time. Publish order is the
        # write_upsert protocol: stage → path→backup → staging→path →
        # drop backup, so the table is ALWAYS present at path or backup.
        n = max(1, -(-total // (target_file_mb * 1024 * 1024)))
        base = path.rstrip("/")
        staging, backup = base + _STAGING, base + _BACKUP
        df.repartition(n).write.mode("overwrite").parquet(staging)
        _rename(spark, base, backup)
        _rename(spark, staging, base)
        _hadoop_rm(spark, backup)
        spark.catalog.refreshByPath(path)
    return len(list_data_files(spark, path))


def backup_table(df: DataFrame, path: str) -> None:
    """S11: point-in-time backup copy (the reference's ``CREATE TABLE LIKE +
    INSERT SELECT`` before risky refreshes, tasks/jqdata/stock/
    available_check/__init__.py:23-48) — a CTAS snapshot the snapshot-diff
    audit (operators.quality.snapshot_diff_audit) compares against."""
    df.write.mode("overwrite").parquet(path)
