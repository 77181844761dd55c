"""Upsert (last-write-wins per primary key) — the reference's universal sink.

Reference: every importer funnels through ``bunch_insert_on_duplicate_update``
→ MySQL ``INSERT … ON DUPLICATE KEY UPDATE`` (/root/reference
tasks/backend/__init__.py:16-38; PK bootstrap tasks/backend/orm.py:113-298).
MySQL resolves conflicts by *arrival order*; Spark needs an explicit
tiebreaker, so callers stamp a monotonically-increasing ``batch_id`` (ingest
timestamp / run id) and the newest batch wins per key.

Scale notes: the window-dedup shuffles once on the PK — exactly the shuffle a
Delta MERGE would do. At 100 TB you'd bound it by partitioning the target by
date and only rewriting touched partitions (``replaceWhere`` semantics —
see ``overwrite_partitions``); per-key conflict resolution stays identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_frames(base: DataFrame, updates: DataFrame, keys: list[str],
                  order_col: str = "batch_id") -> DataFrame:
    """UNION the snapshots and keep the newest row per PK.

    ``order_col`` must be comparable and present in both frames; the highest
    value wins (MySQL's "last write"). Deterministic for equal order values by
    preferring ``updates`` (stamped with a higher batch below if absent).
    """
    if order_col not in base.columns:
        base = base.withColumn(order_col, F.lit(0).cast("long"))
    if order_col not in updates.columns:
        updates = updates.withColumn(order_col, F.lit(1).cast("long"))
    unioned = base.unionByName(updates, allowMissingColumns=True)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", order_col)
    )


def _hadoop_rm(spark, path: str) -> None:
    """Recursive delete via the Hadoop FS API — works on any scheme the
    cluster can write (local, HDFS, S3A), unlike shutil."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(jpath, True)


def write_upsert(spark, updates: DataFrame, path: str, keys: list[str],
                 order_col: str = "batch_id") -> None:
    """Parquet-backed MERGE: read target if it exists, dedup, overwrite.

    (With a Delta/Iceberg catalog this becomes a real ``MERGE INTO``; plain
    parquet needs the read-union-overwrite dance. Kept here so tests exercise
    the idempotence property the reference relies on.)

    NOT atomic: a crash between the staging write and the final overwrite
    leaves the target in its old state (safe), but a crash *during* the final
    overwrite loses it — plain parquet has no commit protocol. Production
    targets should be date-partitioned and use ``write_upsert_partitioned``,
    which bounds both the rewrite and the blast radius to touched partitions.

    O(target) per merge by construction (whole-table rewrite); prefer
    ``write_upsert_partitioned`` for anything that grows.
    """
    try:
        base = spark.read.parquet(path)
    except Exception:
        updates.drop(order_col, "").write.mode("overwrite").parquet(path)
        return
    merged = upsert_frames(base, updates, keys, order_col)
    # Parquet cannot overwrite a path being read — stage through a temp dir.
    tmp = path.rstrip("/") + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)
    _hadoop_rm(spark, tmp)


def write_upsert_partitioned(spark, updates: DataFrame, path: str,
                             keys: list[str], partition_cols: list[str],
                             order_col: str = "batch_id") -> None:
    """Partition-scoped MERGE — the 100 TB form of the universal upsert sink.

    The target is parquet partitioned by ``partition_cols`` (typically the
    date). Only partitions containing updated keys are read, merged, and
    rewritten; untouched partitions' files are never opened, matching the
    reference's delete-then-insert per-slice refresh
    (tasks/wind/future_reorg/reorg_md_2_db.py:176-193).

    Steps: (1) distinct partition values in ``updates`` (one driver row per
    touched partition — thousands at most); (2) partition-pruned scan of just
    those target partitions; (3) per-PK last-write-wins merge (one shuffle on
    the PK, bounded to the touched slice); (4) dynamic partition overwrite of
    exactly those partitions, staged through a temp dir because Spark refuses
    an overwrite that reads its own input. ``partition_cols`` must be a prefix
    of the PK semantics (a key never moves between partitions), else rows in
    untouched partitions cannot be superseded.
    """
    try:
        base = spark.read.parquet(path)
    except Exception:
        overwrite_partitions(updates.drop(order_col), path, partition_cols)
        return
    touched = updates.select(*partition_cols).distinct().collect()
    pred = F.lit(False)
    for row in touched:
        match = F.lit(True)
        for c in partition_cols:
            match = match & F.col(c).eqNullSafe(F.lit(row[c]))
        pred = pred | match
    base_slice = base.where(pred)
    merged = upsert_frames(base_slice, updates, keys, order_col)
    tmp = path.rstrip("/") + "__stage"
    merged.write.mode("overwrite").parquet(tmp)
    staged = spark.read.parquet(tmp)
    overwrite_partitions(staged, path, partition_cols)
    _hadoop_rm(spark, tmp)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Idempotent delete-then-insert refresh per partition key.

    Reference: delete-then-upsert per instrument_type
    (tasks/wind/future_reorg/reorg_md_2_db.py:176-193). Spark-native form is
    dynamic partition overwrite — only the partitions present in ``df`` are
    replaced, so a per-type rebuild never touches other types.
    """
    (df.write.mode("overwrite")
       .option("partitionOverwriteMode", "dynamic")
       .partitionBy(*partition_cols)
       .parquet(path))


def dedup_last(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """Keep one row per key by explicit ordering (descending on order_cols).

    The PK-rebuild dedup of tick tables (tasks/merge/delete_duplicate_ticks.py:15-67)
    expressed as a window — no table rebuild needed.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1).drop("__rn"))
