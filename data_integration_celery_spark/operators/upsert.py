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


def write_upsert(spark, updates: DataFrame, path: str, keys: list[str],
                 order_col: str = "batch_id") -> None:
    """Parquet-backed MERGE: read target if it exists, dedup, overwrite.

    (With a Delta/Iceberg catalog this becomes a real ``MERGE INTO``; plain
    parquet needs the read-union-overwrite dance. Kept here so tests exercise
    the idempotence property the reference relies on.)
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
