"""Skew and co-location utilities for 100 TB joins.

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime; these are the explicit tools for the cases AQE can't see:

- ``salted_join``: hot-key fact⋈dim join where the dim is too big to
  broadcast — salt the fact side, replicate the dim per salt, join on
  (key, salt). Result is identical to the plain join for any salt width.
- ``write_bucketed``/``bucketed_table``: pre-shuffle co-location — two
  tables bucketed on the join key by the same bucket count join with NO
  exchange at read time. This is how the (code, date) fact tables should
  land so every daily merge/as-of join is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                salt_width: int = 16, how: str = "inner",
                seed: int = 42) -> DataFrame:
    """fact ⋈ dim on ``key`` with the fact side salted ``salt_width`` ways.

    The dim side is exploded ×salt_width (keep it the smaller side); each
    hot fact key spreads over salt_width reducers. Output columns match the
    plain join (salt dropped).

    Only ``inner`` and ``left`` are identity-preserving: every fact row
    carries exactly one salt, so fact-side multiplicity survives outer
    semantics — but an UNMATCHED dim row exists as salt_width exploded
    copies, so right/full outer would emit it salt_width times instead of
    once. Those modes raise rather than silently multiply.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}: an "
            "unmatched dim row is replicated salt_width times, so "
            "right/full outer results would be wrong")
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed) * salt_width).cast("int"))
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_width)])))
    out = salted_fact.join(salted_dim, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   buckets: int = 32,
                   sort_by: str | None = None) -> None:
    """Land a table bucketed (and optionally sorted) on the join key(s).

    Reads of two tables bucketed identically join without any Exchange —
    the shuffle was paid once at write time, amortised over every later
    join/agg on that key (the reference pays it per-query in MySQL).
    Composite keys (e.g. the LSH index's (band, bucket)) bucket on the
    tuple hash, so equi-joins on the full key list stay co-located.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").bucketBy(buckets, *keys)
    if sort_by:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
