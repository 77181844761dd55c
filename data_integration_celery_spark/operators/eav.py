"""EAV (entity-attribute-value) side tables (SURVEY §1.1, J6).

Reference: ad-hoc indicator columns land in key-value tables
(``ifind_ckdvp_stock(ths_code, key, time, value, param)``, /root/reference
tasks/ifind/stock.py:425-538) and are later promoted onto the wide daily
table with a correlated ``UPDATE … JOIN`` (:413-421). Values are stored as
strings and cast on use.

Spark-native: the EAV table is just a long DataFrame; promotion is pivot (or
a keyed left join) + coalesce — one shuffle on the entity key, no in-place
mutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_eav(df: DataFrame, key_cols: list[str], value_cols: list[str]) -> DataFrame:
    """Wide → long: one (key..., k, v) row per value column, v as string
    (the reference's Varchar(80) storage)."""
    stack_args = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in value_cols)
    return df.select(*key_cols,
                     F.expr(f"stack({len(value_cols)}, {stack_args}) AS (k, v)"))


def pivot_eav(eav: DataFrame, key_cols: list[str], keys: list[str],
              dtype: str = "double") -> DataFrame:
    """Long → wide with explicit keys (skips the distinct scan), typed cast
    at read (the reference casts the Varchar on use)."""
    return (eav.groupBy(*key_cols)
               .pivot("k", keys)
               .agg(F.first("v"))
               .select(*key_cols, *[F.col(k).cast(dtype).alias(k) for k in keys]))


def promote_eav(wide: DataFrame, eav: DataFrame, key_cols: list[str],
                eav_key: str, out_col: str, dtype: str = "double") -> DataFrame:
    """The UPDATE…JOIN: fill ``out_col`` on the wide table from EAV rows with
    k == eav_key; existing non-null wide values win (the reference only
    backfills missing cells).

    The EAV side is aggregated to ONE row per key before the join
    (deterministic max, mirroring pivot_eav's one-value-per-cell grain):
    the reference EAV grain carries a ``param`` column, so duplicate
    (keys, k) rows occur on real feeds — joining them raw would fan out
    every matching wide row."""
    side = (eav.where(F.col("k") == eav_key)
               .groupBy(*key_cols)
               .agg(F.max(F.col("v").cast(dtype)).alias("__eav_v")))
    joined = wide.join(side, key_cols, "left")
    if out_col in wide.columns:
        filled = F.coalesce(F.col(out_col), F.col("__eav_v"))
    else:
        filled = F.col("__eav_v")
    return joined.withColumn(out_col, filled).drop("__eav_v")
