"""Z-order (Morton) clustering — multi-column data skipping for file layout.

Range-clustering a table on ONE column (``TxTable``'s default
``repartitionByRange`` batches) gives tight per-file [min,max] stats for that
column only; a predicate on any other column still opens every file.
Interleaving the bits of several columns' equi-depth bucket ids (the Morton /
Z-curve, public technique popularized for lakehouse layouts by Delta/Iceberg
OPTIMIZE ZORDER) keeps every interleaved column's values locally clustered,
so per-file min/max ranges stay narrow on ALL of them and a predicate on any
one column skips most files.

Everything is pure Column expressions (codegen-able, no UDF):

1. per column: equi-depth bucket id from ``approxQuantile`` boundaries
   (one bounded driver collect of 2^bits - 1 doubles per column — equi-depth
   beats equi-width under skew, same reason ``repartitionByRange`` samples);
2. bit-interleave the bucket ids into one long;
3. the caller lays files out by the z-key (``repartitionByRange`` on it +
   in-partition sort) and records per-file stats for the source columns.

At 100 TB this is the difference between a two-dimension scan problem
(date × entity) needing two copies of the data and one copy serving both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float",
            "long", "short", "byte")


def _bucket_expr(col: str, boundaries: list[float]) -> Column:
    """Equi-depth bucket id (0..len(boundaries)) as a when-chain over the
    quantile boundaries — a flat codegen-able comparison ladder. NULLs go
    to bucket 0 explicitly: a NULL comparison is three-valued FALSE in
    every ``when`` arm, so without the leading isNull arm they would fall
    through to the TOP bucket, not the documented bottom."""
    out = F.lit(len(boundaries))
    for i in reversed(range(len(boundaries))):
        out = F.when(F.col(col) <= F.lit(boundaries[i]), F.lit(i)).otherwise(out)
    return F.when(F.col(col).isNull(), F.lit(0)).otherwise(out).cast("long")


def interleave_bits(bucket_cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` low bits of each bucket id column into one
    long: output bit (i * n_cols + j) = bit i of column j."""
    n = len(bucket_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(bucket_cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def with_zorder_key(df: DataFrame, cols: list[str], bits: int = 4,
                    key_col: str = "__z", rel_err: float = 0.01) -> DataFrame:
    """Append the z-order key for ``cols`` (numeric) as ``key_col``.

    ``bits`` per column (2^bits equi-depth buckets each; 4-6 is plenty for
    file-level skipping — the key only has to order FILES, not rows). NULLs
    sort into bucket 0. The quantile collect is 2^bits - 1 doubles per
    column — driver-bounded at any corpus size.
    """
    if not cols or len(cols) * bits > 62:
        raise ValueError(f"z-order needs 1+ columns and n_cols*bits <= 62, "
                         f"got {len(cols)} cols x {bits} bits")
    for c in cols:
        dt = dict(df.dtypes)[c]
        if not any(dt.startswith(p) for p in _NUMERIC):
            raise ValueError(f"z-order column {c} has non-numeric type {dt}; "
                             f"cast dates/timestamps to epoch days/seconds "
                             f"first (order-preserving)")
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE pass for all columns (approxQuantile takes a column list) — a
    # per-column loop would re-scan the whole frame len(cols) times
    all_bs = df.approxQuantile(cols, probs, rel_err)  # bounded driver collect
    bucket_exprs = [_bucket_expr(c, sorted(set(bs)))
                    for c, bs in zip(cols, all_bs)]
    return df.withColumn(key_col, interleave_bits(bucket_exprs, bits))
