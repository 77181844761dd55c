"""Numeric expression helpers.

Cross-engine exactness: double-precision *reductions* (SUM/AVG) are
order-dependent, and Spark's partial aggregation order differs run-to-run and
from any single-threaded oracle. We therefore route money/quantity reductions
through DECIMAL(38,6): double→decimal casting is deterministic (a double's
decimal expansion never sits exactly on a half-ulp boundary), decimal addition
is exact and associative, and the final cast back to double is deterministic.
Per-row double arithmetic (a*b, 1-x, ...) is IEEE-exact and needs no help.

This also matters at scale: decimal sums mean an AQE re-plan or different
partitioning cannot change results — bit-stable aggregates at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive exact sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Exact-sum / exact-count average, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dsum_window(col: Column | str, window) -> Column:
    """Running/framed sum with the same decimal-exact trick."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).over(window).cast("double")


def pct_change(cur: Column, prev: Column) -> Column:
    """(cur - prev) / prev with divide-by-zero → NULL.

    Reference: switch-day factor ``close_new/close_old`` and pct chg at
    ``tasks/wind/future_reorg/reorg_md_2_db.py:313-314``.
    """
    return F.when(prev.isNotNull() & (prev != 0), (cur - prev) / prev)


def safe_div(num: Column, den: Column) -> Column:
    return F.when(den.isNotNull() & (den != 0), num / den)
