"""Reference-fidelity pipeline definitions.

These assemble the operator library into the reference's actual jobs, with
the real rule tables. The column sets mirror the canonical merged tables
(/root/reference tasks/merge/stock.py:52-66,121-176 for stock,
tasks/merge/future.py:43-75 for futures); kernels and tolerances follow the
reference's rule dicts. One codegen'd projection replaces the row-wise
``merge_data`` interpreter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import merge_kernels as mk

# merged stock daily rule table — {out_col: (dtype, kernel, tolerance)}
# mirrors tasks/merge/stock.py:121-169: prices mean_value with 0.01-0.5
# tolerances, volumes prefer_left, labels max_up_or_down.
STOCK_DAILY_RULES: dict[str, tuple[str, str, float | None]] = {
    "open": ("double", "mean_value", 0.5),
    "high": ("double", "mean_value", 0.5),
    "low": ("double", "mean_value", 0.5),
    "close": ("double", "mean_value", 0.01),
    "vol": ("double", "prefer_left", None),
    "amount": ("double", "prefer_left", None),
    "turnover_rate": ("double", "mean_value", 0.5),
    "pe": ("double", "prefer_right", None),
    "pb": ("double", "prefer_right", None),
    "max_up_or_down": ("double", "max_up_or_down", None),
}


def merge_vendor_daily(left: DataFrame, right: DataFrame,
                       key_cols: list[str],
                       rules: dict[str, tuple[str, str, float | None]]
                       = STOCK_DAILY_RULES,
                       audit: bool = True) -> tuple[DataFrame, DataFrame | None]:
    """Two-vendor daily merge (E2): full-outer join + kernel projection.

    ``left``/``right`` carry the same column names; only columns present in
    both frames and named in ``rules`` are merged (missing ones pass through
    from whichever side has them). Returns (merged, conflicts) where
    conflicts is the tolerance side-output (the reference logged warnings;
    we emit an audit table).
    """
    lcols = set(left.columns)
    rcols = set(right.columns)
    j = (left.alias("l").join(right.alias("r"), key_cols, "full_outer"))

    out_cols: list = [F.col(k) for k in key_cols]
    conflict_cols: dict[str, object] = {}
    for out, (dtype, kernel, tol) in rules.items():
        in_l, in_r = out in lcols, out in rcols
        if not (in_l or in_r):
            continue
        if in_l and in_r:
            l, r = F.col(f"l.{out}"), F.col(f"r.{out}")
            expr = mk.KERNELS[kernel](l, r)
            if tol is not None and audit:
                conflict_cols[f"{out}_conflict"] = mk.mean_value_warning(l, r, tol)
        else:
            expr = F.col(f"l.{out}") if in_l else F.col(f"r.{out}")
        out_cols.append(expr.cast(dtype).alias(out))

    merged = j.select(*out_cols)
    conflicts = None
    if audit and conflict_cols:
        flagged = j.select(*[F.col(k) for k in key_cols],
                           *[c.alias(name) for name, c in conflict_cols.items()])
        any_conflict = None
        for name in conflict_cols:
            col = F.col(name)
            any_conflict = col if any_conflict is None else (any_conflict | col)
        conflicts = flagged.where(any_conflict)
    return merged, conflicts


def materialize_continuous_selection(spark, cd: DataFrame, path: str) -> DataFrame:
    """E3 as a DAG with a stored intermediate: run the stateful contract
    selection ONCE, publish it partitioned by instrument_type, and return the
    parquet-backed reader every downstream job (main/sec join, factor chains,
    adjusted md) joins against.

    Mirrors the reference, which stores wind_future_continuous_* per type and
    reads it back for every consumer (tasks/wind/future_reorg/
    reorg_md_2_db.py:130-193) instead of re-running the selection walk. Here
    that means exactly one FlatMapGroupsInPandas across the whole derived-
    analytics DAG; consumers plan plain scans with pushdown/pruning. The
    per-type dynamic partition overwrite matches the reference's
    delete-then-insert-per-type refresh, so rebuilding one instrument_type
    never touches the others' files.
    """
    from .operators import continuous, upsert

    sel = continuous.select_contracts(cd)
    upsert.overwrite_partitions(sel, path, ["instrument_type"])
    return spark.read.parquet(path)


def continuous_analytics_from(selected: DataFrame, cd: DataFrame) -> dict[str, DataFrame]:
    """Every selection consumer, built from the materialized table: the
    reference's reorg job family (main/sec join, division- and diff-method
    adjusted series) sharing one stored selection."""
    from .operators import continuous

    return {
        "main_sec": continuous.main_sec_join(selected, cd),
        "adjusted_division": continuous.adjusted_md(
            continuous.adj_factor_chain(selected, method="division"),
            method="division"),
        "adjusted_diff": continuous.adjusted_md(
            continuous.adj_factor_chain(selected, method="diff"),
            method="diff"),
    }
