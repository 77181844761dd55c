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
            # conflict audit applies to mean_value rules only: the
            # reference's prefer_* kernels ignore the accuracy field, so a
            # toleranced prefer_left row must not emit warnings the
            # reference never logs (same condition as merge_stock_daily)
            if kernel == "mean_value" and tol is not None and audit:
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


# Full-fidelity merge_stock_daily rule table — a 1:1 transcription of the
# reference's col_merge_dic (/root/reference tasks/merge/stock.py:121-176):
# {out_col: (dtype, kernel, sources, warning_accuracy)}. ``sources`` names
# columns on the joined two-vendor frame ({'left','right'}, or {'col'} for
# get_value). warning_accuracy only fires for mean_value — the reference's
# prefer_* kernels accept but ignore it (tasks/merge/__init__.py:21-37), so
# close (prefer_left, acc 0.01) and pe_ttm (prefer_right, acc 0.01) emit no
# conflict rows; that nuance is reproduced, not "fixed". The _x/_y suffixes
# are the joined frame's disambiguated names for columns both vendors carry
# (pandas suffixes=('_x','_y') made explicit).
STOCK_DAILY_FULL_RULES: dict[str, tuple[str, str, dict, float | None]] = {
    "unique_code": ("string", "prefer_left",
                    {"left": "ths_code", "right": "wind_code"}, None),
    "trade_date": ("date", "prefer_left",
                   {"left": "time", "right": "trade_date"}, None),
    "open": ("double", "mean_value",
             {"left": "open_x", "right": "open_y"}, 0.01),
    "high": ("double", "mean_value",
             {"left": "high_x", "right": "high_y"}, 0.01),
    "low": ("double", "mean_value",
            {"left": "low_x", "right": "low_y"}, 0.01),
    # wind close is unreliable per the reference's own TODO (stock.py:139)
    "close": ("double", "prefer_left",
              {"left": "close_x", "right": "close_y"}, None),
    "volume": ("double", "mean_value",
               {"left": "volume_x", "right": "volume_y"}, 1.0),
    "amount": ("double", "mean_value",
               {"left": "amount", "right": "amt"}, 1.0),
    # ths totalShares keys on change date, wind on announcement date —
    # wind wins conflicts (stock.py:148-150)
    "total_shares": ("double", "prefer_right",
                     {"left": "totalShares", "right": "total_shares"}, None),
    "max_up_or_down": ("int", "max_up_or_down_labels",
                       {"left": "ths_up_and_down_status_stock",
                        "right": "maxupordown"}, None),
    "total_capital": ("double", "get_value", {"col": "totalCapital"}, None),
    "float_capital": ("double", "get_value",
                      {"col": "floatCapitalOfAShares"}, None),
    "pct_chg": ("double", "mean_value",
                {"left": "changeRatio", "right": "pct_chg"}, 0.01),
    "float_a_shares": ("double", "get_value",
                       {"col": "floatSharesOfAShares"}, None),
    "free_float_shares": ("double", "get_value",
                          {"col": "free_float_shares"}, None),
    # ths pe_ttm keys on report date, wind on period — wind wins (stock.py:166)
    "pe_ttm": ("double", "prefer_right",
               {"left": "ths_pe_ttm_stock", "right": "pe_ttm"}, None),
    "pe": ("double", "get_value", {"col": "pe"}, None),
    "pb": ("double", "get_value", {"col": "pb"}, None),
    "ps": ("double", "get_value", {"col": "ps"}, None),
    "pcf": ("double", "get_value", {"col": "pcf"}, None),
}


def merge_stock_daily(ifind: DataFrame, wind: DataFrame,
                      left_on: tuple[str, str] = ("ths_code", "time"),
                      right_on: tuple[str, str] = ("wind_code", "trade_date"),
                      rules: dict[str, tuple[str, str, dict, float | None]]
                      = STOCK_DAILY_FULL_RULES,
                      audit: bool = True
                      ) -> tuple[DataFrame, DataFrame | None]:
    """The reference's flagship E2 entry point (merge_stock_daily,
    tasks/merge/stock.py:85-184) with its complete 17-column rule table:
    full-outer join on differently-named vendor keys + merge indicator
    (pandas ``indicator='indicator_column'``), one codegen'd kernel
    projection replacing the row-wise ``merge_data`` interpreter, and the
    mean_value tolerance warnings routed to a conflict side-output table
    instead of log lines.

    Returns (merged, conflicts): ``merged`` carries every rule-table output
    plus ``indicator_column`` ∈ {both, left_only, right_only}; ``conflicts``
    has the merged key columns plus one boolean per toleranced mean_value
    rule, filtered to rows where any fired (None when ``audit=False`` or no
    rule has a tolerance). At scale this is one shuffle (the join); the
    projection and the conflict filter are map-side.
    """
    # provenance sentinels, not key-nullness: pandas' indicator is
    # merge-metadata-based, so an unmatched RIGHT row whose own join key is
    # NULL must still read right_only — inspecting wind[right_key].isNull()
    # would misattribute it as left_only
    ifind = ifind.withColumn("__from_left", F.lit(1))
    wind = wind.withColumn("__from_right", F.lit(1))
    cond = None
    for lk, rk in zip(left_on, right_on):
        c = ifind[lk] == wind[rk]
        cond = c if cond is None else (cond & c)
    joined = ifind.join(wind, cond, "full_outer")
    indicator = (F.when(F.col("__from_right").isNull(), "left_only")
                  .when(F.col("__from_left").isNull(), "right_only")
                  .otherwise("both").alias("indicator_column"))

    out_cols: list = []
    key_exprs: list = []
    conflict_cols: dict[str, object] = {}
    non_numeric = ("string", "date", "timestamp", "boolean", "binary")
    for out, (dtype, kernel, src, tol) in rules.items():
        if kernel in ("prefer_left", "prefer_right") and dtype in non_numeric:
            kernel = kernel + "_any"  # NaN impossible; plain coalesce
        fn = mk.KERNELS[kernel]
        if kernel == "get_value":
            expr = fn(F.col(src["col"]))
        else:
            l, r = F.col(src["left"]), F.col(src["right"])
            expr = fn(l, r)
            if (src["left"], src["right"]) in (tuple(zip(left_on, right_on))):
                key_exprs.append(expr.cast(dtype).alias(out))
            if kernel == "mean_value" and tol is not None and audit:
                conflict_cols[f"{out}_conflict"] = \
                    mk.mean_value_warning(l, r, tol)
        out_cols.append(expr.cast(dtype).alias(out))

    merged = joined.select(*out_cols, indicator)
    conflicts = None
    if audit and conflict_cols:
        flagged = joined.select(
            *key_exprs,
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
