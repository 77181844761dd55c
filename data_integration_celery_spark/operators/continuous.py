"""Continuous-contract construction — the reference's hardest analytics (W7/W3/W11).

Reference: per instrument_type, walk trade dates in order choosing the *main*
contract (highest volume / OI) under the monotonic rule "the chosen contract
number may advance but never retreat", pick a *secondary* deliverable later
than main, detect switch days, and compute the back-adjustment ratio from both
contracts' closes on the day before the switch
(/root/reference tasks/wind/future_reorg/reorg_md_2_db.py:229-336,
tasks/wind/future_reorg/reversion_rights_factor.py:107-211,
tasks/tushare/tushare_future/continuse_contract_md.py:152-348; factor chain
:354-357 uses the shift(1) reverse-cumprod convention we standardise on).

Spark-first design: the scan is genuinely order-dependent with cross-row
state, so it runs as ``groupBy(type).applyInPandas`` — per-type groups are
small (one row per contract-day) and independent, so a 1000-executor cluster
processes all types in parallel with one shuffle on the type key. Everything
around it (contract-day aggregation, factor application) stays JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import DEC

_SELECT_SCHEMA = (
    "instrument_type string, trade_date timestamp, main_contract long, "
    "sec_contract long, main_close double, switch_flag int, adj_ratio double, "
    "adj_delta double"
)


def contract_daily(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Synthesise a (type, date, contract) daily md table from the star schema:
    brand=instrument_type, partkey=contract number, shipdate=trade_date,
    Σquantity=volume, max(extendedprice)=close."""
    return (lineitem.join(F.broadcast(part.select("p_partkey", "p_brand")),
                          lineitem.l_partkey == F.col("p_partkey"))
            .groupBy(F.col("p_brand").alias("instrument_type"),
                     F.col("l_shipdate").alias("trade_date"),
                     F.col("l_partkey").alias("contract"))
            .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("vol"),
                 F.max("l_extendedprice").alias("close")))


def _select_one_type(pdf: pd.DataFrame, switch_by: str = "vol",
                     smooth_days: int = 0) -> pd.DataFrame:
    """Sequential main/secondary selection for one instrument type.

    Rules (reference reorg_md_2_db.py:229-336; variants
    continuse_contract_md.py:152-201):
      candidate(t)   = argmax of the switch key on t (ties → higher contract)
      main(t)        = max(main(t-1), candidate(t))   # never retreat
      secondary(t)   = argmax among contracts > main(t) on t
      main_close(t)  = close of main(t) if it traded, else forward-filled
      switch day     = main(t) != main(t-1); adj_ratio = close_new/close_old
                       both taken on t-1 (NaN-safe → NULL when unavailable)

    ``switch_by``: 'vol' (default) or 'oi' when an open-interest column is
    present — the reference supports both switch keys. ``smooth_days`` > 0
    replaces the key with its trailing mean over the last ``smooth_days+1``
    observations per contract (the tushare 3-row-mean confirmation rule) so a
    one-day volume spike cannot force a switch.
    """
    key = switch_by if switch_by in pdf.columns else "vol"
    if smooth_days > 0:
        pdf = pdf.sort_values(["contract", "trade_date"])
        pdf["__key"] = (pdf.groupby("contract")[key]
                        .transform(lambda s: s.rolling(smooth_days + 1,
                                                       min_periods=1).mean()))
        key = "__key"
    # Vectorised recurrence: the only true cross-row state is the running max
    # of the per-date candidate; everything else is lookups off that series.
    # (A per-date python loop is 50-100x slower at Arrow batch sizes.)
    pdf = pdf.sort_values(["trade_date", key, "contract"],
                          ascending=[True, False, False]).reset_index(drop=True)
    itype = pdf["instrument_type"].iloc[0]

    # candidate per date = first row in (key desc, contract desc) order
    cand = pdf.drop_duplicates("trade_date", keep="first")[["trade_date", "contract"]]
    cand = cand.rename(columns={"contract": "cand_contract"}).reset_index(drop=True)
    m = cand[["trade_date"]].copy()
    m["main_contract"] = cand["cand_contract"].cummax()
    m["prev_main"] = m["main_contract"].shift(1)
    m["prev_date"] = m["trade_date"].shift(1)
    m["switch_flag"] = ((m["prev_main"].notna())
                        & (m["main_contract"] != m["prev_main"])).astype(int)

    closes = pdf.set_index(["trade_date", "contract"])["close"]

    def _lookup(dates, contracts):
        idx = pd.MultiIndex.from_arrays([dates, contracts])
        return pd.Series(closes.reindex(idx).to_numpy(), index=m.index)

    # switch-day ratio: both contracts' closes on the prior date
    c_new = _lookup(m["prev_date"], m["main_contract"])
    c_old = _lookup(m["prev_date"], m["prev_main"])
    ratio = np.where(
        (m["switch_flag"] == 1) & c_new.notna() & c_old.notna() & (c_old != 0),
        c_new / c_old, np.nan)
    m["adj_ratio"] = ratio
    # additive (diff-method) factor: close_new − close_old on the same prior
    # date (reversion_rights_factor.py:39-63; no zero guard — subtraction)
    m["adj_delta"] = np.where(
        (m["switch_flag"] == 1) & c_new.notna() & c_old.notna(),
        c_new - c_old, np.nan)

    # main close (ffilled when main did not trade that day)
    m["main_close"] = _lookup(m["trade_date"], m["main_contract"]).ffill().to_numpy()

    # secondary: highest-volume contract strictly later than main, per date
    sec = pdf.merge(m[["trade_date", "main_contract"]], on="trade_date")
    sec = sec[sec["contract"] > sec["main_contract"]]
    sec = sec.drop_duplicates("trade_date", keep="first")[["trade_date", "contract"]]
    m = m.merge(sec.rename(columns={"contract": "sec_contract"}),
                on="trade_date", how="left")

    out = pd.DataFrame({
        "instrument_type": itype,
        "trade_date": m["trade_date"],
        "main_contract": m["main_contract"].astype("int64"),
        # nullable dtypes so missing values survive Arrow as SQL NULL, not NaN
        "sec_contract": m["sec_contract"].astype("Int64"),
        "main_close": m["main_close"].astype("Float64"),
        "switch_flag": m["switch_flag"].astype("int32"),
        "adj_ratio": pd.Series(m["adj_ratio"]).astype("Float64"),
        "adj_delta": pd.Series(m["adj_delta"]).astype("Float64"),
    })
    return out


def select_contracts(cd: DataFrame, switch_by: str = "vol",
                     smooth_days: int = 0) -> DataFrame:
    """Per-type stateful scan — the one justified pandas-UDF in the engine."""
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return _select_one_type(pdf, switch_by=switch_by,
                                smooth_days=smooth_days)
    return cd.groupBy("instrument_type").applyInPandas(run, _SELECT_SCHEMA)


def main_sec_join(selected: DataFrame, cd: DataFrame) -> DataFrame:
    """J14: enrich the continuous series with the secondary contract's md
    (reference reversion_rights_md.py:88-94 self-joins with *Next suffixes).

    ``selected`` is the (materialized or in-memory) output of
    ``select_contracts`` — in a real DAG it is written once and joined many
    times (the reference reuses the stored wind_future_continuous_* tables
    the same way, reorg_md_2_db.py:130-193)."""
    sec_md = cd.select(F.col("instrument_type"), F.col("trade_date"),
                       F.col("contract").alias("sec_contract"),
                       F.col("close").alias("sec_close"))
    return (selected
            .join(sec_md, ["instrument_type", "trade_date", "sec_contract"],
                  "left")
            .select("instrument_type", "trade_date", "main_contract",
                    "main_close", "sec_contract", "sec_close"))


def adj_factor_chain(selected: DataFrame, method: str = "division") -> DataFrame:
    """Reverse-chronological factor chain (W3) with the tushare shift(1)
    convention: the factor applies *from* the switch day backwards; the most
    recent date carries the neutral factor (continuse_contract_md.py:354-357).

    ``method='division'`` (default): multiplicative ratios — cumprod via
    exp(Σ ln) over the descending-date frame, neutral 1.
    ``method='diff'``: additive deltas — reverse cumsum through
    DECIMAL(38,6) (exact, so this variant IS oracle-able), neutral 0
    (reversion_rights_factor.py:227-236; the enum at :31-36 documents the
    neutral as the method value — division→1, diff→0. The reference's diff
    branch fills gaps with 1 before cumsum, contradicting its own enum; we
    use the documented neutral 0).
    """
    w_desc = (Window.partitionBy("instrument_type")
              .orderBy(F.col("trade_date").desc())
              .rowsBetween(Window.unboundedPreceding, -1))
    if method == "division":
        ratio = F.coalesce(F.col("adj_ratio"), F.lit(1.0))
        factor = F.coalesce(F.exp(F.sum(F.log(ratio)).over(w_desc)), F.lit(1.0))
    elif method == "diff":
        delta = F.coalesce(F.col("adj_delta"), F.lit(0.0))
        factor = F.coalesce(
            F.sum(delta.cast(DEC)).over(w_desc).cast("double"), F.lit(0.0))
    else:
        raise ValueError(f"method must be 'division' or 'diff', got {method!r}")
    return selected.withColumn("adj_factor", factor)


def adjusted_md(selected_with_factor: DataFrame,
                method: str = "division") -> DataFrame:
    """W11: apply the factor to build the back-adjusted continuous series
    (division: price × factor; diff: price + factor —
    reversion_rights_factor.py:44-47)."""
    if method == "division":
        adj = F.col("main_close") * F.col("adj_factor")
    elif method == "diff":
        adj = F.col("main_close") + F.col("adj_factor")
    else:
        raise ValueError(f"method must be 'division' or 'diff', got {method!r}")
    return selected_with_factor.withColumn("adj_close", adj)
