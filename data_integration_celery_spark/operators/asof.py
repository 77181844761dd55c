"""As-of / interval temporal joins (SURVEY J8, J9, J10, W9).

The reference implements "report effective from pub_date until the next
pub_date, stamped onto every daily row" with sorted python loops and boolean
masks (/root/reference tasks/merge/stock.py:277-337,
tasks/jqdata/stock/finance_report/__init__.py:501-560), and suspend-interval
flags with a per-row dict lookup (tasks/merge/tushare.py:190-221).

Spark-first formulations:
- effectivity windows via ``lead()`` then a range join — Catalyst executes it
  as a broadcast/SMJ with an inequality post-filter, adequate when one side is
  dimension-sized; at 100 TB bucket both sides by the entity key so the range
  predicate evaluates within co-located partitions.
- the *union trick* (``asof_join_union``): interleave events and quotes in one
  frame and forward-fill — a single shuffle on (key, time), no range join at
  all. This is the scale path: state is one row per key, no inequality join
  blow-up, and it is exactly how the streaming engine would do it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def effectivity(reports: DataFrame, key: str, pub_col: str,
                next_col: str = "pub_date_next",
                tiebreak: list[str] | None = None) -> DataFrame:
    """Stamp each report with its exclusive end date (next report's pub date).

    lead() over (key, pub_date[, tiebreak...]) — the reference's ``shift(-1)``
    (tasks/jqdata/stock/finance_report/__init__.py:506-507). Pass ``tiebreak``
    whenever two reports can share a pub date, to keep the window total-ordered.
    """
    w = Window.partitionBy(key).orderBy(pub_col, *(tiebreak or []))
    return reports.withColumn(next_col, F.lead(pub_col).over(w))


def asof_join_range(daily: DataFrame, reports: DataFrame, key: str,
                    date_col: str, pub_col: str) -> DataFrame:
    """daily ⟕ report effective at daily.date: range join on the lead window.

    Each daily row matches at most one report row (pub ≤ d < next_pub), so the
    join is 1:≤1 — no post-dedup needed.
    """
    eff = effectivity(reports, key, pub_col)
    cond = (
        (daily[key] == eff[key])
        & (daily[date_col] >= eff[pub_col])
        & (eff["pub_date_next"].isNull() | (daily[date_col] < eff["pub_date_next"]))
    )
    return daily.alias("d").join(eff.alias("r"), cond, "left")


def asof_join_union(daily: DataFrame, reports: DataFrame, key: str,
                    date_col: str, pub_col: str,
                    value_cols: list[str],
                    tiebreaks: list[str] | None = None) -> DataFrame:
    """Shuffle-once as-of join: union + forward-fill (the 100 TB path).

    Interleave report rows (flagged) with daily rows on a common time axis,
    then ``last(value, ignoreNulls)`` over (key ordered by time, report-first)
    carries each report forward until the next one. One shuffle on ``key``,
    state bounded by one row/key — survives arbitrary fact-side scale.

    Determinism contract: ``(key, pub_col)`` must uniquely identify a
    report, OR pass ``tiebreaks`` (REPORT columns appended to the window
    order) — with two reports at the same timestamp and no tiebreak, the
    carried value would depend on shuffle placement (the same contract
    ``effectivity`` makes explicit with its tiebreak argument). Tiebreak
    columns must exist on the reports side: they are selected into the
    report slice of the union so they actually order the report rows
    (a tiebreak that is not a report column would otherwise either fail
    analysis or — worse, when daily happens to carry a same-named column —
    order NULLs and silently leave the tie unbroken).
    """
    tiebreaks = list(tiebreaks or [])
    missing = [c for c in tiebreaks if c not in reports.columns]
    if missing:
        raise ValueError(f"tiebreak columns not in reports: {missing}")
    d = daily.withColumn("__t", F.col(date_col)).withColumn("__is_report", F.lit(0))
    extra_ties = [c for c in tiebreaks if c not in value_cols and c != key]
    r = (reports.select(key, F.col(pub_col).alias("__t"),
                        *value_cols, *extra_ties)
                .withColumn("__is_report", F.lit(1)))
    unioned = d.unionByName(r, allowMissingColumns=True)
    # reports sort before daily rows at the same timestamp → effective same-day
    w = (Window.partitionBy(key)
               .orderBy(F.col("__t"), F.col("__is_report").desc(),
                        *tiebreaks)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = unioned
    for c in value_cols:
        filled = filled.withColumn(c, F.last(F.when(F.col("__is_report") == 1, F.col(c)),
                                             ignorenulls=True).over(w))
    # ordering-only tiebreak columns the daily side never had stay internal
    drop_ties = [c for c in extra_ties if c not in daily.columns]
    return (filled.where(F.col("__is_report") == 0)
            .drop("__t", "__is_report", *drop_ties))


def interval_flag_join(daily: DataFrame, intervals: DataFrame, key: str,
                       date_col: str, start_col: str, end_col: str,
                       flag_col: str = "in_interval") -> DataFrame:
    """daily row ∈ [start, end] → flag 1/0 (suspend-resume semantics, J8).

    Reference: per-row python dict scan (tasks/merge/tushare.py:190-221).
    """
    iv = intervals.select(F.col(key).alias("__k"),
                          F.col(start_col).alias("__s"),
                          F.col(end_col).alias("__e")).dropDuplicates()
    cond = ((daily[key] == F.col("__k"))
            & (daily[date_col] >= F.col("__s"))
            & (daily[date_col] <= F.col("__e")))
    # semi/anti instead of join+dedup: a left join fanned out on overlapping
    # intervals and the old dropDuplicates(daily.columns) full-width shuffle
    # silently collapsed *genuine* duplicate daily rows too. Semi/anti joins
    # never change the left side's multiplicity; each daily row lands on
    # exactly one branch. The two probes share the same scan + broadcast
    # (interval tables are dimension-sized), so the plan stays one pass.
    inside = daily.join(F.broadcast(iv), cond, "left_semi") \
                  .withColumn(flag_col, F.lit(1))
    outside = daily.join(F.broadcast(iv), cond, "left_anti") \
                   .withColumn(flag_col, F.lit(0))
    return inside.unionByName(outside)


def interval_flag_join_bucketed(daily: DataFrame, intervals: DataFrame,
                                key: str, date_col: str, start_col: str,
                                end_col: str, flag_col: str = "in_interval",
                                bucket: str = "month") -> DataFrame:
    """J8 at scale: interval membership when the interval table is TOO BIG
    to broadcast (both sides shuffle-sized).

    ``interval_flag_join`` broadcasts the intervals — right for the
    reference's dimension-sized suspend table (tasks/merge/tushare.py:190-221)
    but a non-starter when intervals number in the billions. This variant
    turns the inequality join into an *equi-join* by time bucketing:

    1. explode each interval onto the calendar buckets it overlaps
       (``sequence(trunc(start), trunc(end), 1 bucket)``) — fan-out is
       ceil(interval length / bucket), bounded and chosen by the caller;
    2. each daily row has exactly one bucket (``trunc(date)``);
    3. equi-join on (key, bucket) → shuffled hash join, co-partitioned, with
       the range predicate as a cheap post-filter inside matched buckets.

    Same semi/anti formulation as the broadcast variant, so daily-side
    multiplicity is preserved and genuine duplicate daily rows survive.
    Bucket granularity trades fan-out (long intervals × fine buckets) against
    join selectivity (coarse buckets match more non-overlapping pairs);
    ``month`` suits the reference's day-granularity suspend windows.
    """
    # F.trunc supports these units only — anything else (e.g. 'day')
    # returns NULL, the sequence() becomes NULL, explode drops every
    # interval row, and ALL daily rows would silently flag 0
    valid = ("week", "month", "quarter", "year")
    if bucket not in valid:
        raise ValueError(f"bucket must be one of {valid}, got {bucket!r} "
                         "(F.trunc returns NULL for other units, which "
                         "would silently flag every row 0)")
    one = F.expr(f"interval 1 {bucket}")
    iv = (intervals.select(F.col(key).alias("__k"),
                           F.col(start_col).alias("__s"),
                           F.col(end_col).alias("__e"))
          .dropDuplicates()
          .withColumn("__b", F.explode(F.sequence(
              F.trunc(F.col("__s"), bucket),
              F.trunc(F.col("__e"), bucket), one))))
    d = daily.withColumn("__b", F.trunc(F.col(date_col), bucket))
    cond = ((d[key] == iv["__k"]) & (d["__b"] == iv["__b"])
            & (d[date_col] >= iv["__s"]) & (d[date_col] <= iv["__e"]))
    inside = d.join(iv, cond, "left_semi").withColumn(flag_col, F.lit(1))
    outside = d.join(iv, cond, "left_anti").withColumn(flag_col, F.lit(0))
    return inside.unionByName(outside).drop("__b")


def expand_to_calendar(reports: DataFrame, key: str, pub_col: str,
                       horizon_days: int = 30,
                       tiebreak: list[str] | None = None) -> DataFrame:
    """Replicate each report row onto every date in [pub, next_pub) (W9).

    ``sequence()+explode`` — the reference loops trade-date slices in python
    (tasks/jqdata/stock/finance_report/__init__.py:456-565). ``horizon_days``
    caps open-ended/huge ranges so one stale report cannot explode a partition
    (at scale, join the exploded dates against the trading calendar instead of
    a blind cap). A report superseded the same day (next_pub == pub) expands
    to zero rows.
    """
    eff = effectivity(reports, key, pub_col, tiebreak=tiebreak)
    start = F.col(pub_col).cast("date")
    end = F.least(
        F.coalesce(F.date_add(F.col("pub_date_next").cast("date"), -1),
                   F.date_add(start, horizon_days - 1)),
        F.date_add(start, horizon_days - 1),
    )
    dates = F.when(end >= start, F.sequence(start, end)) \
             .otherwise(F.array().cast("array<date>"))
    return (eff.withColumn("as_of_date", F.explode(dates))
               .drop("pub_date_next"))
