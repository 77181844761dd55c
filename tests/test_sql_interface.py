"""Spark SQL interface parity: the engine's tables are plain views, so ANSI
SQL (the portable subset of our oracle strings) runs directly on Spark and
must match the DataFrame implementations row for row.

Coverage is mechanical, not hand-listed: EVERY registered oracle is tried
on Spark SQL; any that parses and runs must match the DataFrame result
exactly. Oracles written in DuckDB dialect (list lambdas, string_split_regex,
struct literals, `//` division, recursive CTEs, information_schema) are
expected to fail Spark's parser/analyzer and are skipped — but a core list
that is known-portable must never silently drop out, and the portable count
has a floor so dialect drift gets caught.
"""

import pytest

from data_integration_celery_spark import catalog
from data_integration_celery_spark.queries import QUERIES

# known-portable core: if any of these stops running on Spark SQL, that is
# a regression in the oracle text, not acceptable drift (the full set that
# passed the mechanical sweep when this was last updated — 46 oracles;
# round 6 added f3/j6 by making their regexes escape-free — Spark SQL
# string literals eat lone backslashes, so '\d' silently became 'd' —
# and smp_hash_split/smp_mixture_resample via CAST(... AS STRING), the
# same VARCHAR-without-length fix as the r5 e2 oracle; round 7 added
# a11 by renaming the reserved output column 'column' -> 'metric' and
# the two components queries by spelling integer division as
# CAST(floor(a / b) AS BIGINT) — `//` is DuckDB-only, and float division
# is exact here because rn < 2^26; round 8 added a14b_sketch_errorband,
# whose boolean-verdict oracle is plain ANSI aggregation — 47; round 9
# added the three ACID/z-order oracles (s6b_acid_merge, s6c_cdc_feed,
# s10b_zorder_skipping — plain ANSI: unions, windows, literal-TRUE
# verdicts, scalar subqueries; s10c_bloom_point_lookup joined the same
# family in-session) — 51 total; the
# recursive-CTE oracles (pack/bpe) remain DuckDB-only by their list
# functions (string_split_regex/list_position), not by the recursion;
# round 11 added p3 (regexp_matches -> the dual-parse
# regexp_extract(...,0) <> '' idiom), w9 (unnest(range()) -> a recursive
# offset spine + direct date comparison, avoiding date-date which is an
# INTERVAL on Spark), and the new s6g_dv_coalesce / s6h_stream_source /
# s6i_stream_cdc (plain ANSI verdict oracles, portable on arrival) — 58;
# round 12 added s6j_cdc_cow_merge and s6k_dv_compact (plain ANSI:
# unions, joins, scalar subqueries, literal-TRUE verdicts — portable on
# arrival) — 60
PORTABLE_CORE = [
    "a11_accumulation_detect",
    "a14b_sketch_errorband",
    "a13_sessionize", "a1_watermark_per_key", "a2_agg_rollup",
    "dedup_components", "dedup_components_star",
    "a7_two_level_agg", "a8_median_cross_section", "a9_describe",
    "eav_unpivot_pivot", "f3_cleaning_exprs", "f4_snapshot_audit",
    "f5_rename_ladder",
    "j10_asof_point_lookup", "j11_argmax_latest_per_key",
    "j13_incremental_ranges", "j1_vendor_merge_full_outer",
    "j2_three_source_merge", "j5_anti_join_new_codes",
    "j6_code_mapping_maintenance",
    "j7_code_extract_join", "j8_interval_join",
    "j8b_interval_join_bucketed", "o3_topk_worst", "p4_inlist_semijoin",
    "pipeline_e2_merge_daily", "pipeline_region_revenue",
    "pipeline_revenue_topk", "pipeline_sector_median",
    "pipeline_worst_window_return", "s1_filtered_scan",
    "p3_regex_filter", "w9_expand_calendar",
    "s6_upsert_last_write_wins", "s6b_acid_merge", "s6c_cdc_feed",
    "s6e_deletion_vectors", "s6f_dv_update", "s6g_dv_coalesce",
    "s6h_stream_source", "s6i_stream_cdc", "s6j_cdc_cow_merge",
    "s6k_dv_compact",
    "s10b_zorder_skipping", "s10c_bloom_point_lookup", "smp_hash_split",
    "smp_mixture_resample", "smp_source_quota", "u1_union_distinct",
    "u4_scd2_intervals", "w10_monthly_sample", "w12_pivot_status",
    "w1_rank_returns", "w1b_rank_scalable", "w2_lead_lag_gaps",
    "w3_cum_chain", "w5_rolling_mean", "w6_argmax_cross_section",
    "w8_quarterize", "w8b_quarterize_exact",
]

MIN_PORTABLE = 60


def _canon(df):
    # midnight timestamps normalize to their date: Spark's date_trunc
    # returns TIMESTAMP where DuckDB (and our DataFrame side) use DATE —
    # a representation difference, not a value difference
    def s(v):
        out = str(v)
        return out[:-9] if out.endswith(" 00:00:00") else out
    cols = sorted(df.columns)
    return sorted(tuple(s(r[c]) for c in cols) for r in df.collect())


# DuckDB-only constructs that Spark either rejects or — worse —
# MISPARSES silently (regexp_replace's 'g' flag binds to Spark's integer
# position argument and explodes at runtime): skip these before parsing.
_DUCKDB_ONLY = [
    ", 'g')",            # regexp flags arg
    "string_split", "list_transform", "list_distinct", "unnest(",
    "string_agg", "strpos(", "array_to_string", "regexp_matches",
    " // ", "::", "information_schema", "{'",
    # NOTE: "RECURSIVE" left OFF this list since r10 — Spark 4.1 parses and
    # runs WITH RECURSIVE, which made w8b_quarterize_exact portable (the
    # other recursive oracles stay skipped via their list-function markers)
]


def _try_spark_sql(spark, sql):
    """Spark DataFrame for the oracle text, or None if it is DuckDB-only
    dialect (marker scan, then parse/analysis). Runtime errors on text that
    passes both gates propagate — a portable oracle that starts failing at
    runtime is a bug, not dialect."""
    from pyspark.errors import AnalysisException, ParseException
    if any(m in sql for m in _DUCKDB_ONLY):
        return None
    try:
        df = spark.sql(sql)
        df.schema  # force analysis
        return df
    except (AnalysisException, ParseException):
        return None


def test_all_portable_oracles_match_dataframes_on_spark_sql(spark, sf_dir):
    catalog.register_views(spark, sf_dir)
    portable, skipped, mismatched = [], [], []
    for name, q in QUERIES.items():
        if q.sql is None:
            continue
        via_sql = _try_spark_sql(spark, q.sql)
        if via_sql is None:
            skipped.append(name)
            continue
        portable.append(name)
        if _canon(via_sql) != _canon(q.spark(spark, sf_dir)):
            mismatched.append(name)
    assert not mismatched, f"SQL != DataFrame for {mismatched}"
    missing_core = [n for n in PORTABLE_CORE if n not in portable]
    assert not missing_core, \
        f"known-portable oracles no longer run on Spark SQL: {missing_core}"
    assert len(portable) >= MIN_PORTABLE, \
        (f"portable oracle count dropped to {len(portable)}: "
         f"{sorted(portable)}")
