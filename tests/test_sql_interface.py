"""Spark SQL interface parity: the engine's tables are plain views, so ANSI
SQL (the portable subset of our oracle strings) runs directly on Spark and
must match the DataFrame implementations row for row."""

from data_integration_celery_spark import catalog
from data_integration_celery_spark.queries import QUERIES

# oracles that are ANSI enough for both DuckDB and Spark SQL
PORTABLE = [
    "s1_filtered_scan",
    "p4_inlist_semijoin",
    "a1_watermark_per_key",
    "a2_agg_rollup",
    "j1_vendor_merge_full_outer",
    "j11_argmax_latest_per_key",
    "s6_upsert_last_write_wins",
    "w1_rank_returns",
    "w2_lead_lag_gaps",
    "w5_rolling_mean",
    "u1_union_distinct",
    "a9_describe",
    "pipeline_region_revenue",
    "u4_scd2_intervals",
    "a13_sessionize",
    "pipeline_sector_median",
    "pipeline_worst_window_return",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_portable_oracles_run_on_spark_sql(spark, sf_dir):
    catalog.register_views(spark, sf_dir)
    for name in PORTABLE:
        q = QUERIES[name]
        via_sql = spark.sql(q.sql)
        via_df = q.spark(spark, sf_dir)
        assert _canon(via_sql) == _canon(via_df), name
