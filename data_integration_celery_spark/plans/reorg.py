"""The reference's derived-analytics job family (E3) as a DAG.

Reference: ``data_reorg_daily`` chains per-type continuous-contract rebuilds
then the factor/adjusted exports (tasks/wind/future_reorg/reorg_md_2_db.py:
405-408 drives the loop; tasks/wind/__init__.py:33-66 chains the jobs).
Celery chain → Pipeline dependency edges; the fan-out of consumers after the
stored selection → one wave of concurrent jobs.

This is the materialized-intermediate shape end to end: the stateful
selection (the only FlatMapGroupsInPandas in the whole DAG) runs in job 1
and is published once, partitioned per instrument_type; every consumer wave
reads it back as a plain parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .dag import Job, Pipeline


def continuous_reorg_pipeline(sf_dir: str, workdir: str) -> Pipeline:
    """Build the E3 DAG: materialize selection → {main/sec join, division-
    and diff-adjusted series} concurrently."""

    sel_path = os.path.join(workdir, "continuous_selection")

    def _cd(spark: SparkSession):
        from .. import catalog
        from ..operators import continuous
        return continuous.contract_daily(
            catalog.load(spark, "lineitem", sf_dir),
            catalog.load(spark, "part", sf_dir))

    def materialize(spark: SparkSession):
        from .. import pipelines
        pipelines.materialize_continuous_selection(spark, _cd(spark), sel_path)

    def _consumer(name: str):
        def run(spark: SparkSession):
            from .. import pipelines
            sel = spark.read.parquet(sel_path)
            out = pipelines.continuous_analytics_from(sel, _cd(spark))[name]
            out.write.mode("overwrite").parquet(os.path.join(workdir, name))
        return run

    return Pipeline([
        Job("materialize_selection", materialize),
        Job("main_sec", _consumer("main_sec"),
            depends_on=["materialize_selection"]),
        Job("adjusted_division", _consumer("adjusted_division"),
            depends_on=["materialize_selection"]),
        Job("adjusted_diff", _consumer("adjusted_diff"),
            depends_on=["materialize_selection"]),
    ])
