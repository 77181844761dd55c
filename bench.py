"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is forced end-to-end with a
noop write (full computation, no driver collect bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_integration_celery_spark.queries import QUERIES  # noqa: E402
from data_integration_celery_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    # warm the JVM + parquet footers so per-query numbers measure the engine
    QUERIES["a1_watermark_per_key"].spark(spark, SF_DIR).count()

    times: dict[str, float] = {}
    for name, qry in QUERIES.items():
        t0 = time.time()
        df = qry.spark(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)

    print(json.dumps({
        "metric": "operator_suite_wall_clock",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "n_queries": len(times),
        "sec_per_query": round(sum(times.values()) / len(times), 3),
        "queries": times,
        "sf": sf_val,
    }))


if __name__ == "__main__":
    main()
