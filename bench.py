"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is forced end-to-end with a
noop write (full computation, no driver collect bottleneck).

Each query runs $SPARK_GRAFT_BENCH_REPEATS times (default 3, round-robin so
repeats of one query never run back-to-back); "queries" holds per-query
MEDIANS — single-shot numbers at this scale carry a ±20% machine-noise band
that masked real regressions in earlier rounds. "queries_cold" keeps the
first-round times: session-level intermediates (the shared continuous-
contract selection) are built during round 1 and amortized afterwards, which
is the designed pipeline behavior — cold shows the build cost, the median
shows steady state.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_integration_celery_spark.queries import QUERIES  # noqa: E402
from data_integration_celery_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))


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

    rounds: list[dict[str, float]] = []
    for _ in range(REPEATS):
        times: dict[str, float] = {}
        for name, qry in QUERIES.items():
            t0 = time.time()
            df = qry.spark(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
        rounds.append(times)

    med = {name: round(statistics.median(r[name] for r in rounds), 3)
           for name in rounds[0]}
    print(json.dumps({
        "metric": "operator_suite_wall_clock",
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "n_queries": len(med),
        "n_repeats": REPEATS,
        "sec_per_query": round(sum(med.values()) / len(med), 3),
        "queries": med,
        "queries_cold": rounds[0],
        "value_cold": round(sum(rounds[0].values()), 3),
        "sf": sf_val,
    }))


if __name__ == "__main__":
    main()
