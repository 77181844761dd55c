"""Spark local[32] vs single-node DuckDB at ~sf1 (the 10x replica).

COMPARE.md's sf0.1 table shows DuckDB winning most sub-second queries on
fixed overhead. The claim that matters for this repo is the asymptotic one:
as data grows, the Spark plans hold and the single-node engine falls off.
This tool runs a family-representative subset of the oracle-matched queries
at the `tools/scaling_exponents.py` replica scale (~6M lineitem / 50k docs)
with a per-query DuckDB wall cap (interrupt from a watchdog thread) and
emits a markdown section for COMPARE.md.

Usage: python tools/compare_at_scale.py [scaled_dir] [cap_seconds]
"""

from __future__ import annotations

import sys
import threading
import time

import duckdb

sys.path.insert(0, "/root/repo")

SCALED = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled_sf1_x10"
CAP = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# family-representative picks: scans, multi-source merge, contract
# selection, bars, rank, calendar expansion, streaming twin, the dedup
# suite's heavy hitters, components, composites, sampling
SUBSET = [
    "s1_filtered_scan", "j2_three_source_merge", "j14_main_sec_join",
    "a3_tick_to_bars", "w1b_rank_scalable", "w9_expand_calendar",
    "stream_bars_1min", "dedup_ngram_jaccard", "dedup_minhash_md5",
    "dedup_simhash_hamming_md5", "dedup_span_removal",
    "dedup_components_star", "pipeline_cluster_survivors",
    "pipeline_region_revenue", "smp_epoch_shuffle",
    "pipeline_sector_median", "pipeline_worst_window_return",
]


def run_duck_capped(con, sql: str, cap: float) -> float | None:
    """Seconds, or None if the watchdog interrupted at the cap."""
    done = threading.Event()

    def watchdog():
        if not done.wait(cap):
            con.interrupt()

    t = threading.Thread(target=watchdog, daemon=True)
    t0 = time.time()
    t.start()
    try:
        con.execute(sql).fetchall()
        return time.time() - t0
    except duckdb.InterruptException:
        return None
    finally:
        done.set()


def main() -> None:
    from data_integration_celery_spark.queries import QUERIES
    from data_integration_celery_spark.session import get_spark

    spark = get_spark("compare-scale")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SCALED}/{t}.parquet')")
    QUERIES["s1_filtered_scan"].spark(spark, SCALED).count()  # warm JVM

    rows = []
    for name in SUBSET:
        q = QUERIES[name]
        t_spark = float("inf")  # min of 2: long sessions accumulate GC/
        for _ in range(2):      # memory pressure that single shots inherit
            t0 = time.time()
            q.spark(spark, SCALED).write.format("noop") \
                .mode("overwrite").save()
            t_spark = min(t_spark, time.time() - t0)
        t_duck = run_duck_capped(con, q.sql, CAP)
        rows.append((name, t_spark, t_duck))
        duck = f"{t_duck:.2f}" if t_duck is not None else f">{CAP:.0f} (killed)"
        print(f"{name}: spark {t_spark:.2f}s duckdb {duck}s",
              file=sys.stderr)

    print(f"\n## At ~sf1 (10x replica, {SCALED}) — Spark local[32] vs "
          f"single-node DuckDB, {CAP:.0f}s cap\n")
    print("| query | spark s | duckdb s | spark/duckdb |")
    print("|---|---|---|---|")
    n_spark_wins = 0
    for name, ts, td in rows:
        if td is None:
            print(f"| {name} | {ts:.2f} | >{CAP:.0f} (killed) | <"
                  f"{ts / CAP:.2f}x |")
            n_spark_wins += 1
        else:
            print(f"| {name} | {ts:.2f} | {td:.2f} | {ts / td:.2f}x |")
            n_spark_wins += ts < td
    total_s = sum(ts for _, ts, _ in rows)
    total_d = sum(td if td is not None else CAP for _, _, td in rows)
    print(f"\nSpark suite {total_s:.1f}s vs DuckDB >= {total_d:.1f}s "
          f"(capped); Spark faster on {n_spark_wins}/{len(rows)}.")


if __name__ == "__main__":
    main()
