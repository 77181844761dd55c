"""Continuous-contract selection rules — property tests mirroring the
reference's `_test_get_main_sec_contract_iter` semantics
(continuse_contract_md.py:433-446): monotonic never-retreat, switch-day
factor = ratio of closes on the prior date, secondary strictly later."""

import datetime as dt

from pyspark.sql import functions as F

from data_integration_celery_spark.operators import continuous


def _cd(spark, rows):
    return spark.createDataFrame(
        rows, "instrument_type string, trade_date timestamp, contract long, "
              "vol double, close double")


def _ts(d):
    return dt.datetime(2020, 1, d)


def test_switch_and_ratio(spark):
    rows = [
        # day 1: contract 1 dominates
        ("RB", _ts(1), 1, 100.0, 10.0), ("RB", _ts(1), 2, 50.0, 20.0),
        # day 2: contract 2 overtakes → switch on day 2, ratio from day-1 closes
        ("RB", _ts(2), 1, 40.0, 11.0), ("RB", _ts(2), 2, 90.0, 21.0),
        # day 3: contract 1 has more volume again — but main must not retreat
        ("RB", _ts(3), 1, 95.0, 12.0), ("RB", _ts(3), 2, 80.0, 22.0),
    ]
    out = {r["trade_date"].day: r
           for r in continuous.select_contracts(_cd(spark, rows)).collect()}
    assert [out[d]["main_contract"] for d in (1, 2, 3)] == [1, 2, 2]
    assert [out[d]["switch_flag"] for d in (1, 2, 3)] == [0, 1, 0]
    # ratio computed on day 1 (the day before the switch): close2/close1 = 20/10
    assert out[2]["adj_ratio"] == 2.0
    assert out[3]["adj_ratio"] is None
    # secondary must be strictly later than main
    assert out[1]["sec_contract"] == 2
    assert out[2]["sec_contract"] is None


def test_main_close_ffill_when_main_absent(spark):
    rows = [
        ("RB", _ts(1), 3, 100.0, 30.0), ("RB", _ts(1), 2, 60.0, 20.0),
        # day 2: main (3) did not trade → close forward-filled from day 1
        ("RB", _ts(2), 2, 70.0, 21.0),
    ]
    out = {r["trade_date"].day: r
           for r in continuous.select_contracts(_cd(spark, rows)).collect()}
    assert out[1]["main_contract"] == 3 and out[1]["main_close"] == 30.0
    assert out[2]["main_contract"] == 3 and out[2]["main_close"] == 30.0


def test_adj_factor_chain_telescopes(spark):
    rows = [
        ("RB", _ts(1), 1, 100.0, 10.0), ("RB", _ts(1), 2, 50.0, 20.0),
        ("RB", _ts(2), 2, 90.0, 21.0),
        ("RB", _ts(3), 2, 80.0, 22.0),
    ]
    sel = continuous.select_contracts(_cd(spark, rows))
    out = {r["trade_date"].day: r
           for r in continuous.adj_factor_chain(sel).collect()}
    # latest date unadjusted (factor 1); factor applies strictly before switch
    assert out[3]["adj_factor"] == 1.0
    assert out[2]["adj_factor"] == 1.0  # switch day itself uses the new contract
    assert abs(out[1]["adj_factor"] - 2.0) < 1e-9  # pre-switch scaled by ratio


def test_types_independent(spark):
    rows = [("RB", _ts(1), 1, 100.0, 10.0), ("CU", _ts(1), 9, 5.0, 1.0)]
    out = continuous.select_contracts(_cd(spark, rows)).collect()
    got = {r["instrument_type"]: r["main_contract"] for r in out}
    assert got == {"RB": 1, "CU": 9}


def test_switch_by_open_interest(spark):
    rows = [
        # volume says contract 2, open interest says contract 1
        ("RB", _ts(1), 1, 10.0, 10.0, 500.0), ("RB", _ts(1), 2, 90.0, 20.0, 50.0),
    ]
    cd = spark.createDataFrame(
        rows, "instrument_type string, trade_date timestamp, contract long, "
              "vol double, close double, oi double")
    by_vol = continuous.select_contracts(cd).collect()[0]
    by_oi = continuous.select_contracts(cd, switch_by="oi").collect()[0]
    assert by_vol["main_contract"] == 2
    assert by_oi["main_contract"] == 1


def test_smoothing_suppresses_one_day_spike(spark):
    rows = []
    for d in range(1, 6):
        rows.append(("RB", _ts(d), 1, 100.0, 10.0))
        # contract 2 spikes only on day 3
        rows.append(("RB", _ts(d), 2, 250.0 if d == 3 else 10.0, 20.0))
    cd = _cd(spark, rows)
    raw = {r["trade_date"].day: r["main_contract"]
           for r in continuous.select_contracts(cd).collect()}
    smooth = {r["trade_date"].day: r["main_contract"]
              for r in continuous.select_contracts(cd, smooth_days=2).collect()}
    assert raw[3] == 2          # spike flips the raw selection (and sticks)
    assert smooth[3] == 1       # 3-day mean (10+10+250)/3 = 90 < 100 → no switch
    assert smooth[5] == 1


def test_adj_factor_chain_diff_method(spark):
    """Additive chain (reversion_rights_factor.py diff branch): per-switch
    delta = close_new - close_old on the prior date; reverse cumsum with
    neutral 0; adjusted price = close + factor."""
    rows = [
        ("RB", _ts(1), 1, 100.0, 10.0), ("RB", _ts(1), 2, 50.0, 20.0),
        ("RB", _ts(2), 2, 90.0, 21.0),
        ("RB", _ts(3), 2, 80.0, 22.0),
    ]
    sel = continuous.select_contracts(_cd(spark, rows))
    chained = continuous.adj_factor_chain(sel, method="diff")
    out = {r["trade_date"].day: r
           for r in continuous.adjusted_md(chained, method="diff").collect()}
    assert out[3]["adj_factor"] == 0.0
    assert out[2]["adj_factor"] == 0.0      # switch day uses the new contract
    # delta on day-1 close pair: 20 - 10 = +10 applies strictly before switch
    assert abs(out[1]["adj_factor"] - 10.0) < 1e-9
    assert abs(out[1]["adj_close"] - 20.0) < 1e-9   # 10 + 10
    assert abs(out[3]["adj_close"] - 22.0) < 1e-9   # latest unadjusted


def test_materialized_selection_pipeline(spark, tmp_path):
    """The reference's reorg DAG stores the selection and every consumer
    reads it back (reorg_md_2_db.py:130-193). Spark form: exactly ONE
    FlatMapGroupsInPandas across the whole derived-analytics DAG — the
    materialization job — and zero in any consumer plan; consumer results
    match the standalone (recomputing) registry queries."""
    from data_integration_celery_spark import catalog, pipelines
    from data_integration_celery_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    cd = continuous.contract_daily(catalog.load(spark, "lineitem", sf),
                                   catalog.load(spark, "part", sf))
    path = str(tmp_path / "continuous_selection")
    sel = pipelines.materialize_continuous_selection(spark, cd, path)
    # per-type partition layout (reference's per-type refresh unit)
    assert any(p.name.startswith("instrument_type=")
               for p in (tmp_path / "continuous_selection").iterdir())

    derived = pipelines.continuous_analytics_from(sel, cd)
    for name, df in derived.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" not in plan, name

    def key_rows(df, cols):
        return sorted((tuple(r[c] for c in cols) for r in df.collect()))

    j14_cols = ["instrument_type", "trade_date", "main_contract",
                "main_close", "sec_contract", "sec_close"]
    assert key_rows(derived["main_sec"], j14_cols) == \
        key_rows(QUERIES["j14_main_sec_join"].spark(spark, sf), j14_cols)
    w11_cols = ["instrument_type", "trade_date", "main_contract",
                "main_close", "adj_factor", "adj_close"]
    assert key_rows(derived["adjusted_diff"].select(*w11_cols), w11_cols) == \
        key_rows(QUERIES["w11b_adjusted_diff"].spark(spark, sf), w11_cols)


def test_shared_selection_is_reused_across_queries(spark):
    """w7/j14/w11/w11b share one persisted selection per (session, sf_dir):
    after w7 runs, j14's plan reads the in-memory relation instead of
    re-running the applyInPandas walk."""
    from data_integration_celery_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    QUERIES["w7_continuous_contract"].spark(spark, sf).count()  # warm
    plan = (QUERIES["j14_main_sec_join"].spark(spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "InMemoryTableScan" in plan
