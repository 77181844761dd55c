"""Upsert semantics — mirrors the reference's golden test
``_test_bunch_insert_sqlite`` (/root/reference tasks/utils/to_sqlite.py:650-687):
insert N rows, upsert an overlapping batch, assert final values per PK."""

from data_integration_celery_spark.operators import upsert


def _df(spark, rows):
    return spark.createDataFrame(rows, "code string, d int, v double")


def test_last_write_wins(spark):
    base = _df(spark, [("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 3.0)])
    updates = _df(spark, [("a", 2, 20.0), ("c", 1, 30.0)])
    out = upsert.upsert_frames(base, updates, keys=["code", "d"])
    got = {(r["code"], r["d"]): r["v"] for r in out.collect()}
    assert got == {("a", 1): 1.0, ("a", 2): 20.0, ("b", 1): 3.0, ("c", 1): 30.0}


def test_upsert_idempotent(spark):
    base = _df(spark, [("a", 1, 1.0)])
    updates = _df(spark, [("a", 1, 9.0)])
    once = upsert.upsert_frames(base, updates, keys=["code", "d"])
    twice = upsert.upsert_frames(once, updates, keys=["code", "d"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_write_upsert_roundtrip(spark, tmp_path):
    path = str(tmp_path / "target")
    upsert.write_upsert(spark, _df(spark, [("a", 1, 1.0), ("b", 1, 2.0)]),
                        path, keys=["code", "d"])
    upsert.write_upsert(spark, _df(spark, [("a", 1, 5.0)]), path, keys=["code", "d"])
    got = {(r["code"], r["d"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {("a", 1): 5.0, ("b", 1): 2.0}


def test_dedup_last(spark):
    df = _df(spark, [("a", 1, 1.0), ("a", 1, 2.0), ("a", 2, 3.0)])
    out = upsert.dedup_last(df, keys=["code", "d"], order_cols=["v"])
    got = {(r["code"], r["d"]): r["v"] for r in out.collect()}
    assert got == {("a", 1): 2.0, ("a", 2): 3.0}
