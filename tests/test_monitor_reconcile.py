"""Streaming heart-beat listener + schema reconciliation."""

from data_integration_celery_spark import catalog, schemas
from data_integration_celery_spark.streaming.monitor import HeartbeatListener


def test_heartbeat_listener_captures_progress(spark, sf_dir, tmp_path):
    listener = HeartbeatListener()
    spark.streams.addListener(listener)
    try:
        ev = catalog.load(spark, "events", sf_dir).select("event_id", "ts", "value")
        src = str(tmp_path / "src")
        ev.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (stream.writeStream.format("memory").queryName("hb_test")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        import time
        time.sleep(2)  # listener events are delivered async
        kinds = {e["kind"] for e in listener.snapshot()}
        assert "started" in kinds and "progress" in kinds
        df = listener.to_df(spark)
        prog = df.where("kind = 'progress' and num_input_rows > 0")
        assert prog.count() >= 1
    finally:
        spark.streams.removeListener(listener)


def test_schema_reconcile(spark):
    a = spark.createDataFrame([(1, "x", 1.0)], "id int, name string, v double")
    b = spark.createDataFrame([(1, "x", 1)], "id int, NAME string, v int")
    diff = schemas.reconcile(a, b)
    assert diff["only_in_a"] == [] and diff["only_in_b"] == []
    assert diff["type_mismatch"] == ["v"]
    c = spark.createDataFrame([(1,)], "id int")
    diff2 = schemas.reconcile(a, c)
    assert diff2["only_in_a"] == ["name", "v"]


def test_heartbeat_listener_bounds_all_event_kinds():
    """started/terminated events must honor the ring bound too — a
    supervisor loop restarting a crashing query previously grew the list
    without limit because only onQueryProgress trimmed."""
    from types import SimpleNamespace

    lst = HeartbeatListener(max_events=10)
    for i in range(50):
        lst.onQueryStarted(SimpleNamespace(id=f"q{i}", name="n"))
        lst.onQueryTerminated(SimpleNamespace(id=f"q{i}"))
    snap = lst.snapshot()
    assert len(snap) == 10
    assert snap[-1] == {"kind": "terminated", "id": "q49"}
