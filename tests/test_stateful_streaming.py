"""applyInPandasWithState: per-key state must accumulate across micro-batches
and converge to the batch aggregate."""

from pyspark.sql import functions as F

from data_integration_celery_spark import catalog
from data_integration_celery_spark.streaming import jobs


def test_running_stats_converge_to_batch(spark, sf_dir, tmp_path):
    ev = catalog.load(spark, "events", sf_dir).select("user_id", "ts", "value")
    src = str(tmp_path / "src")
    # several files → several micro-batches with maxFilesPerTrigger=1
    ev.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = jobs.stream_running_stats(stream, "user_id", "value")
    q = (out.writeStream.format("memory").queryName("running_stats")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)

    # last emitted row per key == full batch aggregate
    emitted = spark.sql("""
        select user_id, max(n) as n, max_by(total, n) as total
        from running_stats group by user_id""")
    batch = ev.groupBy("user_id").agg(
        F.count("value").alias("bn"),
        F.sum("value").alias("btotal"))
    j = emitted.join(batch, "user_id")
    assert j.where(F.col("n") != F.col("bn")).count() == 0
    mism = j.where(F.abs(F.col("total") - F.col("btotal")) > 1e-6).count()
    assert mism == 0
    # statefulness: with >1 micro-batch some keys must have intermediate rows
    multi = spark.sql("""
        select user_id, count(*) c from running_stats
        group by user_id having c > 1""").count()
    assert multi > 0
