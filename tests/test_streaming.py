"""Structured-Streaming operators: watermarked windowed aggregation
equals its batch replay; stateful view counts accumulate across
separate availableNow runs (state survives via the checkpoint)."""

from pyspark.sql import functions as F

from mantic_sh_spark.streaming.windowed import user_view_counts, windowed_event_counts

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _events(spark, n, base_day=1):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.to_timestamp(
            F.concat(F.lit("2024-01-"), F.lpad((base_day + F.col("id") % 3).cast("string"), 2, "0"),
                     F.lit(" 12:"), F.lpad((F.col("id") % 60).cast("string"), 2, "0"), F.lit(":00"))
        ).alias("ts"),
        (F.col("id") % 7).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 4).cast("string")).alias("event_type"),
        (F.col("id") * 1.5).alias("value"),
    )


def test_windowed_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    batch = _events(spark, 240)
    batch.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    agg = windowed_event_counts(stream, window="1 day", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (str(r.win_start), r.event_type): (r.cnt, round(r.sum_value, 4))
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (str(r.win_start), r.event_type): (r.cnt, round(r.sum_value, 4))
        for r in (
            batch.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("win_start"), "event_type", "cnt", "sum_value")
            .collect()
        )
    }
    assert got == want and len(got) > 0


def test_stateful_view_counts_survive_restart(spark, tmp_path):
    src = str(tmp_path / "stream_src2")
    ckpt = str(tmp_path / "ckpt2")

    latest: dict[int, int] = {}

    def run_once():
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)

        def sink(df, _bid):
            for r in df.collect():
                latest[r.user_id] = r.view_count

        q = (
            user_view_counts(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _events(spark, 70).write.mode("overwrite").parquet(src)
    run_once()
    # second tranche lands as NEW files; a fresh availableNow run against
    # the same checkpoint must resume state, not recount from zero
    _events(spark, 50).write.mode("append").parquet(src)
    run_once()

    want = {r.user_id: r.cnt for r in
            spark.read.parquet(src).groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert latest == want
