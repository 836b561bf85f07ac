"""Structured Streaming operators (SURVEY.md §2 G, streaming row).

The reference's only "stream" is a Redis drain loop
(/root/reference/internal/infra/crawl_job_client.go:95-174) — batch
rounds model it exactly (engine.py). These operators cover the genuine
streaming surface a crawl pipeline grows at scale: incremental metric
rollups over an event stream with watermarked event-time windows, and
an availableNow frontier drain that processes whatever is pending and
stops (the streaming twin of one engine round).

``availableNow`` + memory sink lets the driver contract treat a
finished stream as a DataFrame: the oracle pairs it with a plain
windowed GROUP BY, which is exactly what the stream must converge to
when no data is late.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_crawler_spark.tables import load

_MEM_SINK_SEQ = 0


def _read_events_stream(spark: SparkSession, sf_dir: str, schema) -> DataFrame:
    """File-stream the events table. The test layout stores one parquet
    FILE per table; a streaming file source needs a directory, so point
    it at the dir with a glob filter for just that table."""
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def _run_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming frame to completion (availableNow) into a memory
    sink and return the materialized result."""
    global _MEM_SINK_SEQ
    _MEM_SINK_SEQ += 1
    name = f"{query_name}_{_MEM_SINK_SEQ}"
    ckpt = tempfile.mkdtemp(prefix=f"gcs_stream_{name}_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name)


def q_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-hour tumbling-window counts per event_type over
    the events stream, driven to completion with availableNow.

    With a static source every row arrives before the watermark closes
    anything, so the converged result equals the batch windowed GROUP BY
    — which is the DuckDB oracle.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # window/epoch parity
    schema = load(spark, sf_dir, "events").schema
    stream = (
        _read_events_stream(spark, sf_dir, schema)
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → event-time
        .withWatermark("ts", "10 minutes")
        .groupBy(
            F.window("ts", "1 hour").alias("win"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    out = _run_to_memory(stream, "windowed_counts")
    return out.select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def q_stream_frontier_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow drain of a PENDING frontier: per-host dequeue counts.

    The streaming twin of the engine's per-round politeness aggregation
    (metrics F5): reads the events table as a stand-in pending stream,
    buckets by user (host analog), emits per-key totals.
    """
    schema = load(spark, sf_dir, "events").schema
    stream = (
        _read_events_stream(spark, sf_dir, schema)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pending"),
            F.round(F.max("value"), 2).alias("max_priority"),
        )
    )
    return _run_to_memory(stream, "frontier_drain")


def q_stream_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedupe via Spark's built-in stateful
    dropDuplicates (append mode): the streaming twin of the frontier's
    URL-seen distinct (D1/D2) using the engine's own state store —
    complements the custom applyInPandasWithState first-seen operator.
    Emits each (user_id, event_type) key once; with availableNow over
    the static table this converges to batch SELECT DISTINCT."""
    schema = load(spark, sf_dir, "events").schema
    stream = (
        _read_events_stream(spark, sf_dir, schema)
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )
    return _run_to_memory(stream, "stream_dedupe", output_mode="append")


def q_stream_stateful_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per
    (user_id, event_type) keep the first-ever event — the streaming twin
    of the frontier's URL-seen dedupe (D1), where state is the per-key
    seen marker that outlives micro-batches.

    Driven with availableNow over the static events table, so the
    converged result equals the batch GROUP BY min oracle.
    """
    import pandas as pd  # noqa: PLC0415

    schema = load(spark, sf_dir, "events").schema
    out_schema = (
        "user_id long, event_type string, first_event_id long, n_seen long"
    )
    state_schema = "first_event_id long, n_seen long"

    def first_seen(key, pdfs, state):
        first = None
        n = 0
        if state.exists:
            first, n = state.get
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            m = int(pdf["event_id"].min())
            first = m if first is None else min(first, m)
            n += len(pdf)
        state.update((first, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_type": [key[1]],
                "first_event_id": [first],
                "n_seen": [n],
            }
        )

    stream = (
        _read_events_stream(spark, sf_dir, schema)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            first_seen,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
    global _MEM_SINK_SEQ
    _MEM_SINK_SEQ += 1
    name = f"stateful_first_seen_{_MEM_SINK_SEQ}"
    ckpt = tempfile.mkdtemp(prefix=f"gcs_stream_{name}_")
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink appends one row per key per micro-batch; if
    # availableNow ever splits the input (multiple fixture files /
    # maxFilesPerTrigger), a key touched in two batches yields two rows.
    # Collapse to the LAST update per key: n_seen is monotone increasing
    # and first_event_id monotone non-increasing across updates, so
    # (min(first_event_id), max(n_seen)) IS the final state.
    return (
        spark.table(name)
        .groupBy("user_id", "event_type")
        .agg(
            F.min("first_event_id").alias("first_event_id"),
            F.max("n_seen").alias("n_seen"),
        )
    )
