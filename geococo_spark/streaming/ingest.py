"""Checkpointed incremental ingestion (Trigger.AvailableNow).

``run_available_now`` drains whatever image files have appeared under
``input_dir`` since the last run — the streaming checkpoint remembers
processed files, so a restart ingests only new ones (idempotent,
exactly-once per file) — and pushes each micro-batch through the batch
append pipeline via ``foreachBatch``. This is the scalable ingestion
front for the engine: at 100 TB the nightly/continuous drops land as
files, and resume-after-crash costs nothing re-processed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from geococo_spark import schemas


def stream_images(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(schemas.IMAGES)
        .option("maxFilesPerTrigger", 16)  # bounds per-batch decode memory
        .parquet(input_dir)
    )


def run_available_now(
    spark: SparkSession,
    input_dir: str,
    stream_checkpoint: str,
    batch_fn,
    timeout_sec: int = 600,
) -> None:
    """Drain all currently-available files through ``batch_fn(df, epoch)``.

    ``batch_fn`` receives each micro-batch as a plain DataFrame — the
    callers pass a closure that runs pipeline.append_dataset and appends
    the COCO outputs to parquet/Iceberg tables.
    """
    q = (
        stream_images(spark, input_dir)
        .writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", stream_checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError("availableNow drain did not finish in time")


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window aggregation for late event data —
    works on both a streaming and a batch events DataFrame (in batch the
    watermark is a no-op, so the same code serves the DuckDB-checked
    q_events_window)."""
    from pyspark.sql import functions as F

    if events.isStreaming:  # watermark is streaming-only in Spark 4
        # watermarks require TIMESTAMP (with tz); NTZ event times are cast
        # in the session TZ (UTC, session.py) so batch/stream agree
        if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
            events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, window).start.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )


def sessionized_events(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked SESSION-window aggregation (dynamic gap windows) —
    the streaming face of ``operators.events.sessionize``. Works on
    both a streaming and a batch events DataFrame; in batch the
    watermark is skipped and the output equals the batch operator's
    sessions on (user, start, end, n_events) — pinned by test against
    BOTH the batch sessionize and a streamed drain.

    Streaming semantics: state per (user, open session) only; a session
    finalizes (append mode emits it) once the watermark passes its end
    + gap. At 100 TB-scale event volumes this is the shape that holds:
    no global window, state bounded by concurrently-open sessions, late
    events inside the watermark merge into their session instead of
    fragmenting it.
    """
    from pyspark.sql import functions as F

    if events.isStreaming:
        if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
            # ADVICE r07: this ntz -> ltz cast interprets wall-clock
            # times in the SESSION timezone, so the documented
            # batch == stream equality requires session tz UTC (the
            # engine's get_spark pins spark.sql.session.timeZone=UTC;
            # pin it too when building sessions elsewhere) — under a
            # DST-shifting session tz, ambiguous/nonexistent local
            # times could shift or merge sessions vs the batch path.
            tz = events.sparkSession.conf.get("spark.sql.session.timeZone", "")
            if tz != "UTC":
                import warnings

                warnings.warn(
                    "sessionized_events: streaming ntz->timestamp cast uses "
                    f"session timeZone {tz!r}; batch==stream equality is only "
                    "guaranteed under UTC (see get_spark)",
                    stacklevel=2,
                )
            events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(user_col, F.session_window(ts_col, gap))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(user_col, "session_start", "session_end", "n_events")
    )
