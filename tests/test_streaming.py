"""Structured Streaming ingestion tests: AvailableNow drains exactly the
new files on each run (streaming checkpoint), feeding the batch pipeline."""

import pytest
from pyspark.sql import functions as F

from geococo_spark import schemas
from geococo_spark.sources import datagen
from geococo_spark.streaming import ingest


def write_images(spark, path, n, seed):
    df = spark.createDataFrame(datagen.make_image_rows(n, seed=seed), schemas.IMAGES)
    df = df.withColumn("image_id", F.concat(F.lit(f"s{seed}_"), F.col("image_id")))
    df.coalesce(1).write.mode("append").parquet(path)


class TestAvailableNowIngest:
    def test_incremental_exactly_once(self, spark, tmp_path):
        in_dir = str(tmp_path / "drop")
        ck = str(tmp_path / "stream_ck")
        out: list[list[str]] = []

        def batch_fn(df, epoch_id):
            out.append([r.image_id for r in df.select("image_id").collect()])

        write_images(spark, in_dir, 2, seed=1)
        ingest.run_available_now(spark, in_dir, ck, batch_fn)
        first = sorted(x for b in out for x in b)
        assert len(first) == 2

        # second drop: only NEW files are processed on the next drain
        out.clear()
        write_images(spark, in_dir, 3, seed=2)
        ingest.run_available_now(spark, in_dir, ck, batch_fn)
        second = sorted(x for b in out for x in b)
        assert len(second) == 3
        assert all(x.startswith("s2_") for x in second)

        # nothing new -> nothing processed
        out.clear()
        ingest.run_available_now(spark, in_dir, ck, batch_fn)
        assert sum(len(b) for b in out) == 0

    def test_streaming_pipeline_end_to_end(self, spark, tmp_path):
        # micro-batch -> full COCO pipeline -> parquet append
        from geococo_spark import pipeline
        from geococo_spark.coco import CocoState

        in_dir = str(tmp_path / "drop2")
        ck = str(tmp_path / "ck2")
        out_dir = str(tmp_path / "coco_out")
        labels = datagen.labels_df(spark)

        def batch_fn(df, epoch_id):
            if df.isEmpty():
                return
            state = CocoState.create(df.sparkSession)
            state = pipeline.append_dataset(
                df.sparkSession, state, df, labels, images_dir="d",
                id_attribute="category_id", name_attribute="class_names",
            )
            state.annotations.write.mode("append").parquet(out_dir)

        write_images(spark, in_dir, 1, seed=3)
        ingest.run_available_now(spark, in_dir, ck, batch_fn)
        anns = spark.read.parquet(out_dir)
        assert anns.count() == 5  # fixture labels -> 5 annotations


class TestWindowedCounts:
    def test_batch_and_stream_same_result(self, spark, tmp_path):
        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        batch = ingest.windowed_event_counts(events).orderBy("window_start", "event_type")
        rows_batch = [(str(r.window_start), r.event_type, r.n, r.value_cents) for r in batch.collect()]
        assert len(rows_batch) > 0

        # same query over a file stream, availableNow + memory sink
        stream = (
            spark.readStream.schema(events.schema)
            .parquet("/root/testdata/sf0.001")
        )
        # restrict to the events parquet only: re-write to a clean dir
        events.write.mode("overwrite").parquet(str(tmp_path / "ev"))
        stream = spark.readStream.schema(events.schema).parquet(str(tmp_path / "ev"))
        q = (
            ingest.windowed_event_counts(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("win_counts")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows_stream = [
            (str(r.window_start), r.event_type, r.n, r.value_cents)
            for r in spark.sql(
                "select * from win_counts order by window_start, event_type"
            ).collect()
        ]
        assert rows_stream == rows_batch


class TestStatefulDedup:
    def test_exactly_once_per_key_across_batches(self, spark, tmp_path):
        """dedup_stream emits each image_id once per stream LIFETIME:
        re-delivered rows in later drops are dropped by group state
        (applyInPandasWithState), surviving query restarts via the
        streaming checkpoint."""
        from geococo_spark.streaming import stateful

        in_dir = str(tmp_path / "drop")
        ck = str(tmp_path / "state_ck")
        sink = str(tmp_path / "sink")

        def drain():
            stream = ingest.stream_images(spark, in_dir)
            q = (
                stateful.dedup_stream(stream, "image_id")
                .select("image_id", "caption")
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
            return sorted(r.image_id for r in spark.read.parquet(sink).collect())

        # drop 1: ids img_0..img_2 (seed tag s1_)
        write_images(spark, in_dir, 3, seed=1)
        assert drain() == ["s1_img_000000000000", "s1_img_000000000001", "s1_img_000000000002"]

        # drop 2: re-deliver the SAME three ids + two genuinely new ones
        write_images(spark, in_dir, 3, seed=1)  # duplicates (same ids)
        write_images(spark, in_dir, 2, seed=3)
        got = drain()
        assert got == [
            "s1_img_000000000000", "s1_img_000000000001", "s1_img_000000000002",
            "s3_img_000000000000", "s3_img_000000000001",
        ], "duplicate keys leaked through the state store"

    def test_within_batch_duplicates_collapse(self, spark, tmp_path):
        from geococo_spark.streaming import stateful

        in_dir = str(tmp_path / "drop2")
        ck = str(tmp_path / "state_ck2")
        sink = str(tmp_path / "sink2")
        # the same ids written twice BEFORE the first drain: one batch,
        # duplicated keys inside it
        write_images(spark, in_dir, 2, seed=5)
        write_images(spark, in_dir, 2, seed=5)
        stream = ingest.stream_images(spark, in_dir)
        q = (
            stateful.dedup_stream(stream, "image_id")
            .select("image_id")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        rows = [r.image_id for r in spark.read.parquet(sink).collect()]
        assert sorted(rows) == ["s5_img_000000000000", "s5_img_000000000001"]
