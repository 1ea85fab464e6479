"""spark-submit entry point for STREAMING incremental annotation.

Usage::

    spark-submit --py-files geococo_spark.zip jobs/annotate_stream.py \
        --input-dir <drop dir of image parquet files> \
        --labels <parquet path or 'synthetic:N'> \
        --state-dir <durable dataset state dir> \
        [--stream-checkpoint <dir>] [--images-dir images]
        [--window 256x256] [--tile-sink DIR]

Each invocation drains every image file that appeared under
``--input-dir`` since the last run (Trigger.AvailableNow over the
streaming checkpoint) and appends it to the persistent COCO dataset
under ``--state-dir`` — sequential ids continue across runs and across
crashes (see geococo_spark/streaming/annotate.py for the exactly-once
commit protocol). Run it from cron for nightly drops or keep invoking
it for continuous ingestion.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", required=True)
    ap.add_argument("--labels", required=True)
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--stream-checkpoint", default=None)
    ap.add_argument("--images-dir", default="images")
    ap.add_argument("--window", default="256x256")
    ap.add_argument("--id-attribute", default="category_id")
    ap.add_argument("--name-attribute", default=None)
    ap.add_argument("--tile-sink", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from geococo_spark.checkpoint import EngineMetrics
    from geococo_spark.sources import datagen
    from geococo_spark.streaming.annotate import StreamingAnnotator

    spark = SparkSession.builder.appName("geococo-annotate-stream").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.labels.startswith("synthetic:"):
        labels = datagen.random_labels_df(spark, int(args.labels.split(":")[1]))
    else:
        labels = spark.read.parquet(args.labels)

    w, h = (int(x) for x in args.window.split("x"))
    metrics = EngineMetrics(spark)
    annotator = StreamingAnnotator(
        spark,
        labels,
        args.state_dir,
        images_dir=args.images_dir,
        window_bounds=[(w, h), (2 * w, 2 * h)],
        id_attribute=args.id_attribute,
        name_attribute=args.name_attribute,
        metrics=metrics,
        tile_sink_dir=args.tile_sink,
    )
    state = annotator.run_available_now(
        args.input_dir,
        args.stream_checkpoint or os.path.join(args.state_dir, "_stream_ck"),
    )
    print(
        json.dumps(
            {
                "metrics": metrics.snapshot(),
                "version": state.info["version"],
                "last_epoch": annotator.last_epoch,
                "counts": dict(state.cached_counts),
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1:])
