"""Per-round benchmark harness (driver contract).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line::

    {"metric": "coco_pipeline_images_per_sec", "value": N, "unit":
     "images/sec", "queries": {...per-query seconds...}, "sf": ...}

The primary metric matches BASELINE.json: tile-assignment +
COCO-annotation throughput (images/sec) of the flagship pipeline on a
synthetic image+caption table (deterministic datagen, no external
data). Relational/text/similarity headline queries are timed in
seconds each. Scaling (local[8] vs local[32]) is measured separately by
tools/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _build_spark(cpus: int):
    from geococo_spark.session import get_spark

    return get_spark(
        app_name="geococo-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )


def bench_pipeline(
    spark, n_images: int, stage_dir: str | None = None, rep: int = 0
) -> tuple[float, dict]:
    """Flagship workload: n_images synthetic 256x256x3 rasters + 2000
    random labels -> full append pipeline; returns (seconds, counters).

    Inputs are staged as parquet first (untimed) — the engine's real
    input is a table scan, not a driver-resident local relation. Tile
    payload bytes are sunk in-stage (the production mode — matches the
    reference, which writes each tile JPEG inside its loop)."""
    import shutil
    import tempfile

    from geococo_spark import pipeline
    from geococo_spark.coco import CocoState
    from geococo_spark.sources import datagen

    stage_dir = stage_dir or tempfile.mkdtemp(prefix="geococo_bench_")
    images = datagen.stage_images_parquet(
        spark, f"{stage_dir}/images_{n_images}", n_images, files=max(8, n_images // 8)
    )
    labels_path = f"{stage_dir}/labels"
    import os

    if not os.path.exists(os.path.join(labels_path, "_SUCCESS")):
        datagen.random_labels_df(spark, 2000, extent=1000.0, seed=9).repartition(8).write.mode("overwrite").parquet(labels_path)
    labels = spark.read.parquet(labels_path)
    state = CocoState.create(spark, description="bench", contributor="bench")
    tile_sink = f"{stage_dir}/tilesink_{n_images}_r{rep}"
    shutil.rmtree(tile_sink, ignore_errors=True)
    t0 = time.perf_counter()
    state = pipeline.append_dataset(
        spark,
        state,
        images,
        labels,
        images_dir="bench_images",
        window_bounds=[(128, 128), (256, 256)],
        id_attribute="category_id",
        name_attribute="class_names",
        tile_sink_dir=tile_sink,
    )
    n_tiles = state.images.count()
    n_anns = state.annotations.count()
    dt = time.perf_counter() - t0
    return dt, {"tiles": n_tiles, "annotations": n_anns, "images": n_images}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # 128 images ≈ 250k annotations: large enough that steady-state
    # throughput (not session fixed costs) dominates the headline metric
    n_images = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "128"))
    spark = _build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    headline = [
        "q_spatial_join_bbox",
        "q_cell_join_count",
        "q_sequential_ids",
        "q_annotation_ids",
        "q_window_grid",
        "q_text_quality",
        "q_vocab",
        "q_exact_dedup",
        "q_span_dedup",
        "q_decontaminate",
        "q_stratified_split",
        "q_pack_chunks",
        "q_minhash_lsh",
        "q_dedup_clusters",
        "q_simhash",
        "q_embedding_neardup",
        "q_ann_topk",
        "q_ann_ivf",
        "q_ann_lsh",
        "q_coco_boxes",
        "q_coco_rle",
        "q_coco_stars",
        "q_coco_multistars",
        "q_spatial_join_star",
        "q_events_window",
        "q_sessionize",
    ]
    queries = entry_mod.queries()
    # warmup: JVM codegen + python worker pool, so the first headline
    # query isn't charged the session spin-up
    spark.range(10_000).withColumn("g", (F.col("id") % 7)).groupBy("g").applyInPandas(
        lambda p: p, "id long, g long"
    ).count()
    # ... and the broadcast-join + window plan families the headline
    # queries lean on (round 6: the driver's r5 rep-1 readings charged
    # q_spatial_join_bbox 2-4 s of first-plan cost that the in-window
    # A/B showed is not steady-state)
    from pyspark.sql.window import Window as _W

    warm = spark.range(10_000).join(F.broadcast(spark.range(100)), "id", "left")
    warm.withColumn("rn", F.row_number().over(_W.partitionBy("id").orderBy("id"))).count()
    # this box shows +-25% run-to-run variance; headline numbers are
    # the MEDIAN of n_reps with per-rep times recorded (VERDICT r02 #6)
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    median = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    times: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    for name in headline:
        rr = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            n = queries[name](spark, sf_dir).count()
            rr.append(round(time.perf_counter() - t0, 3))
            # operators that persist() intermediates (span dedup, pack
            # chunks, minhash shingles, CC edges) would otherwise serve
            # rep >= 2 from rep 1's cache — Spark's CacheManager matches
            # canonicalized plans across separate query objects — so the
            # reps would time a cache read, not the operator
            spark.catalog.clearCache()
        reps[name] = rr
        times[name] = median(rr)
        print(f"# {name}: {times[name]}s median of {rr} ({n} rows)", file=sys.stderr)

    pipe_reps, counters = [], {}
    for rep in range(n_reps):
        pipe_s, counters = bench_pipeline(spark, n_images, rep=rep)
        pipe_reps.append(round(pipe_s, 3))
    reps["coco_pipeline"] = pipe_reps
    times["coco_pipeline"] = median(pipe_reps)
    images_per_sec = counters["images"] / times["coco_pipeline"]
    print(
        f"# pipeline: {times['coco_pipeline']}s median of {pipe_reps} for "
        f"{counters['images']} images ({counters['tiles']} tiles, "
        f"{counters['annotations']} anns)",
        file=sys.stderr,
    )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "coco_pipeline_images_per_sec",
                "value": round(images_per_sec, 3),
                "unit": "images/sec",
                "queries": times,
                "reps": reps,
                "n_reps": n_reps,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
                "pipeline_counters": counters,
            }
        )
    )


if __name__ == "__main__":
    main()
