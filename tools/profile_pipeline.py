"""Per-phase pipeline profile at one parallelism level (fresh JVM).

Usage: python tools/profile_pipeline.py <cores> [n_images] [shuffle] [arrow]
Prints one JSON line with per-phase wall seconds + final-count time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geococo_spark import pipeline  # noqa: E402
from geococo_spark.checkpoint import EngineMetrics  # noqa: E402
from geococo_spark.coco import CocoState  # noqa: E402
from geococo_spark.session import get_spark  # noqa: E402
from geococo_spark.sources import datagen  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    shuffle = int(sys.argv[3]) if len(sys.argv) > 3 else cores
    arrow = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    stage = os.environ.get("SPARK_GRAFT_SCALING_STAGE", "/tmp/geococo_profile_stage")
    spark = get_spark(
        app_name="profile", master=f"local[{cores}]",
        shuffle_partitions=shuffle, arrow_batch_rows=arrow,
    )
    spark.sparkContext.setLogLevel("ERROR")
    images = datagen.stage_images_parquet(
        spark, f"{stage}/images_{n_images}", n_images, files=max(8, n_images // 4)
    )
    lp = f"{stage}/labels_dense"
    if not os.path.exists(os.path.join(lp, "_SUCCESS")):
        datagen.random_labels_df(spark, 12000, extent=1000.0, seed=9).repartition(32).write.mode(
            "overwrite"
        ).parquet(lp)
    labels = spark.read.parquet(lp)

    # sink mode matches the bench/scaling flagship (in-stage tile sink);
    # SPARK_GRAFT_PROFILE_SINK=0 profiles the legacy in-row payload path
    sink_mode = os.environ.get("SPARK_GRAFT_PROFILE_SINK", "1") == "1"

    def run(n):
        import shutil, tempfile

        timings: dict = {}
        # SPARK_GRAFT_PROFILE_KERNEL_PHASES=1: register the within-kernel
        # phase accumulators (decode/raster/tile/ann/sink core-seconds)
        m = EngineMetrics(
            spark,
            phases=os.environ.get("SPARK_GRAFT_PROFILE_KERNEL_PHASES", "0") == "1",
        )
        state = CocoState.create(spark)
        sink = tempfile.mkdtemp(prefix="geococo_profsink_") if sink_mode else None
        t0 = time.perf_counter()
        kernel_mode = os.environ.get("SPARK_GRAFT_PROFILE_KERNEL_MODE", "cogroup")
        state = pipeline.append_dataset(
            spark, state, datagen.stage_images_parquet(
                spark, f"{stage}/images_{n}", n, files=max(8, n // 4)
            ), labels,
            images_dir="bench_images", window_bounds=[(128, 128), (256, 256)],
            id_attribute="category_id", name_attribute="class_names",
            metrics=m, timings=timings, tile_sink_dir=sink,
            kernel_input_mode=kernel_mode,
        )
        t1 = time.perf_counter()
        anns = state.annotations.count()
        timings["final_count"] = round(time.perf_counter() - t1, 3)
        timings["total"] = round(time.perf_counter() - t0, 3)
        if sink is not None:
            shutil.rmtree(sink, ignore_errors=True)
        return timings, anns, m.snapshot()

    run(2)  # warmup
    best = None
    for _ in range(2):
        timings, anns, snap = run(n_images)
        if best is None or timings["total"] < best["total"]:
            best, best_snap = timings, snap
    best.update(cores=cores, shuffle=shuffle, arrow=arrow, n_images=n_images,
                kernel_core_s=round(best_snap["kernel_ms"] / 1000.0, 1),
                annotations=anns)
    for name, v in best_snap.items():
        if name.endswith("_us"):
            best[name.replace("_us", "_core_s")] = round(v / 1e6, 1)
    print(json.dumps(best))


if __name__ == "__main__":
    main()
