"""Round-8 optimization measurement harness (guide §1).

NOT the driver bench — bench.py stays frozen. This tool isolates
individual headline queries with the same `.count()` methodology the
frozen bench uses (plus an optional noop-sink mode that forces every
column), records per-rep times, and can dump `.explain("formatted")`
snapshots for the plans/r08/ before/after evidence.

Usage:
    python bench_extra.py [--sf DIR] [--reps N] [--noop] \
        [--plans OUTDIR] [--suffix before|after] [--pipeline] [q ...]

With no query names, runs the full headline list from bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_spatial_join_bbox", "q_cell_join_count", "q_sequential_ids",
    "q_annotation_ids", "q_window_grid", "q_text_quality", "q_vocab",
    "q_exact_dedup", "q_span_dedup", "q_decontaminate", "q_stratified_split",
    "q_pack_chunks", "q_minhash_lsh", "q_dedup_clusters", "q_simhash",
    "q_embedding_neardup", "q_ann_topk", "q_ann_ivf", "q_ann_lsh",
    "q_coco_boxes", "q_coco_rle", "q_coco_stars", "q_coco_multistars",
    "q_spatial_join_star", "q_events_window", "q_sessionize",
]


def explain_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=[])
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="noop sink instead of count()")
    ap.add_argument("--plans", default=None, help="dump explain() to this dir")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--pipeline", action="store_true", help="also run the coco pipeline with phase timings")
    ap.add_argument("--images", type=int, default=128)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    from geococo_spark.session import get_spark

    spark = get_spark(
        app_name="geococo-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    # same warmups as bench.py so rep-1 numbers are comparable
    spark.range(10_000).withColumn("g", (F.col("id") % 7)).groupBy("g").applyInPandas(
        lambda p: p, "id long, g long"
    ).count()
    from pyspark.sql.window import Window as _W

    warm = spark.range(10_000).join(F.broadcast(spark.range(100)), "id", "left")
    warm.withColumn("rn", F.row_number().over(_W.partitionBy("id").orderBy("id"))).count()

    queries = entry_mod.queries()
    names = args.queries or HEADLINE
    out: dict[str, object] = {"sf": args.sf, "cpus": cpus, "mode": "noop" if args.noop else "count"}
    times: dict[str, list[float]] = {}
    for name in names:
        if name not in queries:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = queries[name](spark, args.sf)
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(explain_str(df))
            spark.catalog.clearCache()
        rr = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = queries[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            rr.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        times[name] = rr
        med = sorted(rr)[len(rr) // 2]
        print(f"# {name}: median {med}s of {rr} ({n} rows)", file=sys.stderr)
    out["times"] = times

    if args.pipeline:
        import shutil
        import tempfile

        from geococo_spark import pipeline
        from geococo_spark.coco import CocoState
        from geococo_spark.sources import datagen

        stage_dir = tempfile.mkdtemp(prefix="geococo_bx_")
        images = datagen.stage_images_parquet(
            spark, f"{stage_dir}/images_{args.images}", args.images,
            files=max(8, args.images // 8),
        )
        datagen.random_labels_df(spark, 2000, extent=1000.0, seed=9).repartition(8).write.mode(
            "overwrite"
        ).parquet(f"{stage_dir}/labels")
        labels = spark.read.parquet(f"{stage_dir}/labels")
        pipe_reps = []
        for rep in range(args.reps):
            state = CocoState.create(spark, description="bx", contributor="bx")
            tile_sink = f"{stage_dir}/tilesink_r{rep}"
            shutil.rmtree(tile_sink, ignore_errors=True)
            timings: dict = {}
            t0 = time.perf_counter()
            state = pipeline.append_dataset(
                spark, state, images, labels,
                images_dir="bench_images",
                window_bounds=[(128, 128), (256, 256)],
                id_attribute="category_id",
                name_attribute="class_names",
                tile_sink_dir=tile_sink,
                timings=timings,
            )
            n_tiles = state.images.count()
            n_anns = state.annotations.count()
            dt = round(time.perf_counter() - t0, 3)
            pipe_reps.append({"total": dt, "timings": timings, "tiles": n_tiles, "anns": n_anns})
            print(f"# pipeline rep{rep}: {dt}s  phases={timings}", file=sys.stderr)
        out["pipeline"] = pipe_reps
        shutil.rmtree(stage_dir, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
