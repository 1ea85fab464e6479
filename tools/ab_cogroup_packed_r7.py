"""Round-7 in-window A/B: packed-pairs cogroup vs per-pair-row cogroup.

tools/ab_kernel_floor_r7.py located the kernel stage's wall in its
INPUT row count (1M per-pair rows -> ~4 s floor; 100k -> ~2 s; payload
bytes free). kernel_input_mode="cogroup_packed" sends the pairs side
through the cogroup as ONE row per (image_id, band) of position-zipped
primitive arrays (the broadcast path's proven layout) — same exchange
count, ~2000x fewer boundary rows. This tool alternates the two modes
in one session on the 512-image / 12k-label workload (the floor
probe's shape) and reports kernel-phase + total medians; outputs are
byte-identical (pinned by test_kernel_input_mode_output_identical).

RESULT (round 7, one window, calibration ceiling 0.908): packing is
SLOWER — kernel phase 1.456x at p=32 (5.77 -> 8.41 s median) and
1.139x at p=8. The JVM-side collect_list(struct(...)) aggregation +
array projection costs more than the per-row Arrow/exchange boundary
it deletes on this box; the per-pair-row cogroup stays the default.
The mode remains available for fabrics where exchange rows are priced
differently (network shuffle serialization vs local page cache).

Run from /root/repo (~5 min):
    python tools/ab_cogroup_packed_r7.py [cores=32] [n_images=512] [reps=4]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geococo_spark import pipeline  # noqa: E402
from geococo_spark.coco import CocoState  # noqa: E402
from geococo_spark.session import get_spark  # noqa: E402
from geococo_spark.sources import datagen  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    stage = os.environ.get("SPARK_GRAFT_SCALING_STAGE", "/tmp/geococo_profile_stage")
    spark = get_spark(app_name="ab_cgp", master=f"local[{cores}]",
                      shuffle_partitions=cores, arrow_batch_rows=64)
    spark.sparkContext.setLogLevel("ERROR")
    images = datagen.stage_images_parquet(
        spark, f"{stage}/images_{n_images}", n_images, files=max(8, n_images // 4)
    )
    lp = f"{stage}/labels_dense"
    if not os.path.exists(os.path.join(lp, "_SUCCESS")):
        datagen.random_labels_df(spark, 12000, extent=1000.0, seed=9).repartition(
            32
        ).write.mode("overwrite").parquet(lp)
    labels = spark.read.parquet(lp)

    def run(mode: str) -> tuple[float, float, int]:
        timings: dict = {}
        state = CocoState.create(spark)
        t0 = time.perf_counter()
        state = pipeline.append_dataset(
            spark, state, images, labels,
            images_dir="bench_images",
            window_bounds=[(128, 128), (256, 256)],
            id_attribute="category_id", name_attribute="class_names",
            timings=timings, kernel_input_mode=mode,
        )
        n = state.annotations.count()
        return timings["kernel"], time.perf_counter() - t0, n

    run("cogroup")  # warm
    run("cogroup_packed")
    out: dict = {"cores": cores, "n_images": n_images}
    walls = {"cogroup": [], "cogroup_packed": []}
    totals = {"cogroup": [], "cogroup_packed": []}
    n_prev = None
    for rep in range(reps):
        for mode in ("cogroup", "cogroup_packed"):
            k, t, n = run(mode)
            walls[mode].append(round(k, 3))
            totals[mode].append(round(t, 3))
            assert n_prev is None or n == n_prev, "row counts diverged"
            n_prev = n
        print(f"# rep={rep} cogroup={walls['cogroup'][-1]} "
              f"packed={walls['cogroup_packed'][-1]}", flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out.update(
        kernel_reps=walls, total_reps=totals,
        kernel_cogroup_med=med(walls["cogroup"]),
        kernel_packed_med=med(walls["cogroup_packed"]),
        kernel_ratio=round(med(walls["cogroup_packed"]) / med(walls["cogroup"]), 3),
        total_cogroup_med=med(totals["cogroup"]),
        total_packed_med=med(totals["cogroup_packed"]),
        total_ratio=round(med(totals["cogroup_packed"]) / med(totals["cogroup"]), 3),
        annotations=n_prev,
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
