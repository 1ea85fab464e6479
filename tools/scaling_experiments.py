"""Round-2 scaling experiments: isolate what bounds efficiency.

Runs the SAME pipeline workload (parquet-staged images + dense labels)
across a matrix of (master, shuffle_partitions, arrow_batch_rows) in
fresh subprocess JVMs, reporting wall seconds + in-kernel core-seconds
(accumulator) so utilization = kernel_core_s / (wall * cores) is
directly comparable across configs.

Usage: python tools/scaling_experiments.py [config_name ...]
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys, time, os
sys.path.insert(0, {repo!r})
from geococo_spark.session import get_spark
from geococo_spark.sources import datagen
from geococo_spark import pipeline
from geococo_spark.coco import CocoState
from geococo_spark.checkpoint import EngineMetrics

master = sys.argv[1]; shuffle = int(sys.argv[2]); arrow = int(sys.argv[3])
n_images = int(sys.argv[4]); stage = sys.argv[5]; reps = int(sys.argv[6])
spark = get_spark(app_name="scal-exp", master=master,
                  shuffle_partitions=shuffle, arrow_batch_rows=arrow)
spark.sparkContext.setLogLevel("ERROR")

def staged_images(n):
    return datagen.stage_images_parquet(spark, f"{{stage}}/images_{{n}}", n,
                                        files=max(8, n // 4))
lp = f"{{stage}}/labels_dense"
if not os.path.exists(os.path.join(lp, "_SUCCESS")):
    datagen.random_labels_df(spark, 12000, extent=1000.0, seed=9).repartition(32)\
        .write.mode("overwrite").parquet(lp)
labels = spark.read.parquet(lp)

def run_once(n):
    import shutil, tempfile
    imgs = staged_images(n)
    state = CocoState.create(spark)
    m = EngineMetrics(spark)
    sink = tempfile.mkdtemp(prefix="geococo_tilesink_")
    t0 = time.perf_counter()
    state = pipeline.append_dataset(spark, state, imgs, labels,
        images_dir="bench_images", window_bounds=[(128, 128), (256, 256)],
        id_attribute="category_id", name_attribute="class_names", metrics=m,
        tile_sink_dir=sink)
    anns = state.annotations.count()
    dt = time.perf_counter() - t0
    shutil.rmtree(sink, ignore_errors=True)
    return dt, anns, m.snapshot()["kernel_ms"]

run_once(2)  # warmup
best, best_k = None, None
for _ in range(reps):
    dt, anns, kms = run_once(n_images)
    if best is None or dt < best:
        best, best_k = dt, kms
print(json.dumps({{"seconds": best, "annotations": anns, "kernel_core_s": best_k / 1000.0}}))
"""

CONFIGS = {
    # name: (master, cores, shuffle, arrow)
    "lo_base": ("local[8]", 8, 8, 64),
    "hi_base": ("local[32]", 32, 32, 64),
    "hi_shuf128": ("local[32]", 32, 128, 64),
    "hi_arrow4k": ("local[32]", 32, 32, 4096),
    "hi_both": ("local[32]", 32, 128, 4096),
    "lo_both": ("local[8]", 8, 32, 4096),
    # tuned = the engine's shipped defaults (session.py): shuffle=cores,
    # arrow=1024. These are the official N vs 4N proxy configs.
    "lo": ("local[8]", 8, 8, 1024),
    "hi": ("local[32]", 32, 32, 1024),
    # separate executor JVMs (2 workers x 4 cores vs 8 x 4): the faithful
    # multi-executor proxy — isolates single-JVM co-residency effects
    "lc_lo": ("local-cluster[2,4,8192]", 8, 8, 1024),
    "lc_hi": ("local-cluster[8,4,8192]", 32, 32, 1024),
    "hi_s64": ("local[32]", 32, 64, 1024),
    "hi_s128": ("local[32]", 32, 128, 1024),
}


def run(name: str, n_images: int, stage: str, reps: int) -> dict:
    master, cores, shuffle, arrow = CONFIGS[name]
    code = WORKER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", code, master, str(shuffle), str(arrow),
         str(n_images), stage, str(reps)],
        capture_output=True, text=True, cwd=str(REPO), timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"{name} failed: {out.stderr[-2000:]}")
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r.update(
        name=name, master=master, cores=cores, shuffle=shuffle, arrow=arrow,
        images_per_sec=round(n_images / r["seconds"], 3),
        utilization=round(r["kernel_core_s"] / (r["seconds"] * cores), 3),
    )
    return r


def main() -> None:
    n_images = int(os.environ.get("SPARK_GRAFT_SCALING_IMAGES", "192"))
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2"))
    stage = os.environ.get("SPARK_GRAFT_SCALING_STAGE") or tempfile.mkdtemp(
        prefix="geococo_scalexp_"
    )
    args = sys.argv[1:]
    if args and args[0] == "--paired":
        # noise-aware headline mode (round 3): this box's hypervisor
        # co-tenancy swings identical-code kernel core-seconds by ±30%
        # on multi-minute scales, so sequential lo-then-hi legs compare
        # different machines. Alternate (lo, hi) back-to-back per pair,
        # compute efficiency WITHIN each pair, report the series +
        # median — drift then hits both legs of a pair roughly equally.
        n_pairs = int(args[1]) if len(args) > 1 else 3
        effs = []
        for i in range(n_pairs):
            lo = run("lo", n_images, stage, 1)
            hi = run("hi", n_images, stage, 1)
            eff = (hi["images_per_sec"] / lo["images_per_sec"]) / 4.0
            effs.append(round(eff, 3))
            print(json.dumps({
                "pair": i, "lo_img_s": lo["images_per_sec"],
                "hi_img_s": hi["images_per_sec"],
                "lo_kernel_core_s": lo["kernel_core_s"],
                "hi_kernel_core_s": hi["kernel_core_s"],
                "efficiency": effs[-1],
            }), flush=True)
        print(f"# paired efficiencies: {effs} median: "
              f"{sorted(effs)[len(effs) // 2]:.3f}", flush=True)
        return
    names = args or list(CONFIGS)
    results = []
    for name in names:
        r = run(name, n_images, stage, reps)
        print(json.dumps(r), flush=True)
        results.append(r)
    by = {r["name"]: r for r in results}
    for lo, hi in [("lo_base", "hi_base"), ("lo_both", "hi_both"),
                   ("lo", "hi"), ("lc_lo", "lc_hi")]:
        if lo in by and hi in by:
            eff = (by[hi]["images_per_sec"] / by[lo]["images_per_sec"]) / 4.0
            print(f"# efficiency {lo} -> {hi}: {eff:.3f}", flush=True)


if __name__ == "__main__":
    main()
