"""Scaling-efficiency measurement (north_rule: throughput efficiency
>= 0.8 between N and 4N parallelism; sandbox proxy = local[8] vs
local[32] per driver instruction — no real cluster here).

Runs the SAME pipeline workload in two fresh JVMs (subprocesses, so each
gets its own local master) and reports images/sec at both plus
efficiency = (T8 / T32) / 4 ... i.e. speedup/4. Appends the measured
table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys, time, tempfile
sys.path.insert(0, {repo!r})
from geococo_spark.session import get_spark
from geococo_spark.sources import datagen
from geococo_spark import pipeline
from geococo_spark.coco import CocoState

cpus = int(sys.argv[1]); n_images = int(sys.argv[2]); stage = sys.argv[3]
spark = get_spark(app_name="scaling", master=f"local[{{cpus}}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")

# compute-dominated workload: parquet-staged inputs (the engine's real
# input shape), dense labels so the Arrow kernel dominates the wall
def staged_images(n):
    return datagen.stage_images_parquet(spark, f"{{stage}}/images_{{n}}", n,
                                        files=max(8, n // 4))
images = staged_images(n_images)
import os
lp = f"{{stage}}/labels_dense"
if not os.path.exists(os.path.join(lp, "_SUCCESS")):
    datagen.random_labels_df(spark, 12000, extent=1000.0, seed=9).repartition(32)\
        .write.mode("overwrite").parquet(lp)
labels = spark.read.parquet(lp)

def run_once(n):
    imgs = staged_images(n)  # NEVER .limit(): a global limit serializes
    state = CocoState.create(spark)
    t0 = time.perf_counter()
    state = pipeline.append_dataset(spark, state, imgs, labels,
        images_dir="bench_images", window_bounds=[(128, 128), (256, 256)],
        id_attribute="category_id", name_attribute="class_names")
    anns = state.annotations.count()
    return time.perf_counter() - t0, anns

run_once(2)  # warmup: JVM, python worker pool, parquet footer cache
best = None
for _ in range(int(sys.argv[4])):
    dt, anns = run_once(n_images)
    best = dt if best is None else min(best, dt)
print(json.dumps({{"cpus": cpus, "seconds": best, "annotations": anns}}))
"""


def run(cpus: int, n_images: int, stage: str, reps: int) -> dict:
    code = WORKER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_images), stage, str(reps)],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    import tempfile

    n_images = int(os.environ.get("SPARK_GRAFT_SCALING_IMAGES", "1024"))
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2"))
    stage = tempfile.mkdtemp(prefix="geococo_scaling_")
    lo = run(8, n_images, stage, reps)
    hi = run(32, n_images, stage, reps)
    tput_lo = n_images / lo["seconds"]
    tput_hi = n_images / hi["seconds"]
    efficiency = (tput_hi / tput_lo) / 4.0
    result = {
        "n_images": n_images,
        "local8_sec": round(lo["seconds"], 2),
        "local32_sec": round(hi["seconds"], 2),
        "local8_images_per_sec": round(tput_lo, 3),
        "local32_images_per_sec": round(tput_hi, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(result))
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    # APPEND a measurement row — BENCH/BASELINE.md carries the analysis
    # text and the full history of runs (high machine variance here, so
    # single runs are never authoritative)
    path = bench_dir / "BASELINE.md"
    if not path.exists():
        path.write_text(
            "# Measured scaling runs (local[8] vs local[32])\n\n"
            "| n_images | local[8] img/s | local[32] img/s | efficiency |\n"
            "|---|---|---|---|\n"
        )
    with open(path, "a") as fh:
        fh.write(
            f"| {n_images} | {result['local8_images_per_sec']} | "
            f"{result['local32_images_per_sec']} | {result['scaling_efficiency']} |\n"
        )


if __name__ == "__main__":
    main()
