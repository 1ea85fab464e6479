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
import json, sys, time
sys.path.insert(0, {repo!r})
from geococo_spark.session import get_spark
import bench

cpus = int(sys.argv[1])
n_images = int(sys.argv[2])
spark = bench._build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
# warmup: JVM + python worker pool spin-up excluded from the measurement
bench.bench_pipeline(spark, 2)
dt, counters = bench.bench_pipeline(spark, n_images)
print(json.dumps({{"cpus": cpus, "seconds": dt, **counters}}))
"""


def run(cpus: int, n_images: int) -> dict:
    code = WORKER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_images)],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_images = int(os.environ.get("SPARK_GRAFT_SCALING_IMAGES", "192"))
    lo = run(8, n_images)
    hi = run(32, n_images)
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
    (bench_dir / "BASELINE.md").write_text(
        "# Measured scaling (sandbox proxy: local[8] vs local[32])\n\n"
        "Same job, same input (synthetic pipeline workload, "
        f"{n_images} images x 256x256x3 + 2000 labels), fresh JVM each, "
        "warmup excluded.\n\n"
        "| Measurement | local[8] | local[32] | efficiency |\n"
        "|---|---|---|---|\n"
        f"| images/sec | {result['local8_images_per_sec']} | "
        f"{result['local32_images_per_sec']} | "
        f"{result['scaling_efficiency']} (target >= 0.8) |\n"
        f"| wall seconds | {result['local8_sec']} | {result['local32_sec']} | |\n"
    )


if __name__ == "__main__":
    main()
