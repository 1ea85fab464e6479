"""Round-6 in-window A/B: refpoint vs shuffle dedupe (VERDICT r05 #1).

The driver's round-5 bench showed q_spatial_join_bbox at 2.2x its r4
median — the one micro-query whose plan round 5 rebuilt (refpoint
dedupe default). Tenancy noise on this box is +-30%, so the only valid
reading is back-to-back alternation in ONE window:

- q_spatial_join_bbox (sf0.1, the driver's micro-shape): 4 A/B pairs,
  alternating GEOCOCO_DEDUPE_MODE per rep;
- the 512-image pipeline: 3 A/B pairs (the pipeline-level shape the
  refpoint default was chosen on);
- drift re-measure of q_ann_lsh / q_simhash / q_events_window (3 reps,
  code unchanged since r4 — pure tenancy probes);
- machine_calibration before and after.

Prints one JSON line. Run from /root/repo:
    python tools/ab_dedupe_r6.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def calibrate() -> dict:
    out = subprocess.run(
        [sys.executable, "tools/machine_calibration.py"],
        capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]
    return json.loads(out)


def main() -> None:
    results: dict = {"cal_before": calibrate()}
    print(f"# cal_before: {results['cal_before']}", flush=True)

    from pyspark.sql import functions as F

    import bench
    import __spark_entry__ as E
    from geococo_spark.session import get_spark

    spark = get_spark(app_name="ab-dedupe-r6", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    qs = E.queries()

    # warmup: codegen + python worker pool (same as bench.py)
    spark.range(10_000).withColumn("g", (F.col("id") % 7)).groupBy("g").applyInPandas(
        lambda p: p, "id long, g long"
    ).count()

    def timeq(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf).count()
        return round(time.perf_counter() - t0, 3)

    # ---- micro-query A/B: 4 back-to-back pairs
    results["bbox_refpoint"], results["bbox_shuffle"] = [], []
    for _ in range(4):
        os.environ["GEOCOCO_DEDUPE_MODE"] = "refpoint"
        results["bbox_refpoint"].append(timeq("q_spatial_join_bbox"))
        os.environ["GEOCOCO_DEDUPE_MODE"] = "shuffle"
        results["bbox_shuffle"].append(timeq("q_spatial_join_bbox"))
    os.environ.pop("GEOCOCO_DEDUPE_MODE", None)
    print(f"# bbox refpoint={results['bbox_refpoint']} shuffle={results['bbox_shuffle']}",
          flush=True)

    # ---- drift probes (code unchanged r4->r6)
    for name in ("q_ann_lsh", "q_simhash", "q_events_window"):
        results[name] = [timeq(name) for _ in range(3)]
        print(f"# {name}: {results[name]}", flush=True)

    # ---- pipeline A/B at 512 images: 3 back-to-back pairs
    stage = "/tmp/ab_dedupe_stage"
    results["pipe_refpoint"], results["pipe_shuffle"] = [], []
    for rep in range(3):
        os.environ["GEOCOCO_DEDUPE_MODE"] = "refpoint"
        s, _ = bench.bench_pipeline(spark, 512, stage_dir=stage, rep=rep * 2)
        results["pipe_refpoint"].append(round(s, 3))
        os.environ["GEOCOCO_DEDUPE_MODE"] = "shuffle"
        s, _ = bench.bench_pipeline(spark, 512, stage_dir=stage, rep=rep * 2 + 1)
        results["pipe_shuffle"].append(round(s, 3))
        print(f"# pipe pair {rep}: refpoint={results['pipe_refpoint'][-1]} "
              f"shuffle={results['pipe_shuffle'][-1]}", flush=True)
    os.environ.pop("GEOCOCO_DEDUPE_MODE", None)

    results["cal_after"] = calibrate()
    print(f"# cal_after: {results['cal_after']}", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
