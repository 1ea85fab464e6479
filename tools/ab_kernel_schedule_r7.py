"""Round-7 in-window A/B: kernel stage SCHEDULING (fused vs preshuffle
vs sequential waves).

tools/ab_kernel_inflation_r7.py attributed the kernel's lo->hi core-s
inflation to generic co-running memory traffic (24 triad antagonists
reproduce it at fixed kernel concurrency) — i.e. the 2x
pipeline-context inflation is shared-DRAM cost, and the only remaining
single-box lever is STAGE SCHEDULING: don't co-run the DRAM-bound burn
with heavy shuffle. This tool measures the two schedulings that
hypothesis suggests, against the shipped fused stage, alternating all
arms per rep in ONE window (kernel_schedule=, pipeline.py):

  fused      — shipped: one action, shuffle-read and numpy burn
               pipelined per task (maximum overlap, maximum
               concurrency diversity).
  preshuffle — both cogroup sides hash-repartitioned on
               (image_id, band) and persisted FIRST (two shuffle-only
               jobs, timed separately as kernel_preshuffle), then the
               burn reads cached pre-partitioned blocks with NO
               exchange in-stage (plan-verified: FlatMapCoGroupsInPandas
               over InMemoryTableScan). Shuffle and burn never co-run.
  waves:2    — images hash into 2 disjoint waves, kernel runs as 2
               sequential jobs (halved group concurrency diversity,
               lost overlap between waves).

Outputs are byte-identical across schedules (pinned by
tests/test_pipeline.py::test_kernel_schedule_output_identical).

RESULT (round 7, one window, ceilings 0.90-0.98): FUSED WINS at both
parallelism levels. First campaign (p=32/p=8): preshuffle 1.30x/1.13x,
waves:2 1.67x/1.48x vs fused. That first preshuffle build had a LATENT
spurious exchange — the no-split band column is lit(0), constant
folding turned the cache's partitioning into hashpartitioning(
image_id, 0), which cannot satisfy the cogroup's attribute-based
distribution, so AQE re-inserted an ENSURE_REQUIREMENTS shuffle INSIDE
the burn stage. After rebuilding band non-foldably (pmod(hash,1),
plan-pinned by test_preshuffle_burn_stage_has_no_exchange), the
same-window re-run at p=32: fused 5.12 s, preshuffle 5.96 s (1.16x),
waves:2 8.47 s (1.66x); preshuffle's timed shuffle 2.93 s, burn-only
3.03 s. So the TRUE decomposition: the burn alone is 1.69x faster
without co-running shuffle (5.12 -> 3.03) — the co-run inflation is
real and larger than the triad proxy suggested — but fusion hides the
entire ~2.9 s shuffle behind the burn, which still more than pays for
it (5.12 < 3.03 + 2.93). Sequential waves lose overlap AND pay double
stage startup. The fused schedule stays the only default; both
alternatives remain as kernel_schedule= options with this verdict
attached. Full numbers in BENCH/BASELINE.md "Stage-scheduling probe".

Run from /root/repo (~8 min):
    python tools/ab_kernel_schedule_r7.py [cores=32] [n_images=512] [reps=3]
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

ARMS = ("fused", "preshuffle", "waves:2")


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    stage = os.environ.get("SPARK_GRAFT_SCALING_STAGE", "/tmp/geococo_profile_stage")
    spark = get_spark(app_name="ab_sched", master=f"local[{cores}]",
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

    def run(sched: str) -> tuple[float, float, float, int]:
        timings: dict = {}
        state = CocoState.create(spark)
        t0 = time.perf_counter()
        state = pipeline.append_dataset(
            spark, state, images, labels,
            images_dir="bench_images",
            window_bounds=[(128, 128), (256, 256)],
            id_attribute="category_id", name_attribute="class_names",
            timings=timings, kernel_schedule=sched,
        )
        n = state.annotations.count()
        total = time.perf_counter() - t0
        spark.catalog.clearCache()
        return timings["kernel"], timings.get("kernel_preshuffle", 0.0), total, n

    for arm in ARMS:  # warm every plan family once
        run(arm)
    out: dict = {"cores": cores, "n_images": n_images}
    kern: dict = {a: [] for a in ARMS}
    presh: list = []
    totals: dict = {a: [] for a in ARMS}
    n_prev = None
    for rep in range(reps):
        for arm in ARMS:
            k, ps, t, n = run(arm)
            kern[arm].append(round(k, 3))
            totals[arm].append(round(t, 3))
            if arm == "preshuffle":
                presh.append(round(ps, 3))
            assert n_prev is None or n == n_prev, "row counts diverged"
            n_prev = n
        print(f"# rep={rep} " + " ".join(f"{a}={kern[a][-1]}" for a in ARMS),
              flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out.update(
        kernel_reps=kern, total_reps=totals, preshuffle_shuffle_reps=presh,
        kernel_med={a: med(kern[a]) for a in ARMS},
        total_med={a: med(totals[a]) for a in ARMS},
        preshuffle_burn_only_med=round(
            med(kern["preshuffle"]) - med(presh), 3
        ),
        kernel_ratio_vs_fused={
            a: round(med(kern[a]) / med(kern["fused"]), 3) for a in ARMS
        },
        annotations=n_prev,
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
