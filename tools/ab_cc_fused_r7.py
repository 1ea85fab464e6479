"""Round-7 in-window A/B: fused 2-step CC rounds vs 1-step rounds.

duplicate_clusters' sf0.1 wall is dominated by fixed per-round costs
(materialization + job scheduling); fusing ``steps_per_round=2``
propagation steps into each materialized round halves the round count
for the same propagation distance — the intermediate labeling stays a
plan. Fixpoint-neutral (monotone min-label propagation), so both arms
must produce identical labelings (asserted before timing).

RESULT (round 7, one window): fusion is SLOWER — ratio 1.343 on the
localCheckpoint path and 1.296 on the durable parquet path (separate
run, same pattern with checkpoint_dir set). The unmaterialized
intermediate labeling is referenced twice per extra step and
recomputed each time; on this shallow graph (converges in <=4 plain
rounds) the recompute costs more than the saved round constants.
Default stays steps_per_round=1.

Same-session knob A/B on the bench-shaped sf0.1 minhash pair graph,
alternating arms per rep.

Run from /root/repo (~2 min):
    python tools/ab_cc_fused_r7.py [reps=5]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from geococo_spark.operators import dedup
    from geococo_spark.session import get_spark

    spark = get_spark(app_name="ab_cc_fused_r7", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, portable=True, max_bucket_size=64
    ).localCheckpoint()
    n_pairs = pairs.count()

    one = sorted(map(tuple, dedup.duplicate_clusters(pairs, steps_per_round=1).collect()))
    two = sorted(map(tuple, dedup.duplicate_clusters(pairs, steps_per_round=2).collect()))
    assert one == two, "labelings differ"
    out: dict = {"identical": True, "n_pairs": n_pairs, "n_vertices": len(two)}

    out["one_s"], out["two_s"] = [], []
    for rep in range(reps):
        for arm, steps in (("one", 1), ("two", 2)):
            t0 = time.perf_counter()
            dedup.duplicate_clusters(pairs, steps_per_round=steps).count()
            out[f"{arm}_s"].append(round(time.perf_counter() - t0, 3))
        print(f"# rep={rep} one={out['one_s'][-1]} two={out['two_s'][-1]}",
              flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out["one_med"], out["two_med"] = med(out["one_s"]), med(out["two_s"])
    out["ratio"] = round(out["two_med"] / out["one_med"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
