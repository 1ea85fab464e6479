"""Round-7 in-window A/B: observe()-folded CC convergence vs the r6
per-round count action (VERDICT r06 #4 — q_dedup_clusters at 3.69 s was
the slowest micro-query, dominated by fixed per-round job constants:
two keyed shuffles + a localCheckpoint + a SEPARATE count action per
round; the working tree folds the changed-count into the round's
materialization job as a CollectMetrics observation, deleting one job
per round).

Both arms run in ONE Spark session on the same pre-materialized
minhash pair graph (sf0.1 documents, the bench shape), alternating
old/new per rep; the old arm is HEAD's operators/dedup.py loaded via
``git show`` + importlib under a private module name (nothing shared is
monkeypatched). Labelings are asserted identical before timing.

Run from /root/repo (~2 min):
    python tools/ab_cc_observe_r7.py [reps=5]
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OLD_PATH = "/tmp/dedup_r6_head.py"


def _load_old_dedup():
    if not os.path.exists(OLD_PATH):
        src = subprocess.run(
            ["git", "show", "HEAD:geococo_spark/operators/dedup.py"],
            cwd=REPO, check=True, capture_output=True, text=True,
        ).stdout
        with open(OLD_PATH, "w") as fh:
            fh.write(src)
    spec = importlib.util.spec_from_file_location("dedup_r6_head", OLD_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from geococo_spark.operators import dedup as dedup_new
    from geococo_spark.session import get_spark

    dedup_old = _load_old_dedup()
    spark = get_spark(app_name="ab_cc_r7", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pairs = dedup_new.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, portable=True, max_bucket_size=64
    ).localCheckpoint()
    n_pairs = pairs.count()

    old_rows = sorted(map(tuple, dedup_old.duplicate_clusters(pairs).collect()))
    new_rows = sorted(map(tuple, dedup_new.duplicate_clusters(pairs).collect()))
    assert old_rows == new_rows, "labelings differ"
    out: dict = {"identical": True, "n_pairs": n_pairs, "n_vertices": len(new_rows)}

    # the correctness pre-run above already warmed both plan families
    out["old_s"], out["new_s"] = [], []
    for rep in range(reps):
        for arm, mod in (("old", dedup_old), ("new", dedup_new)):
            t0 = time.perf_counter()
            mod.duplicate_clusters(pairs).count()
            out[f"{arm}_s"].append(round(time.perf_counter() - t0, 3))
        print(f"# rep={rep} old={out['old_s'][-1]} new={out['new_s'][-1]}",
              flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out["old_med"], out["new_med"] = med(out["old_s"]), med(out["new_s"])
    out["ratio"] = round(out["new_med"] / out["old_med"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
