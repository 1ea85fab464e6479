"""Round-6 in-window A/B #3: duplicate_clusters per-round cost cut.

Under test: (1) round 1's label join deleted (labels are identity, so
the min neighbor label is min(src) per dst), (2) the convergence check
changed from a per-round anti-join (a second shuffle join) to a
filter-count over the checkpointed merge output.

OLD = duplicate_clusters from git HEAD (module loaded from
/tmp/dedup_r6a.py), NEW = working tree. Both run over the SAME
pre-materialized (localCheckpoint'd) minhash pair graph at sf0.1 in one
Spark session, alternated A/B/A/B; results asserted identical.

Prepare + run from /root/repo (~2 min):
    git show HEAD:geococo_spark/operators/dedup.py > /tmp/dedup_r6a.py
    python tools/ab_cc_rounds_r6.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OLD_PATH = "/tmp/dedup_r6a.py"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3


def main() -> None:
    if not os.path.exists(OLD_PATH):
        raise SystemExit(f"missing {OLD_PATH} — see module docstring")
    from geococo_spark.operators import dedup as dedup_new
    from geococo_spark.session import get_spark

    spec = importlib.util.spec_from_file_location("dedup_r6a", OLD_PATH)
    dedup_old = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dedup_old)

    spark = get_spark(app_name="ab-cc", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = dedup_new.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, portable=True
    ).localCheckpoint()
    n_pairs = pairs.count()

    def run(mod):
        t0 = time.perf_counter()
        out = sorted(
            (r.doc_id, r.cluster_id) for r in mod.duplicate_clusters(pairs).collect()
        )
        return time.perf_counter() - t0, out

    # warmup both plan families once
    _, ref_old = run(dedup_old)
    _, ref_new = run(dedup_new)
    assert ref_old == ref_new, "old/new cluster labelings differ"

    old_t, new_t = [], []
    for _ in range(REPS):
        t, o = run(dedup_old)
        assert o == ref_old
        old_t.append(round(t, 3))
        t, o = run(dedup_new)
        assert o == ref_old
        new_t.append(round(t, 3))

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(json.dumps({
        "n_pairs": n_pairs,
        "outputs_identical": True,
        "old_sec": old_t,
        "new_sec": new_t,
        "old_median": med(old_t),
        "new_median": med(new_t),
        "speedup": round(med(old_t) / med(new_t), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
