"""Round-7 in-window A/B: pin embedding-neardup intermediates or not.

q_embedding_neardup's executed plan shows 4 ArrowEvalPython nodes and
ZERO ReusedExchange: the banded (vid, t, b) rows feed both sides of the
candidate self-join (signature UDF runs twice) and the quantized
(qv, norm) table feeds both verify attaches (_qvec runs twice).
Hypothesis: persist() on both cuts two Arrow passes over the corpus.

Both arms in ONE session at the q_embedding_neardup bench config,
alternating, equality-gated, cache cleared after every run.

Usage: python tools/ab_emb_persist_r7.py [reps=5] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geococo_spark.operators import similarity as sim  # noqa: E402
from geococo_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ab-emb-persist", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def build(persist: bool):
        return sim.embedding_near_duplicates(
            embs, dim=64, threshold=0.42, n_planes=6, n_tables=10,
            persist_intermediates=persist,
        )

    def run(persist: bool) -> float:
        t0 = time.perf_counter()
        build(persist).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    a = sorted(map(tuple, build(False).collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, build(True).collect()))
    spark.catalog.clearCache()
    assert a == b, "arms disagree"
    print(f"# equality gate passed ({len(a)} pairs)", flush=True)

    run(False); run(True)  # warmup both plan families
    series: dict[str, list[float]] = {"nopersist": [], "persist": []}
    for r in range(reps):
        series["nopersist"].append(round(run(False), 3))
        series["persist"].append(round(run(True), 3))
        print(f"# rep {r}: nopersist {series['nopersist'][-1]}s "
              f"persist {series['persist'][-1]}s", flush=True)
    med = {k: sorted(v)[len(v) // 2] for k, v in series.items()}
    print(json.dumps({
        "series": series, "median": med,
        "speedup_persist": round(med["nopersist"] / med["persist"], 3),
    }))


if __name__ == "__main__":
    main()
