"""Round-7 in-window A/B: persist the dedup_spans chunk table or not.

q_span_dedup is the slowest steady-state oracle query at sf0.1
(2.8-3.2 s at local[32]). Its chunk table feeds BOTH the span-stats
aggregate and the flag join; the two exchanges differ (partial-agg vs
raw rows) so no ReusedExchange fires and the string-heavy chunking
(transform + array_join(slice) + explode + md5) computes twice.
Hypothesis: persist(ch) trades one extra memory write for the second
chunking pass.

Both arms run in ONE session over the sf0.1 documents table,
alternating per rep, results asserted identical before timing.

Usage: python tools/ab_span_persist_r7.py [reps=5] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geococo_spark.operators import dedup  # noqa: E402
from geococo_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ab-span-persist", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def run(persist: bool) -> float:
        t0 = time.perf_counter()
        out = dedup.dedup_spans(docs, "doc_id", "text", k=3, min_count=2,
                                persist_chunks=persist)
        out.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    # equality gate (one pass each, sorted collect)
    a = sorted(map(tuple, dedup.dedup_spans(docs, k=3, persist_chunks=False).collect()))
    b = sorted(map(tuple, dedup.dedup_spans(docs, k=3, persist_chunks=True).collect()))
    spark.catalog.clearCache()
    assert a == b, "arms disagree"
    print(f"# equality gate passed ({len(a)} rows)", flush=True)

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
