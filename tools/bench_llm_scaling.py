"""Scaling bench for the LLM-data-pipeline operators (VERDICT r02 #7).

The flagship pipeline's N-vs-4N proxy lives in scaling_experiments.py;
this tool measures the dedup/ANN fleet the same way: the SAME operator
on the SAME parquet-staged input at local[8] vs local[32], fresh
subprocess JVM per config, warmup excluded, best-of-reps, efficiency =
(hi_throughput / lo_throughput) / 4.

The sf0.1 tables are too small to leave the fixed-cost regime (a 3 s
query measures session floors, not the operator), so inputs are
AMPLIFIED: each document/embedding is replicated ``SPARK_GRAFT_LLM_AMP``
times with a deterministic per-replica perturbation (a rep token
appended to the text / a small epsilon on one embedding dim) so hashes,
shingles and buckets stay realistic rather than degenerate exact
copies. Both parallelism levels read the identical staged table.

Usage: python tools/bench_llm_scaling.py [op ...]
Env: SPARK_GRAFT_LLM_AMP (default 8), SPARK_GRAFT_LLM_REPS (default 2),
     SPARK_GRAFT_LLM_SF (default /root/testdata/sf0.1),
     SPARK_GRAFT_LLM_EPS (default 0.001 — per-replica embedding
     perturbation; 0.001 makes replicas mutually near-dup, a
     quadratic-in-amp verify workload; ~2.0 keeps only adjacent reps
     near-dup, an amp-linear workload that isolates operator scaling)
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
from pyspark.sql import functions as F
from geococo_spark.session import get_spark
from geococo_spark.operators import dedup
from geococo_spark.operators import similarity as sim
from geococo_spark.operators import text as text_ops
from geococo_spark.operators import sampling as sampling_ops
from geococo_spark.operators import events as events_ops

master, op, stage, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
amp, reps = int(sys.argv[5]), int(sys.argv[6])
# per-replica embedding perturbation. Default ("dim0", eps 0.001):
# dim 0 += rep * eps — replicas stay mutually near-duplicate, so output
# pairs grow as C(amp, 2) per original, a QUADRATIC-in-amp verify
# workload (measured round 4). PERTURB=random with eps ~ 1.0 adds a
# deterministic pseudo-random direction of norm ~ 0.7*eps PER REP
# (sin-sequence over all dims): different reps of one original stop
# being near-dups (cos ~ 1/(1+0.5*eps^2) < threshold) while base
# near-dup pairs survive within each rep — an amp-LINEAR workload that
# isolates operator scaling from workload growth.
eps = float(os.environ.get("SPARK_GRAFT_LLM_EPS", "0.001"))
perturb = os.environ.get("SPARK_GRAFT_LLM_PERTURB", "dim0")
cores = int(master[6:-1])
spark = get_spark(app_name="llm-scal", master=master, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

def stage_amplified(name, amp):
    path = f"{{stage}}/{{name}}_x{{amp}}" + (
        f"_e{{eps}}_{{perturb}}" if name not in ("documents", "events") else ""
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        base = spark.read.parquet(f"{{sf_dir}}/{{name}}.parquet")
        n = base.count()
        reps_df = spark.range(amp).withColumnRenamed("id", "rep")
        if name == "documents":
            out = base.crossJoin(reps_df).select(
                (F.col("doc_id") + F.col("rep") * (n * 10)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" rep"), F.col("rep")).alias("text"),
            )
        elif name == "events":
            # user cardinality scales with amp, per-user volume constant
            # (a bigger day of traffic, not a deeper bot user) — the
            # operator-scaling shape for sessionize
            out = base.crossJoin(reps_df).select(
                (F.col("event_id") + F.col("rep") * n).alias("event_id"),
                F.col("ts"),
                (F.col("user_id") * amp + F.col("rep")).alias("user_id"),
                "event_type", "value", "props",
            )
        else:
            if perturb == "rotate":
                # amp-LINEAR workload (VERDICT r04 #1): a per-rep SIGNED
                # PERMUTATION of dims. Intra-rep cosines are EXACTLY
                # invariant (sum sign_i^2 x[p(i)] y[p(i)] == x.y), so each
                # rep contributes the base corpus's own near-dup pairs —
                # output grows linearly in amp by construction — while
                # cross-rep copies of one vector decorrelate (cos(u, Pu)
                # ~ 0 for a pseudo-random signed permutation). The earlier
                # sine-offset "random" mode kept reps phase-correlated
                # (sin(0.7*64) aliases to a 0.82 rad shift per rep) and
                # measured QUADRATIC (rows x3.98 at amp x2).
                a = (F.col("rep") * 7919) % 32 * 2 + 1  # odd -> bijection mod 64
                b = (F.col("rep") * 104729) % 64
                idx = F.sequence(F.lit(0), F.lit(63))
                perm = lambda i: F.element_at(
                    F.col("embedding"), (F.pmod(i * a + b, F.lit(64)) + 1).cast("int")
                )
                sign = lambda i: F.when(
                    F.pmod(F.xxhash64(i, F.col("rep")), F.lit(2)) == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0))
                emb = F.transform(idx, lambda i: perm(i) * sign(i))
                # the base corpus has NO intra pairs at threshold 0.8
                # (the quadratic mode's output was all cross-rep pairs),
                # so plant exactly ONE near-dup twin per (vector, rep):
                # a small deterministic jitter (cos ~ 0.999). Output =
                # amp x n x recall — linear in amp by construction.
                jit = F.transform(
                    emb,
                    lambda x, i: x
                    + F.lit(0.01) * F.sin((F.col("rep") + 1) * (i + 3) * F.lit(2.39996)),
                )
                rotated = base.crossJoin(reps_df)
                out = rotated.select(
                    (F.col("vec_id") + F.col("rep") * (n * 10)).alias("vec_id"),
                    emb.alias("embedding"),
                ).unionByName(
                    rotated.select(
                        (
                            F.col("vec_id") + F.col("rep") * (n * 10) + n * amp * 100
                        ).alias("vec_id"),
                        jit.alias("embedding"),
                    )
                )
                out.repartition(32).write.mode("overwrite").parquet(path)
                return spark.read.parquet(path)
            elif perturb == "random":
                emb = F.transform(
                    F.col("embedding"),
                    lambda x, i: x + F.lit(eps) * F.sin(
                        (F.col("rep") * 64 + i + 1) * F.lit(0.7)
                    ) / F.lit(8.0),
                )
            else:
                emb = F.transform(
                    F.col("embedding"),
                    lambda x, i: x + F.col("rep") * F.when(
                        i == 0, F.lit(eps)
                    ).otherwise(0.0),
                )
            out = base.crossJoin(reps_df).select(
                (F.col("vec_id") + F.col("rep") * (n * 10)).alias("vec_id"),
                emb.alias("embedding"),
            )
        out.repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)

def build(op):
    if op == "minhash_lsh":
        docs = stage_amplified("documents", amp)
        return lambda: dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).count()
    if op == "simhash":
        docs = stage_amplified("documents", amp)
        return lambda: dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=3).count()
    if op == "ngram_jaccard":
        docs = stage_amplified("documents", amp)
        return lambda: dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).count()
    if op == "embedding_neardup":
        embs = stage_amplified("embeddings", amp)
        # constant-occupancy hash width (rotate mode): with n_planes
        # FIXED, doubling the corpus doubles per-bucket occupancy and
        # QUADRUPLES candidate pairs — a workload artifact, not operator
        # scaling. Production sizes the hash so buckets stay ~constant:
        # n_planes ~ log2(n/target_occupancy). The quadratic legacy modes
        # keep the fixed width for continuity with rounds 3-4.
        if perturb == "rotate":
            import math

            n_vec = embs.count()
            planes = max(8, min(20, int(math.ceil(math.log2(max(n_vec, 16) / 4.0)))))
        else:
            planes = 8
        return lambda: sim.embedding_near_duplicates(
            embs, dim=64, threshold=0.8, n_planes=planes, n_tables=6
        ).count()
    if op == "embedding_neardup_cand":
        # banding/candidate-generation phase ONLY (VERDICT r04 #1): same
        # signatures/banding/dedup subtree as embedding_neardup, no
        # verify attach — run back-to-back with the full op in one
        # campaign window and difference the walls to attribute phases
        embs = stage_amplified("embeddings", amp)
        if perturb == "rotate":
            import math

            n_vec = embs.count()
            planes = max(8, min(20, int(math.ceil(math.log2(max(n_vec, 16) / 4.0)))))
        else:
            planes = 8
        base = embs.select(
            F.col("vec_id").alias("vid"), F.col("embedding").alias("emb")
        )
        return lambda: sim.neardup_candidate_ids(
            base, dim=64, n_planes=planes, n_tables=6
        ).count()
    if op == "ivf_topk":
        embs = stage_amplified("embeddings", amp)
        probes = embs.filter(F.col("vec_id") % 97 == 3).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        cents = sim.train_ivf_centroids(embs, dim=64, n_centroids=32)
        return lambda: sim.ivf_topk(
            embs, probes, dim=64, k=5, n_centroids=32, n_probe=4, centroids=cents
        ).count()
    # ---- r7/r8 operator batch (VERDICT r07 #6). These are forced with
    # a NOOP SINK, not count(): count() lets Catalyst prune the expensive
    # column (span reassembly, window session ids, the packed offsets),
    # so a count-based row would time the skeleton, not the operator.
    def sink(df):
        df.write.format("noop").mode("overwrite").save()
        return None

    if op == "vocab":
        docs = stage_amplified("documents", amp)
        return lambda: sink(text_ops.vocab_stats(docs))
    if op == "span_dedup":
        docs = stage_amplified("documents", amp)
        return lambda: sink(dedup.dedup_spans(docs, "doc_id", "text", k=3, min_count=2))
    if op == "decontaminate":
        docs = stage_amplified("documents", amp)
        bench = docs.filter(F.col("doc_id") % 17 == 0)
        corpus = docs.filter(F.col("doc_id") % 17 != 0)
        return lambda: sink(dedup.decontaminate(corpus, bench, k=3))
    if op == "quality_filter":
        docs = stage_amplified("documents", amp)
        return lambda: sink(text_ops.apply_quality_filters(docs))
    if op == "pack_chunks":
        docs = stage_amplified("documents", amp)
        toks = text_ops.with_token_stats(docs).select("doc_id", "n_tokens")
        return lambda: sink(
            sampling_ops.pack_chunks(toks, "doc_id", "n_tokens", target=64)
        )
    if op == "sessionize":
        ev = stage_amplified("events", amp)
        return lambda: sink(events_ops.sessionize(ev))
    raise SystemExit(f"unknown op {{op}}")

fn = build(op)
fn()  # warmup (also builds any persisted intermediates' lineage once)
best, rows = None, None
for _ in range(reps):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    rows = fn()
    dt = time.perf_counter() - t0
    if best is None or dt < best:
        best = dt
print(json.dumps({{"seconds": best, "rows": rows}}))
"""

OPS = ["minhash_lsh", "simhash", "ngram_jaccard", "embedding_neardup", "ivf_topk"]


def run(master: str, op: str, stage: str, sf_dir: str, amp: int, reps: int) -> dict:
    code = WORKER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", code, master, op, stage, sf_dir, str(amp), str(reps)],
        capture_output=True, text=True, cwd=str(REPO), timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"{op}@{master} failed: {out.stderr[-2000:]}")
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r.update(op=op, master=master)
    return r


def main() -> None:
    amp = int(os.environ.get("SPARK_GRAFT_LLM_AMP", "8"))
    reps = int(os.environ.get("SPARK_GRAFT_LLM_REPS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_LLM_SF", "/root/testdata/sf0.1")
    stage = os.environ.get("SPARK_GRAFT_LLM_STAGE") or tempfile.mkdtemp(
        prefix="geococo_llmscal_"
    )
    ops = sys.argv[1:] or OPS
    for op in ops:
        lo = run("local[8]", op, stage, sf_dir, amp, reps)
        hi = run("local[32]", op, stage, sf_dir, amp, reps)
        assert lo["rows"] == hi["rows"], f"{op}: row mismatch {lo['rows']} vs {hi['rows']}"
        eff = (lo["seconds"] / hi["seconds"]) / 4.0
        print(
            json.dumps(
                {
                    "op": op, "amp": amp, "rows": lo["rows"],
                    "lo_seconds": round(lo["seconds"], 2),
                    "hi_seconds": round(hi["seconds"], 2),
                    "efficiency": round(eff, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
