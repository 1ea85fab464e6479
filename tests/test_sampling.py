"""Sampling / splitting / packing operators (operators/sampling.py).

Each operator is pinned against an independent pure-Python reference on
a deterministic fixture; edge cases cover empty strata, tiny strata,
zero-token docs, and the chunk-boundary arithmetic.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from geococo_spark.operators import sampling


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _docs(spark, n=200, langs=("en", "de", "fr")):
    rows = [(i, langs[i % len(langs)], f"src{i % 5}", (i * 7) % 23) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "lang", "source", "n_tokens"])


# ---------------------------------------------------------------- hash_split


def test_hash_split_matches_python_reference(spark):
    df = sampling.hash_split(_docs(spark), "doc_id", seed="s7")
    got = {r["doc_id"]: (r["bucket"], r["split"]) for r in df.collect()}
    for i in range(200):
        b = _h60(f"s7:{i}") % 10_000
        exp = "train" if b < 9000 else ("val" if b < 9500 else "test")
        assert got[i] == (b, exp), i


def test_hash_split_is_append_stable(spark):
    # adding rows must not move existing assignments
    small = sampling.hash_split(_docs(spark, n=50), "doc_id", seed="s7")
    big = sampling.hash_split(_docs(spark, n=200), "doc_id", seed="s7")
    s = {r["doc_id"]: r["split"] for r in small.collect()}
    b = {r["doc_id"]: r["split"] for r in big.collect()}
    assert all(b[k] == v for k, v in s.items())


def test_hash_split_is_projection_only(spark):
    plan = sampling.hash_split(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_split_rejects_bad_weights(spark):
    with pytest.raises(ValueError):
        sampling.hash_split(_docs(spark), weights_bp=[("a", 5000), ("b", 4000)])


# ---------------------------------------------------------- stratified_split


def test_stratified_split_exact_proportions(spark):
    # 200 docs over 3 langs: en 67, de 67, fr 66 — exact integer cuts
    df = sampling.stratified_split(_docs(spark), "doc_id", "lang", seed="s7")
    counts = {
        (r["lang"], r["split"]): r["n"]
        for r in df.groupBy("lang", "split").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in (("en", 67), ("de", 67), ("fr", 66)):
        tr = (9000 * n) // 10_000
        va = (9500 * n) // 10_000 - tr
        te = n - tr - va
        assert counts.get((lang, "train"), 0) == tr, lang
        assert counts.get((lang, "val"), 0) == va, lang
        assert counts.get((lang, "test"), 0) == te, lang


def test_stratified_split_matches_python_reference(spark):
    df = sampling.stratified_split(_docs(spark, n=61), "doc_id", "lang", seed="q")
    got = {r["doc_id"]: r["split"] for r in df.collect()}
    by_lang: dict[str, list[int]] = {}
    for i in range(61):
        by_lang.setdefault(("en", "de", "fr")[i % 3], []).append(i)
    exp = {}
    for _lang, ids in by_lang.items():
        ranked = sorted(ids, key=lambda i: (hashlib.md5(f"q:{i}".encode()).hexdigest(), i))
        n = len(ranked)
        for rn, i in enumerate(ranked, start=1):
            if rn * 10_000 <= 9000 * n:
                exp[i] = "train"
            elif rn * 10_000 <= 9500 * n:
                exp[i] = "val"
            else:
                exp[i] = "test"
    assert got == exp


def test_stratified_split_tiny_stratum(spark):
    # a 1-row stratum: rank 1*10000 <= 9000*1 is false -> falls to last split
    df = spark.createDataFrame([(1, "zz"), (2, "en"), (3, "en")], ["doc_id", "lang"])
    out = {r["doc_id"]: r["split"] for r in
           sampling.stratified_split(df, "doc_id", "lang").collect()}
    assert out[1] == "test"


# ------------------------------------------------------------ balanced_sample


def test_balanced_sample_caps_and_is_deterministic(spark):
    df = _docs(spark)  # 5 sources x 40 docs
    out = sampling.balanced_sample(df, "source", "doc_id", n_per_group=7, seed="b")
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["source"], []).append(r["doc_id"])
    assert all(len(v) == 7 for v in per.values())
    # python reference: first 7 in md5 order per source
    for src, ids in per.items():
        all_ids = [i for i in range(200) if f"src{i % 5}" == src]
        ranked = sorted(all_ids, key=lambda i: (hashlib.md5(f"b:{i}".encode()).hexdigest(), i))
        assert sorted(ids) == sorted(ranked[:7]), src


def test_balanced_sample_small_groups_untouched(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["doc_id", "source"])
    out = sampling.balanced_sample(df, "source", "doc_id", n_per_group=10)
    assert out.count() == 3


# ---------------------------------------------------------------- pack_chunks


def _pack_reference(rows, target):
    # rows: [(id, n_tokens)] -> {id: (start, chunk, offset)} by id order
    run = 0
    exp = {}
    for i, n in sorted(rows):
        exp[i] = (run, run // target, run % target)
        run += n
    return exp


def test_pack_chunks_matches_python_reference(spark):
    rows = [(i, (i * 7) % 23) for i in range(200)]
    out = sampling.pack_chunks(_docs(spark), "doc_id", "n_tokens", target=64)
    got = {r["doc_id"]: (r["start_tok"], r["chunk_id"], r["chunk_offset"])
           for r in out.collect()}
    assert got == _pack_reference(rows, 64)


def test_pack_chunks_zero_token_docs_and_boundaries(spark):
    # doc of exactly target tokens -> next doc starts at offset 0 of next chunk;
    # zero-token docs share the start position of their successor
    df = spark.createDataFrame(
        [(1, 64), (2, 0), (3, 0), (4, 10), (5, 54), (6, 5)],
        ["doc_id", "n_tokens"],
    )
    out = {r["doc_id"]: (r["chunk_id"], r["chunk_offset"])
           for r in sampling.pack_chunks(df, "doc_id", "n_tokens", target=64).collect()}
    assert out == {1: (0, 0), 2: (1, 0), 3: (1, 0), 4: (1, 0), 5: (1, 10), 6: (2, 0)}


def test_pack_chunks_partition_invariance(spark):
    # result depends only on global id order, not on partitioning
    df = _docs(spark, n=97)
    a = sampling.pack_chunks(df, target=50, num_partitions=1)
    b = sampling.pack_chunks(df.repartition(13), target=50, num_partitions=7)
    ga = sorted((r["doc_id"], r["chunk_id"], r["chunk_offset"]) for r in a.collect())
    gb = sorted((r["doc_id"], r["chunk_id"], r["chunk_offset"]) for r in b.collect())
    assert ga == gb


# ------------------------------------------------------------ take_token_budget


def test_take_token_budget_matches_python_reference(spark):
    df = _docs(spark)  # n_tokens = (i*7) % 23
    out = sampling.take_token_budget(df, "doc_id", "n_tokens", budget=500, seed="tb")
    got = {r["doc_id"]: r["tokens_before"] for r in out.collect()}
    ranked = sorted(range(200), key=lambda i: hashlib.md5(f"tb:{i}".encode()).hexdigest())
    exp, cum = {}, 0
    for i in ranked:
        n = (i * 7) % 23
        if cum + n > 500:
            break  # strictly prefix semantics: first overflow ends the sample
        exp[i] = cum
        cum += n
    assert got == exp and 0 < len(got) < 200


def test_take_token_budget_zero_budget_and_partition_invariance(spark):
    df = _docs(spark, n=97)
    assert sampling.take_token_budget(df, budget=0).count() == 0
    a = sampling.take_token_budget(df, budget=400, num_partitions=1)
    b = sampling.take_token_budget(df.repartition(13), budget=400, num_partitions=7)
    ka = sorted((r["doc_id"], r["tokens_before"]) for r in a.collect())
    kb = sorted((r["doc_id"], r["tokens_before"]) for r in b.collect())
    assert ka == kb
