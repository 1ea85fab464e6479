"""Round-7 in-window A/B: trimmed kernel Arrow payload vs the r6 kernel.

Change under test (VERDICT r06 next-round #1): the kernel stage spent
~75% of its slot time outside the kernel body at 512 images / 32 cores,
dominated by serializing the result back to the JVM. The working tree
trims KERNEL_OUT — tile_name and rle_size are derived JVM-side, the
bbox list became four scalar columns, row_type became a boolean, and
all nullable numerics cross Arrow as float64 numpy columns instead of
object columns (the old per-column tile/ann concat boxed every mixed
column per batch).

Because the change spans tile_kernel + schemas + ids + pipeline, the
old arm is the WHOLE HEAD TREE extracted via ``git archive`` — each arm
runs ``tools/profile_pipeline.py`` from its own tree in a fresh JVM, so
nothing is monkeypatched and both arms exercise their real plans.

Interleaved in ONE window (old/new alternating, 3 reps per arm per
parallelism), plus a final-output equality gate: both arms build the
same 48-image dataset and must produce identical images + annotations
tables (md5 over the sorted canonical JSON, RLE bytes hex-encoded).

Run from /root/repo (~8 min):
    python tools/ab_kernel_payload_r7.py [old_commit]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OLD_TREE = "/tmp/ab_r7_old_tree"

_HASH_SNIPPET = r"""
import hashlib, json, sys
from geococo_spark import pipeline
from geococo_spark.coco import CocoState
from geococo_spark.session import get_spark
from geococo_spark.sources import datagen

spark = get_spark(app_name="abhash", master="local[8]",
                  shuffle_partitions=8, arrow_batch_rows=64)
spark.sparkContext.setLogLevel("ERROR")
images = datagen.stage_images_parquet(
    spark, "/tmp/ab_r7_hash_images", 48, files=8)
labels = datagen.random_labels_df(spark, 3000, extent=1000.0, seed=9)
state = CocoState.create(spark)
state = pipeline.append_dataset(
    spark, state, images, labels,
    images_dir="bench_images", window_bounds=[(128, 128), (256, 256)],
    id_attribute="category_id", name_attribute="class_names")


def canon(df, order):
    rows = [r.asDict(recursive=True) for r in df.collect()]

    def fix(v):
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        if isinstance(v, dict):
            return {k: fix(x) for k, x in sorted(v.items())}
        if isinstance(v, list):
            return [fix(x) for x in v]
        if isinstance(v, float):
            return round(v, 6)
        return v

    rows = sorted((fix(r) for r in rows), key=lambda r: r[order])
    return hashlib.md5(
        json.dumps(rows, sort_keys=True).encode()).hexdigest()


print(json.dumps({
    "images": canon(state.images, "id"),
    "annotations": canon(state.annotations, "id"),
}))
"""


def _extract_old_tree(commit: str) -> None:
    if os.path.exists(os.path.join(OLD_TREE, "tools", "profile_pipeline.py")):
        return
    os.makedirs(OLD_TREE, exist_ok=True)
    tar = subprocess.Popen(["git", "archive", commit], cwd=REPO,
                           stdout=subprocess.PIPE)
    subprocess.run(["tar", "-x", "-C", OLD_TREE], stdin=tar.stdout, check=True)
    tar.wait()


def _profile(tree: str, cores: int, n_images: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_PROFILE_KERNEL_PHASES="1",
               SPARK_GRAFT_SCALING_STAGE="/tmp/ab_r7_stage")
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "tools", "profile_pipeline.py"),
         str(cores), str(n_images)],
        env=env, check=True, capture_output=True, text=True, cwd=tree,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def _hash_outputs(tree: str) -> dict:
    env = dict(os.environ, PYTHONPATH=tree)
    out = subprocess.run(
        [sys.executable, "-c", _HASH_SNIPPET],
        env=env, check=True, capture_output=True, text=True, cwd=tree,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    old_commit = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    _extract_old_tree(old_commit)

    h_old = _hash_outputs(OLD_TREE)
    h_new = _hash_outputs(REPO)
    identical = h_old == h_new
    print(f"# outputs_identical={identical} old={h_old} new={h_new}",
          flush=True)
    assert identical, "old/new arms disagree on final COCO tables"

    out: dict = {"outputs_identical": True, "old_commit": old_commit}
    for p, n in ((8, 512), (32, 512)):
        for arm, tree in (("old", OLD_TREE), ("new", REPO)):
            out[f"{arm}_total_{p}"] = []
            out[f"{arm}_kernel_{p}"] = []
        for rep in range(3):
            for arm, tree in (("old", OLD_TREE), ("new", REPO)):
                r = _profile(tree, p, n)
                out[f"{arm}_total_{p}"].append(r["total"])
                out[f"{arm}_kernel_{p}"].append(r.get("kernel", r["total"]))
                print(f"# p={p} rep={rep} {arm}: {json.dumps(r)}", flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    for p in (8, 32):
        for k in ("total", "kernel"):
            o, nw = med(out[f"old_{k}_{p}"]), med(out[f"new_{k}_{p}"])
            out[f"ratio_{k}_{p}"] = round(nw / o, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
