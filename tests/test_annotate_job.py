"""End-to-end smoke of the spark-submit job entry point (jobs/annotate.py
main) — parquet in, four COCO tables + z-ordered tiles out, metrics on
stdout, checkpoint resume."""

import io
import json
import sys
from contextlib import redirect_stdout

from geococo_spark.sources import datagen


def _run(argv):
    sys.path.insert(0, ".")
    from jobs import annotate

    buf = io.StringIO()
    with redirect_stdout(buf):
        annotate.main(argv)
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def test_annotate_job_end_to_end(spark, tmp_path):
    images_pq = str(tmp_path / "imgs")
    labels_pq = str(tmp_path / "lbls")
    datagen.images_df(spark, 2).write.parquet(images_pq)
    datagen.random_labels_df(spark, 300, extent=256.0, seed=7).write.parquet(labels_pq)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    res = _run(
        [
            "--images", images_pq, "--labels", labels_pq, "--output", out,
            "--checkpoint", ck, "--name-attribute", "class_names",
            "--window", "128x128",
        ]
    )
    m = res["metrics"]
    assert m["tiles_generated"] > 0 and m["annotations_emitted"] > 0
    assert res["version"] == "1.0.0"
    anns = spark.read.parquet(f"{out}/coco_annotations")
    imgs = spark.read.parquet(f"{out}/coco_images")
    tiles = spark.read.parquet(f"{out}/tiles")
    assert anns.count() == m["annotations_emitted"]
    assert imgs.count() == m["tiles_generated"] == tiles.count()
    assert "z" in tiles.columns  # z-ordered payload layout

    # resume: same checkpoint -> kernel skipped, identical table contents
    out2 = str(tmp_path / "out2")
    res2 = _run(
        [
            "--images", images_pq, "--labels", labels_pq, "--output", out2,
            "--checkpoint", ck, "--name-attribute", "class_names",
            "--window", "128x128",
        ]
    )
    assert res2["metrics"]["annotations_emitted"] == 0  # accumulators silent
    a1 = sorted(str(r) for r in anns.collect())
    a2 = sorted(str(r) for r in spark.read.parquet(f"{out2}/coco_annotations").collect())
    assert a1 == a2


def test_annotate_job_bucketed_store(spark, tmp_path):
    """Round 6 (VERDICT r05 #6): --write-bucketed-images builds the
    bucketBy(image_id) production store and runs from it; a later job
    consumes the same store via --images bucketed:DIR. Outputs must be
    identical to the plain parquet run (the plan-level no-exchange
    assert lives in test_pipeline.py::test_bucketed_images_input)."""
    import os

    images_pq = str(tmp_path / "imgs")
    labels_pq = str(tmp_path / "lbls")
    datagen.images_df(spark, 2).write.parquet(images_pq)
    datagen.random_labels_df(spark, 300, extent=256.0, seed=7).write.parquet(labels_pq)
    store = str(tmp_path / "img_store")
    base_out = str(tmp_path / "base_out")
    _run(
        [
            "--images", images_pq, "--labels", labels_pq, "--output", base_out,
            "--name-attribute", "class_names", "--window", "128x128",
        ]
    )
    out1 = str(tmp_path / "out_build")
    res1 = _run(
        [
            "--images", images_pq, "--labels", labels_pq, "--output", out1,
            "--name-attribute", "class_names", "--window", "128x128",
            "--write-bucketed-images", store,
        ]
    )
    assert res1["metrics"]["annotations_emitted"] > 0
    assert os.path.exists(os.path.join(store, "_bucket_manifest.json"))
    out2 = str(tmp_path / "out_consume")
    res2 = _run(
        [
            "--images", f"bucketed:{store}", "--labels", labels_pq,
            "--output", out2, "--name-attribute", "class_names",
            "--window", "128x128",
        ]
    )
    assert res2["metrics"]["annotations_emitted"] == res1["metrics"]["annotations_emitted"]
    base = sorted(str(r) for r in spark.read.parquet(f"{base_out}/coco_annotations").collect())
    for out in (out1, out2):
        got = sorted(str(r) for r in spark.read.parquet(f"{out}/coco_annotations").collect())
        assert got == base
