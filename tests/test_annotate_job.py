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
