"""End-to-end CLI tests (reference cli.py parity: new / copy / add)."""

import builtins
import json

import pytest

from geococo_spark import cli
from geococo_spark.sources import datagen


def test_new_with_flags(spark, tmp_path):
    out = tmp_path / "ds.json"
    cli.main(["new", str(out), "--description", "desc", "--contributor", "me"])
    doc = json.loads(out.read_text())
    assert doc["info"]["description"] == "desc"
    assert doc["info"]["contributor"] == "me"
    assert doc["info"]["version"] == "0.0.0"
    assert doc["images"] == [] and doc["annotations"] == []


def test_new_prompts_like_reference(spark, tmp_path, monkeypatch):
    answers = iter(["prompted desc", "prompted contrib"])
    monkeypatch.setattr(builtins, "input", lambda _: next(answers))
    out = tmp_path / "ds.json"
    cli.main(["new", str(out)])
    doc = json.loads(out.read_text())
    assert doc["info"]["description"] == "prompted desc"
    assert doc["info"]["contributor"] == "prompted contrib"


def test_copy_update_meta(spark, tmp_path, monkeypatch):
    src = tmp_path / "src.json"
    dst = tmp_path / "dst.json"
    cli.main(["new", str(src), "--description", "old", "--contributor", "old"])
    # empty version input keeps the existing version (reference cli.py:74-76)
    answers = iter(["", "new desc", "new contrib"])
    monkeypatch.setattr(builtins, "input", lambda _: next(answers))
    cli.main(["copy", str(src), str(dst)])
    doc = json.loads(dst.read_text())
    assert doc["info"]["version"] == "0.0.0"
    assert doc["info"]["description"] == "new desc"
    assert doc["info"]["contributor"] == "new contrib"
    assert doc["info"]["year"] is not None


def test_copy_no_update_meta(spark, tmp_path):
    src = tmp_path / "src.json"
    dst = tmp_path / "dst.json"
    cli.main(["new", str(src), "--description", "keep", "--contributor", "keep"])
    cli.main(["copy", str(src), str(dst), "--no-update-meta"])
    assert json.loads(dst.read_text())["info"]["description"] == "keep"


def test_add_end_to_end(spark, tmp_path):
    images_pq = str(tmp_path / "images.parquet")
    labels_pq = str(tmp_path / "labels.parquet")
    datagen.images_df(spark, 1).write.parquet(images_pq)
    datagen.labels_df(spark).write.parquet(labels_pq)
    ds = tmp_path / "ds.json"
    out_dir = tmp_path / "out"
    cli.main(["new", str(ds), "--description", "d", "--contributor", "c"])
    cli.main(
        [
            "add", images_pq, labels_pq, str(ds), str(out_dir), "256", "256",
            "--id-attribute", "category_id", "--name-attribute", "class_names",
        ]
    )
    doc = json.loads(ds.read_text())
    assert len(doc["annotations"]) == 5  # the 5 fixture labels
    assert len(doc["images"]) == 1
    assert doc["info"]["version"] == "1.0.0"  # minor (new source) + major (new dir)
    assert (out_dir / "tiles").exists()
    # appending the same image again bumps patch only
    cli.main(
        [
            "add", images_pq, labels_pq, str(ds), str(out_dir), "256", "256",
            "--id-attribute", "category_id", "--name-attribute", "class_names",
        ]
    )
    doc2 = json.loads(ds.read_text())
    assert doc2["info"]["version"] == "1.0.1"
    assert len(doc2["annotations"]) == 10


def test_add_requires_category_attribute(spark, tmp_path):
    images_pq = str(tmp_path / "images2.parquet")
    labels_pq = str(tmp_path / "labels2.parquet")
    datagen.images_df(spark, 1).write.parquet(images_pq)
    datagen.labels_df(spark).write.parquet(labels_pq)
    ds = tmp_path / "ds2.json"
    cli.main(["new", str(ds), "--description", "d", "--contributor", "c"])
    with pytest.raises(AttributeError, match="category attribute"):
        cli.main(
            ["add", images_pq, labels_pq, str(ds), str(tmp_path / "o"), "256", "256"]
        )
