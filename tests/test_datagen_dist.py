"""Distributed synthetic-image staging (datagen.images_df_dist).

The driver-side images_df ships ~200 KB/row through py4j and wedges at
16k+ images; the distributed path must match its schema exactly, be
deterministic, and be partition-invariant (per-image seeded RNG)."""

from __future__ import annotations

import pytest

from geococo_spark import schemas
from geococo_spark.kernels import codec
from geococo_spark.sources import datagen


@pytest.fixture(scope="module")
def dist64(spark):
    return datagen.images_df_dist(spark, 64, slices=4)


def test_schema_matches_images_df(spark, dist64):
    assert dist64.schema == schemas.IMAGES
    assert dist64.schema == datagen.images_df(spark, 1).schema


def test_deterministic_and_partition_invariant(spark, dist64):
    a = {r["image_id"]: r for r in dist64.collect()}
    b = {r["image_id"]: r for r in datagen.images_df_dist(spark, 64, slices=7).collect()}
    assert sorted(a) == sorted(b) == [f"img_{i:012d}" for i in range(64)]
    for k in a:
        assert bytes(a[k]["bytes"]) == bytes(b[k]["bytes"])
        assert a[k]["phash"] == b[k]["phash"]


def test_payload_decodes_and_phash_consistent(dist64):
    row = dist64.filter("image_id = 'img_000000000007'").collect()[0]
    arr = codec.decode_image(bytes(row["bytes"]))
    assert arr.shape == (3, 256, 256)
    assert codec.phash64(arr) == row["phash"]


def test_stage_images_parquet_roundtrip(spark, tmp_path):
    staged = datagen.stage_images_parquet(spark, str(tmp_path / "imgs"), 16, files=4)
    assert staged.count() == 16
    # parquet read-back relaxes nullability; names and types must hold
    assert [(f.name, f.dataType.simpleString()) for f in staged.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in schemas.IMAGES.fields
    ]
    # idempotent: second call reads the existing table
    again = datagen.stage_images_parquet(spark, str(tmp_path / "imgs"), 16, files=4)
    assert again.count() == 16
