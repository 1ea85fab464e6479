"""Multimodal binary-column kernels: decode/feature/resize/frame-sample
plumbing over mapInPandas."""

import numpy as np
import pytest
from pyspark.sql import Row

from geococo_spark.kernels import codec
from geococo_spark.operators import multimodal
from geococo_spark.sources import datagen


@pytest.fixture(scope="module")
def image_table(spark):
    return spark.createDataFrame(
        datagen.make_image_rows(4, width=64, height=48), datagen.schemas.IMAGES
    ).cache()


class TestFeatures:
    def test_extract_features(self, spark, image_table):
        out = {r.image_id: r for r in multimodal.extract_image_features(image_table).collect()}
        assert len(out) == 4
        r = out["img_000000000000"]
        assert (r.bands, r.height, r.width) == (3, 64, 48)
        assert 100 < r.mean_px < 160  # uniform random uint8
        assert r.decode_error is None
        assert r.phash != 0

    def test_decode_error_captured_not_fatal(self, spark):
        df = spark.createDataFrame(
            [Row(image_id="bad", bytes=bytearray(b"\x00\x01\x02\x03garbage"))]
        )
        rows = multimodal.extract_image_features(df).collect()
        assert len(rows) == 1
        assert rows[0].decode_error is not None
        assert rows[0].bands is None


class TestResize:
    def test_resize_shape_and_determinism(self, spark, image_table):
        out = multimodal.resize_images(image_table, 16, 16).collect()
        assert len(out) == 4
        for r in out:
            arr = codec.decode_image(bytes(r.bytes))
            assert arr.shape == (3, 16, 16)
        again = multimodal.resize_images(image_table, 16, 16).collect()
        assert sorted(bytes(r.bytes) for r in out) == sorted(bytes(r.bytes) for r in again)


class TestFrameSample:
    def test_sample_every_n(self, spark):
        # fake container: 24 frames of 8x8 as the engine raw format
        arr = (np.arange(24 * 8 * 8) % 251).reshape(24, 8, 8).astype(np.uint8)
        df = spark.createDataFrame(
            [Row(media_id="vid0", bytes=bytearray(codec.encode_image(arr, "raw")))]
        )
        frames = multimodal.sample_frames(df, every_n=10).collect()
        assert sorted(r.frame_idx for r in frames) == [0, 10, 20]
        f0 = codec.decode_image(bytes(frames[0].frame_bytes))
        assert f0.shape == (1, 8, 8)
