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


class TestAudio:
    def test_sine_wave_features(self, spark):
        """440 Hz sine at 8 kHz: dominant frequency lands on 440, RMS ==
        amplitude/sqrt(2), duration exact."""
        sr, secs, freq, amp = 8000, 2, 440, 10000
        t = np.arange(sr * secs) / sr
        wave = (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)
        df = spark.createDataFrame(
            [
                Row(media_id="a0", bytes=bytearray(codec.encode_audio(wave[None, :], sr))),
                Row(media_id="bad", bytes=bytearray(b"\x00\x01garbage")),
            ]
        )
        rows = {r.media_id: r for r in multimodal.extract_audio_features(df).collect()}
        a = rows["a0"]
        assert a.decode_error is None
        assert a.sample_rate == sr and a.channels == 1
        assert a.duration_s == 2.0
        assert abs(a.dominant_freq_hz - freq) < 1.0
        assert abs(a.rms - amp / np.sqrt(2)) < 20  # int16 quantization
        assert abs(a.zero_crossings - 2 * freq * secs) <= 2
        # decode failure is a row, not a task failure (F6 pattern)
        assert rows["bad"].decode_error is not None
        assert rows["bad"].rms is None

    def test_stereo_roundtrip(self, spark):
        sr = 4000
        stereo = np.vstack([
            np.full(sr, 1000, dtype=np.int16), np.full(sr, -1000, dtype=np.int16)
        ])
        samples, back_sr = codec.decode_audio(codec.encode_audio(stereo, sr))
        assert back_sr == sr
        np.testing.assert_array_equal(samples, stereo)
        df = spark.createDataFrame(
            [Row(media_id="s", bytes=bytearray(codec.encode_audio(stereo, sr)))]
        )
        r = multimodal.extract_audio_features(df).first()
        assert r.channels == 2 and r.n_samples == sr
        assert r.rms == 0.0  # channels cancel in the mono mixdown


class TestBoundedArrowBatches:
    def test_rows_for_payload_sizing(self):
        from geococo_spark.operators.multimodal import arrow_rows_for_payload

        assert arrow_rows_for_payload(1 << 20) == 64          # 64MB / 1MB
        assert arrow_rows_for_payload(32 << 20) == 8          # clamped lo
        assert arrow_rows_for_payload(100) == 1024            # clamped hi
        assert arrow_rows_for_payload(0) == 1024

    def test_scope_bounds_batches_and_restores(self, spark):
        """ADVICE r02: per-task Arrow batch memory for fat-payload
        mapInPandas is rows x payload; the scope must actually shrink the
        batches the UDF sees and restore the session conf afterwards."""
        import pandas as pd

        from geococo_spark.operators.multimodal import bounded_arrow_batches

        key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        before = spark.conf.get(key)
        df = spark.range(64).selectExpr("id", "repeat('x', 100) AS payload")

        def batch_sizes(batches):
            for pdf in batches:
                yield pd.DataFrame({"n": [len(pdf)]})

        # pretend each row is 8 MB -> 64MB target / 8MB = 8 rows per batch
        with bounded_arrow_batches(spark, payload_bytes=8 << 20):
            assert spark.conf.get(key) == "8"
            sizes = [r.n for r in df.repartition(1).mapInPandas(batch_sizes, "n long").collect()]
        assert max(sizes) <= 8 and sum(sizes) == 64
        assert spark.conf.get(key) == before


def test_zero_sample_audio_is_data_not_error(spark):
    import numpy as np
    empty = codec.encode_audio(np.zeros((1, 0), np.int16), 44100)
    df = spark.createDataFrame([Row(media_id="e", bytes=bytearray(empty))])
    r = multimodal.extract_audio_features(df).first()
    assert r.decode_error is None
    assert r.n_samples == 0 and r.duration_s == 0.0 and r.dominant_freq_hz == 0.0
