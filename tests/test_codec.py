"""Unit tests for the image codec kernels (R3/R4/R8/R9 + phash/psnr)."""

import numpy as np
import pytest

from geococo_spark.kernels import codec


class TestRawCodec:
    def test_lossless_roundtrip(self):
        rng = np.random.RandomState(0)
        arr = (rng.rand(3, 17, 23) * 256).astype(np.uint8)
        assert np.array_equal(codec.decode_image(codec.encode_image(arr, "raw")), arr)

    def test_dtypes(self):
        for dt in (np.uint8, np.uint16, np.float32):
            arr = np.ones((1, 4, 4), dtype=dt)
            out = codec.decode_image(codec.encode_image(arr, "raw"))
            assert out.dtype == dt

    def test_unknown_magic_raises(self):
        with pytest.raises(NotImplementedError, match="STUB"):
            codec.decode_image(b"\xff\xd8\xff\xe0 not actually jpeg")


class TestFakeJpeg:
    def test_psnr_above_gate(self):
        # the lossy stand-in must clear the 40 dB gate (BASELINE.json:15)
        rng = np.random.RandomState(1)
        arr = (rng.rand(3, 64, 64) * 256).astype(np.uint8)
        out = codec.decode_image(codec.encode_image(arr, "jpeg"))
        assert out.shape == arr.shape and out.dtype == np.uint8
        assert codec.psnr(arr, out) >= 40.0

    def test_deterministic(self):
        arr = (np.arange(3 * 8 * 8) % 256).reshape(3, 8, 8).astype(np.uint8)
        assert codec.encode_image(arr, "jpeg") == codec.encode_image(arr, "jpeg")

    def test_nonuint8_rejected(self):
        with pytest.raises(ValueError):
            codec.encode_image(np.zeros((1, 2, 2), dtype=np.float32), "jpeg")


class TestNormalize:
    def test_uint8_passthrough_untouched(self):
        # reference gate: only non-uint8 normalized (coco_processing.py:125)
        arr = np.array([[[5, 10]]], dtype=np.uint8)
        out = codec.normalize_minmax_uint8(arr)
        assert out is arr

    def test_minmax_scaling(self):
        arr = np.array([[[0.0, 0.5, 1.0]]], dtype=np.float64)
        out = codec.normalize_minmax_uint8(arr)
        assert out.tolist() == [[[0, 128, 255]]]
        assert out.dtype == np.uint8

    def test_constant_input(self):
        out = codec.normalize_minmax_uint8(np.full((1, 2, 2), 7.0))
        assert out.sum() == 0


class TestReshape:
    def test_pad_bottom_right(self):
        # reference tests/test_utils.py:87-123
        arr = np.ones((2, 3, 3), dtype=np.uint8)
        out = codec.reshape_image(arr, (2, 5, 5), padding_value=9)
        assert out.shape == (2, 5, 5)
        assert (out[:, :3, :3] == 1).all()
        assert (out[:, 3:, :] == 9).all() and (out[:, :, 3:] == 9).all()

    def test_slice_top_left(self):
        arr = np.arange(2 * 5 * 5).reshape(2, 5, 5)
        out = codec.reshape_image(arr, (2, 3, 3))
        assert np.array_equal(out, arr[:, :3, :3])

    def test_dim_mismatch_raises(self):
        with pytest.raises(ValueError, match="dimensions"):
            codec.reshape_image(np.ones((3, 3)), (1, 3, 3))


class TestHashes:
    def test_phash_stability_and_sensitivity(self):
        rng = np.random.RandomState(2)
        a = (rng.rand(3, 64, 64) * 256).astype(np.uint8)
        assert codec.phash64(a) == codec.phash64(a)
        # small noise -> same or near hash; gross change -> different
        b = np.rot90(a, axes=(1, 2)).copy()
        assert codec.phash64(a) != codec.phash64(b)

    def test_psnr_identical_inf(self):
        a = np.zeros((1, 4, 4), dtype=np.uint8)
        assert codec.psnr(a, a) == float("inf")
