"""Parity tests for the tiling operators (T1-T5) against the reference's
golden values in tests/test_utils.py and tests/test_window_schema.py."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geococo_spark.operators import grid
from geococo_spark.operators.grid import WindowSchemaSpec

IDENTITY = (1.0, 0.0, 0.0, 0.0, -1.0, 0.0)


def np_offsets(col_off, row_off, width, height, schema: WindowSchemaSpec) -> np.ndarray:
    """Reference formula (geococo/utils.py:106-128) re-run in numpy."""
    col_range = np.arange(
        max(0, col_off - schema.width_overlap),
        width + col_off - schema.width_overlap,
        schema.width_step,
    )
    row_range = np.arange(
        max(0, row_off - schema.height_overlap),
        height + row_off - schema.height_overlap,
        schema.height_step,
    )
    return np.array(np.meshgrid(col_range, row_range)).T.reshape(-1, 2)


class TestWindowSchemaSpec:
    def test_step_derivation(self):
        s = WindowSchemaSpec(100, 100, 10, 20)
        assert s.width_step == 80 and s.height_step == 60

    @pytest.mark.parametrize("w,o", [(100, 50), (100, 60), (1, 1)])
    def test_invalid_step_raises(self, w, o):
        # reference tests/test_window_schema.py:21-33 — step <= 0 rejected
        with pytest.raises(ValueError):
            WindowSchemaSpec(w, w, o, o)

    def test_string_dims_rejected(self):
        # reference tests/test_window_schema.py:36-48
        with pytest.raises(ValueError):
            WindowSchemaSpec("100", 100, 10, 10)  # type: ignore[arg-type]

    def test_negative_window_rejected(self):
        with pytest.raises(ValueError):
            WindowSchemaSpec(-5, 5, 0, 0)


class TestWindowIntersect:
    def test_golden_9_9_82_82(self):
        # reference tests/test_utils.py:62-74: 256x256 raster at origin,
        # labels = buffered points -> extent (9, -91, 91, -9)
        res = grid.window_intersect(
            raster_bounds=(0.0, -256.0, 256.0, 0.0),
            vector_bounds=(9.0, -91.0, 91.0, -9.0),
            transform=IDENTITY,
        )
        assert res == (9.0, 9.0, 82.0, 82.0)

    def test_disjoint_raises(self):
        with pytest.raises(ValueError, match="don't overlap"):
            grid.window_intersect(
                raster_bounds=(0.0, -256.0, 256.0, 0.0),
                vector_bounds=(509.0, -591.0, 591.0, -509.0),
                transform=IDENTITY,
            )


class TestEstimateSchema:
    def test_overlap_from_quantile(self):
        # fixture avg extent at q=0.9 is 7.2 -> overlap ceil(7.2)=8
        s = grid.estimate_schema(7.2, 7.2, (1.0, 1.0), [(256, 256), (512, 512)])
        assert s.width_overlap == 8 and s.width_window == 256
        assert s.width_step == 240

    def test_fallback_to_larger_window(self):
        # overlap 60 invalidates (100,100) (step=-20) but not (256,256)
        s = grid.estimate_schema(60.0, 60.0, (1.0, 1.0), [(100, 100), (256, 256)])
        assert s.width_window == 256

    def test_no_candidate_raises(self):
        # reference tests/test_utils.py:185-201
        with pytest.raises(ValueError, match="No WindowSchema"):
            grid.estimate_schema(60.0, 60.0, (1.0, 1.0), [(100, 100), (14, 14)])


class TestExplodeWindowGrid:
    def _grid_df(self, spark, parent, schema, boundless=True):
        df = spark.createDataFrame(
            [
                Row(
                    parent_col_off=parent[0],
                    parent_row_off=parent[1],
                    parent_width=parent[2],
                    parent_height=parent[3],
                )
            ]
        )
        return grid.explode_window_grid(df, schema, boundless=boundless)

    @pytest.mark.parametrize(
        "parent,window,overlap",
        [
            ((9, 9, 82, 82), 100, 10),
            ((9, 9, 82, 82), 15, 3),
            ((0, 0, 256, 256), 100, 20),
            ((0, 0, 256, 256), 256, 8),
            ((5, 7, 30, 40), 10, 2),
        ],
    )
    def test_matches_numpy_arange(self, spark, parent, window, overlap):
        schema = WindowSchemaSpec(window, window, overlap, overlap)
        expected = np_offsets(*parent, schema)
        got = (
            self._grid_df(spark, parent, schema)
            .select("col_off", "row_off")
            .orderBy("col_off", "row_off")
            .collect()
        )
        exp_sorted = expected[np.lexsort((expected[:, 1], expected[:, 0]))]
        assert [(r.col_off, r.row_off) for r in got] == [tuple(map(int, e)) for e in exp_sorted]

    def test_offsets_invariants(self, spark):
        # reference tests/test_utils.py:204-246: all >= 0, within extent+window
        parent = (9, 9, 82, 82)
        schema = WindowSchemaSpec(100, 100, 10, 10)
        rows = self._grid_df(spark, parent, schema).collect()
        assert len(rows) > 0
        for r in rows:
            assert r.col_off >= 0 and r.row_off >= 0
            assert r.col_off <= parent[0] + parent[2]
            assert r.row_off <= parent[1] + parent[3]

    def test_boundless_overhang_vs_clipped(self, spark):
        # reference tests/test_utils.py:249-290
        parent = (0, 0, 100, 100)
        schema = WindowSchemaSpec(60, 60, 5, 5)
        boundless = self._grid_df(spark, parent, schema, boundless=True).collect()
        clipped = self._grid_df(spark, parent, schema, boundless=False).collect()
        assert any(r.col_off + r.width > 100 or r.row_off + r.height > 100 for r in boundless)
        assert all(r.width == 60 and r.height == 60 for r in boundless)
        for r in clipped:
            assert r.col_off + r.width <= 100 and r.row_off + r.height <= 100
        assert len(boundless) == len(clipped)

    def test_empty_when_no_room(self, spark):
        # degenerate parent narrower than one step from the clamp start
        parent = (0, 0, 0, 0)
        schema = WindowSchemaSpec(10, 10, 0, 0)
        assert self._grid_df(spark, parent, schema).count() == 0


class TestWindowBounds:
    def test_polygon_bounds_formula(self, spark):
        # reference tests/test_utils.py:126-135: window (o, o, s, s) on the
        # identity north-up grid -> bounds (o, -s-o, s+o, -o)
        for offset, span in [(0, 10), (5, 20), (17, 3)]:
            df = spark.createDataFrame(
                [Row(col_off=offset, row_off=offset, width=span, height=span)]
            ).withColumn(
                "transform",
                F.struct(
                    F.lit(1.0).alias("a"), F.lit(0.0).alias("b"), F.lit(0.0).alias("c"),
                    F.lit(0.0).alias("d"), F.lit(-1.0).alias("e"), F.lit(0.0).alias("f"),
                ),
            )
            r = grid.with_window_bounds(df).first()
            assert (r.tile_minx, r.tile_miny, r.tile_maxx, r.tile_maxy) == (
                offset, -span - offset, span + offset, -offset,
            )


class TestEstimateAverageBounds:
    def test_quantile_goldens(self, spark):
        # reference tests/test_utils.py:144-154 — widths/heights 2,4,6,8,2
        centers = [(10, -10), (30, -30), (50, -50), (70, -70), (90, -90)]
        buffers = [1, 2, 3, 4, 1]
        rows = [
            Row(minx=float(cx - b), miny=float(cy - b), maxx=float(cx + b), maxy=float(cy + b))
            for (cx, cy), b in zip(centers, buffers)
        ]
        labels = spark.createDataFrame(rows)
        for q, expected in [(0.1, 2.0), (0.5, 4.0), (0.6, 4.8), (0.8, 6.4), (0.9, 7.2)]:
            w, h = grid.estimate_average_bounds(labels, q)
            assert w == pytest.approx(expected)
            assert h == pytest.approx(expected)
