"""Direct unit tests for the fused tile kernel (no Spark session).

Pins the per-label patch rasterization against direct per-tile
rasterization — in particular for non-north-up transforms (e > 0,
a < 0), which the patch bbox math must handle sign-agnostically
(ADVICE r01: the old max/min pairing collapsed the patch to height 1
for south-up rasters and silently emitted empty masks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geococo_spark.geometry import rasterize, rle, wkb
from geococo_spark.kernels import codec
from geococo_spark.kernels.tile_kernel import run_tile_kernel

W = H = 64


def _image_pdf(transform: tuple) -> pd.DataFrame:
    rng = np.random.RandomState(3)
    data = (rng.rand(3, W, H) * 256).astype("uint8")
    a, b, c, d, e, f = transform
    return pd.DataFrame(
        [
            {
                "image_id": "img_t",
                "bytes": codec.encode_image(data, "raw"),
                "w": W,
                "h": H,
                "fmt": "raw",
                "caption": "cap",
                "phash": 0,
                "transform": {"a": a, "b": b, "c": c, "d": d, "e": e, "f": f},
                "crs": "EPSG:3857",
                "nodata": 0,
                "bands": 3,
            }
        ]
    )


def _pairs_pdf(rings: list[np.ndarray], tiles: list[tuple]) -> pd.DataFrame:
    geom = wkb.encode_polygon(rings)
    rows = [
        {
            "image_id": "img_t",
            "col_off": None,
            "row_off": None,
            "width": None,
            "height": None,
            "label_idx": 0,
            "geometry": geom,
            "id": None,
        }
    ]
    for co, ro, tw, th in tiles:
        rows.append(
            {
                "image_id": "img_t",
                "col_off": co,
                "row_off": ro,
                "width": tw,
                "height": th,
                "label_idx": 0,
                "geometry": None,
                "id": 1,
            }
        )
    return pd.DataFrame(rows)


def _kernel_masks(transform, rings, tiles):
    out = run_tile_kernel(_image_pdf(transform), _pairs_pdf(rings, tiles))
    anns = out[~out["is_tile"]]
    masks = {}
    for _, r in anns.iterrows():
        masks[(r["col_off"], r["row_off"])] = rle.decode(
            {"size": [int(r["height"]), int(r["width"])], "counts": bytes(r["rle_counts"])}
        )
    return masks


@pytest.mark.parametrize(
    "transform",
    [
        (1.0, 0.0, 0.0, 0.0, -1.0, 0.0),  # north-up (reference fixtures)
        (1.0, 0.0, 0.0, 0.0, 1.0, -64.0),  # south-up: e > 0
        (-1.0, 0.0, 64.0, 0.0, -1.0, 0.0),  # west-positive: a < 0
    ],
)
def test_patch_slicing_matches_direct_rasterization(transform):
    """Kernel's patch-slice mask == rasterize_all_touched on the tile
    transform, for every axis-sign combination."""
    a, b, c, d, e, f = transform
    # circle centered mid-image in world coords, fully inside
    cx = c + a * 20.0
    cy = f + e * 22.0
    rings = [wkb.buffer_point(cx, cy, 5.0)]
    tiles = [(0, 0, 32, 32), (0, 16, 32, 32), (8, 8, 32, 32)]
    masks = _kernel_masks(transform, rings, tiles)
    assert masks, "kernel emitted no annotations (empty-mask regression)"
    for (co, ro), mask in masks.items():
        tile_transform = (a, 0.0, c + a * co, 0.0, e, f + e * ro)
        expect = rasterize.rasterize_all_touched(rings, tile_transform, mask.shape)
        assert mask.shape == (32, 32)
        np.testing.assert_array_equal(mask, expect)
    # the circle spans rows ~17-27, cols ~15-25: every tile sees pixels
    assert len(masks) == 3


def test_south_up_mirrors_north_up_area():
    """Same world geometry on a vertically-flipped raster: identical
    pixel count, mirrored bbox rows."""
    rings = [wkb.buffer_point(20.0, -22.0, 5.0)]
    tiles = [(0, 0, W, H)]
    north = run_tile_kernel(_image_pdf((1.0, 0.0, 0.0, 0.0, -1.0, 0.0)), _pairs_pdf(rings, tiles))
    south = run_tile_kernel(_image_pdf((1.0, 0.0, 0.0, 0.0, 1.0, -64.0)), _pairs_pdf(rings, tiles))
    na = north[~north["is_tile"]].iloc[0]
    sa = south[~south["is_tile"]].iloc[0]
    assert na["area"] == sa["area"] > 0
    nx, ny, nw, nh = (na["bbox_x"], na["bbox_y"], na["bbox_w"], na["bbox_h"])
    sx, sy, sw, sh = (sa["bbox_x"], sa["bbox_y"], sa["bbox_w"], sa["bbox_h"])
    assert (nx, nw, nh) == (sx, sw, sh)
    assert sy == H - (ny + nh)
