"""Randomized whole-pipeline oracle: a naive, eager, single-threaded
re-run of the reference's loop (geococo/coco_processing.py:28-187
semantics: sorted sources -> window grid -> intersect -> rasterize on
the tile transform -> sequential ids) compared against the distributed
DAG, table-for-table. The geometry kernels are shared (pinned by their
own equivalence tests); what this fuzzes is the ORCHESTRATION — window
enumeration order, pair selection, empty-mask skips, id assignment,
filename templating — on inputs none of the golden tests enumerate.
"""

from __future__ import annotations

import numpy as np
import pytest

from geococo_spark import pipeline
from geococo_spark.coco import CocoState
from geococo_spark.geometry import predicates, rasterize, rle, wkb
from geococo_spark.operators import grid
from geococo_spark.sources import datagen
from tests.test_grid import np_offsets


def naive_append(image_rows, label_rows, window_bounds, images_dir, quantile=0.9):
    """Reference-shaped eager loop. label_rows: (label_idx, wkb_bytes,
    category_id, minx, miny, maxx, maxy)."""
    widths = [r[5] - r[3] for r in label_rows]
    heights = [r[6] - r[4] for r in label_rows]
    qw = float(np.percentile(widths, quantile * 100))
    qh = float(np.percentile(heights, quantile * 100))
    schema = grid.estimate_schema(qw, qh, (1.0, 1.0), window_bounds)
    vminx = min(r[3] for r in label_rows)
    vminy = min(r[4] for r in label_rows)
    vmaxx = max(r[5] for r in label_rows)
    vmaxy = max(r[6] for r in label_rows)

    decoded = {r[0]: r for r in label_rows}
    rings_by_label = {r[0]: wkb.decode_rings(bytes(r[1])) for r in label_rows}

    images_out, anns_out = [], []
    next_img, next_ann = 1, 1
    for src_id, img in enumerate(sorted(image_rows, key=lambda r: r[0]), start=1):
        w, h = img[2], img[3]
        a, b_, c, d_, e, f = img[7]
        # from_bounds ∩ raster, sign-agnostic like the pipeline prologue
        cs = sorted(((vminx - c) / a, (vmaxx - c) / a))
        rs = sorted(((vminy - f) / e, (vmaxy - f) / e))
        p0, p1 = max(0.0, cs[0]), min(float(w), cs[1])
        q0, q1 = max(0.0, rs[0]), min(float(h), rs[1])
        pco, pro = int(p0), int(q0)
        pw, ph = int(p1 - p0), int(q1 - q0)
        if pw <= 0 or ph <= 0:
            continue
        for col_off, row_off in np_offsets(pco, pro, pw, ph, schema):
            tw, th = schema.width_window, schema.height_window
            tile_transform = (a, 0.0, c + a * col_off, 0.0, e, f + e * row_off)
            xs = sorted((c + a * col_off, c + a * (col_off + tw)))
            ys = sorted((f + e * row_off, f + e * (row_off + th)))
            # pairs: bbox overlap + exact intersects (J1 semantics),
            # ordered (category_id, label_idx) within the window (W3)
            pairs = []
            for li, lr in decoded.items():
                if xs[0] > lr[5] or xs[1] < lr[3] or ys[0] > lr[6] or ys[1] < lr[4]:
                    continue
                if predicates.box_intersects_polygon(
                    xs[0], ys[0], xs[1], ys[1], rings_by_label[li]
                ):
                    pairs.append((lr[2], li))
            if not pairs:
                continue  # F2: window skipped entirely
            img_id = next_img
            next_img += 1
            images_out.append(
                (
                    img_id, tw, th,
                    f"{images_dir}/{src_id}_{col_off}_{row_off}_{tw}_{th}.jpg",
                    src_id,
                )
            )
            for cat_id, li in sorted(pairs):
                mask = rasterize.rasterize_all_touched(
                    rings_by_label[li], tile_transform, (th, tw)
                )
                if not mask.any():
                    continue  # F3: annotation dropped, tile row kept
                enc = rle.encode(mask)
                bbox = rasterize.bounding_rect(mask)
                anns_out.append(
                    (
                        next_ann, img_id, int(cat_id), float(mask.sum()),
                        bbox, bytes(enc["counts"]), 0,
                    )
                )
                next_ann += 1
    return images_out, anns_out


@pytest.mark.parametrize(
    "seed,n_labels,window_bounds",
    [
        (11, 120, [(64, 64), (128, 128)]),
        (12, 200, [(64, 80)]),           # non-square windows
        (13, 60, [(100, 100), (256, 256)]),
    ],
)
def test_pipeline_matches_naive_reference_loop(spark, tmp_path, seed, n_labels, window_bounds):
    images_df = datagen.images_df(spark, 2)
    labels_df = datagen.random_labels_df(spark, n_labels, extent=250.0, seed=seed)
    image_rows = [tuple(r) for r in datagen.make_image_rows(2)]
    label_rows = [
        (r["label_idx"], bytes(r["geometry"]), r["category_id"],
         r["label_minx"], r["label_miny"], r["label_maxx"], r["label_maxy"])
        for r in labels_df.collect()
    ]
    exp_images, exp_anns = naive_append(image_rows, label_rows, window_bounds, "d")

    state = pipeline.append_dataset(
        spark, CocoState.create(spark), images_df, labels_df, images_dir="d",
        window_bounds=window_bounds, id_attribute="category_id",
        name_attribute="class_names",
    )
    got_images = [
        (r["id"], r["width"], r["height"], r["file_name"], r["source_id"])
        for r in state.images.orderBy("id").collect()
    ]
    got_anns = [
        (r["id"], r["image_id"], r["category_id"], r["area"],
         list(r["bbox"]), bytes(r["segmentation"]["counts"]), r["iscrowd"])
        for r in state.annotations.orderBy("id").collect()
    ]
    assert got_images == exp_images
    assert got_anns == exp_anns
