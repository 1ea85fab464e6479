"""W1/W2 ordering parity on a MULTI-window grid.

The reference assigns image ids in window_factory yield order — col_off
outer loop, row_off inner (meshgrid transpose, geococo/utils.py:125-126)
— and annotation ids per image in category-id order with original-index
tie-breaks (coco_processing.py:165). This test builds a 2x2-window case
and checks the exact id sequences.
"""

import pytest
from pyspark.sql import functions as F

from geococo_spark import pipeline
from geococo_spark.coco import CocoState
from geococo_spark.sources import datagen


@pytest.fixture(scope="module")
def multi(spark):
    # window_bounds (100,100): fixture overlap=8 -> step 84; parent
    # (9,9,82,82) -> col_range = arange(1, 83, 84) = [1]; too small for a
    # multi-window grid, so spread labels wider: centers up to (240,-240)
    centers = [(10, -10), (60, -60), (120, -120), (180, -180), (240, -240)]
    buffers = [1, 2, 3, 4, 1]
    labels = datagen.labels_df(spark, centers=centers, buffers=buffers)
    images = datagen.images_df(spark, 1)
    state = CocoState.create(spark)
    state = pipeline.append_dataset(
        spark, state, images, labels, images_dir="d",
        window_bounds=[(100, 100), (256, 256)],
        id_attribute="category_id", name_attribute="class_names",
    )
    state.images = state.images.cache()
    state.annotations = state.annotations.cache()
    return state


class TestMultiWindowOrdering:
    def test_image_ids_col_outer_row_inner(self, multi):
        # windows at offsets arange(1, 250, 84) = [1, 85, 169] per axis;
        # ids must follow (col_off, row_off) sort of *matched* windows
        imgs = multi.images.orderBy("id").collect()
        assert len(imgs) > 1
        # parse offsets back out of the reference-format file_name
        offs = []
        for r in imgs:
            parts = r.file_name.rsplit("/", 1)[1].split("_")
            offs.append((int(parts[1]), int(parts[2])))
        assert offs == sorted(offs)  # col-major order preserved
        assert [r.id for r in imgs] == list(range(1, len(imgs) + 1))

    def test_annotation_ids_dense_and_grouped_by_image(self, multi):
        anns = multi.annotations.orderBy("id").collect()
        assert [a.id for a in anns] == list(range(1, len(anns) + 1))
        # annotation image_ids must be non-decreasing in id order, and
        # category ids sorted within each image (W2/W3)
        seen_images = [a.image_id for a in anns]
        assert seen_images == sorted(seen_images)
        by_img = {}
        for a in anns:
            by_img.setdefault(a.image_id, []).append(a.category_id)
        for cats in by_img.values():
            assert cats == sorted(cats)

    def test_every_label_annotated_somewhere(self, multi):
        # each of the 5 labels intersects >= 1 window; with overlap they
        # can appear in several windows
        assert multi.annotations.count() >= 5
