"""Pure-numpy computational geometry for the engine.

The container has no shapely/GEOS/GDAL, so the small set of geometric
primitives the engine needs is implemented here from scratch:

- :mod:`.wkb` — WKB encode/decode for Point / Polygon / MultiPolygon,
- :mod:`.predicates` — vectorized bounds / point-in-polygon /
  box-polygon intersects / distances,
- :mod:`.rasterize` — GDAL-style ``all_touched`` polygon rasterization
  (reference: rasterio.mask usage at geococo/utils.py:33 and
  geococo/coco_processing.py:113-115),
- :mod:`.rle` — COCO compressed RLE encode/decode (reference:
  pycocotools mask.encode at geococo/coco_processing.py:170).
"""

from geococo_spark.geometry import predicates, rasterize, rle, wkb  # noqa: F401
