"""geococo_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the capabilities of jaspersiebring/GeoCOCO
(reference at /root/reference) as an idiomatic Spark DataFrame engine:

- adaptive window-grid tiling over georeferenced rasters (reference
  geococo/utils.py:106-157) expressed as ``explode(sequence(...))``,
- a hybrid broadcast-or-shuffle spatial hash join (cell cover + residual
  exact intersects) replacing the reference's nested loop
  (geococo/coco_processing.py:102-112),
- fused Arrow/pandas-UDF image kernels (decode -> clip -> pad -> normalize
  -> rasterize -> RLE/bbox/area) replacing the per-window Python loop,
- deterministic distributed id assignment reproducing the reference's
  sequential id semantics (geococo/coco_models.py:31-37),
- COCO dataset assembly with versioning and JSON round-trip
  (geococo/coco_manager.py).

No geospatial native deps: geometry (WKB, intersects, rasterize, COCO RLE)
is implemented in pure numpy under :mod:`geococo_spark.geometry`.
"""

__version__ = "0.1.0"
