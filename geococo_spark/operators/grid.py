"""Window-grid tiling operators T1-T5 (SURVEY.md §2.5).

The reference generates tile windows with numpy ``arange`` + ``meshgrid``
(geococo/utils.py:106-128) and a Python generator (utils.py:131-157).
Here the grid is *rows of a DataFrame* produced by
``explode(sequence(...))`` — fully relational, so Catalyst can prune and
parallelize it, and the grid for a billion images is just a lateral view
(no driver loop).

Exact-parity notes:
- ``np.arange(start, stop, step)`` has an exclusive stop; Spark
  ``sequence`` is inclusive, so the last element is computed as
  ``start + floor((stop - 1 - start) / step) * step`` for integer grids.
- The reference's iteration order is **col_off outer, row_off inner**
  (meshgrid transpose, utils.py:125-126); downstream id assignment
  (SURVEY.md §2.6 W1) sorts by (col_off, row_off) to reproduce it.
- Asymmetric clamp: starts clamp at 0, stops do NOT clamp at the raster
  edge (boundless windows overhang right/bottom; utils.py:114-123 and
  the boundless default at utils.py:133).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class WindowSchemaSpec:
    """Driver-side mirror of the reference's pydantic WindowSchema
    (geococo/window_schema.py:6-18): step = window - 2*overlap, > 0."""

    width_window: int
    height_window: int
    width_overlap: int = 0
    height_overlap: int = 0
    width_step: int = field(init=False)
    height_step: int = field(init=False)

    def __post_init__(self) -> None:
        for name in ("width_window", "height_window", "width_overlap", "height_overlap"):
            v = getattr(self, name)
            if not isinstance(v, int) or isinstance(v, bool):
                raise ValueError(f"{name} must be int, got {type(v).__name__}")
        if self.width_window <= 0 or self.height_window <= 0:
            raise ValueError("window dims must be > 0")
        if self.width_overlap < 0 or self.height_overlap < 0:
            raise ValueError("overlaps must be >= 0")
        object.__setattr__(self, "width_step", self.width_window - 2 * self.width_overlap)
        object.__setattr__(self, "height_step", self.height_window - 2 * self.height_overlap)
        if self.width_step <= 0 or self.height_step <= 0:
            raise ValueError("step = window - 2*overlap must be > 0")


def _arange_seq(start: Column, stop_exclusive: Column, step: int) -> Column:
    """Spark array equal to np.arange(start, stop, step) for ints, step>0."""
    start = start.cast("long")
    stop = stop_exclusive.cast("long")
    last = start + F.floor((stop - 1 - start) / step).cast("long") * step
    return F.when(stop > start, F.sequence(start, last, F.lit(step))).otherwise(
        F.array().cast("array<long>")
    )


def explode_window_grid(
    df: DataFrame,
    schema: WindowSchemaSpec,
    col_off: str = "parent_col_off",
    row_off: str = "parent_row_off",
    width: str = "parent_width",
    height: str = "parent_height",
    boundless: bool = True,
) -> DataFrame:
    """T1+T2: one row per child window of each parent-window row.

    Adds ``col_off, row_off, width, height`` (child window) columns.
    Replicates generate_window_offsets (geococo/utils.py:106-128):
    ``arange(max(0, off - overlap), extent + off - overlap, step)`` per
    axis, cross product. ``boundless=False`` clips each child to the
    parent (utils.py:154-155); default True matches utils.py:133.
    """
    pc, pr = F.col(col_off), F.col(row_off)
    pw, ph = F.col(width), F.col(height)
    cols = _arange_seq(F.greatest(F.lit(0), pc - schema.width_overlap), pw + pc - schema.width_overlap, schema.width_step)
    rows = _arange_seq(F.greatest(F.lit(0), pr - schema.height_overlap), ph + pr - schema.height_overlap, schema.height_step)
    # col outer, row inner — preserves reference yield order as sort keys
    out = (
        df.withColumn("col_off", F.explode(cols))
        .withColumn("row_off", F.explode(rows))
        .withColumn("width", F.lit(schema.width_window).cast("long"))
        .withColumn("height", F.lit(schema.height_window).cast("long"))
    )
    if not boundless:
        # Window.intersection semantics (rasterio): clip child to parent
        new_c = F.greatest(F.col("col_off"), pc)
        new_r = F.greatest(F.col("row_off"), pr)
        new_w = F.least(F.col("col_off") + F.col("width"), pc + pw) - new_c
        new_h = F.least(F.col("row_off") + F.col("height"), pr + ph) - new_r
        out = (
            out.withColumn("_c", new_c)
            .withColumn("_r", new_r)
            .withColumn("width", new_w)
            .withColumn("height", new_h)
            .drop("col_off", "row_off")
            .withColumnRenamed("_c", "col_off")
            .withColumnRenamed("_r", "row_off")
        )
    return out


def with_window_bounds(
    df: DataFrame,
    transform_col: str = "transform",
    prefix: str = "tile_",
    flat: bool = False,
) -> DataFrame:
    """T3: world-coordinate bounds of each (col_off,row_off,width,height).

    Pure arithmetic on the affine struct (x = a*col + c, y = e*row + f for
    north-up rasters), replicating generate_window_polygon
    (geococo/utils.py:89-103) without materializing polygon objects.

    ``flat=True`` reads plain columns ``t_a/t_c/t_e/t_f`` instead of the
    struct — required after explode_window_grid, where struct-field
    extraction trips a Catalyst attribute-resolution bug (Spark 4.1,
    GetStructField + repeated generators).
    """
    if flat:
        a, c, e, f_ = F.col("t_a"), F.col("t_c"), F.col("t_e"), F.col("t_f")
    else:
        a = F.col(f"{transform_col}.a")
        c = F.col(f"{transform_col}.c")
        e = F.col(f"{transform_col}.e")
        f_ = F.col(f"{transform_col}.f")
    x0 = a * F.col("col_off") + c
    x1 = a * (F.col("col_off") + F.col("width")) + c
    y0 = e * F.col("row_off") + f_
    y1 = e * (F.col("row_off") + F.col("height")) + f_
    return (
        df.withColumn(f"{prefix}minx", F.least(x0, x1))
        .withColumn(f"{prefix}maxx", F.greatest(x0, x1))
        .withColumn(f"{prefix}miny", F.least(y0, y1))
        .withColumn(f"{prefix}maxy", F.greatest(y0, y1))
    )


def estimate_average_bounds(labels: DataFrame, quantile: float = 0.9) -> tuple[float, float]:
    """A1: exact linear-interpolation quantile of label extents.

    Spark ``percentile`` matches ``np.nanquantile``'s definition —
    goldens q=0.1->2, 0.5->4, 0.6->4.8, 0.8->6.4 on the fixture
    (reference tests/test_utils.py:144-154). Requires minx/maxx/miny/maxy
    columns (from the labels loader).
    """
    row = labels.select(
        F.expr(f"percentile(maxx - minx, {quantile})").alias("w"),
        F.expr(f"percentile(maxy - miny, {quantile})").alias("h"),
    ).first()
    return float(row["w"]), float(row["h"])


def estimate_schema(
    avg_width: float,
    avg_height: float,
    res: tuple[float, float] = (1.0, 1.0),
    window_bounds: list[tuple[int, int]] = [(256, 256), (512, 512)],
) -> WindowSchemaSpec:
    """T4: first window_bounds candidate whose step stays positive.

    Mirrors estimate_schema (geococo/utils.py:177-225):
    overlap = ceil(avg_extent / pixel_size) per axis.
    """
    width_overlap = int(math.ceil(avg_width / res[0]))
    height_overlap = int(math.ceil(avg_height / res[1]))
    last_exc: Exception | None = None
    for w, h in window_bounds:
        try:
            return WindowSchemaSpec(
                width_window=w,
                height_window=h,
                width_overlap=width_overlap,
                height_overlap=height_overlap,
            )
        except ValueError as exc:
            last_exc = exc
    raise ValueError(
        f"No WindowSchema objects could be created from the given window_bounds {window_bounds}"
    ) from last_exc


def window_intersect(
    raster_bounds: tuple[float, float, float, float],
    vector_bounds: tuple[float, float, float, float],
    transform: tuple[float, float, float, float, float, float],
) -> tuple[float, float, float, float]:
    """A2+A3: pixel-space intersection window of raster & label extents.

    Replicates window_intersect (geococo/utils.py:40-65): both extents are
    converted to windows via the raster transform and intersected; raises
    if disjoint. Golden: fixture labels vs 256x256 raster ->
    (9, 9, 82, 82) (reference tests/test_utils.py:62-74).
    Returns (col_off, row_off, width, height) floats.
    """
    a, b, c, d, e, f = transform

    def from_bounds(minx, miny, maxx, maxy):
        col_off = (minx - c) / a
        row_off = (maxy - f) / e
        w = (maxx - minx) / a
        h = (miny - maxy) / e
        return col_off, row_off, w, h

    rc, rr, rw, rh = from_bounds(*raster_bounds)
    vc, vr, vw, vh = from_bounds(*vector_bounds)
    col0 = max(rc, vc)
    row0 = max(rr, vr)
    col1 = min(rc + rw, vc + vw)
    row1 = min(rr + rh, vr + vh)
    if col1 <= col0 or row1 <= row0:
        raise ValueError("Extent of input raster and vector don't overlap")
    return col0, row0, col1 - col0, row1 - row0
