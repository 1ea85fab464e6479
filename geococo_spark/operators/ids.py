"""W1/W2 — deterministic sequential id assignment at scale
(SURVEY.md §2.6, §7.6).

The reference increments ``next_image_id`` / ``next_annotation_id`` one
row at a time in iteration order (geococo/coco_models.py:31-37). A naive
``row_number() OVER (ORDER BY ...)`` reproduces that but funnels every
row through ONE task. The scalable equivalent is the classic two-pass
partition-offset design:

1. range-repartition + sort by the (total) order key,
2. per-partition counts -> cumulative offsets (tiny driver collect),
3. ``row_number`` *within* each partition + its offset.

The order key must be a total order (caller supplies tie-breakers); with
that, ids are independent of partition boundaries, so nondeterministic
range-sampling cannot change the result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel


def assign_sequential_ids(
    df: DataFrame,
    order_cols: list[str | Column],
    id_col: str,
    offset: int = 0,
    small_threshold: int = 1_000_000,
    num_partitions: int | None = None,
    n_rows: int | None = None,
    assume_large: bool = False,
) -> DataFrame:
    """Add ``id_col`` = offset + 1, offset + 2, ... in ``order_cols`` order.

    ``offset`` carries the resume/append contract: ids continue from the
    existing table count (A7, geococo/coco_models.py:24-29).
    ``n_rows`` (a known count) or ``assume_large=True`` skips the
    path-decision count() job — the two-pass path never needs the total.
    """
    if not assume_large:
        n = n_rows if n_rows is not None else df.count()
        if n <= small_threshold:
            w = Window.orderBy(*order_cols)
            return df.withColumn(id_col, (F.row_number().over(w) + F.lit(offset)).cast("long"))

    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {r["_pid"]: r["n"] for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    cum = 0
    offsets = {}
    for pid in sorted(counts):
        offsets[pid] = cum
        cum += counts[pid]
    mapping = F.create_map(
        *[F.lit(v) for pid_off in sorted(offsets.items()) for v in pid_off]
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = ranged.withColumn(
        id_col,
        (F.row_number().over(w) + mapping[F.col("_pid")] + F.lit(offset)).cast("long"),
    ).drop("_pid")
    return out
