"""J5 — kNN fallback for labels unmatched by the exact spatial join
(SURVEY.md §2.3; north_star "STRtree-backed kNN fallback").

No STRtree is available (no shapely in this container), so the same
cell-bucketed design is used with a numpy distance kernel: each
unmatched label searches tiles in its cell neighborhood (expanding
rings), ranked by exact polygon-to-box distance with deterministic
(distance, tile_id) tie-breaking.

Distributed shape: neighborhood expansion is an ``explode`` over
built-in cell arithmetic, candidate scoring is an Arrow-batched pandas
UDF, and the arg-min per label is a window ``row_number`` partitioned by
label — all shuffles are keyed and bounded by the candidate count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window

from geococo_spark.checkpoint import materialize
from geococo_spark.geometry import predicates, wkb
from geococo_spark.operators import cells


@pandas_udf(DoubleType())
def _poly_box_distance(
    geom: pd.Series, minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series
) -> pd.Series:
    # CSR-batched: each distinct WKB buffer is decoded ONCE per Arrow
    # batch (labels repeat per candidate tile), then every (label, box)
    # pair is scored in one flat numpy pass (VERDICT r05 #2 — this was
    # the engine's last per-row Python loop in a hot operator).
    if len(geom) == 0:
        return pd.Series([], dtype="float64")
    codes, uniques = pd.factorize(geom.map(bytes), sort=False)
    pts, ring_starts, label_ring_starts, _ = wkb.decode_batch(list(uniques))
    dist = predicates.polygon_box_distance_batch(
        pts,
        ring_starts,
        label_ring_starts,
        codes,
        minx.to_numpy(dtype="float64"),
        miny.to_numpy(dtype="float64"),
        maxx.to_numpy(dtype="float64"),
        maxy.to_numpy(dtype="float64"),
    )
    return pd.Series(dist)


def knn_assign(
    unmatched_labels: DataFrame,
    tiles: DataFrame,
    cell_size: float,
    k: int = 1,
    rings: int = 2,
    label_id: str = "label_id",
    tile_id: str = "tile_id",
    escalate: bool = False,
    max_rings: int = 64,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Assign each unmatched label its k nearest tiles (by geometry-to-box
    distance) among tiles in its ``rings``-deep cell neighborhood.

    With ``escalate=False``, labels with no tile in the neighborhood stay
    unassigned. With ``escalate=True`` (VERDICT r01 #8) the still-
    unassigned labels re-run with DOUBLED rings until every label is
    assigned or ``max_rings`` is exceeded — O(log(max_rings)) bounded
    passes, each over only the shrinking remainder, so the escalation
    cost is driven by the (few) far-out labels, not the bulk.
    Deterministic: ties break on tile_id.
    Returns label columns + tile_id + ``knn_distance`` + ``knn_rank``.

    ``checkpoint_dir``: when set, the per-pass materialization is a
    durable parquet round-trip instead of ``localCheckpoint`` — on a
    real cluster a preempted executor then costs a task retry, not the
    whole escalation chain (VERDICT r06 #3).
    """
    if escalate:
        outs = None
        remaining = unmatched_labels
        r = rings
        while True:
            # materialize each pass: the loop (and every downstream
            # consumer) must not re-execute the chain of earlier
            # geometry-distance joins on each action
            out = materialize(
                knn_assign(
                    remaining, tiles, cell_size, k=k, rings=r,
                    label_id=label_id, tile_id=tile_id, escalate=False,
                ),
                checkpoint_dir,
                f"knn_rings_{r}",
            )
            outs = out if outs is None else outs.unionByName(out)
            r *= 2
            if r > max_rings:
                break
            remaining = remaining.join(
                out.select(label_id).distinct(), label_id, "left_anti"
            )
            if remaining.isEmpty():
                break
        return outs
    lbl = cells.centroid_cell(
        unmatched_labels, cell_size, "label_minx", "label_miny", "label_maxx", "label_maxy",
        out="_ccell",
    ).withColumn("cell", F.explode(cells.neighbor_cells(F.col("_ccell"), rings))).drop("_ccell")

    tile_cells = cells.with_cell_cover(
        tiles.select(tile_id, "tile_minx", "tile_miny", "tile_maxx", "tile_maxy"),
        cell_size, "tile_minx", "tile_miny", "tile_maxx", "tile_maxy",
    )

    cand = (
        lbl.join(tile_cells, "cell", "inner")
        .drop("cell")
        .dropDuplicates([label_id, tile_id])
        .withColumn(
            "knn_distance",
            _poly_box_distance(
                F.col("geometry"),
                F.col("tile_minx"),
                F.col("tile_miny"),
                F.col("tile_maxx"),
                F.col("tile_maxy"),
            ),
        )
    )
    w = Window.partitionBy(label_id).orderBy(F.col("knn_distance").asc(), F.col(tile_id).asc())
    return cand.withColumn("knn_rank", F.row_number().over(w)).filter(F.col("knn_rank") <= k)
