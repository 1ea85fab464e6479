"""Table sinks — Iceberg when a runtime is present, parquet otherwise.

``BASELINE.json`` input_hint names Iceberg-shaped tables. This container
has no iceberg-spark runtime jar, no pyiceberg, and no network to fetch
one (probed round 2: Maven unreachable), so the engine reads/writes
parquet through the same DataFrame API. This module is the seam: every
job sink goes through :func:`write_table`, which targets
``df.writeTo(<catalog table>)`` when the Iceberg Spark catalog class is
loadable and falls back to overwrite-parquet otherwise.

Idempotency contract of the parquet fallback (the MERGE stand-in):
stage outputs are written under deterministic paths keyed by the stage
fingerprint (checkpoint.StageCheckpoint), so re-running a completed
stage overwrites with identical bytes instead of appending duplicates —
re-run safety equivalent to an idempotent MERGE on the fingerprint key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ICEBERG_CATALOG_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_ICEBERG_CATALOG_CLASS)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def write_table(df: DataFrame, target: str, fmt: str | None = None) -> str:
    """Write ``df`` to ``target`` and return the format used.

    ``target`` is either a path (parquet) or a dotted catalog table name
    (Iceberg, e.g. ``local.db.tiles``). ``fmt`` forces a format;
    default: iceberg for dotted targets when the runtime is present,
    parquet otherwise.
    """
    spark = df.sparkSession
    use_iceberg = (
        fmt == "iceberg"
        or (fmt is None and "/" not in target and "." in target and iceberg_available(spark))
    )
    if use_iceberg:
        df.writeTo(target).using("iceberg").createOrReplace()
        return "iceberg"
    df.write.mode("overwrite").parquet(target)
    return "parquet"


def layout_tiles_zorder(
    tiles: DataFrame, block: float = 256.0, num_files: int | None = None
) -> DataFrame:
    """Cluster tile rows by Z-order (Morton) of their window offsets so
    spatially-adjacent tiles land in the same parquet files AND files
    cover disjoint ``z`` ranges (repartitionByRange + in-partition sort).
    The retained ``z`` column makes range reads prunable: a spatial
    bounding-box query becomes ``z BETWEEN lo AND hi`` (+ exact residual)
    and the parquet reader skips whole files/row-groups via min-max
    stats. Expects the reference tile_name format ``col_row_w_h``.
    """
    from pyspark.sql import functions as F

    from geococo_spark.operators import cells

    zx = F.floor(F.split(F.col("tile_name"), "_")[0].cast("double") / block)
    zy = F.floor(F.split(F.col("tile_name"), "_")[1].cast("double") / block)
    out = tiles.withColumn("z", cells.zorder_key(zx, zy))
    n = num_files or tiles.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(n, "z").sortWithinPartitions("z")


def read_table(spark: SparkSession, target: str, fmt: str | None = None) -> DataFrame:
    """Read a table written by :func:`write_table`."""
    use_iceberg = (
        fmt == "iceberg"
        or (fmt is None and "/" not in target and "." in target and iceberg_available(spark))
    )
    if use_iceberg:
        return spark.read.format("iceberg").load(target)
    return spark.read.parquet(target)
