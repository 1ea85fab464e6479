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


_BUCKET_MANIFEST = "_bucket_manifest.json"


def write_images_bucketed(
    images: DataFrame,
    path: str,
    buckets: int | None = None,
    table: str = "geococo_images_bucketed",
) -> str:
    """Write the images table as the PRODUCTION bucketed store
    (VERDICT r05 #6): ``bucketBy(image_id)`` + in-bucket sort, so every
    downstream append's kernel cogroup reads the buckets IN PLACE — the
    image bytes (the dominant payload at 100 TB) never enter an
    exchange (plan-proven by tests/test_pipeline.py::
    test_bucketed_images_input). Locally this is NOT faster (local
    shuffles are page-cache-cheap and buckets cap scan parallelism —
    measured A/B in BENCH/BASELINE.md round 5); on a network fabric the
    elided exchange is the images table's entire per-append network
    cost. A ``_bucket_manifest.json`` (bucket count, column, schema DDL)
    is dropped next to the files so :func:`read_images_bucketed` can
    re-register the table in a fresh session. Returns the table name.
    """
    import json
    import os

    spark = images.sparkSession
    n = buckets or spark.sparkContext.defaultParallelism
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        images.write.bucketBy(n, "image_id")
        .sortBy("image_id")
        .mode("overwrite")
        .option("path", path)
        .saveAsTable(table)
    )
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in images.schema.fields)
    with open(os.path.join(path, _BUCKET_MANIFEST), "w") as fh:
        json.dump({"buckets": n, "bucket_col": "image_id", "table": table, "ddl": ddl}, fh)
    return table


def _table_location(spark: SparkSession, table: str) -> str | None:
    """Storage LOCATION of a catalog table (None when undeterminable)."""
    try:
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
            if (r["col_name"] or "").strip() == "Location":
                return (r["data_type"] or "").strip()
    except Exception:
        return None
    return None


def _norm_location(loc: str) -> str:
    """Scheme-stripped, slash-normalized path for location comparison
    (catalog stores ``file:/abs/path``, callers pass ``/abs/path``)."""
    import os
    import re

    p = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?", "", loc)
    return os.path.abspath(p).rstrip("/")


def read_images_bucketed(spark: SparkSession, path: str, table: str | None = None) -> DataFrame:
    """Open a bucketed images store written by :func:`write_images_bucketed`.

    Re-registers the external bucketed table from the manifest when the
    session catalog doesn't know it (bucket metadata lives in the
    catalog, not the parquet files), and sets
    ``spark.sql.requireAllClusterKeysForCoPartition=false`` so the
    kernel cogroup (keyed ``(image_id, band)``) accepts the bucket
    layout (clustered on the ``image_id`` prefix) without an exchange.

    A catalog table whose name matches the manifest but whose LOCATION
    is a *different* store (two stores written with the default table
    name — the later write repoints the catalog) is NOT trusted
    (ADVICE r06): the reader compares locations and re-registers under
    a per-path derived name on mismatch, so the returned rows always
    come from ``path``.
    """
    import hashlib
    import json
    import os

    with open(os.path.join(path, _BUCKET_MANIFEST)) as fh:
        manifest = json.load(fh)
    table = table or manifest["table"]
    if spark.catalog.tableExists(table):
        loc = _table_location(spark, table)
        if loc is not None and _norm_location(loc) != _norm_location(path):
            digest = hashlib.md5(os.path.abspath(path).encode("utf-8")).hexdigest()[:8]
            table = f"{table}_{digest}"
    if not spark.catalog.tableExists(table):
        spark.sql(
            f"CREATE TABLE {table} ({manifest['ddl']}) USING parquet "
            f"CLUSTERED BY ({manifest['bucket_col']}) "
            f"SORTED BY ({manifest['bucket_col']}) "
            f"INTO {manifest['buckets']} BUCKETS "
            f"LOCATION '{path}'"
        )
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    return spark.table(table)


def read_table(spark: SparkSession, target: str, fmt: str | None = None) -> DataFrame:
    """Read a table written by :func:`write_table`."""
    use_iceberg = (
        fmt == "iceberg"
        or (fmt is None and "/" not in target and "." in target and iceberg_available(spark))
    )
    if use_iceberg:
        return spark.read.format("iceberg").load(target)
    return spark.read.parquet(target)
