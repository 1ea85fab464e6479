"""Sink seam: Iceberg-ready targets fall back to parquet here (no
runtime jar in this container) and re-writes are idempotent."""

from geococo_spark import sinks


def test_iceberg_not_available_here(spark):
    assert sinks.iceberg_available(spark) is False


def test_parquet_fallback_roundtrip_idempotent(spark, tmp_path):
    df = spark.range(100).withColumnRenamed("id", "k")
    target = str(tmp_path / "t")
    assert sinks.write_table(df, target) == "parquet"
    # re-running the same stage overwrites, never appends (MERGE stand-in)
    assert sinks.write_table(df, target) == "parquet"
    back = sinks.read_table(spark, target)
    assert back.count() == 100
    assert sorted(r.k for r in back.collect()) == list(range(100))


def test_zorder_layout_clusters_and_prunes(spark, tmp_path):
    """layout_tiles_zorder: files cover disjoint z ranges, so a z-range
    filter (the spatial bbox query's index form) touches a strict subset
    of files and pushes down to the parquet scan."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from geococo_spark import sinks

    rows = [
        Row(tile_name=f"{c * 256}_{r * 256}_256_256", payload=f"t{c}_{r}")
        for c in range(16) for r in range(16)
    ]
    tiles = spark.createDataFrame(rows)
    out = str(tmp_path / "tiles_z")
    sinks.layout_tiles_zorder(tiles, num_files=8).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == 256 and "z" in back.columns

    # per-file z ranges are disjoint (repartitionByRange guarantee)
    ranges = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(ranges) > 1
    for a, b in zip(ranges, ranges[1:]):
        assert a["hi"] <= b["lo"], "file z ranges overlap"

    # a narrow z-range read only yields rows from a subset of files, and
    # the predicate reaches the scan (PushedFilters)
    lo, hi = ranges[0]["lo"], ranges[0]["hi"]
    q = back.filter((F.col("z") >= lo) & (F.col("z") <= hi))
    touched = q.select(F.input_file_name()).distinct().count()
    assert touched == 1
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(z" in plan
