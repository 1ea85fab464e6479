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
