"""Regenerate the physical-plan snapshots discussed in docs/PLANS.md.

Usage: python tools/explain_plans.py [sf_dir]
Prints formatted plans for the spatial join (broadcast + salted) and the
tile-kernel stage so plan regressions (lost broadcast, lost pushdown,
extra exchanges) are visible in review.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def explain(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from geococo_spark.session import get_spark

    spark = get_spark(app_name="explain", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    for name in ("q_spatial_join_bbox", "q_spatial_join_salted", "q_annotation_ids"):
        print(f"\n{'=' * 20} {name} {'=' * 20}")
        plan = explain(E.queries()[name](spark, sf_dir))
        # header section only (the operator tree), skip the long details
        print(plan.split("\n\n")[0])
        checks = {
            "BroadcastHashJoin": "BroadcastHashJoin" in plan,
            "ReadSchema pruned": "ReadSchema: struct<c_custkey:bigint>" in plan,
            "AQE": "AdaptiveSparkPlan" in plan,
        }
        print("checks:", checks)


if __name__ == "__main__":
    main()
