"""Round-7 kernel-STAGE decomposition by subtraction (floor probe).

The kernel stage at 512 images / 32 cores runs ~5.9 s wall against
~1.2 s perfectly-packed in-kernel compute. r6 probed payload-nulling
(no change) and Arrow batch size (dead end); this tool pins the split
with three alternating arms over the SAME pipeline run, monkeypatching
``tile_kernel.run_tile_kernel`` only (the cogroup exchange, Arrow-in
transfer of image bytes + pairs, python-worker machinery and the
kernel_out pin are identical in every arm):

  normal — the shipped kernel.
  fake   — inputs touched, compute skipped; returns a SHAPED output
           (one tile row + len(pairs) annotation rows per group, fixed
           48-byte rle payloads). Stage wall = floor + output transfer.
  empty  — inputs touched, returns zero rows. Stage wall = floor
           (exchange + Arrow-in + worker overhead + pin of nothing).

  tiny   — the fake kernel again, but over a parallel staging of the
           SAME images table with 1-byte payloads (identical ids and
           metadata, so pairs/grid/kernel groups are identical; the
           fake kernel never decodes). Stage wall = floor minus the
           image-byte shuffle+Arrow volume.

So per arm-pair, in one window:
  compute          = normal - fake
  output transfer  = fake   - empty
  stage floor      = empty
  image-byte cost  = fake   - tiny   (what shuffle/Arrow of the
                                      payload bytes contributes; both
                                      arms run the same fake kernel)
  machinery        = tiny - output transfer (exchange + worker +
                                      per-group overhead at ~zero
                                      payload)

Only the ``kernel`` phase timing is compared (the pipeline forces the
kernel into its own phase with a count when profiling); downstream
phases run on the fake/empty outputs and their timings are ignored.

Patch point: ``pipeline.cogroup_kernel`` (the factory), NOT the
tile_kernel module global — a module-global patch does not reach the
python workers (cloudpickle re-resolves importable-module globals at
unpickle), while a ``__main__`` function captured in the factory's
closure ships by value.

Run from /root/repo (~6 min):
    python tools/ab_kernel_floor_r7.py [cores=32] [n_images=512] [reps=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geococo_spark import pipeline  # noqa: E402
from geococo_spark.coco import CocoState  # noqa: E402
from geococo_spark.session import get_spark  # noqa: E402
from geococo_spark.sources import datagen  # noqa: E402

REAL_FACTORY = pipeline.cogroup_kernel


def _shaped(image_pdf: pd.DataFrame, pairs_pdf: pd.DataFrame, n_ann: int) -> pd.DataFrame:
    """KERNEL_OUT-shaped frame: 1 tile row + n_ann annotation rows."""
    n = 1 + n_ann
    key = str(image_pdf["image_id"].iloc[0]) if len(image_pdf) else "k"
    return pd.DataFrame(
        {
            "is_tile": np.arange(n) == 0,
            "image_key": np.full(n, key, dtype=object),
            "col_off": np.zeros(n, dtype=np.int64),
            "row_off": np.zeros(n, dtype=np.int64),
            "width": np.full(n, 128, dtype=np.int64),
            "height": np.full(n, 128, dtype=np.int64),
            "tile_width": np.where(np.arange(n) == 0, 128.0, np.nan),
            "tile_height": np.where(np.arange(n) == 0, 128.0, np.nan),
            "tile_bytes": [b"\x00" * 64] + [None] * n_ann,
            "caption": np.full(n, None, dtype=object),
            "label_idx": np.arange(n, dtype=np.float64),
            "category_id": np.full(n, 1.0),
            "rle_counts": [None] + [b"\x01" * 48] * n_ann,
            "area": np.full(n, 10.0),
            "bbox_x": np.full(n, 1.0),
            "bbox_y": np.full(n, 1.0),
            "bbox_w": np.full(n, 4.0),
            "bbox_h": np.full(n, 4.0),
            "iscrowd": np.zeros(n),
        }
    )


def _fake_kernel(image_pdf, pairs_pdf):
    # touch both inputs so lazily-materialized Arrow columns are read
    _ = int(image_pdf["bytes"].map(len).sum()) if len(image_pdf) else 0
    return _shaped(image_pdf, pairs_pdf, len(pairs_pdf))


def _empty_kernel(image_pdf, pairs_pdf):
    _ = int(image_pdf["bytes"].map(len).sum()) if len(image_pdf) else 0
    return _shaped(image_pdf, pairs_pdf, 0).iloc[0:0]


def _factory_for(kernel_fn):
    """cogroup_kernel-compatible factory whose closure carries kernel_fn
    by value (ships to workers via cloudpickle)."""

    def factory(out_fmt="jpeg", acc=None, tile_sink_dir=None, cache_max_bytes=None):
        def _fn(image_pdf: pd.DataFrame, pairs_pdf: pd.DataFrame) -> pd.DataFrame:
            return kernel_fn(image_pdf, pairs_pdf)

        return _fn

    return factory


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    stage = os.environ.get("SPARK_GRAFT_SCALING_STAGE", "/tmp/geococo_profile_stage")
    spark = get_spark(app_name="floor_ab", master=f"local[{cores}]",
                      shuffle_partitions=cores, arrow_batch_rows=64)
    spark.sparkContext.setLogLevel("ERROR")
    images = datagen.stage_images_parquet(
        spark, f"{stage}/images_{n_images}", n_images, files=max(8, n_images // 4)
    )
    tiny_path = f"{stage}/images_tiny_{n_images}"
    if not os.path.exists(os.path.join(tiny_path, "_SUCCESS")):
        import pyspark.sql.functions as F

        images.withColumn("bytes", F.lit(b"\x00")).repartition(
            max(8, n_images // 4)
        ).write.mode("overwrite").parquet(tiny_path)
    images_tiny = spark.read.parquet(tiny_path)
    lp = f"{stage}/labels_dense"
    if not os.path.exists(os.path.join(lp, "_SUCCESS")):
        datagen.random_labels_df(spark, 12000, extent=1000.0, seed=9).repartition(
            32
        ).write.mode("overwrite").parquet(lp)
    labels = spark.read.parquet(lp)

    def run_arm(factory, imgs=None) -> float:
        pipeline.cogroup_kernel = factory
        try:
            timings: dict = {}
            state = CocoState.create(spark)
            try:
                pipeline.append_dataset(
                    spark, state, imgs if imgs is not None else images, labels,
                    images_dir="bench_images",
                    window_bounds=[(128, 128), (256, 256)],
                    id_attribute="category_id", name_attribute="class_names",
                    timings=timings,
                )
            except Exception as e:  # downstream-on-fake failures are fine
                if "kernel" not in timings:
                    raise
                print(f"# downstream ignored: {type(e).__name__}", flush=True)
            return timings["kernel"]
        finally:
            pipeline.cogroup_kernel = REAL_FACTORY

    run_arm(REAL_FACTORY)  # warm plans + python workers
    fake_factory = _factory_for(_fake_kernel)
    arms = [
        ("normal", REAL_FACTORY, None),
        ("fake", fake_factory, None),
        ("empty", _factory_for(_empty_kernel), None),
        ("tiny", fake_factory, images_tiny),
    ]
    walls: dict[str, list[float]] = {name: [] for name, _, _ in arms}
    for rep in range(reps):
        for name, fn, imgs in arms:
            t = run_arm(fn, imgs)
            walls[name].append(round(t, 3))
            print(f"# rep={rep} {name}={t:.3f}", flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    n, f, e, ty = (med(walls[k]) for k in ("normal", "fake", "empty", "tiny"))
    print(json.dumps({
        "cores": cores, "n_images": n_images, "reps": walls,
        "stage_normal_s": n, "stage_fake_s": f, "stage_empty_s": e,
        "stage_tiny_s": ty,
        "floor_s": e,
        "output_transfer_s": round(f - e, 3),
        "compute_s": round(n - f, 3),
        "image_bytes_cost_s": round(f - ty, 3),
        "machinery_s": ty,
        "floor_share": round(e / n, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
