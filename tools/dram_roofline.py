"""DRAM roofline for the tile kernel (VERDICT r05 #3).

Round 5's batched kernel reads ~0.42-0.47 paired scaling efficiency at
local[32] and the attribution was "now DRAM-bandwidth-bound". This tool
puts a NUMBER on that claim with a calibrated streaming benchmark (no
perf counters in this container):

1. **Triad bandwidth** b(p): per-process STREAM-triad (a = b + s*c over
   DRAM-resident float64 arrays) at p = 1, 8, 32 concurrent processes,
   24 bytes/element accounting. This is the box's effective per-process
   bandwidth at each concurrency.
2. **Kernel time** t(p): per-process wall of the REAL
   ``run_tile_kernel`` (raster + annotation phases, the engine's hot
   loop) on a representative group at the same p.
3. **Two-point model**: t(p) = t_cpu + Q / b(p). The (1, 32) pair gives
   Q — the kernel's DRAM traffic per run in triad-equivalent bytes —
   and t_cpu; the p = 8 point validates the fit. Bytes/pixel = Q /
   set-pixels-per-run; the roofline verdict is the DRAM share
   (Q/b(32)) / t(32) and the distance of t(32) from the pure-bandwidth
   floor Q/b(32).

Prints one JSON line. Run from /root/repo (takes ~3-4 min):
    python tools/dram_roofline.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRIAD_N = 16_000_000  # 3 x 128 MB per proc — far beyond L3
TRIAD_REPS = 8
KERNEL_REPS = 6


def _triad_worker(args):
    barrier, _ = args
    a = np.zeros(TRIAD_N)
    b = np.random.rand(TRIAD_N)
    c = np.random.rand(TRIAD_N)
    np.add(b, 2.5 * c, out=a)  # touch/fault all pages before the barrier
    barrier.wait()
    t0 = time.perf_counter()
    for _ in range(TRIAD_REPS):
        np.multiply(c, 2.5, out=a)
        a += b
    dt = time.perf_counter() - t0
    return 24.0 * TRIAD_N * TRIAD_REPS / dt  # bytes/s, STREAM accounting


def _kernel_inputs():
    """One representative kernel group: a 1024x1024x3 image, 1200 buffered-
    point labels, an 8x8 grid of 128x128 tiles, pairs pre-matched on bbox
    (the pipeline only ships matched pairs)."""
    import pandas as pd

    from geococo_spark.geometry import wkb
    from geococo_spark.kernels import codec

    rng = np.random.RandomState(11)
    data = (rng.rand(3, 1024, 1024) * 256).astype("uint8")
    image_pdf = pd.DataFrame(
        [
            {
                "image_id": "img_rf",
                "bytes": codec.encode_image(data, "raw"),
                "w": 1024,
                "h": 1024,
                "fmt": "raw",
                "caption": "cap",
                "phash": 0,
                "transform": {"a": 1.0, "b": 0.0, "c": 0.0, "d": 0.0, "e": -1.0, "f": 0.0},
                "crs": "EPSG:3857",
                "nodata": 0,
                "bands": 3,
            }
        ]
    )
    labels = []
    for i in range(1200):
        cx, cy = rng.rand() * 990 + 16, -(rng.rand() * 990 + 16)
        r = 4.0 + rng.rand() * 12.0
        labels.append((i, wkb.buffer_point(cx, cy, r), (cx - r, cy - r, cx + r, cy + r)))
    tiles = [(co, ro, 128, 128) for co in range(0, 1024, 128) for ro in range(0, 1024, 128)]
    rows = [
        {
            "image_id": "img_rf", "col_off": None, "row_off": None, "width": None,
            "height": None, "label_idx": li, "geometry": wkb.encode_polygon([ring]),
            "id": None,
        }
        for li, ring, _ in labels
    ]
    for co, ro, tw, th in tiles:
        # tile world bounds under the north-up identity transform
        tminx, tmaxx, tmaxy, tminy = co, co + tw, -ro, -(ro + th)
        for li, _, (lminx, lminy, lmaxx, lmaxy) in labels:
            if lminx <= tmaxx and lmaxx >= tminx and lminy <= tmaxy and lmaxy >= tminy:
                rows.append(
                    {
                        "image_id": "img_rf", "col_off": co, "row_off": ro,
                        "width": tw, "height": th, "label_idx": li,
                        "geometry": None, "id": 1,
                    }
                )
    import pandas as pd

    return image_pdf, pd.DataFrame(rows)


def _kernel_worker(args):
    barrier, _ = args
    from geococo_spark.kernels.tile_kernel import run_tile_kernel

    image_pdf, pairs_pdf = _kernel_inputs()
    out = run_tile_kernel(image_pdf, pairs_pdf)  # warmup (incl. decode-cache fill)
    ann = out[~out["is_tile"]]
    pixels = float(ann["area"].sum())
    n_anns = int(len(ann))
    barrier.wait()
    times = []
    for _ in range(KERNEL_REPS):
        t0 = time.perf_counter()
        run_tile_kernel(image_pdf, pairs_pdf)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2], pixels, n_anns


def _run_at(nprocs: int, worker) -> list:
    ctx = mp.get_context("spawn")
    with ctx.Manager() as mgr:
        barrier = mgr.Barrier(nprocs)
        with ctx.Pool(nprocs) as pool:
            return pool.map(worker, [(barrier, i) for i in range(nprocs)])


def main() -> None:
    out: dict = {"triad_n": TRIAD_N, "kernel_reps": KERNEL_REPS}
    # interleave kernel/triad at each concurrency so both see the same box
    for p in (1, 8, 32):
        kres = _run_at(p, _kernel_worker)
        t_med = sorted(r[0] for r in kres)[len(kres) // 2]
        out[f"kernel_t{p}"] = round(t_med, 4)
        out["kernel_pixels"] = kres[0][1]
        out["kernel_anns"] = kres[0][2]
        bres = _run_at(p, _triad_worker)
        per = sorted(bres)[len(bres) // 2]
        out[f"triad_perproc_gbs_{p}"] = round(per / 1e9, 3)
        out[f"triad_agg_gbs_{p}"] = round(per * p / 1e9, 3)
        print(f"# p={p}: kernel {t_med:.3f}s/run, triad {per*p/1e9:.1f} GB/s agg", flush=True)

    # two-point model from (1, 32); validate on 8
    b1 = out["triad_perproc_gbs_1"] * 1e9
    b8 = out["triad_perproc_gbs_8"] * 1e9
    b32 = out["triad_perproc_gbs_32"] * 1e9
    t1, t8, t32 = out["kernel_t1"], out["kernel_t8"], out["kernel_t32"]
    Q = (t32 - t1) / (1.0 / b32 - 1.0 / b1)  # bytes per kernel run
    t_cpu = t1 - Q / b1
    out["model_Q_mb"] = round(Q / 1e6, 2)
    out["model_t_cpu"] = round(t_cpu, 4)
    out["model_pred_t8"] = round(t_cpu + Q / b8, 4)
    out["model_t8_err_pct"] = round(100.0 * (t_cpu + Q / b8 - t8) / t8, 1)
    out["bytes_per_pixel"] = round(Q / out["kernel_pixels"], 1)
    out["bytes_per_ann"] = round(Q / out["kernel_anns"], 1)
    floor32 = Q / b32
    out["dram_share_at_32"] = round(floor32 / t32, 3)
    out["t32_over_floor"] = round(t32 / floor32, 2)
    out["paired_eff_kernel_1_to_32"] = round(t1 / t32, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
