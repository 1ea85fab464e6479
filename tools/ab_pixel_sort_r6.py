"""Round-6 in-window A/B: the r6 kernel traffic cuts vs the r5 kernel.

Two changes are under test, as one arm (they compose on the same
arrays): (1) composite-key pixel sort replacing the 3-key lexsort in
rasterize._flat_result, (2) the int32 candidate domain in the
annotation pass (motivated by tools/dram_roofline.py: the kernel is
60-80% DRAM-bound at 32 procs, so traffic — not compute — pays).

Cross-window roofline runs are NOT comparable (the triad bandwidth
reading itself moved 101 -> 128 GB/s between round-6 windows), so this
script interleaves OLD (r5 code: tile_kernel AND rasterize both pinned
from git commit 7958ed6 — the parent of the composite-sort commit
b1d221b, i.e. the last true-r5 kernel) and NEW (working tree) kernel
timings at p = 1 and p = 32 in ONE window, and computes both variants'
DRAM traffic Q against the SAME triad calibration:

    t(p) = t_cpu + Q / b(p)   =>   Q = (t32 - t1) / (1/b32 - 1/b1)

Run from /root/repo (~4 min; the pinned r5 sources self-extract via
``git show``):
    python tools/ab_pixel_sort_r6.py

PROVENANCE (ADVICE r06): the numbers recorded in BENCH/BASELINE.md
round 6 were taken with NEW = the working tree at commit b1d221b and
OLD = HEAD-at-the-time = 7958ed6. The old arm originally monkeypatched
only ``_flat_result`` into the *shared* rasterize module; the round-6
col-major commit (db39730) changed that function's arity and the burn
layout, which broke the old arm at later HEADs. The arm is now fully
pinned to 7958ed6, so the r5 side reproduces exactly; a run at today's
HEAD therefore measures "r5 kernel vs CURRENT kernel", a superset of
the originally recorded delta.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dram_roofline import TRIAD_N, _kernel_inputs, _triad_worker  # noqa: E402

KERNEL_REPS = 6
R5_COMMIT = "7958ed6"  # parent of b1d221b: the last pre-composite-sort kernel
R5_KERNEL_PATH = "/tmp/tile_kernel_r5.py"
R5_RASTER_PATH = "/tmp/rasterize_r5.py"


def _extract_r5_sources() -> None:
    """``git show`` the pinned r5 modules into /tmp (idempotent)."""
    import subprocess

    for repo_path, dst in (
        ("geococo_spark/kernels/tile_kernel.py", R5_KERNEL_PATH),
        ("geococo_spark/geometry/rasterize.py", R5_RASTER_PATH),
    ):
        if os.path.exists(dst):
            continue
        src = subprocess.run(
            ["git", "show", f"{R5_COMMIT}:{repo_path}"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            check=True,
            capture_output=True,
            text=True,
        ).stdout
        with open(dst, "w") as fh:
            fh.write(src)


def _load_r5_kernel():
    """Load the FULLY PINNED r5 kernel: rasterize from 7958ed6 is
    installed as ``geococo_spark.geometry.rasterize`` before the r5
    tile_kernel module executes its imports, so the old arm never sees
    any later working-tree rasterize (ADVICE r06 — the previous
    single-function monkeypatch broke when the col-major commit changed
    ``_flat_result``'s arity). Runs only inside the old arm's dedicated
    worker process, so the module swap never leaks into the new arm."""
    import importlib.util

    import geococo_spark.geometry as geo

    _extract_r5_sources()
    spec_r = importlib.util.spec_from_file_location("rasterize_r5", R5_RASTER_PATH)
    rast = importlib.util.module_from_spec(spec_r)
    spec_r.loader.exec_module(rast)
    geo.rasterize = rast
    sys.modules["geococo_spark.geometry.rasterize"] = rast
    spec = importlib.util.spec_from_file_location("tile_kernel_r5", R5_KERNEL_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.run_tile_kernel


def _kernel_worker(args):
    barrier, variant = args
    if variant == "old":
        run = _load_r5_kernel()
    else:
        from geococo_spark.kernels.tile_kernel import run_tile_kernel as run
    image_pdf, pairs_pdf = _kernel_inputs()
    run(image_pdf, pairs_pdf)  # warmup
    barrier.wait()
    times = []
    for _ in range(KERNEL_REPS):
        t0 = time.perf_counter()
        run(image_pdf, pairs_pdf)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def _run_at(nprocs: int, worker, variant) -> float:
    ctx = mp.get_context("spawn")
    with ctx.Manager() as mgr:
        barrier = mgr.Barrier(nprocs)
        with ctx.Pool(nprocs) as pool:
            res = pool.map(worker, [(barrier, variant) for _ in range(nprocs)])
    return sorted(res)[len(res) // 2]


def _outputs_identical() -> bool:
    """Old and new kernels must emit identical tables (run in a child so
    the old-module load cannot leak patches into this process)."""
    ctx = mp.get_context("spawn")
    with ctx.Pool(1) as pool:
        old_out = pool.apply(_run_once, ("old",))
    new_out = _run_once("new")
    if not new_out.drop(columns=["tile_bytes"]).equals(old_out.drop(columns=["tile_bytes"])):
        return False
    return all(
        (a is None and b is None) or bytes(a) == bytes(b)
        for a, b in zip(new_out["tile_bytes"], old_out["tile_bytes"])
    )


def _run_once(variant):
    if variant == "old":
        run = _load_r5_kernel()
    else:
        from geococo_spark.kernels.tile_kernel import run_tile_kernel as run
    img, pairs = _kernel_inputs()
    return run(img, pairs)


def main() -> None:
    _extract_r5_sources()
    out: dict = {"outputs_identical": _outputs_identical()}
    assert out["outputs_identical"]

    # interleaved A/B, 3 rounds per concurrency
    for p in (1, 32):
        out[f"old_t{p}"], out[f"new_t{p}"] = [], []
        for _ in range(3):
            out[f"old_t{p}"].append(round(_run_at(p, _kernel_worker, "old"), 4))
            out[f"new_t{p}"].append(round(_run_at(p, _kernel_worker, "new"), 4))
        print(f"# p={p}: old={out[f'old_t{p}']} new={out[f'new_t{p}']}", flush=True)

    # one triad calibration for both variants (same window)
    for p in (1, 32):
        ctx = mp.get_context("spawn")
        with ctx.Manager() as mgr:
            barrier = mgr.Barrier(p)
            with ctx.Pool(p) as pool:
                res = pool.map(_triad_worker, [(barrier, i) for i in range(p)])
        per = sorted(res)[len(res) // 2]
        out[f"triad_perproc_gbs_{p}"] = round(per / 1e9, 3)
    print(f"# triad: {out['triad_perproc_gbs_1']} GB/s @1, "
          f"{out['triad_perproc_gbs_32']} GB/s/proc @32", flush=True)

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    b1 = out["triad_perproc_gbs_1"] * 1e9
    b32 = out["triad_perproc_gbs_32"] * 1e9
    for v in ("old", "new"):
        t1, t32 = med(out[f"{v}_t1"]), med(out[f"{v}_t32"])
        Q = (t32 - t1) / (1.0 / b32 - 1.0 / b1)
        out[f"{v}_Q_mb"] = round(Q / 1e6, 1)
        out[f"{v}_t_cpu"] = round(t1 - Q / b1, 4)
        out[f"{v}_t32_over_floor"] = round(t32 / (Q / b32), 2)
        out[f"{v}_dram_share_32"] = round((Q / b32) / t32, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
