"""Round-6 in-window A/B: the r6 kernel traffic cuts vs the r5 kernel.

Two changes are under test, as one arm (they compose on the same
arrays): (1) composite-key pixel sort replacing the 3-key lexsort in
rasterize._flat_result, (2) the int32 candidate domain in the
annotation pass (motivated by tools/dram_roofline.py: the kernel is
60-80% DRAM-bound at 32 procs, so traffic — not compute — pays).

Cross-window roofline runs are NOT comparable (the triad bandwidth
reading itself moved 101 -> 128 GB/s between round-6 windows), so this
script interleaves OLD (r5 code: tile_kernel loaded from git HEAD via
/tmp/tile_kernel_r5.py + the old _flat_result monkeypatched into
rasterize) and NEW (working tree) kernel timings at p = 1 and p = 32
in ONE window, and computes both variants' DRAM traffic Q against the
SAME triad calibration:

    t(p) = t_cpu + Q / b(p)   =>   Q = (t32 - t1) / (1/b32 - 1/b1)

Prepare + run from /root/repo (~4 min):
    git show HEAD:geococo_spark/kernels/tile_kernel.py > /tmp/tile_kernel_r5.py
    python tools/ab_pixel_sort_r6.py
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
R5_KERNEL_PATH = "/tmp/tile_kernel_r5.py"


def _old_flat_result(burned, ncols_l, return_pixels):
    """The pre-round-6 extraction (3-key lexsort, int64 pixel coords),
    kept here verbatim for the A/B only."""
    masks, buf, moff = burned
    if not return_pixels:
        return masks
    pos = np.nonzero(buf)[0]
    if pos.size == 0:
        z = np.empty(0, dtype=np.int64)
        return masks, z, z.copy(), z.copy()
    lab = np.searchsorted(moff, pos, side="right") - 1
    rel = pos - moff[lab]
    ncl = ncols_l[lab]
    row = rel // ncl
    col = rel - row * ncl
    order = np.lexsort((row, col, lab))
    return masks, lab[order], row[order], col[order]


def _load_r5_kernel():
    """Load the r5 tile_kernel module with the r5 _flat_result patched
    into the (shared) rasterize module — rasterize's only r6 change IS
    _flat_result, so this reconstructs the full r5 kernel path."""
    import importlib.util

    from geococo_spark.geometry import rasterize

    rasterize._flat_result = _old_flat_result
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
    if not os.path.exists(R5_KERNEL_PATH):
        raise SystemExit(f"missing {R5_KERNEL_PATH} — see module docstring")
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
