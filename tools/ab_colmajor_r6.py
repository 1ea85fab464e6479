"""Round-6 in-window A/B #4: column-major pixels-mode burn vs the
committed composite-key extraction.

Under test: with return_pixels=True the shared burn buffer is laid out
column-major per patch, so nonzero() emits (label, col, row) natively —
the composite-key np.sort, its two per-pixel searchsorted decodes, and
the div/mod re-decode all vanish; label decode becomes L+1 boundary
searches + one repeat.

OLD = the full committed rasterize module (loaded from
/tmp/rasterize_r6b.py and swapped in as tile_kernel's `rasterize`
binding), NEW = working tree. Interleaved timings at p = 1 and 32 in
one window; outputs asserted byte-identical in-band.

Prepare + run from /root/repo (~4 min):
    git show HEAD:geococo_spark/geometry/rasterize.py > /tmp/rasterize_r6b.py
    python tools/ab_colmajor_r6.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dram_roofline import _kernel_inputs, _triad_worker  # noqa: E402

KERNEL_REPS = 6
OLD_PATH = "/tmp/rasterize_r6b.py"


def _patch_old():
    """Swap the committed rasterize module into tile_kernel's namespace
    (tile_kernel calls rasterize.* through its module binding)."""
    import importlib.util

    from geococo_spark.kernels import tile_kernel

    spec = importlib.util.spec_from_file_location("rasterize_r6b", OLD_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    tile_kernel.rasterize = mod


def _kernel_worker(args):
    barrier, variant = args
    if variant == "old":
        _patch_old()
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


def _run_at(nprocs: int, variant) -> float:
    ctx = mp.get_context("spawn")
    with ctx.Manager() as mgr:
        barrier = mgr.Barrier(nprocs)
        with ctx.Pool(nprocs) as pool:
            res = pool.map(_kernel_worker, [(barrier, variant) for _ in range(nprocs)])
    return sorted(res)[len(res) // 2]


def _run_once(variant):
    if variant == "old":
        _patch_old()
    from geococo_spark.kernels.tile_kernel import run_tile_kernel as run

    img, pairs = _kernel_inputs()
    return run(img, pairs)


def _outputs_identical() -> bool:
    ctx = mp.get_context("spawn")
    with ctx.Pool(1) as pool:
        old_out = pool.apply(_run_once, ("old",))
    with ctx.Pool(1) as pool:
        new_out = pool.apply(_run_once, ("new",))
    if not new_out.drop(columns=["tile_bytes"]).equals(old_out.drop(columns=["tile_bytes"])):
        return False
    return all(
        (a is None and b is None) or bytes(a) == bytes(b)
        for a, b in zip(new_out["tile_bytes"], old_out["tile_bytes"])
    )


def main() -> None:
    if not os.path.exists(OLD_PATH):
        raise SystemExit(f"missing {OLD_PATH} — see module docstring")
    out: dict = {"outputs_identical": _outputs_identical()}
    assert out["outputs_identical"]

    for p in (1, 32):
        out[f"old_t{p}"], out[f"new_t{p}"] = [], []
        for _ in range(3):
            out[f"old_t{p}"].append(round(_run_at(p, "old"), 4))
            out[f"new_t{p}"].append(round(_run_at(p, "new"), 4))
        print(f"# p={p}: old={out[f'old_t{p}']} new={out[f'new_t{p}']}", flush=True)

    for p in (1, 32):
        ctx = mp.get_context("spawn")
        with ctx.Manager() as mgr:
            barrier = mgr.Barrier(p)
            with ctx.Pool(p) as pool:
                res = pool.map(_triad_worker, [(barrier, i) for i in range(p)])
        per = sorted(res)[len(res) // 2]
        out[f"triad_perproc_gbs_{p}"] = round(per / 1e9, 3)

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    b1 = out["triad_perproc_gbs_1"] * 1e9
    b32 = out["triad_perproc_gbs_32"] * 1e9
    for v in ("old", "new"):
        t1, t32 = med(out[f"{v}_t1"]), med(out[f"{v}_t32"])
        Q = (t32 - t1) / (1.0 / b32 - 1.0 / b1)
        out[f"{v}_Q_mb"] = round(Q / 1e6, 1)
        out[f"{v}_t_cpu"] = round(t1 - Q / b1, 4)
        out[f"{v}_dram_share_32"] = round((Q / b32) / t32, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
