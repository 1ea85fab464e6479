"""Pure-CPU machine calibration (no Spark involved).

Measures THIS box's *current* scaling ceiling for the tile kernel's
numpy mix: the same work run per-process under multiprocessing at 8 vs
32 concurrent processes. With per-proc wall t8 and t32, throughput
efficiency 8->32 = (32/t32) / (8/t8) / 4 = t8 / t32 — anything the
engine loses beyond this is engine-attributable; anything below it is
the box (all-core turbo droop, shared cache/DRAM, and — measured round
3 — *hypervisor co-tenancy*, which moved identical-code kernel
core-seconds by ±26% between campaigns while the guest was idle).

Run this immediately before/after each scaling campaign and record the
ceiling next to the efficiency number (BENCH/BASELINE.md). Round-2
measured 0.78 on a quiet box.

Usage: python tools/machine_calibration.py [reps]
Prints one JSON line: {"t8": .., "t32": .., "ceiling": ..}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def kernel(seed: int) -> float:
    """~2s of the tile kernel's op mix: window slice, normalize,
    threshold mask, column-major nonzero, RLE-ish run lengths."""
    rng = np.random.RandomState(seed % 7 + 1)
    img = (rng.rand(3, 256, 256) * 255).astype(np.uint8)
    t0 = time.perf_counter()
    acc = 0
    for i in range(4000):
        o = i % 64
        w = img[:, o : o + 128, o : o + 128]
        f = w.astype(np.float32)
        mn, mx = float(f.min()), float(f.max())
        n = ((f - mn) / max(mx - mn, 1e-9) * 255.0).astype(np.uint8)
        mask = n[0] > 128
        scols, srows = np.nonzero(mask.T)
        acc += int(scols.size)
        flat = np.concatenate(([0], mask.ravel().view(np.uint8), [0]))
        runs = np.diff(np.flatnonzero(np.diff(flat)))
        acc += int(runs.sum())
    return time.perf_counter() - t0


def measure(procs: int, reps: int) -> float:
    best = None
    for _ in range(reps):
        with mp.Pool(procs) as pool:
            times = pool.map(kernel, range(procs))
        m = sum(times) / len(times)
        best = m if best is None else min(best, m)
    return best


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    kernel(0)  # warm numpy
    t8 = measure(8, reps)
    t32 = measure(32, reps)
    print(json.dumps({"t8": round(t8, 3), "t32": round(t32, 3),
                      "ceiling": round(t8 / t32, 3)}))


if __name__ == "__main__":
    main()
