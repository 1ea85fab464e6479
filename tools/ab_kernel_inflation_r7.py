"""Pipeline-context kernel inflation — attribution probe (round 7).

Observation (round-7 batteries): in FULL PIPELINE context the kernel
accumulator's core-seconds inflate ~2x from local[8] to local[32]
(8192 imgs: 410 -> 858 core-s), while the ISOLATED kernel roofline
says the kernel only self-inflates 1.22x from 1 to 32 concurrent
copies. Hypothesis: the extra inflation is NOT the kernel competing
with itself — it is the kernel sharing the DRAM bus with the
pipeline's CONCURRENT non-kernel work (Arrow serialization, shuffle
spill/fetch, parquet decode on other cores), which only exists at the
higher parallelism because at local[8] the stage mix serializes more.

Probe (one window, three arms, alternated x ROUNDS):

- ``iso8``    — 8 concurrent kernel copies, otherwise idle box
                (baseline per-run wall);
- ``iso32``   — 32 concurrent copies (kernel-vs-kernel contention:
                the roofline's own inflation reading);
- ``iso8_bg24`` — 8 kernel copies + 24 ANTAGONIST processes running
                STREAM-triad loops (kernel-vs-other-traffic
                contention with the kernel's own concurrency held
                at 8).

Read: if ``iso8_bg24 / iso8`` reproduces (or exceeds) the
``iso32 / iso8`` inflation, then ANY co-running memory traffic — not
kernel pathology — accounts for per-copy slowdown at high box
occupancy, and the pipeline-context 2x is the expected shared-bus
cost of actually using all 32 cores, already counted by the
whole-pipeline throughput numbers (img/s), not a separate regression
to fix in the kernel. A fix, if ever needed, is stage scheduling
(don't co-run the burn with heavy shuffle), not numpy.

Usage: python tools/ab_kernel_inflation_r7.py [rounds]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from dram_roofline import _kernel_worker  # noqa: E402  (same inputs as the roofline)

BG_N = 4_000_000  # 3 arrays x 32 MB per antagonist — well past LLC


def _antagonist(barrier, stop):
    a = np.zeros(BG_N)
    b = np.random.rand(BG_N)
    c = np.random.rand(BG_N)
    np.add(b, 2.5 * c, out=a)  # fault pages before the barrier
    barrier.wait()
    while not stop.is_set():
        np.multiply(c, 2.5, out=a)
        a += b


def _arm(n_kernel: int, n_bg: int) -> float:
    """Median per-run kernel wall with n_kernel concurrent copies and
    n_bg triad antagonists sharing the box."""
    ctx = mp.get_context("spawn")
    with ctx.Manager() as mgr:
        barrier = mgr.Barrier(n_kernel + n_bg)
        stop = mgr.Event()
        bgs = [
            ctx.Process(target=_antagonist, args=(barrier, stop), daemon=True)
            for _ in range(n_bg)
        ]
        for p in bgs:
            p.start()
        try:
            with ctx.Pool(n_kernel) as pool:
                res = pool.map(_kernel_worker, [(barrier, i) for i in range(n_kernel)])
        finally:
            stop.set()
            for p in bgs:
                p.join(timeout=30)
                if p.is_alive():
                    p.terminate()
    walls = sorted(r[0] for r in res)
    return walls[len(walls) // 2]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    arms = {"iso8": (8, 0), "iso32": (32, 0), "iso8_bg24": (8, 24)}
    series: dict[str, list[float]] = {k: [] for k in arms}
    for r in range(rounds):
        for name, (nk, nb) in arms.items():
            t0 = time.perf_counter()
            med = _arm(nk, nb)
            series[name].append(round(med, 4))
            print(
                f"# round {r} {name}: per-run {med:.3f}s "
                f"(arm wall {time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
    med = {k: sorted(v)[len(v) // 2] for k, v in series.items()}
    out = {
        "series": series,
        "median": med,
        "inflation_iso32_vs_iso8": round(med["iso32"] / med["iso8"], 3),
        "inflation_bg24_vs_iso8": round(med["iso8_bg24"] / med["iso8"], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
