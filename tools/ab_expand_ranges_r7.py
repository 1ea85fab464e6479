"""Round-7 in-window micro A/B: _expand_ranges formulations
(VERDICT r06 next-round #5).

_expand_ranges is a pure (starts, counts) -> (parent, values) expansion
called 4x per kernel burn (~7.5 ms of the 29 ms r6 burn). Three arms,
all bit-exact (asserted in-band; also pinned by tests/test_property.py::
TestExpandRangesEquivalence):

  old     — r6 two-np.repeat + arange + starts[parent] gather
  cumsum  — the VERDICT-suggested single-cumsum delta-scatter rewrite
            (briefly committed in 9ace9d8; measured SLOWER and rejected)
  new     — shipped fused-addend form: arange(total) + repeat(starts -
            cumsum + counts), dropping the gather + one subtract pass

Both burn arms run the SAME real kernel workload
(rasterize_all_touched_flat over bench-shaped star geometries) with the
function monkeypatched per arm, alternating reps in one process; the
isolated timing runs on captured real call inputs.

Measured (round 7, one window, alternating reps): new/old isolated
0.77x, burn 0.977x; cumsum/old isolated 1.16-1.49x, burn 1.05-1.08x.

Run from /root/repo (~1 min):
    python tools/ab_expand_ranges_r7.py [reps=7]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from geococo_spark.geometry import rasterize  # noqa: E402

NEW = rasterize._expand_ranges


def _old_expand_ranges(starts, counts):
    # verbatim r6 formulation (git show aad9065:...rasterize.py:155-160)
    total = int(counts.sum())
    parent = np.repeat(np.arange(len(counts)), counts)
    offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    return parent, starts[parent] + offs


def _cumsum_expand_ranges(starts, counts):
    # verbatim 9ace9d8 formulation (rejected: slower than old)
    nzi = np.flatnonzero(counts > 0)
    if nzi.size == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    c = counts[nzi]
    s = starts[nzi]
    cs = np.cumsum(c)
    total = int(cs[-1])
    bnd = cs[:-1]
    step = np.zeros(total, dtype=np.int64)
    step[bnd] = 1
    parent = nzi[np.cumsum(step)]
    delta = np.ones(total, dtype=np.int64)
    delta[0] = s[0]
    delta[bnd] = s[1:] - s[:-1] - c[:-1] + 1
    return parent, np.cumsum(delta)


def _star_csr(n: int, seed: int):
    """n star labels as the flat rasterizer's CSR inputs (one batched
    call per image of ~n/8 labels, the kernel shape)."""
    rng = np.random.default_rng(seed)
    batches = []
    per_img = 128
    for b in range(max(1, n // per_img)):
        pts, rs, lrs, nr, nc = [], [0], [0], [], []
        for _ in range(per_img):
            k = int(rng.integers(5, 9))
            ang = np.linspace(0, 2 * np.pi, 2 * k, endpoint=False)
            rad = np.where(np.arange(2 * k) % 2 == 0, 22.0, rng.uniform(5, 11))
            cx, cy = rng.uniform(24, 40, size=2)
            xs = cx + rad * np.cos(ang)
            ys = cy + rad * np.sin(ang)
            ring = np.column_stack([xs, ys])
            ring = np.vstack([ring, ring[:1]])
            pts.append(ring)
            rs.append(rs[-1] + len(ring))
            lrs.append(lrs[-1] + 1)
            nr.append(64)
            nc.append(64)
        p = np.vstack(pts)
        batches.append((
            np.ascontiguousarray(p[:, 0]), np.ascontiguousarray(p[:, 1]),
            np.array(rs, dtype=np.int64), np.array(lrs, dtype=np.int64),
            np.array(nr, dtype=np.int64), np.array(nc, dtype=np.int64),
        ))
    return batches


def _burn_once(batches) -> tuple[float, int]:
    t0 = time.perf_counter()
    px = 0
    for (x, y, rs, lrs, nr, nc) in batches:
        _, pl, pr, pc = rasterize.rasterize_all_touched_flat(
            x, y, rs, lrs, nr, nc, return_pixels=True
        )
        px += len(pr)
    return time.perf_counter() - t0, px


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    geoms = _star_csr(4096, seed=7)

    # capture real call inputs for the isolated-function timing
    calls: list[tuple[np.ndarray, np.ndarray]] = []
    orig = rasterize._expand_ranges

    def _capture(starts, counts):
        calls.append((np.array(starts), np.array(counts)))
        return orig(starts, counts)

    rasterize._expand_ranges = _capture
    _burn_once(geoms[:2])
    rasterize._expand_ranges = orig

    for s, c in calls:
        po, vo = _old_expand_ranges(s, c)
        for fn in (NEW, _cumsum_expand_ranges):
            pn, vn = fn(s, c)
            assert np.array_equal(po, pn) and np.array_equal(vo, vn)

    _burn_once(geoms)  # warm
    old_t, new_t, cum_t = [], [], []
    pix_old = pix_new = pix_cum = 0
    for rep in range(reps):
        rasterize._expand_ranges = _old_expand_ranges
        t, pix_old = _burn_once(geoms)
        old_t.append(round(t, 4))
        rasterize._expand_ranges = NEW
        t, pix_new = _burn_once(geoms)
        new_t.append(round(t, 4))
        rasterize._expand_ranges = _cumsum_expand_ranges
        t, pix_cum = _burn_once(geoms)
        cum_t.append(round(t, 4))
        print(f"# rep={rep} old={old_t[-1]} new={new_t[-1]} cumsum={cum_t[-1]}",
              flush=True)
    rasterize._expand_ranges = NEW
    assert pix_old == pix_new == pix_cum

    # isolated function cost over the captured real inputs
    def _iso(fn, n=200):
        t0 = time.perf_counter()
        for _ in range(n):
            for s, c in calls:
                fn(s, c)
        return (time.perf_counter() - t0) / n

    iso_old = _iso(_old_expand_ranges)
    iso_new = _iso(NEW)
    iso_cum = _iso(_cumsum_expand_ranges)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(json.dumps({
        "burn_old_med_s": med(old_t), "burn_new_med_s": med(new_t),
        "burn_cumsum_med_s": med(cum_t),
        "burn_ratio_new": round(med(new_t) / med(old_t), 3),
        "burn_ratio_cumsum": round(med(cum_t) / med(old_t), 3),
        "iso_old_ms": round(iso_old * 1e3, 3),
        "iso_new_ms": round(iso_new * 1e3, 3),
        "iso_cumsum_ms": round(iso_cum * 1e3, 3),
        "iso_ratio_new": round(iso_new / iso_old, 3),
        "iso_ratio_cumsum": round(iso_cum / iso_old, 3),
        "n_captured_calls": len(calls), "pixels": pix_new,
    }), flush=True)


if __name__ == "__main__":
    main()
