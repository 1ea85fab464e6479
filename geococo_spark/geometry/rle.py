"""COCO compressed RLE (run-length encoding) in pure numpy.

Implements the public COCO mask format produced by
``pycocotools.mask.encode`` (used by the reference at
geococo/coco_processing.py:170): the mask is flattened in **column-major
(Fortran) order**, run lengths alternate 0-runs and 1-runs starting with
a (possibly zero-length) 0-run, and the counts are serialized with a
LEB128-like variable-length code using 6 bits per ASCII char offset by
48, with counts at index >= 2 delta-encoded against ``counts[i-2]``.

The format is specified publicly (cocodataset.org and the pycocotools
docs); this is an independent implementation.
"""

from __future__ import annotations

import numpy as np


def mask_to_counts(mask: np.ndarray) -> np.ndarray:
    """Uncompressed RLE counts of a 2-D bool mask, column-major order."""
    flat = np.asfortranarray(mask).ravel(order="F").astype(np.uint8)
    if flat.size == 0:
        return np.zeros(0, dtype=np.int64)
    change = np.nonzero(np.diff(flat))[0] + 1
    run_starts = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(run_starts).astype(np.int64)
    if flat[0] == 1:  # format mandates leading 0-run
        counts = np.concatenate([[0], counts])
    return counts


def counts_to_string(counts: np.ndarray) -> bytes:
    """Serialize counts to the compressed ASCII form."""
    out = bytearray()
    counts = np.asarray(counts, dtype=np.int64)
    for i in range(len(counts)):
        x = int(counts[i])
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def string_to_counts(s: bytes) -> np.ndarray:
    """Inverse of :func:`counts_to_string`."""
    counts: list[int] = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * (k + 1))  # sign-extend
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, dtype=np.int64)


def indices_to_counts(idx: np.ndarray, total: int) -> np.ndarray:
    """RLE counts from SORTED flat (column-major) indices of set pixels.

    Equivalent to ``mask_to_counts`` on the dense mask but O(#set pixels)
    — the tile kernel uses it to encode a small patch embedded in a large
    tile without materializing the tile-sized mask (377k tiny masks per
    bench run made the dense path an allocation storm).
    """
    idx = np.asarray(idx, dtype=np.int64)
    if idx.size == 0:
        return np.array([total], dtype=np.int64)
    brk = np.nonzero(np.diff(idx) > 1)[0]
    starts = np.concatenate([idx[:1], idx[brk + 1]])
    ends = np.concatenate([idx[brk] + 1, idx[-1:] + 1])
    n = len(starts)
    trailing = total - int(ends[-1])
    counts = np.empty(2 * n + (1 if trailing > 0 else 0), dtype=np.int64)
    counts[0] = starts[0]
    counts[1::2] = ends - starts
    counts[2::2][: n - 1] = starts[1:] - ends[:-1]
    if trailing > 0:
        counts[-1] = trailing
    return counts


def encode_from_indices(idx: np.ndarray, h: int, w: int) -> dict:
    """Sorted column-major set-pixel indices -> same dict as :func:`encode`."""
    return {
        "size": [int(h), int(w)],
        "counts": counts_to_string(indices_to_counts(idx, h * w)),
    }


def encode(mask: np.ndarray) -> dict:
    """2-D bool mask -> {"size": [h, w], "counts": bytes}.

    Same contract as ``pycocotools.mask.encode(np.asfortranarray(m))``.
    """
    h, w = mask.shape
    return {"size": [int(h), int(w)], "counts": counts_to_string(mask_to_counts(mask))}


def decode(rle: dict) -> np.ndarray:
    """{"size": [h, w], "counts": bytes} -> 2-D bool mask."""
    h, w = rle["size"]
    counts = string_to_counts(rle["counts"])
    total = int(counts.sum())
    if total != h * w:
        raise ValueError(f"RLE counts sum {total} != h*w {h * w}")
    flat = np.zeros(h * w, dtype=bool)
    pos = 0
    val = False
    for c in counts:
        if val:
            flat[pos : pos + c] = True
        pos += int(c)
        val = not val
    return flat.reshape((h, w), order="F")


def area(rle: dict) -> int:
    counts = string_to_counts(rle["counts"])
    return int(counts[1::2].sum())
