"""GDAL-style ``all_touched=True`` polygon rasterization in pure numpy.

Reproduces the semantics the reference gets from
``rasterio.mask.mask(dataset, shapes, all_touched=True, filled=False)``
(geococo/utils.py:33): a pixel is burned if the polygon's interior covers
its center **or** the polygon boundary passes through the pixel cell.
This is exactly how GDAL implements ALL_TOUCHED (standard fill pass +
outline supercover pass).

The affine transform follows the GDAL/rasterio convention
``x = a*col + b*row + c`` / ``y = d*col + e*row + f`` with ``b = d = 0``
(axis-aligned north-up rasters — the only kind the reference fixtures
use: ``from_origin(0, 0, 1, 1)``, reference tests/conftest.py:52).
"""

from __future__ import annotations

import numpy as np

Affine = tuple[float, float, float, float, float, float]


def world_to_pixel(rings: list[np.ndarray], transform: Affine) -> list[np.ndarray]:
    """Map world-coordinate rings into continuous pixel space.

    Pixel cell (row i, col j) covers the unit square [j, j+1] x [i, i+1]
    in the returned coordinates.
    """
    a, b, c, d, e, f = transform
    if b != 0 or d != 0:
        raise ValueError("rotated/sheared transforms not supported")
    out = []
    for ring in rings:
        col = (ring[:, 0] - c) / a
        row = (ring[:, 1] - f) / e
        out.append(np.column_stack([col, row]))
    return out


def _pip_even_odd(px: np.ndarray, py: np.ndarray, rings_px: list[np.ndarray]) -> np.ndarray:
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings_px:
        x0 = ring[:-1, 0][:, None]
        y0 = ring[:-1, 1][:, None]
        x1 = ring[1:, 0][:, None]
        y1 = ring[1:, 1][:, None]
        cond = (y0 > py) != (y1 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
        inside ^= (np.count_nonzero(cond & (px < xint), axis=0) % 2).astype(bool)
    return inside


def _mark_edge_supercover(mask: np.ndarray, x0: float, y0: float, x1: float, y1: float) -> None:
    """Mark all grid cells the segment (in pixel coords) passes through.

    Row-interval method: for each cell-row the segment's y-range covers,
    clip the segment to that row band and mark the spanned columns.
    Horizontal segments lying exactly on a grid line touch both adjacent
    rows (conservative, matches any-intersection semantics); same for
    vertical segments on a column line.
    """
    nrows, ncols = mask.shape
    ylo, yhi = (y0, y1) if y0 <= y1 else (y1, y0)
    r_lo = int(np.floor(ylo))
    r_hi = int(np.floor(yhi))
    if yhi == r_hi and r_hi > r_lo:
        r_hi -= 1  # endpoint exactly on the lower grid line of next row
    if ylo == yhi and ylo == np.floor(ylo):
        # horizontal segment exactly on a grid line: touches rows above+below
        rows = [int(ylo) - 1, int(ylo)]
    else:
        rows = range(max(r_lo, 0), min(r_hi, nrows - 1) + 1)
    dx = x1 - x0
    dy = y1 - y0
    for r in rows:
        if r < 0 or r >= nrows:
            continue
        if dy == 0:
            xa, xb = x0, x1
        else:
            # param range of the segment within y in [r, r+1]
            t0 = (r - y0) / dy
            t1 = (r + 1 - y0) / dy
            tlo = max(min(t0, t1), 0.0)
            thi = min(max(t0, t1), 1.0)
            if thi < tlo:
                continue
            xa = x0 + tlo * dx
            xb = x0 + thi * dx
        clo, chi = (xa, xb) if xa <= xb else (xb, xa)
        c_lo = int(np.floor(clo))
        c_hi = int(np.floor(chi))
        if chi == c_hi and c_hi > c_lo:
            c_hi -= 1
        if clo == chi and clo == np.floor(clo):
            cols = [int(clo) - 1, int(clo)]
        else:
            cols = range(max(c_lo, 0), min(c_hi, ncols - 1) + 1)
        for cc in cols:
            if 0 <= cc < ncols:
                mask[r, cc] = True


def rasterize_all_touched(
    rings: list[np.ndarray], transform: Affine, out_shape: tuple[int, int]
) -> np.ndarray:
    """Burn polygon rings onto a pixel grid, all_touched semantics.

    :param rings: world-coordinate rings (flat list; even-odd fill)
    :param transform: affine (a, b, c, d, e, f) of the *target grid*
        (the tile transform — the reference computes masks against the
        written tile, geococo/coco_processing.py:164-166, so callers pass
        the post-crop window transform)
    :param out_shape: (rows, cols) of the target grid
    :return: 2-D bool mask, same contract as reference mask_label
        (geococo/utils.py:21-37)
    """
    nrows, ncols = out_shape
    mask = np.zeros((nrows, ncols), dtype=bool)
    if not rings:
        return mask
    rings_px = world_to_pixel(rings, transform)
    allpts = np.vstack(rings_px)
    minc = max(int(np.floor(allpts[:, 0].min())), 0)
    maxc = min(int(np.ceil(allpts[:, 0].max())), ncols - 1)
    minr = max(int(np.floor(allpts[:, 1].min())), 0)
    maxr = min(int(np.ceil(allpts[:, 1].max())), nrows - 1)
    if minc > maxc or minr > maxr:
        return mask

    # pass 1: interior fill — pixel centers inside the polygon
    cols = np.arange(minc, maxc + 1)
    rows = np.arange(minr, maxr + 1)
    cgrid, rgrid = np.meshgrid(cols + 0.5, rows + 0.5)
    inside = _pip_even_odd(cgrid.ravel(), rgrid.ravel(), rings_px).reshape(rgrid.shape)
    mask[minr : maxr + 1, minc : maxc + 1] |= inside

    # pass 2: boundary supercover — every cell an edge passes through
    for ring in rings_px:
        for i in range(len(ring) - 1):
            _mark_edge_supercover(
                mask, float(ring[i, 0]), float(ring[i, 1]), float(ring[i + 1, 0]), float(ring[i + 1, 1])
            )
    return mask


def bounding_rect(mask: np.ndarray) -> list[int]:
    """[x, y, w, h] of the True region — cv2.boundingRect equivalent
    (reference geococo/coco_processing.py:171). Zeros if mask is empty."""
    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    if not rows.any():
        return [0, 0, 0, 0]
    rmin, rmax = np.where(rows)[0][[0, -1]]
    cmin, cmax = np.where(cols)[0][[0, -1]]
    return [int(cmin), int(rmin), int(cmax - cmin + 1), int(rmax - rmin + 1)]
