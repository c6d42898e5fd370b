"""Douglas-Peucker polyline simplification, vectorized across MANY
polylines at once.

Reference semantics analogue: osm2gtfs's shape emission walks each
route's way geometry and emits shape points in order
(/root/reference/osm2gtfs/creators/trips_creator.py shape handling,
core/osm_connector.py way node walks); production feeds simplify those
shapes before serving. This module is that simplification pass, built
for the engine's integer-coordinate discipline: coordinates are
QUANTIZED integers (e4/e6 units) and every keep/drop decision is the
exact integer comparison

    cross^2 > eps^2 * seglen^2        (point-to-chord distance > eps)

with cross = (p - a) x (b - a) — no division, no float, so the engine
and the unrolled SQL oracle agree bit-for-bit. Degenerate chords
(a == b) fall back to the point-to-point comparison |p - a|^2 > eps^2.

Vectorization: classic DP recurses per polyline; at corpus scale that
is a Python-loop-per-shape trap. Instead the kernel runs a LEVEL-
SYNCHRONOUS BFS over ALL active segments of ALL shapes in one numpy
pass per level: gather every interior point of every active segment
(``_flat_ranges`` index arithmetic, no loop), compute all cross
products at once, argmax per segment via ``np.maximum.reduceat``, then
split or finalize every segment simultaneously. Level count is bounded
by the longest shape, not the shape count — 10^6 shapes of ~100 points
cost the same ~log-depth passes as one shape.

Overflow bound: with coordinates translated per segment (the kernel
subtracts the chord start), |dx|,|dy| <= the SHAPE's extent E in
quantized units; cross^2 <= 4*E^4 must stay < 2^63, so E <= ~2^15.25 ~
38,900 units (the enforced _MAX_EXTENT=38,000). At e4 quantization
that is a ~3.8-degree shape extent — asserted, not assumed.
"""

from __future__ import annotations

import numpy as np

_MAX_EXTENT = 38_000  # quantized units: cross^2 <= 4*E^4 < 2^63


def _flat_ranges(lengths: np.ndarray) -> np.ndarray:
    lengths = np.asarray(lengths, dtype=np.int64)
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    return np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lengths) - lengths, lengths
    )


def dp_keep_mask(
    offsets: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    eps: int,
    max_levels: int | None = None,
) -> np.ndarray:
    """Boolean keep-mask for Douglas-Peucker over concatenated
    polylines.

    offsets: int64 [n_shapes+1] — shape k's points are
        x[offsets[k]:offsets[k+1]] in path order.
    x, y: int64 quantized coordinates.
    eps: tolerance in the same quantized units (integer).

    max_levels: optional hard cap on BFS split levels — raises
    RuntimeError when exceeded. A caller whose oracle unrolls K levels
    passes K so any depth divergence is a loud error, never a silent
    result mismatch.

    Returns a bool mask over the flat point arrays; endpoints of every
    shape are always kept. Exact integer arithmetic throughout.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    starts, ends = offsets[:-1], offsets[1:] - 1  # inclusive endpoint
    ok = ends >= starts
    keep[starts[ok]] = True
    keep[ends[ok]] = True

    # per-shape extent guard (translated coords must fit the bound)
    if ok.any():
        red = offsets[:-1][ok]
        for arr in (x, y):
            ext = np.maximum.reduceat(arr, red) - np.minimum.reduceat(arr, red)
            if int(ext.max()) > _MAX_EXTENT:
                raise ValueError(
                    "dp_keep_mask: shape extent exceeds the int64-exact "
                    f"bound ({_MAX_EXTENT} quantized units); re-quantize "
                    "coarser or split the shape"
                )

    eps2 = np.int64(eps) * np.int64(eps)
    # active segments: chord (a, b), interior points (a, b) exclusive
    seg_a = starts[ends - starts >= 2]
    seg_b = ends[ends - starts >= 2]

    level = 0
    while len(seg_a):
        level += 1
        if max_levels is not None and level > max_levels:
            raise RuntimeError(
                f"dp_keep_mask: split depth exceeded max_levels={max_levels}"
            )
        m = seg_b - seg_a - 1  # interior points per segment
        idx = np.repeat(seg_a + 1, m) + _flat_ranges(m)  # flat pt index
        rep_a = np.repeat(seg_a, m)
        rep_b = np.repeat(seg_b, m)
        dxp = x[idx] - x[rep_a]
        dyp = y[idx] - y[rep_a]
        dxc = x[rep_b] - x[rep_a]
        dyc = y[rep_b] - y[rep_a]
        cross = dxp * dyc - dyp * dxc
        d2num = cross * cross  # distance^2 * seglen^2
        seglen2 = dxc * dxc + dyc * dyc
        # degenerate chord: distance is point-to-a
        deg = seglen2 == 0
        if deg.any():
            d2num = np.where(deg, dxp * dxp + dyp * dyp, d2num)
            seglen2 = np.where(deg, 1, seglen2)
        # argmax per segment: max value via reduceat, then the FIRST
        # interior index attaining it (deterministic tie-break).
        # seglen2 is constant within a segment, so argmax over the
        # cross^2 numerators IS the argmax over distances; the split
        # test cross-multiplies the exact rationals: d2num > eps2 *
        # seglen2.
        bounds = np.concatenate([[0], np.cumsum(m)])
        seg_of = np.repeat(np.arange(len(seg_a)), m)
        maxv = np.maximum.reduceat(d2num, bounds[:-1])
        pos = np.arange(len(d2num), dtype=np.int64)
        cand = np.where(d2num == maxv[seg_of], pos, np.iinfo(np.int64).max)
        first_idx = np.minimum.reduceat(cand, bounds[:-1])
        split = maxv > eps2 * seglen2[bounds[:-1]]
        far = idx[first_idx[split]]
        keep[far] = True
        # children: (a, far) and (far, b), only those with interiors
        na = np.concatenate([seg_a[split], far])
        nb = np.concatenate([far, seg_b[split]])
        live = nb - na >= 2
        seg_a, seg_b = na[live], nb[live]
    return keep


def dp_reference(pts: list[tuple[int, int]], eps: int) -> list[bool]:
    """Straightforward recursive DP (test reference, one polyline)."""
    n = len(pts)
    keep = [False] * n
    if n == 0:
        return keep
    keep[0] = keep[-1] = True

    def rec(i0: int, i1: int) -> None:
        if i1 - i0 < 2:
            return
        ax, ay = pts[i0]
        bx, by = pts[i1]
        dxc, dyc = bx - ax, by - ay
        seglen2 = dxc * dxc + dyc * dyc
        best, bestv = -1, -1
        for j in range(i0 + 1, i1):
            px, py = pts[j][0] - ax, pts[j][1] - ay
            if seglen2 == 0:
                v = (px * px + py * py) * 1
                s2 = 1
            else:
                c = px * dyc - py * dxc
                v = c * c
                s2 = seglen2
            if v > bestv:
                best, bestv = j, v
        if bestv > eps * eps * (seglen2 if seglen2 else 1):
            keep[best] = True
            rec(i0, best)
            rec(best, i1)

    rec(0, n - 1)
    return keep
