"""Way stitching: order way segments into one polyline (SURVEY.md G3).

Re-expresses the reference's shape assembly
(/root/reference/osm2gtfs/core/osm_connector.py:620-675, core loop
649-670): greedily match each remaining segment's endpoints against
the chain's head/tail, reversing segments as needed; stop when no
segment connects (the reference logs and breaks). Runs per relation
inside groupby(relation_id).map_groups — deterministic because the
input segment order is carried as data (member order).
"""

from __future__ import annotations

import numpy as np


def stitch_ways(segments: list[np.ndarray]) -> tuple[np.ndarray, int]:
    """Segments: list of (k_i, 2) arrays [[lat, lon], ...] in member
    order. Returns (polyline (m,2), n_used). Greedy head/tail matching
    with reversal, first-connectable-segment-wins (mirrors the
    reference's scan order); unused segments are dropped once no
    endpoint matches (the reference's break-on-mismatch)."""
    segs = [np.asarray(s, dtype=np.float64) for s in segments if len(s) >= 2]
    if not segs:
        return np.empty((0, 2)), 0
    chain = segs[0]
    used = [True] + [False] * (len(segs) - 1)
    n_used = 1
    progress = True
    while progress:
        progress = False
        for i in range(1, len(segs)):
            if used[i]:
                continue
            s = segs[i]
            if np.array_equal(chain[-1], s[0]):
                chain = np.concatenate([chain, s[1:]])
            elif np.array_equal(chain[-1], s[-1]):
                chain = np.concatenate([chain, s[::-1][1:]])
            elif np.array_equal(chain[0], s[-1]):
                chain = np.concatenate([s, chain[1:]])
            elif np.array_equal(chain[0], s[0]):
                chain = np.concatenate([s[::-1], chain[1:]])
            else:
                continue
            used[i] = True
            n_used += 1
            progress = True
    return chain, n_used
