"""Connected-components (dedup grouping) tests vs a scalar union-find."""

from __future__ import annotations

import numpy as np
import pytest

from osm2gtfs_ray.ops.components import connected_components


def _union_find(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label per component
    return {n: find(n) for n in nodes}


@pytest.mark.parametrize("seed", [1, 7])
def test_components_match_union_find(ray_session, seed):
    import ray.data

    rng = np.random.default_rng(seed)
    nodes = list(range(60))
    pairs = set()
    for _ in range(50):
        a, b = rng.integers(0, 60, size=2)
        if a != b:
            pairs.add((int(min(a, b)), int(max(a, b))))
    pairs = sorted(pairs)
    ds = ray.data.from_items([{"a": a, "b": b} for a, b in pairs])
    got = connected_components(ds).to_pandas().set_index("node")["component"].to_dict()
    touched = sorted({n for p in pairs for n in p})
    want = _union_find(pairs, touched)
    want = {n: want[n] for n in touched}
    assert got == want


def test_chain_converges(ray_session):
    """A long path graph needs multiple propagation rounds."""
    import ray.data

    pairs = [{"a": i, "b": i + 1} for i in range(15)]
    got = connected_components(ray.data.from_items(pairs)).to_pandas()
    assert (got["component"] == 0).all()
    assert len(got) == 16


def test_shuffle_plan_matches_broadcast(ray_session):
    """broadcast=False (hash-join plan) must produce identical labels."""
    import ray.data

    pairs = [{"a": i, "b": i + 1} for i in range(9)] + [
        {"a": 20, "b": 21},
        {"a": 21, "b": 22},
    ]
    ds = ray.data.from_items(pairs)
    got_b = (
        connected_components(ds, broadcast=True).to_pandas()
        .sort_values("node").reset_index(drop=True)
    )
    got_s = (
        connected_components(ds, broadcast=False).to_pandas()
        .sort_values("node").reset_index(drop=True)
    )
    assert got_b.equals(got_s)
    assert (got_b["component"].iloc[:10] == 0).all()
