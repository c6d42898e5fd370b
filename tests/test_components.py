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


def test_driver_plan_matches_distributed_plans(ray_session):
    """The size-aware driver fast-path (edges <= DRIVER_EDGE_ROWS,
    in-memory numpy propagation) must equal BOTH distributed plans."""
    import ray.data

    rng = np.random.default_rng(11)
    pairs = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, 200, size=(300, 2))
            if a != b
        }
    )

    def run(**kw):
        ds = ray.data.from_items([{"a": a, "b": b} for a, b in pairs])
        return (
            connected_components(ds, **kw)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )

    got_driver = run()  # auto → driver fast-path at this size
    got_b = run(broadcast=True)
    # pin the shuffle fan-out: from_items yields ~1 block per row and
    # the default num_partitions (≈ num_blocks) would spawn hundreds of
    # join partitions on the 4-CPU test session
    got_s = run(broadcast=False, num_partitions=4)
    assert got_driver.equals(got_b)
    assert got_driver.equals(got_s)
