"""Pointer doubling (ops/jump.py) + the redirect_resolve query.

Reference semantics analogue: osm2gtfs's one-hop-at-a-time parent
alias walk (`osm2gtfs/core/elements.py`); here the same resolution
runs in O(log chain) doubling rounds and must be exact under both
physical plans.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from osm2gtfs_ray.ops.jump import (
    PointerCycleError,
    resolve_broadcast,
    resolve_pointers,
    resolve_shuffle,
)


def _ptr_ds(ptr: np.ndarray):
    import ray.data

    n = len(ptr)
    return ray.data.from_arrow(
        pa.table(
            {"node": np.arange(n, dtype=np.int64),
             "ptr": np.asarray(ptr, dtype=np.int64)}
        )
    )


def _resolve_loop(ptr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Scalar chain-follow reference."""
    n = len(ptr)
    term = np.empty(n, dtype=np.int64)
    hops = np.empty(n, dtype=np.int64)
    for i in range(n):
        cur, h = i, 0
        while ptr[cur] != cur:
            cur = ptr[cur]
            h += 1
        term[i], hops[i] = cur, h
    return term, hops


def _rand_functional(n: int, seed: int) -> np.ndarray:
    """Acyclic functional graph: node i (> 0) points below itself with
    probability ~40%, else self (terminal)."""
    rng = np.random.RandomState(seed)
    ptr = np.arange(n, dtype=np.int64)
    redir = (rng.rand(n) < 0.4) & (ptr > 0)
    tgt = (rng.randint(0, 1 << 30, size=n) % np.maximum(ptr, 1)).astype(
        np.int64
    )
    return np.where(redir, tgt, ptr)


class TestPointerJump:
    def test_single_chain_matches_loop(self, ray_session):
        # 0 <- 1 <- 2 <- 3 <- 4: one chain, max hops 4
        ptr = np.array([0, 0, 1, 2, 3], dtype=np.int64)
        got = (
            resolve_broadcast(_ptr_ds(ptr), 5)
            .to_pandas()
            .sort_values("node")
        )
        assert got["terminal"].tolist() == [0, 0, 0, 0, 0]
        assert got["hops"].tolist() == [0, 1, 2, 3, 4]

    def test_broadcast_matches_scalar_loop(self, ray_session):
        ptr = _rand_functional(300, seed=7)
        term, hops = _resolve_loop(ptr)
        got = (
            resolve_broadcast(_ptr_ds(ptr), 300)
            .to_pandas()
            .sort_values("node")
        )
        assert got["terminal"].to_numpy().tolist() == term.tolist()
        assert got["hops"].to_numpy().tolist() == hops.tolist()

    def test_plan_equivalence(self, ray_session):
        ptr = _rand_functional(400, seed=11)
        a = (
            resolve_broadcast(_ptr_ds(ptr), 400)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        b = (
            resolve_shuffle(_ptr_ds(ptr), 400, num_partitions=4)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert a.equals(b)

    def test_cycle_raises_both_plans(self, ray_session):
        ptr = np.array([1, 0, 2], dtype=np.int64)  # 0 <-> 1 cycle
        with pytest.raises(PointerCycleError):
            resolve_broadcast(_ptr_ds(ptr), 3, max_rounds=8)
        with pytest.raises(PointerCycleError):
            resolve_shuffle(_ptr_ds(ptr), 3, max_rounds=8, num_partitions=2)

    def test_doubling_round_count_is_logarithmic(self, ray_session):
        # a length-63 chain must converge within ceil(log2(63)) = 6
        # doubling rounds (+1 to observe stability) — the whole point
        # of the primitive vs one-hop-per-round walking
        n = 64
        ptr = np.maximum(np.arange(n, dtype=np.int64) - 1, 0)
        got = resolve_broadcast(_ptr_ds(ptr), n, max_rounds=7).to_pandas()
        assert got["hops"].max() == n - 1
        with pytest.raises(PointerCycleError):
            # 3 rounds only covers 2^3 = 8 hops: must raise, not
            # return a partially resolved table
            resolve_broadcast(_ptr_ds(ptr), n, max_rounds=3)


class TestRedirectResolve:
    def test_invariants_and_terminal_fixpoint(self, ray_session):
        from osm2gtfs_ray.pipelines.web_queries import q_redirect_resolve

        df = (
            q_redirect_resolve("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert len(df) == 500
        # hops == 0 exactly when a node is its own terminal
        self_term = df["terminal"].to_numpy() == df["node"].to_numpy()
        assert ((df["hops"].to_numpy() == 0) == self_term).all()
        # every terminal is a fixpoint: its own row has hops == 0
        terms = df.set_index("node").loc[df["terminal"].unique()]
        assert (terms["hops"] == 0).all()
        # chains strictly descend, so terminal <= node everywhere
        assert (df["terminal"].to_numpy() <= df["node"].to_numpy()).all()

    def test_plan_selection_threshold(self, ray_session):
        from osm2gtfs_ray.ops.jump import BROADCAST_PTR_ROWS

        ptr = _rand_functional(100, seed=3)
        # explicit shuffle on a tiny graph still matches
        a = (
            resolve_pointers(_ptr_ds(ptr), 100, broadcast=False,
                             num_partitions=2)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        b = (
            resolve_pointers(_ptr_ds(ptr), 100, broadcast=True)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert a.equals(b)
        assert BROADCAST_PTR_ROWS == 2_000_000
