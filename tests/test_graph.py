"""Link-graph operator tests: fixed-point PageRank (ops/pagerank.py)
and the robots prefix filter (pipelines/web_queries.py).

The SQL gate (`pagerank`, `robots_filter`) is the bit-exact oracle;
these tests pin (a) the graph synthesis invariants, (b) the integer
recurrence against an intentionally scalar reference loop, (c)
broadcast-vs-shuffle plan equivalence, and (d) prefix-match semantics
("/p1" blocks "/p10").
"""

import numpy as np
import pyarrow as pa
import pytest

from osm2gtfs_ray.ops.pagerank import (
    TOTAL_FP,
    pagerank,
    pagerank_broadcast,
    pagerank_shuffle,
)
from osm2gtfs_ray.pipelines.graph_queries import PR_ITERS, synthesize_edges
from osm2gtfs_ray.pipelines.web_queries import robots_rules

N = 64


def _edges_table(n=N) -> pa.Table:
    return synthesize_edges(np.arange(n, dtype=np.uint64), n)


def pagerank_loop(edges: pa.Table, n: int, iters: int) -> np.ndarray:
    """Independent scalar-loop reference of the exact integer
    recurrence in ops/pagerank.py's module docstring."""
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    outdeg = edges["outdeg"].to_numpy()
    r = np.full(n, TOTAL_FP // n, dtype=np.int64)
    base = (15 * (TOTAL_FP // n)) // 100
    for _ in range(iters):
        inflow = np.zeros(n, dtype=np.int64)
        for s, d, o in zip(src.tolist(), dst.tolist(), outdeg.tolist()):
            inflow[d] += r[s] // o
        r = base + (85 * inflow) // 100
    return r


class TestGraphSynthesis:
    def test_degree_bounds_and_no_self_loops(self):
        e = _edges_table()
        src = e["src"].to_numpy()
        dst = e["dst"].to_numpy()
        assert (src != dst).all()
        assert dst.min() >= 0 and dst.max() < N
        counts = np.bincount(src, minlength=N)
        assert counts.min() >= 1 and counts.max() <= 3
        # outdeg column == actual multiplicity of src in the edge list
        assert (e["outdeg"].to_numpy() == counts[src]).all()

    def test_deterministic(self):
        a, b = _edges_table(), _edges_table()
        assert a.equals(b)

    def test_batch_invariant(self):
        # synthesizing in two halves yields the same edge set
        whole = _edges_table().sort_by([("src", "ascending"), ("dst", "ascending")])
        lo = synthesize_edges(np.arange(N // 2, dtype=np.uint64), N)
        hi = synthesize_edges(np.arange(N // 2, N, dtype=np.uint64), N)
        halves = pa.concat_tables([lo, hi]).sort_by(
            [("src", "ascending"), ("dst", "ascending")]
        )
        assert whole.equals(halves)


class TestPagerank:
    def test_broadcast_matches_reference_loop(self, ray_session):
        import ray.data

        edges = ray.data.from_arrow(_edges_table())
        got = (
            pagerank_broadcast(edges, N, iters=PR_ITERS)
            .to_pandas()
            .sort_values("doc_id")
        )
        want = pagerank_loop(_edges_table(), N, PR_ITERS)
        assert (got["rank_fp"].to_numpy() == want).all()

    def test_plan_equivalence(self, ray_session):
        import ray.data

        edges = ray.data.from_arrow(_edges_table())
        b = pagerank(edges, N, iters=3, broadcast=True).to_pandas()
        edges2 = ray.data.from_arrow(_edges_table())
        s = pagerank(edges2, N, iters=3, broadcast=False, num_partitions=4).to_pandas()
        b = b.sort_values("doc_id").reset_index(drop=True)
        s = s.sort_values("doc_id").reset_index(drop=True)
        assert (b["rank_fp"].to_numpy() == s["rank_fp"].to_numpy()).all()

    def test_mass_bounded_and_teleport_floor(self, ray_session):
        import ray.data

        edges = ray.data.from_arrow(_edges_table())
        r = pagerank_broadcast(edges, N, iters=2).to_pandas()["rank_fp"].to_numpy()
        base = (15 * (TOTAL_FP // N)) // 100
        assert (r >= base).all()
        # floor divisions only ever drop mass
        assert r.sum() <= TOTAL_FP


class TestRobots:
    def test_rules_deterministic_and_total(self):
        d1, p1 = robots_rules()
        d2, p2 = robots_rules()
        assert (d1 == d2).all() and (p1 == p2).all()
        assert len(d1) == 150 and len(np.unique(d1)) == 150
        assert all(p.startswith("/p") for p in p1.tolist())

    def test_prefix_semantics_block_longer_paths(self):
        # "/p1" must block "/p1", "/p1/q3" AND "/p10" (true prefix match)
        assert np.char.startswith(np.array(["/p1", "/p1/q3", "/p10", "/p2"]),
                                  "/p1").tolist() == [True, True, True, False]

    def test_query_counts_match_brute(self, ray_session):
        from osm2gtfs_ray.pipelines.web_queries import (
            canonicalize_urls,
            q_robots_filter,
            synthesize_messy_urls,
        )

        sf = "/root/testdata/sf0.001"
        got = (
            q_robots_filter(sf)
            .to_pandas()
            .sort_values("domain")
            .reset_index(drop=True)
        )
        import pyarrow.parquet as pq

        ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy()
        canon = canonicalize_urls(
            pa.array(synthesize_messy_urls(ids.astype(np.uint64)))
        )
        doms, pres = robots_rules()
        rule = dict(zip(doms.tolist(), pres.tolist()))
        import collections

        blocked = collections.Counter()
        allowed = collections.Counter()
        for d, p in zip(canon["domain"].to_pylist(), canon["path"].to_pylist()):
            if p.startswith(rule[d]):
                blocked[d] += 1
            else:
                allowed[d] += 1
        for _, row in got.iterrows():
            assert row["n_blocked"] == blocked[row["domain"]]
            assert row["n_allowed"] == allowed[row["domain"]]
        assert got["n_blocked"].sum() + got["n_allowed"].sum() == len(ids)
