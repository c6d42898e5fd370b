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


def bfs_loop(edges: pa.Table, n: int, seeds: np.ndarray, iters: int) -> np.ndarray:
    """Independent scalar-loop BFS reference (queue-free round form)."""
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    dist = np.full(n, -1, dtype=np.int64)
    dist[seeds] = 0
    for r in range(1, iters + 1):
        newly = set()
        for s, d in zip(src.tolist(), dst.tolist()):
            if dist[s] == r - 1 and dist[d] == -1:
                newly.add(d)
        if not newly:
            break
        dist[list(newly)] = r
    return dist


class TestBFS:
    def _seeds(self, n):
        return np.arange(0, n, 7, dtype=np.int64)

    def test_matches_scalar_loop(self, ray_session):
        import ray.data

        from osm2gtfs_ray.ops.bfs import bfs_broadcast

        e = _edges_table()
        want = bfs_loop(e, N, self._seeds(N), iters=3)
        got = (
            bfs_broadcast(ray.data.from_arrow(e), N, self._seeds(N), iters=3)
            .to_pandas()
            .sort_values("doc_id")
        )
        reached = np.flatnonzero(want >= 0)
        assert got["doc_id"].to_numpy().tolist() == reached.tolist()
        assert got["hops"].to_numpy().tolist() == want[reached].tolist()

    def test_plan_equivalence(self, ray_session):
        import ray.data

        from osm2gtfs_ray.ops.bfs import bfs_broadcast, bfs_shuffle

        e = _edges_table()
        seeds = self._seeds(N)
        a = (
            bfs_broadcast(ray.data.from_arrow(e), N, seeds, iters=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            bfs_shuffle(ray.data.from_arrow(e), N, seeds, iters=3,
                        num_partitions=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert a.equals(b)

    def test_seed_hops_zero_and_monotone_reach(self, ray_session):
        import ray.data

        from osm2gtfs_ray.ops.bfs import bfs_broadcast

        e = _edges_table()
        seeds = self._seeds(N)
        got = bfs_broadcast(
            ray.data.from_arrow(e), N, seeds, iters=3
        ).to_pandas().set_index("doc_id")["hops"]
        assert (got.loc[seeds] == 0).all()
        # more rounds can only add reach, never change existing labels
        more = bfs_broadcast(
            ray.data.from_arrow(e), N, seeds, iters=4
        ).to_pandas().set_index("doc_id")["hops"]
        joined = got.to_frame("h3").join(more.to_frame("h4"), how="left")
        assert (joined["h3"] == joined["h4"]).all()
        assert len(more) >= len(got)


class TestDomainLinkStats:
    def test_matches_brute(self, ray_session):
        import collections

        from osm2gtfs_ray.pipelines.graph_queries import q_domain_link_stats
        from osm2gtfs_ray.pipelines.web_queries import domains_of

        sf = "/root/testdata/sf0.001"
        got = (
            q_domain_link_stats(sf)
            .to_pandas()
            .sort_values("domain")
            .reset_index(drop=True)
        )
        import pyarrow.parquet as pq

        ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy()
        e = synthesize_edges(ids.astype(np.uint64), len(ids))
        sd = domains_of(e["src"].to_numpy().astype(np.uint64))
        dd = domains_of(e["dst"].to_numpy().astype(np.uint64))
        n_in = collections.Counter(dd.tolist())
        n_ext = collections.Counter(dd[sd != dd].tolist())
        srcs = collections.defaultdict(set)
        for s, d in zip(sd.tolist(), dd.tolist()):
            srcs[d].add(s)
        assert got["n_inlinks"].sum() == len(e)
        for _, row in got.iterrows():
            d = row["domain"]
            assert row["n_inlinks"] == n_in[d]
            assert row["n_external"] == n_ext[d]
            assert row["n_src_domains"] == len(srcs[d])


class TestReciprocalLinks:
    def test_matches_brute(self, ray_session):
        from osm2gtfs_ray.pipelines.graph_queries import q_reciprocal_links

        sf = "/root/testdata/sf0.001"
        got = (
            q_reciprocal_links(sf)
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        import pyarrow.parquet as pq

        ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy()
        e = synthesize_edges(ids.astype(np.uint64), len(ids))
        fwd = set(zip(e["src"].to_numpy().tolist(), e["dst"].to_numpy().tolist()))
        want = sorted({(min(s, d), max(s, d)) for (s, d) in fwd if (d, s) in fwd})
        assert list(zip(got["a"].tolist(), got["b"].tolist())) == want
        assert (got["a"] < got["b"]).all()


class TestAnchorTopTerms:
    """Anchor consensus: majority vote per target with deterministic
    tie-break (lowest term id). The SQL gate is the bit-exact oracle;
    these pin the vote semantics against an independent pandas
    reference over the same synthetic edges."""

    def _reference(self, n=N):
        import pandas as pd

        from osm2gtfs_ray.pipelines.graph_queries import (
            N_ANCHOR_TERMS,
            SEED,
            _EKEY_C,
            _S_ANCHOR,
        )
        from osm2gtfs_ray.sources.pages import _uint

        e = _edges_table(n)
        src = e["src"].to_numpy().astype(np.uint64)
        dst = e["dst"].to_numpy().astype(np.uint64)
        ekey = src * np.uint64(_EKEY_C) + dst
        tid = _uint(ekey, _S_ANCHOR, SEED, N_ANCHOR_TERMS)
        df = pd.DataFrame({"doc_id": dst.astype(np.int64), "term_id": tid})
        rows = []
        for did, g in df.groupby("doc_id"):
            cnt = g["term_id"].value_counts()
            top_n = int(cnt.max())
            top = int(min(cnt[cnt == top_n].index))  # tie -> lowest id
            rows.append((did, f"anchor{top}", top_n, len(g), cnt.size))
        return pd.DataFrame(
            rows, columns=["doc_id", "top_term", "top_n", "n_anchors", "n_terms"]
        )

    def test_matches_reference_vote(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.graph_queries import q_anchor_top_terms

        pq.write_table(
            pa.table({"doc_id": np.arange(N, dtype=np.int64)}),
            tmp_path / "documents.parquet",
        )
        got = (
            q_anchor_top_terms(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._reference().sort_values("doc_id").reset_index(drop=True)
        assert got.astype(want.dtypes.to_dict()).equals(want)

    def test_anchor_mass_conserved(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.graph_queries import q_anchor_top_terms

        pq.write_table(
            pa.table({"doc_id": np.arange(N, dtype=np.int64)}),
            tmp_path / "documents.parquet",
        )
        got = q_anchor_top_terms(str(tmp_path)).to_pandas()
        e = _edges_table()
        assert got["n_anchors"].sum() == len(e)  # every edge voted once
        assert (got["top_n"] <= got["n_anchors"]).all()
        assert (got["n_terms"] <= got["n_anchors"]).all()


class TestCocitation:
    """Co-citation pairs vs an independent brute pandas reference
    (distinct source domains per target, ascending cap, all unordered
    pairs, min-shared filter). SQL gate: `cocitation`."""

    def test_matches_brute_reference(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.graph_queries import (
            COCITE_CAP,
            COCITE_MIN_SHARED,
            q_cocitation,
        )
        from osm2gtfs_ray.pipelines.web_queries import domains_of

        n = 200
        pq.write_table(
            pa.table({"doc_id": np.arange(n, dtype=np.int64)}),
            tmp_path / "documents.parquet",
        )
        got = (
            q_cocitation(str(tmp_path))
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )

        e = synthesize_edges(np.arange(n, dtype=np.uint64), n)
        df = pd.DataFrame(
            {
                "dst": e["dst"].to_numpy(),
                "sd": domains_of(e["src"].to_numpy().astype(np.uint64)),
            }
        ).drop_duplicates()
        from collections import Counter

        cnt = Counter()
        for _, g in df.groupby("dst"):
            doms = sorted(g["sd"])[:COCITE_CAP]
            for i in range(len(doms)):
                for j in range(i + 1, len(doms)):
                    cnt[(doms[i], doms[j])] += 1
        want = (
            pd.DataFrame(
                [(a, b, c) for (a, b), c in cnt.items() if c >= COCITE_MIN_SHARED],
                columns=["a", "b", "n_shared"],
            )
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        assert got.astype(want.dtypes.to_dict()).equals(want)


class TestTriangles:
    """Degree-ordered triangle enumeration vs an independent brute
    reference (adjacency-set intersection per edge); local and shuffle
    plans must agree. SQL gate: `triangles`."""

    def _brute(self, n):
        import pandas as pd

        e = synthesize_edges(np.arange(n, dtype=np.uint64), n)
        s, d = e["src"].to_numpy(), e["dst"].to_numpy()
        a, b = np.minimum(s, d), np.maximum(s, d)
        m = a != b
        und = set(zip(a[m].tolist(), b[m].tolist()))
        adj: dict[int, set[int]] = {}
        for x, y in und:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        ntri = {x: 0 for x in adj}
        for x, y in und:
            for z in adj[x] & adj[y]:
                ntri[z] += 1
        # each triangle adds exactly 1 at each vertex (via the one
        # opposite edge), so ntri[x] IS the per-node triangle count
        rows = [
            (x, ntri[x], len(adj[x]) * (len(adj[x]) - 1) // 2)
            for x in adj
            if len(adj[x]) >= 2
        ]
        return (
            pd.DataFrame(rows, columns=["doc_id", "n_tri", "n_wedge"])
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_matches_brute_reference(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.graph_queries import q_triangles

        n = 300
        pq.write_table(
            pa.table({"doc_id": np.arange(n, dtype=np.int64)}),
            tmp_path / "documents.parquet",
        )
        got = (
            q_triangles(str(tmp_path), plan="local")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._brute(n)
        assert got.astype(want.dtypes.to_dict()).equals(want)
        assert got["n_tri"].sum() > 0  # non-vacuous at this n

    def test_plan_equivalence(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.graph_queries import q_triangles

        n = 300
        pq.write_table(
            pa.table({"doc_id": np.arange(n, dtype=np.int64)}),
            tmp_path / "documents.parquet",
        )

        def canon(ds):
            return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

        a = canon(q_triangles(str(tmp_path), plan="local"))
        b = canon(q_triangles(str(tmp_path), plan="shuffle"))
        assert b.astype(a.dtypes.to_dict()).equals(a)


class TestHits:
    """Fixed-point HITS invariants + plan equivalence; the SQL gate
    (`hits`, unrolled renorm CTE rounds) is the bit-exact oracle."""

    def test_plan_equivalence_and_invariants(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.ops.hits import TOTAL_HITS, hits_shuffle
        from osm2gtfs_ray.pipelines.graph_queries import (
            HITS_ITERS,
            build_link_graph,
            q_hits,
        )

        n = 300
        pq.write_table(
            pa.table({"doc_id": np.arange(n, dtype=np.int64)}),
            tmp_path / "documents.parquet",
        )

        def canon(ds):
            return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

        got = canon(q_hits(str(tmp_path)))  # broadcast at this n
        sh = canon(
            hits_shuffle(
                build_link_graph(str(tmp_path)), n,
                iters=HITS_ITERS, num_partitions=2,
            )
        )
        assert sh.astype(got.dtypes.to_dict()).equals(got)
        assert len(got) == n
        # integer L1 renorm: floor keeps each mass in (TOTAL - n, TOTAL]
        for col in ("hub_fp", "auth_fp"):
            tot = got[col].sum()
            assert TOTAL_HITS - n < tot <= TOTAL_HITS
            assert (got[col] >= 0).all()
        # mutual reinforcement is non-degenerate: scores differ
        assert got["hub_fp"].nunique() > 10
        assert got["auth_fp"].nunique() > 10


class TestKCore:
    """3-core peeling vs a brute numpy peel loop; plan equivalence;
    round-budget guard raises. SQL gate: `kcore` (unrolled rounds)."""

    def _brute(self, n, k=3):
        e = synthesize_edges(np.arange(n, dtype=np.uint64), n)
        s, d = e["src"].to_numpy(), e["dst"].to_numpy()
        a, b = np.minimum(s, d), np.maximum(s, d)
        key = np.unique(a[a != b].astype(np.int64) * n + b[a != b])
        a, b = key // n, key % n
        alive = np.ones(n, dtype=bool)
        while True:
            m = alive[a] & alive[b]
            deg = np.bincount(a[m], minlength=n) + np.bincount(b[m], minlength=n)
            drop = alive & (deg < k)
            if not drop.any():
                return np.flatnonzero(alive), deg[alive]
            alive &= ~drop

    def test_matches_brute_and_plans_agree(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow.parquet as pq

        from osm2gtfs_ray.ops.kcore import kcore_shuffle
        from osm2gtfs_ray.pipelines.graph_queries import (
            KCORE_K,
            build_und_edges,
            q_kcore,
        )

        n = 300
        pq.write_table(
            pa.table({"doc_id": np.arange(n, dtype=np.int64)}),
            tmp_path / "documents.parquet",
        )
        got = (
            q_kcore(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ids, deg = self._brute(n, KCORE_K)
        assert got["doc_id"].to_numpy().tolist() == ids.tolist()
        assert got["deg_core"].to_numpy().tolist() == deg.tolist()
        assert (got["deg_core"] >= KCORE_K).all() and len(got) > 0

        sh = (
            kcore_shuffle(build_und_edges(str(tmp_path)), KCORE_K,
                          num_partitions=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert sh.astype(got.dtypes.to_dict()).equals(got)

    def test_round_budget_raises(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import pytest as _pytest

        from osm2gtfs_ray.pipelines.graph_queries import (
            KCORE_K,
            build_und_edges,
        )
        from osm2gtfs_ray.ops.kcore import kcore_broadcast

        n = 300
        pq.write_table(
            pa.table({"doc_id": np.arange(n, dtype=np.int64)}),
            tmp_path / "documents.parquet",
        )
        with _pytest.raises(RuntimeError, match="max_rounds"):
            kcore_broadcast(build_und_edges(str(tmp_path)), n, KCORE_K,
                            max_rounds=1)


class TestTileAuthority:
    """Composition invariants: total attributed rank mass equals
    (entity count per doc) . (rank per doc) — conservation across the
    graph x geo join. SQL gate: `tile_authority` (chained oracles)."""

    def test_mass_conservation(self, ray_session):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.graph_queries import (
            q_pagerank,
            q_tile_authority,
        )
        from osm2gtfs_ray.sources.pages import _uint

        sf = "/root/testdata/sf0.001"
        got = q_tile_authority(sf).to_pandas()
        ranks = q_pagerank(sf).to_pandas().sort_values("doc_id")
        did = ranks["doc_id"].to_numpy().astype(np.uint64)
        n_ent = _uint(did, 3, 42, 4)
        want_mass = int((ranks["rank_fp"].to_numpy() * n_ent).sum())
        want_ents = int(n_ent.sum())
        assert int(got["rank_fp"].sum()) == want_mass
        assert int(got["n_ent"].sum()) == want_ents
        assert (got["n_ent"] >= 1).all()


class TestSCC:
    """SCC labels vs an independent Tarjan-free brute (pairwise
    mutual reachability closure); driver and FW-BW plans agree; sweep
    budget raises. SQL gate: `scc` (recursive closure oracle)."""

    def _brute(self, n):
        e = synthesize_edges(np.arange(n, dtype=np.uint64), n)
        src, dst = e["src"].to_numpy(), e["dst"].to_numpy()
        reach = np.zeros((n, n), dtype=bool)
        reach[src, dst] = True
        reach[np.arange(n), np.arange(n)] = True
        # Floyd-Warshall boolean closure (small n only)
        for k in range(n):
            reach |= np.outer(reach[:, k], reach[k, :])
        mutual = reach & reach.T
        return np.array([np.flatnonzero(mutual[i]).min() for i in range(n)])

    def test_matches_brute_and_plans_agree(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.ops.scc import scc_broadcast
        from osm2gtfs_ray.pipelines.graph_queries import (
            build_link_graph,
            q_scc,
        )

        n = 120
        pq.write_table(
            pa.table({"doc_id": np.arange(n, dtype=np.int64)}),
            tmp_path / "documents.parquet",
        )
        got = (
            q_scc(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._brute(n)
        assert got["scc"].to_numpy().tolist() == want.tolist()

        fb = (
            scc_broadcast(build_link_graph(str(tmp_path)), n)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert fb["scc"].to_numpy().tolist() == want.tolist()

    def test_sweep_budget_raises(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import pytest as _pytest

        from osm2gtfs_ray.ops.scc import scc_broadcast
        from osm2gtfs_ray.pipelines.graph_queries import build_link_graph

        n = 120
        pq.write_table(
            pa.table({"doc_id": np.arange(n, dtype=np.int64)}),
            tmp_path / "documents.parquet",
        )
        with _pytest.raises(RuntimeError, match="max_passes"):
            scc_broadcast(build_link_graph(str(tmp_path)), n, max_passes=1)


class TestBowtie:
    """Bow-tie classes vs a brute closure reference; a handcrafted
    graph exercises all four classes through the same scc+bfs method.
    SQL gate: `bowtie`."""

    def test_matches_brute_closure(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.graph_queries import q_bowtie

        n = 120
        pq.write_table(
            pa.table({"doc_id": np.arange(n, dtype=np.int64)}),
            tmp_path / "documents.parquet",
        )
        got = (
            q_bowtie(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        e = synthesize_edges(np.arange(n, dtype=np.uint64), n)
        src, dst = e["src"].to_numpy(), e["dst"].to_numpy()
        reach = np.zeros((n, n), dtype=bool)
        reach[src, dst] = True
        reach[np.arange(n), np.arange(n)] = True
        for k in range(n):
            reach |= np.outer(reach[:, k], reach[k, :])
        mutual = reach & reach.T
        scc = np.array([np.flatnonzero(mutual[i]).min() for i in range(n)])
        u, c = np.unique(scc, return_counts=True)
        core_label = int(u[np.lexsort((u, -c))[0]])
        is_core = scc == core_label
        cm = np.flatnonzero(is_core)
        inr = reach[:, cm].any(axis=1)
        outr = reach[cm, :].any(axis=0)
        want = np.where(is_core, "core",
                        np.where(inr, "in",
                                 np.where(outr, "out", "other")))
        assert got["cls"].tolist() == want.tolist()

    def test_all_classes_on_handcrafted_graph(self, ray_session):
        """in -> core-cycle -> out, plus a disconnected 2-cycle
        ('other'): the classification method covers all four classes."""
        import ray.data

        from osm2gtfs_ray.ops.bfs import bfs_broadcast
        from osm2gtfs_ray.ops.scc import scc

        # 0 -> (1 <-> 2) -> 3 ; 4 <-> 5 disconnected
        e = pa.table(
            {
                "src": np.array([0, 1, 2, 2, 4, 5], dtype=np.int64),
                "dst": np.array([1, 2, 1, 3, 5, 4], dtype=np.int64),
                "outdeg": np.array([1, 1, 2, 2, 1, 1], dtype=np.int64),
            }
        )
        n = 6
        edges = ray.data.from_arrow(e)
        labels_tbl = scc(edges, n).to_pandas().sort_values("doc_id")
        labels = labels_tbl["scc"].to_numpy()
        u, c = np.unique(labels, return_counts=True)
        core_label = int(u[np.lexsort((u, -c))[0]])
        assert core_label == 1 and (labels == 1).sum() == 2
        core = np.flatnonzero(labels == core_label).astype(np.int64)
        fwd = np.zeros(n, bool)
        f = bfs_broadcast(ray.data.from_arrow(e), n, core, iters=n).to_pandas()
        fwd[f["doc_id"].to_numpy()] = True
        rev = pa.table({"src": e["dst"], "dst": e["src"], "outdeg": e["outdeg"]})
        b = bfs_broadcast(ray.data.from_arrow(rev), n, core, iters=n).to_pandas()
        bwd = np.zeros(n, bool)
        bwd[b["doc_id"].to_numpy()] = True
        cls = np.where(labels == core_label, "core",
                       np.where(bwd, "in", np.where(fwd, "out", "other")))
        assert cls.tolist() == ["in", "core", "core", "out", "other", "other"]


class TestTileAuthorityPlans:
    """The beyond-broadcast join plan (shuffle pagerank ⋈ entity
    rows) must equal the broadcast plan; bowtie refuses beyond its
    broadcast bound instead of silently collecting n-sized vectors."""

    def test_join_plan_equivalence(self, ray_session):
        from osm2gtfs_ray.pipelines.graph_queries import q_tile_authority

        sf = "/root/testdata/sf0.001"

        def canon(ds):
            return ds.to_pandas().sort_values("cell_rm").reset_index(drop=True)

        a = canon(q_tile_authority(sf, plan="broadcast"))
        b = canon(q_tile_authority(sf, plan="join"))
        assert b.astype(a.dtypes.to_dict()).equals(a)

    def test_bowtie_plan_equivalence(self, ray_session):
        """The shuffle composition (scc labels ⋈ two Dataset-frontier
        reach tables, no driver-held n-sized state) must classify
        every node identically to the broadcast composition — both on
        the synthetic link graph and on a handcrafted graph that
        exercises all four classes."""
        import ray.data

        from osm2gtfs_ray.ops.bowtie import bowtie_broadcast, bowtie_shuffle
        from osm2gtfs_ray.pipelines.graph_queries import synthesize_edges

        def canon(ds):
            return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

        n = 120
        e = synthesize_edges(np.arange(n, dtype=np.uint64), n)
        a = canon(bowtie_broadcast(ray.data.from_arrow(e), n))
        b = canon(
            bowtie_shuffle(ray.data.from_arrow(e), n, num_partitions=4)
        )
        assert b.equals(a)
        assert set(a["cls"]) <= {"core", "in", "out", "other"}

        # 0 -> (1 <-> 2) -> 3 ; 4 <-> 5 disconnected: all four classes
        e2 = pa.table(
            {
                "src": np.array([0, 1, 2, 2, 4, 5], dtype=np.int64),
                "dst": np.array([1, 2, 1, 3, 5, 4], dtype=np.int64),
                "outdeg": np.array([1, 1, 2, 2, 1, 1], dtype=np.int64),
            }
        )
        a2 = canon(bowtie_broadcast(ray.data.from_arrow(e2), 6))
        b2 = canon(bowtie_shuffle(ray.data.from_arrow(e2), 6,
                                  num_partitions=4))
        assert b2.equals(a2)
        assert a2["cls"].tolist() == [
            "in", "core", "core", "out", "other", "other",
        ]

    def test_reach_shuffle_fixpoint_and_budget(self, ray_session):
        """reach_shuffle reaches the full closure (vs brute reach
        matrix), includes seeds, and raises past max_rounds."""
        import pytest as _pytest
        import ray.data

        from osm2gtfs_ray.ops.bfs import reach_shuffle
        from osm2gtfs_ray.pipelines.graph_queries import synthesize_edges

        n = 60
        e = synthesize_edges(np.arange(n, dtype=np.uint64), n)
        src, dst = e["src"].to_numpy(), e["dst"].to_numpy()
        reach = np.zeros((n, n), dtype=bool)
        reach[src, dst] = True
        reach[np.arange(n), np.arange(n)] = True
        for k in range(n):
            reach |= np.outer(reach[:, k], reach[k, :])
        seeds = np.array([0, 7], dtype=np.int64)
        want = sorted(np.flatnonzero(reach[seeds].any(axis=0)).tolist())

        got = sorted(
            reach_shuffle(
                ray.data.from_arrow(e), n, seeds, num_partitions=4
            ).to_pandas()["node"].tolist()
        )
        assert got == want

        # a 3-node chain needs 2 expansion rounds; budget of 1 raises
        chain = pa.table(
            {"src": np.array([0, 1], dtype=np.int64),
             "dst": np.array([1, 2], dtype=np.int64)}
        )
        with _pytest.raises(RuntimeError, match="max_rounds"):
            reach_shuffle(
                ray.data.from_arrow(chain), 3,
                np.array([0], dtype=np.int64), max_rounds=1,
                num_partitions=2,
            )


class TestDomainAuthority:
    """Rollup conservation: domain sums must equal global rank mass
    (after pagerank floors) and global doc/token counts. SQL gate:
    `domain_authority`."""

    def test_conservation(self, ray_session):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.graph_queries import (
            q_domain_authority,
            q_pagerank,
        )

        sf = "/root/testdata/sf0.001"
        got = q_domain_authority(sf).to_pandas()
        ranks = q_pagerank(sf).to_pandas()
        assert int(got["rank_fp"].sum()) == int(ranks["rank_fp"].sum())
        n = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
        assert int(got["n_docs"].sum()) == n
        assert (got["n_docs"] >= 1).all() and (got["n_tokens"] > 0).all()


class TestPersonalizedPagerank:
    def _seeds(self):
        return np.arange(0, N, 17, dtype=np.int64)  # denser than prod mod

    def _loop(self, edges: pa.Table, n: int, seeds: np.ndarray,
              iters: int) -> np.ndarray:
        src = edges["src"].to_numpy()
        dst = edges["dst"].to_numpy()
        outdeg = edges["outdeg"].to_numpy()
        init = TOTAL_FP // len(seeds)
        base = np.zeros(n, dtype=np.int64)
        base[seeds] = (15 * init) // 100
        r = np.zeros(n, dtype=np.int64)
        r[seeds] = init
        for _ in range(iters):
            inflow = np.zeros(n, dtype=np.int64)
            for s, d, o in zip(src.tolist(), dst.tolist(), outdeg.tolist()):
                inflow[d] += r[s] // o
            r = base + (85 * inflow) // 100
        return r

    def test_broadcast_matches_reference_loop(self, ray_session):
        import ray.data

        from osm2gtfs_ray.ops.pagerank import ppr_broadcast

        seeds = self._seeds()
        edges = ray.data.from_arrow(_edges_table())
        got = (
            ppr_broadcast(edges, N, seeds, iters=4)
            .to_pandas()
            .sort_values("doc_id")
        )
        want = self._loop(_edges_table(), N, seeds, 4)
        assert (got["rank_fp"].to_numpy() == want).all()

    def test_plan_equivalence(self, ray_session):
        import ray.data

        from osm2gtfs_ray.ops.pagerank import personalized_pagerank

        seeds = self._seeds()
        b = personalized_pagerank(
            ray.data.from_arrow(_edges_table()), N, seeds, iters=3,
            broadcast=True,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        s = personalized_pagerank(
            ray.data.from_arrow(_edges_table()), N, seeds, iters=3,
            broadcast=False, num_partitions=4,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert (b["rank_fp"].to_numpy() == s["rank_fp"].to_numpy()).all()

    def test_mass_concentrates_near_seeds(self, ray_session):
        import ray.data

        from osm2gtfs_ray.ops.pagerank import ppr_broadcast

        seeds = self._seeds()
        r = (
            ppr_broadcast(ray.data.from_arrow(_edges_table()), N, seeds, iters=3)
            .to_pandas()
            .sort_values("doc_id")["rank_fp"]
            .to_numpy()
        )
        # every seed keeps at least the teleport floor; total mass only
        # ever shrinks under floor division
        floor = (15 * (TOTAL_FP // len(seeds))) // 100
        assert (r[seeds] >= floor).all()
        assert r.sum() <= TOTAL_FP
        # non-seed mass is strictly inflow-derived: mean seed rank
        # dominates mean non-seed rank
        non = np.setdiff1d(np.arange(N), seeds)
        assert r[seeds].mean() > r[non].mean()


class TestSSSP:
    def _weighted(self) -> pa.Table:
        from osm2gtfs_ray.pipelines.graph_queries import _S_W, SEED
        from osm2gtfs_ray.sources.pages import _uint

        e = _edges_table()
        src = e["src"].to_numpy()
        dst = e["dst"].to_numpy()
        k = (src.astype(np.uint64) << np.uint64(32)) + dst.astype(np.uint64)
        w = 1 + _uint(k, _S_W, SEED, 9)
        return pa.table({"src": src, "dst": dst, "w": w.astype(np.int64)})

    def _loop(self, e: pa.Table, n: int, seeds, iters: int):
        INF = 1 << 62
        d = [INF] * n
        for s in seeds:
            d[int(s)] = 0
        src = e["src"].to_numpy().tolist()
        dst = e["dst"].to_numpy().tolist()
        w = e["w"].to_numpy().tolist()
        for _ in range(iters):
            nd = list(d)
            for s, t, ww in zip(src, dst, w):
                if d[s] < INF and d[s] + ww < nd[t]:
                    nd[t] = d[s] + ww
            d = nd
        return {i: v for i, v in enumerate(d) if v < INF}

    def test_broadcast_matches_reference_loop(self, ray_session):
        import ray.data

        from osm2gtfs_ray.ops.sssp import sssp_broadcast

        seeds = np.arange(0, N, 23, dtype=np.int64)
        got = (
            sssp_broadcast(ray.data.from_arrow(self._weighted()), N, seeds,
                           iters=4)
            .to_pandas()
            .sort_values("doc_id")
        )
        want = self._loop(self._weighted(), N, seeds, 4)
        assert got["doc_id"].tolist() == sorted(want)
        assert got["dist"].tolist() == [want[i] for i in sorted(want)]

    def test_plan_equivalence(self, ray_session):
        import ray.data

        from osm2gtfs_ray.ops.sssp import sssp

        seeds = np.arange(0, N, 23, dtype=np.int64)
        b = sssp(ray.data.from_arrow(self._weighted()), N, seeds, iters=3,
                 broadcast=True).to_pandas().sort_values("doc_id")
        s = sssp(ray.data.from_arrow(self._weighted()), N, seeds, iters=3,
                 broadcast=False, num_partitions=4).to_pandas().sort_values(
            "doc_id")
        assert b["doc_id"].tolist() == s["doc_id"].tolist()
        assert b["dist"].tolist() == s["dist"].tolist()

    def test_bounded_hop_semantics_and_monotone_rounds(self, ray_session):
        # distances can only shrink (or stay) as K grows; K covers BFS
        import ray.data

        from osm2gtfs_ray.ops.sssp import sssp_broadcast

        seeds = np.array([0], dtype=np.int64)
        e = self._weighted()
        d3 = sssp_broadcast(
            ray.data.from_arrow(e), N, seeds, iters=3
        ).to_pandas().set_index("doc_id")["dist"]
        d5 = sssp_broadcast(
            ray.data.from_arrow(e), N, seeds, iters=5
        ).to_pandas().set_index("doc_id")["dist"]
        assert set(d3.index) <= set(d5.index)
        common = d3.index
        assert (d5.loc[common] <= d3.loc[common]).all()
        # weights are 1..9: any reached node's dist is >= its hop count
        from osm2gtfs_ray.ops.bfs import bfs_broadcast

        hops = bfs_broadcast(
            ray.data.from_arrow(_edges_table()), N, seeds, iters=5
        ).to_pandas().set_index("doc_id")["hops"]
        both = d5.index.intersection(hops.index)
        assert (d5.loc[both] >= hops.loc[both]).all()


def _und_pairs_brute(n: int) -> set:
    e = synthesize_edges(np.arange(n, dtype=np.uint64), n)
    s, d = e["src"].to_numpy(), e["dst"].to_numpy()
    return {(min(a, b), max(a, b)) for a, b in zip(s.tolist(), d.tolist()) if a != b}


class TestLinkPrediction:
    def test_matches_brute(self, ray_session):
        """Brute-force common-neighbor Jaccard over the sf0.001 graph
        (independent set-based loop, no SQL) equals the distributed
        pipeline, including the non-adjacency exclusion."""
        from osm2gtfs_ray.pipelines.graph_queries import (
            LP_MIN_CN,
            LP_SCALE,
            q_link_prediction,
        )

        sf = "/root/testdata/sf0.001"
        import pyarrow.parquet as pq

        n = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
        und = _und_pairs_brute(n)
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        # LP_CAP never binds at this n (max degree << 64): brute skips it
        exp = {}
        nodes = sorted(adj)
        for w, nbrs in adj.items():
            ns = sorted(nbrs)
            for i in range(len(ns)):
                for j in range(i + 1, len(ns)):
                    p = (ns[i], ns[j])
                    exp[p] = exp.get(p, 0) + 1
        exp = {
            p: cn
            for p, cn in exp.items()
            if cn >= LP_MIN_CN and p not in und
        }
        got = q_link_prediction(sf).to_pandas()
        got_map = {
            (a, b): (cn, j)
            for a, b, cn, j in zip(
                got["a"], got["b"], got["cn"], got["jaccard_fp"]
            )
        }
        assert set(got_map) == set(exp)
        for (a, b), cn in exp.items():
            da, db = len(adj[a]), len(adj[b])
            jac = cn * LP_SCALE // (da + db - cn)
            assert got_map[(a, b)] == (cn, jac)

    def test_pairs_non_adjacent_and_canonical(self, ray_session):
        from osm2gtfs_ray.pipelines.graph_queries import q_link_prediction

        sf = "/root/testdata/sf0.001"
        import pyarrow.parquet as pq

        n = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
        und = _und_pairs_brute(n)
        got = q_link_prediction(sf).to_pandas()
        assert (got["a"] < got["b"]).all()
        assert not any((a, b) in und for a, b in zip(got["a"], got["b"]))


class TestAssortativity:
    def test_matches_scalar_reference(self, ray_session):
        """Scalar numpy reference of Pearson r over (outdeg, indeg)
        edge pairs equals the distributed six-sum pipeline."""
        import math

        from osm2gtfs_ray.pipelines.graph_queries import q_assortativity

        sf = "/root/testdata/sf0.001"
        import pyarrow.parquet as pq

        n = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
        e = synthesize_edges(np.arange(n, dtype=np.uint64), n)
        src = e["src"].to_numpy()
        dst = e["dst"].to_numpy()
        x = e["outdeg"].to_numpy().astype(np.int64)
        ind = np.bincount(dst, minlength=n).astype(np.int64)
        y = ind[dst]
        m = len(x)
        num = m * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        d1 = m * int((x * x).sum()) - int(x.sum()) ** 2
        d2 = m * int((y * y).sum()) - int(y.sum()) ** 2
        corr = float(num) / math.sqrt(float(d1) * float(d2))
        exp = int(math.trunc(corr * 1e6 + math.copysign(0.5, corr)))
        got = q_assortativity(sf)
        assert got["m"].iloc[0] == m
        assert got["assort_e6"].iloc[0] == exp


class TestResourceAlloc:
    def test_matches_brute(self, ray_session):
        """Brute set-based RA (sum 1e9 // deg(w) over shared w) equals
        the one-exchange distributed score."""
        from osm2gtfs_ray.pipelines.graph_queries import (
            LP_MIN_CN,
            RA_SCALE,
            q_resource_alloc,
        )

        sf = "/root/testdata/sf0.001"
        import pyarrow.parquet as pq

        n = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
        und = _und_pairs_brute(n)
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        exp = {}
        for w, nbrs in adj.items():
            contrib = RA_SCALE // len(nbrs)
            ns = sorted(nbrs)
            for i in range(len(ns)):
                for j in range(i + 1, len(ns)):
                    p = (ns[i], ns[j])
                    cn, ra = exp.get(p, (0, 0))
                    exp[p] = (cn + 1, ra + contrib)
        exp = {
            p: v
            for p, v in exp.items()
            if v[0] >= LP_MIN_CN and p not in und
        }
        got = q_resource_alloc(sf).to_pandas()
        got_map = {
            (a, b): (cn, ra)
            for a, b, cn, ra in zip(got["a"], got["b"], got["cn"], got["ra_fp"])
        }
        assert got_map == exp


class TestClusteringCoef:
    def test_matches_brute(self, ray_session):
        from osm2gtfs_ray.pipelines.graph_queries import (
            LCC_SCALE,
            q_clustering_coef,
        )

        sf = "/root/testdata/sf0.001"
        import pyarrow.parquet as pq

        n = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
        und = _und_pairs_brute(n)
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        exp = {}
        for v, nbrs in adj.items():
            d = len(nbrs)
            if d < 2:
                continue
            ns = sorted(nbrs)
            tri = sum(
                1
                for i in range(d)
                for j in range(i + 1, d)
                if (min(ns[i], ns[j]), max(ns[i], ns[j])) in und
            )
            exp[v] = (tri, tri * LCC_SCALE // (d * (d - 1) // 2))
        got = q_clustering_coef(sf).to_pandas()
        got_map = {
            v: (t, l)
            for v, t, l in zip(got["doc_id"], got["n_tri"], got["lcc_fp"])
        }
        assert got_map == exp
