"""Link-graph operators over the document corpus: deterministic graph
synthesis + fixed-point PageRank (ops/pagerank.py).

The synthetic corpus carries no link column, so — exactly like the
URL/media/PII queries — each document gets a deterministic out-link
set derived from doc_id via splitmix64 streams: outdeg in 1..3 and
each destination ``(id + 1 + U(n-1)) % n`` (never a self-loop, never
dangling). The SQL oracle re-derives the same edges arithmetically
and unrolls the K power-iteration rounds as K CTEs; because the
PageRank arithmetic is fixed-point integer (see ops/pagerank.py), the
oracle match is bit-exact — any error in the join, the per-dst
aggregation, or the damping update breaks the value hash.

Reference semantics analogue: osm2gtfs's route-graph construction
(`osm2gtfs/creators/routes_creator.py`) walks a small transit graph;
PageRank is the webtext generalization — authority over the page link
graph at crawl scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from ray.data.aggregate import Sum

from osm2gtfs_ray.ops.pagerank import DAMP_NUM, DAMP_DEN, TOTAL_FP, pagerank
from osm2gtfs_ray.pipelines.flagship_oracle import _s_mix64, _s_uint
from osm2gtfs_ray.sources.pages import _uint
from osm2gtfs_ray.sources.tables import read_table

SEED = 42  # pairs with flagship_oracle._SEED
_S_DEG = 230
_S_DST = (231, 232, 233)
_MAX_DEG = 3
PR_ITERS = 5


def _n_docs(sf_dir: str) -> int:
    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def synthesize_edges(ids: np.ndarray, n_nodes: int) -> pa.Table:
    """Deterministic out-links per doc: outdeg = 1 + U(3); dst_k =
    (id + 1 + U(n-1)) % n. Pure uint64 numpy — one kernel pass per
    stream, no Python per row."""
    ids = np.asarray(ids, dtype=np.uint64)
    n = np.uint64(n_nodes)
    outdeg = 1 + _uint(ids, _S_DEG, SEED, _MAX_DEG)  # int64 in 1..3
    srcs, dsts, degs = [], [], []
    for k in range(_MAX_DEG):
        m = outdeg > k
        idk = ids[m]
        step = _uint(idk, _S_DST[k], SEED, n_nodes - 1).astype(np.uint64)
        dst = (idk + np.uint64(1) + step) % n
        srcs.append(idk.astype(np.int64))
        dsts.append(dst.astype(np.int64))
        degs.append(outdeg[m])
    return pa.table(
        {
            "src": np.concatenate(srcs),
            "dst": np.concatenate(dsts),
            "outdeg": np.concatenate(degs),
        }
    )


def build_link_graph(sf_dir: str):
    """Dataset of (src, dst, outdeg) synthesized from doc_ids — the
    stand-in for a real crawl's extracted-href edge table."""
    n = _n_docs(sf_dir)
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def batch(t: pa.Table) -> pa.Table:
        return synthesize_edges(
            t["doc_id"].to_numpy(zero_copy_only=False), n
        )

    return docs.map_batches(batch, batch_format="pyarrow")


def q_pagerank(sf_dir: str):
    """K=5 fixed-point PageRank rounds over the synthetic link graph.
    Output: (doc_id, rank_fp) for every node, rank_fp the int64
    fixed-point rank (denominator 10^12)."""
    n = _n_docs(sf_dir)
    return pagerank(build_link_graph(sf_dir), n, iters=PR_ITERS)


# ---------------------------------------------------------------------------
# SQL oracle: same edges arithmetically, K unrolled integer rounds
# ---------------------------------------------------------------------------

def _s_uint_mod(idx: str, stream: int, mod_expr: str) -> str:
    """flagship_oracle._s_uint with a SQL-expression modulus (the
    engine's mod is the runtime row count, not a literal)."""
    _u64 = 18446744073709551616
    c = ((stream * 0xC0FFEE123457) % _u64) ^ (SEED << 32)
    return (
        f"CAST(CAST(({_s_mix64(f'xor({idx}, CAST({c} AS UBIGINT))')})"
        f" AS HUGEINT) % ({mod_expr}) AS HUGEINT)"
    )


def _sql_edges() -> str:
    """CTE chain re-deriving the synthetic edge table arithmetically
    (nn, ids, deg, ek, edges) — shared by every link-graph oracle."""
    d0 = _s_uint_mod("did", _S_DST[0], "n - 1")
    d1 = _s_uint_mod("did", _S_DST[1], "n - 1")
    d2 = _s_uint_mod("did", _S_DST[2], "n - 1")
    return f"""
nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM documents),
ids AS (SELECT CAST(doc_id AS BIGINT) AS node, CAST(doc_id AS UBIGINT) AS did
        FROM documents),
deg AS (SELECT node, did, 1 + ({_s_uint('did', _S_DEG, _MAX_DEG)}) AS outdeg
        FROM ids),
ek AS (
  SELECT node AS src, outdeg,
         CAST((CAST(node AS HUGEINT) + 1 + {d0}) % n AS BIGINT) AS d0,
         CAST((CAST(node AS HUGEINT) + 1 + {d1}) % n AS BIGINT) AS d1,
         CAST((CAST(node AS HUGEINT) + 1 + {d2}) % n AS BIGINT) AS d2
  FROM deg CROSS JOIN nn
),
edges AS (
  SELECT src, outdeg, d0 AS dst FROM ek
  UNION ALL SELECT src, outdeg, d1 FROM ek WHERE outdeg >= 2
  UNION ALL SELECT src, outdeg, d2 FROM ek WHERE outdeg >= 3
)"""


def _sql_pagerank() -> str:
    head = f"""{_sql_edges()},
b AS (SELECT ({DAMP_DEN - DAMP_NUM} * (CAST({TOTAL_FP} AS HUGEINT) // n)) // {DAMP_DEN}
             AS base FROM nn),
r0 AS (SELECT node, CAST({TOTAL_FP} AS HUGEINT) // n AS rank
       FROM ids CROSS JOIN nn)"""
    rounds = []
    for i in range(1, PR_ITERS + 1):
        rounds.append(f"""
i{i} AS (SELECT e.dst AS node, SUM(r.rank // e.outdeg) AS inflow
       FROM edges e JOIN r{i - 1} r ON r.node = e.src GROUP BY e.dst),
r{i} AS (SELECT ids.node,
              base + COALESCE(({DAMP_NUM} * i.inflow) // {DAMP_DEN}, 0) AS rank
       FROM ids CROSS JOIN b LEFT JOIN i{i} i ON i.node = ids.node)""")
    return head + "," + ",".join(rounds)


SQL_PAGERANK = f"""
WITH {_sql_pagerank()}
SELECT node AS doc_id, CAST(rank AS BIGINT) AS rank_fp
FROM r{PR_ITERS} ORDER BY doc_id
"""

# ---------------------------------------------------------------------------
# Multi-source BFS hop distance (ops/bfs.py)
# ---------------------------------------------------------------------------
# Seeds = every 100th doc_id (a crawl seed list); output = (doc_id,
# hops) for every node within BFS_ITERS hops, hops the shortest path
# length. The oracle unrolls the rounds: level i = DISTINCT endpoints
# of walks of length exactly i from the seed set, and MIN over levels
# equals the shortest-path distance — bit-exact integer labels.

BFS_ITERS = 4
BFS_SEED_MOD = 100


def q_bfs_hops(sf_dir: str):
    """Hop distance from the seed set within BFS_ITERS rounds."""
    from osm2gtfs_ray.ops.bfs import bfs_hops

    n = _n_docs(sf_dir)
    seeds = np.arange(0, n, BFS_SEED_MOD, dtype=np.int64)
    return bfs_hops(build_link_graph(sf_dir), n, seeds, iters=BFS_ITERS)


def _sql_bfs() -> str:
    levels = [f"d0 AS (SELECT node, 0 AS h FROM ids WHERE node % {BFS_SEED_MOD} = 0)"]
    for i in range(1, BFS_ITERS + 1):
        levels.append(
            f"d{i} AS (SELECT DISTINCT e.dst AS node, {i} AS h\n"
            f"       FROM edges e JOIN d{i - 1} s ON e.src = s.node)"
        )
    union = " UNION ALL ".join(f"SELECT * FROM d{i}" for i in range(BFS_ITERS + 1))
    return f"{_sql_edges()},\n{','.join(levels)}\n" + (
        f"SELECT node AS doc_id, CAST(MIN(h) AS BIGINT) AS hops\n"
        f"FROM ({union}) GROUP BY node ORDER BY doc_id"
    )


SQL_BFS_HOPS = f"WITH {_sql_bfs()}"


# ---------------------------------------------------------------------------
# Domain-level link rollup: inlinks / distinct source domains /
# cross-domain inlinks per destination registrable domain
# ---------------------------------------------------------------------------
# The web-graph authority-by-domain shape (who links into this site,
# and from how many places?). Each edge endpoint's domain comes from
# web_queries.domains_of (the URL synthesizer's host/tld streams — no
# URL string materialized). Plan: block-local (dst_domain, src_domain)
# partials inside map_batches, then ONE groupby over the bounded
# domain key space with a vectorized nunique merge — the shuffle
# carries O(domains^2) partial rows, never O(edges).

def q_domain_link_stats(sf_dir: str):
    """(domain, n_inlinks, n_src_domains, n_external) per destination
    registrable domain of the link graph."""
    import pandas as pd

    from osm2gtfs_ray.pipelines.web_queries import domains_of

    edges = build_link_graph(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sd, dd = domains_of(src), domains_of(dst)
        g = (
            pa.table(
                {
                    "domain": dd,
                    "src_domain": sd,
                    "n": np.ones(len(dd), dtype=np.int64),
                    "n_ext": (sd != dd).astype(np.int64),
                }
            )
            .group_by(["domain", "src_domain"])
            .aggregate([("n", "sum"), ("n_ext", "sum")])
        )
        return g.rename_columns(["domain", "src_domain", "n", "n_ext"])

    def merge(df: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "domain": [df["domain"].iloc[0]],
                "n_inlinks": np.int64(df["n"].sum()),
                "n_src_domains": np.int64(df["src_domain"].nunique()),
                "n_external": np.int64(df["n_ext"].sum()),
            }
        )

    parts = edges.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("domain").map_groups(merge, batch_format="pandas")


def _sql_domain_link_stats() -> str:
    from osm2gtfs_ray.pipelines.web_queries import _N_HOSTS, _S_HOST, _S_TLD, _TLDS

    tld = (
        f"CASE ({_s_uint('did', _S_TLD, len(_TLDS))}) "
        "WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END"
    )
    return f"""{_sql_edges()},
dom AS (SELECT node,
               'site' || ({_s_uint('did', _S_HOST, _N_HOSTS)}) || '.' || {tld}
                 AS domain
        FROM ids),
le AS (SELECT s.domain AS sd, d.domain AS dd
       FROM edges e JOIN dom s ON e.src = s.node
                    JOIN dom d ON e.dst = d.node)
SELECT dd AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_inlinks,
       CAST(COUNT(DISTINCT sd) AS BIGINT) AS n_src_domains,
       CAST(SUM(CASE WHEN sd <> dd THEN 1 ELSE 0 END) AS BIGINT) AS n_external
FROM le GROUP BY dd ORDER BY dd"""


SQL_DOMAIN_LINK_STATS = f"WITH {_sql_domain_link_stats()}"


# ---------------------------------------------------------------------------
# Reciprocal-link detection: unordered pairs (a, b) linked in BOTH
# directions — the web-spam / link-exchange signal. The shape is a
# graph SELF-JOIN (edges ⋈ edges on reversed keys); the distributed
# plan avoids the join entirely by sharding on the UNORDERED pair key,
# which co-locates both directions of a pair by construction, then one
# vectorized min/max-over-dir pass per shard. Reference analogue:
# osm2gtfs's bidirectional route detection (routes_creator pairing the
# two direction itineraries of one line), lifted to the crawl graph.

def q_reciprocal_links(sf_dir: str):
    """Distinct unordered pairs (a < b) with links a->b AND b->a."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    edges = build_link_graph(sf_dir)

    def pairkey(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": np.minimum(src, dst),
                "b": np.maximum(src, dst),
                "dir": (src > dst).astype(np.int64),
            }
        )

    keyed = edges.map_batches(pairkey, batch_format="pyarrow")

    def both_dirs(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["a", "b"], sort=False)["dir"].agg(["min", "max"])
        hit = agg[(agg["min"] == 0) & (agg["max"] == 1)].reset_index()
        return hit[["a", "b"]]

    return sharded_map_groups(keyed, ["a", "b"], both_dirs)


SQL_RECIPROCAL_LINKS = f"""
WITH {_sql_edges()},
p AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
             CASE WHEN src < dst THEN 0 ELSE 1 END AS dir
      FROM edges),
r AS (SELECT a, b FROM p GROUP BY a, b HAVING MIN(dir) = 0 AND MAX(dir) = 1)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b FROM r ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# Anchor-text aggregation: the inlink-text index. Every edge carries a
# deterministic anchor term (splitmix on the edge key src*C + dst, so
# the SQL oracle re-derives it arithmetically); per TARGET page the op
# reports the consensus anchor (top term by count, ties to the lowest
# term id), total inlink anchors and distinct terms. This is the
# classic web-search signal ("what does the web call this page?").
#
# Reference semantics analogue: osm2gtfs's stop-name resolution picks
# one display name per stop from several tagged sources with a fixed
# preference order (creators/stops_creator*.py name fallbacks); here
# the "sources" are the inlink anchors and the preference is majority
# vote with a deterministic tie-break.
#
# Scale plan: anchors never exist as strings until the final bounded
# projection — the shuffle carries (dst, term_id:int, n) block-local
# partials (map-side combine), then ONE dst-hash shard pass computes
# top/total/distinct for ALL of its targets vectorized. At crawl scale
# hot targets (everyone links to the homepage) stay safe: partials
# bound each block's contribution to <= N_ANCHOR_TERMS rows per dst.

N_ANCHOR_TERMS = 24
_S_ANCHOR = 245
_EKEY_C = 0x9E3779B1  # Fibonacci-hash odd constant; wraps mod 2^64


def q_anchor_top_terms(sf_dir: str):
    """(doc_id, top_term, top_n, n_anchors, n_terms) per link target."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    edges = build_link_graph(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ekey = src * np.uint64(_EKEY_C) + dst
        tid = _uint(ekey, _S_ANCHOR, SEED, N_ANCHOR_TERMS)
        g = (
            pa.table(
                {
                    "doc_id": dst.astype(np.int64),
                    "term_id": tid,
                    "n": np.ones(len(tid), dtype=np.int64),
                }
            )
            .group_by(["doc_id", "term_id"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["doc_id", "term_id", "n"])

    parts = edges.map_batches(partial, batch_format="pyarrow")

    def top_terms(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["doc_id", "term_id"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        agg = agg.sort_values(
            ["doc_id", "n", "term_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = agg.drop_duplicates("doc_id").rename(columns={"n": "top_n"})
        stats = agg.groupby("doc_id", sort=False).agg(
            n_anchors=("n", "sum"), n_terms=("term_id", "size")
        )
        out = top.merge(stats, on="doc_id")
        out["top_term"] = "anchor" + out.pop("term_id").astype(str)
        return out[["doc_id", "top_term", "top_n", "n_anchors", "n_terms"]]

    return sharded_map_groups(parts, "doc_id", top_terms)


def _sql_anchor() -> str:
    ekey = (
        f"CAST((CAST(src AS HUGEINT) * {_EKEY_C} + CAST(dst AS HUGEINT))"
        f" % {2**64} AS UBIGINT)"
    )
    return f"""{_sql_edges()},
ak AS (SELECT dst, {ekey} AS ekey FROM edges),
terms AS (SELECT dst, ({_s_uint('ekey', _S_ANCHOR, N_ANCHOR_TERMS)}) AS term_id
          FROM ak),
cnt AS (SELECT dst, term_id, COUNT(*) AS n FROM terms GROUP BY dst, term_id),
ranked AS (SELECT dst, term_id, n,
                  ROW_NUMBER() OVER (PARTITION BY dst
                                     ORDER BY n DESC, term_id) AS rn
           FROM cnt),
tot AS (SELECT dst, SUM(n) AS n_anchors, COUNT(*) AS n_terms
        FROM cnt GROUP BY dst)
SELECT r.dst AS doc_id,
       'anchor' || CAST(r.term_id AS VARCHAR) AS top_term,
       CAST(r.n AS BIGINT) AS top_n,
       CAST(t.n_anchors AS BIGINT) AS n_anchors,
       CAST(t.n_terms AS BIGINT) AS n_terms
FROM ranked r JOIN tot t USING (dst)
WHERE r.rn = 1 ORDER BY doc_id"""


SQL_ANCHOR_TOP_TERMS = f"WITH {_sql_anchor()}"


# ---------------------------------------------------------------------------
# Domain co-citation: pairs of source domains that link to the same
# targets ("sites that cite the same pages are related" — the classic
# co-citation similarity signal, the 2-hop complement of
# q_domain_link_stats). Hot-target guard: a mega-inlinked page would
# contribute O(indegree^2) pairs, so each target's DISTINCT source
# domains are ranked ascending and capped at COCITE_CAP before pair
# enumeration — a documented, SQL-replicated semantic (ROW_NUMBER <=
# cap on both sides), the same skew discipline as the LSH bucket caps
# in stages/dedup.py. Reference analogue: osm2gtfs's shared-stop line
# pairing (two routes serving the same stop are related), lifted to
# the crawl graph.
#
# Scale plan: dedup+rank+pairs run vectorized per dst-hash shard
# (ops/pairs.intra_group_pair_indices — Python loops only over
# distinct group SIZES), pair counts are combined per shard, then ONE
# bounded groupby over the (domain, domain) key space.

COCITE_CAP = 16
COCITE_MIN_SHARED = 2


def q_cocitation(sf_dir: str):
    """(a, b, n_shared): unordered domain pairs co-cited by at least
    COCITE_MIN_SHARED distinct targets."""
    import pandas as pd

    from osm2gtfs_ray.ops.pairs import intra_group_pair_indices, new_group_mask
    from osm2gtfs_ray.ops.sharded import sharded_map_groups
    from osm2gtfs_ray.pipelines.web_queries import domains_of

    edges = build_link_graph(sf_dir)

    def to_domains(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"dst": dst, "sd": domains_of(src)})

    ds = edges.map_batches(to_domains, batch_format="pyarrow")

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["dst", "sd"]).sort_values(
            ["dst", "sd"], kind="mergesort"
        )
        rank = g.groupby("dst", sort=False).cumcount().to_numpy()
        g = g[rank < COCITE_CAP]
        new = new_group_mask(g, ["dst"])
        ai, bi = intra_group_pair_indices(new)
        sd = g["sd"].to_numpy()
        pairs = pd.DataFrame({"a": sd[ai], "b": sd[bi]})
        return (
            pairs.groupby(["a", "b"], sort=False)
            .size()
            .rename("n_partial")
            .reset_index()
        )

    parts = sharded_map_groups(ds, "dst", shard_pairs)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["a", "b"], sort=False)["n_partial"]
            .sum()
            .rename("n_shared")
            .reset_index()
        )
        return out[out["n_shared"] >= COCITE_MIN_SHARED]

    return sharded_map_groups(parts, ["a", "b"], finish)


def _sql_cocitation() -> str:
    from osm2gtfs_ray.pipelines.web_queries import _N_HOSTS, _S_HOST, _S_TLD, _TLDS

    tld = (
        f"CASE ({_s_uint('did', _S_TLD, len(_TLDS))}) "
        "WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END"
    )
    return f"""{_sql_edges()},
dom AS (SELECT node,
               'site' || ({_s_uint('did', _S_HOST, _N_HOSTS)}) || '.' || {tld}
                 AS domain
        FROM ids),
le AS (SELECT DISTINCT e.dst, s.domain AS sd
       FROM edges e JOIN dom s ON e.src = s.node),
rk AS (SELECT dst, sd,
              ROW_NUMBER() OVER (PARTITION BY dst ORDER BY sd) AS rn
       FROM le),
kept AS (SELECT dst, sd FROM rk WHERE rn <= {COCITE_CAP}),
pr AS (SELECT l.sd AS a, r.sd AS b
       FROM kept l JOIN kept r ON l.dst = r.dst AND l.sd < r.sd)
SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM pr GROUP BY a, b HAVING COUNT(*) >= {COCITE_MIN_SHARED}
ORDER BY a, b"""


SQL_COCITATION = f"WITH {_sql_cocitation()}"


# ---------------------------------------------------------------------------
# Triangle counting / local clustering shape: (doc_id, n_tri, n_wedge)
# ---------------------------------------------------------------------------
# The classic degree-ordered triangle enumeration (Latapy / "forward"
# algorithm): undirect + dedup the link graph, orient every edge from
# the lower (degree, id) endpoint to the higher, enumerate wedges at
# each tail, and close them against the oriented edge set. Degree
# orientation is THE skew guard — a hub of indegree h contributes
# O(h^2) wedges undirected but only O(outdeg^2) oriented, and oriented
# outdegree is bounded by O(sqrt(m)) — so wedge volume is O(m^1.5)
# worst-case instead of O(sum deg^2). n_wedge = d*(d-1)/2 makes the
# output the local-clustering-coefficient table (cc = n_tri/n_wedge).
#
# Reference analogue: osm2gtfs's shared-stop route pairing extended
# one hop — three routes mutually sharing stops form a "triangle" of
# related lines; here it is the mutual-linkage density of the crawl
# graph.
#
# Scale plan (plan="shuffle"): every stage is a bounded shuffle —
# pair-hash dedup, node-keyed degree count (map-side partials), two
# hash joins to attach ranks, ONE tail-hash shard for vectorized
# wedge enumeration (ops/pairs — Python loops only over distinct
# group sizes), a composite-key hash join to close wedges, and a
# final LEFT join onto the degree table. Rank = d * n + node fits
# int64 up to n ~ 3e9 docs; past that, switch the comparator to the
# (d, node) tuple (np.lexsort) — documented, not needed at any test
# scale. plan="local" is the ops/components.py driver fast path:
# below TRI_DRIVER_EDGES the edge list (16 B/edge — <= 8 MB) is
# collected once and the identical algorithm runs as one vectorized
# numpy pass, skipping ~8 fixed-cost exchanges; plan="auto" picks by
# edge count (same bound and rationale as components.py's CC path).

TRI_DRIVER_EDGES = 500_000


def _triangles_local(a: np.ndarray, b: np.ndarray, n: int) -> pa.Table:
    """The degree-ordered enumeration, single vectorized numpy pass
    over deduped undirected pairs (a < b). Shared semantics with the
    shuffle plan — plan-equivalence is pytested."""
    from osm2gtfs_ray.ops.pairs import intra_group_pair_indices

    key = a * np.int64(n) + b
    key = np.unique(key)
    a, b = key // n, key % n
    d = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    rank = d.astype(np.int64) * np.int64(n) + np.arange(n, dtype=np.int64)
    ra, rb = rank[a], rank[b]
    fwd = ra < rb
    u = np.where(fwd, a, b)
    v = np.where(fwd, b, a)
    rv = np.maximum(ra, rb)
    o = np.lexsort((rv, u))
    u, v = u[o], v[o]
    new = np.empty(len(u), dtype=bool)
    if len(u):
        new[0] = True
        new[1:] = u[1:] != u[:-1]
    i, j = intra_group_pair_indices(new)
    wv, ww, wc = v[i], v[j], u[i]
    oriented = np.sort(u * np.int64(n) + v)
    wk = wv * np.int64(n) + ww
    pos = np.searchsorted(oriented, wk)
    pos_c = np.minimum(pos, max(len(oriented) - 1, 0))
    hit = (pos < len(oriented)) & (oriented[pos_c] == wk) if len(oriented) else np.zeros(0, bool)
    tri_nodes = np.concatenate([wc[hit], wv[hit], ww[hit]])
    ntri = np.bincount(tri_nodes, minlength=n)
    ids = np.flatnonzero(d >= 2)
    return pa.table(
        {
            "doc_id": ids.astype(np.int64),
            "n_tri": ntri[ids].astype(np.int64),
            "n_wedge": (d[ids].astype(np.int64) * (d[ids] - 1)) // 2,
        }
    )


def q_triangles(sf_dir: str, plan: str = "auto"):
    """(doc_id, n_tri, n_wedge) for every node of undirected degree
    >= 2: triangles through the node, and C(d, 2) wedge capacity."""
    import pandas as pd
    import ray

    from osm2gtfs_ray.ops.joins import _as_arrow, hash_join
    from osm2gtfs_ray.ops.pairs import intra_group_pair_indices, new_group_mask
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    n = _n_docs(sf_dir)
    edges = build_link_graph(sf_dir)
    if plan == "auto":
        # outdeg <= 3 bounds the edge count at 3n without a sizing pass
        plan = "local" if 3 * n <= TRI_DRIVER_EDGES else "shuffle"
    if plan == "local":
        t = _as_arrow(edges.map_batches(
            lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
        ))
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        a, b = np.minimum(s, d), np.maximum(s, d)
        keep = a != b
        return ray.data.from_arrow(_triangles_local(a[keep], b[keep], n))

    # join partitions are long-lived aggregator actors — size them to
    # the data (~250k edges/partition) so small inputs don't pay 4x16
    # actor spin-ups; a cluster-scale run passes its own count
    np_ = max(2, min(64, 2 * n // 250_000 + 1))

    # 1. undirected distinct pairs (drop self-loops), pair-hash sharded
    def undirect(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        a, b = np.minimum(s, d), np.maximum(s, d)
        keep = a != b
        return pa.table({"a": a[keep], "b": b[keep]})

    und = sharded_map_groups(
        edges.map_batches(undirect, batch_format="pyarrow"),
        ["a", "b"],
        lambda g: g.drop_duplicates(["a", "b"]),
        n_shards=4 * np_,
    )

    # 2. undirected degree per node (map-side partials, one groupby)
    def deg_partial(g: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([g["a"], g["b"]], ignore_index=True)
        vc = both.value_counts()
        return pd.DataFrame(
            {"node": vc.index.to_numpy(np.int64), "p": vc.to_numpy(np.int64)}
        )

    deg = (
        und.map_batches(deg_partial, batch_format="pandas")
        .groupby("node")
        .aggregate(Sum("p", alias_name="d"))
    )

    # 3. attach ranks (rank = d * n + node) and orient low -> high
    ra = deg.map_batches(
        lambda t: pa.table(
            {
                "a": pc.cast(t["node"], pa.int64()),
                "ra": pc.add(
                    pc.multiply(pc.cast(t["d"], pa.int64()), np.int64(n)),
                    pc.cast(t["node"], pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    rb = deg.map_batches(
        lambda t: pa.table(
            {
                "b": pc.cast(t["node"], pa.int64()),
                "rb": pc.add(
                    pc.multiply(pc.cast(t["d"], pa.int64()), np.int64(n)),
                    pc.cast(t["node"], pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    ranked = hash_join(
        hash_join(und, ra, "a", num_partitions=np_),
        rb, "b", num_partitions=np_,
    )

    def orient(t: pa.Table) -> pa.Table:
        a = pc.cast(t["a"], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(t["b"], pa.int64()).to_numpy(zero_copy_only=False)
        ra_ = pc.cast(t["ra"], pa.int64()).to_numpy(zero_copy_only=False)
        rb_ = pc.cast(t["rb"], pa.int64()).to_numpy(zero_copy_only=False)
        fwd = ra_ < rb_
        return pa.table(
            {
                "u": np.where(fwd, a, b),
                "v": np.where(fwd, b, a),
                "rv": np.maximum(ra_, rb_),
            }
        )

    oe = ranked.map_batches(orient, batch_format="pyarrow")

    # 4. wedges at each tail u: out-neighbors sorted by rank, all pairs
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "rv"], kind="mergesort")
        new = new_group_mask(g, ["u"])
        i, j = intra_group_pair_indices(new)
        v = g["v"].to_numpy(np.int64)
        return pd.DataFrame(
            {"v": v[i], "w": v[j], "c": g["u"].to_numpy(np.int64)[i]}
        )

    wg = sharded_map_groups(oe, "u", wedges, n_shards=4 * np_)

    # 5. close: wedge (v, w) is a triangle iff oriented edge (v, w)
    closing = oe.map_batches(
        lambda t: pa.table(
            {
                "v": pc.cast(t["u"], pa.int64()),
                "w": pc.cast(t["v"], pa.int64()),
                "hit": np.ones(len(t), dtype=np.int8),
            }
        ),
        batch_format="pyarrow",
    )
    tri = hash_join(wg, closing, ["v", "w"], num_partitions=np_)

    # 6. per-node triangle participation (each triangle -> 3 rows)
    def explode(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                pc.cast(t["c"], pa.int64()).to_numpy(zero_copy_only=False),
                pc.cast(t["v"], pa.int64()).to_numpy(zero_copy_only=False),
                pc.cast(t["w"], pa.int64()).to_numpy(zero_copy_only=False),
            ]
        )
        u, cnt = np.unique(nodes, return_counts=True)
        return pa.table({"node": u, "p": cnt.astype(np.int64)})

    tric = (
        tri.map_batches(explode, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("p", alias_name="n_tri"))
    )

    # 7. LEFT join onto degree-(>=2) nodes; n_wedge = C(d, 2)
    base = deg.filter(expr="d >= 2")
    out = hash_join(base, tric, "node", join_type="left_outer",
                    num_partitions=np_)

    def finish(t: pa.Table) -> pa.Table:
        d = pc.cast(t["d"], pa.int64()).to_numpy(zero_copy_only=False)
        nt = pc.fill_null(pc.cast(t["n_tri"], pa.int64()), 0).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "doc_id": pc.cast(t["node"], pa.int64()),
                "n_tri": nt,
                "n_wedge": d * (d - 1) // 2,
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _sql_triangles() -> str:
    # MATERIALIZED: und/dg/oe are referenced 2-3x each; without it
    # DuckDB re-expands the splitmix edge synthesis per reference
    # (measured ~7s -> sub-second at sf0.01)
    return f"""{_sql_edges()},
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
               GREATEST(src, dst) AS b
        FROM edges WHERE src <> dst),
dg AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
       FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
       GROUP BY node),
rk AS (SELECT u.a, u.b,
              da.d * n + u.a AS ra, db.d * n + u.b AS rb
       FROM und u JOIN dg da ON da.node = u.a
                  JOIN dg db ON db.node = u.b
       CROSS JOIN nn),
oe AS MATERIALIZED (SELECT CASE WHEN ra < rb THEN a ELSE b END AS u,
              CASE WHEN ra < rb THEN b ELSE a END AS v,
              GREATEST(ra, rb) AS rv
       FROM rk),
wg AS (SELECT e1.v AS v, e2.v AS w, e1.u AS c
       FROM oe e1 JOIN oe e2 ON e1.u = e2.u AND e1.rv < e2.rv),
tr AS (SELECT wg.c, wg.v, wg.w
       FROM wg JOIN oe e ON e.u = wg.v AND e.v = wg.w),
tc AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
       FROM (SELECT c AS node FROM tr
             UNION ALL SELECT v FROM tr
             UNION ALL SELECT w FROM tr)
       GROUP BY node)
SELECT dg.node AS doc_id,
       CAST(COALESCE(tc.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(dg.d * (dg.d - 1) // 2 AS BIGINT) AS n_wedge
FROM dg LEFT JOIN tc ON tc.node = dg.node
WHERE dg.d >= 2
ORDER BY doc_id"""


SQL_TRIANGLES = f"WITH {_sql_triangles()}"


# ---------------------------------------------------------------------------
# HITS hubs & authorities (ops/hits.py) — K=3 exact fixed-point rounds
# ---------------------------------------------------------------------------
# The oracle unrolls each round as raw-sum / global-total / renorm CTE
# triples; because both sides use the same integer floor arithmetic
# (raw * 10^9 // total, all values bounded so int64 never widens),
# the match is bit-exact — any error in either join direction, the
# renorm divisor, or a missing zero-score node breaks the value hash.

HITS_ITERS = 3


def q_hits(sf_dir: str):
    """(doc_id, hub_fp, auth_fp) after HITS_ITERS mutual-reinforcement
    rounds; int64 fixed-point over denominator 10^9."""
    from osm2gtfs_ray.ops.hits import hits

    n = _n_docs(sf_dir)
    return hits(build_link_graph(sf_dir), n, iters=HITS_ITERS)


def _sql_hits() -> str:
    from osm2gtfs_ray.ops.hits import TOTAL_HITS

    parts = [
        f"""h0 AS (SELECT node, CAST({TOTAL_HITS} AS HUGEINT) // n AS v
       FROM ids CROSS JOIN nn)"""
    ]
    for i in range(1, HITS_ITERS + 1):
        # MATERIALIZED: each round CTE is referenced twice (raw sum
        # + renorm divisor); without it DuckDB inlines and the plan
        # expands 4^K — the oracle would never finish
        parts.append(f"""
ar{i} AS MATERIALIZED (SELECT e.dst AS node, SUM(h.v) AS s
        FROM edges e JOIN h{i - 1} h ON h.node = e.src GROUP BY e.dst),
at{i} AS (SELECT SUM(s) AS tot FROM ar{i}),
a{i} AS MATERIALIZED (SELECT node, (s * {TOTAL_HITS}) // tot AS v
       FROM ar{i} CROSS JOIN at{i}),
hr{i} AS MATERIALIZED (SELECT e.src AS node, SUM(a.v) AS s
        FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY e.src),
ht{i} AS (SELECT SUM(s) AS tot FROM hr{i}),
h{i} AS MATERIALIZED (SELECT node, (s * {TOTAL_HITS}) // tot AS v
       FROM hr{i} CROSS JOIN ht{i})""")
    k = HITS_ITERS
    return f"""{_sql_edges()},
{','.join(parts)}
SELECT ids.node AS doc_id,
       CAST(COALESCE(h.v, 0) AS BIGINT) AS hub_fp,
       CAST(COALESCE(a.v, 0) AS BIGINT) AS auth_fp
FROM ids LEFT JOIN h{k} h ON h.node = ids.node
         LEFT JOIN a{k} a ON a.node = ids.node
ORDER BY doc_id"""


SQL_HITS = f"WITH {_sql_hits()}"


# ---------------------------------------------------------------------------
# k-core decomposition (ops/kcore.py) — iterative peeling, K = 3
# ---------------------------------------------------------------------------
# The oracle unrolls KCORE_SQL_ROUNDS peeling rounds (filtered edge
# set -> degree count -> >= K survivors, all MATERIALIZED); once the
# peel converges the remaining rounds are no-ops, and the engine
# RAISES if the true fixpoint needs more rounds than the oracle
# budget (the DP_SQL_LEVELS discipline — divergence can never be
# silent). Peeling on this graph family converges in <= 15 rounds at
# 50k nodes (round count grows ~log n); 24 gives margin.

KCORE_K = 3
KCORE_SQL_ROUNDS = 24


def build_und_edges(sf_dir: str):
    """Deduped undirected pairs (a < b) of the link graph — one
    pair-hash sharded dedup over the synthesized edge stream."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    n = _n_docs(sf_dir)

    def undirect(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        a, b = np.minimum(s, d), np.maximum(s, d)
        keep = a != b
        return pa.table({"a": a[keep], "b": b[keep]})

    return sharded_map_groups(
        build_link_graph(sf_dir).map_batches(undirect, batch_format="pyarrow"),
        ["a", "b"],
        lambda g: g.drop_duplicates(["a", "b"]),
        n_shards=max(8, min(256, 2 * n // 250_000 + 1)),
    )


def q_kcore(sf_dir: str):
    """(doc_id, deg_core) for every node of the 3-core, deg_core its
    degree within the core (>= 3 by definition)."""
    from osm2gtfs_ray.ops.kcore import kcore

    n = _n_docs(sf_dir)
    return kcore(
        build_und_edges(sf_dir), n, KCORE_K, max_rounds=KCORE_SQL_ROUNDS
    )


def _sql_kcore() -> str:
    k, r = KCORE_K, KCORE_SQL_ROUNDS
    parts = [f"""
d1 AS MATERIALIZED (SELECT node, COUNT(*) AS dg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und) GROUP BY node),
a1 AS MATERIALIZED (SELECT node FROM d1 WHERE dg >= {k})"""]
    for i in range(2, r + 1):
        parts.append(f"""
e{i} AS MATERIALIZED (SELECT u.a, u.b FROM und u
  JOIN a{i - 1} x ON x.node = u.a JOIN a{i - 1} y ON y.node = u.b),
d{i} AS MATERIALIZED (SELECT node, COUNT(*) AS dg FROM (
    SELECT a AS node FROM e{i} UNION ALL SELECT b FROM e{i}) GROUP BY node),
a{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE dg >= {k})""")
    return f"""{_sql_edges()},
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
                            GREATEST(src, dst) AS b
                     FROM edges WHERE src <> dst),
{','.join(parts)}
SELECT node AS doc_id, CAST(dg AS BIGINT) AS deg_core
FROM d{r} WHERE dg >= {k} ORDER BY doc_id"""


SQL_KCORE = f"WITH {_sql_kcore()}"


# ---------------------------------------------------------------------------
# Tile authority: pagerank-weighted entity density per cell
# ---------------------------------------------------------------------------
# The cross-family composition (link graph x geo grid): each document's
# fixed-point PageRank mass is attributed to the grid cells of its geo
# entities — "which map tiles do authoritative pages talk about". The
# oracle CHAINS the two existing CTE machines (unrolled integer
# pagerank rounds + the flagship entity fan) and must agree bit-exactly
# on the per-cell rank sums — an end-to-end proof that independently
# verified operators compose without re-verification drift.
#
# Scale plan: ranks ride the broadcast plan (<= 2M nodes, int64
# vector via ray.put); entities are synthesized in the same pass that
# looks ranks up, so the ONLY shuffle is the bounded per-cell groupby.
# At larger node counts the rank attachment becomes a doc-keyed hash
# join (the pagerank_shuffle output is already a Dataset).

def _entity_cell_rows(sf_dir: str):
    """Dataset of (doc_id, cell_rm) — one row per synthesized entity
    (the join-ready long form of the entity fan)."""
    from osm2gtfs_ray.pipelines.geo_queries import CELL_LEVEL
    from osm2gtfs_ray.sources import pages as pg
    from osm2gtfs_ray.sources.pages import _flat_ranges, _uint

    nx, ny = 1 << CELL_LEVEL, 1 << (CELL_LEVEL - 1)
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n_ent = _uint(did, 3, 42, 4)
        d = np.repeat(did, n_ent)
        j = _flat_ranges(n_ent).astype(np.uint64)
        eidx = d * np.uint64(8) + j
        lat, lon = pg._entity_latlon(eidx, 42)
        lat, lon = np.round(lat, 6), np.round(lon, 6)
        ix = np.minimum(np.floor(((lon + 180.0) / 360.0) * nx).astype(np.int64), nx - 1)
        iy = np.minimum(np.floor(((lat + 90.0) / 180.0) * ny).astype(np.int64), ny - 1)
        return pa.table({"doc_id": d.astype(np.int64), "cell_rm": iy * nx + ix})

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _tile_authority_join(sf_dir: str, n: int):
    """Beyond-broadcast plan: the pagerank shuffle plan's rank
    Dataset hash-joined onto the (doc_id, cell) entity rows, then one
    bounded per-cell sum — nothing n-sized ever sits on the driver."""
    from osm2gtfs_ray.ops.joins import hash_join
    from osm2gtfs_ray.ops.sharded import bounded_key_sum

    np_ = max(2, min(64, n // 250_000 + 1))
    ranks = pagerank(build_link_graph(sf_dir), n, iters=PR_ITERS,
                     broadcast=False, num_partitions=np_)
    ranks = ranks.map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()),
             "rank_fp": pc.cast(t["rank_fp"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(
        _entity_cell_rows(sf_dir), ranks, "doc_id", num_partitions=np_
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "cell_rm": t["cell_rm"],
                    "pr_": pc.cast(t["rank_fp"], pa.int64()),
                    "pe_": np.ones(len(t), dtype=np.int64),
                }
            )
            .group_by("cell_rm")
            .aggregate([("pr_", "sum"), ("pe_", "sum")])
        )
        return g.rename_columns(["cell_rm", "pr_", "pe_"])

    return bounded_key_sum(
        joined.map_batches(partial, batch_format="pyarrow"),
        "cell_rm", ["pr_", "pe_"], driver=False,
        out_names=["rank_fp", "n_ent"],
    ).map_batches(
        lambda t: pa.table(
            {
                "cell_rm": pc.cast(t["cell_rm"], pa.int64()),
                "rank_fp": pc.cast(t["rank_fp"], pa.int64()),
                "n_ent": pc.cast(t["n_ent"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_tile_authority(sf_dir: str, plan: str = "auto"):
    """(cell_rm, rank_fp, n_ent): summed fixed-point rank mass and
    entity count per occupied cell. plan: 'broadcast' (rank vector
    via ray.put, <= 2M nodes), 'join' (rank Dataset hash-joined onto
    entity rows — the beyond-broadcast path), 'auto' by node count."""
    import ray

    from osm2gtfs_ray.ops.pagerank import BROADCAST_RANK_ROWS
    from osm2gtfs_ray.pipelines.geo_queries import CELL_LEVEL
    from osm2gtfs_ray.sources import pages as pg
    from osm2gtfs_ray.sources.pages import _flat_ranges, _uint

    nx, ny = 1 << CELL_LEVEL, 1 << (CELL_LEVEL - 1)
    n = _n_docs(sf_dir)
    if plan == "auto":
        plan = "broadcast" if n <= BROADCAST_RANK_ROWS else "join"
    if plan == "join":
        return _tile_authority_join(sf_dir, n)

    # rank vector via the broadcast pagerank plan's final state
    ranks_tbl = pa.concat_tables(
        [ray.get(r) for r in q_pagerank(sf_dir).to_arrow_refs()]
    )
    rank_vec = np.zeros(n, dtype=np.int64)
    rank_vec[ranks_tbl["doc_id"].to_numpy(zero_copy_only=False)] = (
        ranks_tbl["rank_fp"].to_numpy(zero_copy_only=False)
    )
    ref = ray.put(rank_vec)

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def f(t: pa.Table, _ref=ref) -> pa.Table:
        rv = ray.get(_ref)  # zero-copy plasma view
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n_ent = _uint(did, 3, 42, 4)
        d = np.repeat(did, n_ent)
        j = _flat_ranges(n_ent).astype(np.uint64)
        eidx = d * np.uint64(8) + j
        lat, lon = pg._entity_latlon(eidx, 42)
        lat, lon = np.round(lat, 6), np.round(lon, 6)
        ix = np.minimum(np.floor(((lon + 180.0) / 360.0) * nx).astype(np.int64), nx - 1)
        iy = np.minimum(np.floor(((lat + 90.0) / 180.0) * ny).astype(np.int64), ny - 1)
        g = (
            pa.table(
                {
                    "cell_rm": iy * nx + ix,
                    "r": rv[d.astype(np.int64)],
                    "e": np.ones(len(d), dtype=np.int64),
                }
            )
            .group_by("cell_rm")
            .aggregate([("r", "sum"), ("e", "sum")])
        )
        return g.rename_columns(["cell_rm", "pr_", "pe_"])

    from osm2gtfs_ray.ops.sharded import bounded_key_sum
    from osm2gtfs_ray.pipelines.geo_queries import _GRID_DRIVER_ROWS

    agg = bounded_key_sum(
        docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True),
        "cell_rm", ["pr_", "pe_"],
        driver=n <= _GRID_DRIVER_ROWS,
        out_names=["rank_fp", "n_ent"],
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "cell_rm": pc.cast(t["cell_rm"], pa.int64()),
                "rank_fp": pc.cast(t["rank_fp"], pa.int64()),
                "n_ent": pc.cast(t["n_ent"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def sql_tile_authority() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _entity_ctes

    return f"""
WITH {_sql_pagerank()},
pr AS (SELECT node, CAST(rank AS BIGINT) AS rank_fp FROM r{PR_ITERS}),
{_entity_ctes()},
cells AS (
  SELECT LEAST(CAST(FLOOR(((p.lat + 90.0) / 180.0) * 128) AS BIGINT), 127)
           * 256
         + LEAST(CAST(FLOOR(((p.lon + 180.0) / 360.0) * 256) AS BIGINT), 255)
           AS cell_rm,
         CAST(p.did AS BIGINT) AS doc_id
  FROM pts p
)
SELECT c.cell_rm, CAST(SUM(pr.rank_fp) AS BIGINT) AS rank_fp,
       CAST(COUNT(*) AS BIGINT) AS n_ent
FROM cells c JOIN pr ON pr.node = c.doc_id
GROUP BY c.cell_rm ORDER BY c.cell_rm
"""


# ---------------------------------------------------------------------------
# Strongly connected components (ops/scc.py) — bow-tie core detection
# ---------------------------------------------------------------------------
# Output (doc_id, scc): every node labeled with the min node id of
# its SCC. The oracle computes the recursive transitive closure and
# takes MIN over mutually-reachable nodes — exact, and tractable
# because reach is bounded by n * |giant SCC| at gate scale. Both
# engine plans (driver Kosaraju under 500k edges, parallel FW-BW
# broadcast above) iterate to the true fixpoint and raise past the
# sweep budget.

def q_scc(sf_dir: str):
    """(doc_id, scc) for every document node of the link graph."""
    from osm2gtfs_ray.ops.scc import scc

    n = _n_docs(sf_dir)
    return scc(build_link_graph(sf_dir), n)


SQL_SCC = f"""
WITH RECURSIVE {_sql_edges()},
base AS MATERIALIZED (SELECT src, dst FROM edges),
reach(node, m) AS (
  SELECT src, dst FROM base UNION SELECT src, src FROM base
  UNION
  SELECT r.node, s.dst FROM reach r JOIN base s ON r.m = s.src
)
SELECT node AS doc_id, CAST(MIN(m) AS BIGINT) AS scc
FROM reach r
WHERE EXISTS (SELECT 1 FROM reach q WHERE q.node = r.m AND q.m = r.node)
GROUP BY node ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Bow-tie decomposition: CORE / IN / OUT / OTHER (Broder et al.)
# ---------------------------------------------------------------------------
# The classic web-graph macro-structure: CORE = the giant SCC (max
# size, min-label tie-break), IN = reaches the core, OUT = reachable
# from it, OTHER = tendrils/disconnected. in-and-out implies core (a
# core->x->core path makes x mutually reachable with the core), so
# the CASE precedence is semantic documentation, not a choice. Built
# from the verified scc + bfs fixpoints: forward reachability from
# the core member set and backward reachability on reversed edges,
# each early-stopping when the frontier empties.

def q_bowtie(sf_dir: str):
    """(doc_id, cls) with cls in {core, in, out, other}.

    Size-aware plan selection (ops/bowtie.py): the broadcast
    composition under 2M nodes, the shuffle composition — scc labels
    hash-joined with two ops/bfs.reach_shuffle Dataset-frontier reach
    tables, no driver-held n-sized state — above it. Plan equivalence
    is pytested (tests/test_graph.py TestBowtie)."""
    from osm2gtfs_ray.ops.bowtie import bowtie

    n = _n_docs(sf_dir)
    return bowtie(build_link_graph(sf_dir), n)


SQL_BOWTIE = f"""
WITH RECURSIVE {_sql_edges()},
base AS MATERIALIZED (SELECT src, dst FROM edges),
reach(node, m) AS (
  SELECT src, dst FROM base UNION SELECT src, src FROM base
  UNION
  SELECT r.node, s.dst FROM reach r JOIN base s ON r.m = s.src
),
sccs AS MATERIALIZED (
  SELECT node, MIN(m) AS scc
  FROM reach r
  WHERE EXISTS (SELECT 1 FROM reach q WHERE q.node = r.m AND q.m = r.node)
  GROUP BY node
),
core AS (SELECT scc FROM (
  SELECT scc, COUNT(*) AS c FROM sccs GROUP BY scc
  ORDER BY c DESC, scc LIMIT 1
)),
cm AS (SELECT node FROM sccs JOIN core ON sccs.scc = core.scc),
outr AS (SELECT DISTINCT r.m AS node FROM reach r
         JOIN cm ON cm.node = r.node),
inr AS (SELECT DISTINCT r.node FROM reach r JOIN cm ON cm.node = r.m)
SELECT ids.node AS doc_id,
       CASE WHEN ids.node IN (SELECT node FROM cm) THEN 'core'
            WHEN ids.node IN (SELECT node FROM inr) THEN 'in'
            WHEN ids.node IN (SELECT node FROM outr) THEN 'out'
            ELSE 'other' END AS cls
FROM ids ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Domain authority: pagerank mass + content volume per registrable domain
# ---------------------------------------------------------------------------
# The crawl-prioritization rollup three families compose into: per
# registrable domain, document count, summed fixed-point PageRank
# (authority), and summed token count (content volume). One corpus
# pass computes domain / rank-lookup / token count together; the only
# merge is over the bounded domain key space. Ranks ride the
# broadcast plan (<= 2M nodes; the tile_authority join plan is the
# documented larger-n path).

def q_domain_authority(sf_dir: str):
    """(domain, n_docs, rank_fp, n_tokens) per registrable domain."""
    import ray

    from osm2gtfs_ray.ops.sharded import bounded_key_sum
    from osm2gtfs_ray.pipelines.geo_queries import _GRID_DRIVER_ROWS
    from osm2gtfs_ray.pipelines.web_queries import domains_of
    from osm2gtfs_ray.stages.text import token_count_arrow

    n = _n_docs(sf_dir)
    ranks_tbl = pa.concat_tables(
        [ray.get(r) for r in q_pagerank(sf_dir).to_arrow_refs()]
    )
    rank_vec = np.zeros(n, dtype=np.int64)
    rank_vec[ranks_tbl["doc_id"].to_numpy(zero_copy_only=False)] = (
        ranks_tbl["rank_fp"].to_numpy(zero_copy_only=False)
    )
    ref = ray.put(rank_vec)

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table, _ref=ref) -> pa.Table:
        rv = ray.get(_ref)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "domain": domains_of(did.astype(np.uint64)),
                    "d_": np.ones(len(did), dtype=np.int64),
                    "r_": rv[did],
                    "t_": token_count_arrow(t["text"]),
                }
            )
            .group_by("domain")
            .aggregate([("d_", "sum"), ("r_", "sum"), ("t_", "sum")])
        )
        return g.rename_columns(["domain", "d_", "r_", "t_"])

    return bounded_key_sum(
        docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True),
        "domain", ["d_", "r_", "t_"],
        driver=n <= _GRID_DRIVER_ROWS,
        out_names=["n_docs", "rank_fp", "n_tokens"],
    )


def sql_domain_authority() -> str:
    from osm2gtfs_ray.pipelines.web_queries import _N_HOSTS, _S_HOST, _S_TLD, _TLDS

    tld = (
        f"CASE ({_s_uint('did', _S_TLD, len(_TLDS))}) "
        "WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END"
    )
    return rf"""
WITH {_sql_pagerank()},
pr AS (SELECT node, CAST(rank AS BIGINT) AS rank_fp FROM r{PR_ITERS}),
dom AS (
  SELECT node,
         'site' || ({_s_uint('did', _S_HOST, _N_HOSTS)}) || '.' || {tld}
           AS domain
  FROM ids
),
tok AS (
  SELECT CAST(doc_id AS BIGINT) AS node,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END
              AS BIGINT) AS n_tokens
  FROM documents
)
SELECT d.domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(pr.rank_fp) AS BIGINT) AS rank_fp,
       CAST(SUM(tok.n_tokens) AS BIGINT) AS n_tokens
FROM dom d JOIN pr ON pr.node = d.node JOIN tok ON tok.node = d.node
GROUP BY d.domain ORDER BY d.domain
"""


# ---------------------------------------------------------------------------
# Personalized PageRank (random walk with restart to a seed set)
# ---------------------------------------------------------------------------
# Topic/query-biased authority: teleport mass restarts only to the
# crawl seed list (every PPR_SEED_MOD-th doc — the same seed set as
# q_bfs_hops) instead of uniformly. Same fixed-point discipline and
# dual broadcast/shuffle plans as q_pagerank (ops/pagerank.py:
# personalized_pagerank); plan equivalence is pytested like the other
# round-based graph ops.

PPR_ITERS = 5
PPR_SEED_MOD = 100


def q_ppr(sf_dir: str):
    """(doc_id, rank_fp) — K=5 personalized-PageRank rounds, teleport
    restricted to the every-100th-doc seed set."""
    from osm2gtfs_ray.ops.pagerank import personalized_pagerank

    n = _n_docs(sf_dir)
    seeds = np.arange(0, n, PPR_SEED_MOD, dtype=np.int64)
    return personalized_pagerank(
        build_link_graph(sf_dir), n, seeds, iters=PPR_ITERS
    )


def sql_ppr() -> str:
    head = f"""{_sql_edges()},
ns AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m FROM ids
       WHERE node % {PPR_SEED_MOD} = 0),
b AS (SELECT ({DAMP_DEN - DAMP_NUM} * (CAST({TOTAL_FP} AS HUGEINT) // m))
             // {DAMP_DEN} AS basev,
             CAST({TOTAL_FP} AS HUGEINT) // m AS init FROM ns),
r0 AS (SELECT node,
              CASE WHEN node % {PPR_SEED_MOD} = 0 THEN init
                   ELSE CAST(0 AS HUGEINT) END AS rank
       FROM ids CROSS JOIN b)"""
    rounds = []
    for i in range(1, PPR_ITERS + 1):
        rounds.append(f"""
i{i} AS (SELECT e.dst AS node, SUM(r.rank // e.outdeg) AS inflow
       FROM edges e JOIN r{i - 1} r ON r.node = e.src GROUP BY e.dst),
r{i} AS (SELECT ids.node,
              CASE WHEN ids.node % {PPR_SEED_MOD} = 0 THEN basev
                   ELSE CAST(0 AS HUGEINT) END
              + COALESCE(({DAMP_NUM} * i.inflow) // {DAMP_DEN}, 0) AS rank
       FROM ids CROSS JOIN b LEFT JOIN i{i} i ON i.node = ids.node)""")
    return (
        "WITH " + head + "," + ",".join(rounds)
        + f"""
SELECT node AS doc_id, CAST(rank AS BIGINT) AS rank_fp
FROM r{PPR_ITERS} ORDER BY doc_id
"""
    )


# ---------------------------------------------------------------------------
# Weighted SSSP (bounded-hop Bellman-Ford) over the link graph
# ---------------------------------------------------------------------------
# The weighted generalization of q_bfs_hops: integer edge weights
# w(u,v) = 1 + U(9) synthesized from the edge endpoints (so the SQL
# side re-derives them arithmetically), K = SSSP_ITERS global
# relaxation rounds from the crawl seed set. Result: exact minimum
# path weight using at most K edges — the bounded-round semantics
# that keeps the oracle a K-level unrolled MIN-merge. Dual plans in
# ops/sssp.py (broadcast distance vector / Dataset-join shuffle),
# plan-equivalence pytested.
#
# Endpoint-key weights assume doc ids < 2^31 (src<<32 | dst fits
# uint64); a larger id space would widen the key to two streams.

SSSP_ITERS = 6
SSSP_SEED_MOD = 100
_S_W = 294


def build_weighted_graph(sf_dir: str):
    """(src, dst, w) — the link graph with deterministic integer
    weights derived from the edge endpoints."""
    base = build_link_graph(sf_dir)

    def weigh(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        k = (src.astype(np.uint64) << np.uint64(32)) + dst.astype(np.uint64)
        w = 1 + _uint(k, _S_W, SEED, 9)
        return pa.table(
            {"src": t["src"], "dst": t["dst"], "w": pa.array(w, pa.int64())}
        )

    return base.map_batches(weigh, batch_format="pyarrow")


def q_sssp(sf_dir: str):
    """(doc_id, dist) — minimum path weight from the seed set using
    at most SSSP_ITERS edges."""
    from osm2gtfs_ray.ops.sssp import sssp

    n = _n_docs(sf_dir)
    seeds = np.arange(0, n, SSSP_SEED_MOD, dtype=np.int64)
    return sssp(build_weighted_graph(sf_dir), n, seeds, iters=SSSP_ITERS)


def sql_sssp() -> str:
    kx = ("CAST(CAST(src AS UBIGINT) * 4294967296 + CAST(dst AS UBIGINT) "
          "AS UBIGINT)")
    rounds = []
    for i in range(1, SSSP_ITERS + 1):
        rounds.append(f"""
d{i} AS MATERIALIZED (
  SELECT node, MIN(d) AS d FROM (
    SELECT node, d FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS node, r.d + e.w AS d
    FROM we e JOIN d{i - 1} r ON r.node = e.src
  ) GROUP BY node)""")
    return f"""
WITH {_sql_edges()},
we AS MATERIALIZED (
  SELECT src, dst, 1 + ({_s_uint(kx, _S_W, 9)}) AS w FROM edges
),
d0 AS (SELECT node, CAST(0 AS BIGINT) AS d FROM ids
       WHERE node % {SSSP_SEED_MOD} = 0),
{",".join(rounds)}
SELECT node AS doc_id, CAST(d AS BIGINT) AS dist
FROM d{SSSP_ITERS} ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Orphan pages: nodes with zero in-degree on the link graph
# ---------------------------------------------------------------------------
# The crawl-frontier hygiene query: pages no other page links to —
# unreachable by link traversal, discoverable only via seeds/sitemaps
# (the webtext analogue of the reference's unused-stop removal, A6:
# stops_creator drops stops no route references). Scale shape: ONE
# groupby shuffle over (node, flag) rows — every doc emits (id, 0),
# every edge emits (dst, 1) with map-side dst dedup — then MAX(flag)
# per node; orphans are flag 0. No broadcast set, no driver
# materialization: works at any node count, unlike a NOT IN against a
# collected dst set.

def q_orphan_pages(sf_dir: str):
    """(doc_id, outdeg) for every page with in-degree 0 on the
    synthetic link graph."""
    from ray.data.aggregate import Max

    n = _n_docs(sf_dir)
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def emit(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = synthesize_edges(ids.astype(np.uint64), n)
        dst = np.unique(e["dst"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "node": np.concatenate([ids, dst]),
                "flag": np.concatenate(
                    [np.zeros(len(ids), np.int64), np.ones(len(dst), np.int64)]
                ),
            }
        )

    flags = (
        docs.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Max("flag", alias_name="linked"))
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.cast(t["linked"], pa.int64()), 0))
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        outdeg = 1 + _uint(node.astype(np.uint64), _S_DEG, SEED, _MAX_DEG)
        return pa.table({"doc_id": node, "outdeg": outdeg})

    return flags.map_batches(finish, batch_format="pyarrow")


def _sql_orphan_pages() -> str:
    return f"""
WITH {_sql_edges()}
SELECT node AS doc_id, CAST(outdeg AS BIGINT) AS outdeg
FROM deg
WHERE node NOT IN (SELECT dst FROM edges)
ORDER BY doc_id
"""


SQL_ORPHAN_PAGES = _sql_orphan_pages()


# ---------------------------------------------------------------------------
# Link prediction: common-neighbor Jaccard over the undirected graph
#
# Reference semantics analogue: osm2gtfs's stop->route matching scores
# candidate pairs by shared context (name/ref overlap,
# osm2gtfs/creators/stops_creator.py); here the web-scale analogue is
# scoring NON-adjacent page pairs by shared neighborhoods - the
# classic link-prediction primitive for crawl frontier ranking.
#
# Scale plan: pair candidates are emitted per shared neighbor w
# (shard key = w), never all-pairs; a per-neighbor cap LP_CAP bounds
# the quadratic blowup on hub nodes (the skew guard, replicated
# bit-exactly in the SQL oracle via ROW_NUMBER, same convention as
# COCITE_CAP). Degrees join back via two hash joins; the und-edge
# exclusion rides the SAME (a,b)-sharded exchange as the count merge
# (union + flag, one shuffle).

LP_CAP = 64  # per-neighbor fan-in cap (skew guard; oracle-replicated)
LP_MIN_CN = 2  # report pairs sharing at least this many neighbors
LP_SCALE = 10**6  # jaccard fixed-point denominator


def _lp_sym(sf_dir: str):
    """Both directions of the deduped undirected edge set."""
    und = build_und_edges(sf_dir)

    def both(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": np.concatenate([a, b]),
                "nbr": np.concatenate([b, a]),
            }
        )

    return und, und.map_batches(both, batch_format="pyarrow")


def q_link_prediction(sf_dir: str):
    """(a, b, cn, jaccard_fp): non-adjacent page pairs sharing >=
    LP_MIN_CN neighbors, scored cn/(deg(a)+deg(b)-cn) in 1e6
    fixed point. Deterministic: LP_CAP lowest-id neighbors per hub."""
    import pandas as pd

    from osm2gtfs_ray.ops.joins import hash_join
    from osm2gtfs_ray.ops.pairs import intra_group_pair_indices, new_group_mask
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    und, sym = _lp_sym(sf_dir)
    # nested hash joins: size partitions with the corpus (min 2) so
    # the aggregator actor pools never starve a small-CPU session
    # (the q_triangles np_ convention)
    np_ = max(2, min(64, 2 * _n_docs(sf_dir) // 250_000 + 1))

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["nbr", "node"], kind="mergesort")
        rank = g.groupby("nbr", sort=False).cumcount().to_numpy()
        g = g[rank < LP_CAP]
        new = new_group_mask(g, ["nbr"])
        ai, bi = intra_group_pair_indices(new)
        nd = g["node"].to_numpy()
        # sorted asc within each nbr group and (node, nbr) unique,
        # so nd[ai] < nd[bi] always: pairs are canonical (a < b)
        pairs = pd.DataFrame({"a": nd[ai], "b": nd[bi]})
        out = (
            pairs.groupby(["a", "b"], sort=False)
            .size()
            .rename("cn_part")
            .reset_index()
        )
        out["is_edge"] = np.int64(0)
        return out

    parts = sharded_map_groups(sym, "nbr", shard_pairs)

    def mark_edges(t: pa.Table) -> pa.Table:
        z = np.zeros(t.num_rows, np.int64)
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "cn_part": z,
                "is_edge": z + 1,
            }
        )

    merged = parts.union(und.map_batches(mark_edges, batch_format="pyarrow"))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["a", "b"], sort=False).agg(
            cn=("cn_part", "sum"), is_edge=("is_edge", "max")
        )
        agg = agg[(agg["is_edge"] == 0) & (agg["cn"] >= LP_MIN_CN)]
        return agg.reset_index().drop(columns="is_edge")

    cand = sharded_map_groups(merged, ["a", "b"], finish)

    def degrees(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("node", sort=False).size().rename("dg").reset_index()
        )

    deg = sharded_map_groups(sym, "node", degrees)

    j = hash_join(cand, deg.map_batches(
        lambda t: t.rename_columns(["a", "dg_a"]), batch_format="pyarrow"
    ), keys="a", num_partitions=np_)
    j = hash_join(j, deg.map_batches(
        lambda t: t.rename_columns(["b", "dg_b"]), batch_format="pyarrow"
    ), keys="b", num_partitions=np_)

    def score(t: pa.Table) -> pa.Table:
        cn = t["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        da = t["dg_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = t["dg_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        # union size >= cn >= LP_MIN_CN > 0: denominator never zero
        jac = cn * np.int64(LP_SCALE) // (da + db - cn)
        return pa.table(
            {
                "a": pc.cast(t["a"], pa.int64()),
                "b": pc.cast(t["b"], pa.int64()),
                "cn": cn,
                "jaccard_fp": jac,
            }
        )

    return j.map_batches(score, batch_format="pyarrow")


def sql_link_prediction() -> str:
    return f"""
WITH {_sql_edges()},
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
                            GREATEST(src, dst) AS b
                     FROM edges WHERE src <> dst),
sym AS MATERIALIZED (
  SELECT a AS node, b AS nbr FROM und
  UNION ALL SELECT b AS node, a AS nbr FROM und),
cap AS (
  SELECT node, nbr FROM (
    SELECT node, nbr,
           ROW_NUMBER() OVER (PARTITION BY nbr ORDER BY node) AS rk
    FROM sym) WHERE rk <= {LP_CAP}),
pr AS (
  SELECT s1.node AS a, s2.node AS b, CAST(COUNT(*) AS BIGINT) AS cn
  FROM cap s1 JOIN cap s2 ON s1.nbr = s2.nbr AND s1.node < s2.node
  GROUP BY 1, 2),
udeg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS dg FROM sym GROUP BY node),
cand AS (
  SELECT p.a, p.b, p.cn FROM pr p
  ANTI JOIN und u ON u.a = p.a AND u.b = p.b
  WHERE p.cn >= {LP_MIN_CN})
SELECT c.a, c.b, c.cn,
       CAST((CAST(c.cn AS HUGEINT) * {LP_SCALE})
            // (da.dg + db.dg - c.cn) AS BIGINT) AS jaccard_fp
FROM cand c
JOIN udeg da ON da.node = c.a
JOIN udeg db ON db.node = c.b
ORDER BY c.a, c.b
"""


# ---------------------------------------------------------------------------
# Degree assortativity: Pearson correlation of (outdeg(src), indeg(dst))
# across directed edges - one scalar describing hub-to-hub linking.
#
# Scale plan: indeg is ONE per-dst aggregation (the same exchange
# pagerank's shuffle plan uses), joined back to the edge stream with a
# hash join; the correlation itself is six mergeable int64 partial
# sums reduced to a single driver row, then scored exactly in Python
# big ints (the gini_fp discipline: no int64 product overflow at any
# corpus size) before ONE float64 division mirroring the oracle's
# DOUBLE arithmetic. Partial-sum int64 bound: x = outdeg <= 3 so
# sum(x^2) <= 9m; y = indeg can reach hub scale h, sum(y^2) <= m*h^2 -
# per-BATCH partials stay well under 2^63 for h < 3e4 at the default
# 64k batch; beyond that the partial stage would need uint128
# chunking, documented here rather than silently wrong (the global
# merge is already exact big-int).


def q_assortativity(sf_dir: str):
    """One row (m, assort_e6): edge count and degree assortativity
    (Pearson r of src outdeg vs dst indeg over edges), half-away
    rounded at 1e6 like corr_qty_price."""
    import math

    import pandas as pd

    from osm2gtfs_ray.ops.joins import hash_join
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    edges = build_link_graph(sf_dir)

    def ind_parts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("dst", sort=False).size().rename("ind").reset_index()

    def ind_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("dst", sort=False)["ind"].sum().reset_index()

    ind = sharded_map_groups(
        edges.select_columns(["dst"]),
        "dst",
        ind_merge,
        local_pre=ind_parts,  # map-side combine before the shuffle
    )

    np_ = max(2, min(64, 2 * _n_docs(sf_dir) // 250_000 + 1))
    j = hash_join(edges.select_columns(["dst", "outdeg"]), ind, keys="dst",
                  num_partitions=np_)

    def moments(t: pa.Table) -> pa.Table:
        x = t["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["ind"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "m": [np.int64(len(x))],
                "sx": [x.sum()],
                "sy": [y.sum()],
                "sxy": [(x * y).sum()],
                "sxx": [(x * x).sum()],
                "syy": [(y * y).sum()],
            }
        )

    parts = j.map_batches(moments, batch_format="pyarrow")
    tot = parts.aggregate(
        Sum("m"), Sum("sx"), Sum("sy"), Sum("sxy"), Sum("sxx"), Sum("syy")
    )
    m = int(tot["sum(m)"])
    sx, sy = int(tot["sum(sx)"]), int(tot["sum(sy)"])
    sxy, sxx, syy = int(tot["sum(sxy)"]), int(tot["sum(sxx)"]), int(tot["sum(syy)"])
    num = m * sxy - sx * sy
    d1 = m * sxx - sx * sx
    d2 = m * syy - sy * sy
    if d1 == 0 or d2 == 0:
        raise ValueError("assortativity undefined: constant degree series")
    corr = float(num) / math.sqrt(float(d1) * float(d2))
    assort_e6 = int(math.trunc(corr * 1e6 + math.copysign(0.5, corr)))
    return pd.DataFrame({"m": [m], "assort_e6": [assort_e6]})


def sql_assortativity() -> str:
    return f"""
WITH {_sql_edges()},
ind AS (SELECT dst AS node, CAST(COUNT(*) AS HUGEINT) AS ind
        FROM edges GROUP BY dst),
j AS (SELECT CAST(e.outdeg AS HUGEINT) AS x, i.ind AS y
      FROM edges e JOIN ind i ON i.node = e.dst),
s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM j)
SELECT CAST(m AS BIGINT) AS m,
       CAST(ROUND(CAST(m * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                         * CAST(m * syy - sy * sy AS DOUBLE)) * 1e6)
            AS BIGINT) AS assort_e6
FROM s
"""


# ---------------------------------------------------------------------------
# Resource-allocation link score (Zhou, Lu & Zhang 2009): for each
# non-adjacent pair, RA = sum over shared neighbors w of 1/deg(w) -
# the integer-exact cousin of Adamic-Adar (1/ln deg needs floats;
# 1/deg does not). Unlike Jaccard above, each shared neighbor's
# contribution is known AT EMISSION TIME (all of w's adjacency rows
# land in w's shard, so deg(w) is just the group size), so the score
# needs NO degree join afterwards - one pair-keyed exchange total.
# Contributions are 10^9 // deg(w): integer division both sides,
# order-independent sums, bit-exact oracle.

RA_SCALE = 10**9


def q_resource_alloc(sf_dir: str):
    """(a, b, cn, ra_fp): non-adjacent pairs sharing >= LP_MIN_CN
    neighbors, scored sum(RA_SCALE // deg(w)) over shared w. Same
    LP_CAP per-neighbor guard (oracle-replicated) as link_prediction;
    deg(w) is the FULL pre-cap degree."""
    import pandas as pd

    from osm2gtfs_ray.ops.pairs import intra_group_pair_indices, new_group_mask
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    und, sym = _lp_sym(sf_dir)

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["nbr", "node"], kind="mergesort")
        sizes = g.groupby("nbr", sort=False)["node"].transform("size")
        contrib = (np.int64(RA_SCALE) // sizes.to_numpy(np.int64))
        rank = g.groupby("nbr", sort=False).cumcount().to_numpy()
        keep = rank < LP_CAP
        g2, contrib = g[keep], contrib[keep]
        new = new_group_mask(g2, ["nbr"])
        ai, bi = intra_group_pair_indices(new)
        nd = g2["node"].to_numpy()
        pairs = pd.DataFrame(
            {"a": nd[ai], "b": nd[bi], "ra_part": contrib[ai]}
        )
        out = pairs.groupby(["a", "b"], sort=False).agg(
            cn_part=("ra_part", "size"), ra_part=("ra_part", "sum")
        ).reset_index()
        out["is_edge"] = np.int64(0)
        return out

    parts = sharded_map_groups(sym, "nbr", shard_pairs)

    def mark_edges(t: pa.Table) -> pa.Table:
        z = np.zeros(t.num_rows, np.int64)
        return pa.table(
            {"a": t["a"], "b": t["b"], "cn_part": z, "ra_part": z,
             "is_edge": z + 1}
        )

    merged = parts.union(und.map_batches(mark_edges, batch_format="pyarrow"))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["a", "b"], sort=False).agg(
            cn=("cn_part", "sum"), ra_fp=("ra_part", "sum"),
            is_edge=("is_edge", "max"),
        )
        agg = agg[(agg["is_edge"] == 0) & (agg["cn"] >= LP_MIN_CN)]
        out = agg.reset_index().drop(columns="is_edge")
        out["a"] = out["a"].astype(np.int64)
        out["b"] = out["b"].astype(np.int64)
        out["cn"] = out["cn"].astype(np.int64)
        out["ra_fp"] = out["ra_fp"].astype(np.int64)
        return out

    return sharded_map_groups(merged, ["a", "b"], finish)


def sql_resource_alloc() -> str:
    return f"""
WITH {_sql_edges()},
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
                            GREATEST(src, dst) AS b
                     FROM edges WHERE src <> dst),
sym AS MATERIALIZED (
  SELECT a AS node, b AS nbr FROM und
  UNION ALL SELECT b AS node, a AS nbr FROM und),
udeg AS (SELECT nbr AS w, CAST(COUNT(*) AS BIGINT) AS dg
         FROM sym GROUP BY nbr),
cap AS (
  SELECT node, nbr FROM (
    SELECT node, nbr,
           ROW_NUMBER() OVER (PARTITION BY nbr ORDER BY node) AS rk
    FROM sym) WHERE rk <= {LP_CAP}),
pr AS (
  SELECT s1.node AS a, s2.node AS b,
         CAST(COUNT(*) AS BIGINT) AS cn,
         CAST(SUM({RA_SCALE} // u.dg) AS BIGINT) AS ra_fp
  FROM cap s1
  JOIN cap s2 ON s1.nbr = s2.nbr AND s1.node < s2.node
  JOIN udeg u ON u.w = s1.nbr
  GROUP BY 1, 2)
SELECT p.a, p.b, p.cn, p.ra_fp
FROM pr p
ANTI JOIN und e ON e.a = p.a AND e.b = p.b
WHERE p.cn >= {LP_MIN_CN}
ORDER BY p.a, p.b
"""


# ---------------------------------------------------------------------------
# Local clustering coefficient (Watts-Strogatz): per node with degree
# >= 2, lcc = triangles-through-node / C(d,2), in 1e6 integer fixed
# point — a pure per-row map over q_triangles' output (which already
# carries both the triangle count and the wedge capacity), so the
# whole scale story is the triangle operator's (degree-ordered
# orientation, O(m^1.5) wedge join, dual local/shuffle plans).

LCC_SCALE = 10**6


def q_clustering_coef(sf_dir: str):
    """(doc_id, n_tri, lcc_fp): local clustering coefficient per node
    of undirected degree >= 2, lcc_fp = n_tri * 1e6 // C(d, 2)."""
    tri = q_triangles(sf_dir)

    def score(t: pa.Table) -> pa.Table:
        nt = t["n_tri"].to_numpy(zero_copy_only=False).astype(np.int64)
        nw = t["n_wedge"].to_numpy(zero_copy_only=False).astype(np.int64)
        # d >= 2 guarantees n_wedge = C(d,2) >= 1: no zero division
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tri": nt,
                "lcc_fp": nt * np.int64(LCC_SCALE) // nw,
            }
        )

    return tri.map_batches(score, batch_format="pyarrow")


def sql_clustering_coef() -> str:
    return f"""
WITH {_sql_triangles().rsplit("SELECT", 1)[0]}
SELECT dg.node AS doc_id,
       CAST(COALESCE(tc.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(COALESCE(tc.n_tri, 0) * {LCC_SCALE}
            // (dg.d * (dg.d - 1) // 2) AS BIGINT) AS lcc_fp
FROM dg LEFT JOIN tc ON tc.node = dg.node
WHERE dg.d >= 2
ORDER BY doc_id
"""
