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


def _sql_pagerank() -> str:
    d0 = _s_uint_mod("did", _S_DST[0], "n - 1")
    d1 = _s_uint_mod("did", _S_DST[1], "n - 1")
    d2 = _s_uint_mod("did", _S_DST[2], "n - 1")
    head = f"""
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
),
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
