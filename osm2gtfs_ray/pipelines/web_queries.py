"""Webtext URL operators: canonicalization, host/domain extraction,
and domain-level corpus aggregation.

The synthetic corpus carries no URL column, so — exactly like the
media/audio/PII queries — each document is assigned a deterministic
MESSY url derived from doc_id via splitmix64 streams (mixed scheme
case, optional ``www.`` prefix, default vs explicit ports, trailing
slashes, shuffled query params, tracking params, fragments). The
ENGINE's job is the real one: parse the URL (RE2 ``pc.extract_regex``)
and canonicalize it field by field (lowercase scheme/host, strip
``www.``, drop default ports, normalize the path, drop ``utm_*``
tracking params, sort the remaining query params, drop the fragment).
The SQL oracle never sees the messy form — it re-derives the expected
CANONICAL url arithmetically from the same streams, so any parsing or
normalization bug in the engine breaks the value hash.

Reference semantics analogue: `osm2gtfs/core/helper.py` name/ref
normalizers (string canonicalization before keying); the web shape
(host/registrable-domain keys for corpus grouping) is the webtext
generalization the graft targets.

Scale notes: canonicalization is a pure per-batch map (zero shuffles);
host_stats pre-aggregates (domain, host) partials inside each block
before ONE small groupby over the bounded domain key space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint
from osm2gtfs_ray.sources.pages import _uint

SEED = 42  # pairs with flagship_oracle._SEED in the SQL expressions
from osm2gtfs_ray.sources.tables import read_table

# splitmix streams (numpy `_uint(ids, stream, SEED, mod)` pairs with
# SQL `_s_uint("did", stream, mod)` bit-exactly)
_S_HTTPS, _S_SCASE, _S_WWW, _S_HOST, _S_TLD = 201, 202, 203, 204, 205
_S_SUB, _S_HCASE, _S_PORT, _S_DEPTH, _S_PA = 206, 207, 208, 209, 210
_S_PB, _S_TRAIL, _S_ID, _S_Q, _S_REF = 211, 212, 213, 214, 215
_S_UTM, _S_VI, _S_VQ, _S_VR, _S_REV, _S_FRAG, _S_SUBID = (
    216, 217, 218, 219, 220, 221, 222,
)
_TLDS = ("com", "org", "net")
_N_HOSTS = 50


def synthesize_messy_urls(ids: np.ndarray) -> np.ndarray:
    """Deterministic messy URL per id — pure numpy ``U`` kernels, one
    C pass per concatenation, no Python per row."""
    ids = np.asarray(ids, dtype=np.uint64)

    def u(stream, mod):
        return _uint(ids, stream, SEED, mod)

    def s(x):
        return x.astype("U20")

    https = u(_S_HTTPS, 2) == 1
    scheme = np.where(https, "https", "http")
    scheme = np.where(u(_S_SCASE, 2) == 1, np.char.upper(scheme), scheme)

    sub = np.where(
        u(_S_SUB, 2) == 1,
        np.char.add(np.char.add("m", s(u(_S_SUBID, 5))), "."),
        "",
    )
    hostc = np.char.add(
        np.char.add(np.char.add(sub, "site"), s(u(_S_HOST, _N_HOSTS))),
        np.char.add(".", np.take(np.array(_TLDS), u(_S_TLD, len(_TLDS)))),
    )
    host = np.char.add(np.where(u(_S_WWW, 2) == 1, "www.", ""), hostc)
    host = np.where(u(_S_HCASE, 2) == 1, np.char.upper(host), host)

    pmode = u(_S_PORT, 3)
    port = np.select(
        [pmode == 1, pmode == 2], [np.where(https, ":443", ":80"), ":8080"], ""
    )

    depth = u(_S_DEPTH, 3)
    p1 = np.char.add("/p", s(u(_S_PA, 20)))
    path = np.select([depth == 1, depth == 2],
                     [p1, np.char.add(p1, np.char.add("/q", s(u(_S_PB, 20))))],
                     "")
    path = np.char.add(
        path, np.where((depth > 0) & (u(_S_TRAIL, 2) == 1), "/", "")
    )

    def piece(flag_stream, name, val):
        has = u(flag_stream, 2) == 1
        return np.where(has, np.char.add(name, val), "")

    pid = piece(_S_ID, "id=", s(u(_S_VI, 100)))
    pq = piece(_S_Q, "q=", s(u(_S_VQ, 100)))
    pref = piece(_S_REF, "ref=", s(u(_S_VR, 100)))
    putm = np.where(u(_S_UTM, 2) == 1, "utm_source=news", "")

    def amp(p):
        return np.where(p == "", "", np.char.add("&", p))

    fwd = np.char.add(np.char.add(amp(pid), amp(pq)), np.char.add(amp(pref), amp(putm)))
    rev = np.char.add(np.char.add(amp(putm), amp(pref)), np.char.add(amp(pq), amp(pid)))
    qcat = np.where(u(_S_REV, 2) == 1, rev, fwd)
    qs = np.where(
        qcat == "", "", np.char.add("?", np.char.lstrip(qcat, "&"))
    )
    frag = np.where(u(_S_FRAG, 2) == 1, "#top", "")

    out = np.char.add(scheme, "://")
    for part in (host, port, path, qs, frag):
        out = np.char.add(out, part)
    return out


def domains_of(ids: np.ndarray) -> np.ndarray:
    """Registrable domain per doc_id — the same (host_id, tld) streams
    the messy-URL synthesizer draws, without materializing the URL.
    Used by the link-graph rollups (graph_queries), where only the
    domain key is needed per edge endpoint."""
    ids = np.asarray(ids, dtype=np.uint64)
    host_id = _uint(ids, _S_HOST, SEED, _N_HOSTS)
    tld = np.take(np.array(_TLDS), _uint(ids, _S_TLD, SEED, len(_TLDS)))
    return np.char.add(
        np.char.add("site", host_id.astype("U4")), np.char.add(".", tld)
    )


_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/:?#]+)"
    r"(?P<port>:[0-9]+)?(?P<path>[^?#]*)(?P<query>\?[^#]*)?(?P<frag>#.*)?$"
)


def canonicalize_urls(urls: pa.Array) -> pa.Table:
    """THE operator: parse + canonicalize a URL column. All Arrow RE2
    / slice kernels plus one numpy lexsort for the param reorder —
    nothing touches Python per row."""
    parts = pc.extract_regex(urls, _URL_RE)
    get = lambda f: pc.fill_null(pc.struct_field(parts, f), "")

    scheme = pc.utf8_lower(get("scheme"))
    host = pc.replace_substring_regex(
        pc.utf8_lower(get("host")), r"^www\.", ""
    )
    domain = pc.fill_null(
        pc.struct_field(
            pc.extract_regex(host, r"(?P<d>[^.]+\.[^.]+)$"), "d"
        ),
        "",
    )

    port = get("port")
    is_default = pc.or_(
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, ":80")),
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, ":443")),
    )
    port = pc.if_else(is_default, "", port)

    path = pc.replace_substring_regex(get("path"), r"/$", "")
    path = pc.if_else(pc.equal(path, ""), "/", path)

    # query params: strip "?", split, drop empties + tracking params,
    # sort (param-string asc) within each row, rejoin
    rawq = pc.replace_substring_regex(get("query"), r"^\?", "")
    pieces = pc.split_pattern(rawq, "&")
    flat = pc.list_flatten(pieces)
    rows = pc.list_parent_indices(pieces).to_numpy(zero_copy_only=False)
    keep = pc.and_(
        pc.not_equal(flat, ""), pc.invert(pc.starts_with(flat, "utm_"))
    ).to_numpy(zero_copy_only=False)
    tracking = pc.starts_with(flat, "utm_").to_numpy(zero_copy_only=False)

    n = len(urls)
    n_params = np.bincount(rows, weights=keep, minlength=n).astype(np.int64)
    n_tracking = np.bincount(rows, weights=tracking, minlength=n).astype(np.int64)

    kept_rows = rows[keep]
    kept_vals = np.asarray(flat.to_pylist(), dtype="U24")[keep]
    order = np.lexsort((kept_vals, kept_rows))
    counts = np.bincount(kept_rows, minlength=n).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    qs = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(kept_vals[order])
        ),
        "&",
    )
    qs_full = pc.if_else(
        pc.equal(qs, ""), "", pc.binary_join_element_wise("?", qs, "")
    )

    url = pc.binary_join_element_wise(
        scheme, "://", host, port, path, pc.fill_null(qs_full, ""), ""
    )
    return pa.table(
        {
            "url": url,
            "host": host,
            "domain": domain,
            "path": path,
            "n_params": pa.array(n_params, pa.int64()),
            "n_tracking": pa.array(n_tracking, pa.int64()),
        }
    )


def _canon_batch(t: pa.Table) -> pa.Table:
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    messy = synthesize_messy_urls(ids)
    out = canonicalize_urls(pa.array(messy)).drop_columns(["path"])
    return out.add_column(0, "doc_id", pc.cast(t["doc_id"], pa.int64()))


def q_url_canonicalize(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    return docs.map_batches(_canon_batch, batch_format="pyarrow")


def _sql_url_fields() -> str:
    """CTE computing every per-doc draw once (each _s_uint expands to
    a long bigint chain — evaluate once, concat later)."""
    tld = f"CASE ({_s_uint('did', _S_TLD, 3)}) WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END"
    return f"""
f AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, did,
         ({_s_uint('did', _S_HTTPS, 2)}) AS https,
         ({_s_uint('did', _S_SUB, 2)}) AS has_sub,
         ({_s_uint('did', _S_SUBID, 5)}) AS sub_id,
         ({_s_uint('did', _S_HOST, _N_HOSTS)}) AS host_id,
         {tld} AS tld,
         ({_s_uint('did', _S_PORT, 3)}) AS pmode,
         ({_s_uint('did', _S_DEPTH, 3)}) AS depth,
         ({_s_uint('did', _S_PA, 20)}) AS pa,
         ({_s_uint('did', _S_PB, 20)}) AS pb,
         ({_s_uint('did', _S_ID, 2)}) AS has_id,
         ({_s_uint('did', _S_Q, 2)}) AS has_q,
         ({_s_uint('did', _S_REF, 2)}) AS has_ref,
         ({_s_uint('did', _S_UTM, 2)}) AS has_utm,
         ({_s_uint('did', _S_VI, 100)}) AS vi,
         ({_s_uint('did', _S_VQ, 100)}) AS vq,
         ({_s_uint('did', _S_VR, 100)}) AS vr
  FROM (SELECT doc_id, CAST(doc_id AS UBIGINT) AS did FROM documents)
),
c AS (
  SELECT doc_id,
         CASE https WHEN 1 THEN 'https' ELSE 'http' END AS scheme,
         CASE has_sub WHEN 1 THEN 'm' || sub_id || '.' ELSE '' END
           || 'site' || host_id || '.' || tld AS host,
         'site' || host_id || '.' || tld AS domain,
         CASE pmode WHEN 2 THEN ':8080' ELSE '' END AS port,
         CASE depth WHEN 0 THEN '/'
                    WHEN 1 THEN '/p' || pa
                    ELSE '/p' || pa || '/q' || pb END AS path,
         concat_ws('&',
           CASE has_id  WHEN 1 THEN 'id='  || vi END,
           CASE has_q   WHEN 1 THEN 'q='   || vq END,
           CASE has_ref WHEN 1 THEN 'ref=' || vr END) AS qs,
         CAST(has_id + has_q + has_ref AS BIGINT) AS n_params,
         CAST(has_utm AS BIGINT) AS n_tracking
  FROM f
)"""


SQL_URL_CANONICALIZE = f"""
WITH {_sql_url_fields()}
SELECT doc_id,
       scheme || '://' || host || port || path
         || CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS url,
       host, domain, n_params, n_tracking
FROM c ORDER BY doc_id
"""


def q_host_stats(sf_dir: str):
    """Domain-level corpus rollup over canonical hosts: docs, distinct
    hosts, total chars per registrable domain. Block-local partials
    over (domain, host) before ONE groupby on the bounded domain key —
    the map-side combine keeps the shuffle at O(domains x hosts), not
    O(corpus)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        canon = canonicalize_urls(pa.array(synthesize_messy_urls(ids)))
        g = (
            pa.table(
                {
                    "domain": canon["domain"],
                    "host": canon["host"],
                    "n_chars": pc.cast(t["n_chars"], pa.int64()),
                }
            )
            .group_by(["domain", "host"])
            .aggregate([("n_chars", "sum"), ("n_chars", "count")])
        )
        return g.rename_columns(["domain", "host", "sum_chars", "n_docs"])

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "domain": [df["domain"].iloc[0]],
                "n_docs": np.int64(df["n_docs"].sum()),
                "n_hosts": np.int64(df["host"].nunique()),
                "sum_chars": np.int64(df["sum_chars"].sum()),
            }
        )

    parts = docs.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("domain").map_groups(merge, batch_format="pandas")


SQL_HOST_STATS = f"""
WITH {_sql_url_fields()},
d AS (SELECT c.doc_id, c.domain, c.host, n_chars
      FROM c JOIN documents USING (doc_id))
SELECT domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM d GROUP BY domain ORDER BY domain
"""


# ---------------------------------------------------------------------------
# robots-style per-domain prefix filter
# ---------------------------------------------------------------------------
# Each registrable domain publishes one Disallow path prefix (the
# robots.txt shape); the rule table is synthesized deterministically
# from (host_id, tld) so the SQL oracle re-derives it arithmetically.
# The ENGINE does the real crawl-side work: parse + canonicalize the
# messy URL, look the rule up by the PARSED domain string (broadcast —
# a real robots rule set is small by construction), vectorized prefix
# match on the canonical path, then a map-side-combined count rollup.

_S_ROBOT = 240
_PREFIX_MOD = 20  # disallowed prefix "/p{0..19}" — true prefix
#                   semantics: "/p1" also blocks "/p10".."/p19"


def robots_rules() -> tuple[np.ndarray, np.ndarray]:
    """(sorted domains, aligned disallow prefixes) for every
    (host_id, tld) pair — 150 rows, the broadcast side."""
    h = np.repeat(np.arange(_N_HOSTS, dtype=np.uint64), len(_TLDS))
    t = np.tile(np.arange(len(_TLDS), dtype=np.uint64), _N_HOSTS)
    dom = np.char.add(
        np.char.add("site", h.astype("U4")),
        np.char.add(".", np.take(np.array(_TLDS), t.astype(np.int64))),
    )
    j = _uint(h * np.uint64(len(_TLDS)) + t, _S_ROBOT, SEED, _PREFIX_MOD)
    pre = np.char.add("/p", j.astype("U4"))
    order = np.argsort(dom)
    return dom[order], pre[order]


def q_robots_filter(sf_dir: str):
    """Per-domain allowed/blocked page counts under the domain's
    Disallow prefix. Zero shuffles until ONE small groupby over the
    bounded domain key space."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    domains, prefixes = robots_rules()

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        canon = canonicalize_urls(pa.array(synthesize_messy_urls(ids)))
        dom = np.asarray(canon["domain"].to_pylist(), dtype="U24")
        path = np.asarray(canon["path"].to_pylist(), dtype="U24")
        idx = np.searchsorted(domains, dom)
        blocked = np.char.startswith(path, prefixes[idx]).astype(np.int64)
        g = (
            pa.table(
                {
                    "domain": canon["domain"],
                    "n_blocked": blocked,
                    "n_allowed": 1 - blocked,
                }
            )
            .group_by("domain")
            .aggregate([("n_blocked", "sum"), ("n_allowed", "sum")])
        )
        return g.rename_columns(["domain", "n_blocked", "n_allowed"])

    from ray.data.aggregate import Sum

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(
            Sum("n_blocked", alias_name="n_blocked"),
            Sum("n_allowed", alias_name="n_allowed"),
        )
    )


SQL_ROBOTS_FILTER = f"""
WITH {_sql_url_fields()},
rules AS (
  SELECT 'site' || h || '.' ||
         CASE t WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END AS domain,
         '/p' || ({_s_uint(f'CAST(h * {len(_TLDS)} + t AS UBIGINT)', _S_ROBOT, _PREFIX_MOD)})
           AS dis
  FROM range({_N_HOSTS}) r1(h), range({len(_TLDS)}) r2(t)
),
j AS (SELECT c.domain, starts_with(c.path, r.dis) AS blocked
      FROM c JOIN rules r USING (domain))
SELECT domain,
       CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
       CAST(SUM(CASE WHEN blocked THEN 0 ELSE 1 END) AS BIGINT) AS n_allowed
FROM j GROUP BY domain ORDER BY domain
"""


# ---------------------------------------------------------------------------
# crawl politeness schedule
# ---------------------------------------------------------------------------
# A polite crawler fetches at most SLOTS pages per host per round, so
# scheduling = rank pages WITHIN each host and assign round = rank //
# SLOTS. Host groups are bounded (a host's frontier fits a shard) but
# host COUNT is corpus-scale, so the per-key map_groups trap applies —
# the plan is ops/sharded.sharded_map_groups: ONE host-hash shuffle,
# then a single vectorized sort+cumcount pass per shard covering all
# of its hosts. Reference analogue: osm2gtfs's per-route trip ordering
# (creators/trips_creator* sorting stop_times within a trip) — grouped
# sequence assignment, generalized to the crawl frontier.

_CRAWL_SLOTS = 4


def q_crawl_schedule(sf_dir: str):
    """(doc_id, host, fetch_round): pages ranked by doc_id within
    their canonical host, SLOTS pages per host per round."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def hostof(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        canon = canonicalize_urls(pa.array(synthesize_messy_urls(ids)))
        return pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "host": canon["host"]}
        )

    hosted = docs.map_batches(hostof, batch_format="pyarrow")

    def schedule(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(["host", "doc_id"], kind="mergesort").copy(deep=False)
        out["fetch_round"] = (
            out.groupby("host", sort=False).cumcount().to_numpy(np.int64)
            // _CRAWL_SLOTS
        )
        return out

    return sharded_map_groups(hosted, "host", schedule)


SQL_CRAWL_SCHEDULE = f"""
WITH {_sql_url_fields()}
SELECT doc_id, host,
       CAST((ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id) - 1)
            // {_CRAWL_SLOTS} AS BIGINT) AS fetch_round
FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Crawl snapshot delta: the incremental-recrawl diff. Two crawl
# snapshots of the same URL space (each a ~90% sample, content version
# occasionally bumped between them — both derived deterministically
# from doc_id via splitmix streams) are FULL-OUTER joined on doc_id
# and every page classified added / removed / changed / unchanged.
# This is the op an incremental crawler runs before scheduling: what
# appeared, what vanished, what must be refetched.
#
# Reference semantics analogue: osm2gtfs's cache refresh
# (core/cache.py + --refresh-routes): compare the cached object set
# against a fresh Overpass pull and rebuild only what differs —
# lifted to a corpus-scale snapshot diff.
#
# Scale plan: each snapshot is a pruned projection (doc_id + one int
# version — the "content hash") so the shuffle carries ~16 bytes/row;
# the join is Ray Data's native hash-partitioned FULL OUTER
# (ops/joins.hash_join), classification a per-batch Arrow map after
# it. Absent-side versions use a -1 sentinel (never a valid version)
# so the output hash-compares deterministically.

_S_IN_A, _S_IN_B, _S_VER, _S_BUMP = 250, 251, 252, 253
_VER_MOD = 1000


def _snapshot(sf_dir: str, which: str):
    """Snapshot A or B as a Dataset of (doc_id, v_old|v_new)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    col = "v_old" if which == "a" else "v_new"
    s_in = _S_IN_A if which == "a" else _S_IN_B

    def derive(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = _uint(did, s_in, SEED, 10) != 0
        did = did[keep]
        ver = _uint(did, _S_VER, SEED, _VER_MOD)
        if which == "b":
            ver = ver + (_uint(did, _S_BUMP, SEED, 4) == 0).astype(np.int64)
        return pa.table({"doc_id": did.astype(np.int64), col: ver})

    return docs.map_batches(derive, batch_format="pyarrow")


def _delta_sharded(sf_dir: str, n_shards: int = 8):
    """Sharded full-outer plan: tag each snapshot with a side column,
    union, ONE doc_id-hash shuffle, then a vectorized side-pivot per
    shard (ops/sharded) — no join-aggregator actors, the cheap plan
    when per-execution fixed cost matters."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    def tag(side):
        def f(t: pa.Table) -> pa.Table:
            v = t["v_old" if side == 0 else "v_new"]
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "v": v,
                    "side": np.full(len(t), side, dtype=np.int64),
                }
            )

        return f

    both = _snapshot(sf_dir, "a").map_batches(
        tag(0), batch_format="pyarrow"
    ).union(_snapshot(sf_dir, "b").map_batches(tag(1), batch_format="pyarrow"))

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0][["doc_id", "v"]].rename(columns={"v": "v_old"})
        b = g[g["side"] == 1][["doc_id", "v"]].rename(columns={"v": "v_new"})
        m = a.merge(b, on="doc_id", how="outer")
        in_a, in_b = m["v_old"].notna(), m["v_new"].notna()
        m["v_old"] = m["v_old"].fillna(-1).astype(np.int64)
        m["v_new"] = m["v_new"].fillna(-1).astype(np.int64)
        m["status"] = np.where(
            ~in_a,
            "added",
            np.where(
                ~in_b,
                "removed",
                np.where(m["v_old"] != m["v_new"], "changed", "unchanged"),
            ),
        )
        return m[["doc_id", "status", "v_old", "v_new"]]

    return sharded_map_groups(both, "doc_id", pivot, n_shards=n_shards)


def q_crawl_delta(sf_dir: str, num_partitions: int | None = None,
                  plan: str = "auto"):
    """(doc_id, status, v_old, v_new): full-outer diff of snapshots
    A and B; status in added/removed/changed/unchanged, absent side
    version = -1. plan: 'sharded' (union + one hash shuffle),
    'join' (Ray native full_outer hash join — the spill-safe path for
    corpus-scale diffs), or 'auto' (sharded under 2M docs)."""
    import pyarrow.parquet as pq

    from osm2gtfs_ray.ops.joins import hash_join

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    if plan == "auto":
        plan = "sharded" if n <= 2_000_000 and num_partitions is None else "join"
    if plan == "sharded":
        return _delta_sharded(sf_dir, n_shards=max(8, min(512, n // 250_000)))

    if num_partitions is None:
        # each join partition is a long-lived aggregator actor — size
        # the count to the data (~250k rows/partition) so small inputs
        # don't pay 16 actor spin-ups; a trillion-row diff passes its
        # own count (cluster-core multiple) explicitly.
        num_partitions = max(2, min(64, n // 250_000 + 1))

    joined = hash_join(
        _snapshot(sf_dir, "a"),
        _snapshot(sf_dir, "b"),
        "doc_id",
        join_type="full_outer",
        num_partitions=num_partitions,
    )

    def classify(t: pa.Table) -> pa.Table:
        # absent-side columns arrive null; fill BEFORE to_numpy so the
        # block dtype stays int64 whether or not it contains nulls
        in_a = pc.is_valid(t["v_old"]).to_numpy(zero_copy_only=False)
        in_b = pc.is_valid(t["v_new"]).to_numpy(zero_copy_only=False)
        vo_i = pc.fill_null(pc.cast(t["v_old"], pa.int64()), -1).to_numpy(
            zero_copy_only=False
        )
        vn_i = pc.fill_null(pc.cast(t["v_new"], pa.int64()), -1).to_numpy(
            zero_copy_only=False
        )
        status = np.where(
            ~in_a,
            "added",
            np.where(
                ~in_b,
                "removed",
                np.where(vo_i != vn_i, "changed", "unchanged"),
            ),
        )
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "status": pa.array(status, pa.string()),
                "v_old": vo_i,
                "v_new": vn_i,
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")


def _sql_crawl_delta() -> str:
    ver = _s_uint("did", _S_VER, _VER_MOD)
    bump = _s_uint("did", _S_BUMP, 4)
    return f"""
d AS (SELECT CAST(doc_id AS BIGINT) AS id, CAST(doc_id AS UBIGINT) AS did
      FROM documents),
snap_a AS (SELECT id, ({ver}) AS v_old FROM d
           WHERE ({_s_uint('did', _S_IN_A, 10)}) <> 0),
snap_b AS (SELECT id, ({ver}) + CASE WHEN ({bump}) = 0 THEN 1 ELSE 0 END
                  AS v_new
           FROM d WHERE ({_s_uint('did', _S_IN_B, 10)}) <> 0)
SELECT COALESCE(a.id, b.id) AS doc_id,
       CASE WHEN a.id IS NULL THEN 'added'
            WHEN b.id IS NULL THEN 'removed'
            WHEN a.v_old <> b.v_new THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(COALESCE(a.v_old, -1) AS BIGINT) AS v_old,
       CAST(COALESCE(b.v_new, -1) AS BIGINT) AS v_new
FROM snap_a a FULL OUTER JOIN snap_b b ON a.id = b.id
ORDER BY doc_id"""


SQL_CRAWL_DELTA = f"WITH {_sql_crawl_delta()}"


# ---------------------------------------------------------------------------
# redirect-chain resolution: pointer doubling over a functional graph
# ---------------------------------------------------------------------------

# A deterministic fraction of pages are HTTP redirects; each redirect
# points at a STRICTLY SMALLER doc_id (target = hash % id), so the
# functional graph is acyclic by construction and every chain
# terminates at a non-redirect page. Node 0 is always terminal (no
# valid smaller target). The engine resolves every page to its final
# landing page + exact hop count with pointer doubling (ops/jump.py,
# O(log max_chain) rounds); the oracle follows the chains one hop at
# a time with a recursive CTE over the SAME arithmetically re-derived
# pointer table — any error in the doubling update, the self-join, or
# the hop accounting breaks the value hash.
_S_REDIR, _S_RTGT = 310, 311
_REDIR_PCT = 35  # percent of pages (id > 0) that redirect


def q_redirect_resolve(sf_dir: str):
    """(node, terminal, hops) for every page: the canonical landing
    page after following the synthesized redirect chain.

    Pointer doubling (ops/jump.py): broadcast plan below 2M nodes,
    Dataset self-join doubling above — both exact-integer, both
    raising (never silently partial) if the chain budget is exhausted.

    Reference semantics analogue: osm2gtfs's parent-station alias
    walk (`osm2gtfs/core/elements.py`) follows one pointer per stop;
    this is the same resolution at crawl scale in log rounds.
    """
    import pyarrow.parquet as pq

    from osm2gtfs_ray.ops.jump import resolve_pointers
    from osm2gtfs_ray.sources.pages import _uhash

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def ptr_batch(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        redir = (ids > np.uint64(0)) & (
            _uint(ids, _S_REDIR, SEED, 100) < _REDIR_PCT
        )
        tgt = (
            _uhash(ids, _S_RTGT, SEED) % np.maximum(ids, np.uint64(1))
        ).astype(np.int64)
        node = ids.astype(np.int64)
        return pa.table({"node": node, "ptr": np.where(redir, tgt, node)})

    ptrs = docs.map_batches(ptr_batch, batch_format="pyarrow")
    return resolve_pointers(ptrs, n)


def _sql_redirect_resolve() -> str:
    from osm2gtfs_ray.pipelines.graph_queries import _s_uint_mod

    tgt = _s_uint_mod("did", _S_RTGT, "GREATEST(node, 1)")
    return f"""
WITH RECURSIVE
ids AS (SELECT CAST(doc_id AS BIGINT) AS node,
               CAST(doc_id AS UBIGINT) AS did
        FROM documents),
ptr AS (
  SELECT node,
         CASE WHEN node > 0 AND ({_s_uint('did', _S_REDIR, 100)}) < {_REDIR_PCT}
              THEN CAST(({tgt}) AS BIGINT)
              ELSE node END AS tgt
  FROM ids),
walk(node, cur, hops) AS (
  SELECT node, tgt, CASE WHEN tgt = node THEN 0 ELSE 1 END FROM ptr
  UNION ALL
  SELECT w.node, p.tgt, w.hops + 1
  FROM walk w JOIN ptr p ON w.cur = p.node
  WHERE p.tgt <> p.node)
SELECT w.node AS node, w.cur AS terminal, CAST(w.hops AS BIGINT) AS hops
FROM walk w JOIN ptr p ON w.cur = p.node
WHERE p.tgt = p.node
ORDER BY node"""


SQL_REDIRECT_RESOLVE = _sql_redirect_resolve()
