"""URL canonicalization kernel tests (pure Arrow — no Ray session).

The oracle gate (`url_canonicalize`, `host_stats`) verifies the full
pipeline against the SQL re-derivation; these tests pin the operator's
field-by-field semantics on hand-written messy URLs so a kernel change
that happens to cancel out in the synthetic stream still fails here.
"""

import numpy as np
import pyarrow as pa
import pytest

from osm2gtfs_ray.pipelines.web_queries import (
    canonicalize_urls,
    synthesize_messy_urls,
)


def canon(url: str) -> dict:
    t = canonicalize_urls(pa.array([url]))
    return {c: t[c][0].as_py() for c in t.column_names}


class TestCanonicalize:
    def test_scheme_host_lowered_www_stripped(self):
        r = canon("HTTPS://WWW.Site7.COM/p1")
        assert r["url"] == "https://site7.com/p1"
        assert r["host"] == "site7.com"
        assert r["domain"] == "site7.com"

    def test_default_ports_dropped_explicit_kept(self):
        assert canon("http://a.com:80/x")["url"] == "http://a.com/x"
        assert canon("https://a.com:443/x")["url"] == "https://a.com/x"
        assert canon("http://a.com:8080/x")["url"] == "http://a.com:8080/x"
        # :443 is NOT default for http
        assert canon("http://a.com:443/x")["url"] == "http://a.com:443/x"

    def test_trailing_slash_and_empty_path(self):
        assert canon("http://a.com/p1/")["url"] == "http://a.com/p1"
        assert canon("http://a.com")["url"] == "http://a.com/"
        assert canon("http://a.com/")["url"] == "http://a.com/"

    def test_query_sorted_tracking_dropped_fragment_dropped(self):
        r = canon("http://a.com/p?ref=3&utm_source=news&id=9&q=2#top")
        assert r["url"] == "http://a.com/p?id=9&q=2&ref=3"
        assert r["n_params"] == 3
        assert r["n_tracking"] == 1

    def test_only_tracking_params_yields_bare_url(self):
        r = canon("http://a.com/p?utm_source=news#frag")
        assert r["url"] == "http://a.com/p"
        assert r["n_params"] == 0
        assert r["n_tracking"] == 1

    def test_subdomain_kept_domain_is_registrable(self):
        r = canon("https://m3.site12.org/p5/q7")
        assert r["host"] == "m3.site12.org"
        assert r["domain"] == "site12.org"

    def test_www_plus_subdomain(self):
        # www. strip is prefix-only; inner subdomain survives
        r = canon("http://www.m1.site0.net/")
        assert r["host"] == "m1.site0.net"
        assert r["domain"] == "site0.net"


class TestSyntheticStream:
    def test_deterministic(self):
        ids = np.arange(64, dtype=np.uint64)
        a = synthesize_messy_urls(ids)
        b = synthesize_messy_urls(ids)
        assert (a == b).all()

    def test_messy_variants_all_canonicalize_to_parseable(self):
        ids = np.arange(512, dtype=np.uint64)
        t = canonicalize_urls(pa.array(synthesize_messy_urls(ids)))
        urls = t["url"].to_pylist()
        assert all(u.startswith(("http://", "https://")) for u in urls)
        # canonical forms carry no uppercase, www., default port,
        # tracking param, or fragment
        assert not any(
            "www." in u or "utm_" in u or "#" in u or ":80/" in u
            or ":443/" in u or u != u.lower()
            for u in urls
        )
        # idempotence: canonicalizing canonical output is a fixpoint
        again = canonicalize_urls(t["url"].combine_chunks())
        assert again["url"].to_pylist() == urls

    def test_stream_exercises_every_branch(self):
        ids = np.arange(512, dtype=np.uint64)
        messy = synthesize_messy_urls(ids).tolist()
        assert any("HTTP" in m.split("://")[0] for m in messy)
        assert any("www." in m.lower() for m in messy)
        assert any(":8080" in m for m in messy)
        assert any("#top" in m for m in messy)
        assert any("utm_source" in m for m in messy)


class TestCrawlSchedule:
    def test_rounds_are_per_host_dense_blocks(self, ray_session):
        from osm2gtfs_ray.pipelines.web_queries import (
            _CRAWL_SLOTS,
            q_crawl_schedule,
        )

        got = (
            q_crawl_schedule("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values(["host", "doc_id"])
            .reset_index(drop=True)
        )
        # within each host, rounds follow cumcount // SLOTS exactly
        want = got.groupby("host", sort=False).cumcount() // _CRAWL_SLOTS
        assert (got["fetch_round"].to_numpy() == want.to_numpy()).all()
        # every round of a host is full except possibly the last
        sizes = got.groupby(["host", "fetch_round"]).size()
        last = got.groupby("host")["fetch_round"].max()
        for (h, r), n in sizes.items():
            if r < last[h]:
                assert n == _CRAWL_SLOTS
            else:
                assert 1 <= n <= _CRAWL_SLOTS
        # one row per document
        assert got["doc_id"].is_unique


class TestCrawlDelta:
    """Snapshot-diff semantics + plan equivalence (sharded union vs
    Ray native full_outer hash join). The SQL gate (FULL OUTER JOIN
    oracle) is the bit-exact check; these pin the classification rules
    and that both distributed plans agree row-for-row."""

    @pytest.fixture(scope="class")
    def docs_dir(self, tmp_path_factory):
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("delta")
        pq.write_table(
            pa.table({"doc_id": np.arange(400, dtype=np.int64)}),
            d / "documents.parquet",
        )
        return str(d)

    def test_plan_equivalence(self, ray_session, docs_dir):
        from osm2gtfs_ray.pipelines.web_queries import q_crawl_delta

        def canon(df):
            return df.sort_values("doc_id").reset_index(drop=True)

        a = canon(q_crawl_delta(docs_dir, plan="sharded").to_pandas())
        b = canon(q_crawl_delta(docs_dir, plan="join").to_pandas())
        assert a.equals(b.astype(a.dtypes.to_dict()))

    def test_classification_rules(self, ray_session, docs_dir):
        from osm2gtfs_ray.pipelines.web_queries import (
            _S_BUMP,
            _S_IN_A,
            _S_IN_B,
            _S_VER,
            _VER_MOD,
            SEED,
            q_crawl_delta,
        )
        from osm2gtfs_ray.sources.pages import _uint

        got = q_crawl_delta(docs_dir).to_pandas().set_index("doc_id")
        did = np.arange(400, dtype=np.uint64)
        in_a = _uint(did, _S_IN_A, SEED, 10) != 0
        in_b = _uint(did, _S_IN_B, SEED, 10) != 0
        ver = _uint(did, _S_VER, SEED, _VER_MOD)
        bump = (_uint(did, _S_BUMP, SEED, 4) == 0).astype(np.int64)
        # row set = union of the snapshots
        assert set(got.index) == set(np.nonzero(in_a | in_b)[0].tolist())
        for i in got.index:
            row = got.loc[i]
            if not in_a[i]:
                assert row["status"] == "added" and row["v_old"] == -1
            elif not in_b[i]:
                assert row["status"] == "removed" and row["v_new"] == -1
            elif bump[i]:
                assert row["status"] == "changed"
                assert row["v_new"] == row["v_old"] + 1 == ver[i] + 1
            else:
                assert row["status"] == "unchanged"
                assert row["v_old"] == row["v_new"] == ver[i]
