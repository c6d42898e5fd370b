"""Corpus-prep operators: sequence packing, contamination screen,
Misra-Gries heavy hitters (exact + lossy-regime error bound)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data

    return ray.data


def _write_docs(tmpdir: str, texts: list[str]) -> str:
    os.makedirs(tmpdir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(tmpdir, "documents.parquet"),
    )
    return tmpdir


class TestSeqPack:
    def test_matches_brute_cumsum(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.corpus_queries import q_seq_pack

        rng = np.random.default_rng(2)
        texts = [
            " ".join(f"w{j}" for j in range(rng.integers(1, 40)))
            for _ in range(80)
        ]
        sf = _write_docs(str(tmp_path), texts)
        got = q_seq_pack(sf, capacity=64).to_pandas().sort_values("doc_id")
        ntok = np.array([len(t.split()) for t in texts])
        start = np.cumsum(ntok) - ntok
        assert got["n_tokens"].tolist() == ntok.tolist()
        assert got["start_offset"].tolist() == start.tolist()
        assert got["seq_id"].tolist() == (start // 64).tolist()
        want_nseq = (start + ntok - 1) // 64 - start // 64 + 1
        assert got["n_seqs"].tolist() == want_nseq.tolist()


class TestContamination:
    def test_flags_exact_overlap_only(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.corpus_queries import q_contamination

        bench = "alpha beta gamma delta epsilon zeta"  # doc 0 → benchmark
        dirty = "x y alpha beta gamma delta epsilon q r s"  # shares a 5-gram
        clean = "alpha beta gamma q delta epsilon zeta eta theta"  # no 5-gram
        texts = [bench, dirty, clean]
        sf = _write_docs(str(tmp_path), texts)
        got = (
            q_contamination(sf, n=5)
            .to_pandas()
            .sort_values("doc_id")
            .set_index("doc_id")
        )
        assert 0 not in got.index  # benchmark docs excluded
        assert got.loc[1, "flagged"] == 1
        assert got.loc[1, "n_contaminated"] == 1  # the shared 5-gram
        assert got.loc[1, "n_grams"] == 6
        assert got.loc[2, "flagged"] == 0
        assert got.loc[2, "n_grams"] == 5


class TestMisraGries:
    def test_compress_keeps_at_most_k_with_lower_bounds(self):
        from osm2gtfs_ray.ops.sketch import mg_compress

        df = pd.DataFrame(
            {"term": [f"t{i}" for i in range(10)], "n": np.arange(1, 11)}
        )
        out = mg_compress(df, k=3)
        assert len(out) <= 3
        merged = out.set_index("term")["n"]
        for t, true_n in df.set_index("term")["n"].items():
            est = int(merged.get(t, 0))
            assert est <= true_n
            assert est >= true_n - df["n"].sum() / 4  # N/(k+1)

    def test_lossy_regime_error_bound(self, rd):
        from osm2gtfs_ray.ops.sketch import mg_heavy_hitters

        rng = np.random.default_rng(11)
        # zipf-ish stream over a vocab far bigger than capacity
        vocab = [f"v{i}" for i in range(400)]
        probs = 1.0 / np.arange(1, 401)
        probs /= probs.sum()
        words = rng.choice(vocab, size=20_000, p=probs)
        true = pd.Series(words).value_counts()
        n_total = len(words)
        k = 16
        docs = [
            {"doc_id": i, "text": " ".join(words[i * 100 : (i + 1) * 100])}
            for i in range(200)
        ]
        ds = rd.from_items(docs).repartition(8)
        est = mg_heavy_hitters(ds, "text", k=k).set_index("term")["n_est"]
        for t, tn in true.items():
            e = int(est.get(t, 0))
            assert e <= tn
            assert e >= tn - n_total / (k + 1), (t, e, tn)
        # every term heavier than N/(k+1) must survive
        for t, tn in true[true > n_total / (k + 1)].items():
            assert int(est.get(t, 0)) > 0


class TestChunkDocs:
    def test_coverage_overlap_and_reconstruction(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.corpus_queries import q_chunk_docs

        texts = [
            " ".join(f"w{i}" for i in range(n))
            for n in (0, 1, 10, 64, 65, 112, 113, 200)
        ]
        sf = _write_docs(str(tmp_path / "sf"), texts)
        got = (
            q_chunk_docs(sf, capacity=64, stride=48)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        for did, text in enumerate(texts):
            toks = text.split()
            rows = got[got["doc_id"] == did]
            if not toks:
                assert len(rows) == 0
                continue
            # chunk ids are 0..n-1, starts stride apart, tail covered
            assert rows["chunk_id"].tolist() == list(range(len(rows)))
            assert (rows["start_tok"] == rows["chunk_id"] * 48).all()
            last = rows.iloc[-1]
            assert last["start_tok"] + last["n_tok"] == len(toks)
            # every chunk's text reconstructs its token span exactly
            for _, r in rows.iterrows():
                want = " ".join(toks[r["start_tok"]: r["start_tok"] + r["n_tok"]])
                assert r["chunk_text"] == want
            # every token index is covered by at least one chunk
            cov = np.zeros(len(toks), dtype=bool)
            for _, r in rows.iterrows():
                cov[r["start_tok"]: r["start_tok"] + r["n_tok"]] = True
            assert cov.all()

    def test_partition_invariance(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.corpus_queries import q_chunk_docs

        texts = [" ".join(f"t{i}x{j}" for j in range(20 + 13 * i)) for i in range(40)]
        sf = _write_docs(str(tmp_path / "sf"), texts)
        a = q_chunk_docs(sf).to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        import ray.data  # noqa: F401  (repartition path)
        from osm2gtfs_ray.sources.tables import read_table  # noqa: F401

        b = q_chunk_docs(sf).to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestConsistentSample:
    def test_partition_invariant_topk(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.corpus_queries import (
            SAMPLE_K, q_consistent_sample,
        )

        texts = [f"doc {i}" for i in range(500)]
        sf = _write_docs(str(tmp_path / "sf"), texts)
        a = q_consistent_sample(sf).to_pandas()
        b = q_consistent_sample(sf).to_pandas()
        pd.testing.assert_frame_equal(a, b)
        assert len(a) == SAMPLE_K
        # priorities are the k smallest over the whole corpus
        from osm2gtfs_ray.sources.pages import _uhash

        all_pri = (_uhash(np.arange(500, dtype=np.uint64), 12, 42)
                   >> np.uint64(1)).astype(np.int64)
        want = np.sort(all_pri)[:SAMPLE_K]
        assert np.array_equal(np.sort(a["priority"].to_numpy()), want)

    def test_growth_stability(self, rd, tmp_path):
        """Adding documents only ever replaces members with
        smaller-priority newcomers — surviving members keep identical
        (doc_id, priority) rows."""
        from osm2gtfs_ray.pipelines.corpus_queries import q_consistent_sample

        small = _write_docs(str(tmp_path / "a"), [f"d {i}" for i in range(300)])
        big = _write_docs(str(tmp_path / "b"), [f"d {i}" for i in range(500)])
        a = q_consistent_sample(small).to_pandas()
        b = q_consistent_sample(big).to_pandas()
        merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
        assert (merged["priority_a"] == merged["priority_b"]).all()
        assert b["priority"].max() <= a["priority"].max()


class TestBM25:
    def test_matches_brute(self, ray_session):
        """Brute-force BM25 (floats, textbook form) must agree with the
        engine's cleared-denominator integer ranking."""
        import collections

        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.text_queries import (
            _BM25_K,
            _BM25_QN,
            q_bm25_topk,
        )

        sf = "/root/testdata/sf0.001"
        got = (
            q_bm25_topk(sf)
            .to_pandas()
            .sort_values(["term", "rank"])
            .reset_index(drop=True)
        )
        tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        toks = {
            did: [w for w in txt.split() if w]
            for did, txt in zip(
                tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()
            )
        }
        df = collections.Counter()
        for ws in toks.values():
            df.update(set(ws))
        qterms = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:_BM25_QN]
        total = sum(len(ws) for ws in toks.values())
        n = len(toks)
        avgdl = total / n
        k1, b = 1.2, 0.75
        for term, _ in qterms:
            scored = []
            for did, ws in toks.items():
                tf = ws.count(term)
                if tf:
                    s = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
                    scored.append((-s, did, tf, len(ws)))
            scored.sort()
            sub = got[got["term"] == term]
            assert len(sub) == min(_BM25_K, len(scored))
            for row, (_, did, tf, dl) in zip(sub.itertuples(), scored):
                assert row.doc_id == did
                assert row.tf == tf
                assert row.dl == dl


class TestWeightedSample:
    """Priority-sample properties: partition invariance, weight bias,
    scalar-reference agreement. SQL gate: `weighted_sample`."""

    def test_partition_invariant_and_biased(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.corpus_queries import (
            WSAMPLE_SCALE,
            WSAMPLE_STREAM,
            WSAMPLE_U_MOD,
            q_weighted_sample,
        )
        from osm2gtfs_ray.sources.pages import _uint

        n = 2000
        rng = np.random.default_rng(5)
        # half light (1 token), half heavy (40 tokens)
        texts = [
            "w" if i % 2 == 0 else " ".join(["w"] * 40) for i in range(n)
        ]
        pq.write_table(
            pa.table(
                {"doc_id": np.arange(n, dtype=np.int64),
                 "text": pa.array(texts, pa.string())}
            ),
            tmp_path / "documents.parquet",
        )
        got = q_weighted_sample(str(tmp_path), k=200).reset_index(drop=True)

        # scalar reference over the whole table
        w = np.where(np.arange(n) % 2 == 0, 2, 41).astype(np.int64)
        u = _uint(np.arange(n, dtype=np.uint64), WSAMPLE_STREAM, 42,
                  WSAMPLE_U_MOD)
        pri = (u * np.int64(WSAMPLE_SCALE)) // w
        order = np.lexsort((np.arange(n), pri))[:200]
        assert got["doc_id"].tolist() == sorted(
            order.tolist(),
            key=lambda i: (int(pri[i]), i),
        )
        # heavy docs are strongly overrepresented (w ratio ~20x)
        heavy = (got["doc_id"] % 2 == 1).sum()
        assert heavy > 150


class TestBalancedMix:
    """sqrt-quota rebalance: head language downsampled toward the
    quota, membership bit-stable. SQL gate: `balanced_mix`."""

    def test_quota_and_determinism(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.corpus_queries import (
            MIX_FACTOR,
            _isqrt64,
            q_balanced_mix,
        )

        n_head, n_tail = 3000, 50
        langs = ["en"] * n_head + ["xx"] * n_tail
        pq.write_table(
            pa.table(
                {"doc_id": np.arange(len(langs), dtype=np.int64),
                 "lang": pa.array(langs, pa.string())}
            ),
            tmp_path / "documents.parquet",
        )
        a = q_balanced_mix(str(tmp_path)).to_pandas()
        b = q_balanced_mix(str(tmp_path)).to_pandas()
        assert a.equals(b)  # bit-stable
        en = a[a["lang"] == "en"].iloc[0]
        xx = a[a["lang"] == "xx"].iloc[0]
        q_en = MIX_FACTOR * int(_isqrt64(np.array([n_head]))[0])
        assert en["quota"] == q_en and en["quota"] < n_head  # downsampled
        assert xx["quota"] == n_tail  # tail kept whole
        assert xx["n_selected"] <= n_tail
        # selection tracks quota within sampling noise (binomial ~5 sigma)
        import math
        sd = math.sqrt(q_en)
        assert abs(int(en["n_selected"]) - q_en) < 5 * sd


class TestLmPerplexity:
    """Bigram-LM perplexity filter vs a scalar Counter reference:
    exact lp table, exact integer scoring, OOV floor on held-out
    bigrams, degenerate docs (empty / single-token) score 0.
    SQL gate: `lm_perplexity` (snapshot-joining oracle)."""

    def test_matches_counter_reference(self, rd, tmp_path):
        import math
        import re
        from collections import Counter

        from osm2gtfs_ray.pipelines.corpus_queries import (
            LM_OOV_FP,
            LM_PPL_THR_FP,
            LM_SCALE,
            q_lm_perplexity,
        )

        rng = np.random.default_rng(11)
        vocab = [f"w{j}" for j in range(30)]
        texts = []
        for i in range(40):
            if i == 7:
                texts.append("")            # empty doc: 0 bigrams
            elif i == 13:
                texts.append("lonely")      # single token: 0 bigrams
            elif i == 20:
                # held-out doc (20 % 5 == 0) full of unseen tokens:
                # every bigram hits the OOV floor
                texts.append("zz1 zz2 zz3 zz4")
            else:
                texts.append(" ".join(rng.choice(vocab, size=12)))
        _write_docs(str(tmp_path), texts)

        got = (
            q_lm_perplexity(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

        # scalar reference: train bigram counts on doc_id % 5 != 0
        big = Counter()
        ctx = Counter()
        for i, t in enumerate(texts):
            if i % 5 == 0:
                continue
            ws = re.split(r"\s+", t.strip()) if t.strip() else []
            for a, b in zip(ws, ws[1:]):
                big[(a, b)] += 1
                ctx[a] += 1
        lp = {
            k: int(np.round(np.log(c / ctx[k[0]]) * LM_SCALE))
            for k, c in big.items()
        }
        for i, t in enumerate(texts):
            ws = re.split(r"\s+", t.strip()) if t.strip() else []
            pairs = list(zip(ws, ws[1:]))
            nll = -sum(lp.get(p, LM_OOV_FP) for p in pairs)
            row = got.iloc[i]
            assert row["doc_id"] == i
            assert row["n_bigrams"] == len(pairs)
            assert row["nll_fp"] == nll
            assert row["ppl_flag"] == int(nll > LM_PPL_THR_FP * len(pairs))

        # the all-OOV held-out doc is flagged; degenerate docs are not
        assert got.iloc[20]["ppl_flag"] == 1
        assert got.iloc[20]["nll_fp"] == -3 * LM_OOV_FP
        assert got.iloc[7]["n_bigrams"] == 0 and got.iloc[7]["ppl_flag"] == 0
        assert got.iloc[13]["n_bigrams"] == 0 and got.iloc[13]["ppl_flag"] == 0

    def test_deterministic_across_runs(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.corpus_queries import q_lm_perplexity

        rng = np.random.default_rng(3)
        vocab = [f"t{j}" for j in range(20)]
        _write_docs(
            str(tmp_path),
            [" ".join(rng.choice(vocab, size=15)) for _ in range(30)],
        )
        a = q_lm_perplexity(str(tmp_path)).to_pandas().sort_values("doc_id")
        b = q_lm_perplexity(str(tmp_path)).to_pandas().sort_values("doc_id")
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
