"""Unit tests for the relational op library and text/dedup/ANN stages."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import osm2gtfs_ray.ops.joins as oj
from osm2gtfs_ray.ops.dedupe import keep_first, keep_top_k, distinct
from osm2gtfs_ray.stages.dedup import (
    MinHasher,
    SimHasher,
    lsh_candidate_pairs,
    shingle_hashes,
    verify_jaccard,
)
from osm2gtfs_ray.stages import ann as ann_mod


@pytest.fixture
def rd(ray_session):
    import ray.data

    return ray.data


class TestJoins:
    def test_broadcast_inner_join(self, rd):
        big = rd.from_items([{"k": i % 3, "v": i} for i in range(100)])
        small = pa.table({"k": [0, 1], "name": ["a", "b"]})
        out = oj.broadcast_join(big, small, keys="k").to_pandas()
        assert len(out) == 67  # k==2 rows dropped
        assert set(out.columns) == {"k", "v", "name"}

    def test_broadcast_left_join(self, rd):
        big = rd.from_items([{"k": i % 3, "v": i} for i in range(9)])
        small = pa.table({"k": [0], "name": ["a"]})
        out = oj.broadcast_join(big, small, keys="k", join_type="left outer").to_pandas()
        assert len(out) == 9
        assert out["name"].isna().sum() == 6

    def test_semi_anti_partition(self, rd):
        big = rd.from_items([{"k": i} for i in range(10)])
        small = pa.table({"k": [1, 3, 5]})
        semi = oj.broadcast_semi(big, small, key="k").to_pandas()
        anti = oj.broadcast_anti(big, small, key="k").to_pandas()
        assert sorted(semi["k"]) == [1, 3, 5]
        assert sorted(anti["k"]) == [0, 2, 4, 6, 7, 8, 9]

    def test_hash_join_matches_pandas(self, rd):
        left = rd.from_items([{"k": i % 5, "l": i} for i in range(50)])
        right = rd.from_items([{"k": i % 5, "r": i * 10} for i in range(20)])
        got = oj.hash_join(left, right, keys="k", num_partitions=4).to_pandas()
        want = pd.merge(
            pd.DataFrame({"k": [i % 5 for i in range(50)], "l": range(50)}),
            pd.DataFrame({"k": [i % 5 for i in range(20)], "r": [i * 10 for i in range(20)]}),
            on="k",
        )
        assert len(got) == len(want)
        a = got.sort_values(["k", "l", "r"]).reset_index(drop=True)
        b = want.sort_values(["k", "l", "r"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a[["k", "l", "r"]], b[["k", "l", "r"]])


class TestDedupe:
    def test_keep_first_deterministic(self, rd):
        rows = [{"k": i % 3, "ord": 10 - i, "v": i} for i in range(10)]
        out = keep_first(rd.from_items(rows), key="k", order_by=["ord", "v"]).to_pandas()
        assert len(out) == 3
        # per key, the row with smallest (ord, v)
        want = (
            pd.DataFrame(rows).sort_values(["ord", "v"]).groupby("k").head(1)
        )
        got = out.sort_values("k").reset_index(drop=True)
        want = want.sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["k", "ord", "v"]], want[["k", "ord", "v"]])

    def test_keep_top_k_matches_pandas_rank(self, rd):
        rng = np.random.default_rng(5)
        rows = [
            {"k": int(rng.integers(0, 7)), "ord": int(rng.integers(0, 50)), "v": i}
            for i in range(200)
        ]
        out = keep_top_k(
            rd.from_items(rows), key="k", order_by=["ord", "v"], k=3
        ).to_pandas()
        df = pd.DataFrame(rows)
        df["rnk"] = (
            df.sort_values(["ord", "v"]).groupby("k").cumcount() + 1
        )
        want = df[df["rnk"] <= 3]
        a = out.sort_values(["k", "rnk"]).reset_index(drop=True)
        b = want.sort_values(["k", "rnk"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a[["k", "ord", "v", "rnk"]], b[["k", "ord", "v", "rnk"]])

    def test_distinct(self, rd):
        ds = rd.from_items([{"a": i % 2, "b": i % 3} for i in range(30)])
        out = distinct(ds, ["a", "b"]).to_pandas()
        assert len(out) == 6


class TestRangeJoin:
    def test_overlapping_windows_brute_parity(self, rd):
        from osm2gtfs_ray.ops.range_join import range_join

        rng = np.random.default_rng(7)
        ts = rng.integers(0, 1000, 300)
        facts = rd.from_arrow(
            pa.table({"fact_id": np.arange(300, dtype=np.int64), "ts": ts})
        )
        # irregular, overlapping, duplicated-start intervals
        starts = np.array([0, 0, 50, 100, 100, 400, 650, 980], dtype=np.int64)
        ends = np.array([100, 30, 300, 101, 500, 401, 660, 2000], dtype=np.int64)
        ranges = pa.table(
            {
                "range_id": pa.array(np.arange(8, dtype=np.int64)),
                "start": pa.array(starts),
                "end": pa.array(ends),
            }
        )
        out = range_join(facts, ranges, ts_col="ts").to_pandas()
        got = set(zip(out["fact_id"], out["range_id"]))
        want = {
            (f, r)
            for f in range(300)
            for r in range(8)
            if starts[r] <= ts[f] < ends[r]
        }
        assert got == want

    def test_no_match_and_empty(self, rd):
        from osm2gtfs_ray.ops.range_join import range_join

        facts = rd.from_items([{"ts": 5_000}])
        ranges = pa.table(
            {
                "range_id": pa.array([0], pa.int64()),
                "start": pa.array([0], pa.int64()),
                "end": pa.array([10], pa.int64()),
            }
        )
        assert range_join(facts, ranges, ts_col="ts").count() == 0
        empty = pa.table(
            {
                "range_id": pa.array([], pa.int64()),
                "start": pa.array([], pa.int64()),
                "end": pa.array([], pa.int64()),
            }
        )
        assert range_join(facts, empty, ts_col="ts").count() == 0

    def test_timestamp_columns(self, rd):
        import pandas as pd_

        from osm2gtfs_ray.ops.range_join import range_join

        t0 = pd_.Timestamp("2024-01-01")
        facts = rd.from_arrow(
            pa.table({"ts": pa.array([t0 + pd_.Timedelta(days=d) for d in (0, 5, 9)])})
        )
        ranges = pa.table(
            {
                "range_id": pa.array([0], pa.int64()),
                "start": pa.array([t0 + pd_.Timedelta(days=1)]),
                "end": pa.array([t0 + pd_.Timedelta(days=7)]),
            }
        )
        out = range_join(facts, ranges, ts_col="ts").to_pandas()
        assert len(out) == 1 and out["ts"].iloc[0] == t0 + pd_.Timedelta(days=5)


def test_bpe_token_count_matches_manual():
    from osm2gtfs_ray.stages.text import bpe_token_count_arrow

    col = pa.chunked_array(
        [["it's a test", "hello  world", "a1b2", "", "  ", "don't stop—now!"]]
    )
    # manual per GPT-2-ish pretokenizer: contraction split, letter runs,
    # digit runs, punct runs, whitespace runs (no lookahead)
    assert bpe_token_count_arrow(col).to_pylist() == [
        4,  # "it" "'s" " a" " test"
        3,  # "hello" "  " "world"  (double space = ws run token)
        4,  # "a" "1" "b" "2"
        0,
        1,  # whitespace run
        6,  # "don" "'t" " stop" "—" "now" "!"
    ]


def _jaccard(a: str, b: str, n=3) -> float:
    sa = set(shingle_hashes(a, n).tolist())
    sb = set(shingle_hashes(b, n).tolist())
    return len(sa & sb) / max(1, len(sa | sb))


class TestMinHash:
    WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()

    def _doc(self, i, mutate=0):
        rng = np.random.default_rng(i)
        ws = [self.WORDS[w] for w in rng.integers(0, 10, size=30)]
        for m in range(mutate):
            ws[m * 3 % 30] = "MUT%d_%d" % (i, m)
        return " ".join(ws)

    def test_signature_similarity_tracks_jaccard(self):
        mh = MinHasher(num_perm=128)
        a = self._doc(1)
        b = self._doc(1, mutate=3)  # near-dup
        c = self._doc(2)  # unrelated
        sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
        est_ab = (sa == sb).mean()
        est_ac = (sa == sc).mean()
        assert abs(est_ab - _jaccard(a, b)) < 0.15
        assert est_ac < 0.2

    def test_lsh_finds_near_dups(self, rd):
        docs = []
        for i in range(40):
            docs.append({"doc_id": 2 * i, "text": self._doc(i)})
            docs.append({"doc_id": 2 * i + 1, "text": self._doc(i, mutate=2)})
        ds = rd.from_items(docs)
        cand = lsh_candidate_pairs(ds, num_perm=64, n_bands=16)
        tbl = pa.table(
            {
                "doc_id": [d["doc_id"] for d in docs],
                "text": [d["text"] for d in docs],
            }
        )
        verified = verify_jaccard(cand, tbl, threshold=0.5).to_pandas()
        # the distributed (shuffle) plan must produce the identical pair set
        dist = verify_jaccard(cand, tbl, threshold=0.5, broadcast=False).to_pandas()
        key = ["a", "b", "jaccard_e6"]
        assert sorted(map(tuple, verified[key].values.tolist())) == sorted(
            map(tuple, dist[key].values.tolist())
        )
        got_pairs = set(zip(verified["a"], verified["b"]))
        # every planted near-dup pair with true jaccard >= .5 is found
        want = {
            (2 * i, 2 * i + 1)
            for i in range(40)
            if _jaccard(self._doc(i), self._doc(i, mutate=2)) >= 0.5
        }
        assert want, "fixture must contain near-dup pairs"
        recall = len(want & got_pairs) / len(want)
        assert recall >= 0.9
        # verified output never contains a below-threshold pair (no false positives)
        for a, b, j in zip(verified["a"], verified["b"], verified["jaccard_e6"]):
            assert j >= 500_000

    def test_ngram_jaccard_exact_vs_brute(self, rd):
        from osm2gtfs_ray.stages.dedup import ngram_jaccard_pairs

        docs = []
        for i in range(30):
            docs.append({"doc_id": 2 * i, "text": self._doc(i)})
            docs.append({"doc_id": 2 * i + 1, "text": self._doc(i, mutate=2)})
        docs.append({"doc_id": 1000, "text": "one two"})  # < n words
        docs.append({"doc_id": 1001, "text": "one two"})  # exact short dup
        docs.append({"doc_id": 1002, "text": ""})  # no shingles
        ds = rd.from_items(docs)
        got = ngram_jaccard_pairs(ds, n=3, threshold=0.5).to_pandas()

        # brute-force string-shingle reference (same semantics as the
        # operator docstring / SQL oracle)
        def grams(text):
            ws = text.lower().split()
            if not ws:
                return set()
            if len(ws) < 3:
                return {" ".join(ws)}
            return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

        sets = {d["doc_id"]: grams(d["text"]) for d in docs}
        want = []
        ids = sorted(sets)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                if not sets[a] or not sets[b]:
                    continue
                c = len(sets[a] & sets[b])
                u = len(sets[a] | sets[b])
                je6 = (c * 1_000_000) // u
                if je6 >= 500_000:
                    want.append((a, b, je6))
        got_t = sorted(map(tuple, got[["a", "b", "jaccard_e6"]].values.tolist()))
        assert got_t == sorted(want)
        assert (1000, 1001, 1_000_000) in got_t  # short-doc whole-text shingle

    def test_ngram_jaccard_hash_key_matches_string_key(self, rd):
        """key='hash' (the corpus-scale 8-byte shuffle key) must
        reproduce the string-keyed plan exactly — 64-bit collisions are
        negligible at fixture scale."""
        from osm2gtfs_ray.stages.dedup import ngram_jaccard_pairs

        docs = []
        for i in range(30):
            docs.append({"doc_id": 2 * i, "text": self._doc(i)})
            docs.append({"doc_id": 2 * i + 1, "text": self._doc(i, mutate=2)})
        docs.append({"doc_id": 1000, "text": "one two"})
        docs.append({"doc_id": 1001, "text": "one two"})
        docs.append({"doc_id": 1002, "text": ""})
        cols = ["a", "b", "jaccard_e6"]
        s = ngram_jaccard_pairs(rd.from_items(docs), n=3, threshold=0.5).to_pandas()
        h = ngram_jaccard_pairs(
            rd.from_items(docs), n=3, threshold=0.5, key="hash"
        ).to_pandas()
        assert sorted(map(tuple, s[cols].values.tolist())) == sorted(
            map(tuple, h[cols].values.tolist())
        )

    def test_ngram_jaccard_max_df_guards_hot_shingles(self, rd):
        from osm2gtfs_ray.stages.dedup import ngram_jaccard_pairs

        # every doc shares one hot shingle; only 0/1 are true near-dups
        docs = [{"doc_id": i, "text": "the hot shingle " + self._doc(i)} for i in range(10)]
        docs.append({"doc_id": 99, "text": docs[0]["text"]})
        ds = rd.from_items(docs)
        out = ngram_jaccard_pairs(ds, n=3, threshold=0.5, max_df=5).to_pandas()
        pairs = set(zip(out["a"], out["b"]))
        assert (0, 99) in pairs  # exact dup still found via its other shingles
        assert all(a != b for a, b in pairs)

    def test_simhash_deterministic_and_close_for_near_dups(self):
        sh = SimHasher()
        t = pa.table({"doc_id": [1, 2], "text": [self._doc(3), self._doc(3, mutate=1)]})
        out1 = sh(t)["simhash"].to_pylist()
        out2 = sh(t)["simhash"].to_pylist()
        assert out1 == out2
        ham = bin(out1[0] ^ out1[1]).count("1")
        assert ham <= 16  # near-dups land close in hamming space

    def test_popcount64_matches_python(self):
        from osm2gtfs_ray.stages.dedup import popcount64

        rng = np.random.default_rng(5)
        vals = rng.integers(0, 2**64, size=1000, dtype=np.uint64)
        vals[:4] = [0, 1, 2**63, 2**64 - 1]
        got = popcount64(vals)
        want = [bin(int(v)).count("1") for v in vals]
        assert got.tolist() == want

    def test_simhash_pairs_exact_vs_brute(self, rd):
        from osm2gtfs_ray.stages.dedup import SimHasher, simhash_pairs

        docs = []
        for i in range(40):
            docs.append({"doc_id": 2 * i, "text": self._doc(i)})
            docs.append({"doc_id": 2 * i + 1, "text": self._doc(i, mutate=1)})
        got = simhash_pairs(rd.from_items(docs), max_hamming=3, n_bands=4).to_pandas()
        got_t = sorted(map(tuple, got[["a", "b", "hamming"]].values.tolist()))
        # brute force over signatures: banding must lose NOTHING (pigeonhole)
        sigs = SimHasher()(
            pa.table(
                {
                    "doc_id": [d["doc_id"] for d in docs],
                    "text": [d["text"] for d in docs],
                }
            )
        )
        ids = sigs["doc_id"].to_pylist()
        sg = sigs["simhash"].to_pylist()
        want = sorted(
            (min(ids[i], ids[j]), max(ids[i], ids[j]), bin(sg[i] ^ sg[j]).count("1"))
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
            if bin(sg[i] ^ sg[j]).count("1") <= 3
        )
        assert got_t == want

    def test_simhash_pairs_rejects_unreachable_hamming(self, rd):
        from osm2gtfs_ray.stages.dedup import simhash_pairs

        with pytest.raises(ValueError):
            simhash_pairs(rd.from_items([{"doc_id": 1, "text": "x"}]),
                          max_hamming=4, n_bands=4)


class TestANN:
    def test_brute_topk_matches_numpy(self, rd):
        rng = np.random.default_rng(7)
        emb = rng.normal(size=(200, 16)).astype(np.float32)
        ds = rd.from_items(
            [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(200)]
        )
        q = emb[5].astype(np.float64)
        got = ann_mod.brute_topk(ds, q, k=7).to_pandas()
        m = emb.astype(np.float64)
        sims = m @ q / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
        sim_e6 = np.rint(sims * 1e6).astype(np.int64)
        order = np.lexsort((np.arange(200), -sim_e6))[:7]
        assert got["vec_id"].tolist() == order.tolist()

    def test_ivf_recall(self, rd):
        rng = np.random.default_rng(11)
        # clustered data so IVF pruning is meaningful
        centers = rng.normal(size=(8, 16)) * 5
        emb = np.concatenate(
            [centers[i % 8] + rng.normal(size=16) * 0.3 for i in range(400)]
        ).reshape(400, 16)
        ds = rd.from_items(
            [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(400)]
        )
        q = emb[42]
        cents = ann_mod.make_centroids(ds, n_centroids=16)
        approx = ann_mod.ivf_topk(ds, q, cents, k=5, n_probe=8).to_pandas()
        exact = ann_mod.brute_topk(ds, q, k=5).to_pandas()
        recall = len(set(approx["vec_id"]) & set(exact["vec_id"])) / 5
        assert recall >= 0.6

    def test_kmeans_centroids_improve_objective_and_recall(self, rd):
        rng = np.random.default_rng(13)
        centers = rng.normal(size=(8, 16)) * 5
        emb = np.concatenate(
            [centers[i % 8] + rng.normal(size=16) * 0.3 for i in range(400)]
        ).reshape(400, 16)
        ds = rd.from_items(
            [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(400)]
        )

        def objective(cents):
            cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
            en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            return (en @ cn.T).max(axis=1).mean()  # mean best-cosine

        init = ann_mod.make_centroids(ds, n_centroids=8)
        trained = ann_mod.kmeans_centroids(ds, n_centroids=8, n_iters=4)
        assert objective(trained) >= objective(init)
        assert objective(trained) > 0.95  # clusters are tight; Lloyd finds them
        # deterministic: same input -> same centroids
        again = ann_mod.kmeans_centroids(ds, n_centroids=8, n_iters=4)
        np.testing.assert_allclose(trained, again)
        # recall with few probes beats the blind init at the same budget
        q = emb[42]
        exact = set(ann_mod.brute_topk(ds, q, k=5).to_pandas()["vec_id"])
        got = set(
            ann_mod.ivf_topk(ds, q, trained, k=5, n_probe=2).to_pandas()["vec_id"]
        )
        assert len(got & exact) / 5 >= 0.8


class TestPQ:
    """Product-quantization ANN (stages/ann.py PQ section)."""

    def _clustered(self, n=400, d=16, seed=17):
        rng = np.random.default_rng(seed)
        centers = rng.normal(size=(8, d)) * 5
        return np.concatenate(
            [centers[i % 8] + rng.normal(size=d) * 0.3 for i in range(n)]
        ).reshape(n, d)

    def test_quantize_e6_is_round_half_up(self):
        x = np.array([[0.0000005, -0.0000005, 0.1234564, -0.9999995]])
        got = ann_mod.quantize_e6(x)[0].tolist()
        # floor(x*1e6 + 0.5): half-up everywhere, incl. negatives
        # (-999999.5 + 0.5 = -999999.0 → floor keeps it, no down-step)
        assert got == [1, 0, 123456, -999999]

    def test_pq_train_monotone_and_deterministic(self):
        e6 = ann_mod.quantize_e6(self._clustered())
        objs = [
            ann_mod.pq_objective(e6, ann_mod.pq_train(e6, m=4, k=8, n_iters=i))
            for i in range(4)
        ]
        assert all(a >= b for a, b in zip(objs, objs[1:]))
        assert objs[-1] < objs[0]  # Lloyd actually moved
        a = ann_mod.pq_train(e6, m=4, k=8, n_iters=3)
        b = ann_mod.pq_train(e6, m=4, k=8, n_iters=3)
        np.testing.assert_array_equal(a, b)

    def test_pq_codes_and_lut_scalar_reference(self):
        rng = np.random.default_rng(23)
        e6 = ann_mod.quantize_e6(rng.normal(size=(30, 8)) * 0.3)
        cents = ann_mod.pq_train(e6, m=2, k=4, n_iters=2)
        codes = ann_mod.pq_codes(e6, cents)
        q = e6[3]
        lut = ann_mod.adc_lut(q, cents)
        for i in range(30):
            for s in range(2):
                d2s = [
                    sum(
                        int(e6[i, s * 4 + j] - cents[s, c, j]) ** 2
                        for j in range(4)
                    )
                    for c in range(4)
                ]
                assert codes[i, s] == d2s.index(min(d2s))
                want_lut = [
                    sum(int(q[s * 4 + j] - cents[s, c, j]) ** 2 for j in range(4))
                    for c in range(4)
                ]
                assert lut[s].tolist() == want_lut

    def test_pq_adc_topk_recall(self, rd):
        emb = self._clustered()
        ds = rd.from_items(
            [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(len(emb))]
        )
        e6 = ann_mod.quantize_e6(emb)
        cents = ann_mod.pq_train(e6, m=4, k=16, n_iters=4)
        q = emb[42]
        got = ann_mod.pq_adc_topk(ds, q, cents, k=40).to_pandas()
        assert len(got) == 40
        assert (got["adc_d2"].to_numpy() >= 0).all()
        assert got["adc_d2"].is_monotonic_increasing
        # the query vector itself is in the corpus: its ADC distance is
        # pure quantization distortion — it must make the shortlist
        assert 42 in set(got["vec_id"])
        # exact squared-L2 top-10 in the same e6 space: the ADC
        # shortlist@40 must cover it (the standard shortlist→re-rank
        # contract; measured 1.0 on this fixture, asserted with slack)
        d2 = ((e6 - ann_mod.quantize_e6(q[None, :])) ** 2).sum(axis=1)
        exact = set(np.lexsort((np.arange(len(emb)), d2))[:10].tolist())
        assert len(set(got["vec_id"]) & exact) / 10 >= 0.8


class TestIVFPQ:
    """IVF-ADC composition (stages/ann.ivfpq_topk)."""

    def test_ivfpq_equals_pq_on_probed_union(self, rd):
        rng = np.random.default_rng(31)
        centers = rng.normal(size=(8, 16)) * 5
        emb = np.concatenate(
            [centers[i % 8] + rng.normal(size=16) * 0.3 for i in range(400)]
        ).reshape(400, 16)
        ds = rd.from_items(
            [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(400)]
        )
        e6 = ann_mod.quantize_e6(emb)
        pq_cents = ann_mod.pq_train(e6, m=4, k=16, n_iters=3)
        coarse = ann_mod.make_centroids(ds, n_centroids=16)
        q = emb[42]
        got = ann_mod.ivfpq_topk(ds, q, coarse, pq_cents, k=10, n_probe=4)
        got = got.to_pandas()

        # reference: replicate probe/assign scalar-style, then ADC-rank
        # exactly the kept set
        cn = coarse / np.linalg.norm(coarse, axis=1, keepdims=True)
        probe = set(np.argsort(-(cn @ (q / np.linalg.norm(q))))[:4].tolist())
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        cell = np.argmax(en @ cn.T, axis=1)
        kept = np.flatnonzero(np.isin(cell, list(probe)))
        codes = ann_mod.pq_codes(e6[kept], pq_cents)
        lut = ann_mod.adc_lut(ann_mod.quantize_e6(q[None, :])[0], pq_cents)
        adc = lut[np.arange(4)[None, :], codes].sum(axis=1)
        order = np.lexsort((kept, adc))[:10]
        assert got["vec_id"].tolist() == kept[order].tolist()
        assert got["adc_d2"].tolist() == adc[order].tolist()
        # pruning really pruned: some corpus cells were not probed
        assert len(kept) < 400


class TestRRFFusion:
    """Reciprocal-rank fusion (sim_queries.q_rrf_fusion)."""

    def test_fusion_matches_scalar_reference(self, rd):
        from osm2gtfs_ray.ops.joins import _as_arrow
        from osm2gtfs_ray.pipelines import sim_queries as sq
        from osm2gtfs_ray.pipelines.text_queries import q_bm25_topk
        from osm2gtfs_ray.stages import ann as ann_mod2

        sf = "/root/testdata/sf0.001"
        got = sq.q_rrf_fusion(sf).to_pandas()

        # scalar reference: rebuild both lists independently and fuse
        # with plain python ints
        bm = _as_arrow(q_bm25_topk(sf)).to_pandas()
        from osm2gtfs_ray.pipelines.sim_queries import _query_vec
        from osm2gtfs_ray.sources.tables import read_table

        emb = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
        dense = _as_arrow(
            ann_mod2.brute_topk(emb, _query_vec(sf), k=sq.RRF_DENSE_N)
        ).to_pandas()

        scores: dict[int, int] = {}
        hits: dict[int, int] = {}
        for _, r in bm.iterrows():
            d, rk = int(r["doc_id"]), int(r["rank"])
            scores[d] = scores.get(d, 0) + sq.RRF_SCALE // (sq.RRF_C + rk)
            hits[d] = hits.get(d, 0) + 1
        for pos, d in enumerate(dense["vec_id"].tolist(), start=1):
            d = int(d)
            scores[d] = scores.get(d, 0) + sq.RRF_SCALE // (sq.RRF_C + pos)
            hits[d] = hits.get(d, 0) + 1
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: sq.RRF_K]

        assert got["doc_id"].tolist() == [d for d, _ in want]
        assert got["rrf_fp"].tolist() == [s for _, s in want]
        assert got["n_hits"].tolist() == [hits[d] for d, _ in want]
        # fused list is non-trivial: some doc must appear in >1 list
        assert got["n_hits"].max() >= 1 and len(got) == sq.RRF_K

    def test_rrf_score_is_exact_integer(self):
        from osm2gtfs_ray.pipelines import sim_queries as sq

        # 10^9 // (60 + rank): rank 1 → 16393442, rank 20 → 12500000
        assert sq.RRF_SCALE // (sq.RRF_C + 1) == 16393442
        assert sq.RRF_SCALE // (sq.RRF_C + 20) == 12500000


class TestCosineLSH:
    def _emb(self, n=300, d=32, seed=3):
        rng = np.random.default_rng(seed)
        base = rng.normal(size=(n, d))
        # plant near-dups: every 10th vector is a jittered copy of its
        # predecessor (cosine well above 0.7)
        for i in range(10, n, 10):
            base[i] = base[i - 1] + rng.normal(size=d) * 0.05
        return base

    def _brute_pairs(self, emb, tau):
        m = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        s = m @ m.T
        i, j = np.triu_indices(len(emb), k=1)
        keep = s[i, j] >= tau
        return {(int(a), int(b)) for a, b in zip(i[keep], j[keep])}

    def test_lsh_recall_and_exact_precision(self, rd):
        emb = self._emb()
        ds_items = [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(len(emb))]

        def factory():
            return rd.from_items(ds_items)

        got = ann_mod.cosine_lsh_pairs(factory, tau=0.7, dim=32).to_pandas()
        got_pairs = {(int(a), int(b)) for a, b in zip(got["a"], got["b"])}
        want = self._brute_pairs(emb, 0.7)
        assert want, "fixture must contain true near-dup pairs"
        # precision is exact by construction (every pair verified)
        assert got_pairs <= want
        # banded sign-bit recall at tau=0.7
        assert len(got_pairs & want) / len(want) >= 0.9
        # reported sims match the brute values at e6 rounding
        m = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        for _, r in got.iterrows():
            assert int(r["sim_e6"]) == int(np.rint(m[int(r["a"])] @ m[int(r["b"])] * 1e6))

    def test_verify_distributed_matches_broadcast(self, rd):
        """The >threshold hash-join verify path must agree with the
        broadcast path bit-for-bit (same pairs, same sim_e6)."""
        emb = self._emb(n=80)
        items = [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(len(emb))]
        want = sorted(self._brute_pairs(emb, 0.7))
        pairs = pa.table(
            {
                "a": pa.array([p[0] for p in want], pa.int64()),
                "b": pa.array([p[1] for p in want], pa.int64()),
            }
        )

        def run(threshold):
            out = ann_mod.verify_cosine_pairs(
                rd.from_arrow(pairs),
                rd.from_items(items),
                0.7,
                dim=32,
                num_partitions=2,
                broadcast_threshold=threshold,
            ).to_pandas()
            return sorted(map(tuple, out[["a", "b", "sim_e6"]].to_numpy().tolist()))

        bcast, dist = run(10_000), run(0)
        assert bcast == dist
        assert {(a, b) for a, b, _ in bcast} == set(want)

    def test_signatures_deterministic_across_batching(self, rd):
        emb = self._emb(n=64)
        sig_stage = ann_mod.RHPSignature(dim=32, n_bits=32, seed=42)
        t = pa.table(
            {
                "vec_id": pa.array(range(64), pa.int64()),
                "embedding": pa.array([e.tolist() for e in emb], pa.list_(pa.float32())),
            }
        )
        whole = sig_stage(t)["sig"].to_numpy()
        parts = np.concatenate(
            [sig_stage(t.slice(o, 16))["sig"].to_numpy() for o in range(0, 64, 16)]
        )
        assert (whole == parts).all()


def test_sample_split_leakage_safe(ray_session):
    """Exact-dup docs always land in the same split; buckets ~90/5/5."""
    from osm2gtfs_ray.pipelines.text_queries import q_sample_split

    df = q_sample_split("/root/testdata/sf0.001").to_pandas()
    # same group_root -> same split, always
    assert (df.groupby("group_root")["split"].nunique() == 1).all()
    # deterministic across runs
    df2 = q_sample_split("/root/testdata/sf0.001").to_pandas()
    a = df.sort_values("doc_id").reset_index(drop=True)
    b = df2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    frac = df["split"].value_counts(normalize=True)
    assert 0.75 <= frac.get("train", 0) <= 0.99
    assert frac.get("val", 0) < 0.2 and frac.get("test", 0) < 0.2


def test_grouped_quantile_sketch_matches_numpy(ray_session):
    """Counting-sketch quantiles == numpy linear interpolation (the
    quantile_cont definition), incl. single-row groups and q=0/1."""
    import ray.data

    from osm2gtfs_ray.ops.quantile import (
        grouped_quantile_counts,
        quantiles_from_counts,
    )

    rng = np.random.default_rng(3)
    g = np.repeat(["a", "b", "c", "solo"], [400, 300, 99, 1])
    v = np.concatenate(
        [rng.integers(0, 20, 400), rng.integers(5, 8, 300), rng.integers(0, 3, 99), [7]]
    ).astype(np.float64)
    ds = ray.data.from_arrow(pa.table({"grp": g, "val": v})).repartition(7)
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    sketch = grouped_quantile_counts(ds, ["grp"], "val")
    got = quantiles_from_counts(
        pa.concat_tables(sketch.iter_batches(batch_size=None, batch_format="pyarrow")),
        ["grp"], "val", qs,
    ).set_index("grp")
    for grp in ("a", "b", "c", "solo"):
        want = np.quantile(v[g == grp], qs, method="linear")
        np.testing.assert_allclose(got.loc[grp].to_numpy(np.float64), want, atol=1e-12)


class TestHLL:
    def test_hll_error_bound_large_cardinality(self, rd):
        import ray.data

        from osm2gtfs_ray.ops.sketch import hll_count_distinct

        # 100k distinct ids (plus duplicates), one group
        ids = np.concatenate([np.arange(100_000), np.arange(30_000)]).astype(np.int64)
        ds = ray.data.from_arrow(
            pa.table({"g": np.zeros(len(ids), np.int64), "v": ids})
        ).repartition(16)
        est = hll_count_distinct(ds, "g", "v")
        assert abs(est["estimate"].iloc[0] - 100_000) / 100_000 < 0.05  # ~1.04/sqrt(1024)=3.3%

    def test_hll_matches_exact_dau(self, rd):
        import duckdb

        from osm2gtfs_ray.pipelines.queries import q_dau_approx

        got = q_dau_approx("/root/testdata/sf0.01").set_index("day_start")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.01/events.parquet')"
        )
        exact = dict(
            con.execute(
                "SELECT CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT), "
                "COUNT(DISTINCT user_id) FROM events GROUP BY 1"
            ).fetchall()
        )
        assert set(got.index) == set(exact)
        for day, true in exact.items():
            err = abs(got.loc[day, "dau_est"] - true) / true
            assert err < 0.10, (day, true, got.loc[day, "dau_est"])

    def test_hll_partition_invariant(self, rd):
        import ray.data

        from osm2gtfs_ray.ops.sketch import hll_count_distinct

        ids = (np.arange(5000) * 7 % 1000).astype(np.int64)
        tbl = pa.table({"g": ids % 3, "v": ids})
        a = hll_count_distinct(ray.data.from_arrow(tbl).repartition(2), "g", "v")
        b = hll_count_distinct(ray.data.from_arrow(tbl).repartition(29), "g", "v")
        pd.testing.assert_frame_equal(a, b)

    def test_hll_string_keys(self, rd):
        import ray.data

        from osm2gtfs_ray.ops.sketch import hll_count_distinct

        ids = np.arange(20_000) % 5_000
        tbl = pa.table(
            {"g": np.zeros(len(ids), np.int64),
             "v": pa.array([f"user-{i}" for i in ids])}
        )
        est = hll_count_distinct(ray.data.from_arrow(tbl).repartition(8), "g", "v")
        assert abs(est["estimate"].iloc[0] - 5_000) / 5_000 < 0.10

    def test_hll_float_keys_raise(self, rd):
        import pytest
        import ray.data

        from osm2gtfs_ray.ops.sketch import hll_count_distinct

        tbl = pa.table({"g": [0, 0], "v": [1.5, 2.5]})
        with pytest.raises(Exception, match="integer or string"):
            hll_count_distinct(ray.data.from_arrow(tbl), "g", "v")


class TestDDSketch:
    """Log-bucket (DDSketch-style) quantile sketch for unbounded
    domains (ops/quantile.dd_sketch) — the documented swap for the
    exact counting sketch when values are continuous."""

    ALPHA = 0.01

    def _data(self):
        rng = np.random.default_rng(7)
        v = np.concatenate(
            [
                rng.lognormal(2.0, 2.5, 8000),          # heavy-tailed positives
                -rng.lognormal(0.0, 2.0, 5000),         # negatives
                np.zeros(17),                            # exact zeros
            ]
        )
        g = np.array(["a", "b", "c"])[np.arange(len(v)) % 3]
        return pa.table({"g": g, "v": v})

    def test_relative_error_bound(self, rd):
        import ray.data

        from osm2gtfs_ray.ops.joins import _as_arrow
        from osm2gtfs_ray.ops.quantile import dd_quantiles, dd_sketch

        tbl = self._data()
        ds = ray.data.from_arrow(tbl).repartition(16)
        sk = _as_arrow(dd_sketch(ds, ["g"], "v", alpha=self.ALPHA))
        qs = [0.01, 0.1, 0.5, 0.9, 0.99]
        got = dd_quantiles(sk, ["g"], qs, alpha=self.ALPHA).set_index("g")
        v = tbl["v"].to_numpy()
        grp = tbl["g"].to_numpy(zero_copy_only=False)
        for gname in ("a", "b", "c"):
            vals = np.sort(v[grp == gname])
            for q, col in zip(qs, got.columns):
                exact = vals[int(np.floor((len(vals) - 1) * q))]
                est = got.loc[gname, col]
                assert abs(est - exact) <= self.ALPHA * abs(exact) + 1e-12, (
                    gname, q, est, exact
                )

    def test_partition_invariant(self, rd):
        import ray.data

        from osm2gtfs_ray.ops.quantile import dd_quantiles, dd_sketch

        tbl = self._data()
        out = []
        for nparts in (2, 31):
            ds = ray.data.from_arrow(tbl).repartition(nparts)
            sk = dd_sketch(ds, ["g"], "v", alpha=self.ALPHA).to_pandas()
            out.append(
                dd_quantiles(sk, ["g"], [0.1, 0.5, 0.9], alpha=self.ALPHA)
                .sort_values("g")
                .reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(out[0], out[1])  # bit-exact

    def test_sketch_is_small(self, rd):
        import ray.data

        from osm2gtfs_ray.ops.quantile import dd_sketch

        # 100k continuous values -> sketch rows ~ buckets, not values
        rng = np.random.default_rng(1)
        tbl = pa.table(
            {"g": np.zeros(100_000, np.int64), "v": rng.lognormal(0, 3, 100_000)}
        )
        sk = dd_sketch(ray.data.from_arrow(tbl).repartition(8), ["g"], "v").to_pandas()
        assert len(sk) < 5_000

    def test_bad_q_raises(self):
        import pytest

        from osm2gtfs_ray.ops.quantile import dd_quantiles

        sk = pd.DataFrame({"g": [0], "bucket": [0], "n": [1]})
        with pytest.raises(ValueError, match="quantile q"):
            dd_quantiles(sk, ["g"], [1.5])


def test_top_terms_matches_brute_force(rd):
    """Global top-k vocabulary (sharded exact plan) vs a driver-side
    Counter over the same sf0.001 documents."""
    from collections import Counter

    import pyarrow.parquet as pq

    from osm2gtfs_ray.pipelines.text_queries import q_top_terms

    sf = "/root/testdata/sf0.001"
    got = q_top_terms(sf, k=20)
    texts = pq.read_table(sf + "/documents.parquet", columns=["text"])["text"].to_pylist()
    c = Counter(w for t in texts for w in t.split())
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(map(tuple, got.values.tolist())) == want


def test_inverted_index_exact(ray_session):
    """Posting rows (term, doc_id, tf) match a plain-Python index over
    the same sf0.001 documents."""
    import pyarrow.parquet as pq
    from collections import Counter

    from osm2gtfs_ray.pipelines.text_queries import q_inverted_index

    sf = "/root/testdata/sf0.001"
    got = (
        q_inverted_index(sf)
        .to_pandas()
        .sort_values(["term", "doc_id"])
        .reset_index(drop=True)
    )
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
    want = Counter()
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        for w in text.split():
            want[(w, did)] += 1
    assert len(got) == len(want)
    for term, did, tf in got.itertuples(index=False):
        assert want[(term, did)] == tf


def test_tfidf_top_terms_exact(ray_session):
    """Per-doc TF-IDF ranking matches a single-process recompute
    (including the float score ordering and term tie-break)."""
    import math

    import pyarrow.parquet as pq
    from collections import Counter

    from osm2gtfs_ray.pipelines.text_queries import q_tfidf_top_terms

    sf = "/root/testdata/sf0.001"
    got = (
        q_tfidf_top_terms(sf)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
    tf: dict = {}
    df: Counter = Counter()
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        c = Counter(text.split())
        tf[did] = c
        for w in c:
            df[w] += 1
    n = docs.num_rows
    for did, sub in got.groupby("doc_id"):
        scored = sorted(
            ((-t * math.log(n / df[w]), w, t) for w, t in tf[did].items()),
        )[:3]
        want = [(w, t, df[w]) for _, w, t in scored]
        assert list(map(tuple, sub[["term", "tf", "df"]].values.tolist())) == want
        assert sub["rank"].tolist() == list(range(1, len(want) + 1))


def test_norm_dedup_case_punct_insensitive(ray_session):
    """Docs differing only by case/punctuation/whitespace collapse to
    one group keyed by the min doc_id."""
    import re

    import pyarrow.parquet as pq
    from collections import defaultdict

    from osm2gtfs_ray.pipelines.text_queries import q_norm_dedup

    sf = "/root/testdata/sf0.001"
    got = q_norm_dedup(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
    groups = defaultdict(list)
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        norm = re.sub(r"\s+", " ", re.sub(r"[.,!?;:]", "", text.lower())).strip()
        groups[norm].append(did)
    want = sorted((min(v), len(v)) for v in groups.values())
    assert list(map(tuple, got[["doc_id", "n_copies"]].values.tolist())) == want


def test_stratified_sample_deterministic_rates(ray_session):
    """The kept set is deterministic across runs and each stratum's
    rate lands near its target (hash-uniformity)."""
    from osm2gtfs_ray.pipelines.queries import _STRAT_RATES, q_stratified_sample

    sf = "/root/testdata/sf0.01"
    a = q_stratified_sample(sf).to_pandas().sort_values("o_orderkey")
    b = q_stratified_sample(sf).to_pandas().sort_values("o_orderkey")
    assert a["o_orderkey"].tolist() == b["o_orderkey"].tolist()
    import pyarrow.parquet as pq

    orders = pq.read_table(sf + "/orders.parquet", columns=["o_orderpriority"])
    totals = pd.Series(orders["o_orderpriority"].to_pylist()).value_counts()
    kept = a["o_orderpriority"].value_counts()
    for prio, rate in _STRAT_RATES.items():
        frac = kept.get(prio, 0) / totals[prio]
        assert abs(frac - rate / 100) < 0.03, (prio, frac, rate)


def test_embedding_dedup_groups_matches_brute(ray_session):
    """LSH-pair components agree with brute-force exact-cosine
    components for every pair the LSH recalled (and each emitted
    cluster is internally connected at tau in the brute graph)."""
    import __ray_entry__ as e

    comp = (
        e.queries()["embedding_dedup_groups"]("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("node")["component"]
    )
    # every component root must be a member of its own component
    roots = set(comp.values)
    assert roots <= set(comp.index)
    # components are min-labeled
    for node, c in comp.items():
        assert c <= node


class TestIntraGroupPairs:
    def test_matches_naive_loop(self):
        import numpy as np
        import pandas as pd
        from osm2gtfs_ray.ops.pairs import bucket_pairs

        rng = np.random.default_rng(7)
        df = pd.DataFrame(
            {
                "k1": rng.integers(0, 12, 300),
                "k2": rng.integers(0, 3, 300),
                "id": rng.permutation(300),
            }
        )
        d, ai, bi = bucket_pairs(df, ["k1", "k2"], "id")
        got = set(zip(d["id"].to_numpy()[ai], d["id"].to_numpy()[bi]))
        exp = set()
        for _, grp in df.groupby(["k1", "k2"]):
            ids = np.sort(grp["id"].to_numpy())
            i, j = np.triu_indices(len(ids), k=1)
            exp.update(zip(ids[i], ids[j]))
        assert got == exp
        # a < b within every pair (ids ascend inside buckets)
        assert (d["id"].to_numpy()[ai] < d["id"].to_numpy()[bi]).all()

    def test_empty_and_singletons(self):
        import numpy as np
        import pandas as pd
        from osm2gtfs_ray.ops.pairs import bucket_pairs

        d, ai, bi = bucket_pairs(pd.DataFrame({"k": [], "id": []}), ["k"], "id")
        assert len(ai) == 0 and len(bi) == 0
        d, ai, bi = bucket_pairs(
            pd.DataFrame({"k": [1, 2, 3], "id": [9, 8, 7]}), ["k"], "id"
        )
        assert len(ai) == 0


class TestPMIBigrams:
    """PMI collocations vs an independent brute reference (python
    dict counting + exact big-int formula). SQL gate: `pmi_bigrams`."""

    def test_matches_brute_reference(self, ray_session, tmp_path):
        import re
        from collections import Counter

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.text_queries import (
            PMI_MIN_PAIR,
            PMI_SCALE,
            q_pmi_bigrams,
        )

        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(12)]
        docs = [
            " ".join(rng.choice(vocab, size=rng.integers(2, 40)))
            for _ in range(120)
        ] + ["", "   ", "solo"]
        pq.write_table(
            pa.table({"text": pa.array(docs, pa.string())}),
            tmp_path / "documents.parquet",
        )
        got = q_pmi_bigrams(str(tmp_path), k=30).reset_index(drop=True)

        uc, bc = Counter(), Counter()
        n_u = n_b = 0
        for d in docs:
            ws = re.split(r"\s+", d.strip()) if d.strip() else []
            for w in ws:
                uc[w] += 1
                n_u += 1
            for x, y in zip(ws, ws[1:]):
                bc[(x, y)] += 1
                n_b += 1
        rows = [
            (x, y, c, (c * n_u * n_u * PMI_SCALE) // (n_b * uc[x] * uc[y]))
            for (x, y), c in bc.items()
            if c >= PMI_MIN_PAIR
        ]
        want = (
            pd.DataFrame(rows, columns=["w1", "w2", "n_pair", "pmi_fp"])
            .sort_values(
                ["pmi_fp", "w1", "w2"], ascending=[False, True, True],
                kind="mergesort",
            )
            .head(30)
            .reset_index(drop=True)
        )
        assert got.astype(want.dtypes.to_dict()).equals(want)
        assert len(got) > 0


class TestDupNgramSpans:
    """Per-doc duplicate 5-gram spans vs a brute dict reference,
    including a crafted shared passage. SQL gate: `dup_ngram_spans`."""

    def test_matches_brute_reference(self, ray_session, tmp_path):
        import re
        from collections import Counter, defaultdict

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.text_queries import (
            DUPGRAM_K,
            q_dup_ngram_spans,
        )

        shared = "alpha beta gamma delta epsilon zeta eta"
        docs = [
            f"unique{i} words here only {i} " + (shared if i % 3 == 0 else f"tail {i}")
            for i in range(60)
        ] + ["", "  ", "short doc"]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        got = (
            q_dup_ngram_spans(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

        gd = defaultdict(Counter)  # gram -> doc -> positions
        for i, d in enumerate(docs):
            ws = re.split(r"\s+", d.strip()) if d.strip() else []
            for j in range(len(ws) - DUPGRAM_K + 1):
                gd[" ".join(ws[j:j + DUPGRAM_K])][i] += 1
        per = defaultdict(lambda: [0, 0])
        for g, byh in gd.items():
            dup = len(byh) >= 2
            for i, npos in byh.items():
                per[i][0] += npos
                if dup:
                    per[i][1] += npos
        want = (
            pd.DataFrame(
                [(i, a, b) for i, (a, b) in per.items()],
                columns=["doc_id", "n_grams", "n_dup"],
            )
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.astype(want.dtypes.to_dict()).equals(want)
        assert got["n_dup"].sum() > 0  # shared passage detected
        # docs under K tokens emit no row
        assert len(docs) - 3 == len(got)


class TestCountMinSketch:
    """CMS invariants: one-sided error under forced collisions, merge
    associativity, exact agreement with a scalar reference sketch.
    SQL gate: `cms_user_counts` (oracle rebuilds the counters)."""

    def test_one_sided_and_matches_scalar_sketch(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data

        from osm2gtfs_ray.ops.joins import _as_arrow
        from osm2gtfs_ray.ops.sketch import (
            CMS_DEPTH,
            CMS_SEED,
            CMS_STREAMS,
            CMS_WIDTH,
            cms_estimate,
            cms_partials,
        )
        from osm2gtfs_ray.sources.pages import _uint

        # 5000 distinct keys >> width 1024 forces collisions
        rng = np.random.default_rng(11)
        keys = rng.integers(0, 5000, 40_000).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(8)
        counters = _as_arrow(cms_partials(ds, "k"))
        probes = np.arange(0, 5000, 137, dtype=np.int64)
        est = cms_estimate(counters, probes)

        # scalar reference sketch
        grid = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
        for row, stream in enumerate(CMS_STREAMS):
            w = _uint(keys.astype(np.uint64), stream, CMS_SEED, CMS_WIDTH)
            np.add.at(grid[row], w, 1)
        ref = np.full(len(probes), np.iinfo(np.int64).max)
        for row, stream in enumerate(CMS_STREAMS):
            ref = np.minimum(
                ref,
                grid[row, _uint(probes.astype(np.uint64), stream, CMS_SEED,
                                CMS_WIDTH)],
            )
        assert (est == ref).all()

        true = np.array([(keys == p).sum() for p in probes])
        assert (est >= true).all()          # CMS never underestimates
        assert (est > true).any()           # collisions actually occur


class TestPmiPrescreen:
    """The float prescreen must provably contain the exact big-int
    top-k even with adversarially large counts (pmi_fp far beyond
    int64, where the r4 constant-2.0 margin would have failed)."""

    def test_contains_exact_topk_at_extreme_scale(self):
        from osm2gtfs_ray.pipelines.text_queries import (
            PMI_SCALE,
            pmi_prescreen_keep,
        )

        rng = np.random.default_rng(42)
        k = 20
        for trial in range(20):
            n = 2000
            # adversarial regime: Nu ~ 1e12 tokens, tiny c1*c2 so
            # pmi_fp ~ 1e24 >> 2^63, plus near-tie clusters
            n_u = int(rng.integers(10**11, 10**12))
            n_b = n_u - int(rng.integers(1, 10**6))
            c12 = rng.integers(5, 10**7, size=n).astype(object)
            c1 = rng.integers(5, 10**8, size=n).astype(object)
            c2 = rng.integers(5, 10**8, size=n).astype(object)
            # inject near-ties around a large value
            base = int(rng.integers(10**6, 10**7))
            for j in range(0, 40, 2):
                c12[j] = base
                c12[j + 1] = base
                c1[j] = c1[j + 1] = 7
                c2[j] = 11 + (j % 3)
                c2[j + 1] = 11 + (j % 3)
            exact = np.array(
                [
                    (int(a) * n_u * n_u * PMI_SCALE) // (n_b * int(b) * int(c))
                    for a, b, c in zip(c12, c1, c2)
                ],
                dtype=object,
            )
            approx = (
                c12.astype(np.float64) * float(n_u) * float(n_u)
                * float(PMI_SCALE)
                / (float(n_b) * c1.astype(np.float64)
                   * c2.astype(np.float64))
            )
            keep = pmi_prescreen_keep(approx, k)
            # exact top-k (max-heap order by value) must all survive
            order = sorted(range(n), key=lambda i: exact[i], reverse=True)
            kth_val = exact[order[k - 1]]
            must_keep = {i for i in range(n) if exact[i] >= kth_val}
            surviving = set(np.flatnonzero(keep).tolist())
            assert must_keep <= surviving, (
                f"trial {trial}: prescreen dropped an exact top-k row"
            )


class TestVocabDiversity:
    """Gini-Simpson vs a scalar Counter reference; degenerate
    single-term corpus collapses to 0. SQL gate: `vocab_diversity`."""

    def test_matches_counter_reference(self, ray_session, tmp_path):
        import re
        from collections import Counter

        import pyarrow as pa
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.text_queries import (
            GINI_SCALE,
            q_vocab_diversity,
        )

        rng = np.random.default_rng(13)
        docs, langs = [], []
        for i in range(80):
            lang = "aa" if i % 2 == 0 else "bb"
            if lang == "aa":  # diverse
                words = rng.choice([f"w{j}" for j in range(40)], size=30)
            else:  # collapsed: one word repeated
                words = ["spam"] * 30
            docs.append(" ".join(words))
            langs.append(lang)
        pq.write_table(
            pa.table(
                {"lang": pa.array(langs, pa.string()),
                 "text": pa.array(docs, pa.string())}
            ),
            tmp_path / "documents.parquet",
        )
        got = (
            q_vocab_diversity(str(tmp_path))
            .to_pandas()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        for _, row in got.iterrows():
            cnt = Counter()
            for d, lg in zip(docs, langs):
                if lg == row["lang"]:
                    cnt.update(re.split(r"\s+", d.strip()))
            n = sum(cnt.values())
            cc = sum(c * (c - 1) for c in cnt.values())
            assert row["n_tokens"] == n and row["n_terms"] == len(cnt)
            assert row["gini_fp"] == ((n * (n - 1) - cc) * GINI_SCALE) // (
                n * (n - 1)
            )
        aa = got[got["lang"] == "aa"].iloc[0]["gini_fp"]
        bb = got[got["lang"] == "bb"].iloc[0]["gini_fp"]
        assert bb == 0 and aa > GINI_SCALE * 9 // 10  # collapse vs diverse

    def test_no_int64_wrap_past_96k_tokens(self, ray_session, tmp_path):
        """(den - cc) * 10^9 exceeds int64 once a language slice passes
        ~96k tokens (den - cc > 9.2e9); the final stage must use Python
        big-ints. Regression for the r4 advisor finding (sf0.1 'en'
        slice, N=112k, returned a wrapped gini_fp)."""
        from collections import Counter

        import pyarrow as pa
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.text_queries import (
            GINI_SCALE,
            q_vocab_diversity,
        )

        rng = np.random.default_rng(7)
        # 120k tokens in one language, moderately diverse vocabulary so
        # den - cc is large (the wrapping regime).
        vocab = [f"t{j}" for j in range(5000)]
        docs = [
            " ".join(rng.choice(vocab, size=600)) for _ in range(200)
        ]
        pq.write_table(
            pa.table(
                {"lang": pa.array(["en"] * len(docs), pa.string()),
                 "text": pa.array(docs, pa.string())}
            ),
            tmp_path / "documents.parquet",
        )
        got = q_vocab_diversity(str(tmp_path)).to_pandas()
        cnt = Counter(w for d in docs for w in d.split())
        n = sum(cnt.values())
        assert n > 96_000  # in the wrapping regime
        cc = sum(c * (c - 1) for c in cnt.values())
        den = n * (n - 1)
        exact = ((den - cc) * GINI_SCALE) // den
        assert (den - cc) * GINI_SCALE > 2**63  # int64 would wrap
        row = got.iloc[0]
        assert row["n_tokens"] == n and row["gini_fp"] == exact
        assert 0 <= row["gini_fp"] <= GINI_SCALE


class TestPhraseSearch:
    SF = "/root/testdata/sf0.001"

    def test_matches_scalar_scan(self, ray_session):
        import pandas as pd
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines import text_queries as tq

        got = (
            tq.q_phrase_search(self.SF)
            .to_pandas()
            .sort_values(["phrase_id", "doc_id"])
            .reset_index(drop=True)
        )
        docs = pq.read_table(
            f"{self.SF}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        rows = []
        for pid, phrase in enumerate(tq.PHRASES):
            toks = phrase.split()
            for r in docs.itertuples():
                ws = r.text.split(" ")
                n = sum(
                    1
                    for i in range(len(ws) - len(toks) + 1)
                    if ws[i:i + len(toks)] == toks
                )
                if n:
                    rows.append((pid, int(r.doc_id), n))
        want = pd.DataFrame(
            rows, columns=["phrase_id", "doc_id", "n_matches"]
        )
        assert len(want) > 10
        assert got.astype("int64").equals(want.astype("int64"))

    def test_counts_overlapping_occurrences(self, ray_session):
        # the per-shard position-join must count every starting
        # position, including overlaps ("a a a" contains "a a" twice)
        import pandas as pd

        from osm2gtfs_ray.ops.sharded import sharded_map_groups  # noqa: F401
        from osm2gtfs_ray.pipelines import text_queries as tq

        ws = "table hash table hash table hash".split(" ")
        toks = tq.PHRASES[0].split()
        n = sum(
            1
            for i in range(len(ws) - len(toks) + 1)
            if ws[i:i + len(toks)] == toks
        )
        assert n == 3  # positional scan counts all starts


class TestSemanticDedup:
    SF = "/root/testdata/sf0.001"

    def test_matches_scalar_semdedup(self, ray_session):
        import pandas as pd
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines import sim_queries as sq
        from osm2gtfs_ray.stages import ann as ann_mod

        got = (
            sq.q_semantic_dedup(self.SF)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        t = pq.read_table(f"{self.SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = t["vec_id"].to_numpy()
        m = ann_mod.stack_embeddings(t["embedding"])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        import ray.data

        cents = ann_mod.kmeans_centroids(
            ray.data.from_arrow(t), n_centroids=16, n_iters=3
        )
        c = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        cell = np.argmax(m @ c.T, axis=1)
        canon: dict[int, int] = {}
        for cl in np.unique(cell):
            sub = np.nonzero(cell == cl)[0]
            sub = sub[np.argsort(ids[sub])]
            sims = m[sub] @ m[sub].T
            # brute component closure per cluster
            lab = {int(ids[i]): int(ids[i]) for i in sub}
            changed = True
            while changed:
                changed = False
                for ii in range(len(sub)):
                    for jj in range(ii + 1, len(sub)):
                        if sims[ii, jj] >= sq.SEM_TAU:
                            a, b = int(ids[sub[ii]]), int(ids[sub[jj]])
                            lo = min(lab[a], lab[b])
                            if lab[a] != lo or lab[b] != lo:
                                lab[a] = lab[b] = lo
                                changed = True
            for v, lb in lab.items():
                if v != lb:
                    canon[v] = lb
        want = pd.DataFrame(
            sorted(canon.items()), columns=["vec_id", "canonical_id"]
        )
        assert len(want) > 50
        assert got.astype("int64").equals(want.astype("int64"))

    def test_removal_list_invariants(self, ray_session):
        from osm2gtfs_ray.pipelines import sim_queries as sq

        got = sq.q_semantic_dedup(self.SF).to_pandas()
        # canonical ids are never themselves removed
        assert not set(got["canonical_id"]) & set(got["vec_id"])
        assert (got["canonical_id"] < got["vec_id"]).all()
        assert not got.duplicated("vec_id").any()


class TestGramMatrix:
    SF = "/root/testdata/sf0.001"

    def test_matches_numpy_whole_matrix(self, ray_session):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines import sim_queries as sq
        from osm2gtfs_ray.stages import ann as ann_mod

        got = (
            sq.q_gram_matrix(self.SF)
            .to_pandas()
            .sort_values(["i", "j"])
            .reset_index(drop=True)
        )
        t = pq.read_table(f"{self.SF}/embeddings.parquet",
                          columns=["embedding"])
        v = ann_mod.quantize_e6(ann_mod.stack_embeddings(t["embedding"]))
        g = v.T @ v
        iu, ju = np.triu_indices(sq.GRAM_DIM)
        assert got["s"].to_numpy().tolist() == g[iu, ju].tolist()
        # symmetry is implied by upper-triangle output; diagonal is
        # a sum of squares, strictly positive for nonzero embeddings
        diag = got[got["i"] == got["j"]]["s"]
        assert (diag > 0).all()

    def test_partials_merge_exactly(self, ray_session):
        # Gram over the whole equals sum of Gram over any row split —
        # the mergeable-partial property the distributed plan relies on
        rng = np.random.default_rng(5)
        v = rng.integers(-1000, 1000, size=(100, 8)).astype(np.int64)
        whole = v.T @ v
        parts = v[:37].T @ v[:37] + v[37:].T @ v[37:]
        assert (whole == parts).all()


class TestAnnRecall:
    SF = "/root/testdata/sf0.001"

    def test_matches_scalar_eval(self, ray_session):
        import pandas as pd
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines import sim_queries as sq
        from osm2gtfs_ray.stages import ann as ann_mod

        got = (
            sq.q_ann_recall(self.SF)
            .to_pandas()
            .sort_values("qid")
            .reset_index(drop=True)
        )
        t = pq.read_table(f"{self.SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = t["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = ann_mod.stack_embeddings(t["embedding"])[order]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        Q, K, P = sq.ANN_EVAL_Q, sq.ANN_EVAL_K, sq.ANN_EVAL_NPROBE
        qn = mn[:Q]
        cn = mn[:16]
        cell = np.argmax(mn @ cn.T, axis=1)
        rows = []
        for qi in range(Q):
            sims = np.rint(mn @ qn[qi] * 1e6).astype(np.int64)
            rank_order = np.lexsort((ids, -sims))
            gold = set(ids[rank_order[:K]].tolist())
            probe = set(
                np.lexsort((np.arange(16), -(cn @ qn[qi])))[:P].tolist()
            )
            cand = rank_order[np.isin(cell[rank_order], list(probe))][:K]
            hits = sum(1 for v in ids[cand] if v in gold)
            mrr = 0
            for r, v in enumerate(ids[cand], 1):
                if v in gold:
                    mrr = sq.EVAL_SCALE // r
                    break
            rows.append((qi, hits, hits * sq.EVAL_SCALE // K, mrr))
        want = pd.DataFrame(
            rows, columns=["qid", "n_hits", "recall_fp", "mrr_fp"]
        )
        assert got.astype("int64").equals(want.astype("int64"))
        # the eval is non-degenerate: IVF misses some gold, finds some
        assert got["n_hits"].sum() > 0
        assert (got["recall_fp"] <= sq.EVAL_SCALE).all()

    def test_query_is_own_top1_when_probed(self, ray_session):
        # each query vector's own cell is always probed (sim = 1 with
        # itself ranks its centroid first), so MRR@1 = SCALE whenever
        # the query appears in its own gold list and survives pruning
        from osm2gtfs_ray.pipelines import sim_queries as sq

        got = sq.q_ann_recall(self.SF).to_pandas()
        assert (got["mrr_fp"] == sq.EVAL_SCALE).all()


class TestEventCube:
    def test_cube_levels_consistent(self, ray_session):
        """Every rollup level re-derivable from the finest grain, and
        the finest grain matches a pandas reference over the parquet."""
        import pandas as pd
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.analytics_queries import (
            _CUBE_ALL_DOW,
            _CUBE_ALL_TYPE,
            _CUBE_DAY_US,
            q_event_cube,
        )

        sf = "/root/testdata/sf0.001"
        out = q_event_cube(sf)
        ev = pq.read_table(
            f"{sf}/events.parquet", columns=["event_type", "ts", "value"]
        ).to_pandas()
        v = ev["value"].to_numpy(np.float64)
        ref = pd.DataFrame(
            {
                "event_type": ev["event_type"],
                "dow": (
                    ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
                    // _CUBE_DAY_US
                    + 4
                )
                % 7,
                "v": np.trunc(v * 1e6 + np.copysign(0.5, v)).astype(np.int64),
            }
        )
        fine = out[
            (out["event_type"] != _CUBE_ALL_TYPE) & (out["dow"] != _CUBE_ALL_DOW)
        ]
        ref_fine = (
            ref.groupby(["event_type", "dow"], as_index=False)
            .agg(n_events=("v", "size"), sum_value_e6=("v", "sum"))
            .sort_values(["event_type", "dow"])
            .reset_index(drop=True)
        )
        assert fine.reset_index(drop=True).astype(
            {"dow": "int64", "n_events": "int64", "sum_value_e6": "int64"}
        ).equals(ref_fine.astype(
            {"dow": "int64", "n_events": "int64", "sum_value_e6": "int64"}
        ))
        grand = out[
            (out["event_type"] == _CUBE_ALL_TYPE) & (out["dow"] == _CUBE_ALL_DOW)
        ]
        assert len(grand) == 1
        assert grand["n_events"].iloc[0] == len(ev)
        assert grand["n_events"].iloc[0] == fine["n_events"].sum()
        assert grand["sum_value_e6"].iloc[0] == fine["sum_value_e6"].sum()
        by_type = out[
            (out["event_type"] != _CUBE_ALL_TYPE) & (out["dow"] == _CUBE_ALL_DOW)
        ]
        assert by_type["n_events"].sum() == len(ev)


class TestSQ8:
    def _mat(self, n=200, d=16, seed=7):
        rng = np.random.default_rng(seed)
        return rng.normal(0, 0.3, size=(n, d))

    def test_codes_bounded_and_scalar_reference(self):
        from osm2gtfs_ray.stages.ann import quantize_e4, sq8_codes

        m = self._mat()
        v = quantize_e4(m)
        lo, hi = v.min(axis=0), v.max(axis=0)
        c = sq8_codes(v, lo, hi)
        assert c.min() >= 0 and c.max() <= 255
        # scalar round-half-up reference, one element at a time
        for i in range(0, 200, 37):
            for j in range(0, 16, 5):
                span = int(hi[j] - lo[j])
                exp = (
                    ((int(v[i, j]) - int(lo[j])) * 510 + span) // (2 * span)
                    if span > 0
                    else 0
                )
                assert c[i, j] == exp

    def test_constant_dim_codes_zero(self):
        from osm2gtfs_ray.stages.ann import quantize_e4, sq8_codes

        m = self._mat()
        m[:, 3] = 0.125  # degenerate dimension: hi == lo
        v = quantize_e4(m)
        c = sq8_codes(v, v.min(axis=0), v.max(axis=0))
        assert (c[:, 3] == 0).all()

    def test_quantization_error_bound(self):
        """Reconstruction is within half a code step per dim: the SQ8
        contract that makes the approximate distances usable."""
        from osm2gtfs_ray.stages.ann import quantize_e4, sq8_codes

        m = self._mat()
        v = quantize_e4(m)
        lo, hi = v.min(axis=0), v.max(axis=0)
        c = sq8_codes(v, lo, hi)
        recon = lo[None, :] * 255 + c * (hi - lo)[None, :]
        err = np.abs(v * 255 - recon)
        step = np.maximum(hi - lo, 1)  # one code step on the x255 scale
        assert (err <= (step[None, :] + 1) // 2 + 255).all()

    def test_topk_self_query_first(self, ray_session):
        from osm2gtfs_ray.pipelines.sim_queries import q_ann_sq8

        got = q_ann_sq8("/root/testdata/sf0.001").to_pandas()
        assert len(got) == 10
        assert got["vec_id"].iloc[0] == 0  # the query vector itself
        d2 = got["adc_d2"].to_numpy()
        assert (np.diff(d2) >= 0).all()
