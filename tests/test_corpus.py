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
