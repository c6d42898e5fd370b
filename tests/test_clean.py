"""Corpus-cleaning operators: PII redaction, typo-pair mining
(delete-1 neighborhood + vectorized ed<=1 verify), resample+ffill,
DF boilerplate stripping."""

from __future__ import annotations

import itertools
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


def _write_docs(tmpdir: str, texts: list[str], sources: list[str] | None = None) -> str:
    os.makedirs(tmpdir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(sources or ["t"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(tmpdir, "documents.parquet"),
    )
    return tmpdir


def _brute_ed(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = np.arange(n + 1)
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, d[j] = d[j], cur
    return int(d[n])


class TestEd1Mask:
    def test_matches_brute_levenshtein(self):
        from osm2gtfs_ray.pipelines.clean_queries import _ed1_mask

        words = ["cat", "cut", "cats", "at", "dog", "dg", "dig", "a", "ab",
                 "abc", "acb", "hello", "hallo", "helo", "hell", "xyz"]
        pairs = [(a, b) for a, b in itertools.combinations(words, 2)]
        a = np.array([p[0] for p in pairs], dtype=object)
        b = np.array([p[1] for p in pairs], dtype=object)
        got = _ed1_mask(a, b)
        exp = np.array([_brute_ed(x, y) <= 1 for x, y in pairs])
        assert (got == exp).all()

    def test_unicode_and_long(self):
        from osm2gtfs_ray.pipelines.clean_queries import _ed1_mask

        pairs = [("naïve", "naive"), ("naïve", "naïve"), ("résumé", "resume"),
                 ("longwordhere", "longwordhers"), ("longwordhere", "longwordheree")]
        a = np.array([p[0] for p in pairs], dtype=object)
        b = np.array([p[1] for p in pairs], dtype=object)
        got = _ed1_mask(a, b)
        exp = np.array([_brute_ed(x, y) <= 1 for x, y in pairs])
        assert (got == exp).all()


class TestTypoPairs:
    def test_finds_planted_typos_only(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.clean_queries import q_typo_pairs

        # doc 0 first word "sort" → doc_id 0 % 4 = 0 → corrupt "ort"
        # doc 1 first word "merge" → 1 % 5 = 1 → corrupt "mrge"
        texts = ["sort table scan", "merge join filter"]
        sf = _write_docs(str(tmp_path), texts)
        got = q_typo_pairs(sf).to_pandas()
        pairs = set(map(tuple, got[["w1", "w2"]].values))
        assert ("ort", "sort") in pairs
        assert ("merge", "mrge") in pairs
        vocab = set(" ".join(texts).split()) | {"ort", "mrge"}
        for w1, w2 in pairs:
            assert _brute_ed(w1, w2) <= 1 and w1 < w2 and {w1, w2} <= vocab
        # exhaustive: nothing at ed<=1 was missed
        exp = {
            (a, b)
            for a, b in itertools.combinations(sorted(vocab), 2)
            if _brute_ed(a, b) <= 1
        }
        assert pairs == exp


class TestPIIRedact:
    def test_redacts_and_counts(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.clean_queries import q_pii_redact

        texts = ["plain words here", "reach me at bob@corp.io today"]
        sf = _write_docs(str(tmp_path), texts)
        got = q_pii_redact(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
        # every doc gets one synthesized email + phone; doc 1 has one real email
        assert got["n_emails"].tolist() == [1, 2]
        assert got["n_phones"].tolist() == [1, 1]
        assert "@" not in got["redacted"][1]
        assert "<EMAIL>" in got["redacted"][0] and "<PHONE>" in got["redacted"][0]
        assert "bob@corp.io" not in got["redacted"][1]


class TestResampleFfill:
    def test_daily_grid_forward_fill(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.clean_queries import q_resample_ffill

        os.makedirs(str(tmp_path), exist_ok=True)
        ts = pd.to_datetime(
            ["2024-01-01 05:00", "2024-01-01 09:00", "2024-01-04 12:00",
             "2024-01-02 00:00"]
        )
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "ts": pa.array(ts, pa.timestamp("us")),
                    "user_id": pa.array([7, 7, 7, 9], pa.int64()),
                    "event_type": pa.array(["a"] * 4),
                    "value": pa.array([1.0, 2.0, 3.0, 9.0]),
                    "props": pa.array(["{}"] * 4),
                }
            ),
            os.path.join(str(tmp_path), "events.parquet"),
        )
        got = q_resample_ffill(str(tmp_path)).to_pandas()
        u7 = got[got["user_id"] == 7].sort_values("day")
        # last-of-day wins on Jan 1 (value 2.0), gap days carry forward
        assert u7["value_cents"].tolist() == [200, 200, 200, 300]
        u9 = got[got["user_id"] == 9].sort_values("day")
        # user 9 starts Jan 2, grid extends to the corpus max day (Jan 4)
        assert len(u9) == 3 and u9["value_cents"].tolist() == [900, 900, 900]


class TestBoilerplateStrip:
    def test_strips_high_df_tokens_per_source(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.clean_queries import q_boilerplate_strip

        # "cookie" appears in 5/5 docs of source A (boilerplate);
        # "rare" in 1/5; source B has its own independent threshold
        a_texts = [f"cookie banner doc{i} rare" if i == 0 else f"cookie banner doc{i}" for i in range(5)]
        b_texts = ["cookie only once here", "totally different words"]
        sf = _write_docs(
            str(tmp_path), a_texts + b_texts, sources=["A"] * 5 + ["B"] * 2
        )
        got = (
            q_boilerplate_strip(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        # source A: cookie+banner removed everywhere, doc words kept in order
        assert got.loc[0, "clean_text"] == "doc0 rare"
        assert got.loc[0, "n_removed"] == 2
        assert got.loc[3, "clean_text"] == "doc3"
        # source B: "cookie" is 1/2 docs < 80%, kept
        assert "cookie" in got.loc[5, "clean_text"]
        assert got.loc[6, "n_removed"] == 0


class TestCorpusPrep:
    def test_chain_semantics(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.clean_queries import q_corpus_prep

        long = " ".join(f"w{i}" for i in range(25))
        texts = [
            long,                      # doc 0: en, long → kept, dedup winner
            long + " ",                # doc 1: same normalized → deduped away
            "short text",              # doc 2: too few tokens → dropped
            long + " extra",           # doc 3: distinct → kept
        ]
        sf = _write_docs(str(tmp_path), texts)
        # doc 2 is en but short; make doc 3 non-en to test the lang filter
        import pyarrow.parquet as _pq
        import pyarrow as _pa
        t = _pq.read_table(os.path.join(sf, "documents.parquet"))
        langs = ["en", "en", "en", "fr"]
        t = t.set_column(t.schema.get_field_index("lang"), "lang", _pa.array(langs))
        _pq.write_table(t, os.path.join(sf, "documents.parquet"))

        got = q_corpus_prep(sf).to_pandas()
        assert got["doc_id"].tolist() == [0]
        assert got["n_tokens"].tolist() == [25]
        assert set(got["split"]) <= {"train", "val", "test"}


class TestAnalyticsExtras:
    def test_value_histogram_clamps(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.analytics_queries import q_value_histogram

        os.makedirs(str(tmp_path), exist_ok=True)
        vals = [-3.0, 0.0, 4.99, 5.0, 199.9, 200.0, 10_000.0]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(vals)), pa.int64()),
                    "ts": pa.array(
                        pd.to_datetime(["2024-01-01"] * len(vals)), pa.timestamp("us")
                    ),
                    "user_id": pa.array([1] * len(vals), pa.int64()),
                    "event_type": pa.array(["a"] * len(vals)),
                    "value": pa.array(vals),
                    "props": pa.array(["{}"] * len(vals)),
                }
            ),
            os.path.join(str(tmp_path), "events.parquet"),
        )
        got = q_value_histogram(str(tmp_path)).to_pandas()
        bybucket = dict(zip(got["bucket"], got["n"]))
        # -3 and 0 and 4.99 clamp/fall into bucket 0; 5.0 → bucket 1;
        # 199.9, 200, 10000 clamp into the last bucket (39)
        assert bybucket[0] == 3 and bybucket[1] == 1 and bybucket[39] == 3
        row0 = got[got["bucket"] == 0].iloc[0]
        assert row0["lo_cents"] == 0 and row0["hi_cents"] == 500

    def test_interval_merge_islands(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.analytics_queries import q_interval_merge

        os.makedirs(str(tmp_path), exist_ok=True)
        # user 1: events at 0s, 300s (overlap), 1500s (gap) → 2 islands
        # user 2: single event → 1 island; touching boundary (600s) merges
        ts = pd.to_datetime(
            ["2024-01-01 00:00:00", "2024-01-01 00:05:00", "2024-01-01 00:25:00",
             "2024-01-02 00:00:00", "2024-01-02 00:10:00"]
        )
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(5), pa.int64()),
                    "ts": pa.array(ts, pa.timestamp("us")),
                    "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
                    "event_type": pa.array(["a"] * 5),
                    "value": pa.array([1.0] * 5),
                    "props": pa.array(["{}"] * 5),
                }
            ),
            os.path.join(str(tmp_path), "events.parquet"),
        )
        got = q_interval_merge(str(tmp_path)).to_pandas()
        u1 = got[got["user_id"] == 1]
        assert len(u1) == 2
        assert u1.iloc[0]["n_events"] == 2 and u1.iloc[0]["end_s"] - u1.iloc[0]["start_s"] == 900
        # user 2: second event starts exactly at the first's end (touch) → merged
        u2 = got[got["user_id"] == 2]
        assert len(u2) == 1 and u2.iloc[0]["n_events"] == 2


class TestCohortFunnel:
    def _write_events(self, tmpdir, rows):
        os.makedirs(tmpdir, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array(pd.to_datetime([r[1] for r in rows]), pa.timestamp("us")),
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "event_type": pa.array([r[2] for r in rows]),
                    "value": pa.array([1.0] * len(rows)),
                    "props": pa.array(["{}"] * len(rows)),
                }
            ),
            os.path.join(tmpdir, "events.parquet"),
        )
        return tmpdir

    def test_cohort_retention_offsets(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.analytics_queries import q_cohort_retention

        rows = [
            (1, "2024-01-01 10:00", "view"), (1, "2024-01-01 11:00", "view"),
            (1, "2024-01-03 10:00", "view"),
            (2, "2024-01-02 10:00", "view"), (2, "2024-01-03 10:00", "view"),
        ]
        sf = self._write_events(str(tmp_path), rows)
        got = q_cohort_retention(sf).to_pandas()
        import datetime as dt
        rec = {(r.cohort_day, r.offset_days): r.n_users for r in got.itertuples()}
        d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
        assert rec == {(d1, 0): 1, (d1, 2): 1, (d2, 0): 1, (d2, 1): 1}

    def test_funnel_order_matters(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.analytics_queries import q_funnel_conversion

        rows = [
            (1, "2024-01-01 10:00", "click"), (1, "2024-01-01 12:00", "purchase"),
            (2, "2024-01-01 12:00", "purchase"), (2, "2024-01-01 13:00", "click"),
            (3, "2024-01-01 09:00", "click"),
            (4, "2024-01-01 09:00", "view"),
        ]
        sf = self._write_events(str(tmp_path), rows)
        got = q_funnel_conversion(sf).to_pandas().set_index("user_id")
        assert got.loc[1, "converted"] == 1
        assert got.loc[2, "converted"] == 0  # purchase before click
        assert got.loc[3, "converted"] == 0 and got.loc[3, "first_purchase_s"] == -1
        assert 4 not in got.index  # never clicked


class TestAudio:
    def test_decode_features_match_brute(self, rd):
        import ray.data
        from osm2gtfs_ray.stages.audio import (
            DecodeAudio, audio_samples_for_id, synthesize_audio_for_ids,
        )

        ids = np.arange(40, dtype=np.uint64)
        tbl = synthesize_audio_for_ids(ids)
        # exercise the offset math on a SLICED batch too
        for t in (tbl, tbl.slice(7, 21)):
            got = DecodeAudio()(t).to_pandas().set_index("audio_id")
            for aid in got.index:
                s = audio_samples_for_id(int(aid), int(got.loc[aid, "n_samples"])).astype(np.int64)
                assert got.loc[aid, "sum_abs"] == np.abs(s).sum()
                assert got.loc[aid, "peak"] == np.abs(s).max()
                assert got.loc[aid, "zero_crossings"] == int(((s[1:] * s[:-1]) < 0).sum())

    def test_empty_payload_row(self):
        import pyarrow as pa
        from osm2gtfs_ray.stages.audio import DecodeAudio

        t = pa.table(
            {
                "audio_id": pa.array([1, 2, 3], pa.int64()),
                "payload": pa.array(
                    [np.array([5, -3], "<i2").tobytes(), b"", np.array([0, 7, -1], "<i2").tobytes()],
                    pa.binary(),
                ),
                "sample_rate": pa.array([16000] * 3, pa.int64()),
            }
        )
        got = DecodeAudio()(t).to_pandas().set_index("audio_id")
        assert got.loc[1, "n_samples"] == 2 and got.loc[1, "zero_crossings"] == 1
        assert got.loc[2, "n_samples"] == 0 and got.loc[2, "sum_abs"] == 0
        assert got.loc[3, "n_samples"] == 3 and got.loc[3, "zero_crossings"] == 1


class TestLeftOuterEnrichment:
    def test_null_fill_branch(self, rd, tmp_path):
        from osm2gtfs_ray.pipelines.queries import q_event_segment

        os.makedirs(str(tmp_path), exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([10, 11, 12], pa.int64()),
                    "ts": pa.array(pd.to_datetime(["2024-01-01"] * 3), pa.timestamp("us")),
                    "user_id": pa.array([1, 2, 3], pa.int64()),
                    "event_type": pa.array(["a"] * 3),
                    "value": pa.array([1.0] * 3),
                    "props": pa.array(["{}"] * 3),
                }
            ),
            os.path.join(str(tmp_path), "events.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([2, 3], pa.int64()),
                    "c_mktsegment": pa.array(["BUILDING", "AUTOMOBILE"]),
                }
            ),
            os.path.join(str(tmp_path), "customer.parquet"),
        )
        got = q_event_segment(str(tmp_path)).to_pandas().set_index("user_id")
        # user 1: no customer row; user 3: customer exists but filtered out
        assert got.loc[1, "segment"] == "NONE"
        assert got.loc[2, "segment"] == "BUILDING"
        assert got.loc[3, "segment"] == "NONE"
