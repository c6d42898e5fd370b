#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "flagship": {...join rows/s, assignments/s...}}

--scaling: runs the same flagship job at N vs 4N CPUs in fresh
processes (paired repeats; 4→16 primary, 8→32 disclosed) on the same
input — the sandbox evidence for the N→4N-node criterion (BASELINE.md)
— and prints throughputs, median/best efficiency, and a no-Ray
CPU-burn calibration of host-delivered cycles.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

BENCH_QUERIES = [
    "pricing_summary",
    "top_orders",
    "nation_revenue",
    "customers_without_orders",
    "first_order_per_customer",
    "orders_with_lineitem",
    "event_segment",
    "hourly_event_stats",
    "prev_order_gap",
    "quantile_qty",
    "quantile_price_sketch",
    "daily_active_users",
    "dau_approx",
    "top_orders_per_customer",
    "mode_event_type",
    "corr_qty_price",
    "event_pivot",
    "revenue_rollup",
    "rolling_user_value",
    "rolling_daily_revenue",
    "spend_rank",
    "zscore_events",
    "value_histogram",
    "interval_merge",
    "cohort_retention",
    "funnel_conversion",
    "nation_centroid",
    "cell_histogram",
    "nearest_events",
    "token_stats",
    "top_terms",
    "inverted_index",
    "tfidf_top_terms",
    "norm_dedup",
    "stratified_sample",
    "bpe_token_stats",
    "window_event_stats",
    "exact_dedup",
    "sample_split",
    "seq_pack",
    "contamination",
    "lm_perplexity",
    "heavy_hitters",
    "word_repetition",
    "pii_redact",
    "typo_pairs",
    "resample_ffill",
    "boilerplate_strip",
    "corpus_prep",
    "doc_quality",
    "ann_topk",
    "ann_batch_topk",
    "minhash_pairs",
    "ngram_jaccard",
    "simhash",
    "simhash_pairs",
    "props_extract",
    "lang_id",
    "fingerprint",
    "ann_ivf",
    "ann_ivf_kmeans",
    "ann_pq",
    "ann_ivfpq",
    "rrf_fusion",
    "cosine_lsh",
    "random_projection",
    "media_decode",
    "audio_features",
    "phash_pairs",
    "sessionize",
    "dup_components",
    "chunk_docs",
    "consistent_sample",
    "url_canonicalize",
    "host_stats",
    "robots_filter",
    "pagerank",
    "ppr",
    "sssp",
    "cell_pyramid",
    "crawl_schedule",
    "bfs_hops",
    "domain_link_stats",
    "reciprocal_links",
    "bm25_topk",
    "anchor_top_terms",
    "crawl_delta",
    "tile_geometry",
    "simplify_shapes",
    "cell_smooth",
    "cocitation",
    "triangles",
    "hits",
    "pmi_bigrams",
    "snap_points",
    "dup_ngram_spans",
    "kcore",
    "shape_length",
    "hotspots",
    "grid_clusters",
    "cms_user_counts",
    "weighted_sample",
    "balanced_mix",
    "tile_delta",
    "tile_authority",
    "scc",
    "bowtie",
    "od_flows",
    "stay_points",
    "co_travelers",
    "watermark_late",
    "phrase_search",
    "semantic_dedup",
    "spike_days",
    "skyline_docs",
    "gram_matrix",
    "median_user_value",
    "type_lift",
    "ann_recall",
    "radius_gyration",
    "domain_authority",
    "vocab_diversity",
    "cell_compact",
    "cell_buffer",
    "geofence_transitions",
    "ping_speed",
    "segment_crossings",
    "orphan_pages",
    "phash_groups",
    "user_envelope",
    "interarrival_hist",
    "knn_graph",
    "link_prediction",
    "ann_sq8",
    "resource_alloc",
    "clustering_coef",
    "assortativity",
    "event_cube",
    "trajectory_dtw",
    "dedup_eval",
    "zorder_scan",
    "event_sequences",
    "hull_points",
    "decayed_engagement",
    "cell_erode",
    "morans_i",
    "tile_entropy",
    "bearing_hist",
    "local_moran",
    "nn_distance",
    "cell_trend",
    "mutual_knn",
    "type_transitions",
    "shape_densify",
    "ripley_k",
    "envelope_overlaps",
    "quadkey_counts",
    "raster_lines",
    "lcss_similarity",
    "hausdorff_pairs",
    "kde_density",
    "raster_regions",
    "theil_sen",
    "mad_outliers",
    "frechet_pairs",
    "redirect_resolve",
    "idw_surface",
    "edr_similarity",
    "gi_star",
]


def _consume(res) -> int:
    """Execute a query result fully; return row count."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += b.num_rows
        return n
    if isinstance(res, pa.Table):
        return res.num_rows
    if isinstance(res, pd.DataFrame):
        return len(res)
    return 0


def run_bench() -> dict:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import logging

    import ray

    if not ray.is_initialized():
        init_kwargs = {}
        objstore = os.environ.get("GRAFT_OBJSTORE_BYTES")
        if objstore:
            # multi-cluster scaling legs run several independent Ray
            # instances at once — cap each plasma store so 4 stores
            # don't oversubscribe /dev/shm (4 × default 30% of RAM
            # exceeds the host's tmpfs)
            init_kwargs["object_store_memory"] = int(objstore)
        ray.init(
            address="local",
            num_cpus=ncpu,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            **init_kwargs,
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    logging.getLogger("ray").setLevel(logging.ERROR)

    sys.path.insert(0, REPO)
    import __ray_entry__ as entry_mod

    # warm the OS page cache so we measure compute+shuffle, not cold disk
    for name in os.listdir(sf_dir):
        with open(os.path.join(sf_dir, name), "rb") as f:
            f.read()

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    # ---- flagship spatial pipeline over synthetic pages -----------------
    from osm2gtfs_ray.sources import pages as pgen
    from osm2gtfs_ray.pipelines import flagship as fl

    n_pages = int(os.environ.get("GRAFT_PAGES", "50000"))
    tiles = pgen.make_tiles_table(64, seed=42)
    fused = os.environ.get("GRAFT_FUSED", "1") != "0"
    # fused pool: FIXED at 3/4 of the node (proportional at every ncpu —
    # the scaling criterion needs identical per-node config at both
    # cluster sizes), rest for the stateless read/generate tasks. Fixed
    # beats autoscaling here: pure autoscaling from 1 averaged only ~5
    # live actors over a 16 s run, and scale-up lag wastes the short
    # high-parallelism leg.
    k = max(1, ncpu * 3 // 4)
    pool = (k, k) if fused else max(2, ncpu // 4)

    # warm the Ray worker pool (worker processes spawn lazily on first
    # use and actor workers additionally pay numpy/pyarrow import —
    # an O(ncpu) one-time cost that would otherwise bias the timed
    # region against higher parallelism levels; a long-running cluster
    # job pays it once per deploy, not per pipeline)
    import ray.data as _rd

    class _Warm:
        def __init__(self):
            import numpy, pyarrow, pyarrow.compute  # noqa: F401
            from osm2gtfs_ray.pipelines import flagship  # noqa: F401

        def __call__(self, b):
            return b

    _rd.range(ncpu * 8, override_num_blocks=ncpu * 2).map_batches(
        _Warm, batch_format="pyarrow",
        concurrency=(k, k),
    ).count()

    # Task granularity: driver-side per-task dispatch costs ~tens of ms
    # here, so keep blocks ≥ ~15k pages each (measured sweep: 192
    # blocks at 3M pages beats 366 blocks ~2×). Same formula at every
    # parallelism level — the scaling criterion requires identical
    # per-node job config at both cluster sizes.
    n_blocks = max(64, min(512, n_pages // 15625))

    # In-process repeats (least-contended sample wins): co-tenant load
    # on this shared host swings single-run wall time ±40%, so each
    # bench session samples the pipeline GRAFT_INPROC_REPEATS times and
    # reports the best — a per-leg noise rejector for --scaling pairs.
    inproc = int(os.environ.get("GRAFT_INPROC_REPEATS", "3"))
    page_offset = int(os.environ.get("GRAFT_PAGE_OFFSET", "0"))
    best = None
    for _ in range(inproc):
        t0 = time.perf_counter()
        wall0 = time.time()
        pages = pgen.pages_dataset(
            n_pages, override_num_blocks=n_blocks, offset=page_offset
        )
        if fused:
            # single fused actor pool (extract→explode→geocode→join→
            # partial-count per batch): wide text columns AND join rows
            # never leave the actor heap, the per-row text invariant is
            # verified inline (raises on any mismatch), and only tiny
            # per-batch (cell, tile) count partials hit the object
            # store — the end-to-end streaming consumption shape.
            res = fl.run_flagship_fused(
                pages, tiles, concurrency=pool, batch_size=4096, emit="assignments"
            )
            tbl = fl.reduce_assignment_partials(res["partials"])
            t_join = time.perf_counter() - t0
            import pyarrow.compute as _pc

            join_rows = int(_pc.sum(tbl["count"]).as_py())
            matched = tbl.filter(_pc.not_equal(tbl["tile_id"], ""))
            n_assign = matched.num_rows
            matched_rows = int(_pc.sum(matched["count"]).as_py() or 0)
            t_assign = 0.0
        else:
            res = fl.run_flagship(pages, tiles, concurrency=pool, batch_size=2048)
            join_mat = res["join_rows"].materialize()
            join_rows = join_mat.count()
            t_join = time.perf_counter() - t0
            t1 = time.perf_counter()
            assignments = fl.assignments_stage(join_mat)
            # one consuming pass yields both the group count and the
            # MATCHED row total, so assignments_per_sec means the same
            # thing in both GRAFT_FUSED modes (matched join rows
            # aggregated / total pipeline sec)
            import pyarrow.compute as _pc

            n_assign, matched_rows = 0, 0
            for b in assignments.iter_batches(batch_size=65536, batch_format="pyarrow"):
                n_assign += b.num_rows
                matched_rows += int(_pc.sum(b["count"]).as_py() or 0)
            t_assign = time.perf_counter() - t1
        cand = {
            "n_pages": n_pages,
            "join_rows": join_rows,
            "t_start": wall0,
            "t_end": wall0 + t_join,
            "join_sec": round(t_join, 3),
            "pages_per_sec": round(n_pages / t_join, 1),
            "join_rows_per_sec": round(join_rows / t_join, 1),
            "assign_groups": n_assign,
            "assign_sec": round(t_assign, 3),
            # tile assignments counted = matched join rows aggregated
            "assignments_per_sec": round(matched_rows / max(t_join + t_assign, 1e-9), 1),
        }
        if best is None or cand["join_sec"] < best["join_sec"]:
            best = cand
    flagship = best
    timings["flagship_spatial_join"] = round(flagship["join_sec"] + flagship["assign_sec"], 3)

    # ---- operator query suite over the sf tables ------------------------
    if os.environ.get("GRAFT_BENCH_MODE") != "flagship":
        qs = entry_mod.queries()
        # best-of-K per query, K INTERLEAVED full passes (not K
        # back-to-back runs): co-tenant load on this shared host comes
        # in multi-minute windows (r2 postmortem, BASELINE.md "Bench
        # noise"), so a query's K samples must be minutes apart for
        # the min() to reject a noisy window. r2's conditional (>3 s)
        # re-sample left cheap queries unprotected and produced
        # phantom 2x "regressions".
        reps = int(os.environ.get("GRAFT_QUERY_REPEATS", "2"))
        for _ in range(reps):
            for name in BENCH_QUERIES:
                t0 = time.perf_counter()
                counts[name] = _consume(qs[name](sf_dir))
                dt = time.perf_counter() - t0
                timings[name] = round(min(timings.get(name, float("inf")), dt), 3)

    total = round(sum(timings.values()), 3)
    # The full per-query dict and row counts go to a side file, NOT the
    # printed line: the driver captures a bounded tail of stdout and both
    # r2's and r3's fat final lines got truncated into unparseable records
    # (VERDICT r3 What's-wrong #1). The printed line stays ≤1 KB.
    detail_path = os.path.join(REPO, "bench_records", "bench_last_detail.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(
                {
                    "metric": "headline pipelines wall time (flagship spatial join + operator suite)",
                    "value": total,
                    "unit": "sec",
                    "sf": sf,
                    "num_cpus": ncpu,
                    "queries": timings,
                    "row_counts": counts,
                    "flagship": flagship,
                    "wall_ts": time.time(),
                },
                f,
                indent=1,
            )
    except OSError:
        pass
    return {
        "metric": "headline wall time; per-query detail in bench_records/bench_last_detail.json",
        "value": total,
        "unit": "sec",
        "queries": {"flagship_spatial_join": timings["flagship_spatial_join"]},
        "n_queries_timed": len(timings),
        "queries_file": "bench_records/bench_last_detail.json",
        "flagship": {
            "n_pages": flagship["n_pages"],
            "join_rows": flagship["join_rows"],
            "join_sec": flagship["join_sec"],
            "join_rows_per_sec": flagship["join_rows_per_sec"],
            "assignments_per_sec": flagship["assignments_per_sec"],
            # t_start/t_end kept: run_scaling's cluster_leg spans over them
            "t_start": flagship["t_start"],
            "t_end": flagship["t_end"],
        },
        "sf": sf,
        "num_cpus": ncpu,
    }


def _udf_kernel_work(args):
    """Multiprocessing worker: run the ACTUAL fused flagship kernel
    (generate → extract → geocode → PIP/kNN join → partial counts) over
    `n_batches` 4096-page batches, no Ray involved."""
    n_batches, offset = args
    import numpy as np

    sys.path.insert(0, REPO)
    from osm2gtfs_ray.sources import pages as pg
    from osm2gtfs_ray.pipelines.flagship import FusedExtractJoin

    tiles = pg.make_tiles_table(64, seed=42)
    fj = FusedExtractJoin(tiles=tiles, emit="assignments")
    fj(pg.make_pages_for_ids(np.arange(512, dtype=np.uint64), 42))  # warm
    t0 = time.perf_counter()
    for b in range(n_batches):
        ids = np.arange(4096, dtype=np.uint64) + np.uint64(offset + b * 4096)
        fj(pg.make_pages_for_ids(ids, 42))
    return time.perf_counter() - t0


def _udf_kernel_scaling(levels=(3, 6, 12, 24), n_batches: int = 30) -> dict:
    """Engine-kernel scaling WITHOUT Ray: the exact per-batch flagship
    computation via a bare multiprocessing pool. Shows what the kernels
    themselves do as workers are added on this host — isolating Ray
    runtime / shared-object-store effects from the computation."""
    import multiprocessing as mp

    out = {}
    for nproc in levels:
        with mp.Pool(nproc) as p:
            durs = p.map(
                _udf_kernel_work,
                [(n_batches, i * n_batches * 4096) for i in range(nproc)],
            )
        pages = nproc * n_batches * 4096
        out[str(nproc)] = round(pages / max(durs), 1)  # aggregate pages/s at full overlap
    return out


def _cpu_burn(n_iter: int):
    """Pure-Python CPU spin (multiprocessing calibration worker)."""
    t0 = time.perf_counter()
    x = 0
    for i in range(n_iter):
        x += i * i
    return time.perf_counter() - t0


def _delivered_cycles(nproc: int, n_iter: int = 20_000_000, tries: int = 3) -> float:
    """How many single-process-equivalents of CPU this host actually
    delivers to `nproc` concurrent pure-CPU processes (frequency
    scaling / hypervisor throttling calibration; no Ray involved).
    Best-of-`tries`: each burn is ~2 s, so a single sample can catch a
    transient co-tenant spike."""
    import multiprocessing as mp

    best = 0.0
    for _ in range(tries):
        t0 = time.perf_counter()
        with mp.Pool(nproc) as p:
            durs = p.map(_cpu_burn, [n_iter] * nproc)
        best = max(best, sum(durs) / (time.perf_counter() - t0))
    return best


def run_scaling() -> dict:
    """Same flagship job at N vs 4N CPUs in fresh processes — the
    sandbox stand-in for N vs 4N Ray nodes (BASELINE.md).

    Methodology: PAIRED runs — each repeat runs the N-CPU leg then the
    4N-CPU leg back-to-back (fresh ray.init each), so host-load drift
    hits both legs of a pair similarly; efficiency is the MEDIAN over
    per-pair ratios (best and the full series are also reported).

    Two pairings are measured:
    - 4→16 CPUs (primary): total load stays ≤ 50% of this 32-core
      host, the regime a real N→4N cluster is in (constant per-node
      load; added nodes bring their own cycles).
    - 8→32 CPUs (disclosed): at 32 concurrent processes this host
      throttles — a pure-CPU burn with NO Ray scales only ~3.2-3.5×
      from 8 to 32 processes, capping even a perfect engine at ~0.81.
      The burn is measured in-session and reported alongside, with the
      cycle-normalized efficiency (speedup ÷ delivered-cycle ratio)."""
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "5"))
    # leg sizes chosen so the hi leg runs >= ~15 s: fixed costs (actor
    # pool startup, pipeline submit) amortize and single-sample host
    # noise (±30% on this shared box) averages down
    levels = os.environ.get("GRAFT_SCALING_LEVELS", "4:16:5000000,8:32:6000000")

    def one_leg(ncpu: int, pages: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_PAGES=str(pages),
            GRAFT_BENCH_MODE="flagship",
            GRAFT_INPROC_REPEATS=os.environ.get("GRAFT_INPROC_REPEATS", "2"),
        )
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        return json.loads(r.stdout.strip().splitlines()[-1])["flagship"]

    out: dict = {
        "metric": "flagship spatial-join scaling (fresh ray.init at N vs 4N CPUs, same input, paired runs)",
        "n_pairs": repeats,
        "pairings": {},
    }

    # ---- multi-cluster pairing: N nodes vs 4N nodes (OFF by default) ---
    # Tempting sandbox model of "N vs 4N Ray nodes": each "node" an
    # INDEPENDENT Ray cluster (own raylet + object store) over a
    # disjoint slice of one corpus. MEASURED UNUSABLE on one host: four
    # co-located Ray control planes (4×{gcs, raylet, workers} ≈ 150
    # processes, thousands of gRPC/io threads) contend on one kernel —
    # per-node wall time degrades 3-4× vs the same node standalone,
    # an artifact real separate machines don't have. Kept behind
    # GRAFT_SCALING_CLUSTERS="cpus:nodes:per_node_pages" for reference.
    cspec = os.environ.get("GRAFT_SCALING_CLUSTERS", "")
    if cspec:
        cpus_per_node, hi_nodes, per_node = (int(x) for x in cspec.split(":"))

        def cluster_leg(nodes: int) -> dict:
            # WEAK scaling: constant per-node input (the 100 TB regime —
            # every node owns a fixed corpus shard). Each node is an
            # independent Ray instance with a capped object store so
            # `nodes` plasma tmpfs reservations fit the host.
            procs = []
            for i in range(nodes):
                env = dict(
                    os.environ,
                    RAY_GRAFT_CPUS=str(cpus_per_node),
                    GRAFT_PAGES=str(per_node),
                    GRAFT_PAGE_OFFSET=str(i * per_node),
                    GRAFT_BENCH_MODE="flagship",
                    GRAFT_INPROC_REPEATS="1",
                    GRAFT_OBJSTORE_BYTES=str(4_000_000_000),
                )
                procs.append(
                    subprocess.Popen(
                        [sys.executable, os.path.join(REPO, "bench.py")],
                        env=env,
                        stdout=subprocess.PIPE,
                        stderr=subprocess.DEVNULL,
                        text=True,
                    )
                )
            outs = []
            for p in procs:
                stdout, _ = p.communicate()
                assert p.returncode == 0, "cluster-leg node failed"
                outs.append(json.loads(stdout.strip().splitlines()[-1])["flagship"])
            span = max(o["t_end"] for o in outs) - min(o["t_start"] for o in outs)
            total = per_node * nodes
            return {
                "nodes": nodes,
                "join_rows": sum(o["join_rows"] for o in outs),
                "join_rows_node0": outs[0]["join_rows"],
                "span_sec": round(span, 3),
                "pages_per_sec": round(total / span, 1),
                "join_rows_per_sec": round(sum(o["join_rows"] for o in outs) / span, 1),
                "per_node_join_sec": [o["join_sec"] for o in outs],
            }

        cpairs = []
        for _ in range(repeats):
            leg1, leg4 = cluster_leg(1), cluster_leg(hi_nodes)
            # determinism: node 0 of the big leg processes exactly the
            # 1-node leg's page range — outputs must be identical
            assert leg1["join_rows"] == leg4["join_rows_node0"], "nondeterministic node output"
            cpairs.append((leg1, leg4))
        ceffs = sorted(
            (p[1]["join_rows_per_sec"] / p[0]["join_rows_per_sec"]) / hi_nodes
            for p in cpairs
        )
        cmed = ceffs[len(ceffs) // 2] if len(ceffs) % 2 else sum(ceffs[len(ceffs) // 2 - 1 : len(ceffs) // 2 + 1]) / 2
        b1, b4 = max(cpairs, key=lambda p: p[1]["join_rows_per_sec"] / p[0]["join_rows_per_sec"])
        out["pairings"][f"nodes_1x{cpus_per_node}_to_{hi_nodes}x{cpus_per_node}"] = {
            "model": (
                "weak scaling over independent Ray clusters (own raylet+plasma "
                "per node; constant per-node input, disjoint id ranges of one corpus)"
            ),
            "per_node_pages": per_node,
            "sec_1node": b1["span_sec"],
            f"sec_{hi_nodes}node": b4["span_sec"],
            "join_rows_per_sec_1node": b1["join_rows_per_sec"],
            f"join_rows_per_sec_{hi_nodes}node": b4["join_rows_per_sec"],
            "best_join_rows_per_sec_1node": max(p[0]["join_rows_per_sec"] for p in cpairs),
            f"best_join_rows_per_sec_{hi_nodes}node": max(p[1]["join_rows_per_sec"] for p in cpairs),
            "efficiency_median": round(cmed, 3),
            "efficiency_best": round(ceffs[-1], 3),
            "efficiency_best_legs": round(
                (max(p[1]["join_rows_per_sec"] for p in cpairs)
                 / max(p[0]["join_rows_per_sec"] for p in cpairs)) / hi_nodes, 3),
            "efficiency_all": [round(e, 3) for e in ceffs],
            f"per_node_join_sec_{hi_nodes}node": b4["per_node_join_sec"],
        }
    burn_levels = set()
    for spec in (s for s in levels.split(",") if s.strip()):
        lo, hi, pages = (int(x) for x in spec.split(":"))
        burn_levels.update((lo, hi))
        pairs = []
        for _ in range(repeats):
            f_lo, f_hi = one_leg(lo, pages), one_leg(hi, pages)
            assert f_lo["join_rows"] == f_hi["join_rows"], "nondeterministic join output"
            pairs.append((f_lo, f_hi))
        effs = sorted(
            (p[1]["join_rows_per_sec"] / p[0]["join_rows_per_sec"]) / (hi / lo)
            for p in pairs
        )
        med = effs[len(effs) // 2] if len(effs) % 2 else sum(effs[len(effs) // 2 - 1 : len(effs) // 2 + 1]) / 2
        f_lo, f_hi = max(pairs, key=lambda p: p[1]["join_rows_per_sec"] / p[0]["join_rows_per_sec"])
        # per-leg best across all samples: each leg's least-contended
        # window (single-run wall time swings ±40% with co-tenant load,
        # so the quiet-host estimate is the max per leg, ratioed)
        best_lo = max(p[0]["join_rows_per_sec"] for p in pairs)
        best_hi = max(p[1]["join_rows_per_sec"] for p in pairs)
        out["pairings"][f"{lo}to{hi}"] = {
            "n_pages": pages,
            "join_rows": f_lo["join_rows"],
            f"sec_{lo}": f_lo["join_sec"],
            f"sec_{hi}": f_hi["join_sec"],
            f"join_rows_per_sec_{lo}": f_lo["join_rows_per_sec"],
            f"join_rows_per_sec_{hi}": f_hi["join_rows_per_sec"],
            f"best_join_rows_per_sec_{lo}": best_lo,
            f"best_join_rows_per_sec_{hi}": best_hi,
            "efficiency_median": round(med, 3),
            "efficiency_best": round(effs[-1], 3),
            "efficiency_best_legs": round((best_hi / best_lo) / (hi / lo), 3),
            "efficiency_all": [round(e, 3) for e in effs],
        }

    cycles = {n: _delivered_cycles(n) for n in sorted(burn_levels)}
    out["host_delivered_cycles"] = {str(n): round(c, 2) for n, c in cycles.items()}
    # engine-kernel scaling with NO Ray (worker counts = the actor-pool
    # sizes of the 4/16/32-CPU legs): isolates the computation's own
    # scalability from single-host Ray-runtime effects
    k = _udf_kernel_scaling()
    out["udf_kernel_pages_per_sec"] = k
    if "3" in k and "12" in k:
        out["udf_kernel_efficiency_3_to_12"] = round(k["12"] / k["3"] / 4, 3)
    if "3" in k and "24" in k:
        out["udf_kernel_efficiency_3_to_24"] = round(k["24"] / k["3"] / 8, 3)
    for key, p in out["pairings"].items():
        if key.startswith("nodes_"):
            continue  # multi-cluster pairing needs no cycle normalization
        lo, hi = (int(x) for x in key.split("to"))
        cyc_ratio = cycles[hi] / cycles[lo]
        p["host_cycle_scaling"] = round(cyc_ratio, 3)
        p["cycle_normalized_efficiency_median"] = round(
            p["efficiency_median"] * (hi / lo) / cyc_ratio, 3
        )
        # hardware ceiling at MATCHED worker counts: the Ray legs run
        # actor pools of 3/4·ncpu workers, so compare against the bare
        # multiprocessing kernel at those same worker counts. On one
        # host, shared memory bandwidth caps even the no-Ray kernel
        # below 4.0x (a real 4N-node cluster adds private bandwidth
        # per node); kernel_normalized divides that artifact out.
        klo, khi = str(max(1, lo * 3 // 4)), str(max(1, hi * 3 // 4))
        if klo in k and khi in k:
            kern_eff = (k[khi] / k[klo]) / (hi / lo)
            p["kernel_efficiency_same_workers"] = round(kern_eff, 3)
            p["kernel_normalized_efficiency_median"] = round(
                p["efficiency_median"] / kern_eff, 3
            )
            # Ray hi-leg absolute throughput as a fraction of the bare
            # kernel at the same worker count (>=0.9 means the Ray
            # stage overhead is <=10% of pure compute)
            p["ray_over_kernel_hi_leg"] = round(
                p[f"best_join_rows_per_sec_{hi}"]
                / (k[khi] * p["join_rows"] / p["n_pages"]),
                3,
            )

    primary = out["pairings"][next(iter(out["pairings"]))]
    out["scaling_efficiency"] = primary["efficiency_median"]
    out["scaling_efficiency_best"] = primary["efficiency_best"]
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_bench()
        print(json.dumps(result))
        import ray

        ray.shutdown()
