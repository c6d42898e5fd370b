"""Local mimic of the driver's correctness gate: run each queries()
entry and its oracle_sql() on the same sf dir, compare row count,
schema (column names) and order-insensitive values.

Usage: python tools/verify_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for col in a.columns:
            av, bv = a[col], b[col]
            try:
                eq = (av.fillna("§N") == bv.fillna("§N")) if av.dtype == object else (
                    av.fillna(-(2**60)).to_numpy() == bv.fillna(-(2**60)).to_numpy()
                )
                neq = (~eq).sum()
            except Exception as e:  # dtype mismatch etc.
                problems.append(f"col {col}: compare error {e}; dtypes {av.dtype} vs {bv.dtype}")
                continue
            if neq:
                i = np.asarray(~eq).nonzero()[0][:3]
                problems.append(
                    f"col {col}: {neq} mismatches, e.g. ray={av.iloc[i].tolist()} sql={bv.iloc[i].tolist()}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    import time as _time

    timed = "--time" in sys.argv
    only.discard("--time")
    times: dict[str, tuple[float, float]] = {}

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = _time.perf_counter()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_ray = _time.perf_counter() - t0
        if name not in sqls:
            times[name] = (t_ray, 0.0)
            print(f"okro {name}: rows-only, {len(ray_df)} rows")
            continue
        t0 = _time.perf_counter()
        try:
            sql_arrow = con.execute(sqls[name]).arrow()
            sql_df = sql_arrow.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: sql error: {e}")
            n_fail += 1
            continue
        times[name] = (t_ray, _time.perf_counter() - t0)
        problems = compare(name, ray_df, sql_df)
        # Driver value-hash is dtype-sensitive: flag any oracle column whose
        # arrow type isn't a plain int64/double/string/bool/timestamp match.
        import pyarrow as pa

        for f in sql_arrow.schema:
            if pa.types.is_decimal(f.type):
                problems.append(f"col {f.name}: DuckDB returned {f.type} (un-cast SUM?) — driver hash will fail")
        if problems:
            n_fail += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"   {p}")
        else:
            print(f"ok   {name}: {len(ray_df)} rows match")
    if timed and times:
        tot_ray = sum(t[0] for t in times.values())
        tot_sql = sum(t[1] for t in times.values())
        print(f"TIMING total ray={tot_ray:.1f}s sql={tot_sql:.1f}s over {len(times)} queries")
        for name, (tr, ts) in sorted(times.items(), key=lambda kv: -(kv[1][0] + kv[1][1])):
            print(f"   {tr + ts:7.2f}  ray={tr:6.2f} sql={ts:6.2f}  {name}")
        import json as _json

        with open("/tmp/verify_times.json", "w") as f:
            _json.dump({k: {"ray": v[0], "sql": v[1]} for k, v in times.items()}, f, indent=1)
    print(f"{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
