"""Parquet table readers with projection pushdown.

The ingest analogue of the reference's Overpass queries
(/root/reference/osm2gtfs/core/osm_connector.py:562-618): at scale the
OSM/page corpora are pre-extracted Parquet; bbox/tag predicates become
column pruning + row-group filter pushdown at the read.
"""

from __future__ import annotations

import os

import ray.data


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    filter_expr=None,
    **kwargs,
) -> ray.data.Dataset:
    """Read one named table, pruning columns (and row groups when a
    pyarrow dataset filter expression is given) at the source."""
    return ray.data.read_parquet(
        table_path(sf_dir, name),
        columns=columns,
        filter=filter_expr,
        **kwargs,
    )
