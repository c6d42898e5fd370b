"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship spatial pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL for
every SQL-expressible query (same column names, same value encodings).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, "/root/repo")


def entry() -> Any:
    """Flagship pipeline (pages → extract → geocode → PIP/kNN spatial
    join → tile assignments) on /root/testdata/sf0.001."""
    from osm2gtfs_ray.pipelines.flagship import flagship_from_documents

    res = flagship_from_documents("/root/testdata/sf0.001", concurrency=2)
    return res["assignments"]


def queries() -> dict[str, Callable[[str], Any]]:
    from osm2gtfs_ray.pipelines import queries as q
    from osm2gtfs_ray.pipelines.flagship import flagship_from_documents

    def q_spatial_join_rows(sf_dir: str):
        return flagship_from_documents(sf_dir, concurrency=2)["join_rows"]

    def q_tile_assignments(sf_dir: str):
        return flagship_from_documents(sf_dir, concurrency=2)["assignments"]

    return {
        # relational / aggregate operators (SQL-oracled)
        "pricing_summary": q.q_pricing_summary,
        "top_orders": q.q_top_orders,
        "nation_revenue": q.q_nation_revenue,
        "customers_without_orders": q.q_customers_without_orders,
        "suppliers_with_sales": q.q_suppliers_with_sales,
        "first_order_per_customer": q.q_first_order_per_customer,
        "event_type_counts": q.q_event_type_counts,
        "hourly_event_stats": q.q_hourly_event_stats,
        "prev_order_gap": q.q_prev_order_gap,
        # spatial flagship (rows-only: PIP/kNN not SQL-expressible)
        "spatial_join_rows": q_spatial_join_rows,
        "tile_assignments": q_tile_assignments,
    }


def oracle_sql() -> dict[str, str]:
    from osm2gtfs_ray.pipelines import queries as q

    return {
        "pricing_summary": q.SQL_PRICING,
        "top_orders": q.SQL_TOP_ORDERS,
        "nation_revenue": q.SQL_NATION_REVENUE,
        "customers_without_orders": q.SQL_CUSTOMERS_WITHOUT_ORDERS,
        "suppliers_with_sales": q.SQL_SUPPLIERS_WITH_SALES,
        "first_order_per_customer": q.SQL_FIRST_ORDER,
        "event_type_counts": q.SQL_EVENT_TYPE_COUNTS,
        "hourly_event_stats": q.SQL_HOURLY_EVENT_STATS,
        "prev_order_gap": q.SQL_PREV_ORDER_GAP,
    }
