"""osm2gtfs_ray — a from-scratch Ray-Data-native spatial data engine.

Re-expresses the query/data-processing capabilities of grote/osm2gtfs
(reference at /root/reference, studied for *what* it computes — see
SURVEY.md) as idiomatic Ray Data pipelines: ``ray.data.Dataset`` →
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, cell-keyed groupby shuffles for the spatial joins, generalized
per BASELINE.json to Common-Crawl-style web-page corpora joined against
OSM-derived polygon tiles.

Layout:
  geo/        pure-numpy geometry kernels (cells, haversine, centroid, PIP, kNN)
  ops/        relational operator library (joins, dedup, alignment, stitching)
  stages/     Ray Data batch stages (extract, geocode, spatial join, text, dedup, ANN)
  sources/    table readers + deterministic synthetic generators (pages/tiles)
  state/      per-partition lineage records + resumable checkpoint writes
  pipelines/  end-to-end pipelines (flagship spatial join, GTFS-parity, query registry)
"""

__version__ = "0.1.0"
