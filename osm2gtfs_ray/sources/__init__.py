from osm2gtfs_ray.sources.tables import read_table  # noqa: F401
