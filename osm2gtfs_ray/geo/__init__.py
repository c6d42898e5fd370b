"""Pure-numpy geometry kernels over Arrow buffers.

No geo libraries (h3/s2/shapely/scipy) exist in this environment; these
kernels implement the needed subset from scratch, vectorized, and are
validated against brute-force oracles in tests/.
"""

from osm2gtfs_ray.geo.cells import (  # noqa: F401
    DEFAULT_LEVEL,
    cell_of,
    cell_to_center,
    cell_to_ij,
    ij_to_cell,
    neighbor_ring,
    parent_cell,
)
from osm2gtfs_ray.geo.haversine import haversine_m  # noqa: F401
from osm2gtfs_ray.geo.centroid import spherical_centroid  # noqa: F401
from osm2gtfs_ray.geo.pip import points_in_polygon, polygon_bbox  # noqa: F401
