from gb25_tpu.grids.vertical import exponential_z_faces, uniform_z_faces  # noqa: F401
from gb25_tpu.grids.tripolar import TripolarGrid, tripolar_grid  # noqa: F401
from gb25_tpu.grids.latlon import (  # noqa: F401
    LatitudeLongitudeGrid,
    latitude_longitude_grid,
    simple_latitude_longitude_grid,
    resolution_to_points,
    EARTH_RADIUS,
)
