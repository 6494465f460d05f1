from . import sdf, shape, pointcloud
from .pointcloud import (
    points_from_sdf,
    generate_smlm_pointcloud_from_shape,
    smlmify_points,
)
