from gfnet_tpu.core.geometry import (
    normalized_grid,
    unnormalize_coords,
    normalize_coords,
    denormalize_corner_aligned,
    transform_points,
    get_perspective_transform,
    warp_perspective,
)
from gfnet_tpu.core.homography import (
    dlt_homography,
    irls_homography,
    ransac_homography,
    corner_error,
)
