from mpe3d_tpu.geometry.camera import (  # noqa: F401
    CameraRig,
    cam_centers_world,
    full_distort,
    intrinsics_from_rig_config,
    normalize_pixels,
    pixel_rays_world,
    project_points,
    radial_distort,
    undistort_points,
    undistorted_rays_world,
)
from mpe3d_tpu.geometry.triangulate import (  # noqa: F401
    triangulate_irls,
    triangulate_mean,
    triangulate_median_filtered,
    triangulate_pair,
)
from mpe3d_tpu.geometry.calib_io import load_transform_manager, rig_from_files  # noqa: F401
