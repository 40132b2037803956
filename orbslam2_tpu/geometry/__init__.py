from orbslam2_tpu.geometry import se3, sim3, camera, triangulate  # noqa: F401
