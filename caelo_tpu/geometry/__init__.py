from . import se3, kitti_pose  # noqa: F401
