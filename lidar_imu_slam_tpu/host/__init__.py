from . import synthetic
from . import kitti
from . import rosbag
from . import runner

__all__ = ["synthetic", "kitti", "rosbag", "runner"]
