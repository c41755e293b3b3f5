from . import lie
from . import precise
from . import stats
from . import preprocess
from . import imu
from . import voxel_map
from . import deskew
from . import icp
from . import pallas

__all__ = [
    "lie", "precise", "stats", "preprocess", "imu", "voxel_map", "deskew",
    "icp", "pallas",
]
