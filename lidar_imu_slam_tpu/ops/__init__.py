from . import lie
from . import stats
from . import preprocess
from . import voxel_map
from . import deskew
from . import icp

__all__ = ["lie", "stats", "preprocess", "voxel_map", "deskew", "icp"]
