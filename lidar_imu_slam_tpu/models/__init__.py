from . import kiss_icp
from . import ekf
from . import lio
from . import backend

__all__ = ["kiss_icp", "ekf", "lio", "backend"]
