from . import kiss_icp

__all__ = ["kiss_icp"]
