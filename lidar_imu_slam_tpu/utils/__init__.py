from . import trajectory
from . import metrics

__all__ = ["trajectory", "metrics"]
